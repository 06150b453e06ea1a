"""Per-fetch session state: cookie capture/replay + UA rotation (T3/T7).

Reference behavior being mapped:

* Cookie jar — ``collyfunc/collyfunc.go:48,99-101,110-113,161-163,172-175``:
  ONE package-global ``[]*http.Cookie`` slice, overwritten with the full
  cookie set of every response and replayed on every subsequent request —
  shared across ALL collector instances (sync and async).  I.e. last-
  response-wins, no per-host scoping, no expiry handling.  That quirk is
  reproduced here faithfully (``last_response_wins=True``), with the
  correct per-host jar available as the non-quirk mode for users crawling
  session-gated corpora.
* UA rotation — ``collyfunc/collyfunc.go:17-46,98,158``: ``rand.Intn`` over
  a 24-entry table per request (unseeded ``math/rand``).  The rebuild keys
  the choice on (seed, request ordinal) so runs are deterministic and
  num_cpus-invariant; the reference's accidental mid-string list splits
  (collyfunc.go:25-28) are preserved verbatim since the header VALUES they
  produce are what a parity capture would see.

In the lookup-based fetch (pages come from the Parquet store), neither
cookies nor UA change any response; the session state exists so that the
fetch surface is complete — a user pointing the engine at a live/HTTP page
source gets the reference's session semantics.  ``FetchSession`` is
deliberately a per-fetch-actor object: the crawl partitions scheduled URLs
by host (bucket-sorted), so per-host jars are actor-local state with no
cross-actor coordination — the package-global-jar quirk is emulated within
an actor's stream, which is exactly the reference's effective scope once
its single process is sharded."""

from __future__ import annotations

import random

# collyfunc.go:17-46 verbatim (including the accidental two-entry splits)
USER_AGENT_STRINGS = [
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.8; rv:43.0) Gecko/20100101 Firefox/43.0",
    "Mozilla/5.0 (X11; Linux i586; rv:31.0) Gecko/20100101 Firefox/31.0",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; rv:31.0) Gecko/20130401 Firefox/31.0",
    "Mozilla/5.0 (Windows NT 5.1; rv:31.0) Gecko/20100101 Firefox/31.0",
    "Mozilla/5.0 (Windows NT 6.1; Win64; x64; rv:25.0) Gecko/20100101 Firefox/25.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.6; rv:25.0) Gecko/20100101 Firefox/25.0",
    "Mozilla/5.0 (X11; Ubuntu; Linux i686; rv:11.0) Gecko/20100101 Firefox/11.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_1) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/41.0.2227.1 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_9_2) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/36.0.1944.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10; rv:33.0) Gecko/20100101 Firefox/33.0",
    "Mozilla/5.0 (Windows NT 6.3; rv:36.0) Gecko/20100101 Firefox/36.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_9_3) AppleWebKit/537.75.14 (KHTML, like Gecko) ",
    "Version/7.0.3 Safari/7046A194A",
    "Mozilla/5.0 (X11; U; Linux x86_64; en-us) AppleWebKit/531.2+ (KHTML, like Gecko) Version/5.0 ",
    "Safari/531.2+",
    "Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.1; WOW64; Trident/6.0)",
    "Opera/9.80 (X11; Linux i686; Ubuntu/14.10) Presto/2.12.388 Version/12.16",
    "Opera/12.0(Windows NT 5.2;U;en)Presto/22.9.168 Version/12.00",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_8_5) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/43.0.2357.130 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_8_5) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/44.0.2395.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_1) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/41.0.2227.1 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_9_2) AppleWebKit/537.36 (KHTML, like Gecko) ",
    "Chrome/36.0.1944.0 Safari/537.36",
]


def parse_proxy(proxy: str, key: str) -> str:
    """``getFromProxy`` parity (collyfunc.go:50-63): the proxy credential
    string is ``ACCESSKEY@HOST:PORT``; ``key="url"`` → ``http://HOST:PORT``,
    ``key="key"`` → ``ACCESSKEY``, any other key → "".  Quirks kept: the
    reference ``strings.Split``s on "@" and takes [0]/[1], so a string
    with several "@" yields only the middle chunk as the host; a string
    with NO "@" panics (index out of range) — ValueError here, the
    established panic-parity path."""
    parts = proxy.split("@")
    if len(parts) < 2:
        raise ValueError(
            f"malformed proxy (want ACCESSKEY@HOST:PORT): {proxy!r}")
    access_key, proxy_url = parts[0], parts[1]
    if key == "url":
        return "http://" + proxy_url
    if key == "key":
        return access_key
    return ""


class UARotator:
    """Deterministic stand-in for ``rand.Intn`` UA choice: (seed, ordinal)
    keyed so any task layout produces the same header for the same request
    ordinal (num_cpus-invariance, like every other crawl decision)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def for_ordinal(self, ordinal: int) -> str:
        r = random.Random((self.seed << 32) ^ ordinal)
        return USER_AGENT_STRINGS[r.randrange(len(USER_AGENT_STRINGS))]


class CookieJar:
    """Cookie capture/replay with both scopes:

    * ``last_response_wins=True`` (reference quirk): one global cookie set,
      replaced wholesale by each response's cookies.
    * ``last_response_wins=False``: per-host dict merge (the behavior a
      session-gated crawl actually needs)."""

    def __init__(self, last_response_wins: bool = True):
        self.quirk = last_response_wins
        self._global: dict[str, str] = {}
        self._by_host: dict[str, dict[str, str]] = {}

    def capture(self, host: str, set_cookies: dict[str, str] | None) -> None:
        if not set_cookies:
            if self.quirk and set_cookies is not None:
                self._global = {}
            return
        if self.quirk:
            self._global = dict(set_cookies)
        else:
            self._by_host.setdefault(host, {}).update(set_cookies)

    def for_request(self, host: str) -> dict[str, str]:
        if self.quirk:
            return dict(self._global)
        return dict(self._by_host.get(host, {}))


class FetchSession:
    """Per-fetch-actor session: jar + UA rotation + persona proxy,
    applied per request.

    The Parquet page store carries no cookies and needs no transport, so
    both are no-ops there; a live-HTTP page source calls
    ``jar.capture(host, response_cookies)`` after each fetch, builds its
    client from ``transport()`` and sends ``request_headers(...)``."""

    def __init__(self, seed: int = 0, last_response_wins: bool = True,
                 persona=None):
        self.ua = UARotator(seed)
        self.jar = CookieJar(last_response_wins)
        self.persona = persona  # config.Persona | None (main.go:40-44)

    def transport(self) -> dict:
        """The per-spider collector transport (collyfunc.go:70-92) as a
        plain dict an HTTP-client adapter consumes: proxy URL from the
        persona credential, TLS verification disabled, and the colly
        timeouts (ExpectContinue 4 s, ResponseHeader 10 s, request
        200 s)."""
        t = {"proxy_url": None,
             "tls_insecure_skip_verify": True,
             "expect_continue_timeout_s": 4,
             "response_header_timeout_s": 10,
             "request_timeout_s": 200}
        if self.persona is not None and self.persona.proxy:
            t["proxy_url"] = parse_proxy(self.persona.proxy, "url")
        return t

    def request_headers(self, host: str, ordinal: int) -> dict[str, str]:
        h = {}
        if self.persona is not None and self.persona.proxy:
            # collyfunc.go:93-94: Basic base64(ACCESSKEY), set per request
            import base64
            key = parse_proxy(self.persona.proxy, "key")
            h["Proxy-Authorization"] = (
                "Basic " + base64.b64encode(key.encode()).decode())
        h.update({
            # collyfunc.go:95-98 fixed header set
            "X-Crawlera-Profile": "desktop",
            "upgrade-insecure-requests": "1",
            "Connection": "keep-alive",
            "User-Agent": self.ua.for_ordinal(ordinal),
        })
        cookies = self.jar.for_request(host)
        if cookies:
            h["Cookie"] = "; ".join(f"{k}={v}" for k, v in cookies.items())
        return h
