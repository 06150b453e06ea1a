"""Live-HTTP page source: the colly-parity transport driven through real
sockets (reference ``collyfunc/collyfunc.go:65-122``).

The crawl engine's fetch stage is lookup-based per the north rule (pages
come from the Parquet page store), but the WHOLE session surface —
persona proxy credential (``getFromProxy``, collyfunc.go:50-63), the
per-request ``Proxy-Authorization: Basic base64(ACCESSKEY)`` header
(collyfunc.go:93-94), the fixed header set + UA rotation
(collyfunc.go:95-98, 17-46), the last-response-wins cookie jar
(collyfunc.go:48,99-113) and the collector transport (TLS-skip +
timeouts, collyfunc.go:70-92) — is mapped onto
:class:`~go_scrapper_ray.state.session.FetchSession`.  This module is
the adapter that makes those semantics REAL: an ``HttpFetcher`` builds a
urllib opener from ``FetchSession.transport()`` (proxy handler, TLS
verification off, the 200 s request timeout), sends
``FetchSession.request_headers(host, ordinal)`` verbatim, and captures
every response's Set-Cookie set back into the jar — so a user pointing
the engine at a live site gets byte-for-byte the reference's request
stream (tests/test_http_session.py drives it against a local fixture
server and asserts header/cookie/UA parity on the wire).

Politeness maps to wall time here: the virtual per-host clock the
frontier schedules with (state/frontier.py) becomes a real minimum
inter-request delay per host (``min_delay_s``), applied in scheduled
order — the same single-logical-queue semantics, now with sleeps.
"""

from __future__ import annotations

import ssl
import time
import urllib.error
import urllib.request
from http.cookies import SimpleCookie

from ..state.session import FetchSession
from .. import urlkit


class HttpFetcher:
    """Sequential live-HTTP fetcher over one :class:`FetchSession`.

    Deliberately one-session-per-fetch-actor (the engine's partitioning
    contract: a host's URLs land on one fetch shard, so jar/UA state is
    actor-local).  ``fetch(url, ordinal)`` returns
    ``(status, body_bytes, sent_headers)``; network errors map to status
    0 with empty body (the caller's retry ledger treats non-200 alike).
    """

    def __init__(self, session: FetchSession | None = None,
                 min_delay_s: float = 0.0):
        self.session = session or FetchSession()
        self.min_delay_s = float(min_delay_s)
        self._next_allowed: dict[str, float] = {}  # host -> wall clock
        t = self.session.transport()
        handlers: list = []
        if t["proxy_url"]:
            handlers.append(urllib.request.ProxyHandler(
                {"http": t["proxy_url"], "https": t["proxy_url"]}))
        if t["tls_insecure_skip_verify"]:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            handlers.append(urllib.request.HTTPSHandler(context=ctx))
        self._opener = urllib.request.build_opener(*handlers)
        self._timeout = t["request_timeout_s"]

    def _politeness_wait(self, host: str) -> None:
        if self.min_delay_s <= 0:
            return
        now = time.monotonic()
        nxt = self._next_allowed.get(host, now)
        if nxt > now:
            time.sleep(nxt - now)
        self._next_allowed[host] = max(nxt, now) + self.min_delay_s

    def fetch(self, url: str, ordinal: int
              ) -> tuple[int, bytes, dict[str, str]]:
        host = urlkit.host_of(urlkit.canonicalize(url))
        self._politeness_wait(host)
        headers = self.session.request_headers(host, ordinal)
        req = urllib.request.Request(url, headers=headers)
        try:
            with self._opener.open(req, timeout=self._timeout) as resp:
                body = resp.read()
                status = resp.status
                set_cookie = resp.headers.get_all("Set-Cookie") or []
        except urllib.error.HTTPError as e:
            body = e.read() if e.fp is not None else b""
            status = e.code
            set_cookie = e.headers.get_all("Set-Cookie") or []
        except (urllib.error.URLError, OSError):
            return 0, b"", headers
        # capture the response cookie set; the quirk jar REPLACES its
        # state wholesale with EVERY response's (possibly empty) set —
        # collyfunc.go:99-101 assigns r.Cookies() unconditionally, so a
        # cookie-less response clears the jar
        cookies: dict[str, str] = {}
        for sc in set_cookie:
            c = SimpleCookie()
            c.load(sc)
            for k, v in c.items():
                cookies[k] = v.value
        self.session.jar.capture(host, cookies)
        return status, body, headers
