"""URL canonicalization + 64-bit hashing kernels.

Reference semantics: seed canonicalization in ``/root/reference/main.go:273-291``
(trim trailing newline, force scheme->https, force host->www.yelp.com for
off-host yelp URLs, reject search?/adredir? seeds).  The engine-wide canonical
form extends this per the north rule: lowercase scheme+host, strip fragment,
strip default port, sort query parameters.  64-bit URL hashing feeds the
sharded seen-set and the host-hash frontier partitioning.

All functions are pure and deterministic; the batch variants are the
vectorization entry points used inside ``map_batches`` kernels.
"""

from __future__ import annotations

from hashlib import blake2b, md5
from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# bump when url_hash64 changes: the bucketed page-store layout derives from
# it, and a store built under a different hash must be rebuilt
URL_HASH_VERSION = "md5u64"


def canonicalize(url: str) -> str:
    """Engine-wide canonical URL form.

    north-rule extensions on top of main.go:273-291: lowercase scheme/host,
    strip ``#fragment``, strip default port, sort raw query components.
    Preserves path and the raw (undecoded) query component text so that
    canonicalization never re-encodes bytes (idempotent by construction).
    """
    u = url.strip()
    if not u:
        return u
    # Scheme-less URLs ("yelp.com/biz/x") parse with an empty netloc; treat the
    # leading component as the host like a browser would.
    if "://" not in u and not u.startswith("//"):
        u = "//" + u
    try:
        parts = urlsplit(u)
        host = parts.hostname or ""
        port = parts.port
    except ValueError:
        # Malformed authority (bad port, bad IPv6 bracket...). A canonicalizer
        # over 10^10 crawled URLs must never throw: fall back to the stripped
        # input so the URL still hashes/dedups deterministically.
        return url.strip()
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        scheme = "https"  # main.go:279-281 forces non-http(s) schemes to https
    host = host.lower().rstrip(".")
    if ":" in host:  # IPv6 literal — urlsplit strips the brackets
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path
    query = parts.query
    if query:
        # Sort raw &-separated components; no decode/re-encode round trip.
        query = "&".join(sorted(query.split("&")))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_seed(url: str, force_hosts: tuple[str, ...] = ("yelp.com", "www.yelp.com"),
                      force_to: str = "www.yelp.com") -> tuple[str, bool]:
    """Seed-URL canonicalization with reference parity (main.go:273-291).

    Returns ``(canon_url, rejected)``; ``rejected`` is True when the canonical
    URL contains ``search?`` or ``adredir?`` (status NO_BUSINESS_PAGE,
    main.go:286-290).  Host forcing applies only when the URL mentions the
    configured site (main.go:273 ``strings.Contains(.., "yelp.")``); the
    rebuild generalizes via ``force_hosts``/``force_to`` config.
    """
    u = url.rstrip("\n")
    # "yelp." marker derived from force_to ("www.yelp.com" → "yelp."); empty
    # force_to disables forcing (generic multi-host corpora)
    marker = force_to.split(".", 1)[-1].split(".", 1)[0] + "." if force_to else None
    if marker and marker in u:
        # NOTE: no scheme-less rescue here — Go url.Parse puts "yelp.com/x"
        # entirely in the PATH (host empty → forced), yielding
        # "https://www.yelp.com/yelp.com/x".  Faithful quirk.
        parts = urlsplit(u)
        scheme = parts.scheme
        if scheme not in ("http", "https"):
            scheme = "https"
        # Go compares u.Host — the RAW netloc incl. port, case-sensitively
        # (main.go:282); forcing replaces the whole netloc (port dropped).
        netloc = parts.netloc
        if netloc not in force_hosts:
            netloc = force_to
        u = urlunsplit((scheme, netloc, parts.path, parts.query, parts.fragment))
    rejected = ("search?" in u) or ("adredir?" in u)
    return u, rejected


def url_hash64(url: str) -> int:
    """Stable 64-bit URL hash: first 8 md5 bytes, little-endian — exactly
    DuckDB ``md5_number_upper``, which keeps the url_canonicalize query
    SQL-checkable (xxhash is not in the sandbox; md5 and blake2b-8 bench
    within noise of each other on URL-length inputs).

    Feeds the sharded seen-set (key ``url_hash % num_seen_shards``) and the
    fetch-as-lookup bucket (``url_hash % num_buckets``).
    """
    return int.from_bytes(md5(url.encode("utf-8")).digest()[:8], "little")


def host_of(url: str) -> str:
    if "://" not in url and not url.startswith("//"):
        url = "//" + url
    return (urlsplit(url).hostname or "").lower()


def host_hash64(host: str) -> int:
    """64-bit host hash — partition key for FrontierShard actors (politeness
    must be per-host co-located; see SURVEY.md §4.2 shuffle row)."""
    return int.from_bytes(blake2b(host.encode("utf-8"), digest_size=8, person=b"hosthash").digest(), "little")


# ---------------------------------------------------------------- batch kernels

def canonicalize_batch(urls) -> list[str]:
    """Vectorization entry point for map_batches (list/array of str in)."""
    return [canonicalize(u) for u in urls]


def url_hash_batch(urls) -> list[int]:
    return [url_hash64(u) for u in urls]


def host_batch(urls) -> list[str]:
    return [host_of(u) for u in urls]


def host_hash_batch(hosts) -> list[int]:
    return [host_hash64(h) for h in hosts]
