"""Crawl configuration — replaces the reference's base64(JSON) Spider blob
(``main.go:31-52,204-220``) and the colly collector constants
(``collyfunc/collyfunc.go:115-119,177-182``)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from typing import Any


@dataclass
class CrawlConfig:
    """Engine-wide crawl policy.

    delay_ms/jitter_ms mirror colly's LimitRule{Delay: 3s, RandomDelay: 3s}
    (collyfunc.go:115-119); politeness uses a VIRTUAL clock seeded by
    ``jitter_seed`` so scheduling is deterministic and independent of wall
    time.  ``max_attempts=5`` reproduces the retry ledger's init-at-0 quirk
    (main.go:1079-1099: intended 3 retries, actual 4 → 5 attempts total).
    """

    site_base: str = "https://www.yelp.com"
    allowed_hosts: tuple[str, ...] | None = ("yelp.com", "www.yelp.com")
    force_hosts: tuple[str, ...] = ("yelp.com", "www.yelp.com")
    force_to: str = "www.yelp.com"
    delay_ms: int = 3000
    jitter_ms: int = 3000
    jitter_seed: int = 42
    parallelism_per_host: int = 10
    max_attempts: int = 5
    ignore_robots: bool = True   # reference parity: colly.IgnoreRobotsTxt()
    num_seen_shards: int = 4
    num_frontier_shards: int = 4
    # per-seed state-machine shards (state/seeds.py) — pure bookkeeping
    # actors, so more of them just buys apply()/final_state() parallelism;
    # byte output is shard-count-invariant (events/retries of one seed stay
    # in one shard, growth goes through the deterministic submit→resolve)
    num_seed_shards: int = 8
    num_fetch_buckets: int = 16
    scraped_at: int = 1700000000  # deterministic stand-in for time.Now()

    def host_allowed(self, host: str) -> bool:
        """colly AllowedDomains filter (collyfunc.go:67,126)."""
        return self.allowed_hosts is None or host in self.allowed_hosts

    def to_json(self) -> str:
        d = asdict(self)
        d["allowed_hosts"] = list(self.allowed_hosts) if self.allowed_hosts is not None else None
        d["force_hosts"] = list(self.force_hosts)
        return json.dumps(d, indent=1)

    @classmethod
    def from_json(cls, s: str) -> "CrawlConfig":
        d = json.loads(s)
        if d.get("allowed_hosts") is not None:
            d["allowed_hosts"] = tuple(d["allowed_hosts"])
        d["force_hosts"] = tuple(d.get("force_hosts", ()))
        return cls(**d)


@dataclass
class Persona:
    """Per-spider fetch identity — ``Spider.Persona`` (main.go:40-44).

    ``proxy`` is the reference's credential string ``ACCESSKEY@HOST:PORT``
    (parsed by ``state.session.parse_proxy``, the ``getFromProxy`` twin,
    collyfunc.go:50-63); ``other_proxies`` is the failover list the
    reference carries but never rotates through; ``additional_cookies``
    is ``interface{}`` in the reference and is DECLARED but never read
    (the package cookie jar starts nil and is only ever fed by
    responses) — stored here for config-surface completeness, not
    applied.  Zero effect on the lookup-based fetch; ``FetchSession``
    maps proxy onto headers/transport for a live-HTTP page source."""

    proxy: str = ""
    other_proxies: tuple[str, ...] = ()
    additional_cookies: Any = None

    @classmethod
    def from_spider(cls, d: dict | None) -> "Persona | None":
        """Map the Spider JSON's nested persona object (absent → None,
        like Go's zero-value struct the flows never touch)."""
        p = (d or {}).get("persona")
        if not p:
            return None
        return cls(proxy=p.get("proxy", "") or "",
                   other_proxies=tuple(p.get("other_proxies") or ()),
                   additional_cookies=p.get("additional_cookies"))


@dataclass
class Seed:
    """One crawl seed — the Spider config fields that matter
    (main.go:31-52): url may be empty → seed-resolution mode (Flow 2);
    last_review_hashes non-empty → incremental mode (Flow 3);
    persona carries the proxy/cookie identity (main.go:40-44)."""

    seed_id: int
    url: str = ""
    business_name: str = ""
    addr_street: str = ""
    addr_city: str = ""
    addr_state: str = ""
    addr_zip: str = ""
    first_page_only: int = 0
    last_review_hashes: tuple[str, ...] = field(default_factory=tuple)
    persona: Persona | None = None
