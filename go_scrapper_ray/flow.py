"""Shared crawl-flow spec: status machine, retry ledger, incremental-window
arithmetic, politeness virtual clock.

These pure pieces encode the reference's control-flow semantics
(``/root/reference/main.go``) once, so the distributed engine
(``pipelines/crawl.py``) and the serial test oracle (``tests/oracle.py``)
cannot drift apart on the SPEC while still exercising completely different
orchestration (Ray actors + Dataset rounds vs a single-threaded loop).

Canonical crawl ordering (the rebuild's deterministic replacement for the
reference's goroutine-nondeterministic arrival order — SURVEY.md §2.8 W2):
  * the crawl advances in ROUNDS (= the reference's WaitGroup phase barriers);
  * within a round, released entries are ordered by
    (seed_id, depth, parent_seq, emit_idx, attempt);
  * ``seq`` is assigned in that order, continuing globally;
  * record arrival order (the insertion-sort tiebreak) is
    (page seq, emission index) — independent of task completion order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Species of frontier entries (what extraction to run on the fetched page).
SEARCH = "search"
PROFILE = "profile"
FEED = "feed"
NONREC_LANDING = "nonrec_landing"
NONREC_PAGE = "nonrec_page"

# Status enum (main.go status machine, SURVEY.md §2.3 T5)
SUCCESS_SCRAPED = "SUCCESS_SCRAPED"
NO_REVIEWS = "NO_REVIEWS"
NO_SEARCH_RESULTS = "NO_SEARCH_RESULTS"
NO_BUSINESS_PAGE = "NO_BUSINESS_PAGE"
SCRAPE_FAILED = "SCRAPE_FAILED"
PAGE_FORMAT_CHANGE = "PAGE_FORMAT_CHANGE"
NO_REVIEWS_SINCE_LAST_MATCH = "NO_REVIEWS_SINCE_LAST_MATCH"

# The reference stores the raw Go error string on timeouts (main.go:346-349);
# our fixture "status 0" pages map to this deterministic stand-in.
TIMEOUT_ERR = 'Get request: context deadline exceeded (Client.Timeout exceeded while awaiting headers)'


def status_for_fetch_error(kind: str, http_status: int,
                           minimal_review_count: int) -> str | None:
    """Status written when a fetch fails AFTER the retry budget.

    search: main.go:339-349; profile: main.go:478-486; nonrec landing:
    main.go:755-765 (gated on minimal_review_count==0); feed/nonrec pages:
    no status (main.go:658-669,821-828)."""
    if kind in (SEARCH, PROFILE):
        if http_status == 404:
            return NO_SEARCH_RESULTS
        if http_status == 503:
            return SCRAPE_FAILED
        if http_status == 0:
            return TIMEOUT_ERR
        return None
    if kind == NONREC_LANDING and minimal_review_count == 0:
        if http_status == 404:
            return NO_SEARCH_RESULTS
        if http_status == 503:
            return SCRAPE_FAILED
        if http_status == 0:
            return TIMEOUT_ERR
    return None


class RetryLedger:
    """retryRequest parity (main.go:1079-1099): intended cap 3, but the first
    failure stores 0 and returns true — so up to 4 retries / 5 attempts."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def allow_retry(self, key: str) -> bool:
        if key in self.counts:
            val = self.counts[key]
            if val < 3:
                self.counts[key] = val + 1
                return True
            return False
        self.counts[key] = 0
        return True


@dataclass
class WindowCursors:
    """Incremental-mode 50-review window walk (main.go:603-654).

    loop_end=50 is set when the profile fans out the first window
    (main.go:564-566); non_loop_end=50 when the landing page does
    (main.go:798-801)."""

    loop_start: int = 0
    loop_end: int = 0
    non_loop_start: int = 0
    non_loop_end: int = 0
    normal_count: int = 0
    non_count: int = 0
    matched: bool = False

    def exhausted(self) -> bool:
        return self.loop_end >= self.normal_count and self.non_loop_end >= self.non_count

    def grow(self) -> tuple[list[int], list[int]]:
        """One iteration of callLastReviewURL (main.go:619-634): grow each
        unfinished window by 50; returns (feed_starts, nonrec_starts)."""
        feed_starts: list[int] = []
        non_starts: list[int] = []
        if self.loop_end < self.normal_count:
            self.loop_start = self.loop_end
            self.loop_end += 50
            feed_starts = list(range(self.loop_start, self.loop_end, 10))
        if self.non_loop_end < self.non_count:
            self.non_loop_start = self.non_loop_end
            self.non_loop_end += 50
            non_starts = list(range(self.non_loop_start, self.non_loop_end, 10))
        return feed_starts, non_starts


_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """splitmix64 finalizer (Steele et al., public domain) — bit-identical
    to the numpy path in politeness_gaps_vec."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) & _M64


def politeness_gap_ms(jitter_seed: int, delay_ms: int, jitter_ms: int,
                      host: str, k: int) -> int:
    """Virtual-clock inter-request gap for the k-th request to a host:
    Delay + U(0, RandomDelay) (collyfunc.go:115-119) with deterministic,
    seeded jitter so scheduling is reproducible.  The jitter is
    splitmix64(seed ^ host_hash ^ k) — chosen over a cryptographic hash so
    a hot host's release (politeness is per-host SERIAL by design) can
    stamp a whole k-range in one numpy pass (politeness_gaps_vec)."""
    if jitter_ms <= 0:
        return delay_ms
    from .urlkit import host_hash64
    base = (jitter_seed & _M64) ^ host_hash64(host)
    return delay_ms + _splitmix64(base ^ (k & _M64)) % jitter_ms


def politeness_gaps_vec(jitter_seed: int, delay_ms: int, jitter_ms: int,
                        host_hash: int, k0: int, n: int):
    """Vectorized twin of politeness_gap_ms for k in [k0, k0+n) — one numpy
    pass, bit-identical to the scalar path (the parity suite compares the
    engine's release stamps against the oracle's scalar loop)."""
    import numpy as np

    if jitter_ms <= 0:
        return np.full(n, delay_ms, np.int64)
    base = np.uint64((jitter_seed & _M64) ^ host_hash)
    x = base ^ np.arange(k0, k0 + n, dtype=np.uint64)
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (np.int64(delay_ms)
            + (x % np.uint64(jitter_ms)).astype(np.int64))


@dataclass
class SeedOutcome:
    """Per-seed terminal state collected by both engine and oracle."""
    seed_id: int
    profile_key: str = ""          # spider.ProfileKey (post-Flow-2, pre-canon)
    status: str = ""
    score: float = 0.0
    total_reviews: int = 0
    item_scraped_count: int = 0
    rejected: bool = False         # NO_BUSINESS_PAGE: reference dumps NOTHING
    no_meta: bool = False

    def finalize_status(self, n_records: int):
        """main.go:308-319."""
        self.item_scraped_count = n_records
        if n_records > 0:
            self.status = SUCCESS_SCRAPED
        elif self.status == "":
            self.status = NO_REVIEWS
        if self.total_reviews < n_records:
            self.total_reviews = n_records
