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
from hashlib import blake2b

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


def politeness_gap_ms(jitter_seed: int, delay_ms: int, jitter_ms: int,
                      host: str, k: int) -> int:
    """Virtual-clock inter-request gap for the k-th request to a host:
    Delay + U(0, RandomDelay) (collyfunc.go:115-119) with deterministic,
    seeded jitter so scheduling is reproducible."""
    if jitter_ms <= 0:
        return delay_ms
    h = blake2b(f"{jitter_seed}|{host}|{k}".encode(), digest_size=8)
    return delay_ms + int.from_bytes(h.digest(), "little") % jitter_ms


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
