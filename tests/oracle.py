"""Serial reference-semantics oracle.

A single-threaded, plain-Python implementation of the crawl spec
(go_scrapper_ray/flow.py docstring) that reproduces the reference's flows
(/root/reference/main.go:255-329 yelpSpiderRun; Flow 1 standard, Flow 2
search+match, Flow 3 incremental windows) over the synthetic corpus.  The
distributed engine must match its outputs byte-for-byte:

  * per-seed JSONL record lines (ordered; Go encoder semantics)
  * per-seed statuses / meta fields
  * visit log (seq, url, status, attempt, virtual politeness ts)
  * final URL-seen set
  * link-graph edges

Orchestration here is deliberately primitive (lists + dicts + one loop); only
the pure kernels (extract/urlkit/gojson/dates/flow) are shared with the
engine, so the parity test exercises the engine's distributed machinery."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq

from go_scrapper_ray import extract, urlkit
from go_scrapper_ray.config import CrawlConfig
from go_scrapper_ray.dates import parse_mdy_or_zero
from go_scrapper_ray.flow import (
    FEED, NONREC_LANDING, NONREC_PAGE, PROFILE, SEARCH,
    NO_BUSINESS_PAGE, NO_SEARCH_RESULTS, PAGE_FORMAT_CHANGE,
    NO_REVIEWS, NO_REVIEWS_SINCE_LAST_MATCH,
    RetryLedger, SeedOutcome, WindowCursors,
    politeness_gap_ms, status_for_fetch_error,
)
from go_scrapper_ray.gojson import encode_record_b64, record_to_jsonl
from go_scrapper_ray.minidom import parse_html
from go_scrapper_ray.state.robots import RobotsRules


def safe_review_add(lst: list[dict], rec: dict):
    """safeReviewAdd insertion sort (main.go:984-1007): descending by parsed
    source_date; insert before the first strictly-older element (ties keep
    arrival order); unparseable dates = Go zero time (sort last)."""
    dt = parse_mdy_or_zero(rec["source_date"])
    i = len(lst)
    for idx, r in enumerate(lst):
        if parse_mdy_or_zero(r["source_date"]) < dt:
            i = idx
            break
    lst.insert(i, rec)


class OracleCrawl:
    def __init__(self, corpus_dir: str, cfg: CrawlConfig | None = None,
                 enforce_robots: bool | None = None):
        d = Path(corpus_dir)
        self.cfg = cfg or CrawlConfig.from_json((d / "crawl_config.json").read_text())
        if enforce_robots is not None:
            self.cfg.ignore_robots = not enforce_robots
        pages = pq.read_table(d / "pages.parquet", columns=["url", "html"])
        self.pages = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
        st = pq.read_table(d / "page_status.parquet")
        self.page_status = {u: (s, f) for u, s, f in
                            zip(st["url"].to_pylist(), st["status"].to_pylist(),
                                st["fail_times"].to_pylist())}
        self.seeds = pq.read_table(d / "seeds.parquet").to_pylist()
        rb = pq.read_table(d / "robots.parquet")
        self.robots = {h: RobotsRules.parse(t) for h, t in
                       zip(rb["host"].to_pylist(), rb["robots_txt"].to_pylist())}

        # crawl state
        self.visit_log: list[dict] = []
        self.edges: list[tuple[str, str, str]] = []
        self.seen: dict[int, str] = {}           # url_hash -> canon url
        self.ledger = RetryLedger()
        self.host_k: dict[str, int] = {}
        self.host_ts: dict[str, int] = {}
        self.seq = 0

        # per-seed
        self.outcomes: dict[int, SeedOutcome] = {}
        self.records: dict[int, list[dict]] = {}
        self.cursors: dict[int, WindowCursors] = {}
        self.biz: dict[int, dict] = {}           # business_id, nonrec_url, minimal_count
        self.incremental: dict[int, tuple[str, ...]] = {}
        self.attempt_count: dict[tuple[int, str], int] = {}

    # ------------------------------------------------------------------ fetch
    def _effective_status(self, canon: str, attempt: int) -> int:
        if canon not in self.pages:
            if canon in self.page_status:
                return self.page_status[canon][0] or 0
            return 404
        st, ft = self.page_status.get(canon, (200, 0))
        if st != 200:
            return st
        if attempt <= ft:
            return 503
        return 200

    def _visit(self, e: dict) -> tuple[int, bytes | None]:
        """One fetch: politeness bookkeeping + visit-log row.  Returns
        (status, html)."""
        host = urlkit.host_of(e["canon"])
        k = self.host_k.get(host, 0)
        gap = politeness_gap_ms(self.cfg.jitter_seed, self.cfg.delay_ms,
                                self.cfg.jitter_ms, host, k)
        ts = self.host_ts.get(host, 0) + gap
        self.host_k[host] = k + 1
        self.host_ts[host] = ts
        status = self._effective_status(e["canon"], e["attempt"])
        self.visit_log.append({
            "seq": self.seq, "round": e["round"], "seed_id": e["seed_id"],
            "url": e["url"], "canon_url": e["canon"],
            "url_hash": urlkit.url_hash64(e["canon"]), "host": host,
            "depth": e["depth"], "kind": e["kind"], "status": status,
            "attempt": e["attempt"], "virtual_ts_ms": ts,
        })
        self.seq += 1
        html = self.pages.get(e["canon"]) if status == 200 else None
        return status, html

    # ------------------------------------------------------------------ run
    def run(self) -> "OracleCrawl":
        pending: list[dict] = []

        def push(seed_id, url, kind, depth, parent_seq, emit_idx, attempt=1,
                 src=None, rel=None):
            canon = urlkit.canonicalize(url)
            host = urlkit.host_of(canon)
            if not self.cfg.host_allowed(host):
                return  # colly AllowedDomains drop (collyfunc.go:67)
            if not self.cfg.ignore_robots:
                rules = self.robots.get(host)
                if rules is not None and not rules.allowed(canon):
                    return
            h = urlkit.url_hash64(canon)
            if attempt == 1:
                if h in self.seen:
                    return  # engine-level URL-seen set (north rule D1)
                self.seen[h] = canon
            if src is not None:
                self.edges.append((src, canon, rel))
            pending.append({"seed_id": seed_id, "url": url, "canon": canon,
                            "kind": kind, "depth": depth,
                            "parent_seq": parent_seq, "emit_idx": emit_idx,
                            "attempt": attempt})

        # ---- seed intake (Flow selection, main.go:258-303)
        for s in self.seeds:
            sid = s["seed_id"]
            out = SeedOutcome(seed_id=sid, profile_key=s["url"])
            self.outcomes[sid] = out
            self.records[sid] = []
            self.cursors[sid] = WindowCursors()
            self.biz[sid] = {"business_id": "", "minimal": 0, "nonrec_url": "",
                             "first_page_only": bool(s["first_page_only"])}
            if s["last_review_hashes"]:
                self.incremental[sid] = tuple(s["last_review_hashes"])
            if s["url"] == "":
                u = extract.search_url(s["business_name"], s["addr_street"],
                                       s["addr_city"], s["addr_state"],
                                       s["addr_zip"], self.cfg.site_base)
                push(sid, u, SEARCH, 0, -1, sid)
            else:
                key, rejected = urlkit.canonicalize_seed(
                    s["url"], self.cfg.force_hosts, self.cfg.force_to)
                if rejected:
                    out.status = NO_BUSINESS_PAGE
                    out.rejected = True
                    out.no_meta = True
                    continue
                push(sid, key, PROFILE, 0, -1, sid)

        # ---- rounds
        rnd = 0
        while pending:
            entries = sorted(pending, key=lambda e: (
                e["seed_id"], e["depth"], e["parent_seq"], e["emit_idx"],
                e["attempt"]))
            pending = []
            for e in entries:
                e["round"] = rnd
                self._process(e, push, rnd)
            # incremental window growth for drained seeds (Flow 3)
            active = {e["seed_id"] for e in pending}
            for sid, hashes in self.incremental.items():
                if sid in active:
                    continue
                cur = self.cursors[sid]
                if cur.matched or not self.records[sid]:
                    continue
                if self._check_watermark(sid, hashes):
                    continue
                if cur.exhausted():
                    continue
                feed_starts, non_starts = cur.grow()
                b = self.biz[sid]
                base = extract.review_feed_url(b["business_id"], self.cfg.site_base)
                pseq = b.get("profile_seq", -1)
                for j, st in enumerate(feed_starts):
                    push(sid, base + "&start=" + str(st), FEED, 2,
                         pseq, 1000 + cur.loop_start + j)
                for j, st in enumerate(non_starts):
                    push(sid, b["nonrec_url"] + "?not_recommended_start=" + str(st),
                         NONREC_PAGE, 2, b.get("landing_seq", -1),
                         1000 + cur.non_loop_start + j)
            rnd += 1

        # final watermark check (match may arrive in the last window)
        for sid, hashes in self.incremental.items():
            if not self.cursors[sid].matched and self.records[sid]:
                self._check_watermark(sid, hashes)

        # ---- finalize (main.go:305-328)
        for s in self.seeds:
            sid = s["seed_id"]
            out = self.outcomes[sid]
            if out.rejected:
                continue
            if out.profile_key == "":
                out.status = NO_SEARCH_RESULTS  # main.go:322-327 overwrite
                continue
            out.finalize_status(len(self.records[sid]))
        return self

    # ------------------------------------------------------------- processing
    def _check_watermark(self, sid: int, hashes: tuple[str, ...]) -> bool:
        """CheckLastReviewHash (main.go:950-960): truncate the ORDERED list at
        the first matching hash."""
        lst = self.records[sid]
        for i, r in enumerate(lst):
            if r["review_hash"] in hashes:
                self.records[sid] = lst[:i]
                self.cursors[sid].matched = True
                self.outcomes[sid].status = NO_REVIEWS_SINCE_LAST_MATCH
                return True
        return False

    def _fail(self, e: dict, status: int, push, rnd: int):
        key = f"{e['seed_id']}|{e['canon']}"
        if self.ledger.allow_retry(key):
            push(e["seed_id"], e["url"], e["kind"], e["depth"],
                 e["parent_seq"], e["emit_idx"], attempt=e["attempt"] + 1)
            return
        st = status_for_fetch_error(e["kind"], status,
                                    self.biz[e["seed_id"]]["minimal"])
        if st is not None:
            self.outcomes[e["seed_id"]].status = st

    def _process(self, e: dict, push, rnd: int):
        sid = e["seed_id"]
        out = self.outcomes[sid]
        b = self.biz[sid]
        status, html = self._visit(e)
        if status != 200:
            self._fail(e, status, push, rnd)
            return
        page_seq = self.seq - 1
        kind = e["kind"]

        if kind == SEARCH:
            root = parse_html(html).select_first("html")
            cands = extract.extract_serp_candidates(root) if root is not None else []
            if not cands:
                return  # profile_key stays "" → NO_SEARCH_RESULTS at finalize
            s = self.seeds[sid]
            tname = s["business_name"]
            ttext = extract.target_text(s["addr_street"], s["addr_city"],
                                        s["addr_state"], s["addr_zip"])
            w = extract.match_winner(tname, ttext, cands)
            key = self.cfg.site_base + cands[w]["url"]  # main.go:442
            out.profile_key = key
            canon_key, rejected = urlkit.canonicalize_seed(
                key, self.cfg.force_hosts, self.cfg.force_to)
            if rejected:
                out.status = NO_BUSINESS_PAGE
                out.rejected = True
                out.no_meta = True
                return
            push(sid, canon_key, PROFILE, 1, page_seq, 0,
                 src=e["canon"], rel="search_result")
            return

        if kind == PROFILE:
            root = parse_html(html).select_first("html")
            prof = extract.extract_profile(root)
            if b["business_id"] == "":
                b["business_id"] = prof["business_id"]
            if b["business_id"] == "":
                # missing biz id retries the fetch (main.go:511-521)
                key = f"{sid}|{e['canon']}"
                if self.ledger.allow_retry(key):
                    push(sid, e["url"], PROFILE, e["depth"],
                         e["parent_seq"], e["emit_idx"], attempt=e["attempt"] + 1)
                else:
                    out.status = PAGE_FORMAT_CHANGE
                return
            b["profile_seq"] = page_seq
            if prof["histogram_found"]:
                out.score = prof["score"]
                out.total_reviews = prof["total_reviews"]
            incremental = sid in self.incremental
            if prof["review_count"] is not None:
                b["minimal"] = prof["review_count"]
                self.cursors[sid].normal_count = prof["review_count"]
                feeds, _ = extract.profile_fanout(
                    b["business_id"], prof["review_count"], e["canon"],
                    b["first_page_only"], incremental, self.cfg.site_base)
                if incremental:
                    self.cursors[sid].loop_end = 50
                for j, u in enumerate(feeds):
                    push(sid, u, FEED, e["depth"] + 1, page_seq, j,
                         src=e["canon"], rel="pagination")
            _, nonrec = extract.profile_fanout(
                b["business_id"], None, e["canon"], b["first_page_only"],
                incremental, self.cfg.site_base)
            push(sid, nonrec, NONREC_LANDING, e["depth"] + 1, page_seq, 10_000,
                 src=e["canon"], rel="non_rec")
            return

        if kind == FEED:
            recs = extract.extract_review_feed(html)
            self._add_records(sid, recs, page_seq)
            return

        if kind == NONREC_LANDING:
            root = parse_html(html).select_first("html")
            res = extract.extract_nonrec_landing(root)
            if res["no_reviews"]:
                out.status = NO_REVIEWS
                return
            if res["count"] is None:
                return
            b["minimal"] = res["count"]
            b["nonrec_url"] = e["canon"]
            b["landing_seq"] = page_seq
            self.cursors[sid].non_count = res["count"]
            incremental = sid in self.incremental
            urls = extract.nonrec_fanout(e["canon"], res["count"],
                                         b["first_page_only"], incremental)
            if incremental:
                self.cursors[sid].non_loop_end = 50
            for j, u in enumerate(urls):
                push(sid, u, NONREC_PAGE, e["depth"] + 1, page_seq, j,
                     src=e["canon"], rel="pagination")
            return

        if kind == NONREC_PAGE:
            root = parse_html(html).select_first("html")
            recs = extract.extract_nonrec_page(root)
            self._add_records(sid, recs, page_seq)
            return

    def _add_records(self, sid: int, recs: list[dict], page_seq: int):
        for j, r in enumerate(recs):
            r = extract.finalize_record_identity(r)
            r["scraped_at"] = self.cfg.scraped_at
            r["page_seq"] = page_seq
            r["emit_idx"] = j
            safe_review_add(self.records[sid], r)

    # ------------------------------------------------------------------ output
    def jsonl_lines(self, sid: int) -> list[str]:
        return [record_to_jsonl(encode_record_b64(r)) for r in self.records[sid]]

    def meta(self, sid: int) -> dict | None:
        out = self.outcomes[sid]
        if out.no_meta:
            return None
        return {
            "histogram": {"primary": {"score": out.score,
                                      "total_revews": out.total_reviews}},
            "profile_key": out.profile_key,
            "scraping_status": out.status,
            "item_scraped_count": out.item_scraped_count,
        }
