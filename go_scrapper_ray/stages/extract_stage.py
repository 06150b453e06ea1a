"""ExtractStage — per-page extraction as an actor-pool ``map_batches`` stage.

Input: fetched page rows (scheduled columns + ``status`` + ``html``).
Output: a uniform tall table, one row per extracted artifact:

    out_kind ∈ {record, link, event}
    seed_id / page_seq / emit_idx / sort_ts / review_hash / payload(JSON)

* ``record`` rows are the review records (raw text; identity hash applied) —
  they stream to per-round Parquet and NEVER pass through the driver.
* ``link`` rows are fan-out URLs (pagination, non-rec landing, resolved
  profile) — small; the driver routes them through seen-shards → frontier.
* ``event`` rows are control-flow signals (fetch_fail, profile_nobizid,
  profile_ok, landing_ok, no_reviews, serp_empty, hash_hit) — tiny; they
  drive the driver's per-seed status machine.

Stateful setup (seed configs, watermark hash sets) is fetched from the object
store ONCE per actor in ``__init__`` (broadcast via ray.put — no per-batch
re-shipping)."""

from __future__ import annotations

import json

import pyarrow as pa

import ray

from .. import extract, urlkit
from ..fastpath import FastpathMiss, nonrec_items, scan as fast_scan
from ..flow import FEED, NONREC_LANDING, NONREC_PAGE, PROFILE, SEARCH

NONREC_REGION = "not-recommended-reviews"

OUT_SCHEMA = pa.schema([
    ("out_kind", pa.string()),
    ("seed_id", pa.int64()),
    ("page_seq", pa.int64()),
    ("emit_idx", pa.int32()),
    ("sort_ts", pa.int64()),
    ("review_hash", pa.string()),
    ("payload", pa.string()),
    # record rows only: the final Go-encoder JSONL line, rendered HERE in
    # the distributed extract wave (it depends only on the payload) so the
    # finalize fan-in is a sort+truncate+write, not a 32-wide render burst
    # (measured: the render anti-scaled 7.4s@8cpu -> 10.1s@32cpu)
    ("jsonl", pa.string()),
    # link rows use NATIVE columns (canonicalized + hashed + host/robots
    # filtered IN the distributed kernel) so the driver never runs per-link
    # Python kernels — at frontier scale the driver only routes hashes
    ("l_url", pa.string()),
    ("l_canon", pa.string()),
    ("l_hash", pa.uint64()),
    ("l_host", pa.string()),
    ("l_hosthash", pa.uint64()),
    ("l_kind", pa.string()),
    ("l_depth", pa.int32()),
    ("l_rel", pa.string()),
    # emitting page's canon URL — lets the SEEN SHARDS build edge rows at
    # resolve() so links never pass through the driver (shard-to-shard
    # routing; crawl.py round-loop docstring)
    ("l_src", pa.string()),
])


# Worker-process-global stage cache so the stage can run as Ray TASKS (no
# actor-pool startup per crawl round) while still paying broadcast-fetch and
# setup costs once per worker process (see sources/pagestore.py note).
_STAGE_CACHE: dict[str, "ExtractStage"] = {}

# DOM parsing allocates millions of small objects per batch; the default
# gen-0 threshold (700) makes CPython walk young objects constantly during
# parse.  Raising it once per worker process cuts measurable parse time
# without disabling collection.
import gc as _gc  # noqa: E402

_gc.set_threshold(50_000, 25, 25)


def extract_batch(batch: pa.Table, seeds_ref, cfg_dict: dict,
                  watermarks_ref, store_dir: str | None = None) -> pa.Table:
    key = seeds_ref.hex()
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = ExtractStage(seeds_ref, cfg_dict, watermarks_ref, store_dir)
        _STAGE_CACHE[key] = stage
    import os as _os
    _pdir = _os.environ.get("GSR_EXTRACT_PROFILE")
    if _pdir:
        import cProfile
        pr = cProfile.Profile()
        pr.enable()
        out = stage(batch)
        pr.disable()
        pr.dump_stats(f"{_pdir}/p-{_os.getpid()}-{id(batch)}.prof")
        return out
    return stage(batch)


class ExtractStage:
    def __init__(self, seeds_ref, cfg_dict: dict, watermarks_ref,
                 store_dir: str | None = None):
        # once-per-actor state (broadcast refs)
        self.seeds = ray.get(seeds_ref)          # seed_id -> seed config dict
        self.cfg = cfg_dict
        self.watermarks = ray.get(watermarks_ref)  # seed_id -> set(hashes)
        # memory-mapped page-store bucket tables, opened LAZILY per bucket
        # through the per-worker cache shared with the fetch kernel
        # (pagestore.get_bucket); rows reference html via (bucket, html_row)
        # so no html column is ever materialized between fetch and extract.
        self.store_dir = store_dir
        from ..minidom import parse_html  # bind once
        self._parse = parse_html
        # link-filter state, built once per worker: allowed-host set
        # (colly AllowedDomains, collyfunc.go:67,126) and per-host robots
        # rules parsed from the broadcast robots table
        ah = cfg_dict.get("allowed_hosts")
        self.allowed_hosts = set(ah) if ah is not None else None
        self.robots = None
        if not cfg_dict.get("ignore_robots", True):
            rp = cfg_dict.get("robots_parquet")
            if rp:
                import pyarrow.parquet as pq
                from ..state.robots import RobotsRules
                t = pq.read_table(rp)
                self.robots = {h: RobotsRules.parse(s) for h, s in
                               zip(t["host"].to_pylist(),
                                   t["robots_txt"].to_pylist())}

    def _link_allowed(self, canon: str, host: str) -> bool:
        if self.allowed_hosts is not None and host not in self.allowed_hosts:
            return False
        if self.robots is not None:
            rules = self.robots.get(host)
            if rules is not None and not rules.allowed(canon):
                return False
        return True

    # ------------------------------------------------------------------ rows
    def _rows(self, out, kind, seed_id, page_seq, emit_idx, payload,
              sort_ts=0, review_hash="", link=None, jsonl=""):
        out["out_kind"].append(kind)
        out["seed_id"].append(seed_id)
        out["page_seq"].append(page_seq)
        out["emit_idx"].append(emit_idx)
        out["sort_ts"].append(sort_ts)
        out["review_hash"].append(review_hash)
        out["payload"].append(
            json.dumps(payload, ensure_ascii=False) if payload is not None else "")
        out["jsonl"].append(jsonl)
        if link is None:
            link = ("", "", 0, "", 0, "", 0, "", "")
        (out["l_url"].append(link[0]), out["l_canon"].append(link[1]),
         out["l_hash"].append(link[2]), out["l_host"].append(link[3]),
         out["l_hosthash"].append(link[4]), out["l_kind"].append(link[5]),
         out["l_depth"].append(link[6]), out["l_rel"].append(link[7]),
         out["l_src"].append(link[8] if len(link) > 8 else ""))

    def _emit_records(self, out, sid, page_seq, recs):
        from ..gojson import render_record
        wm = self.watermarks.get(sid)
        scraped_at = self.cfg["scraped_at"]
        for j, r in enumerate(recs):
            # payload=None: the rendered jsonl IS the record deliverable —
            # a per-record json.dumps doubled the string churn and the
            # parquet volume for a column nothing consumed
            # posted_at IS parse_mdy(source_date) (extractors raise on
            # unparseable dates) — reuse it instead of re-parsing
            rh, line = render_record(r, scraped_at)
            self._rows(out, "record", sid, page_seq, j, None,
                       sort_ts=r["posted_at"],
                       review_hash=rh, jsonl=line)
            if wm and rh in wm:
                self._rows(out, "event", sid, page_seq, j,
                           {"type": "hash_hit"})
        # per-page record count rides COLUMNAR (out_kind='rcnt', n in
        # sort_ts) → the driver sums per seed with one Arrow group_by
        if recs:
            self._rows(out, "rcnt", sid, page_seq, len(recs), None,
                       sort_ts=len(recs))

    def _emit_rendered(self, out, sid, page_seq, rendered):
        """``_emit_records`` for pre-rendered (posted_at, review_hash,
        jsonl) tuples from the fused feed path (extract.render_review_feed)
        — same rows, no intermediate record dicts."""
        wm = self.watermarks.get(sid)
        for j, (ts, rh, line) in enumerate(rendered):
            self._rows(out, "record", sid, page_seq, j, None,
                       sort_ts=ts, review_hash=rh, jsonl=line)
            if wm and rh in wm:
                self._rows(out, "event", sid, page_seq, j,
                           {"type": "hash_hit"})
        if rendered:
            self._rows(out, "rcnt", sid, page_seq, len(rendered), None,
                       sort_ts=len(rendered))

    def _emit_links(self, out, sid, page_seq, links, emit_start: int = 0,
                    src: str = ""):
        """Canonicalize + hash + host/robots-filter links IN the kernel
        (distributed); the seen shards route the precomputed hashes."""
        for j, (url, kind, depth, rel) in enumerate(links, start=emit_start):
            canon = urlkit.canonicalize(url)
            host = urlkit.host_of(canon)
            if not self._link_allowed(canon, host):
                continue
            self._rows(out, "link", sid, page_seq, j, None,
                       link=(url, canon, urlkit.url_hash64(canon), host,
                             urlkit.host_hash64(host), kind, depth, rel,
                             src))

    # ------------------------------------------------------------------ main
    def _btab(self, bucket: int) -> pa.Table:
        from ..sources.pagestore import get_bucket
        return get_bucket(self.store_dir, bucket)[0]

    # ------------------------------------------------- fast-path dispatch
    # Each HTML page kind first tries the island scanner (fastpath.scan —
    # skips the page chrome that dominates real pages without building a
    # DOM); any structural surprise falls back to the byte-parity minidom
    # parse.  Equivalence on every fixture page: tests/test_fastpath.py.
    def _doc(self, html):
        fd, _ = fast_scan(html)
        if fd is not None:
            return fd
        return self._parse(html).select_first("html")

    def _profile_of(self, html) -> dict:
        fd, _ = fast_scan(html)
        if fd is not None:
            try:
                return extract.extract_profile(fd)
            except FastpathMiss:  # pragma: no cover - fixed selectors
                pass
        return extract.extract_profile(self._parse(html).select_first("html"))

    def _landing_of(self, html) -> dict:
        fd, _ = fast_scan(html)
        if fd is not None:
            try:
                return extract.extract_nonrec_landing(fd)
            except FastpathMiss:  # pragma: no cover
                pass
        return extract.extract_nonrec_landing(
            self._parse(html).select_first("html"))

    def _nonrec_of(self, html) -> list[dict]:
        # verify_region=False: nonrec_items IS the strict verifier (one
        # walk instead of verify+tokenize+select — this page kind was
        # ~half the crawl's extract core-seconds); on miss the region
        # extent is unproven, so fall back to the FULL parse, not
        # fragment_tree.
        fd, region = fast_scan(html, region_class=NONREC_REGION,
                               verify_region=False)
        if fd is not None and region is not None:
            try:
                return extract.extract_nonrec_from_items(
                    nonrec_items(region))
            except FastpathMiss:
                pass
        elif fd is not None:
            return []  # no reviews container -> select() finds no <li>
        return extract.extract_nonrec_page(
            self._parse(html).select_first("html"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {f.name: [] for f in OUT_SCHEMA}
        # per-COLUMN pylist + index loop, not batch.to_pylist(): the row
        # dicts (14 keys x 220k rows/crawl) were pure allocation churn on
        # the hot wave
        col = {n: batch[n].to_pylist() for n in
               ("seed_id", "seq", "kind", "status", "url", "canon",
                "url_hash", "host", "depth", "parent_seq", "emit_idx",
                "attempt")}
        c_seed, c_seq, c_kind, c_status = (col["seed_id"], col["seq"],
                                           col["kind"], col["status"])
        use_store = self.store_dir is not None and \
            "html_row" in batch.schema.names
        if use_store:
            c_hrow = batch["html_row"].to_pylist()
            c_bucket = batch["bucket"].to_pylist()
            # html COLUMN cached per bucket: table["html"] builds a fresh
            # ChunkedArray wrapper per call, pure churn row-wise on the
            # bucket-sorted batch
            html_cols: dict[int, object] = {}
        else:
            c_html = batch["html"].to_pylist()
        for i in range(batch.num_rows):
            sid = c_seed[i]
            page_seq = c_seq[i]
            kind = c_kind[i]
            if c_status[i] != 200:
                # COLUMNAR retry row (out_kind='retry'): canon/hash/host come
                # from the failed row itself, so the driver's retry path does
                # no URL kernels.  Layout: page_seq=original parent_seq,
                # emit_idx=original link emit_idx, sort_ts=attempt,
                # l_rel=str(status) for the exhaustion status machine.
                self._rows(out, "retry", sid, col["parent_seq"][i],
                           col["emit_idx"][i], None, sort_ts=col["attempt"][i],
                           link=(col["url"][i], col["canon"][i],
                                 col["url_hash"][i], col["host"][i],
                                 urlkit.host_hash64(col["host"][i]),
                                 kind, col["depth"][i],
                                 str(c_status[i])))
                continue
            if use_store:
                b = c_bucket[i]
                hc = html_cols.get(b)
                if hc is None:
                    hc = html_cols[b] = self._btab(b)["html"]
                html = hc[c_hrow[i]].as_py()
            else:
                html = c_html[i]
            seed = self.seeds[sid]

            if kind == SEARCH:
                root = self._doc(html)
                cands = extract.extract_serp_candidates(root) if root is not None else []
                if not cands:
                    self._rows(out, "event", sid, page_seq, 0,
                               {"type": "serp_empty"})
                    continue
                ttext = extract.target_text(seed["addr_street"], seed["addr_city"],
                                            seed["addr_state"], seed["addr_zip"])
                w = extract.match_winner(seed["business_name"], ttext, cands)
                key = self.cfg["site_base"] + cands[w]["url"]  # main.go:442
                canon_key, rejected = urlkit.canonicalize_seed(
                    key, tuple(self.cfg["force_hosts"]), self.cfg["force_to"])
                self._rows(out, "event", sid, page_seq, 0,
                           {"type": "serp_resolved", "profile_key": key,
                            "rejected": rejected})
                if not rejected:
                    self._emit_links(out, sid, page_seq,
                                     [(canon_key, PROFILE, 1, "search_result")],
                                     src=col["canon"][i])
                continue

            if kind == PROFILE:
                prof = self._profile_of(html)
                if prof["business_id"] == "":
                    self._rows(out, "retry", sid, col["parent_seq"][i],
                               col["emit_idx"][i], None, sort_ts=col["attempt"][i],
                               link=(col["url"][i], col["canon"][i],
                                     col["url_hash"][i], col["host"][i],
                                     urlkit.host_hash64(col["host"][i]),
                                     PROFILE, col["depth"][i], "nobizid"))
                    continue
                incremental = bool(self.watermarks.get(sid))
                links = []
                if prof["review_count"] is not None:
                    feeds, _ = extract.profile_fanout(
                        prof["business_id"], prof["review_count"], col["canon"][i],
                        bool(seed["first_page_only"]), incremental,
                        self.cfg["site_base"])
                    links += [(u, FEED, col["depth"][i] + 1, "pagination") for u in feeds]
                _, nonrec = extract.profile_fanout(
                    prof["business_id"], None, col["canon"][i],
                    bool(seed["first_page_only"]), incremental,
                    self.cfg["site_base"])
                self._rows(out, "event", sid, page_seq, 0,
                           {"type": "profile_ok",
                            "business_id": prof["business_id"],
                            "score": prof["score"],
                            "total_reviews": prof["total_reviews"],
                            "histogram_found": prof["histogram_found"],
                            "review_count": prof["review_count"]})
                # non-rec landing is emitted LAST with a high emit_idx so the
                # canonical order puts it after the feed pages (oracle parity)
                self._emit_links(out, sid, page_seq, links,
                                 src=col["canon"][i])
                self._emit_links(out, sid, page_seq,
                                 [(nonrec, NONREC_LANDING, col["depth"][i] + 1,
                                   "non_rec")], emit_start=10_000,
                                 src=col["canon"][i])
                continue

            if kind == FEED:
                rendered = extract.render_review_feed(
                    html, self.cfg["scraped_at"])
                self._emit_rendered(out, sid, page_seq, rendered)
                continue

            if kind == NONREC_LANDING:
                res = self._landing_of(html)
                if res["no_reviews"]:
                    self._rows(out, "event", sid, page_seq, 0,
                               {"type": "no_reviews"})
                    continue
                if res["count"] is None:
                    continue
                incremental = bool(self.watermarks.get(sid))
                urls = extract.nonrec_fanout(col["canon"][i], res["count"],
                                             bool(seed["first_page_only"]),
                                             incremental)
                self._rows(out, "event", sid, page_seq, 0,
                           {"type": "landing_ok", "count": res["count"],
                            "nonrec_url": col["canon"][i]})
                self._emit_links(out, sid, page_seq,
                                 [(u, NONREC_PAGE, col["depth"][i] + 1, "pagination")
                                  for u in urls], src=col["canon"][i])
                continue

            if kind == NONREC_PAGE:
                recs = self._nonrec_of(html)
                self._emit_records(out, sid, page_seq, recs)
                continue

        return pa.table(out, schema=OUT_SCHEMA)
