"""SeedCtlShard — one shard of the per-seed crawl state machine.

Sharding key: ``seed_id % num_seed_shards``.  Each shard owns, for its
seeds, everything the driver used to hold per seed: the SeedOutcome
status machine, incremental WindowCursors, business fields, record
tallies and the retry ledger (all O(seeds) state).  The round tasks'
control rows (events / retries / record counts) are sliced columnar by
seed shard and applied HERE, in parallel with the seen shards' link
resolves — the driver's per-round work drops from O(events + retries)
to O(shards): it routes table slices and unions small seed-id sets.

This is the decentralization step BASELINE.md documented after round 2's
core-utilization timeline localized ~1.25 s/job of apply_ctrl driver
time (the one remaining O(seeds) section) at 96k seeds.

Determinism (byte-parity with the serial oracle is test-enforced):

* all control rows of one seed land in one shard, and each shard sorts
  its slice by (page_seq, emit_idx) — the same per-seed event order the
  serial driver imposed globally;
* retry pushes go straight to the frontier shards; concurrent
  interleaving with the seen shards' link pushes only permutes the
  frontier's ``arrival`` stamps, which are a tiebreak that can never
  decide: release order keys (host, seed, depth, parent_seq, emit_idx,
  attempt) are unique by construction (emit_idx is unique per page,
  attempt separates retries);
* window-growth entries flow through the SAME deterministic
  submit→resolve path links and intake use (winner per url_hash =
  min (page_seq, emit_idx)), so two shards growing a colliding URL in
  the same wave cannot race the seen check.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

import ray

from .. import extract, urlkit
from ..flow import (
    NO_BUSINESS_PAGE, NO_REVIEWS, NO_REVIEWS_SINCE_LAST_MATCH,
    NO_SEARCH_RESULTS, FEED, NONREC_PAGE,
    PAGE_FORMAT_CHANGE, RetryLedger, SeedOutcome, WindowCursors,
    status_for_fetch_error,
)
from .robots import RobotsRules


@ray.remote(num_cpus=0)
class SeedCtlShard:
    """num_cpus=0 bookkeeping actor (same contract as SeenShard): its work
    is dict ops over tiny control slices, never batch compute."""

    def __init__(self, shard_id: int, cfg_dict: dict,
                 frontier: list, seen: list,
                 robots_path: str | None = None):
        self.shard_id = shard_id
        self.cfg = cfg_dict  # site_base, allowed_hosts, ignore_robots
        self.frontier = frontier
        self.seen = seen
        self.outcomes: dict[int, SeedOutcome] = {}
        self.cursors: dict[int, WindowCursors] = {}
        self.biz: dict[int, dict] = {}
        self.record_counts: dict[int, int] = {}
        self.ledger = RetryLedger()
        self.watermarks: dict[int, set] = {}
        self.robots: dict[str, RobotsRules] = {}
        if robots_path and not cfg_dict.get("ignore_robots", True):
            import pyarrow.parquet as pq
            t = pq.read_table(robots_path)
            self.robots = {h: RobotsRules.parse(s) for h, s in
                           zip(t["host"].to_pylist(),
                               t["robots_txt"].to_pylist())}

    # ------------------------------------------------------------- intake
    def init_seeds(self, sids: list[int], urls: list[str],
                   wm: dict[int, list[str]]) -> int:
        for sid, url in zip(sids, urls):
            self.outcomes[sid] = SeedOutcome(seed_id=sid, profile_key=url)
            self.cursors[sid] = WindowCursors()
            self.biz[sid] = {"business_id": "", "minimal": 0,
                             "nonrec_url": "", "profile_seq": -1,
                             "landing_seq": -1}
            self.record_counts[sid] = 0
        for sid, hashes in wm.items():
            self.watermarks[sid] = set(hashes)
        return len(sids)

    def mark_rejected(self, sids: list[int]) -> int:
        for sid in sids:
            out = self.outcomes[sid]
            out.status = NO_BUSINESS_PAGE
            out.rejected = True
            out.no_meta = True
        return len(sids)

    # -------------------------------------------------------------- apply
    def apply(self, *ctrl_tbls: pa.Table) -> list[int]:
        """One round's control rows for THIS shard's seeds: record-count
        tallies (columnar), the per-seed event state machine, and the
        retry ledger.  Allowed retries push straight to the frontier
        shards (batched per shard); returns the retried seed ids for the
        driver's window-growth gating.

        Takes one plasma-resident slice per round task (variadic refs
        resolve zero-copy); per-slice row order is immaterial because the
        event walk below sorts by the unique (page_seq, emit_idx) key and
        the rcnt tally is an order-free group-by."""
        ctrl_tbl = (ctrl_tbls[0] if len(ctrl_tbls) == 1
                    else pa.concat_tables(ctrl_tbls))
        # per-page record counts ride in sort_ts of 'rcnt' rows
        rcnt = ctrl_tbl.filter(pc.equal(ctrl_tbl["out_kind"], "rcnt"))
        if rcnt.num_rows:
            agg = rcnt.group_by("seed_id").aggregate([("sort_ts", "sum")])
            for sid, s in zip(agg["seed_id"].to_pylist(),
                              agg["sort_ts_sum"].to_pylist()):
                self.record_counts[sid] += int(s)
        # events, in the serial driver's per-seed order
        ev_t = ctrl_tbl.filter(
            pc.equal(ctrl_tbl["out_kind"], "event")).select(
            ["seed_id", "page_seq", "emit_idx", "payload"])
        ev_t = ev_t.take(pc.sort_indices(ev_t, sort_keys=[
            ("page_seq", "ascending"), ("emit_idx", "ascending")]))
        ev = zip(ev_t["seed_id"].to_pylist(), ev_t["page_seq"].to_pylist(),
                 ev_t["payload"].to_pylist())
        to_push: list[dict] = []
        for sid, page_seq, payload in ev:
            out = self.outcomes[sid]
            b = self.biz[sid]
            p = json.loads(payload)
            t = p["type"]
            if t == "profile_ok":
                b["business_id"] = p["business_id"]
                b["profile_seq"] = page_seq
                if p["histogram_found"]:
                    out.score = p["score"]
                    out.total_reviews = p["total_reviews"]
                if p["review_count"] is not None:
                    b["minimal"] = p["review_count"]
                    self.cursors[sid].normal_count = p["review_count"]
                    if sid in self.watermarks:
                        self.cursors[sid].loop_end = 50
            elif t == "serp_resolved":
                out.profile_key = p["profile_key"]
                if p["rejected"]:
                    out.status = NO_BUSINESS_PAGE
                    out.rejected = True
                    out.no_meta = True
            elif t == "serp_empty":
                pass
            elif t == "landing_ok":
                b["minimal"] = p["count"]
                b["nonrec_url"] = p["nonrec_url"]
                b["landing_seq"] = page_seq
                self.cursors[sid].non_count = p["count"]
                if sid in self.watermarks:
                    self.cursors[sid].non_loop_end = 50
            elif t == "no_reviews":
                out.status = NO_REVIEWS
            elif t == "hash_hit":
                self.cursors[sid].matched = True
        # retries: ledger + exhaustion status machine (the failed row's
        # canon/hash/host ride along, no URL kernels here)
        retry_tbl = ctrl_tbl.filter(pc.equal(ctrl_tbl["out_kind"], "retry"))
        if retry_tbl.num_rows:
            order = pc.sort_indices(
                retry_tbl, sort_keys=[("page_seq", "ascending"),
                                      ("emit_idx", "ascending")])
            retry_tbl = retry_tbl.take(order)
            cols = {c: retry_tbl[c].to_pylist()
                    for c in ("seed_id", "page_seq", "emit_idx", "sort_ts",
                              "l_url", "l_canon", "l_hash", "l_host",
                              "l_hosthash", "l_kind", "l_depth", "l_rel")}
            for i in range(retry_tbl.num_rows):
                sid = cols["seed_id"][i]
                key = f"{sid}|{cols['l_canon'][i]}"
                if self.ledger.allow_retry(key):
                    to_push.append(
                        {"seed_id": sid, "url": cols["l_url"][i],
                         "canon": cols["l_canon"][i],
                         "host": cols["l_host"][i],
                         "host_hash": cols["l_hosthash"][i],
                         "url_hash": cols["l_hash"][i],
                         "kind": cols["l_kind"][i],
                         "depth": cols["l_depth"][i],
                         "parent_seq": cols["page_seq"][i],
                         "emit_idx": cols["emit_idx"][i],
                         "attempt": cols["sort_ts"][i] + 1})
                else:
                    out = self.outcomes[sid]
                    if cols["l_rel"][i] == "nobizid":
                        out.status = PAGE_FORMAT_CHANGE
                    else:
                        st = status_for_fetch_error(
                            cols["l_kind"][i], int(cols["l_rel"][i]),
                            self.biz[sid]["minimal"])
                        if st is not None:
                            out.status = st
        # retries bypass the seen check (main.go:337 Retry()) — push
        # straight to the frontier shards, batched per shard
        if to_push:
            by_fshard: dict[int, list[dict]] = {}
            nf = len(self.frontier)
            for e in to_push:
                by_fshard.setdefault(e["host_hash"] % nf, []).append(e)
            ray.get([self.frontier[h].push.remote(es)
                     for h, es in by_fshard.items()])
        return sorted({e["seed_id"] for e in to_push})

    # --------------------------------------------------------------- grow
    def grow(self, active_sids: list[int]) -> bool:
        """Flow 3 window growth for this shard's drained incremental seeds
        (callLastReviewURL, main.go:615-643).  Entries are submitted to the
        seen shards on the deterministic submit→resolve path (the driver
        triggers the resolve wave after all shards grew)."""
        active = set(active_sids)
        entries: list[dict] = []
        grew = False
        for sid in self.watermarks:
            if sid in active:
                continue
            cur = self.cursors[sid]
            if (cur.matched or self.record_counts[sid] == 0
                    or cur.exhausted()):
                continue
            feed_starts, non_starts = cur.grow()
            b = self.biz[sid]
            base = extract.review_feed_url(b["business_id"],
                                           self.cfg["site_base"])
            for j, st in enumerate(feed_starts):
                entries.append({"seed_id": sid,
                                "url": base + "&start=" + str(st),
                                "kind": FEED, "depth": 2,
                                "parent_seq": b["profile_seq"],
                                "emit_idx": 1000 + cur.loop_start + j})
            for j, st in enumerate(non_starts):
                entries.append({"seed_id": sid,
                                "url": b["nonrec_url"]
                                       + "?not_recommended_start=" + str(st),
                                "kind": NONREC_PAGE, "depth": 2,
                                "parent_seq": b["landing_seq"],
                                "emit_idx": 1000 + cur.non_loop_start + j})
            if feed_starts or non_starts:
                grew = True
        if entries:
            self._submit_entries(entries)
        return grew

    def _submit_entries(self, entries: list[dict]) -> None:
        """Canonicalize + host/robots-filter raw entries and submit them to
        the seen shards in the link-row schema (same filters the old
        driver-side _push_entries ran, so robots-blocked URLs never enter
        the seen set)."""
        import numpy as np

        allowed = self.cfg.get("allowed_hosts")
        allowed = set(allowed) if allowed is not None else None
        check_robots = not self.cfg.get("ignore_robots", True)
        rows = {k: [] for k in ("seed_id", "page_seq", "emit_idx", "l_url",
                                "l_canon", "l_hash", "l_host", "l_hosthash",
                                "l_kind", "l_depth", "l_rel", "l_src")}
        for e in entries:
            canon = urlkit.canonicalize(e["url"])
            host = urlkit.host_of(canon)
            if allowed is not None and host not in allowed:
                continue
            if check_robots:
                rules = self.robots.get(host)
                if rules is not None and not rules.allowed(canon):
                    continue
            rows["seed_id"].append(e["seed_id"])
            rows["page_seq"].append(e["parent_seq"])
            rows["emit_idx"].append(e["emit_idx"])
            rows["l_url"].append(e["url"])
            rows["l_canon"].append(canon)
            rows["l_hash"].append(urlkit.url_hash64(canon))
            rows["l_host"].append(host)
            rows["l_hosthash"].append(urlkit.host_hash64(host))
            rows["l_kind"].append(e["kind"])
            rows["l_depth"].append(e["depth"])
            rows["l_rel"].append("grow")
            rows["l_src"].append("")
        if not rows["seed_id"]:
            return
        t = pa.table({
            "seed_id": pa.array(rows["seed_id"], pa.int64()),
            "page_seq": pa.array(rows["page_seq"], pa.int64()),
            "emit_idx": pa.array(rows["emit_idx"], pa.int32()),
            "l_url": pa.array(rows["l_url"], pa.string()),
            "l_canon": pa.array(rows["l_canon"], pa.string()),
            "l_hash": pa.array(rows["l_hash"], pa.uint64()),
            "l_host": pa.array(rows["l_host"], pa.string()),
            "l_hosthash": pa.array(rows["l_hosthash"], pa.uint64()),
            "l_kind": pa.array(rows["l_kind"], pa.string()),
            "l_depth": pa.array(rows["l_depth"], pa.int32()),
            "l_rel": pa.array(rows["l_rel"], pa.string()),
            "l_src": pa.array(rows["l_src"], pa.string()),
        })
        hashes = t["l_hash"].to_numpy(zero_copy_only=False)
        shard = hashes % len(self.seen)
        ray.get([self.seen[int(s)].submit.remote(
                    t.take(pa.array(np.flatnonzero(shard == s))))
                 for s in np.unique(shard)])

    # ----------------------------------------------------------- finalize
    def final_state(self, count_refs: list):
        """Apply the end-of-crawl status machine (main.go:308-327) for this
        shard's seeds and return (outcomes, meta fragment).  ``count_refs``
        are the finalize tasks' counts returns (post-watermark-truncation,
        one dict per fin shard) as raw ObjectRefs: each seed shard resolves
        them itself, so the status machine overlaps the finalize sort/write
        wave and the override dicts never visit the driver.  Counts for
        seeds owned by OTHER shards are filtered by outcome membership."""
        final_counts = dict(self.record_counts)
        if count_refs:
            import ray
            for counts in ray.get(list(count_refs)):
                for sid, c in counts.items():
                    if sid in self.outcomes:
                        final_counts[sid] = c
        for sid, out in self.outcomes.items():
            if out.rejected:
                continue
            if out.profile_key == "":
                out.status = NO_SEARCH_RESULTS  # main.go:322-327
                continue
            if self.watermarks.get(sid) and self.cursors[sid].matched:
                out.status = NO_REVIEWS_SINCE_LAST_MATCH
            out.finalize_status(final_counts.get(sid, 0))
        meta = {sid: (None if o.no_meta else {
            "histogram": {"primary": {"score": o.score,
                                      "total_revews": o.total_reviews}},
            "profile_key": o.profile_key,
            "scraping_status": o.status,
            "item_scraped_count": o.item_scraped_count,
        }) for sid, o in self.outcomes.items()}
        # meta fragment pre-serialized HERE so the 8 shards json.dumps in
        # parallel — the driver's single-threaded dump of a 96k-seed meta
        # measured 0.35 s of finalize tail; it now only joins 8 strings.
        # Only the JSON ships (the dict would ride the actor boundary
        # just to be discarded driver-side).
        meta_json = ",".join(
            f"{json.dumps(str(sid))}:{json.dumps(meta[sid], separators=(',', ':'))}"
            for sid in sorted(meta))
        return self.outcomes, meta_json

    def stats(self) -> dict:
        return {"records_so_far": sum(self.record_counts.values()),
                "seeds": len(self.outcomes),
                "retry_urls": len(self.ledger.counts)}

    # ----------------------------------------------------------- checkpoint
    def checkpoint(self, path: str) -> int:
        state = {
            "ledger": self.ledger.counts,
            "record_counts": self.record_counts,
            "outcomes": {sid: vars(o) for sid, o in self.outcomes.items()},
            "cursors": {sid: vars(c) for sid, c in self.cursors.items()},
            "biz": self.biz,
            "watermarks": {sid: sorted(h) for sid, h in
                           self.watermarks.items()},
        }
        with open(path, "w") as f:
            json.dump(state, f, separators=(",", ":"))
        return len(self.outcomes)

    def restore(self, path: str) -> int:
        with open(path) as f:
            state = json.load(f)
        self.ledger = RetryLedger()
        self.ledger.counts = state["ledger"]
        self.record_counts = {int(k): v
                              for k, v in state["record_counts"].items()}
        self.outcomes = {int(k): SeedOutcome(**d)
                         for k, d in state["outcomes"].items()}
        self.cursors = {int(k): WindowCursors(**d)
                        for k, d in state["cursors"].items()}
        self.biz = {int(k): v for k, v in state["biz"].items()}
        self.watermarks = {int(k): set(v)
                           for k, v in state["watermarks"].items()}
        return len(self.outcomes)
