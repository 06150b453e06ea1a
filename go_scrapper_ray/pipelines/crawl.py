"""CrawlEngine — the distributed crawl driver loop.

Rebuild shape (SURVEY.md §3 "Rebuild shape"): per round

    FrontierShards.release() → scheduled Dataset
      → map_batches(FetchStage)        # fetch-as-lookup join vs page store
      → map_batches(ExtractStage)      # records + links + control events
      → records stream to per-round Parquet (never via the driver)
      → links: host filter → SeenShards.add_if_new → FrontierShards.push
      → events drive the per-seed status machine / incremental windows

then finalize: ``groupby(seed_id).map_groups`` imposes the reference's
insertion-sort order (date desc, schedule-time tiebreak — main.go:984-1007),
truncates at the incremental watermark (main.go:950-960), base64-encodes
(main.go:1064-1077) and renders Go-encoder JSONL lines.

Scale notes (10^10-URL design points, tested single-node):
* records NEVER pass through the driver — only links+events (≈ O(pages/10))
  and released frontier entries do.  ``seq`` assignment is the one inherently
  serial step; at cluster scale it becomes (round, shard, local_idx) without
  a driver round-trip — same total order, no central counter.
* per-seed record groups are small (one business), so the finalize "sort" is
  a groupby shuffle + in-group sort, NOT a global sort.
* the page store is hash-partitioned once; each fetch actor serves a stable
  bucket subset because the scheduled set is bucket-sorted (shuffle #1).
* every round writes records/visit-log Parquet + actor checkpoints →
  kill-and-resume re-enters at the last complete round (test_resume.py).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .. import extract, urlkit
from ..config import CrawlConfig
from ..flow import (
    FEED, NONREC_LANDING, NONREC_PAGE, PROFILE, SEARCH,
    NO_BUSINESS_PAGE, NO_REVIEWS, NO_SEARCH_RESULTS, PAGE_FORMAT_CHANGE,
    NO_REVIEWS_SINCE_LAST_MATCH,
    RetryLedger, SeedOutcome, WindowCursors, status_for_fetch_error,
)
from ..gojson import encode_record_b64, record_to_jsonl
from ..sources.pagestore import build_page_store, fetch_batch
from ..stages.extract_stage import extract_batch
from ..state.frontier import FrontierShard
from ..state.robots import RobotsRules
from ..state.seen import SeenShard

SCHED_SCHEMA = pa.schema([
    ("seq", pa.int64()), ("round", pa.int32()), ("seed_id", pa.int64()),
    ("url", pa.string()), ("canon", pa.string()), ("url_hash", pa.uint64()),
    ("bucket", pa.int32()), ("host", pa.string()), ("kind", pa.string()),
    ("depth", pa.int32()), ("parent_seq", pa.int64()),
    ("emit_idx", pa.int32()), ("attempt", pa.int32()),
    ("virtual_ts_ms", pa.int64()),
])


class CrawlEngine:
    def __init__(self, corpus_dir: str, workdir: str,
                 cfg: CrawlConfig | None = None,
                 enforce_robots: bool | None = None,
                 fetch_concurrency: int = 4, extract_concurrency: int = 4,
                 batch_size: int = 256, checkpoints: bool = True):
        self.corpus = Path(corpus_dir)
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg or CrawlConfig.from_json(
            (self.corpus / "crawl_config.json").read_text())
        if enforce_robots is not None:
            self.cfg.ignore_robots = not enforce_robots
        self.fetch_concurrency = fetch_concurrency
        self.extract_concurrency = extract_concurrency
        self.batch_size = batch_size
        self.checkpoints = checkpoints

        self.store_dir = self.workdir / "pagestore"
        build_page_store(str(self.corpus / "pages.parquet"),
                         str(self.corpus / "page_status.parquet"),
                         str(self.store_dir), self.cfg.num_fetch_buckets)

        self.seeds = pq.read_table(self.corpus / "seeds.parquet").to_pylist()
        rb = pq.read_table(self.corpus / "robots.parquet")
        self.robots = {h: RobotsRules.parse(t) for h, t in
                       zip(rb["host"].to_pylist(), rb["robots_txt"].to_pylist())}

        cfg_dict = {"delay_ms": self.cfg.delay_ms, "jitter_ms": self.cfg.jitter_ms,
                    "jitter_seed": self.cfg.jitter_seed,
                    "ignore_robots": self.cfg.ignore_robots,
                    "max_per_host_per_round": 0}
        self.frontier = [FrontierShard.remote(i, cfg_dict,
                                              str(self.corpus / "robots.parquet"))
                         for i in range(self.cfg.num_frontier_shards)]
        self.seen = [SeenShard.remote(i)
                     for i in range(self.cfg.num_seen_shards)]

        # broadcast once: seed configs + watermark hash sets
        seeds_map = {s["seed_id"]: s for s in self.seeds}
        self.watermarks = {s["seed_id"]: set(s["last_review_hashes"])
                           for s in self.seeds if s["last_review_hashes"]}
        self.seeds_ref = ray.put(seeds_map)
        self.wm_ref = ray.put(self.watermarks)
        self.cfg_dict = {"site_base": self.cfg.site_base,
                         "force_hosts": list(self.cfg.force_hosts),
                         "force_to": self.cfg.force_to,
                         "scraped_at": self.cfg.scraped_at}

        # driver-held per-seed state (small, checkpointable)
        self.outcomes: dict[int, SeedOutcome] = {}
        self.cursors: dict[int, WindowCursors] = {}
        self.biz: dict[int, dict] = {}
        self.record_counts: dict[int, int] = {}
        self.ledger = RetryLedger()
        self.seq = 0
        self.round = 0
        self.edges: list[tuple[str, str, str]] = []

    # ------------------------------------------------------------------ push
    def _push_entries(self, entries: list[dict]):
        """Host filter → seen-shards (batched) → frontier shards (batched).
        ``entries`` must already be in deterministic order."""
        kept = []
        for e in entries:
            canon = urlkit.canonicalize(e["url"])
            host = urlkit.host_of(canon)
            if not self.cfg.host_allowed(host):
                continue
            if not self.cfg.ignore_robots:
                rules = self.robots.get(host)
                if rules is not None and not rules.allowed(canon):
                    continue
            e = dict(e)
            e["canon"] = canon
            e["host"] = host
            e["url_hash"] = urlkit.url_hash64(canon)
            kept.append(e)

        # seen-filter (attempt 1 only; retries bypass — main.go:337 Retry())
        fresh = [e for e in kept if e["attempt"] == 1]
        by_shard: dict[int, list[dict]] = {}
        for e in fresh:
            by_shard.setdefault(e["url_hash"] % len(self.seen), []).append(e)
        futs = {sh: self.seen[sh].add_if_new.remote(
                    [e["url_hash"] for e in es], [e["canon"] for e in es])
                for sh, es in by_shard.items()}
        new_mask: dict[int, bool] = {}
        for sh, es in by_shard.items():
            for e, ok in zip(es, ray.get(futs[sh])):
                new_mask[id(e)] = ok

        final = []
        for e in kept:
            if e["attempt"] == 1 and not new_mask.get(id(e), True):
                continue
            if e["attempt"] == 1 and e.get("src"):
                self.edges.append((e["src"], e["canon"], e.get("rel", "")))
            final.append(e)

        by_fshard: dict[int, list[dict]] = {}
        for e in final:
            h = urlkit.host_hash64(e["host"]) % len(self.frontier)
            entry = {k: e[k] for k in ("seed_id", "url", "canon", "kind",
                                       "depth", "parent_seq", "emit_idx",
                                       "attempt")}
            entry["priority"] = e.get("priority", 0)
            by_fshard.setdefault(h, []).append(entry)
        ray.get([self.frontier[h].push.remote(es)
                 for h, es in by_fshard.items()])
        return len(final)

    # ------------------------------------------------------------------ run
    def run(self) -> "CrawlResult":
        # fresh (non-resume) run: clear prior outputs — write_parquet APPENDS
        # uniquely-named files into existing dirs, so stale round dirs would
        # silently duplicate records (found by stale-workdir probe)
        for sub in ("records", "visit_log", "out", "checkpoint"):
            p = self.workdir / sub
            if p.exists():
                shutil.rmtree(p)
        self._intake()
        while True:
            released = self._release()
            grew = False
            if released:
                self._run_round(released)
            grew = self._grow_windows()
            if not released and not grew:
                pending = sum(ray.get([f.pending.remote() for f in self.frontier]))
                if pending == 0:
                    break
        return self._finalize()

    def _intake(self):
        entries = []
        for s in self.seeds:
            sid = s["seed_id"]
            out = SeedOutcome(seed_id=sid, profile_key=s["url"])
            self.outcomes[sid] = out
            self.cursors[sid] = WindowCursors()
            self.biz[sid] = {"business_id": "", "minimal": 0, "nonrec_url": "",
                             "profile_seq": -1, "landing_seq": -1}
            self.record_counts[sid] = 0
            if s["url"] == "":
                u = extract.search_url(s["business_name"], s["addr_street"],
                                       s["addr_city"], s["addr_state"],
                                       s["addr_zip"], self.cfg.site_base)
                entries.append({"seed_id": sid, "url": u, "kind": SEARCH,
                                "depth": 0, "parent_seq": -1, "emit_idx": sid,
                                "attempt": 1})
            else:
                key, rejected = urlkit.canonicalize_seed(
                    s["url"], self.cfg.force_hosts, self.cfg.force_to)
                if rejected:
                    out.status = NO_BUSINESS_PAGE
                    out.rejected = True
                    out.no_meta = True
                    continue
                entries.append({"seed_id": sid, "url": key, "kind": PROFILE,
                                "depth": 0, "parent_seq": -1, "emit_idx": sid,
                                "attempt": 1})
        self._push_entries(entries)

    def _release(self) -> list[dict]:
        parts = ray.get([f.release.remote() for f in self.frontier])
        released = [e for part in parts for e in part]
        released.sort(key=lambda e: (e["seed_id"], e["depth"], e["parent_seq"],
                                     e["emit_idx"], e["attempt"]))
        for e in released:
            e["seq"] = self.seq
            self.seq += 1
        return released

    def _run_round(self, released: list[dict]):
        rnd = self.round
        self.round += 1
        cols = {
            "seq": [e["seq"] for e in released],
            "round": [rnd] * len(released),
            "seed_id": [e["seed_id"] for e in released],
            "url": [e["url"] for e in released],
            "canon": [e["canon"] for e in released],
            "url_hash": [urlkit.url_hash64(e["canon"]) for e in released],
            "bucket": [urlkit.url_hash64(e["canon"]) % self.cfg.num_fetch_buckets
                       for e in released],
            "host": [e["host"] for e in released],
            "kind": [e["kind"] for e in released],
            "depth": [e["depth"] for e in released],
            "parent_seq": [e["parent_seq"] for e in released],
            "emit_idx": [e["emit_idx"] for e in released],
            "attempt": [e["attempt"] for e in released],
            "virtual_ts_ms": [e["virtual_ts_ms"] for e in released],
        }
        table = pa.table(cols, schema=SCHED_SCHEMA)
        ds = rd.from_arrow(table)
        if table.num_rows > 4 * self.batch_size:
            # bucket-align batches so each fetch worker touches few buckets
            ds = ds.sort("bucket")
        store_dir, nb = str(self.store_dir), self.cfg.num_fetch_buckets
        seeds_ref, cfg_dict, wm_ref = self.seeds_ref, self.cfg_dict, self.wm_ref

        # fetch + extract fused into one task-based stage pass: Ray worker
        # processes cache bucket dicts / broadcast state (module globals), so
        # there is no per-round actor-pool spin-up
        fetched = ds.map_batches(
            lambda t: fetch_batch(t, store_dir, nb),
            batch_format="pyarrow", batch_size=self.batch_size,
        ).materialize()
        fetched.drop_columns(["html"]).write_parquet(
            str(self.workdir / "visit_log" / f"r{rnd}"))

        extracted = fetched.map_batches(
            lambda t: extract_batch(t, seeds_ref, cfg_dict, wm_ref),
            batch_format="pyarrow", batch_size=self.batch_size,
        ).materialize()

        ctrl = extracted.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["out_kind"], "record"))),
            batch_format="pyarrow").take_all()

        n_records = 0
        for row in ctrl:
            if row["out_kind"] == "event":
                p = json.loads(row["payload"])
                if p.get("type") == "rec_count":
                    self.record_counts[row["seed_id"]] += p["n"]
                    n_records += p["n"]
        if n_records > 0:
            extracted.map_batches(
                lambda t: t.filter(pc.equal(t["out_kind"], "record")),
                batch_format="pyarrow",
            ).write_parquet(str(self.workdir / "records" / f"r{rnd}"))
        self._apply_ctrl(released, ctrl)

        if self.checkpoints:
            self._checkpoint(rnd)

    # ---------------------------------------------------------- control rows
    def _apply_ctrl(self, released: list[dict], ctrl: list[dict]):
        seq_canon = {e["seq"]: e["canon"] for e in released}
        seq_entry = {e["seq"]: e for e in released}
        ctrl.sort(key=lambda r: (r["page_seq"], 0 if r["out_kind"] == "event" else 1,
                                 r["emit_idx"]))
        to_push: list[dict] = []
        for row in ctrl:
            sid = row["seed_id"]
            p = json.loads(row["payload"])
            out = self.outcomes[sid]
            b = self.biz[sid]
            if row["out_kind"] == "link":
                to_push.append({"seed_id": sid, "url": p["url"],
                                "kind": p["kind"], "depth": p["depth"],
                                "parent_seq": p["parent_seq"],
                                "emit_idx": p["emit_idx"], "attempt": 1,
                                "src": seq_canon.get(row["page_seq"]),
                                "rel": p.get("rel", "")})
                continue
            t = p["type"]
            if t == "fetch_fail":
                key = f"{sid}|{p['canon']}"
                if self.ledger.allow_retry(key):
                    to_push.append({"seed_id": sid, "url": p["url"],
                                    "kind": p["kind"], "depth": p["depth"],
                                    "parent_seq": p["parent_seq"],
                                    "emit_idx": p["link_emit_idx"],
                                    "attempt": p["attempt"] + 1})
                else:
                    st = status_for_fetch_error(p["kind"], p["status"],
                                                b["minimal"])
                    if st is not None:
                        out.status = st
            elif t == "profile_nobizid":
                key = f"{sid}|{p['canon']}"
                if self.ledger.allow_retry(key):
                    to_push.append({"seed_id": sid, "url": p["url"],
                                    "kind": PROFILE, "depth": p["depth"],
                                    "parent_seq": p["parent_seq"],
                                    "emit_idx": p["link_emit_idx"],
                                    "attempt": p["attempt"] + 1})
                else:
                    out.status = PAGE_FORMAT_CHANGE
            elif t == "profile_ok":
                b["business_id"] = p["business_id"]
                b["profile_seq"] = row["page_seq"]
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
                b["landing_seq"] = row["page_seq"]
                self.cursors[sid].non_count = p["count"]
                if sid in self.watermarks:
                    self.cursors[sid].non_loop_end = 50
            elif t == "no_reviews":
                out.status = NO_REVIEWS
            elif t == "hash_hit":
                self.cursors[sid].matched = True
        self.pushed_seeds = {e["seed_id"] for e in to_push}
        self._push_entries(to_push)

    def _grow_windows(self) -> bool:
        """Flow 3 window growth for drained incremental seeds
        (callLastReviewURL, main.go:615-643)."""
        active = getattr(self, "pushed_seeds", set())
        grew = False
        for sid in self.watermarks:
            if sid in active:
                continue
            cur = self.cursors[sid]
            if cur.matched or self.record_counts[sid] == 0 or cur.exhausted():
                continue
            feed_starts, non_starts = cur.grow()
            b = self.biz[sid]
            base = extract.review_feed_url(b["business_id"], self.cfg.site_base)
            entries = []
            for j, st in enumerate(feed_starts):
                entries.append({"seed_id": sid, "url": base + "&start=" + str(st),
                                "kind": FEED, "depth": 2,
                                "parent_seq": b["profile_seq"],
                                "emit_idx": 1000 + cur.loop_start + j,
                                "attempt": 1, "src": None})
            for j, st in enumerate(non_starts):
                entries.append({"seed_id": sid,
                                "url": b["nonrec_url"] + "?not_recommended_start=" + str(st),
                                "kind": NONREC_PAGE, "depth": 2,
                                "parent_seq": b["landing_seq"],
                                "emit_idx": 1000 + cur.non_loop_start + j,
                                "attempt": 1, "src": None})
            if entries:
                self._push_entries(entries)
                grew = True
        self.pushed_seeds = set()
        return grew

    # ------------------------------------------------------------ checkpoint
    def _checkpoint(self, rnd: int):
        ckdir = self.workdir / "checkpoint" / f"round={rnd}"
        ckdir.mkdir(parents=True, exist_ok=True)
        futs = [f.checkpoint.remote(str(ckdir / f"frontier_{i}.parquet"))
                for i, f in enumerate(self.frontier)]
        futs += [s.checkpoint.remote(str(ckdir / f"seen_{i}.parquet"))
                 for i, s in enumerate(self.seen)]
        ray.get(futs)
        state = {
            "round": self.round, "seq": self.seq,
            "ledger": self.ledger.counts,
            "record_counts": self.record_counts,
            "edges": self.edges,
            "outcomes": {sid: vars(o) for sid, o in self.outcomes.items()},
            "cursors": {sid: vars(c) for sid, c in self.cursors.items()},
            "biz": self.biz,
        }
        (ckdir / "driver.json").write_text(json.dumps(state))
        (ckdir / "_complete").write_text("ok")

    def resume_from(self, rnd: int):
        """Rebuild actor + driver state from a complete round checkpoint;
        subsequent rounds re-run from the frontier as checkpointed."""
        ckdir = self.workdir / "checkpoint" / f"round={rnd}"
        assert (ckdir / "_complete").exists()
        futs = [f.restore.remote(str(ckdir / f"frontier_{i}.parquet"))
                for i, f in enumerate(self.frontier)]
        futs += [s.restore.remote(str(ckdir / f"seen_{i}.parquet"))
                 for i, s in enumerate(self.seen)]
        ray.get(futs)
        state = json.loads((ckdir / "driver.json").read_text())
        self.round = state["round"]
        self.seq = state["seq"]
        self.ledger.counts = state["ledger"]
        self.record_counts = {int(k): v for k, v in state["record_counts"].items()}
        self.edges = [tuple(e) for e in state["edges"]]
        for sid_s, d in state["outcomes"].items():
            self.outcomes[int(sid_s)] = SeedOutcome(**d)
        for sid_s, d in state["cursors"].items():
            self.cursors[int(sid_s)] = WindowCursors(**d)
        self.biz = {int(k): v for k, v in state["biz"].items()}
        # drop records/visit_log of rounds AFTER the checkpoint (partial work)
        for sub in ("records", "visit_log"):
            base = self.workdir / sub
            if base.exists():
                for p in base.iterdir():
                    if int(p.name.lstrip("r")) > rnd:
                        shutil.rmtree(p)

    def resume_run(self) -> "CrawlResult":
        """Continue the round loop after resume_from()."""
        while True:
            released = self._release()
            grew = False
            if released:
                self._run_round(released)
            grew = self._grow_windows()
            if not released and not grew:
                if sum(ray.get([f.pending.remote() for f in self.frontier])) == 0:
                    break
        return self._finalize()

    # -------------------------------------------------------------- finalize
    def _finalize(self) -> "CrawlResult":
        watermarks = self.watermarks

        def finalize_group(df):
            import pandas as pd
            sid = int(df["seed_id"].iloc[0])
            df = df.sort_values(["sort_ts", "page_seq", "emit_idx"],
                                ascending=[False, True, True]).reset_index(drop=True)
            wm = watermarks.get(sid)
            if wm:
                hit = df.index[df["review_hash"].isin(wm)]
                if len(hit):
                    df = df.iloc[:hit[0]]
            lines = []
            for pj in df["payload"]:
                rec = json.loads(pj)
                lines.append(record_to_jsonl(encode_record_b64(rec)))
            return pd.DataFrame({
                "seed_id": sid, "rank": range(len(df)),
                "review_hash": df["review_hash"].to_numpy(),
                "sort_ts": df["sort_ts"].to_numpy(),
                "page_seq": df["page_seq"].to_numpy(),
                "emit_idx": df["emit_idx"].to_numpy(),
                "payload": df["payload"].to_numpy(),
                "jsonl": lines,
            })

        rec_dir = self.workdir / "records"
        out_dir = self.workdir / "out"
        # untruncated counts are already tracked from the control stream; only
        # watermark-truncated seeds need a recount (no second groupby shuffle)
        final_counts: dict[int, int] = dict(self.record_counts)
        if rec_dir.exists() and any(rec_dir.iterdir()):
            ds = rd.read_parquet(str(rec_dir))
            fin = ds.groupby("seed_id").map_groups(
                finalize_group, batch_format="pandas").materialize()
            fin.write_parquet(str(out_dir / "records"))
            if self.watermarks:
                from collections import Counter
                c = Counter(r["seed_id"] for r in
                            fin.select_columns(["seed_id"]).take_all())
                for sid in self.watermarks:
                    final_counts[sid] = c.get(sid, 0)
        else:
            fin = None

        for s in self.seeds:
            sid = s["seed_id"]
            out = self.outcomes[sid]
            if out.rejected:
                continue
            if out.profile_key == "":
                out.status = NO_SEARCH_RESULTS  # main.go:322-327
                continue
            if watermarks.get(sid) and self.cursors[sid].matched:
                out.status = NO_REVIEWS_SINCE_LAST_MATCH
            out.finalize_status(final_counts.get(sid, 0))

        seen_rows = [r for part in ray.get([s.dump.remote() for s in self.seen])
                     for r in part]
        seen_rows.sort()
        meta = {sid: (None if o.no_meta else {
            "histogram": {"primary": {"score": o.score,
                                      "total_revews": o.total_reviews}},
            "profile_key": o.profile_key,
            "scraping_status": o.status,
            "item_scraped_count": o.item_scraped_count,
        }) for sid, o in self.outcomes.items()}
        (self.workdir / "meta.json").write_text(
            json.dumps({str(k): v for k, v in meta.items()}, indent=1))
        return CrawlResult(self.workdir, fin, self.outcomes, seen_rows,
                           sorted(self.edges))


class CrawlResult:
    def __init__(self, workdir: Path, fin_ds, outcomes, seen_rows, edges):
        self.workdir = Path(workdir)
        self.records = fin_ds  # finalized Dataset (seed_id, rank, ..., jsonl)
        self.outcomes = outcomes
        self.seen = seen_rows  # [(url_hash, canon_url)] sorted
        self.edges = edges

    def jsonl_lines(self, seed_id: int) -> list[str]:
        if self.records is None:
            return []
        rows = [r for r in self.records.take_all() if r["seed_id"] == seed_id]
        rows.sort(key=lambda r: r["rank"])
        return [r["jsonl"] for r in rows]

    def visit_log(self) -> list[dict]:
        d = self.workdir / "visit_log"
        if not d.exists():
            return []
        t = pads.dataset(str(d)).to_table()
        rows = t.to_pylist()
        rows.sort(key=lambda r: r["seq"])
        return rows
