"""CrawlEngine — the distributed crawl driver loop.

Rebuild shape (SURVEY.md §3 "Rebuild shape"): per round

    FrontierShards.release() → scheduled blocks (bucket-sorted)
      → _round_task: fetch-as-lookup join vs page store + extract
      → records (+ their rendered JSONL) stream to per-round Parquet
      → links: task → SeenShards.submit (hash-partitioned) — at round end
        SeenShards.resolve() picks deterministic winners, pushes straight
        to FrontierShards and emits edge tables (shard-to-shard; the
        driver never touches a link row)
      → events/retries (tiny) route columnar to SeedCtlShard actors
        (seed_id-hash sharded) that own the per-seed status machine,
        retry ledger and window cursors — the driver's per-round work is
        O(shards), not O(seeds)

then finalize: per-shard raw tasks impose the reference's insertion-sort
order (date desc, schedule-time tiebreak — main.go:984-1007) and truncate
at the incremental watermark (main.go:950-960); the base64 + Go-encoder
JSONL render (main.go:1009-1077) already happened in the extract wave.

Scale notes (10^10-URL design points, tested single-node):
* records, links, events AND retries never run per-row on the driver —
  per round it routes the control table's shard slices (columnar take)
  and the released-entry key sort; everything per-seed happens in the
  SeedCtlShard actors (state/seeds.py).
* the release path is INT-ONLY on the driver: frontier shards put their
  full release tables (strings + virtual_ts) to plasma and return key
  tables (release_indexed); the driver ranks seq and orders (bucket, seq)
  over ints, and each round task gathers its own rows from the shard
  tables (two vectorized takes, zero-copy reads).  The remaining driver
  O(round) step is the five-int-column pc.sort_indices (~0.1 µs/URL);
  decentralizing THAT into a (round, shard, local_idx) seq would change
  tie-break observables for no measured win — documented as a deliberate
  non-goal.
* per-seed record groups are small (one business), so the finalize "sort"
  is a hash-partitioned per-shard sort, NOT a global sort.
* the page store is hash-partitioned + hash-sorted once into mmap-able
  Arrow IPC; fetch tasks serve stable bucket subsets because the scheduled
  set is bucket-sorted (shuffle #1) and resolve rows by searchsorted on the
  bucket's sorted url_hash column — page bytes never enter the object store
  (pagestore.py module docstring has the measured plasma-ingest pathology).
* every round writes records/visit-log Parquet + actor checkpoints →
  kill-and-resume re-enters at the last complete round (test_resume.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import defaultdict
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
    SeedOutcome,
)
from ..gojson import encode_record_b64, record_to_jsonl
from ..sources.pagestore import build_page_store, fetch_batch_store
from ..stages.extract_stage import extract_batch
from ..state.frontier import FrontierShard
from ..state.robots import RobotsRules
from ..state.seeds import SeedCtlShard
from ..state.seen import SeenShard

N_FIN_SHARDS = 32  # records hash-partition fan-in (fixed: file layout is
#                    part of the checkpoint contract, independent of cluster)


REC_SCHEMA = pa.schema([
    ("seed_id", pa.int64()), ("page_seq", pa.int64()),
    ("emit_idx", pa.int32()), ("sort_ts", pa.int64()),
    ("review_hash", pa.string()), ("jsonl", pa.string()),
])


def _split_fin_shards(recs: pa.Table):
    """Partition a record table by finalize shard (seed_id % N_FIN_SHARDS),
    returned as N_FIN_SHARDS slices of one shard-sorted table.  Runs INSIDE
    each round task (its records are already in memory, a few MB), so the
    finalize fan-in needs no consolidation stage at all: finalize shard s
    just fetches slice s of every round task — O(tasks) tiny zero-copy
    gets, no 32-wide re-scan (the previous consolidation designs measured
    600 core-s of redundant filtering / end-clustered copy contention)."""
    import numpy as np

    shard = recs["seed_id"].to_numpy(zero_copy_only=False) % N_FIN_SHARDS
    order = np.argsort(shard, kind="stable")
    t = recs.take(pa.array(order))
    ss = shard[order]
    bounds = np.searchsorted(ss, np.arange(N_FIN_SHARDS + 1))
    return tuple(t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                 for i in range(N_FIN_SHARDS))


@ray.remote
def _import_warm() -> int:
    """No-op task whose only effect is forcing its worker process to import
    this module and the extract/fastpath kernels it pulls in.  Fired
    fire-and-forget across the cluster at engine construction so the
    round-0 wave's tasks find the modules hot instead of each first task
    paying the cold import on the timed critical path — the task analog of
    the actor ``warm()`` RPC above (job-start prefetch, not a benchmark
    trick: a real cluster job warms imports while the input manifest is
    read)."""
    from ..stages import extract_stage  # noqa: F401  (transitive kernels)
    return 0


@ray.remote(num_returns=N_FIN_SHARDS)
def _load_split(path: str):
    """Resume path: per-round durability parquet → finalize-shard slices."""
    return _split_fin_shards(pq.read_table(path))


@ray.remote(num_returns=2)
def _finalize_task(bundle: dict, shard: int, watermarks: dict,
                   out_path: str, scraped_at: int) -> tuple:
    """Finalize one seed-hash shard from its pre-partitioned per-round
    slices (plasma refs; parquet is only the durability copy):
    per-seed sort (date desc, schedule tiebreak — main.go:984-1007),
    watermark truncation (main.go:950-960), write one output parquet.
    The hash+b64+Go-JSONL render (main.go:1009-1077) happened in the
    DISTRIBUTED extract wave (the line depends only on the record), so the
    fan-in is sort+truncate+write — the 32-wide render burst anti-scaled.
    Returns seed_id→count.

    A seed's records land in exactly one shard (seed_id % N_FIN_SHARDS),
    so shards finalize independently — a hash-partitioned group-by
    expressed as one raw task per partition, no shuffle."""
    import numpy as np

    _dbg = os.environ.get("GSR_TASK_TIMING")
    _t0 = time.perf_counter()
    # each ref is THIS shard's pre-partitioned slice of one round
    tabs = [t for t in ray.get(bundle["refs"]) if t.num_rows]
    _t1 = time.perf_counter()
    if not tabs:
        return False, {}
    # columnar finalize: one Arrow sort + numpy group slicing (the pandas
    # groupby/object conversion of the string-heavy columns anti-scaled at
    # 32-wide concurrency); truncation only ever cuts a group SUFFIX, so
    # rank = position - group_start survives the keep-filter.
    # combine_chunks BEFORE take: gathering from a many-hundred-chunk table
    # (one chunk per round task) measured ~2x slower than the extra
    # contiguous copy
    big = pa.concat_tables(tabs).combine_chunks()
    order = pc.sort_indices(big, sort_keys=[
        ("seed_id", "ascending"), ("sort_ts", "descending"),
        ("page_seq", "ascending"), ("emit_idx", "ascending")])
    big = big.take(order)
    sids = big["seed_id"].to_numpy(zero_copy_only=False)
    n = len(sids)
    bounds = np.flatnonzero(np.diff(sids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    keep = np.ones(n, bool)
    counts: dict[int, int] = {}
    hash_col = big["review_hash"]
    for s, e in zip(starts.tolist(), ends.tolist()):
        sid = int(sids[s])
        klen = e - s
        wm = watermarks.get(sid)
        if wm:  # incremental seeds only: scan this group's hashes
            for i, h in enumerate(hash_col.slice(s, e - s).to_pylist()):
                if h in wm:
                    klen = i
                    keep[s + i:e] = False
                    break
        counts[sid] = int(klen)
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
    out = (big.select(["seed_id", "review_hash", "sort_ts", "page_seq",
                       "emit_idx", "jsonl"])
           .append_column("rank", pa.array(rank))
           .filter(pa.array(keep)))
    _t3 = time.perf_counter()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(out, out_path)
    if _dbg:
        with open(f"{_dbg}/fin-{shard}.json", "w") as fh:
            json.dump({"get_filter": _t1 - _t0, "sort_rank": _t3 - _t1,
                       "write": time.perf_counter() - _t3,
                       "rows": n, "start": _t0}, fh)
    # (any_rows_flag, counts): the driver only ever touches the flag; the
    # counts ref goes straight to the seed shards' final_state
    return True, counts


@ray.remote(num_returns=1 + N_FIN_SHARDS)
def _round_task(idx: pa.Table, start: int, length: int, bundle: dict,
                nb: int, visit_dir: str, rec_dir: str, *shard_tbls):
    """One fetch+extract+write task over one scheduled block.

    The round's INT-ONLY index table (shard, row, seq, round, bucket —
    bucket-sorted) is put to plasma once and every task receives
    ``(idx_ref, start, length, ..., *shard_release_tables)`` — Ray
    resolves the refs zero-copy per worker (first touch faults the
    segment, later tasks reuse it), and the driver's submit loop
    serializes ~100 bytes per task.  The task GATHERS its own rows from
    the frontier shards' release tables (two vectorized takes over its
    slice), so the string columns never cross the driver at all — the
    decentralization of the old driver-side (bucket, seq) full-table
    gather + ray.put.

    The round loop deliberately uses RAW Ray tasks, not a per-round Dataset
    execution: a crawl is an iterative loop of many sub-second rounds, and
    the streaming executor's per-execution setup (~0.5s) dominated round
    wall time (measured; see BASELINE.md).  Ray Data still runs everything
    non-iterative: page-store build, finalize sort/render, analytics
    pipelines.  ``bundle`` nests ObjectRefs (nested refs are NOT auto
    resolved) so bucket tables stay zero-copy in plasma and broadcast state
    is fetched once per worker (module caches in the kernels)."""
    import numpy as np

    _dbg = os.environ.get("GSR_TASK_TIMING")
    t0 = time.perf_counter()
    sl = idx.slice(start, length)
    sh = sl["shard"].to_numpy(zero_copy_only=False)
    rows = sl["row"].to_numpy(zero_copy_only=False)
    pos_parts, tbl_parts = [], []
    for s in np.unique(sh):
        sel = np.flatnonzero(sh == s)
        pos_parts.append(sel)
        tbl_parts.append(shard_tbls[int(s)].take(pa.array(rows[sel])))
    gathered = pa.concat_tables(tbl_parts).combine_chunks()
    perm = np.empty(len(sh), np.int64)
    perm[np.concatenate(pos_parts)] = np.arange(len(sh), dtype=np.int64)
    # rows back in slice (bucket, seq) order + the driver-assigned columns
    block = (gathered.take(pa.array(perm))
             .append_column("seq", sl["seq"])
             .append_column("round", sl["round"])
             .append_column("bucket", sl["bucket"])
             .select([f.name for f in SCHED_SCHEMA]))
    f = fetch_batch_store(block, bundle["store_dir"], nb)
    t1 = time.perf_counter()
    part = f"part-{f['seq'][0].as_py()}.parquet"
    pq.write_table(f.drop_columns(["html_row"]), f"{visit_dir}/{part}")
    t2 = time.perf_counter()
    ex = extract_batch(f, bundle["seeds"], bundle["cfg"], bundle["wm"],
                       bundle["store_dir"])
    t3 = time.perf_counter()
    if _dbg:
        from ..sources.pagestore import FETCH_TIMING
        with open(f"{_dbg}/t-{part}.json", "w") as fh:
            json.dump({"rows": block.num_rows, "fetch": t1 - t0,
                       "vwrite": t2 - t1, "extract": t3 - t2,
                       "start": t0, "pid": os.getpid(),
                       "cum_get": FETCH_TIMING["get"],
                       "cum_kernel": FETCH_TIMING["kernel"]}, fh)
    rec_mask = pc.equal(ex["out_kind"], "record")
    recs = ex.filter(rec_mask).select(
        ["seed_id", "page_seq", "emit_idx", "sort_ts",
         "review_hash", "jsonl"])
    if recs.num_rows:
        # durability copy; the finalize path reads the returned plasma ref
        os.makedirs(rec_dir, exist_ok=True)
        pq.write_table(recs, f"{rec_dir}/{part}")
    # link rows go STRAIGHT to the seen shards (partitioned on l_hash),
    # never through the driver; winners resolve deterministically at round
    # end (SeenShard.resolve).  The submit ACK refs ride back with the
    # ctrl table and the DRIVER barriers on them before kicking resolves —
    # awaiting them here blocked the worker inside the wave (the blocked
    # task releases its CPU, so Ray over-subscribes with another task:
    # the same convoy churn the bucket barrier fixed, 32-wide only).
    link_mask = pc.equal(ex["out_kind"], "link")
    links = ex.filter(link_mask)
    acks = []
    if links.num_rows:
        import numpy as np
        seen_handles = bundle["seen_shards"]
        shard = (links["l_hash"].to_numpy(zero_copy_only=False)
                 % len(seen_handles))
        acks = [seen_handles[int(s)].submit.remote(
                    links.take(pa.array(np.flatnonzero(shard == s))))
                for s in np.unique(shard)]
    ctrl = ex.filter(pc.invert(pc.or_(rec_mask, link_mask)))
    ctrl = ctrl.drop_columns(["jsonl", "l_src"])
    # pre-partition by seedctl shard and ray.put each slice HERE: the
    # driver receives only (shard_id, ref) pairs and forwards the refs to
    # the shard actors, so control bytes never enter the driver process at
    # all (they used to ride the ray.get + re-serialize on apply.remote).
    # Row order is immaterial: SeedCtlShard.apply re-sorts events by
    # (page_seq, emit_idx) and tallies rcnt with an order-free group-by.
    # Fault-tolerance tradeoff (accepted): these refs are ray.put by a
    # transient task worker, so they have no lineage — a worker death
    # between round return and SeedCtlShard.apply resolving them raises
    # ObjectLostError instead of reconstructing (the old in-band return
    # path was lineage-recoverable).  Recovery is the per-round
    # checkpoint/resume path (run re-executes the round); the win is
    # control bytes never transiting the driver (ac_split 0.31-0.38 ->
    # 0.03 s at 96k seeds).
    nsc = bundle["nsc"]
    c_shards: list[int] = []
    c_refs: list = []
    if ctrl.num_rows:
        csh = ctrl["seed_id"].to_numpy(zero_copy_only=False) % nsc
        corder = np.argsort(csh, kind="stable")
        ctrl = ctrl.take(pa.array(corder))
        cbounds = np.searchsorted(csh[corder], np.arange(nsc + 1))
        for i in range(nsc):
            s, e = int(cbounds[i]), int(cbounds[i + 1])
            if e > s:
                c_shards.append(i)
                c_refs.append(ray.put(ctrl.slice(s, e - s)))
    return ((acks, c_shards, c_refs),
            *_split_fin_shards(recs))


SCHED_SCHEMA = pa.schema([
    ("seq", pa.int64()), ("round", pa.int32()), ("seed_id", pa.int64()),
    ("url", pa.string()), ("canon", pa.string()), ("url_hash", pa.uint64()),
    ("bucket", pa.int32()), ("host", pa.string()), ("kind", pa.string()),
    ("depth", pa.int32()), ("parent_seq", pa.int64()),
    ("emit_idx", pa.int32()), ("attempt", pa.int32()),
    ("virtual_ts_ms", pa.int64()),
])


@ray.remote
def _intake_task(seeds_tbl: pa.Table, start: int, length: int,
                 site_base: str, force_hosts: tuple, force_to: str,
                 seen_handles: list, nseen: int):
    """Build one chunk of the seed wave's frontier entries (canonicalize +
    hash — the O(seeds) Python the driver used to run serially) and submit
    them to the seen shards on the SAME deterministic submit→resolve path
    links use (winner per url_hash = min (page_seq, emit_idx), so chunk
    parallelism cannot change which of two same-URL seeds wins).  Returns
    the rejected seed ids."""
    import numpy as np

    chunk = seeds_tbl.slice(start, length).to_pylist()
    rejected: list[int] = []
    sids, urls, canons, kinds = [], [], [], []
    for s in chunk:
        sid = s["seed_id"]
        if s["url"] == "":
            u = extract.search_url(s["business_name"], s["addr_street"],
                                   s["addr_city"], s["addr_state"],
                                   s["addr_zip"], site_base)
            kinds.append(SEARCH)
        else:
            u, rej = urlkit.canonicalize_seed(s["url"], force_hosts,
                                              force_to)
            if rej:
                rejected.append(sid)
                continue
            kinds.append(PROFILE)
        sids.append(sid)
        urls.append(u)
        canons.append(urlkit.canonicalize(u))
    hosts = urlkit.host_batch(canons)
    n = len(sids)
    t = pa.table({
        "seed_id": pa.array(sids, pa.int64()),
        "page_seq": pa.array(np.full(n, -1, np.int64)),
        "emit_idx": pa.array(sids, pa.int32()),
        "l_url": pa.array(urls, pa.string()),
        "l_canon": pa.array(canons, pa.string()),
        "l_hash": pa.array(urlkit.url_hash_batch(canons), pa.uint64()),
        "l_host": pa.array(hosts, pa.string()),
        "l_hosthash": pa.array(urlkit.host_hash_batch(hosts), pa.uint64()),
        "l_kind": pa.array(kinds, pa.string()),
        "l_depth": pa.array(np.zeros(n, np.int32)),
        "l_rel": pa.array(["seed"] * n, pa.string()),
        "l_src": pa.array([""] * n, pa.string()),
    })
    if n:
        hashes = t["l_hash"].to_numpy(zero_copy_only=False)
        shard = hashes % nseen
        ray.get([seen_handles[int(s)].submit.remote(
                    t.take(pa.array(np.flatnonzero(shard == s))))
                 for s in np.unique(shard)])
    return rejected


class CrawlEngine:
    def __init__(self, corpus_dir: str, workdir: str,
                 cfg: CrawlConfig | None = None,
                 enforce_robots: bool | None = None,
                 fetch_concurrency: int = 4, extract_concurrency: int = 4,
                 batch_size: int = 256, checkpoints: bool = True,
                 store_dir: str | None = None,
                 max_per_host_per_round: int = 0,
                 seeds_override: "pa.Table | None" = None):
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

        # shard actors FIRST: their cold start (process spawn + package
        # import) overlaps the page-store build/check, seeds read, and
        # broadcast puts below — nothing blocks on them until intake
        fcfg_dict = {"delay_ms": self.cfg.delay_ms,
                     "jitter_ms": self.cfg.jitter_ms,
                     "jitter_seed": self.cfg.jitter_seed,
                     "ignore_robots": self.cfg.ignore_robots,
                     "max_per_host_per_round": max_per_host_per_round}
        self.frontier = [FrontierShard.remote(i, fcfg_dict,
                                              str(self.corpus / "robots.parquet"))
                         for i in range(self.cfg.num_frontier_shards)]
        self.seen = [SeenShard.remote(i)
                     for i in range(self.cfg.num_seen_shards)]
        # seen shards push resolved links straight to the frontier shards.
        # No ray.get: actor mailboxes are FIFO per sender, so the driver's
        # later resolve() calls are guaranteed to run after this lands
        # (worker-sent submit() never touches the frontier handles)
        for s in self.seen:
            s.set_frontier.remote(self.frontier)
        # per-seed state machine shards (BASELINE.md decentralization step:
        # the driver's O(seeds) apply_ctrl event loop moves into actors,
        # cutting per-round driver work to O(shards))
        sc_cfg = {"site_base": self.cfg.site_base,
                  "allowed_hosts": (list(self.cfg.allowed_hosts)
                                    if self.cfg.allowed_hosts is not None
                                    else None),
                  "ignore_robots": self.cfg.ignore_robots}
        self.seedctl = [SeedCtlShard.remote(
                            i, sc_cfg, self.frontier, self.seen,
                            str(self.corpus / "robots.parquet"))
                        for i in range(self.cfg.num_seed_shards)]
        # fire-and-forget table-arg warmup: the first Arrow-table argument
        # an actor process deserializes pays ~0.6 s of lazy serializer
        # setup (measured); pre-pay it now so it overlaps the corpus reads
        # below instead of sitting on the intake submit / resolve→push
        # critical paths (actor mailboxes are FIFO, so real calls queue
        # behind the warmup and find the handlers loaded)
        _wt = pa.table({"w": pa.array([0], pa.int64())})
        for a in (*self.seen, *self.frontier):
            a.warm.remote(_wt)
        # and the TASK-worker analog: touch every worker slot with a no-op
        # that imports the round-task kernels, overlapping the cold imports
        # with the store check / seeds read below (see _import_warm)
        _ncpu = int(ray.cluster_resources().get("CPU", 8))
        self._warm_refs = [_import_warm.remote() for _ in range(2 * _ncpu)]

        # store_dir may be shared across runs over the same corpus (the
        # build is idempotent via _built.json) — the bucketed store is a
        # property of the corpus, not of one crawl
        self.store_dir = Path(store_dir) if store_dir else self.workdir / "pagestore"
        build_page_store(str(self.corpus / "pages.parquet"),
                         str(self.corpus / "page_status.parquet"),
                         str(self.store_dir), self.cfg.num_fetch_buckets)
        self._bundle: dict | None = None  # built after seeds_ref/wm_ref

        # seeds_override: the CLI's one-Spider-per-invocation mode
        # (reference main.go:179-220) supplies a seeds table directly
        self._seeds_tbl = (seeds_override if seeds_override is not None
                           else pq.read_table(self.corpus / "seeds.parquet"))
        self.seeds = self._seeds_tbl.to_pylist()
        rb = pq.read_table(self.corpus / "robots.parquet")
        self.robots = {h: RobotsRules.parse(t) for h, t in
                       zip(rb["host"].to_pylist(), rb["robots_txt"].to_pylist())}

        # job signature: a resumable checkpoint is only valid for the SAME
        # (corpus, seed set) — stamped into driver.json and checked on
        # resume so a stable WORKDIR reused with a different spider or
        # corpus cannot silently emit the previous job's records
        import hashlib
        self.job_sig = hashlib.sha256(json.dumps(
            {"corpus": str(self.corpus.resolve()),
             "seeds": self.seeds},
            sort_keys=True, default=str).encode()).hexdigest()[:16]

        # broadcast once: seed configs + watermark hash sets
        seeds_map = {s["seed_id"]: s for s in self.seeds}
        self.watermarks = {s["seed_id"]: set(s["last_review_hashes"])
                           for s in self.seeds if s["last_review_hashes"]}
        self.seeds_ref = ray.put(seeds_map)
        self.wm_ref = ray.put(self.watermarks)
        self.cfg_dict = {"site_base": self.cfg.site_base,
                         "force_hosts": list(self.cfg.force_hosts),
                         "force_to": self.cfg.force_to,
                         "scraped_at": self.cfg.scraped_at,
                         "allowed_hosts": (list(self.cfg.allowed_hosts)
                                           if self.cfg.allowed_hosts is not None
                                           else None),
                         "ignore_robots": self.cfg.ignore_robots,
                         "robots_parquet": str(self.corpus / "robots.parquet")}
        # nested-refs bundle for _round_task (nested refs are not resolved
        # by Ray, so the tasks fetch broadcast state themselves, once per
        # worker via the kernels' module caches); pages resolve via the
        # mmap'd store on disk, so no per-round ref rotation
        self._bundle = {"store_dir": str(self.store_dir),
                        "seeds": self.seeds_ref,
                        "cfg": self.cfg_dict, "wm": self.wm_ref,
                        "seen_shards": self.seen,
                        # control rows come back PRE-PARTITIONED by seedctl
                        # shard (stable in-task sort), so the driver never
                        # sorts or copies control bytes — it slices the
                        # plasma-resident tables and hands zero-copy views
                        # to the shard actors
                        "nsc": self.cfg.num_seed_shards}

        # per-seed state lives in the SeedCtlShard actors; the driver keeps
        # only the round/seq counters and the per-round pushed-seed set
        self.seq = 0
        self.round = 0
        # edge lists stay COLUMNAR (one Arrow table per round) — the driver
        # never loops per edge; tuples materialize lazily in CrawlResult
        self.edge_tables: list[pa.Table] = []
        # plasma refs of per-task record tables (finalize input; the parquet
        # copies under records/ are durability only, re-loaded on resume)
        # finalize-shard → [record-slice refs] (one per round task); the
        # parquet copies under records/ are durability only, re-split on
        # resume via _load_split
        self.rec_shard_refs: list[list] = [[] for _ in range(N_FIN_SHARDS)]
        self.timings: dict[str, float] = defaultdict(float)
        self._trace = bool(os.environ.get("GSR_TIMING"))

    def _t(self, key: str, t0: float) -> float:
        now = time.perf_counter()
        self.timings[key] += now - t0
        return now

    # ------------------------------------------------------------------ push
    def _push_entries(self, entries: list[dict]):
        """Seen-shards (batched) → frontier shards (batched).  ``entries``
        must already be in deterministic order.  Entries carrying ``canon``
        were canonicalized + host/robots-filtered in the distributed extract
        kernel; raw entries (intake seeds, retries, window growth — all
        small) run the same kernels driver-side."""
        kept = []
        for e in entries:
            if "canon" not in e:
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
            final.append(e)

        by_fshard: dict[int, list[dict]] = {}
        for e in final:
            hh = e.get("host_hash")
            if hh is None:
                hh = urlkit.host_hash64(e["host"])
            h = hh % len(self.frontier)
            entry = {k: e[k] for k in ("seed_id", "url", "canon", "kind",
                                       "depth", "parent_seq", "emit_idx",
                                       "attempt", "url_hash")}
            entry["host"] = e["host"]
            entry["host_hash"] = hh
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
        tt = time.perf_counter()
        self._intake()
        tt = self._t("intake", tt)
        while True:
            keys, refs = self._release()
            tt = self._t("release", tt)
            if keys is not None:
                self._run_round(keys, refs)
            tt = time.perf_counter()
            grew = self._grow_windows()
            tt = self._t("grow", tt)
            if keys is None and not grew:
                pending = sum(ray.get([f.pending.remote() for f in self.frontier]))
                if pending == 0:
                    break
        tt = time.perf_counter()
        res = self._finalize()
        self._t("finalize", tt)
        if self._trace:
            print("GSR_TIMING final " + " ".join(
                f"{k}={v:.2f}" for k, v in sorted(self.timings.items())),
                flush=True)
        return res

    def _intake(self):
        t0 = time.perf_counter()
        self._init_seedctl()
        self._t("ik_prologue", t0)
        if self.cfg.ignore_robots and self.cfg.allowed_hosts is None:
            return self._intake_parallel()
        self._intake_serial()

    def _init_seedctl(self):
        """Route each seed's initial state to its SeedCtlShard (sid % N) —
        the driver only splits id/url arrays; outcome/cursor construction
        happens in the shards, in parallel."""
        nsc = len(self.seedctl)
        sids = [[] for _ in range(nsc)]
        urls = [[] for _ in range(nsc)]
        wms: list[dict] = [{} for _ in range(nsc)]
        for s in self.seeds:
            sid = s["seed_id"]
            i = sid % nsc
            sids[i].append(sid)
            urls[i].append(s["url"])
            if s["last_review_hashes"]:
                wms[i][sid] = list(s["last_review_hashes"])
        ray.get([self.seedctl[i].init_seeds.remote(sids[i], urls[i], wms[i])
                 for i in range(nsc)])

    def _mark_rejected(self, sids: list[int]):
        if not sids:
            return
        nsc = len(self.seedctl)
        by: dict[int, list[int]] = {}
        for sid in sids:
            by.setdefault(sid % nsc, []).append(sid)
        ray.get([self.seedctl[i].mark_rejected.remote(ss)
                 for i, ss in by.items()])

    def _intake_parallel(self):
        """Unrestricted config: the O(seeds) canonicalize/hash Python runs
        in chunked Ray tasks through the deterministic seen-shard
        submit→resolve path (measured ~0.9 s of serial driver time at 24k
        seeds).  Intake resolve output is discarded except the bucket
        prefetch: no edges for seed entries, and window gating only reads
        pushed_seeds during the round loop."""
        t0 = time.perf_counter()
        tbl = self._seeds_tbl
        nseen = len(self.seen)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # ~6000 rows/chunk, capped at ncpu//2: the canon kernel is
        # ~25 us/row (~150 ms compute per chunk), and the submit fan-out
        # (nchunks x nshards actor RPCs on the serial seen-shard
        # mailboxes) is what actually bounds the wave — at 96k seeds /
        # 32 cpus, 32 chunks measured ik_chunks 0.73-0.74 s vs 0.50-0.59 s
        # at 16 (round-5 A/B, three runs each): the RPC churn, not the
        # canon compute, dominates past ncpu//2 chunks
        nchunks = int(os.environ.get("GSR_IK_CHUNKS", 0)) or \
            max(1, min(max(8, ncpu // 2), tbl.num_rows // 6000 + 1))
        t0 = self._t("ik_read", t0)
        import numpy as np
        edges = np.linspace(0, tbl.num_rows, nchunks + 1).astype(int)
        tref = ray.put(tbl)
        futs = [_intake_task.remote(tref, int(s), int(e - s),
                                    self.cfg.site_base,
                                    tuple(self.cfg.force_hosts),
                                    self.cfg.force_to, self.seen, nseen)
                for s, e in zip(edges[:-1], edges[1:]) if e > s]
        t0 = self._t("ik_submit", t0)
        rejected = [sid for rej in ray.get(futs) for sid in rej]
        self._mark_rejected(rejected)
        t0 = self._t("ik_chunks", t0)
        # seed entries produce NO edge rows and need no bucket hints
        ray.get([s.resolve.remote(0, False) for s in self.seen])
        self._t("ik_resolve", t0)

    def _intake_serial(self):
        """Driver-side path for restricted configs (robots enforcement /
        allowed-hosts filtering happens in _push_entries)."""
        entries = []
        rejected_sids: list[int] = []
        for s in self.seeds:
            sid = s["seed_id"]
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
                    rejected_sids.append(sid)
                    continue
                entries.append({"seed_id": sid, "url": key, "kind": PROFILE,
                                "depth": 0, "parent_seq": -1, "emit_idx": sid,
                                "attempt": 1})
        self._mark_rejected(rejected_sids)
        self._push_entries(entries)

    def _release(self):
        """Merge shard release KEY tables, impose the canonical
        deterministic order, assign contiguous ``seq`` — all columnar over
        INT-ONLY columns.  The full release tables (url/canon/host strings
        + virtual_ts) never visit the driver: each shard puts its table to
        plasma (``release_indexed``) and the round tasks gather their own
        rows from those refs — the old path's three driver-side string
        copies (ray.get concat, (bucket, seq) take, ray.put) measured ~1 s
        of per-job serial time at 220k URLs and scaled with round width.
        Returns ``(key_table | None, [shard_table_refs])``; key rows carry
        (shard, row) locators aligned with the refs list."""
        parts = ray.get([f.release_indexed.remote() for f in self.frontier])
        import numpy as np
        key_parts, refs = [], []
        for kt, ref in parts:
            if kt is None:
                continue
            n = kt.num_rows
            kt = (kt.append_column(
                      "shard", pa.array(np.full(n, len(refs), np.int32),
                                        pa.int32()))
                  .append_column("row",
                                 pa.array(np.arange(n, dtype=np.int64))))
            key_parts.append(kt)
            refs.append(ref)
        if not key_parts:
            return None, []
        tbl = pa.concat_tables(key_parts).combine_chunks()
        order = pc.sort_indices(tbl, sort_keys=[
            ("seed_id", "ascending"), ("depth", "ascending"),
            ("parent_seq", "ascending"), ("emit_idx", "ascending"),
            ("attempt", "ascending")]).to_numpy(zero_copy_only=False)
        rank = np.empty(len(order), np.int64)
        rank[order] = np.arange(len(order), dtype=np.int64)
        tbl = tbl.append_column("seq", pa.array(self.seq + rank))
        self.seq += tbl.num_rows
        return tbl, refs

    def _run_round(self, keys: pa.Table, shard_refs: list):
        rnd = self.round
        self.round += 1
        t0 = time.perf_counter()
        # bucket-align (seq is already assigned, so canonical order is
        # unaffected): each fetch task then touches few buckets.  All
        # columnar — numpy modulo + pc.sort_indices over the INT-ONLY key
        # table; the string gather happens inside each round task.
        nb = self.cfg.num_fetch_buckets
        import numpy as np
        n_rel = keys.num_rows
        uh = keys["url_hash"].to_numpy(zero_copy_only=False)
        tbl = (keys
               .append_column("bucket",
                              pa.array((uh % nb).astype(np.int32), pa.int32()))
               .append_column("round",
                              pa.array(np.full(n_rel, rnd, np.int32),
                                       pa.int32())))
        order = pc.sort_indices(tbl, sort_keys=[("bucket", "ascending"),
                                                ("seq", "ascending")])
        table = tbl.take(order).select(
            ["shard", "row", "seq", "round", "bucket", "wclass"])
        # block split by estimated WORK, not rows: DOM-parsed pages
        # (profile/landing/nonrec) cost ~20x a JSON feed page, so row-count
        # splitting starves the cluster on parse-heavy rounds (measured:
        # a 6k-row nonrec round ran 12 tasks on 32 CPUs).  Cut the
        # bucket-sorted table at equal cumulative-weight boundaries.
        ncpu = int(os.environ.get("GSR_MAX_BLOCKS", 0)) or \
            int(ray.cluster_resources().get("CPU", 8))
        wcl = table["wclass"].to_numpy(zero_copy_only=False)
        # per-kind cost ratios re-measured AFTER the fastpath scanners
        # (fastpath.py): feed ~0.55ms, profile/search/landing ~1.5-1.8ms,
        # nonrec ~0.9ms since the one-pass item walk (nonrec_items);
        # wclass 0 = feed, 1 = nonrec, 2 = parse-heavy (frontier shard)
        weights = np.select([wcl == 0, wcl == 1],
                            [1.0, 1.6], default=3.0)
        cum = np.cumsum(weights)
        total_w = float(cum[-1]) if len(cum) else 0.0
        # 4 waves' worth of blocks: with 2*ncpu the last wave's stragglers
        # idled ~30% of the cluster (measured p95/p50 = 1.26 at 64 blocks);
        # finer blocks pack the tail at ~50ms/task dispatch cost
        waves = int(os.environ.get("GSR_WAVES", "4"))
        nblocks = max(1, min(waves * ncpu, int(total_w // 192) + 1))
        bounds = np.searchsorted(
            cum, np.linspace(0, total_w, nblocks + 1)[1:-1])
        edges = [0] + [int(b) + 1 for b in bounds] + [table.num_rows]
        spans = [(s, e - s) for s, e in zip(edges[:-1], edges[1:]) if e > s]
        visit_dir = self.workdir / "visit_log" / f"r{rnd}"
        visit_dir.mkdir(parents=True, exist_ok=True)
        rec_dir = self.workdir / "records" / f"r{rnd}"
        t0 = self._t("bd_prep", t0)
        # co-partitioned fetch join: each task searchsorted-joins its
        # bucket-sorted slice against the mmap'd store — no loads to wait
        # on, no plasma residency (pagestore.py module docstring)
        bundle = self._bundle
        t0 = self._t("build_ds", t0)

        # fetch + extract + parquet writes fused into one raw-task wave per
        # round (see _round_task docstring for the Dataset-vs-tasks call).
        # Only the (small) control/link rows return to the driver;
        # records/visit-log stream straight from tasks to Parquet.  File
        # names derive from each block's first seq (deterministic +
        # idempotent on task retry).  The shard_refs ride as TOP-LEVEL
        # variadic args so Ray resolves them zero-copy per worker; each
        # task gathers its slice's rows itself (parallel, off-driver).
        idx_ref = ray.put(table.select(["shard", "row", "seq", "round",
                                        "bucket"]))
        futs = [_round_task.remote(idx_ref, s, ln, bundle, nb,
                                   str(visit_dir), str(rec_dir),
                                   *shard_refs)
                for s, ln in spans]
        t0 = self._t("submit", t0)
        ctrl_refs = [f[0] for f in futs]
        for f in futs:
            for sh in range(N_FIN_SHARDS):
                self.rec_shard_refs[sh].append(f[1 + sh])
        res = ray.get(ctrl_refs)
        # barrier on the link-submit acks BEFORE _apply_ctrl kicks the
        # seen-shard resolves — all submissions must have landed
        acks = [a for ack, _sh, _r in res for a in ack]
        if acks:
            ray.get(acks)
        # control rows stay in plasma: tasks returned (shard, ref) pairs
        nsc = len(self.seedctl)
        per_shard_refs: list[list] = [[] for _ in range(nsc)]
        for _ack, shards, refs in res:
            for s, r in zip(shards, refs):
                per_shard_refs[s].append(r)
        t0 = self._t("round_exec", t0)

        self._apply_ctrl(per_shard_refs)
        t0 = self._t("apply_ctrl", t0)

        if self.checkpoints:
            self._checkpoint(rnd)
            self._t("checkpoint", t0)
        if self._trace:
            print(f"GSR_TIMING round={rnd} n={table.num_rows} "
                  + " ".join(f"{k}={v:.2f}" for k, v in
                             sorted(self.timings.items())), flush=True)

    # ---------------------------------------------------------- control rows
    def _apply_ctrl(self, per_shard_refs: list[list]):
        """Route control rows to the per-seed state shards: the round
        tasks already partitioned their control output by seed shard and
        put each slice to plasma, so the driver only forwards ObjectRefs
        (variadic args resolve zero-copy in the actor) — control BYTES
        never visit the driver.  Per-round driver work is O(shards +
        tasks) ref bookkeeping plus the unions of small seed-id sets.

        Determinism: retries push from the seed shards and links from the
        seen shards concurrently; the interleave only permutes frontier
        ``arrival`` stamps, a release tiebreak that never decides (the key
        (host, seed, depth, parent_seq, emit_idx, attempt) is unique by
        construction — see state/seeds.py module docstring).  Slice
        arrival order inside a shard is immaterial: apply() re-sorts
        events by the unique (page_seq, emit_idx) key and tallies counts
        with an order-free group-by."""
        tt = time.perf_counter()
        # kick the seen-shard resolves FIRST: all submits landed when the
        # round barrier released, so the link winners resolve while the
        # seed shards chew their event slices
        resolve_futs = [s.resolve.remote() for s in self.seen]
        apply_futs = [
            self.seedctl[i].apply.remote(*refs)
            for i, refs in enumerate(per_shard_refs)
            if refs]
        tt = self._t("ac_split", tt)
        retried: set[int] = set()
        for ids in ray.get(apply_futs):
            retried.update(ids)
        tt = self._t("ac_apply", tt)
        # gather the round-end link resolutions kicked at the top
        res = ray.get(resolve_futs)
        link_seeds: set[int] = set()
        for edges, cand_seeds, _buckets in res:
            link_seeds.update(cand_seeds)
            if edges is not None and edges.num_rows:
                self.edge_tables.append(edges)
        tt = self._t("pl_resolve", tt)
        self.pushed_seeds = retried | link_seeds

    def _grow_windows(self) -> bool:
        """Flow 3 window growth for drained incremental seeds
        (callLastReviewURL, main.go:615-643) — each seed shard grows its
        own cursors and submits entries on the deterministic
        submit→resolve path; the driver fans out and triggers the resolve
        wave."""
        nsc = len(self.seedctl)
        per_shard: list[list[int]] = [[] for _ in range(nsc)]
        for sid in getattr(self, "pushed_seeds", set()):
            per_shard[sid % nsc].append(sid)
        flags = ray.get([c.grow.remote(per_shard[i])
                         for i, c in enumerate(self.seedctl)])
        grew = any(flags)
        if grew:
            # winners push to the frontier inside resolve; no edges for
            # grow entries (parity with the old driver path)
            ray.get([s.resolve.remote(0, False) for s in self.seen])
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
        futs += [c.checkpoint.remote(str(ckdir / f"seedctl_{i}.json"))
                 for i, c in enumerate(self.seedctl)]
        stat_futs = [c.stats.remote() for c in self.seedctl]
        ray.get(futs)
        pq.write_table(self._edges_table(), str(ckdir / "edges.parquet"))
        state = {"round": self.round, "seq": self.seq,
                 "job_sig": self.job_sig}
        (ckdir / "driver.json").write_text(json.dumps(state))
        stats = ray.get(stat_futs)
        # per-checkpoint lineage + metrics: which shard files belong to this
        # round (lineage is the round=N directory layout itself) plus the
        # driver's cumulative stage timers and progress counters, so an
        # operator inspecting a killed run sees where time went and how far
        # it got without replaying anything.
        (ckdir / "metrics.json").write_text(json.dumps({
            "round": rnd,
            "seq": self.seq,
            "frontier_shards": len(self.frontier),
            "seen_shards": len(self.seen),
            "seedctl_shards": len(self.seedctl),
            "records_so_far": sum(s["records_so_far"] for s in stats),
            "seeds": sum(s["seeds"] for s in stats),
            "retry_urls": sum(s["retry_urls"] for s in stats),
            "timings_s": {k: round(v, 4)
                          for k, v in sorted(self.timings.items())},
        }, separators=(",", ":")))
        (ckdir / "_complete").write_text("ok")

    def _edges_table(self) -> pa.Table:
        if self.edge_tables:
            return pa.concat_tables(self.edge_tables)
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "rel": pa.array([], pa.string())})

    def latest_checkpoint(self) -> int | None:
        """Highest round with a COMPLETE checkpoint under this workdir,
        or None — the CLI's resume auto-detect probe."""
        base = self.workdir / "checkpoint"
        if not base.exists():
            return None
        rounds = [int(p.name.partition("=")[2]) for p in base.glob("round=*")
                  if (p / "_complete").exists()]
        return max(rounds, default=None)

    def resume_from(self, rnd: int):
        """Rebuild actor + driver state from a complete round checkpoint;
        subsequent rounds re-run from the frontier as checkpointed."""
        ckdir = self.workdir / "checkpoint" / f"round={rnd}"
        assert (ckdir / "_complete").exists()
        state = json.loads((ckdir / "driver.json").read_text())
        if "outcomes" in state:
            # pre-seedctl-shard layout: per-seed state lived inline in
            # driver.json and there are no seedctl_*.json files — there is
            # no migration path, so say that instead of misdescribing it
            # as a shard-count mismatch
            raise ValueError(
                f"checkpoint at {ckdir} uses the legacy pre-seedctl-shard "
                "format (per-seed state inline in driver.json); it cannot "
                "be resumed by this version — re-run from scratch")
        if "job_sig" in state and state["job_sig"] != self.job_sig:
            raise ValueError(
                f"checkpoint at {ckdir} was written by a DIFFERENT job "
                "(corpus or seed set changed under this workdir); "
                "resuming would emit the previous job's records — use a "
                "fresh WORKDIR or force a fresh run")
        # the seedctl shard count is part of the checkpoint layout (state
        # is sharded by sid % N): refuse a mismatched resume loudly rather
        # than silently dropping the seeds of missing shards
        n_ck = len(list(ckdir.glob("seedctl_*.json")))
        if n_ck != len(self.seedctl):
            raise ValueError(
                f"checkpoint at {ckdir} was written with {n_ck} seedctl "
                f"shards but this engine has {len(self.seedctl)} "
                f"(cfg.num_seed_shards) — resume with the same shard count")
        futs = [f.restore.remote(str(ckdir / f"frontier_{i}.parquet"))
                for i, f in enumerate(self.frontier)]
        futs += [s.restore.remote(str(ckdir / f"seen_{i}.parquet"))
                 for i, s in enumerate(self.seen)]
        futs += [c.restore.remote(str(ckdir / f"seedctl_{i}.json"))
                 for i, c in enumerate(self.seedctl)]
        ray.get(futs)
        self.round = state["round"]
        self.seq = state["seq"]
        self.edge_tables = [pq.read_table(str(ckdir / "edges.parquet"))]
        # drop records/visit_log of rounds AFTER the checkpoint (partial work)
        for sub in ("records", "visit_log"):
            base = self.workdir / sub
            if base.exists():
                for p in base.iterdir():
                    if int(p.name.lstrip("r")) > rnd:
                        shutil.rmtree(p)
        # rebuild record plasma refs from the durability parquet copies
        # (parallel load tasks)
        self.rec_shard_refs = [[] for _ in range(N_FIN_SHARDS)]
        rec_base = self.workdir / "records"
        if rec_base.exists():
            for rdir in sorted(rec_base.iterdir()):
                for pth in sorted(rdir.glob("part-*.parquet")):
                    refs = _load_split.remote(str(pth))
                    for sh in range(N_FIN_SHARDS):
                        self.rec_shard_refs[sh].append(refs[sh])

    def resume_run(self) -> "CrawlResult":
        """Continue the round loop after resume_from()."""
        while True:
            keys, refs = self._release()
            if keys is not None:
                self._run_round(keys, refs)
            grew = self._grow_windows()
            if keys is None and not grew:
                if sum(ray.get([f.pending.remote() for f in self.frontier])) == 0:
                    break
        return self._finalize()

    # -------------------------------------------------------------- finalize
    def _finalize(self) -> "CrawlResult":
        watermarks = self.watermarks
        rec_dir = self.workdir / "records"
        out_dir = self.workdir / "out"
        t0 = time.perf_counter()
        # per-seed count OVERRIDES flow from the finalize shard tasks
        # STRAIGHT to the seed shards (each ray.gets the fin-task futures
        # whose fin shards can hold its seeds), so the status machine runs
        # CONCURRENTLY with the finalize sort/write wave and the override
        # dicts never visit the driver; non-truncated seeds fall back to
        # the seed shards' own control-stream tallies
        rec_path = None
        futs: list = []
        if any(self.rec_shard_refs):
            # one raw task per seed-hash shard over the plasma record refs —
            # a group-by with zero shuffle and zero disk reads; replaces a
            # Ray Data repartition+groupby+map_groups that anti-scaled on
            # this workload (measured 23.6s@8cpu / 48.6s@32cpu -> ~3s)
            # finalize is memory-bandwidth-bound (concat+gather+write of the
            # string-heavy jsonl column), not ALU-bound: 32 concurrent shard
            # tasks on one node thrash the bus (measured 0.05s -> 2.5-4.9s
            # per identical 48k-row sort, 0.8s -> 7-20s total).  Reserve
            # ncpu/8 CPUs per task so ~8 run per node regardless of width —
            # resource-aware scheduling, same answer on a real cluster where
            # each node caps its own finalize concurrency.
            # the ncpu/8 gate dated from 350k-row consolidation tasks; the
            # shard tasks are now ~50k rows / ~0.2 s each, far below the
            # bus-thrash regime, so 16-wide is safe (measured below)
            fin_cpus = int(os.environ.get("GSR_FIN_CPUS", 0)) or \
                max(1, int(ray.cluster_resources().get("CPU", 8)) // 16)
            futs = [_finalize_task.options(num_cpus=fin_cpus).remote(
                        {"refs": list(self.rec_shard_refs[s])},
                        s, watermarks,
                                          str(out_dir / "records" /
                                              f"shard-{s:02d}.parquet"),
                                          self.cfg.scraped_at)
                    for s in range(N_FIN_SHARDS)]

        # final status machine + meta fragments run IN the seed shards;
        # each shard resolves its own fin-task futures (seed_id % nsc is
        # constant within a fin shard when nsc divides N_FIN_SHARDS, so
        # shard i waits on exactly N_FIN_SHARDS/nsc futures), overlapping
        # fin_status with the fin_tasks wave.  The driver merges fragments
        # and writes one meta.json.
        nsc = len(self.seedctl)
        cnt_refs = [f[1] for f in futs]
        if futs and N_FIN_SHARDS % nsc == 0:
            per = [[cnt_refs[s] for s in range(N_FIN_SHARDS) if s % nsc == i]
                   for i in range(nsc)]
        else:
            per = [list(cnt_refs) for _ in range(nsc)]
        frag_futs = [self.seedctl[i].final_state.remote(per[i])
                     for i in range(nsc)]
        if futs:
            # rec_path needs any-rows; the counts dicts themselves stay
            # off the driver (a fin shard wrote parquet iff counts)
            any_rows = any(ray.get([f[0] for f in futs]))
            t0 = self._t("fin_tasks", t0)
            if any_rows:
                # Dataset construction is LAZY (CrawlResult.records property)
                # — read_parquet's plan/metadata pass belongs to whoever
                # consumes the records, not the crawl's critical path
                rec_path = str(out_dir / "records")
            t0 = self._t("fin_read", t0)
        frags = ray.get(frag_futs)
        t0 = self._t("fin_status", t0)

        outcomes: dict[int, SeedOutcome] = {}
        for o_frag, _mj in frags:
            outcomes.update(o_frag)
        # compact separators: indent=1 string-building measured 1.19 s of
        # the 96k-seed finalize; consumers json.loads it (format-agnostic).
        # The per-shard fragments arrive PRE-SERIALIZED (parallel dumps in
        # the seed shards, shard-order concatenation — key order changed
        # from globally-sorted to per-shard-sorted, which every consumer
        # json.loads through)
        (self.workdir / "meta.json").write_text(
            "{" + ",".join(mj for _o, mj in frags if mj) + "}")
        t0 = self._t("fin_meta", t0)
        edges = self._edges_table()
        self._t("fin_edges", t0)
        return CrawlResult(self.workdir, rec_path, outcomes, self.seen,
                           edges)


class CrawlResult:
    def __init__(self, workdir: Path, records_path, outcomes, seen_actors,
                 edges_table):
        self.workdir = Path(workdir)
        self._records_path = records_path
        self._records = None  # lazy Dataset (seed_id, rank, ..., jsonl)
        self.outcomes = outcomes
        self._seen_actors = seen_actors
        self._seen: list | None = None
        self._edges_table = edges_table
        self._edges: list | None = None
        self._lines_by_seed: dict[int, list[str]] | None = None

    @property
    def records(self):
        """Finalized records as a lazy Ray Dataset (None if no records)."""
        if self._records is None and self._records_path is not None:
            self._records = rd.read_parquet(self._records_path)
        return self._records

    @property
    def seen(self) -> list:
        """[(url_hash, canon_url)] sorted — pulled from the shard actors
        lazily (the dump is O(frontier); benches that don't inspect it
        shouldn't pay for it)."""
        if self._seen is None:
            rows = [r for part in
                    ray.get([s.dump.remote() for s in self._seen_actors])
                    for r in part]
            rows.sort()
            self._seen = rows
        return self._seen

    @property
    def edges(self) -> list:
        if self._edges is None:
            t = self._edges_table
            self._edges = sorted(zip(t["src"].to_pylist(),
                                     t["dst"].to_pylist(),
                                     t["rel"].to_pylist()))
        return self._edges

    def jsonl_lines(self, seed_id: int) -> list[str]:
        """Per-seed lines for the parity suites (small corpora): ONE
        dataset materialization total — the first call groups all lines
        by seed and later calls serve from the cache, so an N-seed loop
        costs one pass, not N.  Large-output consumers (the CLI) use the
        streaming ``iter_jsonl`` instead."""
        if self.records is None:
            return []
        if self._lines_by_seed is None:
            by_seed: dict[int, list] = defaultdict(list)
            for t in self.records.iter_batches(batch_format="pyarrow"):
                for sid, rank, line in zip(t["seed_id"].to_pylist(),
                                           t["rank"].to_pylist(),
                                           t["jsonl"].to_pylist()):
                    by_seed[sid].append((rank, line))
            self._lines_by_seed = {
                sid: [ln for _, ln in sorted(rows)]
                for sid, rows in by_seed.items()}
        return self._lines_by_seed.get(seed_id, [])

    def iter_jsonl(self, seed_order: list[int]):
        """Stream every record's JSONL line in CLI output order (seeds in
        ``seed_order``, rank within seed) WITHOUT materializing the
        dataset on the driver: one distributed sort on (seed position,
        rank) — the per-shard finalize parquet is already (seed, rank)-
        sorted, so the sort's sample pass sees pre-ordered runs — then
        ``iter_batches`` pulls blocks in order with backpressure."""
        if self.records is None:
            return
        pos = {sid: i for i, sid in enumerate(seed_order)}

        def addpos(t: pa.Table) -> pa.Table:
            return t.append_column("__pos", pa.array(
                [pos[s] for s in t["seed_id"].to_pylist()], pa.int64()))

        ds = (self.records.map_batches(addpos, batch_format="pyarrow")
              .sort(["__pos", "rank"]))
        for t in ds.iter_batches(batch_format="pyarrow"):
            yield from t["jsonl"].to_pylist()

    def visit_log(self) -> list[dict]:
        d = self.workdir / "visit_log"
        if not d.exists():
            return []
        t = pads.dataset(str(d)).to_table()
        rows = t.to_pylist()
        rows.sort(key=lambda r: r["seq"])
        return rows
