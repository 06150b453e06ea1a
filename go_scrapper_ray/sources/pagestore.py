"""Bucketed page store — "fetch" as a hash lookup (SURVEY.md J3).

The reference does live HTTP (colly Visit sites main.go:431,570,...); the
rebuild resolves scheduled URLs against the Parquet ``pages`` table.  To make
that an O(scheduled) lookup instead of an O(corpus) scan per round, the store
is built ONCE as a hash-partitioned Parquet layout:

    store_dir/bucket=<url_hash % B>/part.parquet

built distributedly with Ray Data (read → add bucket column via a vectorized
kernel → write partitioned).  The fetch stage is then an actor-pool
``map_batches`` whose actors lazily load + LRU-cache bucket dicts — on a
multi-node cluster each actor ends up serving a stable subset of buckets
because the scheduled Dataset is sorted by bucket before the stage (SURVEY.md
"shuffle #1": co-partition scheduled URLs with pages on url_hash)."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..urlkit import url_hash_batch


def build_page_store(pages_parquet: str, status_parquet: str, store_dir: str,
                     num_buckets: int = 16) -> int:
    """One-time build of the bucketed store (returns row count).

    Uses ray.data when available/initialized so the partitioning scales; the
    bucket assignment is a pure vectorized kernel either way."""
    import ray
    import ray.data as rd

    from ..urlkit import URL_HASH_VERSION

    out = Path(store_dir)
    if (out / "_built.json").exists():
        import json
        meta = json.loads((out / "_built.json").read_text())
        # stale-store guard: the bucket layout is a function of the URL
        # hash — a store partitioned under a different hash silently
        # resolves every lookup to the wrong bucket (= 404s)
        if (meta.get("hash") == URL_HASH_VERSION
                and meta.get("buckets") == num_buckets):
            return meta["rows"]
        import shutil
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    status = pq.read_table(status_parquet)
    status_map = {u: (s, f) for u, s, f in zip(status["url"].to_pylist(),
                                               status["status"].to_pylist(),
                                               status["fail_times"].to_pylist())}
    status_ref = ray.put(status_map)

    def add_bucket(batch: pa.Table) -> pa.Table:
        smap = ray.get(status_ref)
        urls = batch["url"].to_pylist()
        hashes = url_hash_batch(urls)
        buckets = [h % num_buckets for h in hashes]
        st = [smap.get(u, (200, 0)) for u in urls]
        return (batch
                .append_column("url_hash", pa.array(hashes, pa.uint64()))
                .append_column("bucket", pa.array(buckets, pa.int32()))
                .append_column("status", pa.array([s for s, _ in st], pa.int32()))
                .append_column("fail_times", pa.array([f for _, f in st], pa.int32())))

    ds = rd.read_parquet(pages_parquet, columns=["url", "html"])
    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    ds.write_parquet(str(out), partition_cols=["bucket"])

    # Union in page_status-only URLs (status recorded but no page row) with
    # null html so the engine resolves them to their RECORDED status instead
    # of 404 (oracle _effective_status parity).  Driver memory here is
    # O(status table), the small side: the distributed scan emits only the
    # page-urls that intersect the status keys.
    def matched(batch: pa.Table) -> pa.Table:
        smap = ray.get(status_ref)
        urls = [u for u in batch["url"].to_pylist() if u in smap]
        return pa.table({"url": pa.array(urls, pa.string())})

    seen_urls: set[str] = set()
    for t in (rd.read_parquet(pages_parquet, columns=["url"])
              .map_batches(matched, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        seen_urls.update(t["url"].to_pylist())
    missing = sorted(set(status_map) - seen_urls)
    if missing:
        hashes = url_hash_batch(missing)
        extra = pa.table({
            "url": pa.array(missing, pa.string()),
            "html": pa.array([None] * len(missing), pa.binary()),
            "url_hash": pa.array(hashes, pa.uint64()),
            "status": pa.array([status_map[u][0] for u in missing], pa.int32()),
            "fail_times": pa.array([status_map[u][1] for u in missing],
                                   pa.int32()),
        })
        for b in sorted({h % num_buckets for h in hashes}):
            mask = pa.array([h % num_buckets == b for h in hashes])
            bdir = out / f"bucket={b}"
            bdir.mkdir(exist_ok=True)
            pq.write_table(extra.filter(mask), bdir / "status_only.parquet")

    import json
    n = pads.dataset(str(out), partitioning="hive").count_rows()
    (out / "_built.json").write_text(json.dumps(
        {"rows": n, "buckets": num_buckets, "hash": URL_HASH_VERSION}))
    return n


def load_bucket_refs(store_dir: str, num_buckets: int) -> list:
    """Load each bucket ONCE into the Ray object store (zero-copy Arrow) and
    return the refs.  Small-corpus variant (tests); the engine uses
    ``BucketCache``, which bounds plasma residency by a byte budget."""
    import ray

    refs = []
    for b in range(num_buckets):
        refs.append(ray.put(_read_bucket(store_dir, b)))
    return refs


def _read_bucket(store_dir: str, b: int) -> pa.Table:
    p = Path(store_dir) / f"bucket={b}"
    if p.exists():
        return pads.dataset(str(p)).to_table(
            columns=["url", "html", "status", "fail_times"])
    return pa.table({"url": pa.array([], pa.string()),
                     "html": pa.array([], pa.binary()),
                     "status": pa.array([], pa.int32()),
                     "fail_times": pa.array([], pa.int32())})


class BucketCache:
    """Driver-side budgeted LRU over page-store buckets in plasma.

    The crawl's fetch join is co-partitioned on ``url_hash % num_buckets``;
    each round needs only the buckets its scheduled URLs hash into.  This
    cache loads those on demand (one Ray task per missing bucket — the read
    itself is distributed) and EVICTS least-recently-used buckets past a
    byte budget, so peak object-store usage is bounded by
    max(budget, buckets touched this round), NOT corpus size.  Small corpora
    stay fully resident (zero behavior change at bench scale); a 100 TB
    store streams through the window.  Workers hold their own tiny per-
    process LRU of fetched tables (extract_stage), released as refs rotate."""

    def __init__(self, store_dir: str, num_buckets: int,
                 budget_bytes: int | None = None):
        import os
        self.store_dir = store_dir
        self.num_buckets = num_buckets
        self.budget = budget_bytes if budget_bytes is not None else \
            int(os.environ.get("GSR_BUCKET_BUDGET_MB", "4096")) << 20
        self._refs: dict[int, object] = {}
        self._sizes: dict[int, int] = {}
        self._lru: list[int] = []  # oldest first

    def _ensure_loader(self):
        import ray

        global _LOAD_REMOTE
        if _LOAD_REMOTE is None:
            def _load(store_dir: str, b: int):
                t = _read_bucket(store_dir, b)
                return t, t.nbytes
            _LOAD_REMOTE = ray.remote(num_returns=2)(_load)
        return _LOAD_REMOTE

    def prefetch(self, buckets) -> None:
        """Fire-and-forget loads so the (disk-bound) bucket reads overlap
        actor startup, frontier RPCs and the previous round's extract wave
        instead of stalling the next round's dispatch.  Sizes stay
        unresolved ObjectRefs until ``refs_for`` needs them."""
        loader = self._ensure_loader()
        for b in buckets:
            b = int(b)
            if b not in self._refs:
                tref, szref = loader.remote(self.store_dir, b)
                self._refs[b] = tref
                self._sizes[b] = szref  # resolved lazily
                self._lru.append(b)

    def _resolve_ready_sizes(self) -> int:
        """Resolve size futures that are already available WITHOUT blocking
        (in-flight prefetches keep loading while rounds run); returns the
        total of resolved sizes.  Unresolved buckets are freshly prefetched
        (= MRU) so deferring their accounting one round is safe."""
        import ray
        total = 0
        for b, s in list(self._sizes.items()):
            if not isinstance(s, int):
                ready, _ = ray.wait([s], timeout=0, fetch_local=False)
                if not ready:
                    continue
                s = self._sizes[b] = int(ray.get(s))
            total += s
        return total

    def refs_for(self, buckets) -> dict[int, object]:
        need = [int(b) for b in buckets]
        self.prefetch(need)
        for b in need:
            self._lru.remove(b)
            self._lru.append(b)
        # evict beyond budget, never a bucket needed this round; tasks
        # ray.get the table refs themselves, so no driver-side wait here
        total = self._resolve_ready_sizes()
        needset = set(need)
        i = 0
        while total > self.budget and i < len(self._lru):
            b = self._lru[i]
            if b in needset or not isinstance(self._sizes[b], int):
                i += 1
                continue
            self._lru.pop(i)
            total -= self._sizes.pop(b)
            del self._refs[b]  # plasma frees when workers release
        return {b: self._refs[b] for b in need}

    def resident_bytes(self) -> int:
        return sum(self._sizes.values())


FETCH_TIMING = {"get": 0.0, "kernel": 0.0}  # per-process debug accumulators
_LOAD_REMOTE = None  # lazily-created remote loader (BucketCache)

# Per-WORKER-PROCESS LRU of deserialized bucket tables, shared by the fetch
# and extract kernels.  ray.get re-deserializes on every call (Arrow buffers
# are zero-copy but table reconstruction is not free: measured 16.6 core-s
# across one 388-task crawl at 32-wide vs 1.7 s at 8-wide); workers are
# reused across tasks, so caching on the ObjectRef hex cuts that to
# once-per-worker-per-bucket.  Keying on the REF (not the bucket id) drops
# stale pins when the driver's BucketCache rotates refs, letting plasma
# free evicted buckets.
from collections import OrderedDict as _ODict

_BTAB_LRU: _ODict = _ODict()  # ref_hex -> pa.Table
_BTAB_CAP = 16


def get_bucket_table(ref) -> pa.Table:
    """Resolve a bucket-table ObjectRef through the per-process LRU."""
    import ray

    key = ref.hex()
    t = _BTAB_LRU.get(key)
    if t is None:
        import time as _time
        _a = _time.perf_counter()
        t = ray.get(ref)  # zero-copy plasma read
        FETCH_TIMING["get"] += _time.perf_counter() - _a
        _BTAB_LRU[key] = t
        if len(_BTAB_LRU) > _BTAB_CAP:
            _BTAB_LRU.popitem(last=False)
    else:
        _BTAB_LRU.move_to_end(key)
    return t


def fetch_batch_refs(batch: pa.Table, refs: list, num_buckets: int) -> pa.Table:
    """map_batches kernel: scheduled rows in → +status +html out, fully
    vectorized (``pc.index_in`` + ``take`` + ``if_else``) against the
    broadcast bucket tables.  The batch arrives bucket-sorted, so buckets
    are contiguous runs — one index_in per run.

    Effective status reproduces the fixture failure model: permanent non-200,
    or fail the first ``fail_times`` attempts with 503 (FIXTURES.md §2); URLs
    absent from the store are 404."""
    import numpy as np
    import pyarrow.compute as pc

    buckets = batch["bucket"].to_numpy(zero_copy_only=False)
    # contiguous run boundaries (batch sorted by bucket)
    cuts = [0] + (np.flatnonzero(np.diff(buckets)) + 1).tolist() + [len(buckets)]
    status_parts, idx_parts = [], []
    for s, e in zip(cuts[:-1], cuts[1:]):
        bt = get_bucket_table(refs[int(buckets[s])])
        sub = batch.slice(s, e - s)
        idx = pc.index_in(sub["canon"], value_set=bt["url"])
        st = pc.take(bt["status"], idx)
        ft = pc.take(bt["fail_times"], idx)
        att = sub["attempt"].combine_chunks()
        eff = pc.if_else(pc.is_null(idx), pa.scalar(404, pa.int32()), st)
        retry_mask = pc.and_kleene(
            pc.fill_null(pc.equal(eff, 200), False),
            pc.fill_null(pc.less_equal(pc.cast(att, pa.int32()), ft), False))
        eff = pc.if_else(retry_mask, pa.scalar(503, pa.int32()), eff)
        # NO html materialization: pages stay in the shared bucket tables;
        # downstream resolves bytes lazily via (bucket, html_row).  The
        # previous take+if_else html copies were the measured scaling
        # killer (memory-copy contention: 0.15s/block solo -> ~4s at
        # 32-wide concurrency)
        idx_out = pc.if_else(pc.fill_null(pc.equal(eff, 200), False),
                             idx, pa.scalar(None, pa.int32()))
        status_parts.append(eff)
        idx_parts.append(idx_out)
    def _cat(parts, typ):
        if not parts:
            return pa.array([], typ)
        return pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts])
    return (batch
            .append_column("status", _cat(status_parts, pa.int32()))
            .append_column("html_row", _cat(idx_parts, pa.int32())))
