"""Bucketed page store — "fetch" as a hash lookup (SURVEY.md J3).

The reference does live HTTP (colly Visit sites main.go:431,570,...); the
rebuild resolves scheduled URLs against the Parquet ``pages`` table.  To make
that an O(scheduled) lookup instead of an O(corpus) scan per round, the store
is built ONCE as a hash-partitioned, hash-SORTED Arrow IPC layout:

    store_dir/bucket=<url_hash % B>/sorted.arrow   (uncompressed, mmap-able)

built distributedly with Ray Data (read → add bucket column via a vectorized
kernel → write partitioned) plus a per-bucket sort+compact task.  Fetch is
then a zero-I/O join: each round task ``memory_map``s its buckets and
``searchsorted``s its scheduled ``url_hash`` column against the bucket's
sorted hash column — only the matched rows' pages ever leave the page cache.

Why mmap files instead of plasma-resident bucket tables (the round-1/2
design): ingesting the decompressed store into the object store is a giant
serialized memcpy into /dev/shm whose kernel page-fault path CONTENDS under
concurrency — measured at a 96k-seed corpus (~11 GB of html): the bucket
loads took ~60 s of round-0 critical path at 32 CPUs and made 32 CPUs
SLOWER end-to-end than 8 (7.7k vs 11.9k URLs/s).  The mmap store never
copies html anywhere: reads are page-cache-shared across every worker
process, faults are minor and parallel, and peak object-store usage is
O(round control rows), not corpus size.  On a multi-node cluster each node
holds the bucket shards it fetches on node-local disk (or a shared FS) —
the same layout Common-Crawl-style corpora already ship in."""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.dataset as pads

from ..urlkit import url_hash_batch

STORE_FMT = 2  # bump to invalidate stores built under an older layout


def _compact_bucket(store_dir: str, b: int) -> int:
    """Join status onto pages WITHIN the bucket (both sides are
    hash-partitioned on url_hash, so every row of a url lives here — the
    per-bucket hash join is exact and O(bucket), replacing the old
    corpus-sized driver-side ``status_map`` dict), sort by (url_hash,
    url) and rewrite as uncompressed Arrow IPC; delete the parquet
    parts.  Chunked so per-batch string offsets stay well under int32
    even for multi-GB buckets."""
    import pyarrow.compute as pc

    bdir = Path(store_dir) / f"bucket={b}"
    sdir = Path(store_dir) / "_status" / f"bucket={b}"
    parts = sorted(bdir.glob("*.parquet")) if bdir.exists() else []
    sparts = sorted(sdir.glob("*.parquet")) if sdir.exists() else []
    if not parts and not sparts:
        return 0
    if parts:
        pages = pads.dataset([str(p) for p in parts]).to_table(
            columns=["url", "html", "url_hash"])
    else:
        pages = pa.table({"url": pa.array([], pa.string()),
                          "html": pa.array([], pa.binary()),
                          "url_hash": pa.array([], pa.uint64())})
    if sparts:
        status = pads.dataset([str(p) for p in sparts]).to_table(
            columns=["url", "status", "fail_times", "url_hash"])
    else:
        status = pa.table({"url": pa.array([], pa.string()),
                           "status": pa.array([], pa.int32()),
                           "fail_times": pa.array([], pa.int32()),
                           "url_hash": pa.array([], pa.uint64())})
    joined = pages.join(status.select(["url", "status", "fail_times"]),
                        keys="url", join_type="left outer")
    t = pa.table({
        "url": joined["url"],
        "html": joined["html"],
        "status": pc.fill_null(joined["status"].combine_chunks().cast(
            pa.int32()), pa.scalar(200, pa.int32())),
        "fail_times": pc.fill_null(joined["fail_times"].combine_chunks()
                                   .cast(pa.int32()),
                                   pa.scalar(0, pa.int32())),
        "url_hash": joined["url_hash"],
    })
    # status-recorded URLs with NO page row resolve to their RECORDED
    # status instead of 404 (oracle _effective_status parity): null-html
    # rows, found by a per-bucket anti join — never a driver seen-set
    extra = status.join(pages.select(["url"]), keys="url",
                        join_type="left anti")
    if extra.num_rows:
        t = pa.concat_tables([t, pa.table({
            "url": extra["url"],
            "html": pa.array([None] * extra.num_rows, pa.binary()),
            "status": extra["status"],
            "fail_times": extra["fail_times"],
            "url_hash": extra["url_hash"],
        })])
    t = t.take(pc.sort_indices(t, sort_keys=[("url_hash", "ascending"),
                                             ("url", "ascending")]))
    bdir.mkdir(parents=True, exist_ok=True)
    tmp = bdir / "sorted.arrow.tmp"
    with pa.OSFile(str(tmp), "wb") as f:
        with pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t, max_chunksize=65536)
    os.replace(tmp, bdir / "sorted.arrow")
    for p in parts + sparts:
        p.unlink()
    return t.num_rows


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
                and meta.get("buckets") == num_buckets
                and meta.get("fmt") == STORE_FMT):
            return meta["rows"]
        import shutil
        shutil.rmtree(out)
    elif out.exists():
        # a crashed pre-atomic build left parquet parts a fresh
        # write_parquet (unique file names) would silently duplicate
        import shutil
        shutil.rmtree(out)

    # ATOMIC build: everything lands in a pid-unique temp dir that is
    # renamed into place only once _built.json is inside it — a crashed
    # builder leaves only a dead temp dir, and two CONCURRENT builders
    # of a shared store_dir (it is documented as shareable across runs)
    # cannot interleave writes; the rename loser validates the winner's
    # store and uses it.
    import json
    import shutil
    tmp = Path(f"{out}.tmp.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True, exist_ok=True)

    # Both sides hash-partition on url_hash into the SAME bucket layout
    # (the status table is per-URL, i.e. corpus-sized at the design
    # point — it never becomes a driver dict); the per-bucket compaction
    # task then joins status onto pages co-partitioned.
    def add_bucket(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hashes = url_hash_batch(urls)
        buckets = [h % num_buckets for h in hashes]
        return (batch
                .append_column("url_hash", pa.array(hashes, pa.uint64()))
                .append_column("bucket", pa.array(buckets, pa.int32())))

    (rd.read_parquet(status_parquet)
     .map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(str(tmp / "_status"), partition_cols=["bucket"]))

    (rd.read_parquet(pages_parquet, columns=["url", "html"])
     .map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(str(tmp), partition_cols=["bucket"]))

    # per-bucket status join + sort + IPC compaction, one task per
    # bucket (parallel)
    compact = ray.remote(_compact_bucket)
    n = sum(ray.get([compact.remote(str(tmp), b)
                     for b in range(num_buckets)]))
    shutil.rmtree(tmp / "_status", ignore_errors=True)

    (tmp / "_built.json").write_text(json.dumps(
        {"rows": n, "buckets": num_buckets, "hash": URL_HASH_VERSION,
         "fmt": STORE_FMT}))
    try:
        os.rename(tmp, out)
    except OSError:
        # lost the race — another builder installed the store first
        shutil.rmtree(tmp, ignore_errors=True)
        meta = json.loads((out / "_built.json").read_text())
        return meta["rows"]
    return n


def _read_bucket(store_dir: str, b: int) -> pa.Table:
    """Whole-bucket table (tests / small-corpus inspection)."""
    t, _ = get_bucket(store_dir, b)
    return t.select(["url", "html", "status", "fail_times"])


FETCH_TIMING = {"get": 0.0, "kernel": 0.0}  # per-process debug accumulators

_EMPTY_SCHEMA = pa.schema([
    ("url", pa.string()), ("html", pa.binary()), ("status", pa.int32()),
    ("fail_times", pa.int32()), ("url_hash", pa.uint64())])

# Per-WORKER-PROCESS cache of memory-mapped bucket tables + their sorted
# hash columns.  The mmap'd table owns no heap: buffers are lazy views over
# the file, shared page-cache pages across every worker on the node, so
# there is nothing to evict — entries are (address space + fd) only.  The
# hash column materializes once per (process, bucket) as a contiguous
# uint64 array (8 B/row) for searchsorted.
_BUCKET_CACHE: dict = {}  # (store_dir, b) -> (pa.Table, np.ndarray)


def get_bucket(store_dir: str, b: int):
    """Memory-mapped bucket table + sorted url_hash column, cached
    per process."""
    import numpy as np

    key = (store_dir, int(b))
    hit = _BUCKET_CACHE.get(key)
    if hit is not None:
        return hit
    import time as _time
    _a = _time.perf_counter()
    p = Path(store_dir) / f"bucket={int(b)}" / "sorted.arrow"
    if p.exists():
        t = pa.ipc.open_file(pa.memory_map(str(p))).read_all()
        hashes = t["url_hash"].to_numpy(zero_copy_only=False)
    else:
        t = pa.table({f.name: [] for f in _EMPTY_SCHEMA},
                     schema=_EMPTY_SCHEMA)
        hashes = np.array([], np.uint64)
    FETCH_TIMING["get"] += _time.perf_counter() - _a
    _BUCKET_CACHE[key] = (t, hashes)
    return t, hashes


def fetch_batch_store(batch: pa.Table, store_dir: str,
                      num_buckets: int) -> pa.Table:
    """Fetch kernel: scheduled rows in → +status +html_row out, fully
    vectorized.  The batch arrives bucket-sorted, so buckets are contiguous
    runs — one searchsorted per run against the bucket's sorted hash column
    (mmap, zero-copy), then an exact URL-equality confirm on the matched
    candidates (a 64-bit hash collision must not resolve to the wrong page).

    Effective status reproduces the fixture failure model: permanent non-200,
    or fail the first ``fail_times`` attempts with 503 (FIXTURES.md §2); URLs
    absent from the store are 404.  html bytes are NEVER copied here: rows
    reference pages via (bucket, html_row) into the mmap'd store, and the
    extract kernels resolve bytes lazily per row."""
    import numpy as np
    import pyarrow.compute as pc

    buckets = batch["bucket"].to_numpy(zero_copy_only=False)
    # contiguous run boundaries (batch sorted by bucket)
    cuts = [0] + (np.flatnonzero(np.diff(buckets)) + 1).tolist() + [len(buckets)]
    status_parts, idx_parts = [], []
    for s, e in zip(cuts[:-1], cuts[1:]):
        bt, h_store = get_bucket(store_dir, int(buckets[s]))
        sub = batch.slice(s, e - s)
        h_sched = sub["url_hash"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(h_store, h_sched)
        pos_c = np.minimum(pos, max(len(h_store) - 1, 0)).astype(np.int32)
        found = (pos < len(h_store)) & \
            (h_store[pos_c] == h_sched) if len(h_store) else \
            np.zeros(len(h_sched), bool)
        idx = pa.array(pos_c, pa.int32(), mask=~found)
        # hash→row candidates confirmed by exact URL equality
        cand = pc.take(bt["url"], idx)
        ok = pc.fill_null(pc.equal(cand, sub["canon"]), False)
        idx = pc.if_else(ok, idx, pa.scalar(None, pa.int32()))
        st = pc.take(bt["status"], idx)
        ft = pc.take(bt["fail_times"], idx)
        att = sub["attempt"].combine_chunks()
        eff = pc.if_else(pc.is_null(idx), pa.scalar(404, pa.int32()), st)
        retry_mask = pc.and_kleene(
            pc.fill_null(pc.equal(eff, 200), False),
            pc.fill_null(pc.less_equal(pc.cast(att, pa.int32()), ft), False))
        eff = pc.if_else(retry_mask, pa.scalar(503, pa.int32()), eff)
        # html_row only for rows that will actually be parsed
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
