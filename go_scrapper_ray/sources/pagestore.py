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

from collections import OrderedDict
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

    out = Path(store_dir)
    if (out / "_built.json").exists():
        import json
        return json.loads((out / "_built.json").read_text())["rows"]
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
    import json
    n = pads.dataset(str(out), partitioning="hive").count_rows()
    (out / "_built.json").write_text(json.dumps({"rows": n, "buckets": num_buckets}))
    return n


# Worker-process-global bucket cache: the fetch stage runs as Ray TASKS (no
# actor-pool spin-up per crawl round — the driver loop runs many small
# rounds); Ray worker processes are long-lived, so a module-level LRU gives
# the same load-once-per-worker amortization an actor would.
_BUCKET_CACHE: OrderedDict[tuple[str, int], dict] = OrderedDict()
_BUCKET_CACHE_CAP = 64


def _load_bucket(store_dir: str, b: int) -> dict:
    key = (store_dir, b)
    got = _BUCKET_CACHE.get(key)
    if got is not None:
        _BUCKET_CACHE.move_to_end(key)
        return got
    p = Path(store_dir) / f"bucket={b}"
    d = {}
    if p.exists():
        t = pads.dataset(str(p)).to_table(
            columns=["url", "html", "status", "fail_times"])
        d = {u: (h, s, f) for u, h, s, f in
             zip(t["url"].to_pylist(), t["html"].to_pylist(),
                 t["status"].to_pylist(), t["fail_times"].to_pylist())}
    _BUCKET_CACHE[key] = d
    if len(_BUCKET_CACHE) > _BUCKET_CACHE_CAP:
        _BUCKET_CACHE.popitem(last=False)
    return d


def fetch_batch(batch: pa.Table, store_dir: str, num_buckets: int) -> pa.Table:
    """map_batches kernel: scheduled rows in → +status +html out.

    Effective status reproduces the fixture failure model: permanent non-200,
    or fail the first ``fail_times`` attempts with 503 (FIXTURES.md §2); URLs
    absent from the store are 404."""
    canons = batch["canon"].to_pylist()
    hashes = batch["url_hash"].to_pylist()
    attempts = batch["attempt"].to_pylist()
    statuses, htmls = [], []
    for canon, h, attempt in zip(canons, hashes, attempts):
        d = _load_bucket(store_dir, h % num_buckets)
        got = d.get(canon)
        if got is None:
            statuses.append(404)
            htmls.append(None)
            continue
        html, st, ft = got
        if st != 200:
            statuses.append(st or 0)
            htmls.append(None)
        elif attempt <= ft:
            statuses.append(503)
            htmls.append(None)
        else:
            statuses.append(200)
            htmls.append(html)
    return (batch
            .append_column("status", pa.array(statuses, pa.int32()))
            .append_column("html", pa.array(htmls, pa.binary())))
