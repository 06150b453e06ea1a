"""Iterative graph processing over a deterministic link graph — the
at-scale analog of the reference's crawl graph (its edges are the
pagination/link fan-out, SURVEY.md §2 M16/O4; here the web-graph rank
computation a crawler runs to prioritise its frontier).

The graph is CLOSED-FORM from doc_id (out-degree 3, dst_j = (src*31 +
7j) mod N) so the DuckDB oracle can rebuild the identical edges, and the
rank arithmetic is INTEGER FIXED-POINT (1e6 scale, floor divisions) so
every iteration is exact under any summation order, cluster width, or
engine — the same determinism contract as the cents kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

SCALE = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100
OUT_DEG = 3


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def pagerank(sf_dir: str, iters: int = 3) -> rd.Dataset:
    """(node, score): ``iters`` rounds of damped PageRank in integer
    fixed-point over the closed-form doc graph.

    Scale shape — the classic bulk-synchronous rank loop: each round is
    one map_batches (emit per-batch PRE-SUMMED contribution partials —
    the three dst arrays are vectorized numpy, grouped batch-locally
    before the shuffle) and one groupby(dst) sum, i.e. exactly one
    all-to-all per iteration, which is the known lower bound for a rank
    sweep.  A zero self-contribution row keeps sink-less nodes present
    without a join against the node list."""
    from ..agg import hash_agg

    n = _n_docs(sf_dir)
    base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["doc_id"],
            "s": pa.array(np.full(len(t), SCALE, dtype=np.int64))})

    scores = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
              .map_batches(init, batch_format="pyarrow"))

    def contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (s * DAMP_NUM // DAMP_DEN) // OUT_DEG
        dst = np.concatenate(
            [(node * 31 + 7 * j) % n for j in range(1, OUT_DEG + 1)]
            + [node])  # self rows carry 0 so every node survives the agg
        val = np.concatenate([c] * OUT_DEG
                             + [np.zeros(len(node), dtype=np.int64)])
        g = (pa.table({"dst": pa.array(dst, pa.int64()),
                       "c": pa.array(val, pa.int64())})
             .group_by("dst").aggregate([("c", "sum")]))
        return g.rename_columns(["dst", "p_c"])

    def renorm(t: pa.Table) -> pa.Table:
        inc = t["inc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": t["dst"],
                         "s": pa.array(base + inc, pa.int64())})

    for _ in range(iters):
        scores = (hash_agg(scores.map_batches(contribs,
                                              batch_format="pyarrow"),
                           "dst", [("p_c", "sum", "inc")])
                  .map_batches(renorm, batch_format="pyarrow"))

    return scores.map_batches(
        lambda t: pa.table({"node": t["node"], "score": t["s"]}),
        batch_format="pyarrow")
