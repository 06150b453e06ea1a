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


def hits(sf_dir: str, iters: int = 2) -> rd.Dataset:
    """(node, auth, hub): ``iters`` unnormalized HITS sweeps (Kleinberg
    1999) in exact integer arithmetic over the same closed-form doc graph
    as :func:`pagerank` — the hub/authority decomposition a crawler uses
    to rank link hubs vs content pages in its frontier.

    One sweep is a_k(v) = Σ_{u→v} h_{k-1}(u) then h_k(u) = Σ_{u→v} a_k(v).
    Normalization is deliberately omitted: for a fixed small ``iters`` the
    unnormalized integers are exact under any summation order (growth ≤
    OUT_DEG per half-sweep, ~3^4·SCALE at the default), so engine and
    DuckDB twin agree bit-for-bit — the same determinism contract as the
    pagerank fixed-point kernel.

    Scale shape: the authority step is the pagerank contribs pattern (one
    groupby(dst) exchange, zero self-rows keep in-degree-0 nodes); the hub
    step joins the closed-form edge table against the authority table with
    the co-partitioned ``agg.hash_join`` (ids only, one exchange) and
    re-aggregates by src.  Two all-to-alls per half-pair — the BSP lower
    bound for an alternating bipartite sweep."""
    from ..agg import hash_agg, hash_join

    n = _n_docs(sf_dir)

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["doc_id"],
            "h": pa.array(np.full(len(t), SCALE, dtype=np.int64))})

    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    h = nodes.map_batches(init, batch_format="pyarrow")

    def edge_batch(t: pa.Table) -> pa.Table:
        src = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = np.concatenate(
            [(src * 31 + 7 * j) % n for j in range(1, OUT_DEG + 1)])
        return pa.table({"src": pa.array(np.tile(src, OUT_DEG), pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def auth_contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = np.concatenate(
            [(node * 31 + 7 * j) % n for j in range(1, OUT_DEG + 1)]
            + [node])  # zero self-rows: in-degree-0 nodes stay present
        val = np.concatenate([hv] * OUT_DEG
                             + [np.zeros(len(node), dtype=np.int64)])
        g = (pa.table({"dst": pa.array(dst, pa.int64()),
                       "c": pa.array(val, pa.int64())})
             .group_by("dst").aggregate([("c", "sum")]))
        return g.rename_columns(["dst", "p_c"])

    a = None
    for _ in range(iters):
        a = hash_agg(h.map_batches(auth_contribs, batch_format="pyarrow"),
                     "dst", [("p_c", "sum", "a")]).map_batches(
            lambda t: t.rename_columns(["node", "a"]),
            batch_format="pyarrow")
        joined = hash_join(
            nodes.map_batches(edge_batch, batch_format="pyarrow"), a,
            on="dst", right_on="node",
            left_cols={"src": pa.int64()}, right_cols={"a": pa.int64()})

        def hub_partial(t: pa.Table) -> pa.Table:
            g = (t.select(["src", "a"]).group_by("src")
                 .aggregate([("a", "sum")]))
            return g.rename_columns(["src", "p_a"])

        h = hash_agg(joined.map_batches(hub_partial, batch_format="pyarrow"),
                     "src", [("p_a", "sum", "h")]).map_batches(
            lambda t: t.rename_columns(["node", "h"]),
            batch_format="pyarrow")

    out = hash_join(a, h, on="node",
                    left_cols={"a": pa.int64()}, right_cols={"h": pa.int64()})
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "auth": t["a"],
                            "hub": t["h"]}),
        batch_format="pyarrow")
