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

from ..agg import hash_agg, hash_join

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

    Scale shape: both half-sweeps are the pagerank contribs pattern — one
    map_batches of vectorized scatter rows + one groupby sum, i.e. ONE
    all-to-all each (the BSP lower bound).  The hub step exploits that
    u ↦ (31u+7j) mod n is a bijection per edge slot j when gcd(31,n)=1:
    authority rows scatter straight to their unique hub target
    u = (v−7j)·31⁻¹ mod n, so no edge join is needed.  When 31 | n or
    (n−1)² would overflow int64 (n > isqrt(2⁶³−1) ≈ 3.037·10⁹), it
    falls back to a co-partitioned edge join (``agg.hash_join``) — the
    same answer, one extra exchange.  The final (auth, hub) combine is a
    union + one hash_agg, not a join.  Only the last sweep's authority
    table is forked (hub step + output), so it alone materializes — one
    node-sized int64 checkpoint; everything else is a single streaming
    execution."""

    n = _n_docs(sf_dir)
    # the scatter computes ((v-7j) % n) * inv31 in int64 with both factors
    # in [0, n): safe iff (n-1)^2 < 2^63, i.e. n <= isqrt(2^63-1) — derive
    # the cutoff from that bound so raising it can never silently wrap
    import math
    _INT64_SAFE_N = math.isqrt(2**63 - 1)  # 3_037_000_499
    try:
        inv31 = pow(31, -1, n) if n <= _INT64_SAFE_N else None
    except ValueError:  # 31 | n: not invertible
        inv31 = None
    assert inv31 is None or (n - 1) * (n - 1) < 2**63

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["doc_id"],
            "h": pa.array(np.full(len(t), SCALE, dtype=np.int64))})

    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    h = nodes.map_batches(init, batch_format="pyarrow")

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

    def hub_contribs(t: pa.Table) -> pa.Table:
        # scatter: authority row (v, a) contributes a to the unique u with
        # (31u + 7j) ≡ v (mod n), for each edge slot j — a bijection, so
        # the union over (v, j) is exactly the edge multiset
        v = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        av = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate(
            [((v - 7 * j) % n) * inv31 % n for j in range(1, OUT_DEG + 1)])
        val = np.tile(av, OUT_DEG)
        g = (pa.table({"src": pa.array(u, pa.int64()),
                       "c": pa.array(val, pa.int64())})
             .group_by("src").aggregate([("c", "sum")]))
        return g.rename_columns(["src", "p_a"])

    def edge_batch(t: pa.Table) -> pa.Table:
        src = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = np.concatenate(
            [(src * 31 + 7 * j) % n for j in range(1, OUT_DEG + 1)])
        return pa.table({"src": pa.array(np.tile(src, OUT_DEG), pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    a = None
    for it in range(iters):
        a = hash_agg(h.map_batches(auth_contribs, batch_format="pyarrow"),
                     "dst", [("p_c", "sum", "a")]).map_batches(
            lambda t: t.rename_columns(["node", "a"]),
            batch_format="pyarrow")
        if it == iters - 1:
            a = a.materialize()  # forked below: hub step + output union
        if inv31 is not None:
            h = hash_agg(a.map_batches(hub_contribs,
                                       batch_format="pyarrow"),
                         "src", [("p_a", "sum", "h")])
        else:
            joined = hash_join(
                nodes.map_batches(edge_batch, batch_format="pyarrow"), a,
                on="dst", right_on="node",
                left_cols={"src": pa.int64()}, right_cols={"a": pa.int64()})
            h = hash_agg(joined.map_batches(
                lambda t: t.select(["src", "a"]).group_by("src")
                .aggregate([("a", "sum")]).rename_columns(["src", "p_a"]),
                batch_format="pyarrow"), "src", [("p_a", "sum", "h")])
        h = h.map_batches(lambda t: t.rename_columns(["node", "h"]),
                          batch_format="pyarrow")

    # (auth, hub) combine: union + one grouped sum — no join exchange.
    # Every node appears in BOTH tables (self-zero rows keep a complete;
    # the hub scatter is a bijection over a's nodes), so each group sums
    # one auth row and one hub row.
    au = a.map_batches(
        lambda t: pa.table({"node": t["node"], "pa_": t["a"],
                            "ph_": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow")
    hu = h.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "pa_": pa.array(np.zeros(len(t), np.int64)),
                            "ph_": t["h"]}),
        batch_format="pyarrow")
    return hash_agg(au.union(hu), "node",
                    [("pa_", "sum", "auth"), ("ph_", "sum", "hub")])
