"""Similarity search over the ``embeddings`` table.

* brute-force cosine top-k — the exact baseline: broadcast the QUERY matrix
  (ray.put once, bounded by n/query_stride), per-batch f64 matmul +
  tie-safe top-k inside map_batches; the corpus only ever streams.
* IVF ANN — the scale path: centroids from a SAMPLED k-means (driver state
  is sample-sized, never the corpus), assignment as a distributed
  map_batches, probe as a NATIVE HASH JOIN of (query x probed-list) rows
  against the list-partitioned vector table.
* LSH ANN — multi-table random-hyperplane codes; corpus codes and query
  probe codes (bucket + hamming-1) meet in a native hash join on
  (table_id, code).

No stage loads the full corpus matrix on the driver or broadcasts it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..agg import hash_agg, hash_join



EMB_DIMS = 64  # fixture embedding width; SQL twins unroll over this

# Absolute budget for the k-means fit sample: the driver never collects
# more than this many vectors regardless of corpus size (a raw stride-2
# default would collect HALF of a 100 TB store).  The DuckDB twins
# compute the same effective stride in SQL, so the gate is exact at any
# scale; see effective_sample_stride.
SAMPLE_BUDGET = 262_144


def effective_sample_stride(sf_dir: str, stride: int) -> int:
    """max(stride, ceil(n_vecs / SAMPLE_BUDGET)) — the stride actually
    used for the k-means sample, derived from the parquet row count
    (metadata-only read).  At 100 TB the truly-at-scale alternative is a
    distributed k-means (per-iteration assignment as a map_batches with
    groupby component sums — the exact shape _ivf_kmeans_ctes' d/a/m
    CTEs express); the budgeted sample keeps the deterministic
    single-process fit honest until that is needed."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return max(stride, (n + SAMPLE_BUDGET - 1) // SAMPLE_BUDGET)


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _quant1000(M: np.ndarray) -> np.ndarray:
    """Components rounded half-away-from-zero to 1/1000 units, int64 —
    the shared quantization (label_centroids convention) under which
    every dot product is exact in both numpy and DuckDB."""
    X = np.asarray(M, dtype=np.float64) * 1000.0
    return np.copysign(np.floor(np.abs(X) + 0.5), X).astype(np.int64)


def _pm1_planes(n_tables: int, n_bits: int, dims: int,
                salt: str = "") -> np.ndarray:
    """(T, B, D) ±1 hyperplane tensor: sign for (t, b, d) is the parity of
    md5_upper64(f"{salt}{t}_{b}_{d}") — a deterministic random-sign
    projection family that DuckDB reproduces exactly
    (md5_number_upper(...) % 2)."""
    from .dedup import md5_upper64

    S = np.empty((n_tables, n_bits, dims), np.int64)
    for t in range(n_tables):
        for b in range(n_bits):
            for d in range(dims):
                S[t, b, d] = (1 if md5_upper64(
                    f"{salt}{t}_{b}_{d}".encode()) % 2 == 0 else -1)
    return S


def _lsh_codes_int(M_raw: np.ndarray, S: np.ndarray) -> np.ndarray:
    """(n, T) int64 bucket codes from RAW embeddings: quantize to 1/1000
    ints, exact int dot against ±1 planes, bit b set iff dot >= 0."""
    T, B, D = S.shape
    Q = _quant1000(M_raw)
    bits = (Q @ S.reshape(T * B, D).T >= 0).astype(np.int64)
    w = 1 << np.arange(B, dtype=np.int64)
    return bits.reshape(len(Q), T, B) @ w


def _norm_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return ids, M


def _query_matrix(sf_dir: str, stride: int, normalize: bool = True):
    """(q_ids, Q) for every ``stride``-th vec_id — a distributed filtered
    scan collected to the driver; driver memory is O(n/stride), the
    broadcast-small side, never the corpus."""

    def pick(t: pa.Table) -> pa.Table:
        if normalize:
            ids, M = _norm_rows(t)
        else:
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        m = ids % stride == 0
        return pa.table({"vec_id": pa.array(ids[m], pa.int64()),
                         "v": pa.array([r.tobytes() for r in M[m]],
                                       pa.binary())})

    ids_l, blobs = [], []
    for t in (_emb(sf_dir).map_batches(pick, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        ids_l.append(t["vec_id"].to_numpy(zero_copy_only=False))
        blobs.extend(t["v"].to_pylist())
    q_ids = (np.concatenate(ids_l).astype(np.int64)
             if ids_l else np.empty(0, np.int64))
    Q = (np.frombuffer(b"".join(blobs), np.float64).reshape(len(q_ids), -1)
         if len(q_ids) else np.empty((0, 0)))
    o = np.argsort(q_ids)
    return q_ids[o], np.ascontiguousarray(Q[o])


_KEY_SCALE = 10 ** 12
# ssq=0 (zero vector) ranks last on both sides: -(2^127-1) is the most
# negative value DuckDB's HUGEINT can parse symmetrically
_KEY_MIN = -(2 ** 127 - 1)
# |d| bound keeping d^2 * 10^12 inside HUGEINT (1.3e13^2 * 1e12 ~ 1.69e38
# < 2^127-1 ~ 1.70e38); EMB_DIMS * (1000*maxcomp)^2 stays far below it
# for any sane embedding scale
_KEY_D_MAX = 13_000_000_000_000


def _rational_key(d: int, ssq: int) -> int:
    """BIT-EXACT cosine rank key: sign(d) * ((d^2 * 10^12) // ssq) over
    the QUANTIZED integer dot d and candidate squared norm ssq.  Within
    one query the true cosine is d / (|q| * sqrt(ssq)); |q| is constant,
    and x -> sign(x)*x^2 is monotone, so ordering by this key equals
    ordering by cosine up to the 10^-12 floor resolution — and because
    the division is floor-on-nonnegative on BOTH sides (Python // on a
    nonnegative numerator; DuckDB // truncates, identical on
    nonnegatives), engine and twin compute the SAME integer, so ranks
    can never drift on near-ties the way float accumulation order can.
    DuckDB side: the _ikey_sql expression in __ray_entry__ (HUGEINT)."""
    if ssq == 0:
        return _KEY_MIN
    assert -_KEY_D_MAX <= d <= _KEY_D_MAX, "dot exceeds HUGEINT-safe range"
    q = (d * d * _KEY_SCALE) // ssq
    return q if d >= 0 else -q


def _rank_exact(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-query top-k by the integer rational key (desc), neighbor_id
    asc.  Keys are Python ints (they exceed int64) held in an object
    column — group sizes are probe/candidate-bounded, so the per-group
    Python cost is small and the ranking is exact."""
    g = g.drop_duplicates("neighbor_id")
    keys = [_rational_key(int(d), int(s))
            for d, s in zip(g["d"].to_numpy(), g["ssq"].to_numpy())]
    g = g.assign(__key=pd.Series(keys, index=g.index, dtype=object))
    g = g.sort_values(["__key", "neighbor_id"], ascending=[False, True],
                      kind="mergesort").head(k)
    return pd.DataFrame({"query_id": g["query_id"].to_numpy(),
                         "rnk": np.arange(1, len(g) + 1),
                         "neighbor_id": g["neighbor_id"].to_numpy()})



def _empty_knn() -> rd.Dataset:
    """Empty (query_id, rnk, neighbor_id) result — the no-queries case
    (e.g. no vec_id hits the query stride on an offset-id corpus)."""
    return rd.from_arrow(pa.table({
        "query_id": pa.array([], pa.int64()),
        "rnk": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64())}))

def knn_bruteforce(sf_dir: str, k: int = 5, query_stride: int = 50) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): cosine top-k in QUANTIZED integer
    space for query vectors (every ``query_stride``-th vec_id), self
    excluded; ranked by the BIT-EXACT integer rational key
    (:func:`_rational_key` — d·|d|·10¹²//ssq over 1/1000-quantized
    vectors), ties by neighbor_id asc, so the DuckDB oracle ranks
    IDENTICALLY by construction (no float accumulation order anywhere in
    the ranking).

    The CORPUS streams through map_batches; the (much smaller) QUERY
    matrix is broadcast.  Per batch: a vectorized float prefilter over
    the normalized-QUANTIZED vectors picks the batch-local top-k with a
    1e-9 safety margin (float error of these ops is ~1e-14, so no true
    candidate can be cut), then the few survivors' exact integer (d,
    ssq) are emitted and the per-query merge ranks by the exact key."""
    q_ids, Q_raw = _query_matrix(sf_dir, query_stride, normalize=False)
    if len(q_ids) == 0:
        return _empty_knn()
    Qq = _quant1000(Q_raw)
    qn = np.linalg.norm(Qq.astype(np.float64), axis=1)
    qn[qn == 0] = 1.0
    Qf = Qq.astype(np.float64) / qn[:, None]
    q_ref = ray.put((q_ids, Qf, Qq))

    def batch_topk(t: pa.Table) -> pa.Table:
        qi_ids, qF, qQ = ray.get(q_ref)
        c_ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Cq = _quant1000(np.array(t["embedding"].to_pylist(),
                                 dtype=np.float64))
        cssq = np.einsum("ij,ij->i", Cq, Cq)            # int64 exact
        cn = np.sqrt(cssq.astype(np.float64))
        cn[cn == 0] = 1.0
        sims = qF @ (Cq.astype(np.float64) / cn[:, None]).T  # (nq, nbatch)
        self_mask = qi_ids[:, None] == c_ids[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1])
        thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
        rows_q, rows_n, rows_d, rows_s = [], [], [], []
        for qi in range(sims.shape[0]):
            sel = np.flatnonzero(sims[qi] >= thresh[qi] - 1e-9)
            sel = sel[sims[qi, sel] > -np.inf]
            d_sel = Cq[sel] @ qQ[qi]                    # int64 exact
            # exact per-batch cut: keep rows whose key ties-or-beats the
            # kth exact key (boundary ties survive for the global merge)
            keys = [_rational_key(int(d), int(s))
                    for d, s in zip(d_sel, cssq[sel])]
            if len(keys) > kk:
                kth = sorted(keys, reverse=True)[kk - 1]
            else:
                kth = _KEY_MIN
            for j, d, ky in zip(sel, d_sel, keys):
                if ky < kth:
                    continue
                rows_q.append(qi_ids[qi])
                rows_n.append(c_ids[j])
                rows_d.append(int(d))
                rows_s.append(int(cssq[j]))
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "neighbor_id": pa.array(rows_n, pa.int64()),
                         "d": pa.array(rows_d, pa.int64()),
                         "ssq": pa.array(rows_s, pa.int64())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        return _rank_exact(g, k)

    return (_emb(sf_dir)
            .map_batches(batch_topk, batch_format="pyarrow", batch_size=2048)
            .groupby("query_id")
            .map_groups(merge_group, batch_format="pandas"))


def _kmeans_int(ids: np.ndarray, M_raw: np.ndarray, k: int,
                iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means in QUANTIZED integer space with
    exact DuckDB parity (``__ray_entry__._knn_ivf_sql`` unrolls the same
    iterations):

    * init: the k sample vectors with the smallest
      (md5_upper64(decimal vec_id), vec_id) — a hash-spread pick DuckDB
      reproduces via ORDER BY md5_number_upper(...) LIMIT k;
    * assign: argmax of the EXACT int dot (ties → smallest centroid idx);
    * update: c_d = round_half_away(1000·sum_d / sqrt(Σ_d sum_d²)) — the
      component sums and Σ sum_d² are exact integers (order-independent),
      and the remaining float work is one multiply, one correctly-rounded
      sqrt of an exact int, one divide: bit-identical in numpy and DuckDB.
      Renormalizing every centroid to ‖c‖≈1000 keeps int-dot argmax
      equivalent to cosine assignment.  Empty / zero clusters keep their
      previous centroid."""
    Q = _quant1000(M_raw)
    from .dedup import md5_upper64

    order = sorted(range(len(ids)),
                   key=lambda i: (md5_upper64(str(int(ids[i])).encode()),
                                  int(ids[i])))
    C = Q[order[:k]].copy()  # (k, D) int64
    for _ in range(iters):
        assign = np.argmax(Q @ C.T, axis=1)  # first max = smallest idx
        sums = np.zeros((len(C), Q.shape[1]), np.int64)
        np.add.at(sums, assign, Q)                   # exact int64
        cnts = np.bincount(assign, minlength=len(C)).astype(np.int64)
        C = _centroid_update(C, sums, cnts)
    return C


def _centroid_update(C: np.ndarray, sums: np.ndarray,
                     cnts: np.ndarray) -> np.ndarray:
    """One exact-integer spherical-k-means centroid update — the SINGLE
    definition shared by ``_kmeans_int`` (local fit) and
    ``kmeans_assign_dist`` (map-reduce fit), and mirrored by the DuckDB
    twin's ``c{t}`` CTE: c_d = round_half_away(1000·sum_d/sqrt(Σ sum_d²));
    empty and zero-sum clusters keep their previous centroid.  The
    component sums and Σ sum_d² are exact ints (order-independent), so
    both callers produce bit-identical trajectories."""
    newC = C.copy()
    for c in range(len(C)):
        if cnts[c] == 0:
            continue
        # Σ sum_d² in PYTHON ints: quant-1000 embeddings keep it ≤ ~1.6e13,
        # but unbounded feature counts (topic_clusters' hashed BoW over a
        # web corpus) can push a cluster's component sums past the int64
        # np.dot range — the update runs on the (n_lists × dims) driver
        # matrix, so arbitrary-precision here is free and the exactness
        # contract holds at any corpus size
        T = sum(int(x) * int(x) for x in sums[c])
        if T == 0:
            continue
        v = (1000.0 * sums[c]) / np.sqrt(float(T))
        newC[c] = np.copysign(np.floor(np.abs(v) + 0.5),
                              v).astype(np.int64)
    return newC


def _decode_feat(t: pa.Table) -> tuple[np.ndarray, "np.ndarray | None"]:
    """(ids, Q) from a featurized batch (vec_id int64, q binary int64[D]).
    An EMPTY batch returns (ids, None) — D is unknowable from zero rows,
    and a (0, 0) placeholder would die later in an opaque matmul shape
    error; callers MUST guard on None (sum_partial and assign do)."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs = t["q"].to_pylist()
    if not blobs:
        return ids, None
    D = len(blobs[0]) // 8
    return ids, np.frombuffer(b"".join(blobs), np.int64).reshape(len(ids), D)


def _kmeans_dist_core(feat: rd.Dataset, n_lists: int,
                      iters: int) -> tuple[np.ndarray, rd.Dataset]:
    """FULL-CORPUS deterministic integer k-means with per-iteration
    DISTRIBUTED assignment over a MATERIALIZED featurized table
    (vec_id int64, q binary int64-vector) — the at-scale fit that
    replaces the sampled single-process ``_kmeans_int`` (whose docstring
    promises exactly this shape at 100 TB).  No stage ever holds more
    than (n_lists × dims) integers of centroid state:

      * init: the n_lists rows with the smallest
        (md5_upper64(decimal vec_id), vec_id) — per-batch partial top-k
        merge, then one filtered pass collects just those k vectors;
      * per iteration: broadcast the centroid matrix, one streaming
        ``map_batches`` computes the exact-int argmax assignment AND the
        per-cluster component-sum/count partials (np.add.at scatter —
        (n_lists × dims) rows per batch), a ``hash_agg`` sums them, and
        the driver applies ``_centroid_update`` (shared with
        ``_kmeans_int``) to its (n_lists × dims) state — component sums
        are order-independent integers, so the trajectory is
        BIT-IDENTICAL to ``_kmeans_int`` over the same vector set and to
        the unrolled DuckDB CTE twin;
      * final: one more streaming assignment pass.

    Cost: iters+2 scans of the featurized table with (n_lists × dims)
    exchange width each — the classic map-reduce k-means; feature
    vectors never collect anywhere.  Returns (C, (vec_id, list_id))."""
    from .dedup import md5_upper64

    # ---- init: distributed partial top-k under the (md5, vec_id) order
    def init_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.fromiter((md5_upper64(str(int(i)).encode()) for i in ids),
                           dtype=np.uint64, count=len(ids))
        order = np.lexsort((ids, keys))[:n_lists]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "mh": pa.array(keys[order], pa.uint64())})

    parts = [t for t in (feat.select_columns(["vec_id"])
                         .map_batches(init_partial, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow"))]
    allc = pa.concat_tables(parts) if parts else pa.table(
        {"vec_id": pa.array([], pa.int64()), "mh": pa.array([], pa.uint64())})
    ids_np = allc["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mh_np = allc["mh"].to_numpy(zero_copy_only=False)
    pick = np.lexsort((ids_np, mh_np))[:n_lists]
    init_ids = ids_np[pick]  # in (md5, id) order — the centroid index order

    def init_vecs(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, init_ids)  # vectorized membership, no row loop
        return t.filter(pa.array(keep))

    cvecs: dict[int, bytes] = {}
    for t in (feat.map_batches(init_vecs, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        cvecs.update(zip(t["vec_id"].to_pylist(), t["q"].to_pylist()))
    C = (np.frombuffer(b"".join(cvecs[int(i)] for i in init_ids), np.int64)
         .reshape(len(init_ids), -1).copy())

    D = C.shape[1]
    for _ in range(iters):
        c_ref = ray.put(C)

        def sum_partial(t: pa.Table) -> pa.Table:
            CC = ray.get(c_ref)
            _ids, Q = _decode_feat(t)
            if Q is None:  # empty block: zero contribution
                z = pa.array([], pa.int64())
                return pa.table({"c": z, "d": z, "p_sum": z, "p_n": z})
            a = np.argmax(Q @ CC.T, axis=1)  # first max = smallest idx
            sums = np.zeros((n_lists, D), np.int64)
            np.add.at(sums, a, Q)
            cnt = np.bincount(a, minlength=n_lists).astype(np.int64)
            return pa.table({
                "c": pa.array(np.repeat(np.arange(n_lists, dtype=np.int64),
                                        D)),
                "d": pa.array(np.tile(np.arange(D, dtype=np.int64),
                                      n_lists)),
                "p_sum": pa.array(sums.reshape(-1)),
                "p_n": pa.array(np.repeat(cnt, D)),
            })

        agg = hash_agg(feat.map_batches(sum_partial, batch_format="pyarrow"),
                       ["c", "d"], [("p_sum", "sum", "sd"),
                                    ("p_n", "sum", "n")],
                       num_partitions=8)
        sums = np.zeros((n_lists, D), np.int64)
        cnts = np.zeros(n_lists, np.int64)
        for t in agg.iter_batches(batch_format="pyarrow"):  # n_lists×D rows
            cc = t["c"].to_numpy(zero_copy_only=False)
            dd = t["d"].to_numpy(zero_copy_only=False)
            sums[cc, dd] = t["sd"].to_numpy(zero_copy_only=False)
            cnts[cc] = t["n"].to_numpy(zero_copy_only=False)
        C = _centroid_update(C, sums, cnts)

    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        CC = ray.get(c_ref)
        ids, Q = _decode_feat(t)
        if Q is None:  # empty block
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "list_id": z})
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "list_id": pa.array(np.argmax(Q @ CC.T, axis=1).astype(np.int64)),
        })

    return C, feat.map_batches(assign, batch_format="pyarrow")


def kmeans_assign_dist(sf_dir: str, n_lists: int = 16,
                       iters: int = 10) -> rd.Dataset:
    """(vec_id, list_id): the distributed k-means core
    (``_kmeans_dist_core``) over the quantized embedding table — one
    featurize pass (quant-1000 int vectors as binary rows, materialized
    in the spillable object store), then the shared map-reduce fit.
    DuckDB twin: the unrolled integer-k-means CTEs at stride 1."""

    def featurize(t: pa.Table) -> pa.Table:
        Q = _quant1000(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "q": pa.array([r.tobytes() for r in Q], pa.binary())})

    feat = _emb(sf_dir).map_batches(featurize,
                                    batch_format="pyarrow").materialize()
    _C, assigned = _kmeans_dist_core(feat, n_lists, iters)
    return assigned


def _score_candidates(joined: rd.Dataset, k: int) -> rd.Dataset:
    """(query_id, qv, vec_id, v) rows — both blobs QUANTIZED int64 — →
    per-batch vectorized exact integer (d, ssq) → per-query merge ranked
    by the bit-exact rational key (candidate sets are probe-bounded, so
    the merge groups stay small)."""

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "ssq": pa.array([], pa.int64())})
        n = len(t)
        qv = np.frombuffer(b"".join(t["qv"].to_pylist()),
                           np.int64).reshape(n, -1)
        cv = np.frombuffer(b"".join(t["v"].to_pylist()),
                           np.int64).reshape(n, -1)
        d = np.einsum("ij,ij->i", qv, cv)               # int64 exact
        ssq = np.einsum("ij,ij->i", cv, cv)
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        nid = t["vec_id"].to_numpy(zero_copy_only=False)
        m = qid != nid  # self excluded
        return pa.table({"query_id": pa.array(qid[m], pa.int64()),
                         "neighbor_id": pa.array(nid[m], pa.int64()),
                         "d": pa.array(d[m], pa.int64()),
                         "ssq": pa.array(ssq[m], pa.int64())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        return _rank_exact(g, k)

    return (joined.map_batches(score, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(merge_group, batch_format="pandas"))


def ivf_assignments(sf_dir: str, n_lists: int = 16,
                    sample_stride: int = 2, iters: int = 10,
                    vec_format: str = "norm_f64",
                    ) -> tuple[np.ndarray, rd.Dataset]:
    """(centroids, assigned dataset): fit the deterministic integer
    k-means on the sample and assign the whole corpus — the shared
    prelude of knn_ivf, knn_ivfpq's list side and
    dedup.semantic_dedup.  Returns the (n_lists, dims) int64 centroid
    matrix plus a streaming Dataset of (list_id, vec_id, v) rows where
    ``v`` is the L2-normalized vector as float64 bytes
    (``vec_format="norm_f64"``, semantic_dedup's cosine kernel) or the
    1/1000-quantized vector as int64 bytes (``"quant_i64"``, the
    bit-exact ranking input of knn_ivf)."""
    eff = effective_sample_stride(sf_dir, sample_stride)
    s_ids, S = _query_matrix(sf_dir, eff, normalize=False)
    C = _kmeans_int(s_ids, S, n_lists, iters)
    c_ref = ray.put(C)
    quant = vec_format == "quant_i64"

    def assign(t: pa.Table) -> pa.Table:
        CC = ray.get(c_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M_raw = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        Q = _quant1000(M_raw)
        lists = np.argmax(Q @ CC.T, axis=1).astype(np.int64)
        M = Q if quant \
            else M_raw / np.linalg.norm(M_raw, axis=1, keepdims=True)
        return pa.table({"list_id": pa.array(lists),
                         "vec_id": pa.array(ids, pa.int64()),
                         "v": pa.array([r.tobytes() for r in M],
                                       pa.binary())})

    return C, _emb(sf_dir).map_batches(assign, batch_format="pyarrow")


def knn_ivf(sf_dir: str, k: int = 5, query_stride: int = 50,
            n_lists: int = 16, n_probe: int = 6,
            sample_stride: int = 2, iters: int = 10) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): ANN via an IVF coarse quantizer.

    The quantizer is the DETERMINISTIC integer k-means of ``_kmeans_int``
    — assignments, probes and candidate sets are bit-reproducible, and
    the final ranking uses the bit-exact integer rational key
    (:func:`_rational_key`), so the WHOLE retrieval — candidates AND
    ranks — has a strict-hash DuckDB twin
    (``__ray_entry__._knn_ivf_sql``, iterations unrolled).  Recall vs
    brute force is additionally floor-tested in pytest.

    Scale shape: centroids come from a SAMPLED k-means (every
    ``sample_stride``-th vector — driver/broadcast state is sample-sized);
    list assignment is a distributed map; the probe is a NATIVE HASH JOIN
    of (query x its n_probe nearest lists) against the (list_id, vec)
    table, so each query's work touches only its probed lists."""
    C, vec_tbl = ivf_assignments(sf_dir, n_lists, sample_stride, iters,
                                 vec_format="quant_i64")

    q_ids, Q_raw = _query_matrix(sf_dir, query_stride, normalize=False)
    if len(q_ids) == 0:
        return _empty_knn()
    Q = _quant1000(Q_raw)
    dots = Q @ C.T                                       # exact int
    # top n_probe lists per query, ties → smaller centroid idx
    cidx = np.arange(C.shape[0], dtype=np.int64)
    probe_lists = np.empty((len(q_ids), min(n_probe, C.shape[0])), np.int64)
    for qi in range(len(q_ids)):
        order = np.lexsort((cidx, -dots[qi]))
        probe_lists[qi] = order[:probe_lists.shape[1]]
    n_pr = probe_lists.shape[1]
    q_tbl = pa.table({
        "list_id": pa.array(probe_lists.ravel().astype(np.int64)),
        "query_id": pa.array(np.repeat(q_ids, n_pr), pa.int64()),
        "qv": pa.array([Q[i].tobytes() for i in range(len(q_ids))
                        for _ in range(n_pr)], pa.binary())})

    joined = hash_join(rd.from_arrow(q_tbl), vec_tbl, on="list_id",
                       left_cols={"query_id": pa.int64(),
                                  "qv": pa.binary()},
                       right_cols={"vec_id": pa.int64(),
                                   "v": pa.binary()})
    return _score_candidates(joined, k)


KNN_LSH_SALT = "knn_"  # distinct plane family from lsh_code's unsalted one


def knn_lsh(sf_dir: str, k: int = 5, query_stride: int = 50,
            n_planes: int = 6, n_tables: int = 8) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): ANN via MULTI-TABLE random-hyperplane
    LSH — L independent tables of b planes each; a query's candidates are
    the union over tables of its bucket + hamming-1 buckets.

    Hyperplanes are the DETERMINISTIC md5-parity ±1 family
    (``_pm1_planes``, salt "knn_") and codes are computed in quantized
    integer space (``_lsh_codes_int``) — exact in both numpy and DuckDB —
    and the final ranking uses the bit-exact integer rational key
    (:func:`_rational_key`), so the WHOLE retrieval — candidate sets AND
    ranks — has a strict-hash DuckDB twin (``__ray_entry__._knn_lsh_sql``).
    Recall vs brute force is additionally floor-tested in pytest.

    Scale shape: corpus code rows (one per table) and query probe rows
    (bucket + hamming-1 per table) meet in a NATIVE HASH JOIN on
    (table_id, code) — the bucket index is never built or broadcast as one
    object.  Duplicate candidates across tables are dropped in the
    per-query merge."""
    import pyarrow.parquet as _pq
    dim = len(_pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"])["embedding"][0])
    planes = _pm1_planes(n_tables, n_planes, dim, KNN_LSH_SALT)
    p_ref = ray.put(planes)

    def corpus_rows(t: pa.Table) -> pa.Table:
        P = ray.get(p_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M_raw = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        codes = _lsh_codes_int(M_raw, P)                   # (n, T)
        M = _quant1000(M_raw)                              # int64 blobs
        L = P.shape[0]
        blobs = [r.tobytes() for r in M]
        return pa.table({
            "table_id": pa.array(np.tile(np.arange(L, dtype=np.int64),
                                         len(ids))),
            "code": pa.array(codes.ravel()),
            "vec_id": pa.array(np.repeat(ids, L), pa.int64()),
            "v": pa.array([blobs[i] for i in range(len(ids))
                           for _ in range(L)], pa.binary())})

    vec_tbl = _emb(sf_dir).map_batches(corpus_rows, batch_format="pyarrow")

    q_ids, Q_raw = _query_matrix(sf_dir, query_stride, normalize=False)
    if len(q_ids) == 0:
        return _empty_knn()
    qcodes = _lsh_codes_int(Q_raw, planes)  # (nq, L)
    Q = _quant1000(Q_raw)                   # int64 query blobs
    rows_t, rows_c, rows_q, rows_v = [], [], [], []
    for qi in range(len(q_ids)):
        blob = Q[qi].tobytes()
        for li in range(n_tables):
            base = int(qcodes[qi, li])
            for code in [base] + [base ^ (1 << b) for b in range(n_planes)]:
                rows_t.append(li)
                rows_c.append(code)
                rows_q.append(q_ids[qi])
                rows_v.append(blob)
    q_tbl = pa.table({"table_id": pa.array(rows_t, pa.int64()),
                      "code": pa.array(rows_c, pa.int64()),
                      "query_id": pa.array(rows_q, pa.int64()),
                      "qv": pa.array(rows_v, pa.binary())})

    joined = hash_join(rd.from_arrow(q_tbl), vec_tbl,
                       on=["table_id", "code"],
                       left_cols={"query_id": pa.int64(),
                                  "qv": pa.binary()},
                       right_cols={"vec_id": pa.int64(),
                                   "v": pa.binary()})
    return _score_candidates(joined, k)

def emb_norm_stats(sf_dir: str) -> rd.Dataset:
    """(vec_id, sq_sum, n_dims): per-vector squared-L2 norm in QUANTIZED
    integer space — each component rounded half-away-from-zero to 1/1000
    units, squared, summed as int64 (exact under any summation order, so
    the DuckDB comparison and any cluster width agree bit-for-bit; the
    embedding-sanity pass a corpus runs before ANN indexing).  Pure
    per-batch map, no shuffle."""

    def kernel(t: pa.Table) -> pa.Table:
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
        Q = np.copysign(np.floor(np.abs(M) + 0.5), M).astype(np.int64)
        return pa.table({
            "vec_id": t["vec_id"],
            "sq_sum": pa.array((Q * Q).sum(axis=1), pa.int64()),
            "n_dims": pa.array(np.full(len(t), M.shape[1], dtype=np.int64),
                               pa.int64()),
        })

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


def ivf_assign(sf_dir: str, n_centroids: int = 8) -> rd.Dataset:
    """(vec_id, list_id, score): the IVF coarse-quantizer ASSIGNMENT step
    in quantized integer space — the SQL-checkable intermediate of the IVF
    ANN path (knn_ivf itself is approximate and recall-gated; this pins
    the partitioning math bit-exactly against DuckDB's
    ``list_inner_product`` over the same quantization).

    Centroids are the ``n_centroids`` smallest-vec_id vectors
    (deterministic; sample-sized broadcast — the same contract as
    knn_ivf's sampled centroids).  Components quantize to 1/1000 units
    round-half-away (the ``label_centroids`` convention), scores are
    int64 dot products (|score| <= dims x 2000^2 ~ 2.6e8 — exact in
    DuckDB's double), ties break to the smallest centroid id.

    Scale shape: one streaming ``map_batches`` over the corpus with a
    vectorized (batch x centroids) integer matmul; no shuffle, driver
    state is centroid-sized."""
    import pyarrow.parquet as pq

    # The n_centroids SMALLEST vec_ids (the twin's ORDER BY vec_id LIMIT n),
    # regardless of id offset/sparsity: a cheap id-column-only pass finds the
    # k-th smallest id, then one pruned read fetches just those vectors.
    ids_only = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id"])["vec_id"]
    ids_np = np.sort(ids_only.to_numpy(zero_copy_only=False).astype(np.int64))
    if len(ids_np) == 0:
        raise ValueError("embeddings table is empty; no centroids")
    kth = int(ids_np[min(n_centroids, len(ids_np)) - 1])
    ct = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<=", kth)])
    C = np.array(ct["embedding"].to_pylist(), dtype=np.float64) * 1000.0
    CQ = np.copysign(np.floor(np.abs(C) + 0.5), C).astype(np.int64)
    cids = ct["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(cids)[:n_centroids]
    cids, CQ = cids[o], CQ[o]
    c_ref = ray.put((cids, CQ))

    def kernel(t: pa.Table) -> pa.Table:
        cc, cq = ray.get(c_ref)
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
        Q = np.copysign(np.floor(np.abs(M) + 0.5), M).astype(np.int64)
        S = Q @ cq.T
        # np.argmax takes the FIRST max; cids ascend, so ties land on the
        # smallest centroid id — same as the twin's ORDER BY score DESC, cid
        best = np.argmax(S, axis=1)
        return pa.table({
            "vec_id": t["vec_id"],
            "list_id": pa.array(cc[best], pa.int64()),
            "score": pa.array(S[np.arange(len(best)), best], pa.int64())})

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


def lsh_code(sf_dir: str, n_tables: int = 4, n_bits: int = 8,
             dims: int = EMB_DIMS) -> rd.Dataset:
    """(vec_id, table_id, code): multi-table sign-LSH bucket codes — the
    SQL-checkable intermediate of the LSH ANN path (knn_lsh itself is
    recall-gated; this pins the bucketing math bit-exactly).

    Hyperplanes are DETERMINISTIC ±1 vectors: component sign for
    (table t, bit b, dim d) is the parity of md5_upper64("t_b_d") — a
    valid random-sign projection family that DuckDB reproduces exactly.
    Components quantize to 1/1000 units round-half-away (the
    ``label_centroids`` convention); bit b of a table's code is 1 iff
    the int64 dot with that hyperplane is >= 0.

    Scale shape: the (tables x bits x dims) sign tensor is constant-sized
    broadcast state; one streaming ``map_batches`` with a vectorized
    integer matmul per batch — no shuffle.  Downstream, near-dup
    candidates are pairs sharing (table_id, code): a groupby on this
    output, exactly the emb-dedup bucketing already used in
    dedup.embedding_dups."""
    S = _pm1_planes(n_tables, n_bits, dims)  # unsalted family
    s_ref = ray.put(S)

    def kernel(t: pa.Table) -> pa.Table:
        sg = ray.get(s_ref)
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        codes = _lsh_codes_int(M, sg)                    # (n, T)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, n_tables), pa.int64()),
            "table_id": pa.array(np.tile(np.arange(n_tables, dtype=np.int64),
                                         len(ids)), pa.int64()),
            "code": pa.array(codes.reshape(-1), pa.int64())})

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


RP_SALT = "rp_"  # distinct plane family from lsh_code's and knn_lsh's


def rp_sketch(sf_dir: str, k: int = 16, dims: int = EMB_DIMS) -> rd.Dataset:
    """(vec_id, comp, s): deterministic ±1 random-projection sketch — each
    vector reduced to ``k`` EXACT integer components s_j = Σ_d sign(j,d)·q_d
    over the 1/1000-quantized vector (signs = md5-parity family, salt
    "rp_" — the Achlioptas/JL sign projection in reproducible integer
    arithmetic).  The dimensionality-reduction step before ANN indexing
    or sketch-space clustering: distances in sketch space approximate
    scaled distances in embedding space, and because both sides compute
    the identical int64 sums the sketch is strict-hash SQL-checkable.

    Scale shape: the (k × dims) sign matrix is constant broadcast state;
    one streaming map_batches with a vectorized integer matmul — no
    shuffle, no driver state."""
    S = _pm1_planes(1, k, dims, RP_SALT)[0]  # (k, dims) ±1 int64
    s_ref = ray.put(S)

    def kernel(t: pa.Table) -> pa.Table:
        sg = ray.get(s_ref)
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        Q = _quant1000(M)
        sk = Q @ sg.T                                   # (n, k) int64 exact
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = sg.shape[0]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, kk), pa.int64()),
            "comp": pa.array(np.tile(np.arange(kk, dtype=np.int64),
                                     len(ids)), pa.int64()),
            "s": pa.array(sk.reshape(-1), pa.int64())})

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


def norm_outliers(sf_dir: str, lo_q: float = 0.01,
                  hi_q: float = 0.99) -> rd.Dataset:
    """(vec_id, sq_sum, outlier): flag vectors whose QUANTIZED squared
    norm falls outside the corpus [lo_q, hi_q] quantile_disc gates — the
    embedding sanity pass run before ANN indexing (near-zero and blown
    norms poison cosine buckets).  Quantiles are EXACT at any
    value-domain size via the distributed order-statistic composition
    (events.gap_quantiles pattern): range-partitioned sort on sq_sum,
    O(blocks) count walk, two point lookups; thresholds broadcast for
    one streaming flag pass."""

    stats = emb_norm_stats(sf_dir).materialize()
    sorted_refs = stats.sort("sq_sum").to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def nrows(tb: pa.Table) -> int:
        return tb.num_rows

    @ray.remote(num_cpus=0.25)
    def pick(tb: pa.Table, i: int) -> int:
        return int(tb["sq_sum"][i].as_py())

    counts = ray.get([nrows.remote(r) for r in sorted_refs])
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("vec_id", pa.int64()), ("sq_sum", pa.int64()),
             ("outlier", pa.bool_())]).empty_table())
    picks = []
    for q in (lo_q, hi_q):
        rank = max(1, int(np.ceil(q * total)))
        blk = int(np.searchsorted(cum, rank, side="left"))
        local = rank - (int(cum[blk - 1]) if blk else 0) - 1
        picks.append(pick.remote(sorted_refs[blk], local))
    lo, hi = ray.get(picks)

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = t["sq_sum"]
        out = pc.or_(pc.less(s, pa.scalar(lo, pa.int64())),
                     pc.greater(s, pa.scalar(hi, pa.int64())))
        return pa.table({"vec_id": t["vec_id"], "sq_sum": s,
                         "outlier": out})

    return stats.map_batches(flag, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> rd.Dataset:
    """(label, dim, q_sum, n_vecs): per-label centroid of the embedding
    column in QUANTIZED integer space (components rounded half-away to
    1/1000 units, summed as int64 — exact under any order/width, same
    contract as emb_norm_stats; divide q_sum/n_vecs downstream for the
    float centroid).  The class-prototype build a labeled corpus runs
    before nearest-centroid classification.

    Scale shape: each batch collapses to |labels| x |dims| partial rows
    (np.add.at scatter — no per-row Python), so the shuffle carries
    centroids-per-batch, never vectors; final groupby over a tiny key
    domain."""
    from ray.data.aggregate import Sum

    def kernel(t: pa.Table) -> pa.Table:
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
        Q = np.copysign(np.floor(np.abs(M) + 0.5), M).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        d = Q.shape[1]
        sums = np.zeros((len(ulab), d), np.int64)
        np.add.at(sums, inv, Q)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(ulab)), pa.int64()),
            "p_sum": pa.array(sums.reshape(-1), pa.int64()),
            "p_n": pa.array(np.repeat(counts, d), pa.int64())})

    return (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])
            .map_batches(kernel, batch_format="pyarrow")
            .groupby(["label", "dim"])
            .aggregate(Sum("p_sum", alias_name="q_sum"),
                       Sum("p_n", alias_name="n_vecs")))


def label_doc_stats(sf_dir: str) -> rd.Dataset:
    """(label, n_docs, sum_chars, max_chars): document-size profile per
    embedding label — the cross-modal join every curated corpus runs to
    sanity-check cluster labels against raw text (e.g. 'is cluster 7 the
    short-spam cluster?').

    Scale shape: both sides are projected to two int columns BEFORE the
    native hash join (embedding vectors and text never cross the
    exchange); the post-join aggregate pre-combines each batch down to
    |labels| rows, so the second shuffle is label-count wide."""
    from ray.data.aggregate import Max, Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])
    joined = hash_join(emb, docs, on="vec_id", right_on="doc_id",
                       left_cols={"label": pa.int32()},
                       right_cols={"n_chars": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"label": t["label"].cast(pa.int64()),
                       "n_chars": t["n_chars"]})
             .group_by("label")
             .aggregate([("n_chars", "count"), ("n_chars", "sum"),
                         ("n_chars", "max")]))
        return g.rename_columns(["label", "p_n", "p_sum", "p_max"])

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Sum("p_n", alias_name="n_docs"),
                       Sum("p_sum", alias_name="sum_chars"),
                       Max("p_max", alias_name="max_chars")))


def pq_assign(sf_dir: str, n_sub: int = 8, n_codes: int = 16) -> rd.Dataset:
    """(vec_id, subspace, code, dist): PRODUCT-QUANTIZATION code
    assignment — the memory-compression side of large-scale ANN (each
    vector stored as n_sub bytes instead of dims floats).  Split the
    embedding into ``n_sub`` contiguous subspaces; per subspace the
    codebook is the sub-vectors of the ``n_codes`` smallest vec_ids (the
    deterministic sample pick shared with ivf_assign), and the code is
    the codebook entry minimizing EXACT integer squared-L2 distance in
    quantized 1/1000 space (ties → smaller code id) — bit-reproducible
    and SQL-checkable end-to-end.

    Scale shape: the (n_sub × n_codes × sub_dims) codebook tensor is
    constant-sized broadcast state; one streaming map_batches computes
    per-batch ‖x‖² − 2x·c + ‖c‖² with vectorized integer matmuls — no
    shuffle."""
    books = _pq_codebooks(sf_dir, n_sub, n_codes)  # shared with knn_ivfpq
    sd = books.shape[2]
    b_ref = ray.put(books)

    def kernel(t: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _quant1000(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        n = len(ids)
        out_v, out_s, out_c, out_d = [], [], [], []
        for s in range(n_sub):
            X = Q[:, s * sd:(s + 1) * sd]              # (n, sd)
            C = B[s]                                   # (n_codes, sd)
            d2 = ((X * X).sum(axis=1)[:, None]
                  - 2 * (X @ C.T)
                  + (C * C).sum(axis=1)[None, :])      # exact int64
            code = np.argmin(d2, axis=1)               # first min = smaller id
            out_v.append(ids)
            out_s.append(np.full(n, s, np.int64))
            out_c.append(code.astype(np.int64))
            out_d.append(d2[np.arange(n), code])
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "subspace": pa.array(np.concatenate(out_s), pa.int64()),
            "code": pa.array(np.concatenate(out_c), pa.int64()),
            "dist": pa.array(np.concatenate(out_d), pa.int64())})

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


def pq_distortion(sf_dir: str, n_sub: int = 8,
                  n_codes: int = 16) -> rd.Dataset:
    """(vec_id, ssq, distortion): PQ reconstruction-error audit — each
    vector's total EXACT integer squared-L2 distance to its
    product-quantized reconstruction (Σ over subspaces of the winning
    codebook distance), next to the vector's quantized squared norm
    (distortion/ssq is the relative error that decides whether the PQ
    config is safe for the retrieval tier).  Same deterministic
    codebooks as pq_assign/knn_ivfpq; one streaming map_batches with
    vectorized integer matmuls, no shuffle."""
    books = _pq_codebooks(sf_dir, n_sub, n_codes)
    sd = books.shape[2]
    b_ref = ray.put(books)

    def kernel(t: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _quant1000(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        n = len(ids)
        total = np.zeros(n, np.int64)
        for s in range(n_sub):
            X = Q[:, s * sd:(s + 1) * sd]
            C = B[s]
            d2 = ((X * X).sum(axis=1)[:, None]
                  - 2 * (X @ C.T)
                  + (C * C).sum(axis=1)[None, :])
            total += d2.min(axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "ssq": pa.array(np.einsum("ij,ij->i", Q, Q), pa.int64()),
            "distortion": pa.array(total, pa.int64())})

    return _emb(sf_dir).map_batches(kernel, batch_format="pyarrow")


def _pq_codebooks(sf_dir: str, n_sub: int, n_codes: int):
    """(n_sub, n_codes, sd) int64 codebook tensor — sub-vectors of the
    n_codes smallest vec_ids (two-pass pruned read; the deterministic
    sample pick shared with pq_assign)."""
    import pyarrow.parquet as pq

    ids_only = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id"])["vec_id"]
    ids_np = np.sort(ids_only.to_numpy(zero_copy_only=False).astype(np.int64))
    if len(ids_np) == 0:
        raise ValueError("embeddings table is empty; no codebook")
    kth = int(ids_np[min(n_codes, len(ids_np)) - 1])
    ct = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<=", kth)])
    CQ = _quant1000(np.array(ct["embedding"].to_pylist(), dtype=np.float64))
    cids = ct["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(cids)[:n_codes]
    CQ = CQ[o]
    dims = CQ.shape[1]
    assert dims % n_sub == 0
    sd = dims // n_sub
    return np.stack([CQ[:, s * sd:(s + 1) * sd] for s in range(n_sub)])


def _pq_encode(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, n_sub) uint8 codes: exact int squared-L2 argmin per subspace
    (ties → smaller code id, np.argmin first-min)."""
    n_sub, n_codes, sd = books.shape
    out = np.empty((len(Q), n_sub), np.uint8)
    for s in range(n_sub):
        X = Q[:, s * sd:(s + 1) * sd]
        C = books[s]
        d2 = ((X * X).sum(axis=1)[:, None] - 2 * (X @ C.T)
              + (C * C).sum(axis=1)[None, :])
        out[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return out


def knn_ivfpq(sf_dir: str, k: int = 5, query_stride: int = 50,
              n_lists: int = 16, n_probe: int = 6, sample_stride: int = 2,
              iters: int = 10, n_sub: int = 8, n_codes: int = 16,
              rerank: int = 64) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): the FAISS-style IVF+PQ retrieval —
    the memory-bounded ANN path for 100 TB-scale embedding stores:

      1. IVF coarse quantizer: the deterministic integer k-means of
         ``_kmeans_int`` (shared with knn_ivf);
      2. PQ encoding: each corpus vector stored as ``n_sub`` BYTES (its
         per-subspace nearest-codebook-entry ids, exact int squared-L2);
      3. ADC candidate scoring: for each (query × probed-list) candidate,
         the approximate distance is the sum of the query's EXACT integer
         subspace distances to the candidate's codes — computed from an
         (n_sub × n_codes) per-query lookup table, never the candidate's
         raw vector;
      4. top-``rerank`` candidates per query by (adc, vec_id) fetch their
         REAL vectors via a semi-join streaming pass and rerank by the
         BIT-EXACT integer rational key (:func:`_rational_key`) to the
         final top-k.

    Every stage — including the final ranks — is bit-reproducible, so
    the WHOLE retrieval has a strict-hash DuckDB twin
    (``__ray_entry__._knn_ivfpq_sql``); recall vs brute force is
    floor-tested in pytest.

    Scale shape: the candidate join carries (list_id, vec_id, n_sub-byte
    codes) rows — the PQ-compressed index, not vectors; only
    rerank × queries rows ever touch a raw vector again, through a second
    co-partitioned join.  Broadcast state is the centroid tensor + the
    codebooks + per-query LUTs (all sample/constant-sized)."""

    eff = effective_sample_stride(sf_dir, sample_stride)
    s_ids, S = _query_matrix(sf_dir, eff, normalize=False)
    C = _kmeans_int(s_ids, S, n_lists, iters)
    books = _pq_codebooks(sf_dir, n_sub, n_codes)
    c_ref = ray.put((C, books))

    def encode(t: pa.Table) -> pa.Table:
        CC, B = ray.get(c_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _quant1000(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        lists = np.argmax(Q @ CC.T, axis=1).astype(np.int64)
        codes = _pq_encode(Q, B)
        return pa.table({"list_id": pa.array(lists),
                         "vec_id": pa.array(ids, pa.int64()),
                         "codes": pa.array([r.tobytes() for r in codes],
                                           pa.binary())})

    index = _emb(sf_dir).map_batches(encode, batch_format="pyarrow")

    # queries: probe lists + per-query exact-int LUTs (n_sub x n_codes).
    # The LUT TENSOR broadcasts once (queries × n_sub × n_codes ints —
    # output-sized); join rows carry only (list_id, query_id), so the
    # exchange moves ids + n_sub-byte codes, never LUTs or vectors.
    q_ids, Q_raw = _query_matrix(sf_dir, query_stride, normalize=False)
    if len(q_ids) == 0:
        return _empty_knn()
    Qq = _quant1000(Q_raw)
    dots = Qq @ C.T
    cidx = np.arange(C.shape[0], dtype=np.int64)
    n_pr = min(n_probe, C.shape[0])
    sdd = books.shape[2]
    luts = np.empty((len(q_ids), n_sub, n_codes), np.int64)
    rows_l, rows_q = [], []
    for qi in range(len(q_ids)):
        order = np.lexsort((cidx, -dots[qi]))[:n_pr]
        for s in range(n_sub):
            X = Qq[qi, s * sdd:(s + 1) * sdd]
            Cb = books[s]
            luts[qi, s] = (X @ X) - 2 * (Cb @ X) + (Cb * Cb).sum(axis=1)
        for li in order:
            rows_l.append(int(li))
            rows_q.append(int(q_ids[qi]))
    lut_ref = ray.put((q_ids, luts))  # q_ids sorted asc by _query_matrix
    q_tbl = pa.table({"list_id": pa.array(rows_l, pa.int64()),
                      "query_id": pa.array(rows_q, pa.int64())})

    joined = hash_join(rd.from_arrow(q_tbl), index, on="list_id",
                       left_cols={"query_id": pa.int64()},
                       right_cols={"vec_id": pa.int64(),
                                   "codes": pa.binary()})

    def adc_topr(t: pa.Table) -> pa.Table:
        """ADC scores + per-batch top-``rerank`` combiner per query (the
        global top-R is within the union of per-batch top-Rs)."""
        if len(t) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.int64())})
        lq_ids, L = ray.get(lut_ref)
        n = len(t)
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        codes = np.frombuffer(b"".join(t["codes"].to_pylist()),
                              np.uint8).reshape(n, n_sub)
        row_luts = L[np.searchsorted(lq_ids, qid)]  # (n, n_sub, n_codes)
        adc = np.take_along_axis(
            row_luts, codes[:, :, None].astype(np.int64), axis=2
        )[:, :, 0].sum(axis=1)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        m = qid != vid
        df = pd.DataFrame({"query_id": qid[m], "vec_id": vid[m],
                           "adc": adc[m]})
        df = (df.sort_values(["adc", "vec_id"], kind="mergesort")
                .groupby("query_id", sort=False).head(rerank))
        return pa.Table.from_pandas(df, preserve_index=False)

    # global top-R per query as a DISTRIBUTED groupby reduce over the
    # per-batch-combined partials (the _score_candidates merge shape) —
    # no driver-side concat of per-block partials; only the final reduced
    # table (provably ≤ queries × rerank rows, the same budget
    # _query_matrix already uses) ever reaches the driver
    def topr_group(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["adc", "vec_id"], kind="mergesort")
                .head(rerank)[["query_id", "vec_id"]])

    topr = (joined.map_batches(adc_topr, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(topr_group, batch_format="pandas"))

    # rerank: broadcast the output-sized (vec_id → [query_id]) multimap
    # and SEMI-JOIN it against one streaming pass over the corpus — only
    # rerank × queries pairs ever score, and no all-to-all moves vectors
    wanted: dict[int, list[int]] = {}
    for t in topr.iter_batches(batch_format="pyarrow"):
        for qid, vid in zip(t["query_id"].to_pylist(),
                            t["vec_id"].to_pylist()):
            wanted.setdefault(int(vid), []).append(int(qid))
    w_ref = ray.put((wanted, q_ids, Qq))  # Qq: quantized query matrix

    def score(t: pa.Table) -> pa.Table:
        wmap, qi_ids, qM = ray.get(w_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _quant1000(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        ssqs = np.einsum("ij,ij->i", M, M)              # int64 exact
        rows_q, rows_n, rows_d, rows_s = [], [], [], []
        for i, vid in enumerate(ids):
            qs = wmap.get(int(vid))
            if not qs:
                continue
            for qid in qs:
                pos = int(np.searchsorted(qi_ids, qid))
                rows_q.append(qid)
                rows_n.append(int(vid))
                rows_d.append(int(qM[pos] @ M[i]))      # int64 exact
                rows_s.append(int(ssqs[i]))
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "neighbor_id": pa.array(rows_n, pa.int64()),
                         "d": pa.array(rows_d, pa.int64()),
                         "ssq": pa.array(rows_s, pa.int64())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        return _rank_exact(g, k)

    return (_emb(sf_dir).map_batches(score, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(merge_group, batch_format="pandas"))


def label_separation(sf_dir: str) -> pa.Table:
    """(label_a, label_b, dist2): exact integer squared distance between
    every pair of ROUNDED-MEAN label centroids — the cluster-separation
    audit run after nearest-centroid classification or semantic dedup
    (well-separated labels justify per-label processing; near-zero
    distances flag label aliasing).  Means are rounded half-away to
    1/1000 units (one IEEE double division + a half-away round; numpy's
    floor(abs+0.5) and DuckDB's round() agree except on quotients equal
    to the double just below 0.5, which needs n_vecs beyond any physical
    corpus — the practical contract is bit-identical), so dist2 is
    int64 exact.

    Scale shape: consumes :func:`label_centroids` (whose exchange is
    |labels| × dims partial rows regardless of corpus size); the pair
    table is computed on the gathered centroid matrix — bounded by the
    LABEL COUNT, never the corpus — and returned as one Arrow table."""
    rows = label_centroids(sf_dir).take_all()  # |labels| x dims, bounded
    if not rows:  # empty embeddings table: no pairs (matches the oracle)
        z = pa.array([], pa.int64())
        return pa.table({"label_a": z, "label_b": z, "dist2": z})
    labs = sorted({r["label"] for r in rows})
    dmax = max(r["dim"] for r in rows)
    li = {l: i for i, l in enumerate(labs)}
    M = np.zeros((len(labs), dmax), np.int64)
    for r in rows:
        v = r["q_sum"] / r["n_vecs"]
        M[li[r["label"]], r["dim"] - 1] = np.int64(
            np.copysign(np.floor(abs(v) + 0.5), v))
    la, lb, d2 = [], [], []
    for i, a in enumerate(labs):
        for b in labs[i + 1:]:
            diff = M[li[a]] - M[li[b]]
            la.append(a)
            lb.append(b)
            d2.append(int(np.dot(diff, diff)))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb, pa.int64()),
                     "dist2": pa.array(d2, pa.int64())})
