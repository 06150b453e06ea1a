"""Similarity search over the ``embeddings`` table.

* brute-force cosine top-k — the exact baseline: broadcast the query matrix
  (ray.put once), per-batch f64 matmul + argpartition inside map_batches.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket the
  corpus; each query probes its own bucket plus hamming-1 neighbors.  Recall
  measured against the brute-force baseline in tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _load_matrix(sf_dir: str):
    ids, vecs = [], []
    for ref in _emb(sf_dir).to_arrow_refs():
        t = ray.get(ref)
        ids.extend(t["vec_id"].to_pylist())
        vecs.extend(t["embedding"].to_pylist())
    ids = np.array(ids, dtype=np.int64)
    M = np.array(vecs, dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    return ids[order], M[order]


def knn_bruteforce(sf_dir: str, k: int = 5, query_stride: int = 50) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): exact cosine top-k for query vectors
    (every ``query_stride``-th vec_id), self excluded; ties broken by
    neighbor_id asc so the DuckDB oracle ranks identically.

    The CORPUS streams through map_batches; the (much smaller) QUERY matrix
    is broadcast — so this scales with corpus size, not corpus × corpus.
    Per batch we emit (query, neighbor, score) for the batch-local top-k,
    then a final per-query top-k merge on the small candidate set."""
    ids, M = _load_matrix(sf_dir)
    q_mask = ids % query_stride == 0
    q_ids, Q = ids[q_mask], M[q_mask]
    q_ref = ray.put((q_ids, Q))

    def batch_topk(t: pa.Table) -> pa.Table:
        qi_ids, qM = ray.get(q_ref)
        c_ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        C = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        sims = qM @ C.T  # (nq, nbatch)
        # exclude self matches
        self_mask = qi_ids[:, None] == c_ids[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1])
        # kth-largest score per query; keep EVERY candidate at or above it so
        # boundary ties survive to the deterministic (score desc, id asc)
        # lexsort — argpartition alone picks arbitrary survivors among ties
        # and can disagree with the oracle's row_number tiebreak
        thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            sel = np.flatnonzero(sims[qi] >= thresh[qi])
            sel = sel[sims[qi, sel] > -np.inf]
            order = sel[np.lexsort((c_ids[sel], -sims[qi, sel]))][:kk]
            for j in order:
                rows_q.append(qi_ids[qi])
                rows_n.append(c_ids[j])
                rows_s.append(sims[qi, j])
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "neighbor_id": pa.array(rows_n, pa.int64()),
                         "score": pa.array(rows_s, pa.float64())})

    import pandas as pd

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].to_numpy(),
                             "rnk": np.arange(1, len(g) + 1),
                             "neighbor_id": g["neighbor_id"].to_numpy()})

    return (_emb(sf_dir)
            .map_batches(batch_topk, batch_format="pyarrow", batch_size=2048)
            .groupby("query_id")
            .map_groups(merge_group, batch_format="pandas"))


def _kmeans(M: np.ndarray, k: int, seed: int = 42, iters: int = 10):
    """Deterministic Lloyd's k-means on normalized vectors (numpy)."""
    rng = np.random.RandomState(seed)
    C = M[rng.choice(len(M), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)  # cosine on normalized = dot
        for c in range(k):
            sel = M[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C, np.argmax(M @ C.T, axis=1)


def knn_ivf(sf_dir: str, k: int = 5, query_stride: int = 50,
            n_lists: int = 16, n_probe: int = 6, seed: int = 42) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): ANN via an IVF coarse quantizer —
    deterministic k-means lists; each query scans only its ``n_probe``
    nearest lists.  The scale path for embedding search: at corpus scale
    the lists are the PARTITIONING (groupby(list_id) materialized once),
    queries route to co-located list partitions, and only 1/n_lists of
    the corpus is touched per probe.  Recall measured against
    knn_bruteforce in tests."""
    ids, M = _load_matrix(sf_dir)
    C, assign = _kmeans(M, n_lists, seed)
    lists = {c: np.nonzero(assign == c)[0] for c in range(n_lists)}
    bundle = ray.put((ids, M, C, lists))

    q_mask = ids % query_stride == 0
    q_tbl = pa.table({"query_id": pa.array(ids[q_mask], pa.int64())})

    def probe(t: pa.Table) -> pa.Table:
        g_ids, g_M, g_C, g_lists = ray.get(bundle)
        out_q, out_r, out_n = [], [], []
        for qid in t["query_id"].to_pylist():
            qvec = g_M[np.searchsorted(g_ids, qid)]
            top_lists = np.argsort(-(g_C @ qvec))[:n_probe]
            cand_idx = np.concatenate([g_lists[int(c)] for c in top_lists])
            sims = g_M[cand_idx] @ qvec
            c_ids = g_ids[cand_idx]
            mask = c_ids != qid
            sims, c_ids = sims[mask], c_ids[mask]
            order = np.lexsort((c_ids, -sims))[:k]
            for r, j in enumerate(order, 1):
                out_q.append(qid)
                out_r.append(r)
                out_n.append(c_ids[j])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "rnk": pa.array(out_r, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64())})

    return rd.from_arrow(q_tbl).map_batches(probe, batch_format="pyarrow",
                                            batch_size=512)


def knn_lsh(sf_dir: str, k: int = 5, query_stride: int = 50,
            n_planes: int = 6, n_tables: int = 8, seed: int = 42) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): ANN via MULTI-TABLE random-hyperplane
    LSH — L independent tables of b planes each; a query's candidates are
    the union over tables of its bucket + hamming-1 buckets.  Multi-table
    is the standard recall lever (single-table sign-LSH recall collapses
    as buckets outnumber points).  Approximate, deterministic.

    Scale shape: the bucket index is built once and broadcast (ray.put);
    queries stream through map_batches.  At 100 TB the index build itself
    becomes a groupby(code) stage and each query probes only co-partitioned
    buckets — same bucketing math, sharded by code."""
    ids, M = _load_matrix(sf_dir)
    rng = np.random.RandomState(seed)
    tables = []
    all_codes = []
    for _ in range(n_tables):
        planes = rng.randn(n_planes, M.shape[1])
        sig = (M @ planes.T > 0).astype(np.uint8)
        codes = np.packbits(sig, axis=1, bitorder="little")[:, 0].astype(np.int64)
        buckets = {int(c): np.nonzero(codes == c)[0] for c in np.unique(codes)}
        tables.append(buckets)
        all_codes.append(codes)
    codes_mat = np.stack(all_codes, axis=1)  # (n, L)
    bucket_ref = ray.put((ids, M, tables))

    q_mask = ids % query_stride == 0
    q_tbl = pa.table({"query_id": pa.array(ids[q_mask], pa.int64()),
                      "codes": pa.array(codes_mat[q_mask].tolist(),
                                        pa.list_(pa.int64()))})

    def probe(t: pa.Table) -> pa.Table:
        g_ids, g_M, g_tables = ray.get(bucket_ref)
        out_q, out_r, out_n = [], [], []
        empty = np.empty(0, np.int64)
        for qid, qcodes in zip(t["query_id"].to_pylist(),
                               t["codes"].to_pylist()):
            cand = []
            for li, code in enumerate(qcodes):
                cand.append(g_tables[li].get(code, empty))
                for b in range(n_planes):
                    cand.append(g_tables[li].get(code ^ (1 << b), empty))
            cand_idx = np.unique(np.concatenate(cand)).astype(np.int64)
            qvec = g_M[np.searchsorted(g_ids, qid)]
            sims = g_M[cand_idx] @ qvec
            c_ids = g_ids[cand_idx]
            mask = c_ids != qid
            sims, c_ids = sims[mask], c_ids[mask]
            order = np.lexsort((c_ids, -sims))[:k]
            for r, j in enumerate(order, 1):
                out_q.append(qid)
                out_r.append(r)
                out_n.append(c_ids[j])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "rnk": pa.array(out_r, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64())})

    return rd.from_arrow(q_tbl).map_batches(probe, batch_format="pyarrow",
                                            batch_size=512)
