"""Deduplication operators over ``documents`` — exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup (first-class training-data ops).

Scale shapes:
* exact      — content-hash in map_batches → groupby(hash) keep-first
               (hash-partition + per-group first; ONE shuffle on the 16-byte
               hash, never on the text)
* minhash    — shingle→minhash per batch (numpy vectorized) → explode to
               (band_id, band_hash) rows → groupby bands → candidate pairs →
               exact-Jaccard verify inside the group (LSH: only colliding
               docs ever meet; no O(n²))
* simhash    — 64-bit simhash per batch → band by 16-bit chunks (hamming≤3 ⇒
               one of 4 chunks equal) → verify hamming in-group
* embedding  — normalize per batch → LSH-bucket by random-hyperplane sign
               bytes OR brute-force per batch vs broadcast matrix (small-side
               broadcast, no shuffle)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..agg import distinct as dist_distinct
from ..agg import hash_agg, hash_join, partition_ids, topk

from ..joins import join_agg_args
from .textstats import docs

TOKEN_RE = re.compile(r"\S+")

# Per-process memo of MATERIALIZED minhash pair / cluster tables.  Five
# suite queries (minhash_dups, dup_clusters, clean_corpus, dedup_keep_best,
# gate_funnel) all drive the same signature→band-join→verify pipeline —
# as a product pipeline the signature table materializes ONCE and is
# shared (pairs are output-sized; the cluster map is an id-sized table
# living in the spillable object store).  Keys carry the Ray job id (a
# new Ray session invalidates dead object refs) and a cheap content
# signature of documents.parquet (size + mtime_ns) so a regenerated
# corpus at the same path never serves stale results.
_MEMO: dict = {}


def _memo_key(name: str, sf_dir: str, *params):
    import os
    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    try:
        st = os.stat(f"{sf_dir}/documents.parquet")
        sig = (st.st_size, st.st_mtime_ns)
    except OSError:
        sig = None
    return (job, name, sf_dir, sig) + params

# byte-popcount lookup table for vectorized bitset intersection
_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


# -------------------------------------------------------------------- exact

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """(text_hash, doc_id): keep the min doc_id per exact text hash."""

    def hash_batch(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table({"text_hash": pa.array(fps, pa.string()),
                         "doc_id": t["doc_id"]})

    return hash_agg(docs(sf_dir).map_batches(hash_batch,
                                             batch_format="pyarrow"),
                    "text_hash", [("doc_id", "min", "doc_id")])


# -------------------------------------------------------------- chunk dedup

def chunk_dedup(sf_dir: str, chunk_tokens: int = 10) -> rd.Dataset:
    """(chunk_hash, doc_id, n_copies): corpus-wide exact dedup at sub-doc
    granularity — the C4/RefinedWeb line-dedup step.  Documents are split
    into fixed ``chunk_tokens``-token chunks (the synthetic corpus is
    single-line, so fixed token windows stand in for lines; a real corpus
    would split on newlines), each chunk md5-hashed, and per hash the
    winner (min doc_id) plus the corpus-wide copy count are kept.

    Scale shape: the chunk TEXT never leaves the batch kernel — only
    (16-byte-hash, doc_id, partial count) rows shuffle, pre-combined per
    batch (combiner-before-shuffle), then one groupby on the hash."""

    def hash_chunks(t: pa.Table) -> pa.Table:
        agg: dict[str, list] = {}
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = TOKEN_RE.findall(s)
            for j in range(0, len(toks), chunk_tokens):
                h = hashlib.md5(
                    " ".join(toks[j:j + chunk_tokens]).encode()).hexdigest()
                cur = agg.get(h)
                if cur is None:
                    agg[h] = [did, 1]
                else:
                    cur[0] = min(cur[0], did)
                    cur[1] += 1
        return pa.table({
            "chunk_hash": pa.array(list(agg.keys()), pa.string()),
            "p_doc": pa.array([v[0] for v in agg.values()], pa.int64()),
            "p_n": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    return hash_agg(docs(sf_dir).map_batches(hash_chunks,
                                             batch_format="pyarrow"),
                    "chunk_hash", [("p_doc", "min", "doc_id"),
                                   ("p_n", "sum", "n_copies")])


# ------------------------------------------------------------------- minhash

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows


def _minhash_params(seed: int = 42):
    """Permutation params for (a*h + b) mod 2**64 multiply-add hashing.

    The modulus is the natural uint64 wraparound (numpy uint64 arithmetic
    engine-side; ``% 2**64`` HUGEINT arithmetic oracle-side) — exactly
    SQL-reproducible, unlike a prime-modulus hash whose int64 overflow
    semantics DuckDB can't mirror."""
    rng = np.random.RandomState(seed)
    M = (1 << 61) - 1
    a = rng.randint(1, M, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, M, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b, M


def md5_upper64(data: bytes) -> int:
    """First 8 bytes of md5, little-endian — DuckDB ``md5_number_upper``.
    The shared token/shingle hash that keeps the sketch queries
    (simhash/minhash) SQL-checkable."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes: md5-upper64 >> 3 (fits int64; DuckDB
    twin: ``md5_number_upper(gram) >> 3``)."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array(
        [md5_upper64(g.encode()) >> 3 for g in grams], dtype=np.int64))


def minhash_signatures(sf_dir: str, seed: int = 42) -> rd.Dataset:
    """(doc_id, band_id, band_hash): LSH band rows, exploded.  Memoized
    per (corpus, seed): minhash_dups AND containment_dups candidates
    both read this one materialized table."""
    key = _memo_key("minhash_signatures", sf_dir, seed)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = _minhash_signatures_impl(sf_dir, seed).materialize()
    return hit


def _minhash_signatures_impl(sf_dir: str, seed: int = 42) -> rd.Dataset:
    a, b, M = _minhash_params(seed)

    def kernel(t: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(s)
            if len(sh) == 0:
                continue
            # vectorized (a*x+b) mod 2**64 over perms x shingles (uint64
            # wraparound — SQL twin: HUGEINT arithmetic % 2**64)
            shu = sh.astype(np.uint64)
            vals = a[:, None] * shu[None, :] + b[:, None]
            sig = vals.min(axis=1)
            rows = sig.reshape(_BANDS, _N_PERM // _BANDS)
            for bi in range(_BANDS):
                h = hashlib.blake2b(rows[bi].tobytes(), digest_size=8).digest()
                doc_ids.append(did)
                band_ids.append(bi)
                band_hashes.append(int.from_bytes(h, "little"))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "band_id": pa.array(band_ids, pa.int32()),
                         "band_hash": pa.array(band_hashes, pa.uint64())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


def jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = set(_shingles(t1).tolist()), set(_shingles(t2).tolist())
    if not s1 and not s2:
        return 1.0
    u = len(s1 | s2)
    return len(s1 & s2) / u if u else 0.0


def _band_candidates(sf_dir: str, seed: int) -> rd.Dataset:
    """Distinct LSH candidate pairs (doc_a < doc_b) from the memoized band
    table: band rows native-hash-self-join on (band_id, band_hash) — a
    per-band-group map_groups measured 28 s of pure per-group Python
    overhead on ~50k tiny groups; the join is the vectorized router.  The
    distinct is hash-partitioned on (doc_a, doc_b) (``agg.distinct``:
    per-block pre-distinct combiner — a pair colliding in b bands emits b
    copies — then the partitioned group_by), so a boilerplate-heavy
    corpus whose bands collapse cannot exceed one worker's heap: no
    single-block stage remains in the dedup path.  Memoized per
    (corpus, seed): minhash_dups and containment_dups consume the same
    candidate table."""
    key = _memo_key("band_candidates", sf_dir, seed)
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    import pyarrow.compute as pc


    sig = minhash_signatures(sf_dir, seed)

    def _side(cols):
        def k(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return k

    cand = (hash_join(
        sig.map_batches(_side(["doc_a", "band_id", "band_hash"]),
                        batch_format="pyarrow"),
        sig.map_batches(_side(["doc_b", "band_id", "band_hash"]),
                        batch_format="pyarrow"),
        on=["band_id", "band_hash"],
        left_cols={"doc_a": pa.int64()}, right_cols={"doc_b": pa.int64()})
        .map_batches(lambda t: t.filter(
            pc.less(t["doc_a"], t["doc_b"])).select(["doc_a", "doc_b"]),
            batch_format="pyarrow"))

    out = dist_distinct(cand, ["doc_a", "doc_b"]).materialize()
    _MEMO[key] = out
    return out


def _candidate_blob_pairs(cand_ds: rd.Dataset, sf_dir: str,
                          seed: int = 42) -> rd.Dataset:
    """(doc_a, doc_b, sh_a, sh_b): each candidate pair with both sides'
    sorted-unique shingle blobs attached — the shared verify input of
    minhash_dups and containment_dups.  Semi-join-reduced: only docs
    PARTICIPATING in candidates get shingled (filtered doc scan).  When
    the participant set fits a broadcast budget the blobs broadcast and
    attach in one vectorized map; past the gate, candidates
    native-hash-join (doc_id-co-partitioned) against the streaming
    shingle-blob table once per side.  Broadcast state is bounded by the
    candidate set (output-sized), never the corpus.  Memoized per
    (corpus, seed) alongside the candidate table — the corpus shingle
    pass runs once even when minhash_dups AND containment_dups execute
    in the same suite run."""
    key = _memo_key("candidate_blob_pairs", sf_dir, seed)
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    part_ids: set[int] = set()
    for t in cand_ds.iter_batches(batch_format="pyarrow"):
        part_ids.update(t["doc_a"].to_pylist())
        part_ids.update(t["doc_b"].to_pylist())
    part_ref = ray.put(part_ids)

    def shingle_rows(t: pa.Table) -> pa.Table:
        # semi-join reduction: shingle ONLY candidate participants
        pids = ray.get(part_ref)
        ids, blobs = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did not in pids:
                continue
            ids.append(did)
            blobs.append(_shingles(s).tobytes())  # sorted unique int64
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sh": pa.array(blobs, pa.binary())})

    sets_ds = docs(sf_dir).map_batches(shingle_rows, batch_format="pyarrow")

    if len(part_ids) <= 500_000:
        # candidate-bounded broadcast of participant blobs; one attach map
        blobs: dict[int, bytes] = {}
        for t in sets_ds.iter_batches(batch_format="pyarrow"):
            blobs.update(zip(t["doc_id"].to_pylist(), t["sh"].to_pylist()))
        blob_ref = ray.put(blobs)

        def attach(t: pa.Table) -> pa.Table:
            bl = ray.get(blob_ref)
            return pa.table({
                "doc_a": t["doc_a"], "doc_b": t["doc_b"],
                "sh_a": pa.array([bl[a] for a in t["doc_a"].to_pylist()],
                                 pa.binary()),
                "sh_b": pa.array([bl[b] for b in t["doc_b"].to_pylist()],
                                 pa.binary())})

        out = cand_ds.map_batches(attach,
                                  batch_format="pyarrow").materialize()
        _MEMO[key] = out
        return out

    # at-scale fallback: doc_id-co-partitioned joins

    sets_m = sets_ds.materialize()

    def rename(cols):
        def k(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return k

    j1 = hash_join(cand_ds,
                   sets_m.map_batches(rename(["doc_a", "sh_a"]),
                                      batch_format="pyarrow"),
                   on="doc_a", left_cols={"doc_b": pa.int64()},
                   right_cols={"sh_a": pa.binary()})
    out = hash_join(j1,
                    sets_m.map_batches(rename(["doc_b", "sh_b"]),
                                       batch_format="pyarrow"),
                    on="doc_b",
                    left_cols={"doc_a": pa.int64(), "sh_a": pa.binary()},
                    right_cols={"sh_b": pa.binary()}).materialize()
    _MEMO[key] = out
    return out


def minhash_dups(sf_dir: str, threshold: float = 0.8,
                 seed: int = 42) -> rd.Dataset:
    """Memoized wrapper over :func:`_minhash_dups_impl` — the verified
    pair table materializes once per (corpus, threshold, seed) per
    process and is shared by every downstream consumer (dup_clusters /
    clean_corpus / dedup_keep_best / gate_funnel)."""
    key = _memo_key("minhash_dups", sf_dir, threshold, seed)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = _minhash_dups_impl(
            sf_dir, threshold, seed).materialize()
    return hit


def minhash_est(sf_dir: str, seed: int = 42) -> rd.Dataset:
    """(doc_a, doc_b, est_bp): the MinHash-ESTIMATED Jaccard for every
    LSH candidate pair, in integer basis points — 10000 · |equal
    signature components| // 64 — the sketch-accuracy audit a dedup
    pipeline reports next to the exact verify (how far the estimator is
    from the exact Jaccard decides whether the sketch could replace the
    blob verify at the next scale jump).

    Scale shape: rides the SAME memoized candidate + blob tables as
    minhash_dups/containment_dups (no new corpus pass, no new shuffle);
    per pair the 64 permutation minima recompute vectorized from the
    sorted-unique shingle blobs — the identical uint64 (a·x+b) wraparound
    arithmetic the signature kernel uses, so the DuckDB twin matches
    bit-for-bit."""
    a_p, b_p, _ = _minhash_params(seed)
    cand_ds = _band_candidates(sf_dir, seed)
    pairs = _candidate_blob_pairs(cand_ds, sf_dir, seed)

    def kernel(t: pa.Table) -> pa.Table:
        out_a, out_b, out_e = [], [], []
        for da, db, sa, sb in zip(t["doc_a"].to_pylist(),
                                  t["doc_b"].to_pylist(),
                                  t["sh_a"].to_pylist(),
                                  t["sh_b"].to_pylist()):
            if not sa or not sb:   # shingle-less docs never band-collide
                continue
            xa = np.frombuffer(sa, np.int64).astype(np.uint64)
            xb = np.frombuffer(sb, np.int64).astype(np.uint64)
            sig_a = (a_p[:, None] * xa[None, :]
                     + b_p[:, None]).min(axis=1)
            sig_b = (a_p[:, None] * xb[None, :]
                     + b_p[:, None]).min(axis=1)
            eq = int((sig_a == sig_b).sum())
            out_a.append(da)
            out_b.append(db)
            out_e.append(eq * 10_000 // _N_PERM)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "est_bp": pa.array(out_e, pa.int64())})

    return pairs.map_batches(kernel, batch_format="pyarrow")


def _minhash_dups_impl(sf_dir: str, threshold: float = 0.8,
                       seed: int = 42) -> rd.Dataset:
    """(doc_a, doc_b) near-dup pairs: LSH band candidates verified by exact
    shingle-Jaccard ≥ threshold.

    Scale shape (no whole-corpus broadcast anywhere): candidates from
    :func:`_band_candidates` (band self-join, output-sized distinct),
    blob delivery from :func:`_candidate_blob_pairs` (candidate-bounded
    broadcast / co-partitioned-join gate), then one vectorized verify
    map over (pair, blob, blob) rows."""

    cand_ds = _band_candidates(sf_dir, seed)
    pairs = _candidate_blob_pairs(cand_ds, sf_dir, seed)

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for a, b, ra, rb in zip(t["doc_a"].to_pylist(),
                                t["doc_b"].to_pylist(),
                                t["sh_a"].to_pylist(),
                                t["sh_b"].to_pylist()):
            va = np.frombuffer(ra, dtype=np.int64)
            vb = np.frombuffer(rb, dtype=np.int64)
            if not len(va) and not len(vb):
                jac = 1.0
            else:
                inter = np.intersect1d(va, vb, assume_unique=True).size
                union = va.size + vb.size - inter
                jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def dup_clusters(sf_dir: str, threshold: float = 0.8,
                 seed: int = 42, small_graph_limit: int = 2_000_000
                 ) -> rd.Dataset:
    """Memoized wrapper over :func:`_dup_clusters_impl` — the id-sized
    (doc_id, cluster_id) map materializes once per (corpus, params) per
    process; clean_corpus / dedup_keep_best / gate_funnel all reuse it."""
    key = _memo_key("dup_clusters", sf_dir, threshold, seed,
                    small_graph_limit)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = _dup_clusters_impl(
            sf_dir, threshold, seed, small_graph_limit).materialize()
    return hit


def _dup_clusters_impl(sf_dir: str, threshold: float = 0.8,
                       seed: int = 42, small_graph_limit: int = 2_000_000
                       ) -> rd.Dataset:
    """(doc_id, cluster_id): connected components over the minhash near-dup
    pair graph; cluster_id = min doc_id in the component (singletons map to
    themselves).  This is the keep-one-per-cluster assignment a fuzzy-dedup
    pipeline applies to a training corpus.

    Scale shape — the hash-to-min CC algorithm (Rastogi et al., "Finding
    Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013),
    expressed as pure groupby/map_groups rounds (join-free):
      * state: (node, member) rows — node's current cluster-candidate set,
        initialized to itself + its pair-graph neighbors;
      * round: each node's group emits its min to every member AND all
        members to the min (map_groups), then a (node, member) distinct
        groupby bounds the row count;
      * O(log n) rounds, run to the paper's deterministic bound; at the
        fixpoint every node's min member is its component min.
    All state is output-sized (pair graph + component membership), shuffled
    on the node key — never the corpus text.

    Size gate (the hybrid Rastogi et al. §6 recommend): the pair graph is
    OUTPUT-sized — near-dup edges, not corpus rows — so when it fits the
    small-side bound (same gate class as the broadcast joins) a driver
    union-find finishes in one pass and the cluster map broadcasts to a
    single map_batches; only past the bound do the log-round shuffles run.
    DuckDB twin: recursive CTE reachability + min per node."""
    import math

    from ray.data.aggregate import Min

    pairs = minhash_dups(sf_dir, threshold, seed)  # memo-materialized
    ids = docs(sf_dir, columns=("doc_id",))
    n_docs = ids.count()

    def self_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"], "member": t["doc_id"]})

    identity = ids.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "cluster_id": t["doc_id"]}),
        batch_format="pyarrow")
    n_pairs = pairs.count()
    if n_pairs == 0:
        return identity

    # ---- small-graph fast path: union-find on the driver (edge list only,
    # never text), cluster map broadcast once.  2M edges ≈ 32 MB — the same
    # order as the broadcast-join small-side bound used elsewhere.
    if n_pairs <= small_graph_limit:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for t in pairs.iter_batches(batch_format="pyarrow"):
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:  # min-root union → cluster_id = component min
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        cmap = {x: find(x) for x in parent}
        cmap_ref = ray.put(cmap)

        def assign(t: pa.Table) -> pa.Table:
            m = ray.get(cmap_ref)
            d = t["doc_id"].to_pylist()
            return pa.table({
                "doc_id": pa.array(d, pa.int64()),
                "cluster_id": pa.array([m.get(i, i) for i in d], pa.int64())})

        return ids.map_batches(assign, batch_format="pyarrow")

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks()
        b = t["doc_b"].combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "member": pa.concat_arrays([b, a])})

    # ONLY pair-graph nodes iterate (output-sized); the corpus's singleton
    # majority maps to itself without ever entering a shuffle round (5k
    # one-row map_groups groups per round measured 6x the whole algorithm)
    graph_nodes: set[int] = set()
    for t in pairs.iter_batches(batch_format="pyarrow"):
        graph_nodes.update(t["doc_a"].to_pylist())
        graph_nodes.update(t["doc_b"].to_pylist())
    gn_ref = ray.put(graph_nodes)

    def graph_self_rows(t: pa.Table) -> pa.Table:
        gn = ray.get(gn_ref)
        keep = [i for i in t["doc_id"].to_pylist() if i in gn]
        return pa.table({"node": pa.array(keep, pa.int64()),
                         "member": pa.array(keep, pa.int64())})

    def singleton_rows(t: pa.Table) -> pa.Table:
        gn = ray.get(gn_ref)
        keep = [i for i in t["doc_id"].to_pylist() if i not in gn]
        return pa.table({"doc_id": pa.array(keep, pa.int64()),
                         "cluster_id": pa.array(keep, pa.int64())})

    state = (ids.map_batches(graph_self_rows, batch_format="pyarrow")
             .union(pairs.map_batches(edge_rows, batch_format="pyarrow")))

    # One node-partitioned exchange per round: the per-node hash-to-min
    # AND the (node, member) distinct both key on `node`, so a single
    # vectorized sorted-run kernel replaces the old two-shuffle round
    # (groupby(node).map_groups spent ~1 Python call per NODE per round;
    # this spends one numpy pass per PARTITION per round).
    def addpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__part", pa.array([], pa.int32()))
        return b.append_column(
            "__part", pa.array(partition_ids(b, ["node"], 32)))

    def round_kernel(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        memb = g["member"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (node, member), sorted by (node, member) — all rows of
        # a node live in this partition, so the distinct is global
        order = np.lexsort((memb, node))
        node, memb = node[order], memb[order]
        keep = np.ones(len(node), dtype=bool)
        keep[1:] = (node[1:] != node[:-1]) | (memb[1:] != memb[:-1])
        node, memb = node[keep], memb[keep]
        starts = np.r_[0, np.flatnonzero(node[1:] != node[:-1]) + 1]
        sizes = np.diff(np.r_[starts, len(node)])
        # per-run min: members are sorted within the run; include the node
        m_run = np.minimum(memb[starts], node[starts])
        m_rep = np.repeat(m_run, sizes)
        # min -> every member; every member -> min; node -> min
        out_node = np.concatenate([memb, m_rep, m_run])
        out_memb = np.concatenate([m_rep, memb, node[starts]])
        t = pa.table({"node": pa.array(out_node, pa.int64()),
                      "member": pa.array(out_memb, pa.int64())})
        return t.group_by(["node", "member"]).aggregate([])  # local distinct

    from ray.data.aggregate import Count, Sum

    rounds = max(3, 2 * math.ceil(math.log2(max(n_docs, 2))) + 2)
    prev_fp = None
    for _ in range(rounds):
        state = (state.map_batches(addpart, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(round_kernel, batch_format="pyarrow")
                 .materialize())
        # early exit at the deterministic fixpoint (near-dup clusters are
        # tiny, so this usually fires after ~3-4 rounds); the oracle-
        # checked correctness does not depend on it, the round cap does.
        # (state may carry cross-partition duplicate rows — the kernel
        # dedups only within its node partition — but the multiset is
        # deterministic, so the fingerprint still stabilizes exactly.)
        agg = state.aggregate(Count(), Sum("member"), Sum("node"))
        fp = (agg["count()"], agg["sum(member)"], agg["sum(node)"])
        if fp == prev_fp:
            break
        prev_fp = fp
    clustered = (hash_agg(state, "node",
                          [("member", "min", "cluster_id")])
                 .map_batches(lambda t: t.rename_columns(
                     ["doc_id", "cluster_id"]), batch_format="pyarrow"))
    return clustered.union(
        ids.map_batches(singleton_rows, batch_format="pyarrow"))


# ------------------------------------------------------------ n-gram jaccard

def ngram_jaccard_dups(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """Memoized wrapper over :func:`_ngram_jaccard_impl` — the exact pair
    table materializes once per (corpus, threshold) per process and is
    shared by minhash_recall."""
    key = _memo_key("jaccard_dups", sf_dir, threshold)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = _ngram_jaccard_impl(
            sf_dir, threshold).materialize()
    return hit


def _ngram_jaccard_impl(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """(doc_a, doc_b): EXACT token-set Jaccard >= threshold pairs — no LSH
    approximation, SQL-checkable against a DuckDB self-join oracle.

    Fully distributed (PPJoin-style prefix filtering — Xiao et al., WWW'08):
      1. (doc_id, token) distinct rows (map_batches) — materialized once,
         reused by the df pass and the verify pass;
      2. global df per token via combiner-before-shuffle groupby; the
         broadcast rank state is BOUNDED: full dense ranks only under a
         65536-vocab gate, else exact ranks for the top-262144 RAREST
         tokens (distributed sort+limit) with every other token ordered
         after them by hash — a consistent global total order, which is
         all PPJoin's prefix theorem requires;
      3. each doc emits its PREFIX tokens (first |A|-ceil(t*|A|)+1 under
         that order) + its set size — theorem: any pair with J>=t shares a
         prefix token, so low-df prefixes generate candidates without the
         stopword pair explosion; groupby(prefix token) emits length-filtered
         candidate pairs with vectorized triu indices;
      4. verify, two size-gated paths:
         * FAST: vocab small enough that per-doc BITSET masks (V/8 bytes)
           fit a 64 MiB broadcast → candidate gen + popcount(AND) verify
           fused inside the prefix groups, all numpy;
         * AT SCALE: distinct candidates NATIVE-HASH-JOIN
           (doc_id-co-partitioned) against the streaming (doc_id, set-blob)
           table once per side, then batch-vectorized popcount / sorted-
           array intersection.  No whole-corpus text broadcast, no
           driver-side token sets, no millions-of-groups aggregate (Ray
           groupby degrades badly there).
    Driver/broadcast state is bounded by the rare-token rank dict (≤262144
    entries) plus the size-gated bitset table — never by the full vocab or
    corpus text."""
    import math

    def tok_batch(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in set(TOKEN_RE.findall(s.lower())):
                ids.append(did)
                toks.append(w)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    toks = docs(sf_dir).map_batches(tok_batch,
                                    batch_format="pyarrow").materialize()

    # ---- pass 1: distributed df → vocab-sized rare-first rank broadcast
    def df_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "p_n"])

    # materialized: both the gating count and the rank pass (dense
    # collect OR rare sort+limit) consume it — unmaterialized it would
    # re-execute the whole token-df shuffle twice
    df_ds = hash_agg(toks.map_batches(df_partial,
                                      batch_format="pyarrow"),
                     "token", [("p_n", "sum", "n")]).materialize()
    # The broadcast rank state is BOUNDED, never the whole web-scale
    # vocab: a distributed count gates between
    #  * DENSE (vocab <= 65536): collect the full (token, df) table —
    #    bounded by the gate itself — for dense ranks + the bitset verify;
    #  * AT SCALE: only the RARE_V rarest tokens get exact ranks, via a
    #    distributed sort(n, token).limit(RARE_V) (the oov_rate top-V
    #    pattern, textstats.py); every other token orders AFTER the rare
    #    set under the globally-consistent key (RARE_V, md5_upper64(w), w).
    #    PPJoin's prefix theorem needs only a CONSISTENT total order —
    #    rare-first is the candidate-pruning heuristic, and prefix tokens
    #    are by construction the rarest, so candidate quality is kept.
    n_vocab = df_ds.count()
    RARE_V = 262_144
    if n_vocab <= 65536:
        vocab, counts = [], []
        for t in df_ds.iter_batches(batch_format="pyarrow"):
            vocab.extend(t["token"].to_pylist())
            counts.extend(t["n"].to_pylist())
        order = sorted(range(len(vocab)),
                       key=lambda i: (counts[i], vocab[i]))
        rank = {vocab[i]: r for r, i in enumerate(order)}
        # bitset verify: a doc's token set packs into <=8 KiB of uint64
        # words — popcount(AND) then vectorizes across whole pair batches
        n_words = (len(rank) + 63) // 64
    else:
        rare = topk(df_ds, [("n", "ascending"), ("token", "ascending")],
                    RARE_V)
        vocab = []
        for t in rare.iter_batches(batch_format="pyarrow"):
            vocab.extend(t["token"].to_pylist())
        rank = {w: r for r, w in enumerate(vocab)}
        n_words = 0
    rank_ref = ray.put(rank)

    def _order_key(rk: dict):
        """Globally-consistent total order: exact rare ranks first, then
        hash order (token string as the collision tiebreak)."""
        def key(w: str):
            r = rk.get(w)
            if r is not None:
                return (r, 0, "")
            return (RARE_V, md5_upper64(w.encode()), w)
        return key

    # ---- pass 2: prefix rows from a fresh column-pruned doc scan
    def prefix_rows(t: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        okey = _order_key(rk)
        ids, toks_out, sizes = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = set(TOKEN_RE.findall(s.lower()))
            n = len(ws)
            if n == 0:
                continue
            p = n - math.ceil(threshold * n) + 1
            for w in sorted(ws, key=okey)[:p]:
                ids.append(did)
                toks_out.append(w)
                sizes.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks_out, pa.string()),
                         "dsize": pa.array(sizes, pa.int64())})

    def set_rows(t: pa.Table) -> pa.Table:
        # token set as a BINARY blob (Acero hash joins reject list<>
        # non-key fields but pass binary through): bitset words on the
        # dense-vocab path, else the sorted 63-bit token-hash array (the
        # minhash shingle-hash convention; a cross-token collision is
        # ~|A||B|/2^63 per pair — negligible, and the SQL-checked fixture
        # path is the collision-free dense one)
        rk = ray.get(rank_ref)
        ids, arrs = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = set(TOKEN_RE.findall(s.lower()))
            if not ws:
                continue
            ids.append(did)
            if n_words:
                rr = np.fromiter((rk[w] for w in ws), np.int64, len(ws))
                mask = np.zeros(n_words, np.uint64)
                np.bitwise_or.at(mask, rr >> 6,
                                 np.uint64(1) << (rr & 63).astype(np.uint64))
                arrs.append(mask.tobytes())
            else:
                rr = np.fromiter((md5_upper64(w.encode()) >> 1
                                  for w in ws), np.int64, len(ws))
                rr.sort()
                arrs.append(rr.tobytes())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "ranks": pa.array(arrs, pa.binary())})

    sets_ds = docs(sf_dir).map_batches(set_rows,
                                       batch_format="pyarrow").materialize()
    prefix_ds = (docs(sf_dir).map_batches(prefix_rows, batch_format="pyarrow")
                 .repartition(16))
    _empty_pairs = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})

    # ---- FAST PATH: when the bitset side table fits a broadcast budget
    # (masks are V/8 bytes per doc — 8 B/doc on small vocabs), fuse candidate
    # generation + verification inside the prefix-token groups: triu pair
    # emission, popcount(AND) verify, all numpy.  The broadcast object is
    # packed BITSETS, not text, and is size-gated; past the gate the
    # co-partitioned join path below runs instead.
    n_docs = sets_ds.count()
    if n_words and n_docs * n_words * 8 <= (64 << 20):
        ids_l, blob_l = [], []
        for t in sets_ds.iter_batches(batch_format="pyarrow"):
            ids_l.append(t["doc_id"].to_numpy(zero_copy_only=False))
            blob_l.append(b"".join(t["ranks"].to_pylist()))
        g_ids = (np.concatenate(ids_l).astype(np.int64)
                 if ids_l else np.empty(0, np.int64))
        g_masks = np.frombuffer(b"".join(blob_l), np.uint64) \
            .reshape(len(g_ids), n_words)
        o2 = np.argsort(g_ids)
        g_ids, g_masks = g_ids[o2], np.ascontiguousarray(g_masks[o2])
        g_ns = _POPCNT[g_masks.view(np.uint8)].reshape(len(g_ids), -1) \
            .sum(axis=1, dtype=np.int64)
        masks_ref = ray.put((g_ids, g_masks, g_ns))

        # cost-based plan: on tiny vocabs the prefix groups overlap so much
        # that their total pair work EXCEEDS brute-force all-pairs (measured
        # 44.5M group-pair slots vs C(5000,2)=12.5M on the dup-heavy
        # fixture); pick the cheaper side from the prefix histogram
        def hist_partial(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate([("token", "count")])
            return g.rename_columns(["token", "p_n"])

        gh = hash_agg(prefix_ds.map_batches(hist_partial,
                                            batch_format="pyarrow"),
                      "token", [("p_n", "sum", "n")])
        gsizes = np.array([r["n"] for r in gh.iter_rows()], dtype=np.int64)
        work_prefix = int((gsizes * (gsizes - 1) // 2).sum())
        work_all = n_docs * (n_docs - 1) // 2

        if work_all <= work_prefix:
            # striped all-pairs sweep: stripe s owns rows s, s+S, s+2S, ...
            # (balanced since row r pairs with N-r-1 later rows); each task
            # verifies its rows against all later rows, vectorized per row.
            # Every pair surfaces exactly once (i<j) — no distinct needed.
            S = 64
            stripes = rd.from_arrow(
                pa.table({"stripe": pa.array(range(S), pa.int64())}))

            def sweep(t: pa.Table) -> pa.Table:
                gi, gm, gn = ray.get(masks_ref)
                N = len(gi)
                out_a, out_b = [], []
                for s in t["stripe"].to_pylist():
                    for r in range(s, N - 1, S):
                        nb = gn[r + 1:]
                        lo = np.minimum(gn[r], nb)
                        hi = np.maximum(gn[r], nb)
                        cand = np.flatnonzero(lo >= threshold * hi) + r + 1
                        if not len(cand):
                            continue
                        inter = _POPCNT[(gm[r] & gm[cand]).view(np.uint8)] \
                            .reshape(len(cand), -1).sum(axis=1, dtype=np.int64)
                        union = gn[r] + gn[cand] - inter
                        ok = (union > 0) & (inter / union >= threshold)
                        sel = cand[ok]
                        if len(sel):
                            out_a.append(np.full(len(sel), gi[r], np.int64))
                            out_b.append(gi[sel])
                if not out_a:
                    return pa.table({"doc_a": pa.array([], pa.int64()),
                                     "doc_b": pa.array([], pa.int64())})
                return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                                 "doc_b": pa.array(np.concatenate(out_b))})

            return stripes.map_batches(sweep, batch_format="pyarrow",
                                       batch_size=1)

        def fused_group(g: pd.DataFrame) -> pd.DataFrame:
            """Pairs processed in bounded BLOCKS (B x B tiles of the upper
            triangle) so every temp stays small and reuses warm heap pages —
            one giant triu allocation per group repays the VM's first-touch
            fault cost and measured 25 s for a 4k-doc group."""
            u = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = u["doc_id"].to_numpy(dtype=np.int64)
            ns = u["dsize"].to_numpy(dtype=np.int64)
            N = len(ids)
            if N < 2:
                return _empty_pairs
            gi, gm = ray.get(masks_ref)
            idx = np.searchsorted(gi, ids)
            out_a, out_b = [], []
            B = 512
            base = np.arange(N, dtype=np.int64)
            for s0 in range(0, N, B):
                e0 = min(s0 + B, N)
                for s1 in range(s0, N, B):
                    e1 = min(s1 + B, N)
                    ii = np.repeat(base[s0:e0], e1 - s1)
                    jj = np.tile(base[s1:e1], e0 - s0)
                    m = ii < jj
                    ii, jj = ii[m], jj[m]
                    if not len(ii):
                        continue
                    lo = np.minimum(ns[ii], ns[jj])
                    hi = np.maximum(ns[ii], ns[jj])
                    k = lo >= threshold * hi  # length filter
                    ii, jj = ii[k], jj[k]
                    if not len(ii):
                        continue
                    A, Bm = gm[idx[ii]], gm[idx[jj]]
                    inter = _POPCNT[(A & Bm).view(np.uint8)] \
                        .reshape(len(ii), -1).sum(axis=1, dtype=np.int64)
                    union = ns[ii] + ns[jj] - inter
                    # same float expression as the oracle: i/u >= t
                    ok = (union > 0) & (inter / union >= threshold)
                    out_a.append(ids[ii[ok]])
                    out_b.append(ids[jj[ok]])
            if not out_a:
                return _empty_pairs
            return pd.DataFrame({"doc_a": np.concatenate(out_a),
                                 "doc_b": np.concatenate(out_b)})

        true_pairs = prefix_ds.groupby("token").map_groups(
            fused_group, batch_format="pandas")
        # a pair can qualify via several shared prefix tokens → distinct
        # (hash-partitioned on the pair key, no single-block ceiling)
        return dist_distinct(true_pairs, ["doc_a", "doc_b"])

    # ---- AT-SCALE PATH: length-filtered candidate pairs per prefix-token
    # group, distinct, then doc_id-co-partitioned hash joins against the
    # streaming sets table and a per-batch vectorized verify
    def cand_group(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = u["doc_id"].to_numpy(dtype=np.int64)
        ns = u["dsize"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return _empty_pairs
        i, j = np.triu_indices(len(ids), k=1)
        lo = np.minimum(ns[i], ns[j])
        hi = np.maximum(ns[i], ns[j])
        keep = lo >= threshold * hi
        return pd.DataFrame({"doc_a": ids[i[keep]], "doc_b": ids[j[keep]]})

    cand_ds = dist_distinct(
        prefix_ds.groupby("token").map_groups(cand_group,
                                              batch_format="pandas"),
        ["doc_a", "doc_b"]).materialize()

    def rename(cols):
        def k(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return k

    sets_a = sets_ds.map_batches(rename(["doc_a", "ranks_a"]),
                                 batch_format="pyarrow")
    sets_b = sets_ds.map_batches(rename(["doc_b", "ranks_b"]),
                                 batch_format="pyarrow")
    joined = (cand_ds
              .join(sets_a, "inner", num_partitions=16, on=("doc_a",),
                    aggregator_ray_remote_args=join_agg_args())
              .join(sets_b, "inner", num_partitions=16, on=("doc_b",),
                    aggregator_ray_remote_args=join_agg_args()))

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        if n_words:
            # vectorized across the whole batch: popcount(A AND B)
            P = len(t)
            A = np.frombuffer(b"".join(t["ranks_a"].to_pylist()),
                              np.uint64).reshape(P, n_words)
            B = np.frombuffer(b"".join(t["ranks_b"].to_pylist()),
                              np.uint64).reshape(P, n_words)
            inter = _POPCNT[(A & B).view(np.uint8)].reshape(P, -1) \
                .sum(axis=1, dtype=np.int64)
            na = _POPCNT[A.view(np.uint8)].reshape(P, -1) \
                .sum(axis=1, dtype=np.int64)
            nb = _POPCNT[B.view(np.uint8)].reshape(P, -1) \
                .sum(axis=1, dtype=np.int64)
            union = na + nb - inter
            # same float expression as the oracle: i/u >= t
            keep = (union > 0) & (inter / union >= threshold)
            return pa.table({
                "doc_a": pa.array(t["doc_a"].to_numpy(
                    zero_copy_only=False)[keep], pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy(
                    zero_copy_only=False)[keep], pa.int64())})
        out_a, out_b = [], []
        for a, b, ra, rb in zip(t["doc_a"].to_pylist(),
                                t["doc_b"].to_pylist(),
                                t["ranks_a"].to_pylist(),
                                t["ranks_b"].to_pylist()):
            va = np.frombuffer(ra, dtype=np.int64)
            vb = np.frombuffer(rb, dtype=np.int64)
            inter = np.intersect1d(va, vb, assume_unique=True).size
            union = va.size + vb.size - inter
            if union and inter / union >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64())})

    return joined.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit simhash over distinct whitespace tokens, token hash =
    md5-upper64 — bit k of the output is set iff the +/-1 vote sum of bit k
    of the token hashes is positive.  SQL twin (docs_simhash_dups oracle):
    per-bit CASE sums over ``md5_number_upper(w)`` + ``bit_or(1<<b)``."""
    v = np.zeros(64, dtype=np.int64)
    for tok in set(TOKEN_RE.findall(text.lower())):
        h = md5_upper64(tok.encode())
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"),
                                           dtype=np.uint8))
        v += bits.astype(np.int64) * 2 - 1
    out = np.packbits((v > 0).astype(np.uint8)).tobytes()
    return int.from_bytes(out, "little")


def minhash_recall(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """One row (n_exact, n_sketch, n_both): the sketch-vs-exact pair-set
    comparison — how many of the EXACT PPJoin Jaccard ≥ threshold pairs
    the MinHash-LSH pipeline recovers (n_both/n_exact = recall,
    n_both/n_sketch = precision) — the eval table that qualifies the
    sketch tier to replace the exact verify at the next scale jump.

    Scale shape: both pair sets are output-sized and memoized; tagged
    union + one pair-keyed hash_agg + a per-batch counting partial into
    a single tiny reduce — no text, no new corpus pass."""
    ex = ngram_jaccard_dups(sf_dir, threshold=threshold)
    sk = minhash_dups(sf_dir, threshold=threshold)

    def tag(e: int, s: int):
        def k(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "doc_a": t["doc_a"], "doc_b": t["doc_b"],
                "e": pa.array(np.full(n, e, np.int64)),
                "s": pa.array(np.full(n, s, np.int64))})
        return k

    u = (ex.map_batches(tag(1, 0), batch_format="pyarrow")
         .union(sk.map_batches(tag(0, 1), batch_format="pyarrow")))
    pairs = hash_agg(u, ["doc_a", "doc_b"],
                     [("e", "max", "e"), ("s", "max", "s")])

    def part(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "p_e": pa.array([int(e.sum())], pa.int64()),
                         "p_s": pa.array([int(s.sum())], pa.int64()),
                         "p_b": pa.array([int((e * s).sum())], pa.int64())})

    out = hash_agg(pairs.map_batches(part, batch_format="pyarrow"),
                   "k", [("p_e", "sum", "n_exact"),
                         ("p_s", "sum", "n_sketch"),
                         ("p_b", "sum", "n_both")], small=True)
    return out.map_batches(lambda t: t.drop_columns(["k"]),
                           batch_format="pyarrow")


def simhash_bit_balance(sf_dir: str) -> rd.Dataset:
    """(bit, n_ones): corpus count of documents with simhash bit b set —
    the sketch-health audit of the simhash family (a healthy random
    projection keeps every bit near 50%; a skewed bit means the token
    distribution leaks into the sketch and near-dup recall degrades on
    that plane).  Shares :func:`simhash64` exactly, so the DuckDB twin
    reuses the simhash CTE prefix.

    Scale shape: per-batch 64-row partials (ones-count per bit —
    combiner), one bounded-key hash_agg; no text ever shuffles."""

    def partial(t: pa.Table) -> pa.Table:
        ones = np.zeros(64, np.int64)
        for s in t["text"].to_pylist():
            sh = simhash64(s)
            for b in range(64):
                ones[b] += (sh >> b) & 1
        return pa.table({"bit": pa.array(np.arange(64, dtype=np.int64)),
                         "p_n": pa.array(ones, pa.int64())})

    return hash_agg(docs(sf_dir).map_batches(partial,
                                             batch_format="pyarrow"),
                    "bit", [("p_n", "sum", "n_ones")], small=True)


def simhash_dups(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """(doc_a, doc_b, hamming): pairs within hamming distance ≤ 3, found by
    chunk-LSH (4×16-bit chunks; ≤3 flipped bits ⇒ ≥1 chunk identical)."""

    def sig_batch(t: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, chunk_vals, sigs = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = simhash64(s)
            for c in range(4):
                doc_ids.append(did)
                chunk_ids.append(c)
                chunk_vals.append((sh >> (16 * c)) & 0xFFFF)
                sigs.append(sh)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "chunk_id": pa.array(chunk_ids, pa.int32()),
                         "chunk_val": pa.array(chunk_vals, pa.int32()),
                         "simhash": pa.array(sigs, pa.uint64())})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"], g["simhash"])))
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = int(rows[i][1]) ^ int(rows[j][1])
                ham = bin(d).count("1")
                if ham <= max_hamming:
                    out.append((rows[i][0], rows[j][0], ham))
        if not out:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "hamming": pd.array([], dtype="int64")})
        a, b, h = zip(*out)
        return pd.DataFrame({"doc_a": pd.array(a, dtype="int64"),
                             "doc_b": pd.array(b, dtype="int64"),
                             "hamming": pd.array(h, dtype="int64")})

    # buckets are (chunk_id, chunk_val) — up to 4x65536 tiny groups, so a
    # per-bucket map_groups pays Ray's group machinery per BUCKET; instead
    # hash-partition on the bucket key and run the per-bucket verify in a
    # pandas groupby inside each partition (one Python call per partition)
    def addpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__part", pa.array([], pa.int32()))
        return b.append_column("__part", pa.array(
            partition_ids(b, ["chunk_id", "chunk_val"], 32)))

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        outs = [verify_group(gg) for _, gg in
                g.groupby(["chunk_id", "chunk_val"], sort=False)]
        if not outs:
            return verify_group(g.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    cand = (docs(sf_dir).map_batches(sig_batch, batch_format="pyarrow")
            .map_batches(addpart, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(verify_partition, batch_format="pandas"))

    # a pair can collide in several chunks → keep min hamming per pair,
    # hash-partitioned on the pair key (no single-block ceiling)
    return hash_agg(cand, ["doc_a", "doc_b"],
                    [("hamming", "min", "hamming")])


# --------------------------------------------------------- embedding near-dup

def _decode_vec_block(t: pa.Table):
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    dim = len(t["v"][0].as_py()) // 8
    M = np.frombuffer(b"".join(t["v"].to_pylist()), np.float64).reshape(n, dim)
    return ids, M


def embedding_dups(sf_dir: str, threshold: float = 0.98) -> rd.Dataset:
    """(vec_a, vec_b): EXACT cosine ≥ threshold pairs, SQL-checkable
    (DuckDB list_cosine_similarity self-join).

    Scale shape — no full-matrix broadcast, no O(n²) per-batch matmul
    against the whole corpus:
      1. normalize per batch, attach a random-hyperplane sign CODE, and
         ``sort(code)`` — one distributed sort that makes blocks angularly
         coherent (similar vectors share sign prefixes);
      2. per-block summaries (centroid, angular radius) — tiny, driver-side
         list of O(num_blocks);
      3. EXACT block-pair pruning: pair (A,B) can contain a qualifying pair
         only if theta(cA,cB) - rA - rB <= arccos(t) (angular triangle
         inequality) — a lossy LSH accept would break SQL-exactness, this
         prune cannot;
      4. admissible block pairs matmul as raw Ray tasks over the
         object-store block refs (a pairwise block join is not expressible
         in the Dataset API — documented escape hatch).
    On angularly spread corpora the prune admits most pairs (exact
    all-pairs is inherently O(n²) then) but the work is distributed
    block×block, each task touching two blocks, never the corpus."""
    import pyarrow.parquet as _pq

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    dim = len(_pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"])["embedding"][0])
    rng = np.random.RandomState(7)
    planes = rng.randn(16, dim)
    planes_ref = ray.put(planes)

    def norm_code(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        bits = (M @ P.T > 0)
        code = np.zeros(len(M), np.int64)
        for b in range(P.shape[0]):
            code |= bits[:, b].astype(np.int64) << b
        return pa.table({
            "vec_id": t["vec_id"],
            "code": pa.array(code),
            "v": pa.array([row.tobytes() for row in M], pa.binary())})

    coded = (emb.map_batches(norm_code, batch_format="pyarrow")
             .sort("code").materialize())
    # coalesce to ~4096-row blocks: the sort emits many tiny blocks and the
    # pair-task count is quadratic in block count (order-preserving
    # repartition keeps the code-sorted coherence)
    n_blocks = max(1, coded.count() // 4096)
    coded = coded.repartition(n_blocks).materialize()
    refs = [r for r in coded.to_arrow_refs()]

    @ray.remote
    def block_summary(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        _, M = _decode_vec_block(tbl)
        c = M.mean(axis=0)
        nc = np.linalg.norm(c)
        c = c / nc if nc > 0 else M[0]
        r = float(np.arccos(np.clip((M @ c).min(), -1.0, 1.0)))
        return c, r

    sums = ray.get([block_summary.remote(r) for r in refs])
    ang_t = float(np.arccos(min(max(threshold, -1.0), 1.0)))

    @ray.remote
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ids_a, A = _decode_vec_block(ta)
        ids_b, B = _decode_vec_block(tb)
        S = A @ B.T
        if same:
            S[np.tril_indices(len(ids_a))] = -np.inf  # i<j positions only
        qi, qj = np.nonzero(S >= threshold)
        a, b = ids_a[qi], ids_b[qj]
        return pa.table({"vec_a": pa.array(np.minimum(a, b), pa.int64()),
                         "vec_b": pa.array(np.maximum(a, b), pa.int64())})

    out = []
    live = [(i, s) for i, s in enumerate(sums) if s is not None]
    for x, (i, (ci, ri)) in enumerate(live):
        for j, (cj, rj) in [live[y] for y in range(x, len(live))]:
            theta = float(np.arccos(np.clip(float(ci @ cj), -1.0, 1.0)))
            if theta - ri - rj <= ang_t:  # exact angular prune
                out.append(pair_task.remote(refs[i], refs[j], i == j))
    if not out:
        return rd.from_arrow(pa.table({"vec_a": pa.array([], pa.int64()),
                                       "vec_b": pa.array([], pa.int64())}))
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------- decontamination

def decontaminate(sf_dir: str, mod: int = 97, k: int = 3) -> rd.Dataset:
    """(doc_id, n_hits, contaminated): benchmark decontamination — flag
    every corpus document sharing a ``k``-token shingle with the benchmark
    set (here: docs with md5_upper64(doc_id) % mod == 0, the deterministic
    stand-in for an eval suite).  The canonical pre-training hygiene pass.

    Scale shape: the benchmark is small BY DEFINITION (an eval suite, not
    the corpus), so its distinct shingle hashes build distributedly and
    broadcast once (`ray.put` of a sorted int64 array); the 100 TB corpus
    side then streams through one `map_batches` doing np.isin per doc —
    no shuffle at all.  Docs with < k tokens carry no shingles (n_hits 0).
    """

    def gram_rows(t: pa.Table) -> pa.Table:
        out = []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if md5_upper64(str(doc_id).encode()) % mod != 0:
                continue
            toks = TOKEN_RE.findall(s.lower())
            for i in range(len(toks) - k + 1):
                out.append(md5_upper64(
                    " ".join(toks[i:i + k]).encode()) >> 3)
        arr = np.unique(np.array(out, dtype=np.int64))
        return pa.table({"gh": pa.array(arr, pa.int64())})

    bench_ghs = np.unique(np.concatenate([
        t["gh"].to_numpy(zero_copy_only=False)
        for t in docs(sf_dir).map_batches(gram_rows, batch_format="pyarrow")
                             .iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.int64)]))
    bench_ref = ray.put(bench_ghs)

    def flag(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)  # zero-copy broadcast
        ids, hits = [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if md5_upper64(str(doc_id).encode()) % mod == 0:
                continue  # benchmark docs are not corpus rows
            toks = TOKEN_RE.findall(s.lower())
            ghs = np.unique(np.array(
                [md5_upper64(" ".join(toks[i:i + k]).encode()) >> 3
                 for i in range(len(toks) - k + 1)], dtype=np.int64))
            ids.append(doc_id)
            hits.append(int(np.isin(ghs, bset).sum()) if len(ghs) else 0)
        n = pa.array(hits, pa.int64())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_hits": n,
                         "contaminated": pc.greater(n, 0)})

    return docs(sf_dir).map_batches(flag, batch_format="pyarrow")


def ngram_novelty(sf_dir: str, k: int = 3) -> rd.Dataset:
    """(doc_id, n_grams, n_novel): per-document NOVELTY — of the doc's
    distinct ``k``-token shingles, how many occur in NO smaller-doc_id
    document (doc_id as ingest order — the dataset-growth curve
    curation reads to decide when additional crawl yields mostly
    repetition).  Gram hash = md5_upper64(" ".join(toks)) >> 3, the
    decontaminate convention.  Docs with < k tokens carry no rows.

    Scale shape: (doc_id, gh) distinct-per-doc occurrence rows; the
    corpus-first table is a gram-keyed hash_agg min (combiner per
    batch); one gram-co-partitioned hash_join puts first_doc on each
    occurrence row and a doc-keyed hash_agg counts — gram hashes + ids
    on every exchange, text never shuffles."""
    from .textstats import TOKEN_RE as _TRE

    def occ_rows(t: pa.Table) -> pa.Table:
        ids, ghs = [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            toks = _TRE.findall(s.lower())
            if len(toks) < k:
                continue
            arr = np.unique(np.array(
                [md5_upper64(" ".join(toks[i:i + k]).encode()) >> 3
                 for i in range(len(toks) - k + 1)], dtype=np.int64))
            ids.extend([doc_id] * len(arr))
            ghs.extend(arr.tolist())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "gh": pa.array(ghs, pa.int64())})

    occ = docs(sf_dir).map_batches(occ_rows,
                                   batch_format="pyarrow").materialize()

    first = hash_agg(occ.map_batches(
        lambda t: t.group_by("gh").aggregate([("doc_id", "min")])
        .rename_columns(["gh", "p"]), batch_format="pyarrow"),
        "gh", [("p", "min", "first_doc")])

    j = hash_join(occ, first, on="gh",
                  left_cols={"doc_id": pa.int64()},
                  right_cols={"first_doc": pa.int64()})

    def part(t: pa.Table) -> pa.Table:
        novel = pc.cast(pc.equal(t["doc_id"], t["first_doc"]), pa.int64())
        g = (pa.table({"doc_id": t["doc_id"], "p_n": novel})
             .group_by("doc_id")
             .aggregate([([], "count_all"), ("p_n", "sum")]))
        return g.rename_columns(["doc_id", "p_g", "p_n"])

    return hash_agg(j.map_batches(part, batch_format="pyarrow"),
                    "doc_id", [("p_g", "sum", "n_grams"),
                               ("p_n", "sum", "n_novel")])


def substring_dup(sf_dir: str, k: int = 40,
                  num_partitions: int = 32) -> rd.Dataset:
    """(doc_id, n_win, n_dup): EXACT substring-duplication rate — for
    every doc, how many of its k-char windows (every offset, the
    Lee et al. 2022 "Deduplicating Training Data" granularity — finer
    than ``chunk_dedup``'s disjoint chunks) occur anywhere else in the
    corpus (any doc incl. itself, any other offset).

    Scale shape: the window stream never materializes — each batch
    reduces its windows to (window_hash, doc_id, c, n_win) partials
    in-kernel (n_win rides along so no second corpus scan / join is
    needed; docs shorter than k emit one null-hash row so they surface
    with n_win=0); shuffle #1 hash-partitions on window_hash (the
    corpus-sized exchange the exact algorithm requires — payload is
    4 ints/row, never text); within a partition, a window occurrence
    is duplicated iff its hash's corpus-wide total >= 2 (the partition
    holds ALL rows of each hash); shuffle #2 re-keys per-doc partials
    (id-sized).

    Hashes are md5-upper64 of the raw window text, so the DuckDB twin
    (substr + generate_series + md5_number_upper) is bit-identical."""

    def window_partial(t: pa.Table) -> pa.Table:
        hs: list[int | None] = []
        ids: list[int] = []
        cs: list[int] = []
        wins: list[int] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n = len(s) - k + 1
            if n <= 0:
                hs.append(None)       # short doc: surfaces with n_win=0
                ids.append(did)
                cs.append(0)
                wins.append(0)
                continue
            loc: dict[int, int] = {}  # per-doc combine (repeats in-doc)
            for i in range(n):
                h = md5_upper64(s[i:i + k].encode("utf-8"))
                loc[h] = loc.get(h, 0) + 1
            hs.extend(np.array(list(loc), dtype=np.uint64)
                      .astype(np.int64).tolist())
            cs.extend(loc.values())
            ids.extend([did] * len(loc))
            wins.extend([n] * len(loc))
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "c": pa.array(cs, pa.int64()),
                         "n_win": pa.array(wins, pa.int64())})

    def addpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int32()))
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["h"], num_partitions)))

    def dup_in_part(g: pa.Table) -> pa.Table:
        # all occurrences of a hash land in this partition: corpus-wide
        # total >= 2 marks every one of its occurrences duplicated
        # (null-hash short-doc rows have c=0, so their group never trips)
        tot = (g.select(["h", "c"]).group_by("h")
               .aggregate([("c", "sum")]).rename_columns(["h", "tot"]))
        idx = pc.index_in(g["h"], value_set=tot["h"])
        tt = pc.take(tot["tot"], idx)
        dup = pc.if_else(pc.greater_equal(tt, 2), g["c"],
                         pa.scalar(0, pa.int64()))
        out = (pa.table({"doc_id": g["doc_id"], "dup": dup,
                         "n_win": g["n_win"]})
               .group_by("doc_id")
               .aggregate([("dup", "sum"), ("n_win", "max")]))
        return out.rename_columns(["doc_id", "p_dup", "p_win"])

    # the window kernel is the compute-heavy stage (~2 us/window): split
    # the read so it runs corpus-wide-parallel (at 100 TB the many input
    # files give this for free; a single sandbox file needs the hint)
    ncpu = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    src = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          override_num_blocks=ncpu)
    return hash_agg(
        src.map_batches(window_partial, batch_format="pyarrow")
        .map_batches(addpart, batch_format="pyarrow")
        .groupby("__part").map_groups(dup_in_part, batch_format="pyarrow"),
        "doc_id", [("p_win", "max", "n_win"), ("p_dup", "sum", "n_dup")])


def semantic_dedup(sf_dir: str, threshold: float = 0.45,
                   n_lists: int = 16, sample_stride: int = 2,
                   iters: int = 10) -> "rd.Dataset":
    """(vec_id, list_id, keep): SemDeDup-style SEMANTIC dedup over the
    embedding space (Abbas et al. 2023, arXiv:2303.09540): cluster the
    corpus with the deterministic integer k-means (shared with knn_ivf),
    then inside each cluster drop every vector that has a SMALLER-id
    cluster-mate with cosine ≥ threshold (keep = the first copy of each
    semantic duplicate group, by id).

    Scale shape: assignment is one streaming map_batches (int argmax
    against the sample-fit centroid broadcast); the pairwise check runs
    INSIDE groupby(list_id).map_groups — pick n_lists so corpus/n_lists
    fits one worker (at 100 TB that is O(10^4+) lists; the quadratic is
    per-cluster, never global).  Cosine thresholding matches the DuckDB
    twin's list_cosine_similarity at this fixture's score gaps (the
    emb_cosine_dups precedent)."""
    from .similarity import ivf_assignments

    _, assigned = ivf_assignments(sf_dir, n_lists, sample_stride, iters)

    def dedup_in_cluster(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        g = g.sort_values("vec_id", ignore_index=True)
        n = len(g)
        M = np.frombuffer(b"".join(g["v"]), np.float64).reshape(n, -1)
        sims = M @ M.T
        # drop i iff any j < i with cos(j, i) >= threshold
        dup = (np.tril(sims >= threshold, k=-1)).any(axis=1)
        return pd.DataFrame({"vec_id": g["vec_id"],
                             "list_id": g["list_id"],
                             "keep": ~dup})

    return (assigned
            .groupby("list_id")
            .map_groups(dedup_in_cluster, batch_format="pandas"))


def incremental_new(sf_dir: str, mod: int = 2) -> rd.Dataset:
    """(doc_id, text_hash): the INCREMENTAL-CRAWL dedup step — documents
    of the NEW batch (md5_upper64(decimal doc_id) % mod != 0) whose exact
    text hash does not already occur in the PREVIOUS corpus snapshot
    (% mod == 0, the deterministic stand-in for last month's crawl) —
    one row per DISTINCT new hash, min new doc_id winning (dedup within
    the batch rides along).  Every recurring web crawl runs exactly this
    pass before appending to the training corpus.

    Scale shape: both sides reduce to (16-byte-hash, doc_id) rows inside
    one streaming map (text never leaves the kernel); the anti join is a
    hash_agg on the hash carrying per-side min-ids — one shuffle of
    hash-sized rows, no broadcast (the snapshot side is corpus-sized, so
    the decontaminate-style broadcast would not hold)."""

    def hash_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        old = [md5_upper64(str(i).encode()) % mod == 0 for i in ids]
        hs = [hashlib.md5(s.encode("utf-8")).hexdigest()
              for s in t["text"].to_pylist()]
        big = 1 << 62
        return pa.table({
            "text_hash": pa.array(hs, pa.string()),
            # per-side partials: min new-doc id (or +inf) and old-side count
            "p_new": pa.array([big if o else i for i, o in zip(ids, old)],
                              pa.int64()),
            "p_old": pa.array([1 if o else 0 for o in old], pa.int64()),
        })

    agg = hash_agg(docs(sf_dir).map_batches(hash_rows,
                                            batch_format="pyarrow"),
                   "text_hash", [("p_new", "min", "new_id"),
                                 ("p_old", "sum", "n_old")])

    def keep_new(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["n_old"], 0),
                       pc.less(t["new_id"], 1 << 62))
        out = t.filter(keep)
        return pa.table({"doc_id": out["new_id"],
                         "text_hash": out["text_hash"]})

    return agg.map_batches(keep_new, batch_format="pyarrow")


def containment_dups(sf_dir: str, threshold: float = 0.9,
                     seed: int = 42) -> rd.Dataset:
    """(src, dst) DIRECTED containment near-dups: |S(src) ∩ S(dst)| /
    |S(src)| ≥ threshold over 3-gram word shingles — the asymmetric
    companion to :func:`minhash_dups` (Broder's containment; the
    wire-copy / quote-expansion case Jaccard misses when one document is
    much longer than the other).  Verification compares in integer basis
    points (inter · 10⁴ ≥ thr_bp · |S(src)|) so engine and DuckDB twin
    agree exactly with no float threshold edge.

    Scale shape: shares :func:`_band_candidates` (the memoized LSH band
    table + self-join) and :func:`_candidate_blob_pairs` (gated
    broadcast/join blob delivery) with minhash_dups — only the verify
    tail differs, testing BOTH directions of each unordered candidate.
    Recall for extreme size ratios is the known minhash-LSH limit and is
    documented rather than patched."""
    thr_bp = int(round(threshold * 10_000))
    cand_ds = _band_candidates(sf_dir, seed)
    pairs = _candidate_blob_pairs(cand_ds, sf_dir, seed)

    def verify(t: pa.Table) -> pa.Table:
        out_s, out_d = [], []
        for a, b, ra, rb in zip(t["doc_a"].to_pylist(),
                                t["doc_b"].to_pylist(),
                                t["sh_a"].to_pylist(),
                                t["sh_b"].to_pylist()):
            va = np.frombuffer(ra, dtype=np.int64)
            vb = np.frombuffer(rb, dtype=np.int64)
            inter = np.intersect1d(va, vb, assume_unique=True).size
            if va.size and inter * 10_000 >= thr_bp * va.size:
                out_s.append(a)
                out_d.append(b)
            if vb.size and inter * 10_000 >= thr_bp * vb.size:
                out_s.append(b)
                out_d.append(a)
        return pa.table({"src": pa.array(out_s, pa.int64()),
                         "dst": pa.array(out_d, pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def dup_rate_by_source(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, n_dups): per-SOURCE exact-duplicate accounting —
    how many of each domain's documents lose the min-doc_id exact-text
    dedup (the :func:`exact_dedup` winner rule).  The per-domain
    duplication audit a corpus run reports next to
    :func:`textstats.source_rollup` (which domains re-serve content and
    how much removal each will see).

    Scale shape: one streaming pass emits (text_hash, doc_id, source)
    combiner rows; a hash_agg on text_hash computes the winner (min
    doc_id) AND total copies per hash; losers-per-source then need the
    source of every NON-winner doc — instead of re-joining docs, the
    combiner ships per-(hash, source) partial counts + per-(hash, source)
    min doc_id, so the per-hash group can attribute its (copies − 1)
    losers to sources exactly, all in id/hash-sized rows (text never
    shuffles)."""

    def rows(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        tmp = pa.table({"text_hash": pa.array(fps, pa.string()),
                        "source": t["source"], "doc_id": t["doc_id"]})
        g = tmp.group_by(["text_hash", "source"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min")])
        return g.rename_columns(["text_hash", "source", "p_n", "p_min"])

    per_hs = hash_agg(
        docs(sf_dir, columns=("doc_id", "text", "source")).map_batches(
            rows, batch_format="pyarrow"),
        ["text_hash", "source"],
        [("p_n", "sum", "n"), ("p_min", "min", "mn")])

    # per (hash, source): n copies, min doc_id.  The hash's winner is the
    # global min over its sources; every other copy is a dup.  One more
    # exchange keyed on text_hash groups the source rows of each hash.
    def attribute(t: pa.Table) -> pa.Table:
        import numpy as np
        order = pc.sort_indices(t, sort_keys=[
            ("text_hash", "ascending"), ("mn", "ascending"),
            ("source", "ascending")])
        t = t.take(order)
        h = t["text_hash"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            ([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        first = np.zeros(len(h), bool)
        first[starts] = True  # the winner's (hash, source) row
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        dups = np.where(first, n - 1, n)
        g = (pa.table({"source": t["source"],
                       "p_docs": pa.array(n, pa.int64()),
                       "p_dups": pa.array(dups, pa.int64())})
             .group_by("source").aggregate(
                 [("p_docs", "sum"), ("p_dups", "sum")]))
        return g.rename_columns(["source", "p_docs", "p_dups"])


    P = 32

    def addpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int32()))
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["text_hash"], P)))

    parts = (per_hs.map_batches(addpart, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(lambda g: attribute(g.drop_columns(["__part"])),
                         batch_format="pyarrow"))
    return hash_agg(parts, "source",
                    [("p_docs", "sum", "n_docs"),
                     ("p_dups", "sum", "n_dups")], small=True)


def boilerplate_chunks(sf_dir: str, k: int = 20,
                       chunk_tokens: int = 10) -> pa.Table:
    """(chunk_hash, chunk, df, n_copies): the ``k`` most document-frequent
    text chunks WITH their text — the C4 "most common lines" boilerplate
    table (nav bars, cookie banners, footers) a cleaning pipeline builds
    before stripping them from every page.  df counts DISTINCT documents,
    n_copies total occurrences; selection is total-ordered by
    (df desc, chunk_hash asc) — md5 hex compares identically in Python
    and DuckDB, so the rank-k boundary is deterministic on both sides.

    Scale shape: pass 1 ships only (16-byte-hash, partial df, partial
    count) combiner rows (chunk TEXT never shuffles — the chunk_dedup
    contract) into one hash_agg + an exact per-block top-k reduce; the
    k winning hashes broadcast (k-sized) and pass 2 recovers each one's
    text from the streaming corpus scan — driver state is k rows.
    Memoized per (corpus, k, chunk_tokens): docs_boilerplate,
    strip_boilerplate and clean_text_corpus share one mine."""
    key = _memo_key("boilerplate_chunks", sf_dir, k, chunk_tokens)
    hit = _MEMO.get(key)
    if hit is not None:
        return hit

    def stats_rows(t: pa.Table) -> pa.Table:
        per: dict[str, list] = {}
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = TOKEN_RE.findall(s)
            seen_doc: set[str] = set()
            for j in range(0, len(toks), chunk_tokens):
                h = hashlib.md5(
                    " ".join(toks[j:j + chunk_tokens]).encode()).hexdigest()
                cur = per.get(h)
                if cur is None:
                    per[h] = cur = [0, 0]
                cur[1] += 1
                if h not in seen_doc:
                    seen_doc.add(h)
                    cur[0] += 1
        return pa.table({
            "chunk_hash": pa.array(list(per.keys()), pa.string()),
            "p_df": pa.array([v[0] for v in per.values()], pa.int64()),
            "p_n": pa.array([v[1] for v in per.values()], pa.int64())})

    stats = hash_agg(docs(sf_dir).map_batches(stats_rows,
                                              batch_format="pyarrow"),
                     "chunk_hash", [("p_df", "sum", "df"),
                                    ("p_n", "sum", "n_copies")])
    top = pa.concat_tables(list(
        topk(stats, [("df", "descending"), ("chunk_hash", "ascending")], k)
        .iter_batches(batch_format="pyarrow")))
    want = set(top["chunk_hash"].to_pylist())
    want_ref = ray.put(want)

    def recover(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        out: dict[str, str] = {}
        for s in t["text"].to_pylist():
            toks = TOKEN_RE.findall(s)
            for j in range(0, len(toks), chunk_tokens):
                c = " ".join(toks[j:j + chunk_tokens])
                h = hashlib.md5(c.encode()).hexdigest()
                if h in w and h not in out:
                    out[h] = c
        return pa.table({"chunk_hash": pa.array(list(out), pa.string()),
                         "chunk": pa.array(list(out.values()), pa.string())})

    texts: dict[str, str] = {}
    for t in (docs(sf_dir, columns=("text",))
              .map_batches(recover, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        texts.update(zip(t["chunk_hash"].to_pylist(),
                         t["chunk"].to_pylist()))
    out = pa.table({
        "chunk_hash": top["chunk_hash"],
        "chunk": pa.array([texts[h] for h in top["chunk_hash"].to_pylist()],
                          pa.string()),
        "df": top["df"], "n_copies": top["n_copies"]})
    _MEMO[key] = out
    return out
