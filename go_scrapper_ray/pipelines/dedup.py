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

import ray
import ray.data as rd

from .textstats import docs

TOKEN_RE = re.compile(r"\S+")


# -------------------------------------------------------------------- exact

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """(text_hash, doc_id): keep the min doc_id per exact text hash."""

    def hash_batch(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table({"text_hash": pa.array(fps, pa.string()),
                         "doc_id": t["doc_id"]})

    from ray.data.aggregate import Min
    return (docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow")
            .groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id")))


# ------------------------------------------------------------------- minhash

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows


def _minhash_params(seed: int = 42):
    rng = np.random.RandomState(seed)
    M = (1 << 61) - 1
    a = rng.randint(1, M, size=_N_PERM, dtype=np.int64)
    b = rng.randint(0, M, size=_N_PERM, dtype=np.int64)
    return a, b, M


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array(
        [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "little") >> 3 for g in grams], dtype=np.int64))


def minhash_signatures(sf_dir: str, seed: int = 42) -> rd.Dataset:
    """(doc_id, band_id, band_hash): LSH band rows, exploded."""
    a, b, M = _minhash_params(seed)

    def kernel(t: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(s)
            if len(sh) == 0:
                continue
            # vectorized (a*x+b) mod M over perms x shingles
            vals = (a[:, None] * sh[None, :] + b[:, None]) % M
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


def minhash_dups(sf_dir: str, threshold: float = 0.8, seed: int = 42) -> rd.Dataset:
    """(doc_a, doc_b) near-dup pairs: LSH candidates verified by exact
    shingle-Jaccard ≥ threshold.  Texts for verification come from a
    broadcast id→text map (fixture scale) — at 100 TB the verify stage is a
    second co-partitioned lookup join instead (documented partitioning
    assumption: pair verification joins on doc_id)."""
    texts_tbl = docs(sf_dir).to_arrow_refs()
    id_text: dict[int, str] = {}
    for ref in texts_tbl:
        t = ray.get(ref)
        id_text.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    text_ref = ray.put(id_text)

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        texts = ray.get(text_ref)
        pairs = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if jaccard(texts[ids[i]], texts[ids[j]]) >= threshold:
                    pairs.add((ids[i], ids[j]))
        if not pairs:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        aa, bb = zip(*sorted(pairs))
        return pd.DataFrame({"doc_a": list(aa), "doc_b": list(bb)})

    # sized repartition before the groupby: Ray's shuffle partition count
    # otherwise defaults to ~200, which dominates at fixture scale
    cand = (minhash_signatures(sf_dir, seed).repartition(16)
            .groupby(["band_id", "band_hash"])
            .map_groups(verify_group, batch_format="pandas"))

    # candidate pairs can surface from several bands → distinct.  The pair
    # set is output-sized (small), so dedup is one Arrow group_by in a
    # single block — NOT a per-pair map_groups (measured pathological)
    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([])

    return cand.repartition(1).map_batches(distinct, batch_format="pyarrow")


# ------------------------------------------------------------ n-gram jaccard

def ngram_jaccard_dups(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """(doc_a, doc_b): EXACT token-set Jaccard >= threshold pairs — no LSH
    approximation, SQL-checkable against a DuckDB self-join oracle.

    Shape (PPJoin-style prefix filtering — Xiao et al., WWW'08):
      1. (doc_id, token) distinct rows; global df per token (small groupby)
         broadcast as the canonical rare-first token order;
      2. each doc indexes only its PREFIX tokens (first |A|-ceil(t*|A|)+1
         under that order) — theorem: any pair with J>=t shares a prefix
         token, so low-df prefixes generate candidates without the
         stopword pair explosion;
      3. groupby(prefix token) -> candidate pairs -> distinct;
      4. verify true Jaccard against broadcast per-doc token sets.
    Partitioning assumption (documented): the verify step broadcasts the
    token-set map; at corpus scale it becomes a doc_id-partitioned lookup
    join, and minhash_dups is the preferred screen."""

    def tok_batch(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in set(TOKEN_RE.findall(s.lower())):
                ids.append(did)
                toks.append(w)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    import math
    from collections import Counter

    toks = docs(sf_dir).map_batches(tok_batch, batch_format="pyarrow")

    # driver-side broadcast build (test-scale; see docstring caveat):
    # per-doc token sets → df counts → global rare-first rank → prefixes
    sets: dict[int, frozenset] = {}
    for ref in toks.to_arrow_refs():
        t = ray.get(ref)
        for did, w in zip(t["doc_id"].to_pylist(), t["token"].to_pylist()):
            sets.setdefault(did, set()).add(w)
    sets = {k: frozenset(v) for k, v in sets.items()}
    df = Counter()
    for s in sets.values():
        df.update(s)
    rank = {w: i for i, (w, _) in
            enumerate(sorted(df.items(), key=lambda kv: (kv[1], kv[0])))}
    prefixes = {}
    for did, s in sets.items():
        n = len(s)
        if n == 0:
            continue
        p = n - math.ceil(threshold * n) + 1
        prefixes[did] = sorted(s, key=rank.__getitem__)[:p]
    bc = ray.put((rank, sets, {d: frozenset(p) for d, p in prefixes.items()}))

    def prefix_rows(t: pa.Table) -> pa.Table:
        _, _, pmap = ray.get(bc)
        ids, toks_out = [], []
        for did in t["doc_id"].to_pylist():
            for w in pmap.get(did, ()):
                ids.append(did)
                toks_out.append(w)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks_out, pa.string())})

    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        """Verify inline; emit a pair ONLY in the group of its first (by
        global rank) common prefix token — each qualifying pair surfaces in
        exactly one group, so no dedup shuffle is needed."""
        rk, smap, pmap = ray.get(bc)
        w = g["token"].iloc[0]
        ids = sorted(set(g["doc_id"]))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                shared = pmap[a] & pmap[b]
                if min(shared, key=rk.__getitem__) != w:
                    continue
                sa, sb = smap[a], smap[b]
                u = len(sa | sb)
                if u and len(sa & sb) / u >= threshold:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    return (docs(sf_dir, columns=("doc_id",))
            .map_batches(prefix_rows, batch_format="pyarrow")
            .repartition(16)
            .groupby("token").map_groups(pairs_group, batch_format="pandas"))


# -------------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for tok in set(TOKEN_RE.findall(text.lower())):
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                           "little")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"),
                                           dtype=np.uint8))
        v += bits.astype(np.int64) * 2 - 1
    out = np.packbits((v > 0).astype(np.uint8)).tobytes()
    return int.from_bytes(out, "little")


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
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        a, b, h = zip(*out)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": h})

    cand = (docs(sf_dir).map_batches(sig_batch, batch_format="pyarrow")
            .repartition(16)
            .groupby(["chunk_id", "chunk_val"])
            .map_groups(verify_group, batch_format="pandas"))

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([("hamming", "min")]) \
            .rename_columns(["doc_a", "doc_b", "hamming"])

    return cand.repartition(1).map_batches(distinct, batch_format="pyarrow")


# --------------------------------------------------------- embedding near-dup

def embedding_dups(sf_dir: str, threshold: float = 0.98) -> rd.Dataset:
    """(vec_a, vec_b): cosine ≥ threshold pairs.  The full normalized matrix
    is broadcast once (ray.put); each batch does one f64 matmul against it —
    small-side-broadcast instead of a shuffle join.  SQL-checkable (DuckDB
    list_cosine_similarity self-join)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    all_ids, all_vecs = [], []
    for ref in emb.to_arrow_refs():
        t = ray.get(ref)
        all_ids.extend(t["vec_id"].to_pylist())
        all_vecs.extend(t["embedding"].to_pylist())
    ids = np.array(all_ids, dtype=np.int64)
    M = np.array(all_vecs, dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    mat_ref = ray.put((ids, M))

    def kernel(t: pa.Table) -> pa.Table:
        g_ids, g_M = ray.get(mat_ref)
        q_ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        Q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        sims = Q @ g_M.T
        qi, gi = np.nonzero(sims >= threshold)
        a, b = q_ids[qi], g_ids[gi]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64())})

    return emb.map_batches(kernel, batch_format="pyarrow", batch_size=1024)
