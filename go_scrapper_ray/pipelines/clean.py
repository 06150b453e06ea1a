"""Composed corpus-cleaning pipeline over ``documents`` — the end-to-end
"raw crawl → training corpus" flow a 100 TB webtext pipeline runs, built
entirely from this repo's staged operators:

    quality filter (min token count)            textstats token kernel
      → language filter (pred_lang == lang)     textstats.LangIdStage
      → exact dedup (md5, keep min doc_id)      dedup.exact_dedup shape
      → near-dup dedup (MinHash-LSH clusters,   dedup.dup_clusters
        keep min SURVIVING doc per cluster)
      → resumable partitioned Parquet sink

Scale shape: the filter pass is one streaming ``map_batches`` over the
corpus (text never crosses a shuffle); exact dedup shuffles 16-byte
hashes; the near-dup cluster map is output-sized (pair-graph nodes);
the final join/groupby runs on id-sized tables only.  Every stage's
semantics are SQL-expressible, so the WHOLE composition has a DuckDB
oracle twin (``__ray_entry__._clean_corpus_sql``).
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import pyarrow as pa

import ray
import ray.data as rd

from ..agg import hash_agg, hash_join

from .dedup import dup_clusters
from .textstats import TOKEN_RE, LangIdStage, docs


class CleanFilter:
    """Actor-pool stage: language-ID marker tables built once per actor;
    per batch computes token counts + predicted language, keeps rows that
    pass both gates, and emits (doc_id, text_hash) — the text itself never
    leaves the filter stage."""

    def __init__(self, min_words: int, lang: str):
        self.lid = LangIdStage()
        self.min_words = min_words
        self.lang = lang

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = self.lid(t)["pred_lang"].to_pylist()
        ids, hashes = [], []
        for did, s, pl in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist(), preds):
            if pl != self.lang:
                continue
            if len(TOKEN_RE.findall(s)) < self.min_words:
                continue
            ids.append(did)
            hashes.append(hashlib.md5(s.encode("utf-8")).hexdigest())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text_hash": pa.array(hashes, pa.string())})


class _FlagStage(CleanFilter):
    """Per-doc GATE-FLAG table (doc_id, text_hash, len_ok, both_ok) for
    ALL documents — the shared one-text-pass input of clean_corpus AND
    gate_funnel (id+hash-sized rows; the text stays inside this stage).
    Hashes are computed only for docs passing both gates (the only rows
    whose hash any consumer reads)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = self.lid(t)["pred_lang"].to_pylist()
        ids, hashes, len_ok, both_ok = [], [], [], []
        for did, s, pl in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist(), preds):
            lok = len(TOKEN_RE.findall(s)) >= self.min_words
            bok = lok and pl == self.lang
            ids.append(did)
            hashes.append(hashlib.md5(s.encode("utf-8")).hexdigest()
                          if bok else "")
            len_ok.append(int(lok))
            both_ok.append(int(bok))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text_hash": pa.array(hashes, pa.string()),
                         "len_ok": pa.array(len_ok, pa.int64()),
                         "both_ok": pa.array(both_ok, pa.int64())})


def _gate_flags(sf_dir: str, min_words: int, lang: str) -> rd.Dataset:
    """Memoized per (corpus, min_words, lang): the single actor-pool
    text pass both clean consumers ride (the dedup._MEMO convention) —
    in a suite run the langid+tokenize scan happens once, not once per
    consumer."""
    from .dedup import _MEMO, _memo_key

    key = _memo_key("gate_flags", sf_dir, min_words, lang)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = docs(sf_dir).map_batches(
            _FlagStage, fn_constructor_args=(min_words, lang),
            batch_format="pyarrow", concurrency=(1, 8),
            num_cpus=1).materialize()
    return hit


def _exact_winners(kept: rd.Dataset) -> rd.Dataset:
    """min doc_id per exact text hash among the filtered survivors."""

    return (hash_agg(kept, "text_hash", [("doc_id", "min", "doc_id")])
            .select_columns(["doc_id"]))


def _cluster_winners(exact_winners: rd.Dataset, sf_dir: str,
                     threshold: float) -> rd.Dataset:
    """(cluster_id, doc_id): min surviving doc per MinHash near-dup
    cluster — the shared tail of clean_corpus and gate_funnel (one
    definition, so the funnel cannot drift from the pipeline it
    observes)."""

    clusters = dup_clusters(sf_dir, threshold)  # (doc_id, cluster_id)
    joined = hash_join(exact_winners, clusters, on="doc_id",
                       left_cols={}, right_cols={"cluster_id": pa.int64()})
    return hash_agg(joined, "cluster_id",
                    [("doc_id", "min", "doc_id")])


def clean_corpus(sf_dir: str, min_words: int = 20, lang: str = "en",
                 threshold: float = 0.8) -> rd.Dataset:
    """(cluster_id, doc_id): the surviving document per near-dup cluster
    after quality + language + exact-dedup gates.

    A doc survives iff it passes the quality/language filter, is the min
    doc_id of its exact-text group among the filtered set, and is the min
    such winner inside its MinHash near-dup cluster.  The text pass
    rides the memoized :func:`_gate_flags` table shared with
    gate_funnel."""
    import pyarrow.compute as pc

    kept = _gate_flags(sf_dir, min_words, lang).map_batches(
        lambda t: t.filter(pc.equal(t["both_ok"], 1))
        .select(["doc_id", "text_hash"]), batch_format="pyarrow")
    return _cluster_winners(_exact_winners(kept), sf_dir, threshold)


# ------------------------------------------------------------ resumable sink

def write_partitioned_resumable(ds: rd.Dataset, out_dir: str,
                                key_col: str = "doc_id",
                                num_buckets: int = 8) -> list[int]:
    """Partitioned Parquet sink with per-bucket resume.

    Rows land in ``out_dir/bucket=K/`` (K = key % num_buckets) with a
    ``_done`` marker per completed bucket.  On re-run, buckets with a
    marker are SKIPPED (their rows are filtered out before the write);
    buckets without one are DELETED first (a crashed ``write_parquet``
    appends uniquely-named files, so stale partials would silently
    duplicate rows — same hazard the crawl's fresh-run rmtree guards,
    crawl.py:410-416).  At 100 TB the same scheme applies per input
    shard: one marker per (shard, bucket) output directory.

    Returns the bucket ids written by THIS call."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = {k for k in range(num_buckets)
            if (out / f"bucket={k}" / "_done").exists()}
    todo = [k for k in range(num_buckets) if k not in done]
    if not todo:
        return []
    for k in todo:  # clear partials from a crashed previous run
        shutil.rmtree(out / f"bucket={k}", ignore_errors=True)

    import numpy as np

    todo_arr = np.array(todo, dtype=np.int64)

    def bucket_and_filter(t: pa.Table) -> pa.Table:
        b = (t[key_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) % num_buckets)
        t = t.append_column("bucket", pa.array(b.astype(np.int32)))
        return t.filter(pa.array(np.isin(b, todo_arr)))

    pending = ds.map_batches(bucket_and_filter, batch_format="pyarrow")
    pending.write_parquet(str(out), partition_cols=["bucket"])
    for k in todo:
        d = out / f"bucket={k}"
        d.mkdir(exist_ok=True)  # bucket may be empty at this scale
        (d / "_done").touch()
    return todo


def dedup_keep_best(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """(cluster_id, doc_id, n_tokens): QUALITY-AWARE near-dup dedup — the
    survivor per MinHash near-dup cluster is the LONGEST document (most
    whitespace tokens; ties → smallest doc_id), not the min-id copy.
    Production corpus dedup keeps the best duplicate, not an arbitrary
    one (e.g. the un-truncated mirror of a page).

    Scale shape: clusters and token counts are id-sized tables; one
    co-partitioned ``hash_join`` on doc_id, a per-batch best-per-cluster
    partial (combiner), then a groupby(cluster_id) final over one row per
    (cluster x block) — the text never crosses an exchange."""
    import pandas as pd

    from .dedup import dup_clusters
    from .textstats import token_count

    clusters = dup_clusters(sf_dir, threshold)       # (doc_id, cluster_id)
    toks = token_count(sf_dir)                       # (doc_id, n_tokens, ...)
    joined = hash_join(clusters, toks, on="doc_id",
                       left_cols={"cluster_id": pa.int64()},
                       right_cols={"n_tokens": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = (df.sort_values(["cluster_id", "n_tokens", "doc_id"],
                             ascending=[True, False, True])
                .groupby("cluster_id", sort=False).head(1))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True]).head(1)
        return g[["cluster_id", "doc_id", "n_tokens"]]

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster_id").map_groups(final, batch_format="pandas"))


def train_shards(sf_dir: str, n_shards: int = 16,
                 out_dir: str | None = None) -> rd.Dataset:
    """(doc_id, shard, pos): deterministic global shuffle into fixed
    training shards — the last-mile writer of a corpus pipeline.

    ``shard = md5_upper64(decimal doc_id) % n_shards`` (stable across
    runs, cluster widths and block orders — unlike ``ds.random_shuffle``)
    and ``pos`` is the rank of (hash, doc_id) inside the shard, so a
    trainer reading shard K streams the same pseudo-random document order
    every time, and a killed write resumes per shard.

    Scale shape: the hash/shard stamp is one streaming ``map_batches``;
    the single exchange is the ``groupby(shard)`` — id-sized rows unless
    ``out_dir`` asks for the text to ride along, which IS the unavoidable
    shuffle any global-shuffle shard writer pays.  Each shard orders
    locally inside ``map_groups``; pick n_shards so corpus/n_shards fits
    one worker (at 100 TB that is O(10^4-10^5) shards, far above any
    per-group-overhead regime).  With ``out_dir`` each shard lands as
    ``shard=K/part.parquet`` + ``_done`` marker (resume contract of
    ``write_partitioned_resumable``: marked shards are skipped)."""
    import json
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from .dedup import md5_upper64

    cols = ("doc_id", "text") if out_dir else ("doc_id",)

    def _corpus_sig() -> dict:
        # Cheap input fingerprint: (size, mtime) of the documents parquet
        # PLUS a parquet-footer content signal (num_rows + per-row-group
        # byte sizes, metadata-only read) — so a corpus regenerated in
        # place with preserved size+mtime (mtime-preserving copy, equal-
        # length content edit) still invalidates the resume markers.
        src = Path(sf_dir) / "documents.parquet"
        st = os.stat(src)
        md = pq.read_metadata(src)
        return {"n_shards": n_shards, "src": str(src),
                "size": st.st_size, "mtime_ns": st.st_mtime_ns,
                "num_rows": md.num_rows,
                "rg_bytes": [md.row_group(i).total_byte_size
                             for i in range(md.num_row_groups)]}

    def stamp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = np.fromiter((md5_upper64(str(i).encode()) for i in ids),
                        dtype=np.uint64, count=len(ids))
        t = t.append_column("h", pa.array(h, pa.uint64()))
        return t.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int32)))

    stamped = docs(sf_dir, columns=cols).map_batches(
        stamp, batch_format="pyarrow")

    out = Path(out_dir) if out_dir else None
    if out is not None:
        out.mkdir(parents=True, exist_ok=True)
        # Resume is only valid against the SAME params + corpus: a manifest
        # at the top level records them, and a mismatch (different n_shards,
        # different input) invalidates every existing shard before the run.
        manifest = out / "_manifest.json"
        sig = _corpus_sig()
        prev = None
        if manifest.exists():
            try:
                prev = json.loads(manifest.read_text())
            except (OSError, ValueError):
                prev = None
        if prev != sig:
            for d in out.glob("shard=*"):
                shutil.rmtree(d, ignore_errors=True)
            manifest.write_text(json.dumps(sig))

    def one_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort",
                          ignore_index=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        if out is not None:
            k = int(g["shard"].iloc[0])
            d = out / f"shard={k}"
            if not (d / "_done").exists():
                shutil.rmtree(d, ignore_errors=True)
                d.mkdir(parents=True, exist_ok=True)
                # ATTEMPT-UNIQUE temp name + rename: a crashed write never
                # leaves a half-written part.parquet behind a _done marker,
                # and a speculative replay racing this attempt cannot have
                # its half-written temp renamed into place by us (a fixed
                # temp name could be overwritten by the other attempt
                # mid-write; the rename itself is atomic either way)
                import tempfile
                fd, tmp = tempfile.mkstemp(dir=str(d),
                                           suffix=".parquet.tmp")
                os.close(fd)
                pq.write_table(
                    pa.Table.from_pandas(
                        g[["pos", "doc_id", "text"]], preserve_index=False),
                    tmp)
                Path(tmp).rename(d / "part.parquet")
                (d / "_done").touch()
        return g[["doc_id", "shard", "pos"]]

    return stamped.groupby("shard").map_groups(
        one_shard, batch_format="pandas")


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read a ``write_partitioned_resumable`` output back (all buckets)."""
    paths = sorted(str(p) for p in Path(out_dir).glob("bucket=*/*.parquet"))
    return rd.read_parquet(paths)


def train_val_test_split(sf_dir: str, val_pct: int = 10,
                         test_pct: int = 10) -> "rd.Dataset":
    """(doc_id, lang, split): deterministic hash train/val/test split —
    md5_upper64(decimal doc_id) % 100 lands in [0, 100-val-test) → train,
    then val, then test.  Stable across runs, cluster widths and block
    orders (unlike ds.split_proportionately), and uniform within every
    stratum (hashing), so per-language proportions hold without a
    stratified pass.  Pure streaming map, no shuffle."""
    import numpy as np

    from .dedup import md5_upper64
    from .textstats import docs

    train_hi = 100 - val_pct - test_pct
    val_hi = 100 - test_pct

    def stamp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = np.fromiter((md5_upper64(str(i).encode()) % 100 for i in ids),
                        dtype=np.int64, count=len(ids))
        split = np.where(h < train_hi, "train",
                         np.where(h < val_hi, "val", "test"))
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "split": pa.array(split.tolist(), pa.string())})

    return docs(sf_dir, columns=("doc_id", "lang")).map_batches(
        stamp, batch_format="pyarrow")


def gate_funnel(sf_dir: str, min_words: int = 20, lang: str = "en",
                threshold: float = 0.8) -> pa.Table:
    """(gate, n_docs): the cleaning-pipeline FUNNEL — how many documents
    survive each successive clean_corpus gate (0 = all, 1 = ≥ min_words
    tokens, 2 = + predicted language, 3 = + exact-dedup winner,
    4 = + near-dup cluster winner).  The observability table every
    production corpus pipeline reports next to its output.

    Scale shape: gates 0–2 are distributed flag sums over the MEMOIZED
    :func:`_gate_flags` table — the single actor-pool text pass shared
    with clean_corpus, so in a suite run the langid+tokenize scan
    happens once across both consumers and only 3 count rows ever
    reach the driver; gates 3–4 count the id-sized winner tables
    through the SAME ``_exact_winners``/``_cluster_winners`` helpers
    clean_corpus runs, so the funnel cannot drift from the pipeline it
    observes; the winner table materializes once (count + join reuse
    the blocks)."""
    import pyarrow.compute as pc

    flags = _gate_flags(sf_dir, min_words, lang)

    def count_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "p_all": pa.array([t.num_rows], pa.int64()),
            "p_len": pa.array([int(pc.sum(t["len_ok"]).as_py() or 0)],
                              pa.int64()),
            "p_both": pa.array([int(pc.sum(t["both_ok"]).as_py() or 0)],
                               pa.int64())})

    gc = hash_agg(flags.map_batches(count_partial, batch_format="pyarrow"),
                  "k", [("p_all", "sum", "n_all"),
                        ("p_len", "sum", "n_len"),
                        ("p_both", "sum", "n_both")],
                  small=True).take_all()[0]
    n_all, n_len, n_both = gc["n_all"], gc["n_len"], gc["n_both"]

    kept = flags.map_batches(
        lambda t: t.filter(pc.equal(t["both_ok"], 1))
        .select(["doc_id", "text_hash"]), batch_format="pyarrow")
    exact_winners = _exact_winners(kept).materialize()
    n_exact = exact_winners.count()
    n_final = _cluster_winners(exact_winners, sf_dir, threshold).count()
    return pa.table({"gate": pa.array([0, 1, 2, 3, 4], pa.int64()),
                     "n_docs": pa.array([n_all, n_len, n_both, n_exact,
                                         n_final], pa.int64())})


def clean_text_corpus(sf_dir: str, min_words: int = 20, lang: str = "en",
                      threshold: float = 0.8, k: int = 20) -> rd.Dataset:
    """(doc_id, clean_text, n_tokens_clean): THE DELIVERABLE — the
    clean_corpus survivor set joined with its boilerplate-stripped text,
    i.e. exactly the rows a tokenizer consumes after the full
    quality → language → exact-dedup → near-dup → C4-strip composition.

    Scale shape: the survivor table is id-sized (memoized gates +
    winner reduces); the strip pass streams the corpus once (k-hash
    broadcast); one doc_id-co-partitioned join ships each surviving
    doc's cleaned text exactly once — the unavoidable text movement of
    materializing the output corpus, and nothing more."""
    import pyarrow.compute as pc

    surv = clean_corpus(sf_dir, min_words, lang, threshold).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    stripped = strip_boilerplate(sf_dir, k)
    j = hash_join(surv, stripped, on="doc_id",
                  left_cols={},
                  right_cols={"clean_text": pa.string(),
                              "n_dropped": pa.int64()})

    def finish(t: pa.Table) -> pa.Table:
        n = pa.array([len(TOKEN_RE.findall(s))
                      for s in t["clean_text"].to_pylist()], pa.int64())
        return pa.table({"doc_id": t["doc_id"],
                         "clean_text": t["clean_text"],
                         "n_tokens_clean": n})

    return j.map_batches(finish, batch_format="pyarrow")


def strip_boilerplate(sf_dir: str, k: int = 20,
                      chunk_tokens: int = 10) -> rd.Dataset:
    """(doc_id, clean_text, n_dropped): every document with its top-``k``
    boilerplate chunks removed — the APPLY step of the C4 common-lines
    pass (:func:`dedup.boilerplate_chunks` is the MINE step).  Chunks are
    the same fixed ``chunk_tokens``-token windows; surviving chunks
    rejoin with single spaces in document order, so the output is the
    deterministic cleaned corpus a tokenizer consumes next.

    Scale shape: the k boilerplate hashes broadcast (k-sized, computed
    once by the mine step's hash-only exchange); the strip itself is ONE
    streaming map_batches over the corpus — no shuffle, text leaves a
    task only as its own cleaned output."""
    from .dedup import boilerplate_chunks

    bp = set(boilerplate_chunks(sf_dir, k, chunk_tokens)["chunk_hash"]
             .to_pylist())
    bp_ref = ray.put(bp)

    def strip(t: pa.Table) -> pa.Table:
        drop = ray.get(bp_ref)
        ids, outs, nd = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = TOKEN_RE.findall(s)
            keep, dropped = [], 0
            for j in range(0, len(toks), chunk_tokens):
                c = " ".join(toks[j:j + chunk_tokens])
                if hashlib.md5(c.encode()).hexdigest() in drop:
                    dropped += 1
                else:
                    keep.append(c)
            ids.append(did)
            outs.append(" ".join(keep))
            nd.append(dropped)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "clean_text": pa.array(outs, pa.string()),
                         "n_dropped": pa.array(nd, pa.int64())})

    return docs(sf_dir).map_batches(strip, batch_format="pyarrow")
