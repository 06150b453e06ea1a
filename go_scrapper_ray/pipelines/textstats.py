"""Text-analysis operators over the ``documents`` table — the training-data
additions a 100 TB webtext pipeline needs on top of the reference's crawl
(language-ID, quality scoring, token counting, fingerprinting).

All stages are ``map_batches`` with vectorized bodies (pyarrow.compute where
the kernel exists, numpy/pandas otherwise); columns are pruned at the read;
aggregations pre-combine per batch before any groupby shuffle."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TOKEN_RE = re.compile(r"\S+")
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")
DIGIT_RE = re.compile(r"[0-9]")
# a BPE-ish pre-tokenizer split (GPT-2 style word/number/punct classes)
BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------- token count

def token_count(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_bpeish): whitespace tokens + a BPE-ish regex
    pre-token count (word/number/punct classes)."""

    def kernel(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_ws = [len(TOKEN_RE.findall(s)) for s in texts]
        n_bpe = [len(BPEISH_RE.findall(s)) for s in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_ws, pa.int64()),
            "n_bpeish": pa.array(n_bpe, pa.int64()),
        })

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------------------- quality scores

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")


def quality(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, n_words, n_punct, n_digits, n_stopwords) —
    integer-valued quality features (length / punctuation / digit /
    stopword-ratio numerators; ints keep the DuckDB oracle comparison
    exact)."""
    sw = frozenset(STOPWORDS)

    def kernel(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = [TOKEN_RE.findall(s) for s in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            "n_words": pa.array([len(ts) for ts in toks], pa.int64()),
            "n_punct": pa.array([len(PUNCT_RE.findall(s)) for s in texts], pa.int64()),
            "n_digits": pa.array([len(DIGIT_RE.findall(s)) for s in texts], pa.int64()),
            "n_stopwords": pa.array(
                [sum(1 for w in ts if w.lower() in sw) for ts in toks],
                pa.int64()),
        })

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------------------------ lang dist

def lang_dist(sf_dir: str) -> rd.Dataset:
    """(lang, n): pre-aggregated per batch, then a tiny groupby — the
    combiner-before-shuffle pattern (ray_guide 'Aggregation at scale')."""

    def partial(t: pa.Table) -> pa.Table:
        counts = t.group_by("lang").aggregate([("lang", "count")])
        return counts.rename_columns(["lang", "partial_n"])

    from ray.data.aggregate import Sum
    return (docs(sf_dir, columns=("lang",))
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang").aggregate(Sum("partial_n", alias_name="n")))


# ---------------------------------------------------------------- fingerprint

def fingerprint_md5(sf_dir: str) -> rd.Dataset:
    """(doc_id, fp): md5 content fingerprint (SQL-checkable vs DuckDB md5)."""

    def kernel(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fp": pa.array(fps, pa.string())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# ----------------------------------------------------------------- repetition

def repetition(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_lines, n_dup_lines, top_line_n): Gopher-style repetition
    features (Rae et al. 2021 §A1.1 "repetitious text" filters) over
    NON-EMPTY lines — integer numerators so the DuckDB oracle comparison is
    exact (a dedup pipeline thresholds n_dup_lines/n_lines)."""
    from collections import Counter

    def kernel(t: pa.Table) -> pa.Table:
        n_lines, n_dup, top = [], [], []
        for s in t["text"].to_pylist():
            c = Counter(l for l in s.split("\n") if l)
            n = sum(c.values())
            n_lines.append(n)
            n_dup.append(n - len(c))
            top.append(max(c.values()) if c else 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_dup_lines": pa.array(n_dup, pa.int64()),
            "top_line_n": pa.array(top, pa.int64()),
        })

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# --------------------------------------------------------------- source rollup

def source_rollup(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, total_chars): per-domain corpus rollup (the C4 /
    RefinedWeb per-domain accounting step) — combiner-before-shuffle: each
    batch pre-aggregates, the groupby shuffles only source-cardinality
    rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("source", "count"), ("n_chars", "sum")])
        return g.rename_columns(["source", "p_docs", "p_chars"])

    return (docs(sf_dir, columns=("source", "n_chars"))
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("p_docs", alias_name="n_docs"),
                       Sum("p_chars", alias_name="total_chars")))


WINNOW_B = 65599          # k-gram hash base (codepoint polynomial)
WINNOW_M = (1 << 31) - 1  # modulus: keeps k-term int64 sums overflow-free


def fingerprint_winnow(sf_dir: str, k: int = 5, w: int = 8) -> rd.Dataset:
    """(doc_id, winnow_fp): winnowing document fingerprint (Schleimer et al.,
    SIGMOD 2003): polynomial hash over CODEPOINT k-grams
    (sum cp[i+j]*B^(k-1-j) mod M), min per window of w consecutive k-grams,
    fingerprint = XOR of the distinct selected minima (order-free fold).

    Every step is SQL-expressible (positions via generate_series, ``ascii``
    codepoints, windowed ``min ... ROWS FOLLOWING``, ``bit_xor(DISTINCT)``)
    — see the docs_winnow_fp oracle.  The kernel itself is numpy: one
    correlate + sliding_window_view per doc, no per-char Python."""

    pows = np.array([pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)],
                    dtype=np.int64)

    def kernel(t: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view
        out = []
        for s in t["text"].to_pylist():
            cps = np.frombuffer(s.encode("utf-32-le"), np.uint32) \
                .astype(np.int64)
            if len(cps) < k:
                out.append(0)
                continue
            # h[i] = sum_j cp[i+j] * B^(k-1-j) mod M  (cp < 2^21, pow < 2^31,
            # k terms: sums < 2^55 — int64-safe)
            # correlate(a, v)[i] = sum_j a[i+j]*v[j] (no kernel reversal)
            h = np.correlate(cps, pows) % WINNOW_M
            if len(h) <= w:
                mins = np.array([h.min()], dtype=np.int64)
            else:
                mins = sliding_window_view(h, w).min(axis=1)
            out.append(int(np.bitwise_xor.reduce(np.unique(mins))))
        return pa.table({"doc_id": t["doc_id"],
                         "winnow_fp": pa.array(out, pa.uint64())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# -------------------------------------------------------------------- lang id

# tiny seeded char-trigram profiles for a 5-language heuristic; deterministic,
# self-contained (no external models in the sandbox)
_LANG_MARKERS = {
    "en": ["the ", " and ", "ing ", " of "],
    "de": ["der ", " und ", "sch", "ein"],
    "fr": [" le ", " de ", "eau", " les "],
    "es": [" el ", " de ", "ción", " los "],
    "zh": ["的", "是", "了", "在"],
}


class LangIdStage:
    """Callable-class stage (actor pool when concurrency is set): marker
    tables built once per actor in __init__, scored per batch.

    Fully vectorized: one ``pc.count_substring`` per marker over the whole
    batch (non-overlapping counts — same semantics as ``str.count``), argmax
    across languages (first-max wins = the declared language order, matching
    the old per-row loop's tie behavior)."""

    def __init__(self):
        self.langs = list(_LANG_MARKERS)
        self.markers = {lang: [m.lower() for m in ms]
                        for lang, ms in _LANG_MARKERS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        scores = np.zeros((len(self.langs), len(t)), dtype=np.int64)
        for i, lang in enumerate(self.langs):
            for m in self.markers[lang]:
                scores[i] += pc.count_substring(low, pattern=m) \
                    .to_numpy(zero_copy_only=False)
        best = np.argmax(scores, axis=0)  # first max wins (lang order)
        preds = np.array(self.langs, dtype=object)[best]
        return pa.table({"doc_id": t["doc_id"],
                         "pred_lang": pa.array(preds, pa.string())})


def langid(sf_dir: str, concurrency: int = 4) -> rd.Dataset:
    # autoscaling pool (min 1): a FIXED pool of `concurrency` 1-CPU actors
    # can reserve every cluster CPU and starve the upstream read task
    # (deadlock on small clusters); (1, N) keeps headroom
    return docs(sf_dir).map_batches(LangIdStage, batch_format="pyarrow",
                                    concurrency=(1, concurrency), num_cpus=1)
