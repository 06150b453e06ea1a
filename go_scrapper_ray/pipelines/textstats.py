"""Text-analysis operators over the ``documents`` table — the training-data
additions a 100 TB webtext pipeline needs on top of the reference's crawl
(language-ID, quality scoring, token counting, fingerprinting).

All stages are ``map_batches`` with vectorized bodies (pyarrow.compute where
the kernel exists, numpy/pandas otherwise); columns are pruned at the read;
aggregations pre-combine per batch before any groupby shuffle.

Tokenization convention (applies to every oracle-twinned text op here and
in dedup.py): Python ``str.split()`` / ``\S+`` vs DuckDB's RE2 ``\S+``
agree on ASCII whitespace only — Python treats U+00A0/U+2028/etc. as
separators, RE2 does not.  The synthetic corpus is ASCII-whitespace, so
the strict-hash parity holds; a corpus with Unicode whitespace would need
the twins to spell the separator class explicitly (documented convention,
not a silent assumption)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..agg import hash_agg, hash_join, partition_ids, topk


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

    return hash_agg(docs(sf_dir, columns=("lang",))
                    .map_batches(partial, batch_format="pyarrow"),
                    "lang", [("partial_n", "sum", "n")], small=True)


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
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("source", "count"), ("n_chars", "sum")])
        return g.rename_columns(["source", "p_docs", "p_chars"])

    return hash_agg(docs(sf_dir, columns=("source", "n_chars"))
                    .map_batches(partial, batch_format="pyarrow"),
                    "source", [("p_docs", "sum", "n_docs"),
                               ("p_chars", "sum", "total_chars")], small=True)


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


# ------------------------------------------------------------------ PII scrub

# RE2-compatible patterns (identical leftmost non-overlapping semantics in
# Python `re` and DuckDB's RE2, which the oracle relies on)
URL_RE = re.compile(r"https?://[^\s]+")
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
IPV4_RE = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")


def pii_suffix(doc_id: int) -> str:
    """Deterministic doc_id-derived PII text appended before scrubbing (the
    synthetic corpus has no organic PII; this makes the kernel non-trivially
    checkable, same device as the url_canonicalize query)."""
    return (f" Contact u{doc_id}@mail-{doc_id % 7}.example.com or"
            f" https://host-{doc_id % 13}.example.org/p/{doc_id}?s=1"
            f" at 10.{doc_id % 200}.{doc_id % 100}.{doc_id % 50} now")


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """(doc_id, clean_text, n_urls, n_emails, n_ips): redaction pass a
    training corpus runs before tokenization — URLs, then emails, then bare
    IPv4s replaced by placeholder tokens, with per-doc match counts.
    Replacement ORDER is part of the contract (a URL may contain an
    email-shaped userinfo part; scrubbing URLs first prevents double counts)
    and is replicated in the SQL oracle by nested regexp_replace."""

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        n_urls, n_emails, n_ips, out = [], [], [], []
        for i, s in zip(ids, t["text"].to_pylist()):
            s = s + pii_suffix(i)
            s, nu = URL_RE.subn("<URL>", s)
            s, ne = EMAIL_RE.subn("<EMAIL>", s)
            s, ni = IPV4_RE.subn("<IP>", s)
            n_urls.append(nu)
            n_emails.append(ne)
            n_ips.append(ni)
            out.append(s)
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": pa.array(out, pa.string()),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_emails": pa.array(n_emails, pa.int64()),
            "n_ips": pa.array(n_ips, pa.int64()),
        })

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# -------------------------------------------------------------- Gopher rules

ALPHA_RE = re.compile(r"[A-Za-z]")


def gopher_quality(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, sum_word_len, n_alpha_words, n_stop_hits, keep):
    Gopher quality rules (Rae et al. 2021, Table A1) with INTEGER numerators
    so the DuckDB comparison is exact — keep =
      50 <= n_words <= 100000
      AND 3*n_words <= sum_word_len <= 10*n_words   (mean word length 3..10)
      AND 5*n_alpha_words >= 4*n_words              (>=80% words alphabetic)
      AND n_stop_hits >= 2                          (stopword presence)
    """
    sw = frozenset(STOPWORDS)

    def kernel(t: pa.Table) -> pa.Table:
        n_words, sum_len, n_alpha, n_stop = [], [], [], []
        for s in t["text"].to_pylist():
            toks = TOKEN_RE.findall(s)
            n_words.append(len(toks))
            sum_len.append(sum(len(w) for w in toks))
            n_alpha.append(sum(1 for w in toks if ALPHA_RE.search(w)))
            n_stop.append(sum(1 for w in toks if w.lower() in sw))
        nw = np.asarray(n_words, dtype=np.int64)
        sl = np.asarray(sum_len, dtype=np.int64)
        na = np.asarray(n_alpha, dtype=np.int64)
        ns = np.asarray(n_stop, dtype=np.int64)
        keep = ((nw >= 50) & (nw <= 100_000)
                & (3 * nw <= sl) & (sl <= 10 * nw)
                & (5 * na >= 4 * nw) & (ns >= 2))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(nw, pa.int64()),
            "sum_word_len": pa.array(sl, pa.int64()),
            "n_alpha_words": pa.array(na, pa.int64()),
            "n_stop_hits": pa.array(ns, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------------------- top-k n-grams

def topk_ngrams(sf_dir: str, k: int = 100) -> rd.Dataset:
    """(gram, n): corpus-wide top-k token bigrams — the vocabulary/contamin-
    ation audit step of a training pipeline.  Per-batch Counter partials
    (combiner-before-shuffle: at 100 TB the shuffle carries only
    vocab²-bounded partial rows per batch, not one row per token), then a
    gram-keyed groupby sum and a global (n desc, gram asc) top-k on the
    small aggregate."""
    from collections import Counter

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            toks = s.lower().split()
            c.update(map(" ".join, zip(toks, toks[1:])))
        return pa.table({"gram": pa.array(list(c.keys()), pa.string()),
                         "p_n": pa.array(list(c.values()), pa.int64())})


    agg = hash_agg(docs(sf_dir).map_batches(partial,
                                            batch_format="pyarrow"),
                   "gram", [("p_n", "sum", "n")])
    return topk(agg, [("n", "descending"), ("gram", "ascending")], k)


def langid(sf_dir: str, concurrency: int = 12) -> rd.Dataset:
    # autoscaling pool (min 1): a FIXED pool of `concurrency` 1-CPU actors
    # can reserve every cluster CPU and starve the upstream read task
    # (deadlock on small clusters); (1, N) keeps headroom
    return docs(sf_dir).map_batches(LangIdStage, batch_format="pyarrow",
                                    concurrency=(1, concurrency), num_cpus=1)

# -------------------------------------------------------------- normalization

# re.ASCII: RE2 (the DuckDB oracle's engine) treats \s as ASCII-only
NONALNUM_RE = re.compile(r"[^a-z0-9\s]", re.ASCII)
WS_RE = re.compile(r"\s+", re.ASCII)


def normalize(sf_dir: str) -> rd.Dataset:
    """(doc_id, norm_text, n_chars_norm): canonical text normalization —
    lowercase, strip non-alphanumerics to spaces, collapse whitespace, trim.
    The pre-tokenization cleanup pass of a training pipeline; pure per-batch
    map, no shuffle."""

    def kernel(t: pa.Table) -> pa.Table:
        out = []
        for s in t["text"].to_pylist():
            s = NONALNUM_RE.sub(" ", s.lower())
            s = WS_RE.sub(" ", s).strip(" ")  # DuckDB trim = spaces only
            out.append(s)
        arr = pa.array(out, pa.string())
        return pa.table({"doc_id": t["doc_id"],
                         "norm_text": arr,
                         "n_chars_norm": pc.utf8_length(arr).cast(pa.int64())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------------- deterministic sample

def sample_stratified(sf_dir: str, mod: int = 10, keep: int = 0,
                      ) -> rd.Dataset:
    """(doc_id, lang): deterministic hash-mod sample (md5_number_upper of the
    decimal doc_id, mod ``mod``) — the reproducible subsampling every corpus
    ablation needs.  Unlike ``ds.random_sample`` this is stable across runs,
    cluster widths and block orders; stratification is implicit (hashing is
    uniform within every stratum).  Pure filter, no shuffle."""
    from .dedup import md5_upper64

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        m = np.fromiter((md5_upper64(str(i).encode()) % mod == keep
                         for i in ids), dtype=bool, count=len(ids))
        return t.filter(pa.array(m))

    return (docs(sf_dir, columns=("doc_id", "lang"))
            .map_batches(kernel, batch_format="pyarrow"))


def mixture_quota(sf_dir: str, per_source: int = 50,
                  batch_size: int | None = None) -> rd.Dataset:
    """(doc_id, source): deterministic per-source QUOTA sample — the
    mixture-construction primitive (pick exactly K docs per source for a
    training mix), complementing ``sample_stratified``'s fixed RATE.

    The quota is the K smallest (md5_upper64(doc_id), doc_id) per source —
    uniform within each stratum yet stable across runs, cluster widths and
    block orders.  Scale shape: a per-batch partial top-K per source (each
    batch forwards at most K x n_sources id-sized rows — a combiner, the
    text never moves), then one tiny groupby(source) over partials whose
    total size is O(blocks x K x sources), independent of corpus rows."""
    import pandas as pd

    from .dedup import md5_upper64

    k = per_source

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["h"] = np.fromiter(
            (md5_upper64(str(i).encode()) for i in df["doc_id"]),
            dtype=np.uint64, count=len(df))
        df = (df.sort_values(["source", "h", "doc_id"])
                .groupby("source", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k)
        return g[["doc_id", "source"]]

    kw = {"batch_size": batch_size} if batch_size else {}
    return (docs(sf_dir, columns=("doc_id", "source"))
            .map_batches(partial, batch_format="pyarrow", **kw)
            .groupby("source").map_groups(final, batch_format="pandas"))


# ----------------------------------------------------------- exact quantiles

QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def length_quantiles(sf_dir: str) -> pa.Table:
    """(q_milli, n_tokens): EXACT corpus-wide token-count quantiles
    (DuckDB quantile_disc semantics: value at index ceil(q*n)-1 of the
    sorted multiset).  Scale shape: per-batch (n_tokens -> count)
    histogram partials, one groupby on n_tokens (distinct token counts
    ~O(10^4) regardless of corpus size), then the quantile walk happens
    driver-side on that tiny histogram — exact without a global sort."""
    def partial(t: pa.Table) -> pa.Table:
        n = pa.array([len(TOKEN_RE.findall(s))
                      for s in t["text"].to_pylist()], pa.int64())
        g = pa.table({"n": n, "one": pa.array([1] * len(n), pa.int64())}
                     ).group_by("n").aggregate([("one", "sum")])
        return g.rename_columns(["n", "p_cnt"])

    hist = (hash_agg(docs(sf_dir, columns=("text",))
                     .map_batches(partial, batch_format="pyarrow"),
                     "n", [("p_cnt", "sum", "cnt")], small=True)
            .sort("n").take_all())
    vals = np.array([r["n"] for r in hist], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    cum = np.cumsum(cnts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in QUANTILES:
        rank = max(1, int(np.ceil(q * total)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(int(round(q * 1000)))
        out_v.append(int(vals[idx]))
    return pa.table({"q_milli": pa.array(out_q, pa.int64()),
                     "n_tokens": pa.array(out_v, pa.int64())})


def doc_frequency(sf_dir: str, k: int = 200) -> rd.Dataset:
    """(token, df): corpus document-frequency table, top-k by (df desc,
    token asc) — the IDF-side build of a tf-idf / quality-weighting stage
    (distinct-per-document counting, a different class from topk_ngrams'
    raw occurrence counts).

    Scale shape: per-batch Counter over each doc's DEDUPED token set
    (combiner — the shuffle carries vocab-bounded partial rows per batch,
    never one row per (doc, token)); token-keyed groupby sum; global
    top-k on the small aggregate.  Tokenizer is lower().split(), the same
    \\S+ contract the Jaccard oracle uses."""
    from collections import Counter

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(s.lower().split()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "p_n": pa.array(list(c.values()), pa.int64())})


    agg = hash_agg(docs(sf_dir).map_batches(partial,
                                            batch_format="pyarrow"),
                   "token", [("p_n", "sum", "df")])
    return topk(agg, [("df", "descending"), ("token", "ascending")], k)


def top_terms(sf_dir: str, k: int = 3) -> rd.Dataset:
    """(doc_id, term, tf, df): each document's top-k salient terms —
    the tf-idf primitive, ranked (tf desc, df asc, term asc) so rare
    terms win frequency ties (pure integer ordering keeps the oracle
    comparison exact; a float idf weight would hash-diverge at ulps).

    Scale shape: the document-frequency side is the SAME distributed
    combiner/groupby as doc_frequency (never one row per (doc, token));
    the resulting vocab table is broadcast ONCE via ray.put and each
    scoring task maps its tokens with one vectorized index_in.  The
    broadcast is vocab-bounded, not corpus-bounded — at 100 TB you'd
    add a min_df cut (df=1 hapaxes dominate vocab but can be ranked
    locally since their df is knowably 1)."""
    import ray

    def _doc_tokens(t: pa.Table) -> tuple[pa.Array, pa.Array]:
        """Vectorized (doc_index, token) expansion: re2 \\s+ split (the
        exact complement of the oracle's regexp_extract_all '\\S+'),
        empty boundary tokens dropped — no per-row Python."""
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), r"\s+")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        return pc.filter(parent, keep), pc.filter(flat, keep)

    def df_partial(t: pa.Table) -> pa.Table:
        parent, flat = _doc_tokens(t)
        pairs = (pa.table({"d": parent, "token": flat})
                 .group_by(["d", "token"]).aggregate([]))  # batch-distinct
        g = pairs.group_by("token").aggregate([("d", "count")])
        return g.rename_columns(["token", "p_n"])

    # empty aggregate output blocks carry an EMPTY schema — drop them
    # before concat (seen at sf0.1 where the groupby emits many blocks)
    parts = [t for t in ray.get(
        hash_agg(docs(sf_dir).map_batches(df_partial,
                                          batch_format="pyarrow"),
                 "token", [("p_n", "sum", "df")])
        .to_arrow_refs()) if t.num_rows]
    df_tbl = pa.concat_tables(parts).combine_chunks()
    df_ref = ray.put(df_tbl)

    def score(t: pa.Table) -> pa.Table:
        vocab = ray.get(df_ref)  # zero-copy plasma read
        parent, flat = _doc_tokens(t)
        did_col = pc.take(t["doc_id"].combine_chunks(), parent)
        tf_tbl = (pa.table({"doc_id": did_col, "term": flat})
                  .group_by(["doc_id", "term"])
                  .aggregate([("term", "count")]))
        terms_arr = tf_tbl["term"].combine_chunks()
        df = pc.take(vocab["df"],
                     pc.index_in(terms_arr, value_set=vocab["token"]))
        df_np = df.to_numpy(zero_copy_only=False)
        tf_np = tf_tbl["term_count"].to_numpy(zero_copy_only=False)
        did_np = tf_tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms_arr.to_numpy(zero_copy_only=False),
                            df_np, -tf_np, did_np))
        # rank within each doc run, keep the first k
        did_sorted = did_np[order]
        starts = np.r_[0, np.flatnonzero(did_sorted[1:] !=
                                         did_sorted[:-1]) + 1]
        rank = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.r_[starts, len(order)]))
        keep = order[rank < k]
        return pa.table({
            "doc_id": pa.array(did_np[keep], pa.int64()),
            "term": pc.take(terms_arr, pa.array(keep, pa.int64())),
            "tf": pa.array(tf_np[keep].astype(np.int64), pa.int64()),
            "df": pa.array(df_np[keep], pa.int64())})

    return docs(sf_dir).map_batches(score, batch_format="pyarrow")


def dup_rate(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, n_unique): per-source exact-duplicate accounting —
    the curation dashboard number deciding which domain to crawl less.

    Scale shape: per-key count-distinct without carrying text — batch
    kernel hashes text to md5 and dedupes (source, fp) locally; shuffle
    (a) finishes the distinct on 16-byte keys; shuffle (b) is
    source-cardinality wide.  n_docs rides along as a Sum over the SAME
    pair rows (count of pre-dedup rows per pair), so one pass serves
    both aggregates."""
    def pair_partial(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).digest()
               for s in t["text"].to_pylist()]
        g = (pa.table({"source": t["source"],
                       "fp": pa.array(fps, pa.binary(16))})
             .group_by(["source", "fp"]).aggregate([("fp", "count")]))
        return g.rename_columns(["source", "fp", "p_n"])

    pairs = hash_agg(docs(sf_dir, columns=("source", "text"))
                     .map_batches(pair_partial, batch_format="pyarrow"),
                     ["source", "fp"], [("p_n", "sum", "n")])

    def src_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n", "sum"), ("fp", "count")])
        return g.rename_columns(["source", "p_docs", "p_uniq"])

    return hash_agg(pairs.map_batches(src_partial,
                                      batch_format="pyarrow"),
                    "source", [("p_docs", "sum", "n_docs"),
                               ("p_uniq", "sum", "n_unique")], small=True)


# ------------------------------------------------------- webtext link mining

URL_HOST_RE = re.compile(r"https?://([^/\s?#]+)")


def url_mentions(sf_dir: str) -> rd.Dataset:
    """(host, n_docs, n_mentions): outbound-link host profile of the corpus
    — the link-mining pass a webtext pipeline runs to build citation/spam
    signals.  Same deterministic ``pii_suffix`` device as pii_scrub (the
    synthetic corpus has no organic URLs).

    Scale shape: mirror of the exact count-distinct (daily_active): each
    batch dedupes (host, doc) and pre-counts mentions, the (host, doc)
    groupby is the only wide exchange (payload already one row per pair),
    then a host-cardinality rollup counts docs and sums mentions."""

    def partial(t: pa.Table) -> pa.Table:
        agg: dict[tuple[str, int], int] = {}
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for h in URL_HOST_RE.findall(s + pii_suffix(did)):
                key = (h, did)
                agg[key] = agg.get(key, 0) + 1
        return pa.table({
            "host": pa.array([k[0] for k in agg], pa.string()),
            "doc_id": pa.array([k[1] for k in agg], pa.int64()),
            "c": pa.array(list(agg.values()), pa.int64())})

    pairs = hash_agg(docs(sf_dir).map_batches(partial,
                                              batch_format="pyarrow"),
                     ["host", "doc_id"], [("c", "sum", "c")])

    def host_partial(t: pa.Table) -> pa.Table:
        g = (t.group_by("host")
             .aggregate([([], "count_all"), ("c", "sum")]))
        return g.rename_columns(["host", "p_docs", "p_m"])

    return hash_agg(pairs.map_batches(host_partial, batch_format="pyarrow"),
                    "host", [("p_docs", "sum", "n_docs"),
                             ("p_m", "sum", "n_mentions")], small=True)


# --------------------------------------------------- language confusion matrix

def lang_confusion(sf_dir: str, concurrency: int = 8) -> rd.Dataset:
    """(lang, pred_lang, n): declared-vs-predicted language confusion
    matrix — the eval rollup that decides whether the langid gate is safe
    to apply to a corpus slice.  Actor-pool langid (state in __init__),
    language²-cardinality aggregate (small=True sort-free reduce)."""

    class Stage(LangIdStage):
        def __call__(self, t: pa.Table) -> pa.Table:
            preds = LangIdStage.__call__(self, t)["pred_lang"]
            g = (pa.table({"lang": t["lang"], "pred_lang": preds})
                 .group_by(["lang", "pred_lang"])
                 .aggregate([([], "count_all")]))
            return g.rename_columns(["lang", "pred_lang", "p_n"])

    src = docs(sf_dir, columns=("doc_id", "text", "lang"))
    return hash_agg(src.map_batches(Stage, batch_format="pyarrow",
                                    concurrency=(1, concurrency), num_cpus=1),
                    ["lang", "pred_lang"], [("p_n", "sum", "n")], small=True)


# -------------------------------------------------------------------- OOV rate

def oov_rate(sf_dir: str, vocab_size: int = 100) -> rd.Dataset:
    """(doc_id, n_tokens, n_oov): per-doc out-of-vocabulary token count
    against the corpus' top-``vocab_size`` document-frequency vocabulary —
    the coverage stat that sizes a tokenizer/vocab for a corpus.

    Scale shape: pass 1 is the doc_frequency build (per-batch deduped
    Counter combine, token-keyed groupby — vocab-bounded rows, never
    (doc, token) pairs); the top-V cut (df desc, token asc — the
    deterministic tie-break the SQL twin replicates) collects only V rows
    to the driver and broadcasts a frozenset; pass 2 is one streaming
    map_batches over the corpus."""
    from collections import Counter

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(s.lower().split()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "p_df": pa.array(list(c.values()), pa.int64())})

    df = hash_agg(docs(sf_dir).map_batches(df_partial,
                                           batch_format="pyarrow"),
                  "token", [("p_df", "sum", "df")])

    top = topk(df, [("df", "descending"), ("token", "ascending")],
                vocab_size).to_pandas()
    vocab = frozenset(top["token"])
    vocab_ref = ray.put(vocab)

    def kernel(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        n_tok, n_oov = [], []
        for s in t["text"].to_pylist():
            toks = s.lower().split()
            n_tok.append(len(toks))
            n_oov.append(sum(1 for w in toks if w not in v))
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_oov": pa.array(n_oov, pa.int64())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


def surprisal(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, surprisal): integer unigram-surprisal quality
    score — Σ over token OCCURRENCES of floor(log2(N_docs / df(token))),
    the exact-arithmetic stand-in for unigram cross-entropy (CCNet-style
    LM quality filtering): rare-token-heavy documents score high, stopword
    soup scores ~0.  floor(log2) computes as bit_length-1 of the integer
    quotient — exact in Python and as strlen(bin(x))-1 in DuckDB, so the
    score is bit-reproducible at any width (no float log).

    Scale shape, size-gated (the jaccard pattern): when the vocab fits a
    broadcast budget (≤ 2^16 tokens), the token→bits dict broadcasts and
    the whole score is ONE streaming map_batches — no shuffle at all.
    Past the gate, (doc_id, token, tf) occurrence rows hash_join the
    distributed df table co-partitioned on token, then one hash_agg
    (doc_id) sums the contributions — two exchanges of id-sized rows,
    never text."""
    from collections import Counter


    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(s.lower().split()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "p_n": pa.array(list(c.values()), pa.int64())})

    src = docs(sf_dir)
    # materialize the VOCAB-SIZED aggregate once: the broadcast gate below
    # streams it, and the at-scale join path reuses the same blocks
    # instead of re-running the tokenize+aggregate over the corpus
    df_ds = hash_agg(src.map_batches(df_partial, batch_format="pyarrow"),
                     "token", [("p_n", "sum", "df")]).materialize()
    n_docs = src.count()

    def _bits_of(df: int) -> int:
        return (int(n_docs) // int(df)).bit_length() - 1

    # ---- FAST PATH: vocab-sized broadcast → single streaming pass
    vocab_bits: dict[str, int] = {}
    over_gate = False
    for t in df_ds.iter_batches(batch_format="pyarrow"):
        for w, d in zip(t["token"].to_pylist(), t["df"].to_pylist()):
            vocab_bits[w] = _bits_of(d)
        if len(vocab_bits) > (1 << 16):
            over_gate = True
            break
    if not over_gate:
        import ray as _ray
        vb_ref = _ray.put(vocab_bits)

        def score_direct(t: pa.Table) -> pa.Table:
            vb = _ray.get(vb_ref)
            ids, ntok, sur = [], [], []
            for did, s in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist()):
                ws = s.lower().split()
                if not ws:
                    continue
                ids.append(did)
                ntok.append(len(ws))
                sur.append(sum(vb[w] for w in ws))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_tokens": pa.array(ntok, pa.int64()),
                             "surprisal": pa.array(sur, pa.int64())})

        return src.map_batches(score_direct, batch_format="pyarrow")

    # ---- AT SCALE: token-co-partitioned join + doc-keyed aggregate
    def tf_rows(t: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w, n in Counter(s.lower().split()).items():
                ids.append(did)
                toks.append(w)
                tfs.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    joined = hash_join(src.map_batches(tf_rows, batch_format="pyarrow"),
                       df_ds, on="token",
                       left_cols={"doc_id": pa.int64(), "tf": pa.int64()},
                       right_cols={"df": pa.int64()})

    def contrib(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        # exact bit_length over the (few) UNIQUE df values, then gather —
        # float log2 would be wrong at exact powers of two
        uq, inv = np.unique(dfv, return_inverse=True)
        ub = np.fromiter((_bits_of(d) for d in uq),
                         dtype=np.int64, count=len(uq))
        bits = ub[inv]
        return pa.table({"doc_id": t["doc_id"],
                         "p_tok": pa.array(tf, pa.int64()),
                         "p_sur": pa.array(tf * bits, pa.int64())})

    return hash_agg(joined.map_batches(contrib, batch_format="pyarrow"),
                    "doc_id", [("p_tok", "sum", "n_tokens"),
                               ("p_sur", "sum", "surprisal")])


# ------------------------------------------------- BPE first-merge pair table

def bpe_pair_counts(sf_dir: str, k: int = 50) -> rd.Dataset:
    """(pair, n): corpus-wide adjacent-CHARACTER-pair counts inside
    lowercased whitespace tokens, top-k by (n desc, pair asc) — the
    first-iteration merge table of BPE tokenizer training (Sennrich et
    al. 2016): the highest-count pair is the first merge a tokenizer
    fit on this corpus would learn.

    Scale shape: per-batch Counter partials (combiner-before-shuffle —
    the exchange carries alphabet²-bounded rows per batch, never one row
    per character), token-keyed hash_agg, then the exact per-block topk
    reduce.  Tokenizer is lower() + \\S+, the corpus-wide convention the
    n-gram twins use."""
    from collections import Counter


    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            for tok in s.lower().split():
                c.update(a + b for a, b in zip(tok, tok[1:]))
        return pa.table({"pair": pa.array(list(c.keys()), pa.string()),
                         "p_n": pa.array(list(c.values()), pa.int64())})

    agg = hash_agg(docs(sf_dir).map_batches(partial,
                                            batch_format="pyarrow"),
                   "pair", [("p_n", "sum", "n")])
    return topk(agg, [("n", "descending"), ("pair", "ascending")], k)


# ------------------------------------------- per-language length outlier gate

def length_outliers(sf_dir: str, lo_q: float = 0.25,
                    hi_q: float = 0.9) -> rd.Dataset:
    """(doc_id, lang, n_tokens, outlier): per-LANGUAGE exact token-count
    quantile gates — flag every document shorter than its language's
    ``lo_q`` quantile or longer than its ``hi_q`` quantile (quantile_disc
    semantics, the ``length_quantiles`` convention).  The
    language-stratified length filter of a multilingual corpus pipeline:
    one global threshold over-prunes compact-script languages.

    Scale shape: ONE tokenize pass materializes a (doc_id, lang,
    n_tokens) table (~24 bytes/doc, spillable — the full-text regex scan
    is the dominant cost and is paid once, not once per consumer);
    per-batch (lang, n_tokens) histogram partials over it → one bounded
    groupby (languages × distinct lengths ~O(10^5) regardless of corpus
    size) → the quantile walk runs driver-side on that tiny histogram →
    thresholds broadcast (language-count-sized) → one streaming flag
    pass over the SAME counted table.  No sort, no per-doc shuffle."""
    counted = docs(sf_dir, columns=("doc_id", "lang", "text")).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "n_tokens": pa.array([len(TOKEN_RE.findall(s))
                                  for s in t["text"].to_pylist()],
                                 pa.int64())}),
        batch_format="pyarrow").materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t["lang"], "n": t["n_tokens"],
                       "one": pa.array([1] * len(t), pa.int64())})
             .group_by(["lang", "n"]).aggregate([("one", "sum")]))
        return g.rename_columns(["lang", "n", "p_cnt"])

    hist = (hash_agg(counted.map_batches(hist_partial,
                                         batch_format="pyarrow"),
                     ["lang", "n"], [("p_cnt", "sum", "cnt")], small=True)
            .take_all())
    from collections import defaultdict
    per: dict[str, list] = defaultdict(list)
    for r in hist:
        per[r["lang"]].append((r["n"], r["cnt"]))
    th: dict[str, tuple[int, int]] = {}
    for lang, rows in per.items():
        rows.sort()
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        cum = np.cumsum(np.array([c for _, c in rows], dtype=np.int64))
        total = int(cum[-1])

        def q_at(q: float) -> int:
            rank = max(1, int(np.ceil(q * total)))
            return int(vals[int(np.searchsorted(cum, rank, side="left"))])

        th[lang] = (q_at(lo_q), q_at(hi_q))
    th_ref = ray.put(th)

    def flag(t: pa.Table) -> pa.Table:
        m = ray.get(th_ref)
        langs = t["lang"].to_pylist()
        ns = t["n_tokens"].to_numpy(zero_copy_only=False)
        lo = np.fromiter((m[lg][0] for lg in langs), np.int64, len(langs))
        hi = np.fromiter((m[lg][1] for lg in langs), np.int64, len(langs))
        return pa.table({"doc_id": t["doc_id"],
                         "lang": t["lang"],
                         "n_tokens": t["n_tokens"],
                         "outlier": pa.array((ns < lo) | (ns > hi))})

    return counted.map_batches(flag, batch_format="pyarrow")


# --------------------------------------------------------- topic clustering

def topic_clusters(sf_dir: str, n_clusters: int = 8, dim: int = 64,
                   iters: int = 6) -> rd.Dataset:
    """(doc_id, cluster_id): corpus TOPIC CLUSTERING — feature-hashed
    bag-of-words (exact integer token counts scattered into
    ``md5_upper64(token) % dim`` buckets) fed into the shared
    FULL-CORPUS distributed integer k-means
    (``similarity._kmeans_dist_core``).  The text → vector → cluster
    composition a corpus pipeline runs for mixture balancing / domain
    tagging, end-to-end SQL-checked (the twin unrolls the same
    iterations over the same hashed counts; empty documents carry a
    zero vector and land in cluster 0 by the deterministic tie-break).

    Scale shape: one featurize pass (dim × 8 bytes per doc, materialized
    in the spillable object store — the text never enters the fit), then
    iters+2 scans with (n_clusters × dim) exchange width each."""
    from .dedup import md5_upper64
    from .similarity import _kmeans_dist_core

    def featurize(t: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            vec = np.zeros(dim, np.int64)
            for w in TOKEN_RE.findall(s.lower()):
                vec[md5_upper64(w.encode()) % dim] += 1
            ids.append(did)
            blobs.append(vec.tobytes())
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "q": pa.array(blobs, pa.binary())})

    from .dedup import _MEMO, _memo_key

    key = _memo_key("topic_clusters", sf_dir, n_clusters, dim, iters)
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    feat = docs(sf_dir).map_batches(featurize,
                                    batch_format="pyarrow").materialize()
    _C, assigned = _kmeans_dist_core(feat, n_clusters, iters)
    out = assigned.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow").materialize()
    _MEMO[key] = out
    return out


def heaps_stats(sf_dir: str) -> rd.Dataset:
    """One row (n_docs, sum_len, sum_types, sum_len_sq, sum_types_sq,
    sum_len_types): the EXACT integer sufficient statistics of the
    corpus' length-vs-vocabulary relationship (len = token occurrences,
    types = distinct tokens per doc) — everything a Heaps'-law /
    type-token-ratio fit or a Pearson correlation needs, without ever
    shipping per-doc rows to the driver.

    Scale shape: the canonical one-pass sufficient-statistics reduce —
    per-batch partial sums (ONE row per batch) into a single tiny
    coalesced aggregate; at any corpus size the exchange is
    O(n_batches) rows of six ints."""

    def partial(t: pa.Table) -> pa.Table:
        n = ln = ty = l2 = t2 = lt = 0
        for s in t["text"].to_pylist():
            toks = TOKEN_RE.findall(s.lower())
            a, b = len(toks), len(set(toks))
            n += 1
            ln += a
            ty += b
            l2 += a * a
            t2 += b * b
            lt += a * b
        return pa.table({"k": pa.array([0], pa.int64()),
                         "p_n": pa.array([n], pa.int64()),
                         "p_l": pa.array([ln], pa.int64()),
                         "p_t": pa.array([ty], pa.int64()),
                         "p_l2": pa.array([l2], pa.int64()),
                         "p_t2": pa.array([t2], pa.int64()),
                         "p_lt": pa.array([lt], pa.int64())})

    out = hash_agg(docs(sf_dir).map_batches(partial,
                                            batch_format="pyarrow"),
                   "k", [("p_n", "sum", "n_docs"),
                         ("p_l", "sum", "sum_len"),
                         ("p_t", "sum", "sum_types"),
                         ("p_l2", "sum", "sum_len_sq"),
                         ("p_t2", "sum", "sum_types_sq"),
                         ("p_lt", "sum", "sum_len_types")], small=True)
    return out.map_batches(lambda t: t.drop_columns(["k"]),
                           batch_format="pyarrow")


def knn_text(sf_dir: str, k: int = 5, query_stride: int = 10,
             dim: int = 64) -> rd.Dataset:
    """(query_id, rnk, neighbor_id): exact cosine top-k BETWEEN DOCUMENTS
    in feature-hashed bag-of-words space (md5_upper64(token) % dim exact
    integer counts — the topic_clusters featurization) for every
    ``query_stride``-th doc_id, self excluded — the text near-neighbor
    search a corpus pipeline runs for dedup triage and retrieval QA
    without an embedding model.  Ranking is the BIT-EXACT integer
    rational key (similarity._rational_key) over the integer count
    vectors (they are already exact ints — no quantization step), so the
    full ranked output is strict-hash SQL-checked.

    Scale shape: the query matrix is broadcast (n/query_stride × dim
    int64 — bounded); the corpus featurizes and streams through one
    map_batches with a vectorized integer matmul + float prefilter with
    a provable margin (the knn_bruteforce pattern); the per-query merge
    ranks exactly."""
    from .dedup import md5_upper64
    from .similarity import _KEY_MIN, _rank_exact, _rational_key

    def featurize(t: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            vec = np.zeros(dim, np.int64)
            for w in TOKEN_RE.findall(s.lower()):
                vec[md5_upper64(w.encode()) % dim] += 1
            ids.append(did)
            blobs.append(vec.tobytes())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "q": pa.array(blobs, pa.binary())})

    feat = docs(sf_dir).map_batches(featurize,
                                    batch_format="pyarrow").materialize()

    # query matrix: every stride-th doc, driver state bounded by n/stride
    ids_l, blobs = [], []
    for t in feat.iter_batches(batch_format="pyarrow"):
        d_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = d_ids % query_stride == 0
        ids_l.append(d_ids[m])
        for i in np.flatnonzero(m):
            blobs.append(t["q"][int(i)].as_py())
    q_ids = (np.concatenate(ids_l).astype(np.int64)
             if ids_l else np.empty(0, np.int64))
    if len(q_ids) == 0:
        from .similarity import _empty_knn
        return _empty_knn()
    Qm = np.frombuffer(b"".join(blobs), np.int64).reshape(len(q_ids), dim)
    o = np.argsort(q_ids)
    q_ids, Qm = q_ids[o], np.ascontiguousarray(Qm[o])
    qn = np.linalg.norm(Qm.astype(np.float64), axis=1)
    qn[qn == 0] = 1.0
    Qf = Qm.astype(np.float64) / qn[:, None]
    q_ref = ray.put((q_ids, Qf, Qm))

    def batch_topk(t: pa.Table) -> pa.Table:
        qi_ids, qF, qQ = ray.get(q_ref)
        c_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(c_ids)
        Cq = np.frombuffer(b"".join(t["q"].to_pylist()),
                           np.int64).reshape(n, dim)
        cssq = np.einsum("ij,ij->i", Cq, Cq)
        cn = np.sqrt(cssq.astype(np.float64))
        cn[cn == 0] = 1.0
        sims = qF @ (Cq.astype(np.float64) / cn[:, None]).T
        self_mask = qi_ids[:, None] == c_ids[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1])
        thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
        rows_q, rows_n, rows_d, rows_s = [], [], [], []
        for qi in range(sims.shape[0]):
            sel = np.flatnonzero(sims[qi] >= thresh[qi] - 1e-9)
            sel = sel[sims[qi, sel] > -np.inf]
            d_sel = Cq[sel] @ qQ[qi]
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

    def merge_group(g):
        return _rank_exact(g, k)

    return (feat.map_batches(batch_topk, batch_format="pyarrow",
                             batch_size=2048)
            .groupby("query_id")
            .map_groups(merge_group, batch_format="pandas"))


def collocations(sf_dir: str, k: int = 20,
                 min_count: int = 5) -> rd.Dataset:
    """(w1, w2, n, score_e6): top-``k`` COLLOCATIONS by an exact
    integer PMI surrogate — score_e6 = (c2 · N · 10^6) // (l(w1) ·
    r(w2)) with c2 the corpus bigram count, l/r the bigram-marginal
    counts and N the total bigram count (ties → (w1, w2) asc; pairs
    below ``min_count`` gated out) — the phrase-mining table a
    tokenizer/normalization pass reads.  All arithmetic is Python-int
    on the gated candidate rows, so the score is exact at any corpus
    size (the twin uses HUGEINT).

    Scale shape, size-gated (the bigram_surprisal pattern): ONE tokenize
    pass produces batch-bounded bigram partials; under a 2^17-bigram
    gate the driver merges them and computes marginals + scores + the
    top-k on the bounded table (no shuffle at all); past the gate, the
    distributed path — (w1,w2) hash_agg, token-keyed marginal
    re-aggregates, two co-partitioned joins, exact per-block topk."""
    from collections import Counter


    def big_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            ws = s.lower().split()
            c.update(zip(ws, ws[1:]))
        return pa.table({"w1": pa.array([p[0] for p in c], pa.string()),
                         "w2": pa.array([p[1] for p in c], pa.string()),
                         "p": pa.array(list(c.values()), pa.int64())})

    parts = docs(sf_dir).map_batches(big_partial,
                                     batch_format="pyarrow").materialize()

    # ---- FAST PATH: bigram-table-sized driver merge, zero shuffles
    c2_acc: Counter = Counter()
    over_gate = False
    for t in parts.iter_batches(batch_format="pyarrow"):
        for a, b, c in zip(t["w1"].to_pylist(), t["w2"].to_pylist(),
                           t["p"].to_pylist()):
            c2_acc[(a, b)] += c
        if len(c2_acc) > (1 << 17):
            over_gate = True
            break
    if not over_gate:
        lN: Counter = Counter()
        rN: Counter = Counter()
        total = 0
        for (a, b), c in c2_acc.items():
            lN[a] += c
            rN[b] += c
            total += c
        rows = sorted(
            ((int(c) * total * 10 ** 6 // (lN[a] * rN[b]), a, b, int(c))
             for (a, b), c in c2_acc.items() if c >= min_count),
            key=lambda r: (-r[0], r[1], r[2]))[:k]
        return rd.from_arrow(pa.table({
            "w1": pa.array([r[1] for r in rows], pa.string()),
            "w2": pa.array([r[2] for r in rows], pa.string()),
            "n": pa.array([r[3] for r in rows], pa.int64()),
            "score_e6": pa.array([r[0] for r in rows], pa.int64())}))

    # ---- AT SCALE: hash_agg + marginal joins
    big = hash_agg(parts, ["w1", "w2"], [("p", "sum", "c2")]).materialize()

    lm = hash_agg(big.map_batches(
        lambda t: t.select(["w1", "c2"]).group_by("w1")
        .aggregate([("c2", "sum")]).rename_columns(["w1", "p"]),
        batch_format="pyarrow"), "w1", [("p", "sum", "l")])
    rm = hash_agg(big.map_batches(
        lambda t: t.select(["w2", "c2"]).group_by("w2")
        .aggregate([("c2", "sum")]).rename_columns(["w2", "p"]),
        batch_format="pyarrow"), "w2", [("p", "sum", "r")])

    # N: one tiny distributed sum collected as a scalar
    N = 0
    for t in big.iter_batches(batch_format="pyarrow"):
        s = pc.sum(t["c2"]).as_py()
        N += int(s) if s is not None else 0

    gated = big.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["c2"], pa.scalar(min_count, pa.int64()))),
        batch_format="pyarrow")
    j1 = hash_join(gated, lm, on="w1",
                   left_cols={"w2": pa.string(), "c2": pa.int64()},
                   right_cols={"l": pa.int64()})
    j2 = hash_join(j1, rm, on="w2", right_on="w2",
                   left_cols={"w1": pa.string(), "c2": pa.int64(),
                              "l": pa.int64()},
                   right_cols={"r": pa.int64()})

    def score(t: pa.Table) -> pa.Table:
        sc = [int(c2) * N * 10 ** 6 // (int(l) * int(r))
              for c2, l, r in zip(t["c2"].to_pylist(),
                                  t["l"].to_pylist(),
                                  t["r"].to_pylist())]
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "n": t["c2"],
                         "score_e6": pa.array(sc, pa.int64())})

    return topk(j2.map_batches(score, batch_format="pyarrow"),
                [("score_e6", "descending"), ("w1", "ascending"),
                 ("w2", "ascending")], k)


def char_entropy(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, surprisal_bits): per-document CHARACTER-
    distribution surprisal — Σ over distinct characters of
    c·floor(log2(n_chars // c)) (the floor-log2 bits convention) — the
    OCR-garbage / encoding-noise detector: natural text scores in a
    narrow band, byte soup scores high, single-char runs score 0.
    Empty docs carry no row.  Pure per-batch map, no shuffle."""
    from collections import Counter


    def kernel(t: pa.Table) -> pa.Table:
        ids, ns, bits = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if not s:
                continue
            c = Counter(s)
            n = len(s)
            ids.append(did)
            ns.append(n)
            bits.append(sum(v * ((n // v).bit_length() - 1)
                            for v in c.values()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(ns, pa.int64()),
                         "surprisal_bits": pa.array(bits, pa.int64())})

    return docs(sf_dir).map_batches(kernel, batch_format="pyarrow")


def source_entropy(sf_dir: str) -> rd.Dataset:
    """One row (n_docs, n_sources, surprisal_bits): corpus source-mixture
    concentration in exact floor-log2 bits — Σ over sources of
    n·floor(log2(n_docs // n)) (the markov_entropy convention): a
    single-source corpus scores 0, a uniform mixture scores high — the
    one-number mixture-balance check next to mixture_quota.

    Scale shape: per-batch source-count partials into a bounded-key
    aggregate; the finalize runs on that |sources|-bounded block."""

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["source"]).group_by("source")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["source", "p_n"])

    agg = hash_agg(docs(sf_dir, columns=("doc_id", "source"))
                   .map_batches(partial, batch_format="pyarrow"),
                   "source", [("p_n", "sum", "n")], small=True)

    def finalize(t: pa.Table) -> pa.Table:
        ns = [int(x) for x in t["n"].to_pylist()]
        total = sum(ns)
        bits = sum(n * ((total // n).bit_length() - 1) for n in ns)
        return pa.table({"n_docs": pa.array([total], pa.int64()),
                         "n_sources": pa.array([len(ns)], pa.int64()),
                         "surprisal_bits": pa.array([bits], pa.int64())})

    return agg.repartition(1).map_batches(finalize, batch_format="pyarrow")


def cluster_lang_purity(sf_dir: str, n_clusters: int = 8, dim: int = 64,
                        iters: int = 6) -> rd.Dataset:
    """(cluster_id, lang, n): the unsupervised-vs-labeled crosstab over
    :func:`topic_clusters` — how well the hashed-BoW k-means clusters
    align with the declared language column, the purity table an
    unsupervised mixture step is judged by before it drives sampling.

    Scale shape: one doc_id-co-partitioned join of the (doc_id,
    cluster_id) assignment against the (doc_id, lang) projection, then
    a bounded-key (clusters × languages) aggregate."""
    tc = topic_clusters(sf_dir, n_clusters=n_clusters, dim=dim,
                        iters=iters)
    langs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    j = hash_join(tc, langs, on="doc_id",
                  left_cols={"cluster_id": pa.int64()},
                  right_cols={"lang": pa.string()})

    def part(t: pa.Table) -> pa.Table:
        g = (t.select(["cluster_id", "lang"])
             .group_by(["cluster_id", "lang"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["cluster_id", "lang", "p_n"])

    return hash_agg(j.map_batches(part, batch_format="pyarrow"),
                    ["cluster_id", "lang"], [("p_n", "sum", "n")],
                    small=True)


def bigram_surprisal(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, surprisal): integer CONDITIONAL bigram
    surprisal — Σ over adjacent token pairs (w1,w2) of
    floor(log2(c1(w1) // c2(w1,w2))), where c2 is the corpus bigram count
    and c1 = Σ_w2 c2(w1,·) the prefix occurrence count — the floor-log2
    bits of the INTEGER quotient of the inverse conditional probability
    1/P(w2|w1) under the corpus MLE bigram LM (one bit below
    ceil(log2(1/P)) when c1/c2 is not a power of two; the twin computes
    the identical quantity, so the choice is a fixed convention, not an
    approximation error).  This is the
    KenLM-style perplexity gate of CCNet/Gopher in exact arithmetic:
    formulaic boilerplate (high-probability continuations) scores ~0,
    incoherent token soup scores high.  floor(log2) is bit_length-1 of
    the integer quotient — bit-reproducible at any width (no float log).

    Scale shape, size-gated (the ``surprisal`` gate pattern): the bigram
    count table builds from per-batch Counter partials (combiner-before-
    shuffle — no occurrence materialization needed yet).  When it fits a
    broadcast budget (≤ 2^17 distinct bigrams) the {(w1,w2): bits} dict
    broadcasts and the whole score is ONE streaming map_batches over the
    corpus — no join exchange at all.  Past the gate, the fully
    distributed path: (doc_id,w1,w2,tf) occurrence rows, the w1-keyed
    prefix re-aggregate, two co-partitioned hash_joins (on (w1,w2), then
    on w1) putting both counts on each occurrence row, one hash_agg by
    doc_id summing the bits.  Exchanges carry token pairs + ids, never
    the document text; both branches compute the identical table."""
    from collections import Counter


    src = docs(sf_dir)

    def big_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            ws = s.lower().split()
            c.update(zip(ws, ws[1:]))
        w1s, w2s = ([p[0] for p in c], [p[1] for p in c])
        return pa.table({"w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "p": pa.array(list(c.values()), pa.int64())})

    # ONE tokenize pass produces batch-bounded bigram partials; the fast
    # path merges them driver-side (a vocab-gated Counter — no shuffle at
    # all), the at-scale path feeds the SAME materialized partials to
    # hash_agg (no re-tokenize on fallback)
    parts = src.map_batches(big_partial,
                            batch_format="pyarrow").materialize()

    # ---- FAST PATH: bigram-table-sized broadcast → single streaming pass
    c2_acc: Counter = Counter()
    over_gate = False
    for t in parts.iter_batches(batch_format="pyarrow"):
        for a, b, c in zip(t["w1"].to_pylist(), t["w2"].to_pylist(),
                           t["p"].to_pylist()):
            c2_acc[(a, b)] += c
        if len(c2_acc) > (1 << 17):
            over_gate = True
            break
    if not over_gate:
        c1_acc: dict[str, int] = {}
        for (a, _b), c in c2_acc.items():
            c1_acc[a] = c1_acc.get(a, 0) + c
        bits_map = {p: (c1_acc[p[0]] // c).bit_length() - 1
                    for p, c in c2_acc.items()}
        bm_ref = ray.put(bits_map)

        def score_direct(t: pa.Table) -> pa.Table:
            bm = ray.get(bm_ref)
            ids, nbs, surs = [], [], []
            for did, s in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist()):
                ws = s.lower().split()
                if len(ws) < 2:
                    continue
                ids.append(did)
                nbs.append(len(ws) - 1)
                surs.append(sum(bm[p] for p in zip(ws, ws[1:])))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_bigrams": pa.array(nbs, pa.int64()),
                             "surprisal": pa.array(surs, pa.int64())})

        return src.map_batches(score_direct, batch_format="pyarrow")

    # ---- AT SCALE: occurrence rows + two co-partitioned joins
    def pair_tf(t: pa.Table) -> pa.Table:
        ids, w1s, w2s, tfs = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = s.lower().split()
            if len(ws) < 2:
                continue
            for (a, b), n in Counter(zip(ws, ws[1:])).items():
                ids.append(did)
                w1s.append(a)
                w2s.append(b)
                tfs.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    occ = src.map_batches(pair_tf, batch_format="pyarrow").materialize()

    big = hash_agg(parts, ["w1", "w2"], [("p", "sum", "c2")]).materialize()

    pre = hash_agg(big.map_batches(
        lambda t: t.select(["w1", "c2"]).group_by("w1")
        .aggregate([("c2", "sum")]).rename_columns(["w1", "p"]),
        batch_format="pyarrow"), "w1", [("p", "sum", "c1")])

    j1 = hash_join(occ, big, on=["w1", "w2"],
                   left_cols={"doc_id": pa.int64(), "tf": pa.int64()},
                   right_cols={"c2": pa.int64()})
    j2 = hash_join(j1, pre, on="w1",
                   left_cols={"w2": pa.string(), "doc_id": pa.int64(),
                              "tf": pa.int64(), "c2": pa.int64()},
                   right_cols={"c1": pa.int64()})

    def score_partial(t: pa.Table) -> pa.Table:
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = t["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = c1 // c2
        # floor(log2) via float64 log2 is UNSAFE near powers of two;
        # bit_length-1 == (number of bits) - 1, vectorized exactly for
        # int64 with the frexp-free np.log2 avoided: use bit twiddling
        bits = np.zeros(len(q), dtype=np.int64)
        v = q.copy()
        while (v > 1).any():
            m = v > 1
            bits[m] += 1
            v[m] >>= 1
        tmp = pa.table({"doc_id": t["doc_id"],
                        "nb": pa.array(tf, pa.int64()),
                        "s": pa.array(bits * tf, pa.int64())})
        g = tmp.group_by("doc_id").aggregate([("nb", "sum"), ("s", "sum")])
        return g.rename_columns(["doc_id", "p_nb", "p_s"])

    return hash_agg(j2.map_batches(score_partial, batch_format="pyarrow"),
                    "doc_id", [("p_nb", "sum", "n_bigrams"),
                               ("p_s", "sum", "surprisal")])


def hapax_rate(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, hapax): per-document count of corpus-hapax token
    occurrences (tokens whose document frequency is exactly 1) alongside
    the doc's token count — the lexical-novelty / OCR-noise signal used in
    corpus quality audits (a high hapax share means typos or genuinely
    novel vocabulary; ~0 means boilerplate).

    Scale shape, size-gated (the ``surprisal`` gate pattern): the df
    table builds from per-batch document-set Counter partials.  When the
    hapax token set (df=1) fits a broadcast budget (≤ 2^20 tokens) it
    broadcasts as a frozenset and the whole stat is ONE streaming
    map_batches over the corpus — no join exchange.  Past the gate, the
    distributed path: (doc_id, token, tf) occurrence rows; hapax tokens
    LEFT-join back onto per-doc totals, so the join's right side is the
    hapax-sized id table and text never shuffles.  Both branches compute
    the identical table."""
    from collections import Counter


    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(s.lower().split()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "p": pa.array(list(c.values()), pa.int64())})

    src = docs(sf_dir)
    dfreq = hash_agg(src.map_batches(df_partial, batch_format="pyarrow"),
                     "token", [("p", "sum", "df")]).materialize()
    hapax_toks = dfreq.map_batches(
        lambda t: t.filter(pc.equal(t["df"], 1)),
        batch_format="pyarrow")  # batch filter on the vocab-sized table

    # ---- FAST PATH: hapax-set-sized broadcast → single streaming pass
    hapax_set: set[str] = set()
    over_gate = False
    for t in hapax_toks.iter_batches(batch_format="pyarrow"):
        hapax_set.update(t["token"].to_pylist())
        if len(hapax_set) > (1 << 20):
            over_gate = True
            break
    if not over_gate:
        hs_ref = ray.put(frozenset(hapax_set))

        def count_direct(t: pa.Table) -> pa.Table:
            hs = ray.get(hs_ref)
            ids, ntok, hx = [], [], []
            for did, s in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist()):
                ws = s.lower().split()
                if not ws:
                    continue
                ids.append(did)
                ntok.append(len(ws))
                hx.append(sum(1 for w in ws if w in hs))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_tokens": pa.array(ntok, pa.int64()),
                             "hapax": pa.array(hx, pa.int64())})

        return src.map_batches(count_direct, batch_format="pyarrow")

    # ---- AT SCALE: occurrence rows + hapax-sized joins
    occ = _tf_table(sf_dir)

    totals = hash_agg(occ.map_batches(
        lambda t: t.select(["doc_id", "tf"]).group_by("doc_id")
        .aggregate([("tf", "sum")]).rename_columns(["doc_id", "p"]),
        batch_format="pyarrow"), "doc_id", [("p", "sum", "n_tokens")])

    # hapax occurrences per doc: inner-join occurrences against the
    # hapax token set (df=1 → tf is that doc's occurrence count)
    hx = hash_join(occ, hapax_toks.map_batches(
        lambda t: t.select(["token"]), batch_format="pyarrow"),
        on="token",
        left_cols={"doc_id": pa.int64(), "tf": pa.int64()},
        right_cols={})
    hx_doc = hash_agg(hx.map_batches(
        lambda t: t.select(["doc_id", "tf"]).group_by("doc_id")
        .aggregate([("tf", "sum")]).rename_columns(["doc_id", "p"]),
        batch_format="pyarrow"), "doc_id", [("p", "sum", "hapax")])

    out = hash_join(totals, hx_doc, on="doc_id",
                    left_cols={"n_tokens": pa.int64()},
                    right_cols={"hapax": pa.int64()},
                    join_type="left outer")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "hapax": pc.coalesce(t["hapax"], pa.scalar(0, pa.int64()))}),
        batch_format="pyarrow")


def _tf_table(sf_dir: str) -> rd.Dataset:
    """Materialized (doc_id, token, tf) occurrence table, memoized per
    corpus (the dedup._memo_key convention: job id + content signature) —
    hapax_rate and keywords both consume it, so the tokenize+count scan
    runs once per suite invocation."""
    from .dedup import _MEMO, _memo_key

    key = _memo_key("tf_rows", sf_dir)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = docs(sf_dir).map_batches(
            _tf_rows, batch_format="pyarrow").materialize()
    return hit


def _tf_rows(t: pa.Table) -> pa.Table:
    """(doc_id, token, tf) occurrence rows — the shared tokenize+count
    combiner of hapax_rate and keywords (lower().split(), the corpus-wide
    whitespace token convention)."""
    from collections import Counter

    ids, toks, tfs = [], [], []
    for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = s.lower().split()
        if not ws:
            continue
        for w, n in Counter(ws).items():
            ids.append(did)
            toks.append(w)
            tfs.append(n)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "token": pa.array(toks, pa.string()),
                     "tf": pa.array(tfs, pa.int64())})


def keywords(sf_dir: str, k: int = 3) -> rd.Dataset:
    """(doc_id, token, tf, score): the top-``k`` tf-idf keywords of every
    document with INTEGER scores — score = tf · floor(log2(N_docs // df)),
    the same bit_length-1 idf convention as :func:`surprisal`, ordered by
    (score desc, token asc) with deterministic ties.  The per-doc keyword
    metadata extraction step of a corpus indexing pipeline.

    Scale shape: occurrence rows hash_join the distributed df table
    co-partitioned on token (text never shuffles), then ONE doc_id
    repartition (the hash_agg _addpart/groupby("__part") shape) where a
    vectorized run-length head keeps k rows per doc — no per-doc Python,
    no global sort."""

    occ = _tf_table(sf_dir)
    n_docs = docs(sf_dir, columns=("doc_id",)).count()

    dfreq = hash_agg(occ.map_batches(
        lambda t: t.select(["token"]).group_by("token")
        .aggregate([([], "count_all")]).rename_columns(["token", "p"]),
        batch_format="pyarrow"), "token", [("p", "sum", "df")])

    j = hash_join(occ, dfreq, on="token",
                  left_cols={"doc_id": pa.int64(), "tf": pa.int64()},
                  right_cols={"df": pa.int64()})

    def score(t: pa.Table) -> pa.Table:
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = n_docs // df
        bits = np.zeros(len(q), dtype=np.int64)
        v = q.copy()
        while (v > 1).any():
            m = v > 1
            bits[m] += 1
            v[m] >>= 1
        return pa.table({"doc_id": t["doc_id"], "token": t["token"],
                         "tf": t["tf"],
                         "score": pa.array(bits * tf, pa.int64())})

    P = 32

    def addpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int32()))
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["doc_id"], P)))

    def head_per_doc(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        order = pc.sort_indices(g, sort_keys=[
            ("doc_id", "ascending"), ("score", "descending"),
            ("token", "ascending")])
        g = g.take(order)
        dids = g["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(dids)) + 1))
        counts = np.diff(np.concatenate((starts, [len(dids)])))
        in_run = np.arange(len(dids)) - np.repeat(starts, counts)
        return g.filter(pa.array(in_run < k))

    return (j.map_batches(score, batch_format="pyarrow")
             .map_batches(addpart, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(head_per_doc, batch_format="pyarrow"))
