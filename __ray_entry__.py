"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported — nothing
here calls ray.init()/ray.shutdown().

``entry()``   — flagship pipeline: the distributed crawl engine over the
                deterministic synthetic Common-Crawl-style pages corpus
                (BASELINE.json input_hint shape), small scale.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
                training-data ops); each takes sf_dir.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
                (same column names!).  106 of 111 queries are SQL-checked,
                including the sketch ops (simhash / minhash LSH dedup /
                winnowing / langid — their kernels use md5-upper64 token
                hashes and mod-2**64 permutations precisely so DuckDB can
                reproduce them exactly), the FULL ANN retrievals
                (knn_lsh md5-parity hyperplanes, knn_ivf unrolled integer
                k-means, knn_ivfpq IVF+PQ+ADC+rerank), the media queries
                (deterministic fake codec over utf-8 payload bytes), and
                the composed clean-corpus pipeline.  Rows-only remainder,
                structurally non-SQL: ONLY the 5 crawl outputs (stateful
                iterative engine — byte-parity-tested instead).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

_CORPUS_CACHE: dict[str, str] = {}
_CRAWL_CACHE: dict[str, Any] = {}


def _scale_for(sf_dir: str) -> str:
    return "small" if "sf0.001" in sf_dir else "med"


def _gen_fingerprint() -> str:
    """Content hash of every module that determines the synthetic corpus
    bytes — the /tmp cache directories are KEYED by it, so a cache left
    behind by an older checkout of the generator can never be served
    stale (the round-3 hazard: `/tmp/gsr_corpus_*` persisted across
    driver runs with only an existence check)."""
    import hashlib
    h = hashlib.sha256()
    for rel in ("fixtures/gen.py", "go_scrapper_ray/extract.py",
                "go_scrapper_ray/urlkit.py", "go_scrapper_ray/config.py",
                "go_scrapper_ray/gojson.py", "go_scrapper_ray/dates.py",
                "go_scrapper_ray/minidom.py", "go_scrapper_ray/fastpath.py"):
        h.update(rel.encode())
        h.update((_REPO / rel).read_bytes())
    return h.hexdigest()[:12]


def _corpus(sf_dir: str) -> str:
    """Deterministic synthetic web corpus for the crawl queries (seed=42),
    cached per (scale, generator fingerprint) under /tmp.  Generation is
    ATOMIC: build into a pid-unique temp dir, rename into place — a
    crashed or concurrent generator can never leave a half-written
    directory that a later run mistakes for a complete corpus."""
    scale = _scale_for(sf_dir)
    if scale not in _CORPUS_CACHE:
        import os
        import shutil

        from fixtures.gen import generate_corpus

        out = Path(f"/tmp/gsr_corpus_{scale}_{_gen_fingerprint()}")
        if not (out / "manifest.json").exists():
            tmp = Path(f"{out}.tmp.{os.getpid()}")
            shutil.rmtree(tmp, ignore_errors=True)
            generate_corpus(str(tmp), scale=scale, seed=42)
            try:
                os.rename(tmp, out)
            except OSError:  # lost a race to a concurrent generator
                shutil.rmtree(tmp, ignore_errors=True)
        _CORPUS_CACHE[scale] = str(out)
    return _CORPUS_CACHE[scale]


def _crawl(sf_dir: str):
    """Run (once per scale) the crawl engine; cache the CrawlResult.
    The workdir (which holds the derived page store) shares the corpus
    fingerprint key, so a regenerated corpus always gets a fresh store."""
    scale = _scale_for(sf_dir)
    if scale not in _CRAWL_CACHE:
        from go_scrapper_ray.pipelines.crawl import CrawlEngine

        corpus = _corpus(sf_dir)
        eng = CrawlEngine(corpus,
                          f"/tmp/gsr_crawl_{scale}_{_gen_fingerprint()}",
                          checkpoints=False)
        _CRAWL_CACHE[scale] = eng.run()
    return _CRAWL_CACHE[scale]


def entry() -> Any:
    """Flagship: full distributed crawl at small scale → finalized, ordered
    record table (driver checks rows ≥ 0 and a stable schema)."""
    res = _crawl("/root/testdata/sf0.001")
    if res.records is None:
        import pandas as pd
        return pd.DataFrame({"seed_id": [], "rank": [], "jsonl": []})
    return res.records


# ----------------------------------------------------------------- queries

def _q_crawl_records(sf_dir: str):
    res = _crawl(sf_dir)
    return res.records


def _q_crawl_visit_log(sf_dir: str):
    import pandas as pd
    rows = _crawl(sf_dir).visit_log()
    return pd.DataFrame([{k: r[k] for k in
                          ("seq", "seed_id", "url", "canon", "host", "kind",
                           "depth", "status", "attempt", "virtual_ts_ms")}
                         for r in rows])


def _q_crawl_seen(sf_dir: str):
    import numpy as np
    import pandas as pd
    rows = _crawl(sf_dir).seen
    # uint64, not float: float64 only holds 53 bits and would silently
    # collide distinct 64-bit url hashes
    return pd.DataFrame({"url_hash": np.array([h for h, _ in rows],
                                              dtype=np.uint64),
                         "canon_url": [c for _, c in rows]})


def _q_crawl_edges(sf_dir: str):
    import pandas as pd
    rows = _crawl(sf_dir).edges
    return pd.DataFrame({"src": [a for a, _, _ in rows],
                         "dst": [b for _, b, _ in rows],
                         "rel": [r for _, _, r in rows]})


def _q_crawl_meta(sf_dir: str):
    import pandas as pd
    res = _crawl(sf_dir)
    rows = []
    for sid, o in sorted(res.outcomes.items()):
        rows.append({"seed_id": sid, "status": o.status,
                     "item_scraped_count": o.item_scraped_count,
                     "score": o.score, "total_reviews": o.total_reviews})
    return pd.DataFrame(rows)


def _q_canonicalize(sf_dir: str):
    """URL canonicalization kernel, SQL-checked: deterministic MESSY URLs
    (uppercase scheme+host, explicit default port, unsorted query params, a
    fragment) are derived from doc_id, canonicalized by the engine kernel,
    and compared against the ORACLE's closed-form expected canon + DuckDB
    ``md5_number_upper`` hash — validating scheme/host lowering, default-
    port strip, query-param sort, fragment strip and the 64-bit URL hash
    cell-by-cell."""
    import pyarrow as pa
    import ray.data as rd
    from go_scrapper_ray import urlkit

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        messy = [f"HTTPS://EXAMPLE-{i % 97}.COM:443/doc/{i}"
                 f"?b={i % 7}&a={i % 3}#frag{i}" for i in ids]
        canons = urlkit.canonicalize_batch(messy)
        return pa.table({
            "doc_id": t["doc_id"],
            "url": pa.array(messy, pa.string()),
            "canon_url": pa.array(canons, pa.string()),
            "url_hash": pa.array(urlkit.url_hash_batch(canons), pa.uint64()),
            "host": pa.array(urlkit.host_batch(canons), pa.string()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]) \
        .map_batches(kernel, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    """117 of 122 queries carry a DuckDB oracle (oracle_sql()).  The only 5
    without one are the crawl_* outputs, which are structurally non-SQL:
    they encode an iterative politeness-scheduled frontier loop (ordering
    depends on the virtual clock + retry state machine) and are checked
    instead by the byte-parity oracle suite in tests/test_crawl_parity.py
    against tests/oracle.py.  Even the ANN paths are FULLY SQL-checked:
    knn_lsh (md5-parity hyperplanes, int-quantized codes), knn_ivf /
    knn_ivfpq (deterministic integer k-means, iterations unrolled in the
    twin) and knn_bruteforce produce bit-exact CANDIDATE SETS and
    bit-exact RANKS — the final ranking is the integer rational key
    (similarity._rational_key / _ikey_sql: sign(d)·(d²·10¹²//ssq) over
    1/1000-quantized vectors, HUGEINT in DuckDB), so no float
    accumulation order exists anywhere in the retrieval; recall floors
    vs knn_bruteforce are additionally pytest-enforced;
    media_features / media_frame_sample
    run their deterministic fake codec over utf-8 payload bytes, which
    the twins reproduce via codepoint aggregates."""
    from go_scrapper_ray.pipelines import (clean, dedup, events, graph,
                                           multimodal, relational, similarity,
                                           textstats)

    return {
        # --- crawl engine (non-SQL; rows-only checks) ---
        "crawl_records": _q_crawl_records,
        "crawl_visit_log": _q_crawl_visit_log,
        "crawl_seen_set": _q_crawl_seen,
        "crawl_edges": _q_crawl_edges,
        "crawl_meta": _q_crawl_meta,
        "url_canonicalize": _q_canonicalize,
        # --- text analysis (SQL-checked) ---
        "docs_lang_dist": textstats.lang_dist,
        "docs_token_count": textstats.token_count,
        "docs_quality": textstats.quality,
        "docs_fingerprint": textstats.fingerprint_md5,
        "docs_repetition": textstats.repetition,
        "docs_source_rollup": textstats.source_rollup,
        "docs_pii_scrub": textstats.pii_scrub,
        "docs_gopher_quality": textstats.gopher_quality,
        "docs_topk_ngrams": textstats.topk_ngrams,
        "docs_doc_frequency": textstats.doc_frequency,
        "docs_bpe_pairs": textstats.bpe_pair_counts,      # BPE merge table
        "docs_length_outliers": textstats.length_outliers,  # per-lang gates
        "docs_topic_clusters": textstats.topic_clusters,  # hashed-BoW kmeans
        "docs_incremental_new": dedup.incremental_new,  # snapshot anti-join
        "docs_normalize": textstats.normalize,
        "docs_sample": textstats.sample_stratified,
        "docs_mixture_quota": textstats.mixture_quota,
        "docs_length_quantiles": textstats.length_quantiles,
        # --- text analysis (SQL-checked via md5-upper64 twins) ---
        "docs_winnow_fp": textstats.fingerprint_winnow,
        "docs_langid": textstats.langid,
        # --- dedup ---
        "docs_exact_dedup": dedup.exact_dedup,
        "docs_chunk_dedup": dedup.chunk_dedup,
        "docs_minhash_dups": dedup.minhash_dups,          # SQL-checked sketch
        "docs_minhash_est": dedup.minhash_est,            # sketch-accuracy audit
        "docs_ngram_novelty": dedup.ngram_novelty,        # dataset-growth curve
        "docs_simhash_dups": dedup.simhash_dups,          # SQL-checked sketch
        "docs_jaccard_dups": dedup.ngram_jaccard_dups,    # exact, SQL-checked
        "docs_dup_clusters": dedup.dup_clusters,          # CC over minhash pairs
        "docs_clean_corpus": clean.clean_corpus,          # composed pipeline
        "docs_train_shards": clean.train_shards,          # shard writer
        "docs_dedup_keep_best": clean.dedup_keep_best,    # quality-aware dedup
        "emb_cosine_dups": lambda sf: dedup.embedding_dups(sf, threshold=0.45),
        # --- similarity search ---
        "knn_bruteforce": similarity.knn_bruteforce,
        "knn_lsh": similarity.knn_lsh,                    # SQL-checked ANN
        "knn_ivf": similarity.knn_ivf,                    # SQL-checked ANN
        "emb_kmeans_dist": similarity.kmeans_assign_dist,  # distributed fit
        "emb_norm_stats": similarity.emb_norm_stats,
        # --- events / streaming-shaped ---
        "events_windowed": events.windowed_counts,
        "events_sessionize": events.sessionize,
        "events_top_users": events.top_users_by_value,
        "events_asof_join": events.asof_join,
        "events_funnel": events.funnel,
        "events_range_join": events.range_join,
        "events_dau": events.daily_active,
        "events_retention": events.retention_cohorts,
        "events_transitions": events.type_transitions,
        "events_cumulative": events.cumulative_value,
        # --- multimodal plumbing (SQL-checked; codecs stubbed) ---
        "media_features": multimodal.media_features,
        "media_frame_sample": multimodal.frame_sample,
        "media_decode_real": multimodal.media_decode_real,  # real codecs
        # --- relational (broadcast hash joins + combiner aggregates) ---
        "top_suppliers": relational.top_suppliers_by_revenue,
        "customers_no_orders": relational.customers_without_orders,
        "top_orders_per_cust": relational.top_orders_per_cust,
        "events_rolling": events.rolling_value,
        "order_priorities": relational.order_priority_counts,
        "nation_revenue": relational.nation_customer_revenue,
        "lineitem_pricing": relational.pricing_summary,
        "shipping_priority": relational.shipping_priority,
        "docs_decontaminate": dedup.decontaminate,
        "cust_order_histogram": relational.cust_order_histogram,
        "filtered_revenue": relational.filtered_revenue,
        "promo_revenue": relational.promo_revenue,
        "emb_label_centroids": similarity.label_centroids,
        "emb_label_separation": similarity.label_separation,  # pair dist audit
        "emb_ivf_assign": similarity.ivf_assign,
        "emb_lsh_code": similarity.lsh_code,
        "emb_rp_sketch": similarity.rp_sketch,  # JL sign projection
        "docs_pagerank": graph.pagerank,
        "docs_hits": graph.hits,                      # hub/authority sweep
        "events_window_users": events.window_users,   # exact distinct/window
        "docs_bigram_surprisal": textstats.bigram_surprisal,  # bigram LM gate
        "docs_knn_text": textstats.knn_text,  # text ANN, hashed BoW
        "docs_hapax_rate": textstats.hapax_rate,      # corpus-hapax share
        "docs_keywords": textstats.keywords,          # per-doc tf-idf top-k
        "docs_containment_dups": dedup.containment_dups,  # directed containment
        "docs_dup_rate_by_source": dedup.dup_rate_by_source,  # per-domain audit
        "docs_boilerplate": dedup.boilerplate_chunks,  # C4 common-lines table
        "docs_strip_boilerplate": clean.strip_boilerplate,  # the APPLY step
        "events_sliding_users": events.sliding_users,  # sliding exact distinct
        "returned_items": relational.returned_item_revenue,
        "large_orders": relational.large_volume_orders,
        "high_balance_inactive": relational.high_balance_inactive,
        "volume_shipping": relational.volume_shipping,
        "market_share": relational.market_share,
        "small_qty_revenue": relational.small_qty_revenue,
        "discounted_revenue": relational.discounted_revenue,
        "events_first_touch": events.first_touch,
        "events_gap_stats": events.user_gap_stats,
        "events_last_touch": events.last_touch,
        "events_session_stats": events.session_stats,
        "events_hourly": events.hourly_profile,
        "ship_lag_stats": relational.ship_lag_stats,
        "top_supplier_revenue": relational.top_supplier_revenue,
        "order_supplier_diversity": relational.order_supplier_diversity,
        "docs_top_terms": textstats.top_terms,
        "events_median_value": events.median_value,
        "waiting_suppliers": relational.waiting_suppliers,
        "label_doc_stats": similarity.label_doc_stats,
        "docs_dup_rate": textstats.dup_rate,
        "supplier_profit": relational.supplier_profit,
        "events_value_percentiles": events.value_percentiles,
        "events_hopping": events.hopping_counts,
        "local_supplier_volume": relational.local_supplier_volume,
        "events_props_stats": events.props_stats,
        "events_dau_hll": events.dau_hll,
        "docs_substring_dup": dedup.substring_dup,
        "docs_url_mentions": textstats.url_mentions,
        "docs_lang_confusion": textstats.lang_confusion,
        "docs_oov_rate": textstats.oov_rate,
        # --- round 3 additions ---
        "events_anomaly": events.anomaly_flags,       # exact-int z-score flag
        "events_late": events.late_events,            # watermark/out-of-order
        "cheapest_supplier": relational.cheapest_supplier,      # Q2 shape
        "brand_supplier_counts": relational.brand_supplier_counts,  # Q16 shape
        "emb_pq_assign": similarity.pq_assign,        # product quantization
        "docs_split": clean.train_val_test_split,     # train/val/test split
        "docs_surprisal": textstats.surprisal,        # int unigram surprisal
        "knn_ivfpq": similarity.knn_ivfpq,            # IVF+PQ ANN, SQL-checked
        "emb_semantic_dedup": dedup.semantic_dedup,   # SemDeDup-style
        "events_heavy_hitters": events.heavy_hitters,
        "events_gap_quantiles": events.gap_quantiles,  # exact order stats
        "events_burstiness": events.burstiness_stats,  # Fano inputs
        "docs_heaps_stats": textstats.heaps_stats,     # Heaps-law audit
        "emb_pq_distortion": similarity.pq_distortion,  # PQ error audit
        "events_markov_entropy": events.markov_entropy,  # predictability
        "docs_cluster_lang_purity": textstats.cluster_lang_purity,
        "emb_norm_outliers": similarity.norm_outliers,  # sanity gate
        "docs_minhash_recall": dedup.minhash_recall,    # sketch eval
        "docs_source_entropy": textstats.source_entropy,
        "supplier_hhi": relational.supplier_hhi,
        "docs_collocations": textstats.collocations,    # exact PMI top-k
        "docs_char_entropy": textstats.char_entropy,    # OCR-noise gate
        "docs_clean_text_corpus": clean.clean_text_corpus,  # the deliverable
        "events_active_days": events.active_days_hist,
        "docs_simhash_bit_balance": dedup.simhash_bit_balance,  # sketch health  # count-min sketch
        "events_window_top_user": events.window_top_user,  # windowed argmax
        "docs_gate_funnel": clean.gate_funnel,        # pipeline observability
    }


def _langid_sql() -> str:
    """DuckDB twin of LangIdStage: per-language non-overlapping marker counts
    ((len - len(replace))/len(marker) == pc.count_substring) then first-max
    argmax in declared language order."""
    from go_scrapper_ray.pipelines.textstats import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    score_cols = []
    for lang in langs:
        terms = []
        for m in _LANG_MARKERS[lang]:
            m = m.lower().replace("'", "''")
            terms.append(f"(length(lt) - length(replace(lt, '{m}', '')))"
                         f"//length('{m}')")
        score_cols.append(" + ".join(terms) + f" AS s_{lang}")
    # first-max-wins CASE chain (np.argmax tie behavior)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'"
                     if conds else f"ELSE '{lang}'")
    return f"""
        WITH s AS (SELECT doc_id, lower(text) AS lt FROM documents),
        c AS (SELECT doc_id, {', '.join(score_cols)} FROM s)
        SELECT doc_id, CASE {' '.join(cases)} END AS pred_lang FROM c"""


def _lsh_cte_prefix() -> str:
    """Shared CTE block of the minhash/containment twins: md5-upper64>>3
    shingle hashes, (a*h+b) mod 2**64 permutations (HUGEINT), 16 bands x 4
    rows candidate join, per-doc shingle counts and per-pair exact
    intersections.  ONE definition so the engine's LSH construction is
    tested by a single SQL text regardless of which verify tail follows."""
    from go_scrapper_ray.pipelines.dedup import _minhash_params

    a, b, _ = _minhash_params(42)
    vals = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(len(a)))
    return f"""
        WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
                   FROM documents),
        pos AS (
          SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM d WHERE len(toks) >= 3),
        gr AS (
          SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS gram FROM pos
          UNION ALL
          SELECT doc_id, array_to_string(toks, ' ') AS gram FROM d
          WHERE len(toks) BETWEEN 1 AND 2),
        sh AS (SELECT DISTINCT doc_id, (md5_number_upper(gram) >> 3) AS h FROM gr),
        perms AS (SELECT * FROM (VALUES {vals}) p(perm, a, b)),
        mh AS (SELECT doc_id, perm,
                 min(((a::HUGEINT * h::HUGEINT + b::HUGEINT)
                      % 18446744073709551616)::UBIGINT) AS v
               FROM sh CROSS JOIN perms GROUP BY doc_id, perm),
        bands AS (SELECT doc_id, perm // 4 AS band, list(v ORDER BY perm) AS sig
                  FROM mh GROUP BY doc_id, perm // 4),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY doc_id),
        inter AS (SELECT c.da, c.db, count(*) AS i
                  FROM cand c JOIN sh a ON a.doc_id = c.da
                  JOIN sh b ON b.doc_id = c.db AND a.h = b.h
                  GROUP BY c.da, c.db)"""


def _minhash_sql(threshold: float = 0.8) -> str:
    """DuckDB twin of dedup.minhash_dups: the shared LSH CTE prefix plus
    the exact-Jaccard verify tail (pairs with zero intersection cannot
    pass a positive threshold, so the inner join to ``inter`` is exact)."""
    return _lsh_cte_prefix() + f"""
        SELECT da AS doc_a, db AS doc_b FROM inter
        JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
        WHERE i * 1.0 / (na.cnt + nb.cnt - i) >= {threshold}"""


def _containment_sql(threshold: float = 0.9) -> str:
    """DuckDB twin of dedup.containment_dups: the shared LSH CTE prefix
    plus the DIRECTED containment verify tail in integer basis points
    (i * 10^4 >= thr_bp * |S(src)|) — both directions of each unordered
    candidate (zero-intersection candidates coalesce to i=0 so candidates
    below threshold still evaluate, matching the engine's per-pair loop)."""
    thr_bp = int(round(threshold * 10_000))
    return _lsh_cte_prefix() + f""",
        scored AS (SELECT c.da, c.db, coalesce(i.i, 0) AS i
                   FROM cand c LEFT JOIN inter i
                   ON i.da = c.da AND i.db = c.db)
        SELECT s.da AS src, s.db AS dst FROM scored s
        JOIN n na ON na.doc_id = s.da
        WHERE na.cnt > 0 AND s.i * 10000 >= {thr_bp} * na.cnt
        UNION ALL
        SELECT s.db, s.da FROM scored s
        JOIN n nb ON nb.doc_id = s.db
        WHERE nb.cnt > 0 AND s.i * 10000 >= {thr_bp} * nb.cnt"""


def _winnow_sql(k: int = 5, w: int = 8) -> str:
    """DuckDB twin of textstats.fingerprint_winnow: codepoint polynomial
    k-gram hash, per-window min, bit_xor of distinct selected minima."""
    from go_scrapper_ray.pipelines.textstats import WINNOW_B, WINNOW_M

    terms = " + ".join(
        f"ascii(substr(text, i+{j}, 1))::BIGINT"
        f" * {pow(WINNOW_B, k - 1 - j, WINNOW_M)}"
        for j in range(k))
    return f"""
        WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        pos AS (SELECT doc_id, text,
                  unnest(generate_series(1, n - {k - 1})) AS i
                FROM d WHERE n >= {k}),
        kg AS (SELECT doc_id, i, ({terms}) % {WINNOW_M} AS h FROM pos),
        wm AS (SELECT doc_id, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mn,
                 count(*) OVER (PARTITION BY doc_id) AS ng
               FROM kg),
        sel AS (SELECT DISTINCT doc_id, mn FROM wm
                WHERE i <= greatest(1, ng - {w} + 1)),
        fp AS (SELECT doc_id, bit_xor(mn) AS fpv FROM sel GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(fp.fpv, 0)::UBIGINT AS winnow_fp
        FROM d LEFT JOIN fp USING (doc_id)"""


_JACCARD_SQL = r"""
    WITH ts AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(text), '\S+')) AS w
      FROM documents),
    cnt AS (SELECT doc_id, count(*) AS n FROM ts GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM ts a JOIN ts b USING (w)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT da AS doc_a, db AS doc_b
    FROM inter
    JOIN cnt ca ON ca.doc_id = da
    JOIN cnt cb ON cb.doc_id = db
    WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8"""

_SIMHASH_CTE = """
    WITH tok AS (SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(lower(text), '\\S+')) AS w
                 FROM documents),
    th AS (SELECT doc_id, md5_number_upper(w) AS h FROM tok),
    bt AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1
                                      THEN 1 ELSE -1 END) AS v
           FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
           GROUP BY doc_id, b),
    sig AS (SELECT doc_id,
              COALESCE(bit_or(CASE WHEN v > 0 THEN 1::UBIGINT << b END),
                       0)::UBIGINT AS sh
            FROM bt GROUP BY doc_id),
    allsig AS (SELECT d.doc_id, COALESCE(s.sh, 0)::UBIGINT AS sh
               FROM documents d LEFT JOIN sig s USING (doc_id))"""

_SIMHASH_SQL = _SIMHASH_CTE + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
    FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3"""

_SIMHASH_BIT_BALANCE_SQL = _SIMHASH_CTE + """
    SELECT bb.b::BIGINT AS bit,
           sum(((sh >> bb.b) & 1))::BIGINT AS n_ones
    FROM allsig CROSS JOIN
         (SELECT unnest(generate_series(0, 63)) AS b) bb
    GROUP BY 1"""


def _dup_clusters_sql(threshold: float = 0.8) -> str:
    """DuckDB twin of dedup.dup_clusters: recursive-CTE reachability over
    the minhash near-dup pairs, cluster_id = min reachable doc_id."""
    return f"""
        WITH RECURSIVE mh AS ({_minhash_sql(threshold)}),
        e AS (SELECT doc_a AS a, doc_b AS b FROM mh
              UNION ALL SELECT doc_b, doc_a FROM mh),
        r AS (
          SELECT doc_id AS d, doc_id AS m FROM documents
          UNION
          SELECT e.b AS d, r.m FROM r JOIN e ON e.a = r.d)
        SELECT d AS doc_id, min(m) AS cluster_id FROM r GROUP BY d"""


def _keep_best_sql(threshold: float = 0.8) -> str:
    """DuckDB twin of clean.dedup_keep_best: minhash near-dup clusters
    (recursive-CTE reachability, min-id label) joined to whitespace token
    counts; survivor = rank-1 under (n_tokens DESC, doc_id)."""
    return rf"""
        WITH RECURSIVE mh AS ({_minhash_sql(threshold)}),
        e AS (SELECT doc_a AS a, doc_b AS b FROM mh
              UNION ALL SELECT doc_b, doc_a FROM mh),
        r AS (
          SELECT doc_id AS d, doc_id AS m FROM documents
          UNION
          SELECT e.b AS d, r.m FROM r JOIN e ON e.a = r.d),
        cl AS (SELECT d AS doc_id, min(m) AS cluster_id FROM r GROUP BY d),
        tok AS (SELECT doc_id,
                  length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
                FROM documents)
        SELECT cluster_id, doc_id, n_tokens FROM (
          SELECT cl.cluster_id, cl.doc_id, tok.n_tokens,
                 row_number() OVER (PARTITION BY cl.cluster_id
                                    ORDER BY tok.n_tokens DESC,
                                             cl.doc_id) AS rn
          FROM cl JOIN tok USING (doc_id))
        WHERE rn = 1"""


def _clean_corpus_sql(min_words: int = 20, lang: str = "en",
                      threshold: float = 0.8) -> str:
    """DuckDB twin of clean.clean_corpus: quality + langid filter, exact
    md5 dedup among the filtered set, MinHash near-dup clusters over the
    full corpus, min surviving doc per cluster."""
    return f"""
        WITH RECURSIVE
        lid AS ({_langid_sql()}),
        mh AS ({_minhash_sql(threshold)}),
        e AS (SELECT doc_a AS a, doc_b AS b FROM mh
              UNION ALL SELECT doc_b, doc_a FROM mh),
        r AS (
          SELECT doc_id AS d, doc_id AS m FROM documents
          UNION
          SELECT e.b AS d, r.m FROM r JOIN e ON e.a = r.d),
        cl AS (SELECT d AS doc_id, min(m) AS cluster_id FROM r GROUP BY d),
        filt AS (
          SELECT d.doc_id, d.text
          FROM documents d JOIN lid USING (doc_id)
          WHERE length(regexp_extract_all(d.text, '\\S+')) >= {min_words}
            AND lid.pred_lang = '{lang}'),
        ex AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY md5(text))
        SELECT c.cluster_id AS cluster_id, min(x.doc_id) AS doc_id
        FROM ex x JOIN cl c USING (doc_id)
        GROUP BY c.cluster_id"""


def _gate_funnel_sql(min_words: int, lang: str, threshold: float) -> str:
    """DuckDB twin of clean.gate_funnel — survivor counts after each
    successive clean_corpus gate (same CTE machinery as the clean twin)."""
    return f"""
        WITH RECURSIVE
        lid AS ({_langid_sql()}),
        mh AS ({_minhash_sql(threshold)}),
        e AS (SELECT doc_a AS a, doc_b AS b FROM mh
              UNION ALL SELECT doc_b, doc_a FROM mh),
        r AS (
          SELECT doc_id AS d, doc_id AS m FROM documents
          UNION
          SELECT e.b AS d, r.m FROM r JOIN e ON e.a = r.d),
        cl AS (SELECT d AS doc_id, min(m) AS cluster_id FROM r GROUP BY d),
        toks AS (SELECT doc_id, text,
                   length(regexp_extract_all(text, '\\S+')) AS n
                 FROM documents),
        g1 AS (SELECT doc_id, text FROM toks WHERE n >= {min_words}),
        g2 AS (SELECT g1.doc_id, g1.text FROM g1 JOIN lid USING (doc_id)
               WHERE lid.pred_lang = '{lang}'),
        g3 AS (SELECT min(doc_id) AS doc_id FROM g2 GROUP BY md5(text)),
        g4 AS (SELECT min(x.doc_id) AS doc_id FROM g3 x
               JOIN cl c USING (doc_id) GROUP BY c.cluster_id)
        SELECT 0::BIGINT AS gate,
               (SELECT count(*) FROM documents)::BIGINT AS n_docs
        UNION ALL SELECT 1::BIGINT, count(*)::BIGINT FROM g1
        UNION ALL SELECT 2::BIGINT, count(*)::BIGINT FROM g2
        UNION ALL SELECT 3::BIGINT, count(*)::BIGINT FROM g3
        UNION ALL SELECT 4::BIGINT, count(*)::BIGINT FROM g4"""


def _gopher_sql() -> str:
    """DuckDB twin of textstats.gopher_quality (stopword list shared with
    the engine kernel so the two can't drift)."""
    from go_scrapper_ray.pipelines.textstats import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
                   FROM documents),
        m AS (SELECT doc_id,
                len(toks)::BIGINT AS n_words,
                COALESCE(list_aggregate(
                    list_transform(toks, x -> length(x)), 'sum'),
                  0)::BIGINT AS sum_word_len,
                len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
                  AS n_alpha_words,
                len(list_filter(toks,
                    x -> lower(x) IN ({sw})))::BIGINT AS n_stop_hits
              FROM d)
        SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stop_hits,
               (n_words BETWEEN 50 AND 100000
                AND 3 * n_words <= sum_word_len
                AND sum_word_len <= 10 * n_words
                AND 5 * n_alpha_words >= 4 * n_words
                AND n_stop_hits >= 2) AS keep
        FROM m"""


_PII_SQL = r"""
    WITH a AS (SELECT doc_id,
        text || ' Contact u' || doc_id || '@mail-' || (doc_id % 7)
             || '.example.com or https://host-' || (doc_id % 13)
             || '.example.org/p/' || doc_id || '?s=1 at 10.'
             || (doc_id % 200) || '.' || (doc_id % 100) || '.'
             || (doc_id % 50) || ' now' AS t0
      FROM documents),
    u AS (SELECT doc_id,
            length(regexp_extract_all(t0, 'https?://[^\s]+'))::BIGINT
              AS n_urls,
            regexp_replace(t0, 'https?://[^\s]+', '<URL>', 'g') AS t1
          FROM a),
    e AS (SELECT doc_id, n_urls,
            length(regexp_extract_all(t1,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
              AS n_emails,
            regexp_replace(t1,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g') AS t2
          FROM u)
    SELECT doc_id,
           regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                          '<IP>', 'g') AS clean_text,
           n_urls, n_emails,
           length(regexp_extract_all(t2,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips
    FROM e"""


_TOPK_NGRAMS_SQL = r"""
    WITH d AS (SELECT regexp_extract_all(lower(text), '\S+') AS toks
               FROM documents),
    pos AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM d WHERE len(toks) >= 2),
    g AS (SELECT toks[i] || ' ' || toks[i + 1] AS gram FROM pos),
    c AS (SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram)
    SELECT gram, n FROM c ORDER BY n DESC, gram LIMIT 100"""


_CHUNK_DEDUP_SQL = r"""
    WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
               FROM documents),
    pos AS (SELECT doc_id, toks,
              unnest(generate_series(0, (len(toks) + 9) // 10 - 1)) AS j
            FROM d WHERE len(toks) >= 1),
    ch AS (SELECT doc_id,
             md5(array_to_string(toks[10*j + 1 : 10*j + 10], ' '))
               AS chunk_hash
           FROM pos)
    SELECT chunk_hash, min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
    FROM ch GROUP BY chunk_hash"""


_ASOF_SQL = """
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click'),
    j AS (SELECT p.event_id, p.user_id, p.ts_us,
            c.event_id AS prior_event_id, c.ts_us AS prior_ts_us,
            row_number() OVER (PARTITION BY p.event_id
                               ORDER BY c.ts_us DESC, c.event_id DESC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us)
    SELECT event_id, user_id, ts_us, prior_event_id, prior_ts_us,
           (ts_us - prior_ts_us)::BIGINT AS gap_us
    FROM j WHERE rn = 1"""


_FUNNEL_SQL = """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
               WHERE event_type IN ('view', 'click', 'purchase')),
    u AS (SELECT user_id,
            (count(*) FILTER (WHERE event_type = 'view'))::BIGINT AS n_views,
            (count(*) FILTER (WHERE event_type = 'click'))::BIGINT
              AS n_clicks,
            (count(*) FILTER (WHERE event_type = 'purchase'))::BIGINT
              AS n_purchases,
            min(ts_us) FILTER (WHERE event_type = 'view') AS first_view_us
          FROM e GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts_us) AS first_click_after_view_us
          FROM e JOIN u USING (user_id)
          WHERE e.event_type = 'click' AND e.ts_us >= u.first_view_us
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts_us) AS first_purchase_us
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase'
            AND e.ts_us >= c.first_click_after_view_us
          GROUP BY e.user_id)
    SELECT u.user_id, u.n_views, u.n_clicks, u.n_purchases,
           COALESCE(u.first_view_us, -1)::BIGINT AS first_view_us,
           COALESCE(c.first_click_after_view_us, -1)::BIGINT
             AS first_click_after_view_us,
           COALESCE(p.first_purchase_us, -1)::BIGINT AS first_purchase_us
    FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""


_RANGE_JOIN_SQL = """
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, epoch_us(ts) AS ts_us,
            CAST(round(value * 100) AS BIGINT) AS cents FROM events
          WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts_us,
           count(c.ts_us)::BIGINT AS n_clicks_1h,
           COALESCE(sum(c.cents), 0)::BIGINT AS click_cents_1h
    FROM p LEFT JOIN c ON c.user_id = p.user_id
      AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us < p.ts_us
    GROUP BY p.event_id, p.user_id, p.ts_us"""


_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
      sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
      sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        AS sum_base_c,
      sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          )::BIGINT AS sum_disc_c,
      sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
               AS BIGINT))::BIGINT AS sum_charge_c,
      count(*)::BIGINT AS n_rows
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""


_NORMALIZE_SQL = r"""
    WITH n AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ',
                                           'g'),
             '\s+', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text, length(norm_text)::BIGINT AS n_chars_norm
    FROM n"""


def _sig_default(fn, name: str):
    """The engine function's own default for ``name`` — twins generated
    through this cannot desynchronize from the Python side (ADVICE r2:
    one constant drives both engine and oracle)."""
    import inspect

    return inspect.signature(fn).parameters[name].default


def _train_shards_sql(n_shards: int) -> str:
    return f"""
    WITH h AS (SELECT doc_id, md5_number_upper(doc_id::VARCHAR) AS h
               FROM documents)
    SELECT doc_id, (h % {n_shards})::INTEGER AS shard,
           (row_number() OVER (PARTITION BY h % {n_shards}
                               ORDER BY h, doc_id) - 1)::BIGINT AS pos
    FROM h"""


def _mixture_quota_sql(per_source: int) -> str:
    return f"""
    WITH h AS (SELECT doc_id, source,
                      md5_number_upper(doc_id::VARCHAR) AS h
               FROM documents)
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY h, doc_id) AS rn
        FROM h)
    WHERE rn <= {per_source}"""


def _sample_sql(mod: int, keep: int) -> str:
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE md5_number_upper(doc_id::VARCHAR) % {mod} = {keep}"""


def _lsh_code_sql(n_tables: int, n_bits: int, dims: int) -> str:
    """DuckDB twin of similarity.lsh_code (md5-parity ±1 hyperplanes over
    1/1000-quantized components)."""
    return f"""
            WITH q AS (SELECT vec_id,
                         list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                     AS BIGINT)) AS qv
                       FROM embeddings),
                 sgn AS (SELECT r1.range AS t, r2.range AS b, r3.range AS d,
                           CASE WHEN md5_number_upper(
                                  r1.range::VARCHAR || '_' ||
                                  r2.range::VARCHAR || '_' ||
                                  r3.range::VARCHAR) % 2 = 0
                                THEN 1 ELSE -1 END AS s
                         FROM range({n_tables}) r1, range({n_bits}) r2,
                              range({dims}) r3),
                 comp AS (SELECT vec_id,
                            generate_subscripts(qv, 1) - 1 AS d,
                            unnest(qv) AS v
                          FROM q),
                 dots AS (SELECT c.vec_id, s.t, s.b, sum(s.s * c.v) AS dot
                          FROM comp c JOIN sgn s USING (d)
                          GROUP BY 1, 2, 3)
            SELECT vec_id, t::BIGINT AS table_id,
                   sum(CASE WHEN dot >= 0
                            THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS code
            FROM dots GROUP BY 1, 2"""


def _knn_text_sql(k: int, query_stride: int, dim: int) -> str:
    r"""DuckDB twin of textstats.knn_text — feature-hashed bag-of-words
    (md5 % dim exact counts, the topic_clusters featurization), full
    query × candidate domain (CROSS JOIN + COALESCE so zero-overlap and
    empty-doc pairs rank identically to the engine), and the bit-exact
    integer rational rank key (``_ikey_sql``)."""
    return f"""
        WITH comp AS MATERIALIZED (
          SELECT doc_id,
                 CAST(md5_number_upper(w) % {dim} AS BIGINT) AS d,
                 count(*)::BIGINT AS v
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\S+')) AS w
                FROM documents)
          GROUP BY 1, 2),
        nrm AS (SELECT doc_id, sum(v * v)::BIGINT AS ssq
                FROM comp GROUP BY 1),
        q AS (SELECT doc_id AS qid FROM documents
              WHERE doc_id % {query_stride} = 0),
        dd0 AS (SELECT a.doc_id AS qid, b.doc_id AS nid,
                  sum(a.v * b.v)::BIGINT AS dot
                FROM comp a JOIN comp b USING (d)
                WHERE a.doc_id % {query_stride} = 0
                  AND b.doc_id <> a.doc_id
                GROUP BY 1, 2),
        pairs AS (SELECT q.qid, e.doc_id AS nid
                  FROM q, documents e WHERE e.doc_id <> q.qid),
        dd AS (SELECT p.qid, p.nid,
                 COALESCE(d0.dot, 0)::BIGINT AS dot,
                 COALESCE(n.ssq, 0)::BIGINT AS ssq
               FROM pairs p
               LEFT JOIN dd0 d0 ON d0.qid = p.qid AND d0.nid = p.nid
               LEFT JOIN nrm n ON n.doc_id = p.nid),
        scored AS (SELECT qid, nid,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY {_ikey_sql('dot', 'ssq')} DESC, nid)
                       AS rnk
                   FROM dd)
        SELECT qid AS query_id, rnk, nid AS neighbor_id
        FROM scored WHERE rnk <= {k}"""


_MEDIA_DECODE_REAL_SQL = """
    WITH m AS (SELECT doc_id AS media_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      ELSE 'audio' END AS kind,
                 CASE WHEN doc_id % 3 = 0
                      THEN (64 + (doc_id % 8) * 16)
                           * (64 + (doc_id % 5) * 16)
                      ELSE (doc_id % 30) * 1000 END AS n
               FROM documents WHERE doc_id % 3 IN (0, 1)),
    g AS (SELECT media_id, kind, unnest(range(n)) AS i FROM m),
    u AS (SELECT media_id, kind,
            CASE WHEN kind = 'image'
                 THEN (media_id * 31 + 7 * i) % 256
                 ELSE ((media_id * 13 + 5 * i) % 65536) - 32768
            END AS v
          FROM g),
    s AS (SELECT media_id, sum(v)::BIGINT AS su,
                 sum(v * v)::BIGINT AS sq
          FROM u GROUP BY 1)
    SELECT m.media_id, m.kind, m.n::BIGINT AS n_units,
           COALESCE(s.su, 0)::BIGINT AS unit_sum,
           COALESCE(s.sq, 0)::BIGINT AS unit_sqsum
    FROM m LEFT JOIN s USING (media_id)"""


def _rp_sketch_sql(k: int, dims: int) -> str:
    """DuckDB twin of similarity.rp_sketch (md5-parity ±1 sign projection,
    salt "rp_", table index fixed at 0; exact int64 sums over the
    1/1000-quantized components)."""
    return f"""
            WITH q AS (SELECT vec_id,
                         list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                     AS BIGINT)) AS qv
                       FROM embeddings),
                 sgn AS (SELECT r2.range AS j, r3.range AS d,
                           CASE WHEN md5_number_upper('rp_0_' ||
                                  r2.range::VARCHAR || '_' ||
                                  r3.range::VARCHAR) % 2 = 0
                                THEN 1 ELSE -1 END AS sg
                         FROM range({k}) r2, range({dims}) r3),
                 comp AS (SELECT vec_id,
                            generate_subscripts(qv, 1) - 1 AS d,
                            unnest(qv) AS v
                          FROM q)
            SELECT c.vec_id, sgn.j::BIGINT AS comp,
                   sum(sgn.sg * c.v)::BIGINT AS s
            FROM comp c JOIN sgn USING (d) GROUP BY 1, 2"""


def _ivf_assign_sql(n_centroids: int) -> str:
    """DuckDB twin of similarity.ivf_assign (centroids = the n smallest
    vec_ids; int dot products in quantized 1/1000 space)."""
    return f"""
            WITH q AS (SELECT vec_id,
                         list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                     AS DOUBLE)) AS qv
                       FROM embeddings),
                 c AS (SELECT vec_id AS cid, qv AS cv FROM q
                       ORDER BY vec_id LIMIT {n_centroids}),
                 s AS (SELECT q.vec_id, c.cid,
                              CAST(list_inner_product(q.qv, c.cv)
                                   AS BIGINT) AS score
                       FROM q CROSS JOIN c)
            SELECT vec_id, cid AS list_id, score
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cid) AS rn FROM s)
            WHERE rn = 1"""


def _media_features_sql(bins: int) -> str:
    """DuckDB twin of multimodal.media_features (decode='fake'): payloads
    are the utf-8 bytes of ASCII fixture text, so the byte histogram /
    byte sum equal codepoint aggregates; the 16→bins resize regroup is
    equivalent to bucketing by cp // (256 // bins)."""
    div = 256 // bins
    fcols = ",\n          ".join(
        f"count(*) FILTER (WHERE cp // {div} = {j})::BIGINT AS f{j}"
        for j in range(bins))
    fsel = ", ".join(f"coalesce(a.f{j}, 0)::BIGINT AS f{j}"
                     for j in range(bins))
    return f"""
        WITH m AS (SELECT doc_id AS media_id,
                     CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS kind,
                     text FROM documents),
        posi AS (SELECT media_id, text,
                   unnest(generate_series(1, length(text))) AS i FROM m),
        ch AS (SELECT media_id, ascii(substr(text, i, 1)) AS cp FROM posi),
        agg AS (SELECT media_id, sum(cp)::BIGINT AS byte_sum,
          {fcols}
                FROM ch GROUP BY media_id)
        SELECT m.media_id, m.kind, strlen(m.text)::BIGINT AS payload_len,
               coalesce(a.byte_sum, 0)::BIGINT AS byte_sum, {fsel}
        FROM m LEFT JOIN agg a USING (media_id)"""


def _frame_sample_sql(every_ms: int) -> str:
    """DuckDB twin of multimodal.frame_sample: video rows (doc_id%3=2),
    one row per ``every_ms`` offset below duration, md5(text || '_' ||
    off) == the engine's md5 over payload-bytes + b"_<off>"."""
    return f"""
        WITH m AS (SELECT doc_id AS media_id, text,
                     ((doc_id % 30) * 1000) AS dur
                   FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT media_id, text, unnest(range(0, dur, {every_ms})) AS off
              FROM m WHERE dur > 0)
        SELECT media_id, off::INTEGER AS frame_off_ms,
               md5(text || '_' || off::VARCHAR) AS frame_hash
        FROM f"""


def _anomaly_sql(z: int) -> str:
    """DuckDB twin of events.anomaly_flags — the same exact-integer
    variance test in HUGEINT."""
    z2 = z * z
    return f"""
        WITH c AS (SELECT event_id, event_type,
                     CAST(round(value*100) AS BIGINT) AS cents FROM events),
        st AS (SELECT event_type, count(*)::HUGEINT AS n,
                 sum(cents)::HUGEINT AS s,
                 sum(cents::HUGEINT * cents)::HUGEINT AS ss
               FROM c GROUP BY 1)
        SELECT c.event_id, c.event_type, c.cents,
               ((st.n * c.cents - st.s) * (st.n * c.cents - st.s))
                 > {z2} * st.n * (st.n * st.ss - st.s * st.s) AS is_outlier
        FROM c JOIN st USING (event_type)"""


def _late_sql(allowed_s: int) -> str:
    allowed_us = 1_000_000 * allowed_s
    return f"""
        WITH w AS (SELECT user_id, epoch_us(ts) AS us,
                     max(epoch_us(ts)) OVER (PARTITION BY user_id
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prior_max
                   FROM events)
        SELECT user_id, count(*)::BIGINT AS n_events,
               count(*) FILTER (WHERE prior_max IS NOT NULL
                                AND us < prior_max - {allowed_us})::BIGINT
                 AS n_late
        FROM w GROUP BY user_id"""


_CHEAPEST_SUPPLIER_SQL = """
    WITH li AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
                  CAST(l_quantity AS BIGINT) AS qty
                FROM lineitem),
    r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
            ORDER BY cents::DOUBLE / qty::DOUBLE, cents, s_suppkey) AS rn
          FROM li)
    SELECT r.p_partkey, r.s_suppkey, s.s_name, r.cents
    FROM r JOIN supplier s USING (s_suppkey) WHERE rn = 1"""


def _brand_supplier_sql(type_prefix: str) -> str:
    return f"""
        SELECT p_brand, p_size,
               count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE NOT starts_with(p_type, '{type_prefix}')
        GROUP BY 1, 2"""


def _pq_cte_prefix(n_sub: int, n_codes: int) -> str:
    """Shared PQ CTE prefix (codebook pick + per-subspace exact int
    squared-L2 + the per-(vec, subspace) winner) for the pq_assign and
    pq_distortion twins."""
    from go_scrapper_ray.pipelines.similarity import EMB_DIMS

    sd = EMB_DIMS // n_sub
    return f"""
        WITH q AS (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                 AS BIGINT)) AS qq
                   FROM embeddings),
        cb0 AS (SELECT vec_id AS cid0, qq AS cv FROM q
                ORDER BY vec_id LIMIT {n_codes}),
        cb AS (SELECT row_number() OVER (ORDER BY cid0) - 1 AS code, cv
               FROM cb0),
        sub AS (SELECT unnest(range({n_sub})) AS s),
        d AS (SELECT q.vec_id, sub.s, cb.code,
                CAST(list_inner_product(
                       q.qq[sub.s*{sd}+1 : sub.s*{sd}+{sd}],
                       q.qq[sub.s*{sd}+1 : sub.s*{sd}+{sd}])
                 - 2*list_inner_product(
                       q.qq[sub.s*{sd}+1 : sub.s*{sd}+{sd}],
                       cb.cv[sub.s*{sd}+1 : sub.s*{sd}+{sd}])
                 + list_inner_product(
                       cb.cv[sub.s*{sd}+1 : sub.s*{sd}+{sd}],
                       cb.cv[sub.s*{sd}+1 : sub.s*{sd}+{sd}])
                     AS BIGINT) AS d2
              FROM q CROSS JOIN sub CROSS JOIN cb),
        pick AS (SELECT vec_id, s, code, d2,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY d2, code) AS rn
                 FROM d)"""


def _pq_assign_sql(n_sub: int, n_codes: int) -> str:
    """DuckDB twin of similarity.pq_assign: same deterministic codebook
    pick, exact int squared-L2 per subspace via list slices."""
    return _pq_cte_prefix(n_sub, n_codes) + """
        SELECT vec_id, s::BIGINT AS subspace, code::BIGINT AS code,
               d2::BIGINT AS dist
        FROM pick WHERE rn = 1"""


def _pq_distortion_sql(n_sub: int, n_codes: int) -> str:
    """DuckDB twin of similarity.pq_distortion: per-vector sum of the
    winning subspace distances next to the vector's quantized ssq."""
    return _pq_cte_prefix(n_sub, n_codes) + """,
        nrm AS (SELECT vec_id,
                  CAST(list_inner_product(qq, qq) AS BIGINT) AS ssq
                FROM q)
        SELECT p.vec_id, n.ssq, sum(p.d2)::BIGINT AS distortion
        FROM pick p JOIN nrm n USING (vec_id)
        WHERE p.rn = 1 GROUP BY 1, 2"""


def _split_sql(val_pct: int, test_pct: int) -> str:
    train_hi = 100 - val_pct - test_pct
    val_hi = 100 - test_pct
    return f"""
        SELECT doc_id, lang,
          CASE WHEN md5_number_upper(doc_id::VARCHAR) % 100 < {train_hi}
                 THEN 'train'
               WHEN md5_number_upper(doc_id::VARCHAR) % 100 < {val_hi}
                 THEN 'val'
               ELSE 'test' END AS split
        FROM documents"""


def _ikey_sql(dd: str, ssq: str) -> str:
    """The BIT-EXACT cosine rank key as a HUGEINT SQL expression — the
    DuckDB side of similarity._rational_key: sign(d)·((d²·10¹²)//ssq).
    The division runs on a NONNEGATIVE numerator on both sides (DuckDB //
    truncates, Python // floors — identical there), so engine and twin
    compute the same integer and ranks cannot drift on near-ties.
    ssq=0 (zero vector) pins to -(2^127-1), ranking last."""
    body = (f"(({dd})::HUGEINT * ({dd})::HUGEINT * 1000000000000::HUGEINT)"
            f" // ({ssq})::HUGEINT")
    return (f"(CASE WHEN ({ssq}) = 0 THEN "
            f"-170141183460469231731687303715884105727::HUGEINT "
            f"WHEN ({dd}) < 0 THEN -({body}) ELSE ({body}) END)")


def _knn_lsh_sql(k: int, query_stride: int, n_planes: int,
                 n_tables: int) -> str:
    """DuckDB twin of similarity.knn_lsh — the FULL retrieval: md5-parity
    ±1 hyperplanes, int-quantized bucket codes (bit-exact candidate sets),
    bucket + hamming-1 probes meeting corpus codes on (table_id, code),
    and the bit-exact integer rational rank key (``_ikey_sql``) over the
    quantized vectors — candidates AND ranks are strict-hash exact."""
    from go_scrapper_ray.pipelines.similarity import EMB_DIMS, KNN_LSH_SALT

    return f"""
        WITH qv AS (SELECT vec_id,
                      list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                  AS BIGINT)) AS qq
                    FROM embeddings),
        sgn AS (SELECT r1.range AS t, r2.range AS b, r3.range AS d,
                  CASE WHEN md5_number_upper('{KNN_LSH_SALT}' ||
                         r1.range::VARCHAR || '_' || r2.range::VARCHAR ||
                         '_' || r3.range::VARCHAR) % 2 = 0
                       THEN 1 ELSE -1 END AS s
                FROM range({n_tables}) r1, range({n_planes}) r2,
                     range({EMB_DIMS}) r3),
        comp AS (SELECT vec_id, generate_subscripts(qq, 1) - 1 AS d,
                        unnest(qq) AS v
                 FROM qv),
        dots AS (SELECT c.vec_id, s.t, s.b, sum(s.s * c.v) AS dot
                 FROM comp c JOIN sgn s USING (d) GROUP BY 1, 2, 3),
        codes AS (SELECT vec_id, t AS table_id,
                    sum(CASE WHEN dot >= 0
                             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS code
                  FROM dots GROUP BY 1, 2),
        qprobe AS (SELECT c.vec_id AS query_id, c.table_id,
                     CASE WHEN j.range = {n_planes} THEN c.code
                          ELSE xor(c.code, (1::BIGINT << j.range)) END AS code
                   FROM codes c, range({n_planes} + 1) j
                   WHERE c.vec_id % {query_stride} = 0),
        cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
                 FROM qprobe q
                 JOIN codes c ON q.table_id = c.table_id AND q.code = c.code
                 WHERE c.vec_id <> q.query_id),
        nrm AS (SELECT vec_id, sum(v * v)::BIGINT AS ssq
                FROM comp GROUP BY 1),
        dd AS (SELECT cand.query_id, cand.neighbor_id,
                 sum(a.v * b.v)::BIGINT AS dot
               FROM cand
               JOIN comp a ON a.vec_id = cand.query_id
               JOIN comp b ON b.vec_id = cand.neighbor_id AND b.d = a.d
               GROUP BY 1, 2),
        scored AS (SELECT dd.query_id, dd.neighbor_id,
                     row_number() OVER (PARTITION BY dd.query_id
                       ORDER BY {_ikey_sql('dd.dot', 'n.ssq')} DESC,
                                dd.neighbor_id) AS rnk
                   FROM dd JOIN nrm n ON n.vec_id = dd.neighbor_id)
        SELECT query_id, rnk, neighbor_id FROM scored WHERE rnk <= {k}"""


def _ivf_kmeans_ctes(n_lists: int, sample_stride: int, iters: int,
                     query_stride: int, n_probe: int,
                     budgeted: bool = True) -> str:
    """Shared CTE prefix for the IVF twins (knn_ivf / knn_ivfpq): the
    unrolled integer k-means c0..c{iters}, corpus assignment fa and query
    probe table — exact int dots/sums throughout; the only float work per
    centroid update is one multiply, one correctly-rounded sqrt of an
    exact int, one divide, bit-identical to numpy.  The sample stride is
    the engine's BUDGETED effective stride (similarity.SAMPLE_BUDGET):
    GREATEST(stride, ceil(n/budget)) computed in exact integer SQL, so
    the twin stays correct at any corpus size."""
    from go_scrapper_ray.pipelines.similarity import SAMPLE_BUDGET

    if budgeted:
        sstr = (f"(SELECT greatest({sample_stride}, "
                f"(count(*) + {SAMPLE_BUDGET - 1}) // {SAMPLE_BUDGET}) "
                f"FROM embeddings)")
    else:  # the distributed full-corpus k-means: literal stride, no budget
        sstr = str(sample_stride)
    parts = [f"""
        WITH eq AS MATERIALIZED (SELECT vec_id,
                      list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                  AS BIGINT)) AS qq
                    FROM embeddings),
        comp AS MATERIALIZED (SELECT vec_id, generate_subscripts(qq, 1) - 1 AS d,
                        unnest(qq) AS v FROM eq),
        scomp AS MATERIALIZED (SELECT * FROM comp WHERE vec_id % {sstr} = 0),
        init AS MATERIALIZED (SELECT vec_id,
                   row_number() OVER (ORDER BY
                     md5_number_upper(vec_id::VARCHAR), vec_id) - 1 AS c
                 FROM eq WHERE vec_id % {sstr} = 0
                 ORDER BY md5_number_upper(vec_id::VARCHAR), vec_id
                 LIMIT {n_lists}),
        c0 AS MATERIALIZED (SELECT i.c, s.d, s.v AS val
               FROM init i JOIN scomp s ON s.vec_id = i.vec_id)"""]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f""",
        d{t} AS MATERIALIZED (SELECT s.vec_id, cc.c, sum(s.v * cc.val) AS dot
                 FROM scomp s JOIN c{p} cc USING (d) GROUP BY 1, 2),
        a{t} AS MATERIALIZED (SELECT vec_id, c FROM (
                   SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
                     ORDER BY dot DESC, c) AS rn FROM d{t}) WHERE rn = 1),
        m{t} AS MATERIALIZED (SELECT a.c, s.d, sum(s.v) AS sd
                 FROM a{t} a JOIN scomp s ON s.vec_id = a.vec_id
                 GROUP BY 1, 2),
        t{t} AS MATERIALIZED (SELECT c, sum(sd * sd) AS tt FROM m{t} GROUP BY c),
        c{t} AS MATERIALIZED (SELECT cp.c, cp.d,
                   CASE WHEN t.tt IS NULL OR t.tt = 0 THEN cp.val
                        ELSE CAST(round((1000.0 * COALESCE(m.sd, 0))
                                        / sqrt(t.tt))
                                  AS BIGINT) END AS val
                 FROM c{p} cp
                 LEFT JOIN m{t} m ON m.c = cp.c AND m.d = cp.d
                 LEFT JOIN t{t} t ON t.c = cp.c)""")
    parts.append(f""",
        fd AS MATERIALIZED (SELECT s.vec_id, cc.c, sum(s.v * cc.val) AS dot
               FROM comp s JOIN c{iters} cc USING (d) GROUP BY 1, 2),
        fr AS MATERIALIZED (SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
                 ORDER BY dot DESC, c) AS rn FROM fd),
        fa AS MATERIALIZED (SELECT vec_id, c AS list_id FROM fr WHERE rn = 1),
        probe AS (SELECT vec_id AS query_id, c AS list_id FROM fr
                  WHERE vec_id % {query_stride} = 0 AND rn <= {n_probe})""")
    return "".join(parts)


def _topic_clusters_sql(n_clusters: int, dim: int, iters: int) -> str:
    """DuckDB twin of textstats.topic_clusters — hashed bag-of-words
    counts + the unrolled full-corpus integer k-means.  Differences from
    _ivf_kmeans_ctes: comp comes from token hashing (sparse — absent
    (vec, d) pairs are implicit zeros, which the dot/sum joins handle
    exactly), c0 zero-fills via CROSS JOIN dims (an initial centroid
    from an empty doc must exist explicitly), and empty documents join
    back at the end with COALESCE cluster 0 (argmax of an all-zero dot
    row ties to the smallest centroid)."""
    parts = [rf"""
        WITH ids AS MATERIALIZED (SELECT doc_id AS vec_id FROM documents),
        comp AS MATERIALIZED (
          SELECT doc_id AS vec_id,
                 CAST(md5_number_upper(w) % {dim} AS BIGINT) AS d,
                 count(*)::BIGINT AS v
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\S+')) AS w
                FROM documents)
          GROUP BY 1, 2),
        init AS MATERIALIZED (SELECT vec_id,
                   row_number() OVER (ORDER BY
                     md5_number_upper(vec_id::VARCHAR), vec_id) - 1 AS c
                 FROM ids
                 ORDER BY md5_number_upper(vec_id::VARCHAR), vec_id
                 LIMIT {n_clusters}),
        dims AS (SELECT unnest(range({dim})) AS d),
        c0 AS MATERIALIZED (SELECT i.c, dims.d, COALESCE(s.v, 0) AS val
               FROM init i CROSS JOIN dims
               LEFT JOIN comp s ON s.vec_id = i.vec_id AND s.d = dims.d)"""]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f""",
        d{t} AS MATERIALIZED (SELECT s.vec_id, cc.c, sum(s.v * cc.val) AS dot
                 FROM comp s JOIN c{p} cc USING (d) GROUP BY 1, 2),
        a{t} AS MATERIALIZED (SELECT vec_id, c FROM (
                   SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
                     ORDER BY dot DESC, c) AS rn FROM d{t}) WHERE rn = 1),
        m{t} AS MATERIALIZED (SELECT a.c, s.d, sum(s.v) AS sd
                 FROM a{t} a JOIN comp s ON s.vec_id = a.vec_id
                 GROUP BY 1, 2),
        t{t} AS MATERIALIZED (SELECT c, sum(sd * sd) AS tt FROM m{t} GROUP BY c),
        c{t} AS MATERIALIZED (SELECT cp.c, cp.d,
                   CASE WHEN t.tt IS NULL OR t.tt = 0 THEN cp.val
                        ELSE CAST(round((1000.0 * COALESCE(m.sd, 0))
                                        / sqrt(t.tt))
                                  AS BIGINT) END AS val
                 FROM c{p} cp
                 LEFT JOIN m{t} m ON m.c = cp.c AND m.d = cp.d
                 LEFT JOIN t{t} t ON t.c = cp.c)""")
    parts.append(f""",
        fd AS MATERIALIZED (SELECT s.vec_id, cc.c, sum(s.v * cc.val) AS dot
               FROM comp s JOIN c{iters} cc USING (d) GROUP BY 1, 2),
        fa AS MATERIALIZED (SELECT vec_id, c AS list_id FROM (
                 SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dot DESC, c) AS rn FROM fd) WHERE rn = 1)
        SELECT ids.vec_id AS doc_id,
               COALESCE(fa.list_id, 0)::BIGINT AS cluster_id
        FROM ids LEFT JOIN fa ON fa.vec_id = ids.vec_id""")
    return "".join(parts)


def _bpe_pairs_sql(k: int) -> str:
    """DuckDB twin of textstats.bpe_pair_counts — adjacent character
    pairs inside lowercased \\S+ tokens, exact top-k."""
    return r"""
        WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '\S+'))
                        AS tok
                      FROM documents),
        pos AS (SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
                FROM toks WHERE length(tok) >= 2),
        p AS (SELECT substr(tok, i, 2) AS pair FROM pos),
        c AS (SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY pair)
        SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT """ + str(k)


def _length_outliers_sql(lo_q: float, hi_q: float) -> str:
    """DuckDB twin of textstats.length_outliers — per-language
    quantile_disc gates over \\S+ token counts."""
    return rf"""
        WITH n AS (SELECT doc_id, lang,
                     length(regexp_extract_all(text, '\S+'))::BIGINT
                       AS n_tokens
                   FROM documents),
        th AS (SELECT lang, quantile_disc(n_tokens, {lo_q}) AS lo,
                      quantile_disc(n_tokens, {hi_q}) AS hi
               FROM n GROUP BY lang)
        SELECT n.doc_id, n.lang, n.n_tokens,
               (n.n_tokens < th.lo OR n.n_tokens > th.hi) AS outlier
        FROM n JOIN th USING (lang)"""


def _kmeans_dist_sql(n_lists: int, iters: int) -> str:
    """DuckDB twin of similarity.kmeans_assign_dist — the FULL-CORPUS
    (stride 1, unbudgeted) unrolled integer k-means; the engine side
    runs the same math as one streaming assignment + component-sum
    aggregate per iteration, so the centroid trajectory and final
    assignment are bit-identical."""
    return _ivf_kmeans_ctes(n_lists, 1, iters, query_stride=1, n_probe=1,
                            budgeted=False) + """
        SELECT vec_id, list_id FROM fa"""


def _knn_ivf_sql(k: int, query_stride: int, n_lists: int, n_probe: int,
                 sample_stride: int, iters: int) -> str:
    """DuckDB twin of similarity.knn_ivf — the FULL retrieval including
    the quantizer fit (see _ivf_kmeans_ctes), then candidate join and
    the bit-exact integer rational rank key (``_ikey_sql``) over the
    quantized vectors — candidates AND ranks are strict-hash exact."""
    return _ivf_kmeans_ctes(n_lists, sample_stride, iters,
                            query_stride, n_probe) + f""",
        cand AS (SELECT DISTINCT p.query_id, f.vec_id AS neighbor_id
                 FROM probe p JOIN fa f ON f.list_id = p.list_id
                 WHERE f.vec_id <> p.query_id),
        nrm AS (SELECT vec_id, sum(v * v)::BIGINT AS ssq
                FROM comp GROUP BY 1),
        dd AS (SELECT cand.query_id, cand.neighbor_id,
                 sum(a.v * b.v)::BIGINT AS dot
               FROM cand
               JOIN comp a ON a.vec_id = cand.query_id
               JOIN comp b ON b.vec_id = cand.neighbor_id AND b.d = a.d
               GROUP BY 1, 2),
        scored AS (SELECT dd.query_id, dd.neighbor_id,
                     row_number() OVER (PARTITION BY dd.query_id
                       ORDER BY {_ikey_sql('dd.dot', 'n.ssq')} DESC,
                                dd.neighbor_id) AS rnk
                   FROM dd JOIN nrm n ON n.vec_id = dd.neighbor_id)
        SELECT query_id, rnk, neighbor_id FROM scored WHERE rnk <= {k}"""


def _gap_quantiles_sql() -> str:
    """DuckDB twin of events.gap_quantiles — lag-window inter-arrival
    gaps per user, quantile_disc legs (the _quantiles_sql shape)."""
    from go_scrapper_ray.pipelines.textstats import QUANTILES

    legs = [f"SELECT {int(round(q * 1000))}::BIGINT AS q_milli, "
            f"quantile_disc(gap_us, {q}) AS gap_us FROM g"
            for q in QUANTILES]
    return ("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id
                   FROM events),
        s AS (SELECT us - lag(us) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS gap FROM e),
        g AS (SELECT gap::BIGINT AS gap_us FROM s WHERE gap IS NOT NULL)
        """ + " UNION ALL ".join(legs))


def _strip_boilerplate_sql(k: int) -> str:
    """DuckDB twin of clean.strip_boilerplate (C4 common-lines APPLY) —
    also the ``st`` CTE of the docs_clean_text_corpus composition."""
    return r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                       FROM documents),
            pos AS (SELECT doc_id, toks,
                      unnest(generate_series(0, (len(toks) + 9) // 10 - 1))
                        AS j
                    FROM d WHERE len(toks) >= 1),
            ch AS (SELECT doc_id, j,
                     array_to_string(toks[10*j + 1 : 10*j + 10], ' ')
                       AS chunk
                   FROM pos),
            stats AS (SELECT md5(chunk) AS chunk_hash, chunk,
                        count(DISTINCT doc_id)::BIGINT AS df
                      FROM ch GROUP BY 1, 2),
            top AS (SELECT chunk_hash FROM stats
                    ORDER BY df DESC, chunk_hash LIMIT {k}),
            f AS (SELECT doc_id, j, chunk,
                    md5(chunk) IN (SELECT chunk_hash FROM top) AS bp
                  FROM ch),
            agg AS (SELECT doc_id,
                      coalesce(string_agg(chunk, ' ' ORDER BY j)
                               FILTER (WHERE NOT bp), '') AS clean_text,
                      sum(CASE WHEN bp THEN 1 ELSE 0 END)::BIGINT
                        AS n_dropped
                    FROM f GROUP BY doc_id)
            SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
                   coalesce(a.n_dropped, 0) AS n_dropped
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN agg a USING(doc_id)""".format(k=k)


def _window_top_user_sql(window_s: int) -> str:
    """DuckDB twin of events.window_top_user (windowed argmax by integer
    cents, ties → smaller user_id)."""
    return f"""
        WITH s AS (SELECT event_type,
                     epoch_us(ts) // {1_000_000 * window_s} AS window_id,
                     user_id,
                     sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
                   FROM events GROUP BY 1, 2, 3)
        SELECT event_type, window_id, user_id, cents FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, window_id
                      ORDER BY cents DESC, user_id) AS rn FROM s)
        WHERE rn = 1"""


def _heavy_hitters_sql(d: int, w: int, k: int) -> str:
    """DuckDB twin of events.heavy_hitters — the same count-min sketch
    (md5-bucketed counters, min across rows) in exact integers."""
    return f"""
        WITH ev AS (SELECT user_id FROM events),
        j AS (SELECT unnest(range({d})) AS j),
        cnt AS (SELECT j.j,
                  md5_number_upper('cm' || j.j::VARCHAR || '_'
                                   || user_id::VARCHAR) % {w} AS b,
                  count(*) AS n
                FROM ev CROSS JOIN j GROUP BY 1, 2),
        u AS (SELECT DISTINCT user_id FROM ev),
        est AS (SELECT u.user_id, min(c.n) AS n_est
                FROM u CROSS JOIN j
                JOIN cnt c ON c.j = j.j
                 AND c.b = md5_number_upper('cm' || j.j::VARCHAR || '_'
                                            || u.user_id::VARCHAR) % {w}
                GROUP BY 1)
        SELECT user_id, n_est::BIGINT AS n_est FROM est
        ORDER BY n_est DESC, user_id LIMIT {k}"""


def _semantic_dedup_sql(threshold: float, n_lists: int,
                        sample_stride: int, iters: int) -> str:
    """DuckDB twin of dedup.semantic_dedup — shared k-means CTEs, then
    per-cluster smaller-id cosine-duplicate check."""
    # probe CTE is unused here but harmless (shared prefix builder)
    return _ivf_kmeans_ctes(n_lists, sample_stride, iters,
                            1, 0) + f""",
        dropd AS (SELECT DISTINCT b.vec_id
                  FROM fa a JOIN fa b
                    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
                  JOIN embeddings ea ON ea.vec_id = a.vec_id
                  JOIN embeddings eb ON eb.vec_id = b.vec_id
                  WHERE list_cosine_similarity(ea.embedding, eb.embedding)
                        >= {threshold})
        SELECT fa.vec_id, fa.list_id,
               fa.vec_id NOT IN (SELECT vec_id FROM dropd) AS keep
        FROM fa"""


def _knn_ivfpq_sql(k: int, query_stride: int, n_lists: int, n_probe: int,
                   sample_stride: int, iters: int, n_sub: int,
                   n_codes: int, rerank: int) -> str:
    """DuckDB twin of similarity.knn_ivfpq — IVF coarse quantizer (shared
    k-means CTEs), PQ codebook fit + corpus encoding (exact int squared-L2
    per subspace), ADC candidate scoring (sum of the query's exact int
    subspace distances to each candidate's codes), top-``rerank`` by
    (adc, vec_id), then the bit-exact integer rational rank key
    (``_ikey_sql``) to top-k — candidates AND ranks strict-hash exact."""
    from go_scrapper_ray.pipelines.similarity import EMB_DIMS

    sd = EMB_DIMS // n_sub
    sl = f"[sub.s*{sd}+1 : sub.s*{sd}+{sd}]"
    return _ivf_kmeans_ctes(n_lists, sample_stride, iters,
                            query_stride, n_probe) + f""",
        cb0 AS (SELECT vec_id AS cid0, qq AS cv FROM eq
                ORDER BY vec_id LIMIT {n_codes}),
        cb AS MATERIALIZED (SELECT row_number() OVER (ORDER BY cid0) - 1
                              AS code, cv
               FROM cb0),
        sub AS (SELECT unnest(range({n_sub})) AS s),
        dall AS MATERIALIZED (SELECT eq.vec_id, sub.s, cb.code,
                CAST(list_inner_product(eq.qq{sl}, eq.qq{sl})
                 - 2*list_inner_product(eq.qq{sl}, cb.cv{sl})
                 + list_inner_product(cb.cv{sl}, cb.cv{sl})
                     AS BIGINT) AS d2
              FROM eq CROSS JOIN sub CROSS JOIN cb),
        pcode AS MATERIALIZED (SELECT vec_id, s, code FROM (
                   SELECT vec_id, s, code,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY d2, code) AS rn
                   FROM dall) WHERE rn = 1),
        cand AS (SELECT p.query_id, f.vec_id AS neighbor_id
                 FROM probe p JOIN fa f ON f.list_id = p.list_id
                 WHERE f.vec_id <> p.query_id),
        adc AS MATERIALIZED (SELECT c.query_id, c.neighbor_id,
                 sum(dq.d2) AS adc
               FROM cand c
               JOIN pcode pv ON pv.vec_id = c.neighbor_id
               JOIN dall dq ON dq.vec_id = c.query_id AND dq.s = pv.s
                           AND dq.code = pv.code
               GROUP BY 1, 2),
        topr AS (SELECT query_id, neighbor_id FROM (
                   SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY adc, neighbor_id) AS rn
                   FROM adc) WHERE rn <= {rerank}),
        nrm AS (SELECT vec_id, sum(v * v)::BIGINT AS ssq
                FROM comp GROUP BY 1),
        dd AS (SELECT t.query_id, t.neighbor_id,
                 sum(a.v * b.v)::BIGINT AS dot
               FROM topr t
               JOIN comp a ON a.vec_id = t.query_id
               JOIN comp b ON b.vec_id = t.neighbor_id AND b.d = a.d
               GROUP BY 1, 2),
        scored AS (SELECT dd.query_id, dd.neighbor_id,
                     row_number() OVER (PARTITION BY dd.query_id
                       ORDER BY {_ikey_sql('dd.dot', 'n.ssq')} DESC,
                                dd.neighbor_id) AS rnk
                   FROM dd JOIN nrm n ON n.vec_id = dd.neighbor_id)
        SELECT query_id, rnk, neighbor_id FROM scored WHERE rnk <= {k}"""


def _hopping_sql(window_s: int, hop_s: int) -> str:
    """DuckDB twin of events.hopping_counts (window/hop fan-out)."""
    fan = window_s // hop_s
    hop_us = 1_000_000 * hop_s
    return f"""
            WITH c AS (SELECT event_type, epoch_us(ts) AS us,
                         CAST(round(value*100) AS BIGINT) AS cents
                       FROM events),
            k AS (SELECT unnest(range({fan})) AS k)
            SELECT event_type,
                   (us // {hop_us} - k.k)::BIGINT AS window_id,
                   count(*)::BIGINT AS n,
                   sum(cents)::BIGINT AS cents
            FROM c CROSS JOIN k GROUP BY 1, 2"""


def _quantiles_sql() -> str:
    from go_scrapper_ray.pipelines.textstats import QUANTILES

    legs = [f"SELECT {int(round(q * 1000))}::BIGINT AS q_milli, "
            f"quantile_disc(n, {q}) AS n_tokens FROM tc"
            for q in QUANTILES]
    return (r"WITH tc AS (SELECT len(regexp_extract_all(text, '\S+'))::BIGINT"
            " AS n FROM documents) " + " UNION ALL ".join(legs))


_SHIP_PRIO_SQL = """
    SELECT l_orderkey,
      sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          )::BIGINT AS revenue_c,
      epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_c DESC, l_orderkey LIMIT 10"""


_DECONTAM_SQL = r"""
    WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks,
                 md5_number_upper(doc_id::VARCHAR) % 97 = 0 AS is_bench
               FROM documents),
    pos AS (SELECT doc_id, toks, is_bench,
              unnest(generate_series(1, len(toks) - 2)) AS i
            FROM d WHERE len(toks) >= 3),
    g AS (SELECT doc_id, is_bench,
            md5_number_upper(toks[i] || ' ' || toks[i + 1] || ' '
                             || toks[i + 2]) >> 3 AS gh
          FROM pos),
    bset AS (SELECT DISTINCT gh FROM g WHERE is_bench),
    hits AS (SELECT g.doc_id, count(DISTINCT g.gh)::BIGINT AS n_hits
             FROM g JOIN bset USING (gh) WHERE NOT g.is_bench
             GROUP BY g.doc_id)
    SELECT d.doc_id, COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM d LEFT JOIN hits h USING (doc_id) WHERE NOT d.is_bench"""


_EMB_NORM_SQL = """
    SELECT vec_id,
      list_aggregate(list_transform(embedding,
        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        'sum')::BIGINT AS sq_sum,
      len(embedding)::BIGINT AS n_dims
    FROM embeddings"""


def oracle_sql() -> dict[str, str]:
    from go_scrapper_ray.pipelines import (clean, dedup, events, multimodal,
                                           relational, similarity, textstats)

    return {
        "url_canonicalize": """
            WITH c AS (
              SELECT doc_id,
                'HTTPS://EXAMPLE-' || (doc_id % 97) || '.COM:443/doc/'
                  || doc_id || '?b=' || (doc_id % 7) || '&a='
                  || (doc_id % 3) || '#frag' || doc_id AS url,
                'https://example-' || (doc_id % 97) || '.com/doc/' || doc_id
                  || '?a=' || (doc_id % 3) || '&b=' || (doc_id % 7)
                  AS canon_url,
                'example-' || (doc_id % 97) || '.com' AS host
              FROM documents)
            SELECT doc_id, url, canon_url,
                   md5_number_upper(canon_url) AS url_hash, host
            FROM c""",
        "docs_langid": _langid_sql(),
        "docs_minhash_est": _lsh_cte_prefix() + f""",
            agree AS (SELECT c.da, c.db,
                        sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS eq
                      FROM cand c
                      JOIN mh a ON a.doc_id = c.da
                      JOIN mh b ON b.doc_id = c.db AND b.perm = a.perm
                      GROUP BY 1, 2)
            SELECT da AS doc_a, db AS doc_b,
                   (eq * 10000 // {dedup._N_PERM})::BIGINT AS est_bp
            FROM agree""",
        "docs_ngram_novelty": r"""
            WITH d AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '\S+') AS toks
                       FROM documents),
            pos AS (SELECT doc_id, toks,
                      unnest(generate_series(1, len(toks) - {km1})) AS i
                    FROM d WHERE len(toks) >= {k}),
            g AS (SELECT DISTINCT doc_id,
                    md5_number_upper({gram}) >> 3 AS gh
                  FROM pos),
            f AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY gh)
            SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN f.first_doc = g.doc_id
                            THEN 1 ELSE 0 END)::BIGINT AS n_novel
            FROM g JOIN f USING (gh) GROUP BY g.doc_id""".format(
            k=_sig_default(dedup.ngram_novelty, "k"),
            km1=_sig_default(dedup.ngram_novelty, "k") - 1,
            gram=" || ' ' || ".join(
                f"toks[i+{j}]" for j in range(
                    _sig_default(dedup.ngram_novelty, "k")))),
        "docs_minhash_dups": _minhash_sql(
            _sig_default(dedup.minhash_dups, "threshold")),
        "docs_dup_clusters": _dup_clusters_sql(
            _sig_default(dedup.dup_clusters, "threshold")),
        "docs_clean_corpus": _clean_corpus_sql(),
        "docs_dedup_keep_best": _keep_best_sql(),
        "docs_train_shards": _train_shards_sql(
            _sig_default(clean.train_shards, "n_shards")),
        "docs_mixture_quota": _mixture_quota_sql(
            _sig_default(textstats.mixture_quota, "per_source")),
        "docs_simhash_dups": _SIMHASH_SQL,
        "docs_winnow_fp": _winnow_sql(),
        "docs_lang_dist":
            "SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang",
        "docs_token_count": r"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
                   length(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::BIGINT AS n_bpeish
            FROM documents""",
        "docs_quality": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   length(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
                   length(regexp_extract_all(text, '[!-/:-@\[-`{-~]'))::BIGINT AS n_punct,
                   length(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
                   length(list_filter(regexp_extract_all(lower(text), '\S+'),
                       x -> x IN ('the','and','of','to','a','in','is','it',
                                  'that','for')))::BIGINT AS n_stopwords
            FROM documents""",
        "docs_fingerprint":
            "SELECT doc_id, md5(text) AS fp FROM documents",
        "docs_repetition": """
            WITH lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM documents),
            nz AS (SELECT doc_id, line FROM lines WHERE line <> ''),
            per AS (SELECT doc_id, line, count(*)::BIGINT AS c
                    FROM nz GROUP BY doc_id, line),
            agg AS (SELECT doc_id, sum(c)::BIGINT AS n_lines,
                           (sum(c) - count(*))::BIGINT AS n_dup_lines,
                           max(c)::BIGINT AS top_line_n
                    FROM per GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.n_lines, 0)::BIGINT AS n_lines,
                   COALESCE(a.n_dup_lines, 0)::BIGINT AS n_dup_lines,
                   COALESCE(a.top_line_n, 0)::BIGINT AS top_line_n
            FROM documents d LEFT JOIN agg a USING (doc_id)""",
        "docs_source_rollup": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars
            FROM documents GROUP BY source""",
        "docs_exact_dedup":
            "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id "
            "FROM documents GROUP BY md5(text)",
        "docs_chunk_dedup": _CHUNK_DEDUP_SQL,
        "docs_pii_scrub": _PII_SQL,
        "docs_gopher_quality": _gopher_sql(),
        "docs_topk_ngrams": _TOPK_NGRAMS_SQL,
        "events_asof_join": _ASOF_SQL,
        "events_funnel": _FUNNEL_SQL,
        "events_range_join": _RANGE_JOIN_SQL,
        "lineitem_pricing": _PRICING_SQL,
        "docs_normalize": _NORMALIZE_SQL,
        "docs_sample": _sample_sql(
            _sig_default(textstats.sample_stratified, "mod"),
            _sig_default(textstats.sample_stratified, "keep")),
        "docs_length_quantiles": _quantiles_sql(),
        "emb_norm_stats": _EMB_NORM_SQL,
        "emb_norm_outliers": """
            WITH s AS ({base}),
            q AS (SELECT quantile_disc(sq_sum, {lo}) AS lo,
                         quantile_disc(sq_sum, {hi}) AS hi FROM s)
            SELECT s.vec_id, s.sq_sum,
                   (s.sq_sum < q.lo OR s.sq_sum > q.hi) AS outlier
            FROM s, q""".format(
            base=_EMB_NORM_SQL,
            lo=_sig_default(similarity.norm_outliers, "lo_q"),
            hi=_sig_default(similarity.norm_outliers, "hi_q")),
        "shipping_priority": _SHIP_PRIO_SQL,
        "docs_decontaminate": _DECONTAM_SQL,
        "docs_jaccard_dups": _JACCARD_SQL,
        "docs_minhash_recall": f"""
            WITH ex AS ({_JACCARD_SQL}),
            sk AS ({{mh}}),
            u AS (SELECT doc_a, doc_b, max(e) AS e, max(s) AS s FROM (
                    SELECT doc_a, doc_b, 1 AS e, 0 AS s FROM ex
                    UNION ALL
                    SELECT doc_a, doc_b, 0, 1 FROM sk)
                  GROUP BY 1, 2)
            SELECT sum(e)::BIGINT AS n_exact, sum(s)::BIGINT AS n_sketch,
                   sum(e * s)::BIGINT AS n_both FROM u""".format(
            mh=_minhash_sql(
                _sig_default(dedup.minhash_recall, "threshold"))),
        "docs_collocations": r"""
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\S+') AS ws
                          FROM documents),
            pos AS (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2),
            big AS (SELECT ws[i] AS w1, ws[i+1] AS w2,
                      count(*)::BIGINT AS c2
                    FROM pos GROUP BY 1, 2),
            lm AS (SELECT w1, sum(c2)::BIGINT AS l FROM big GROUP BY 1),
            rm AS (SELECT w2, sum(c2)::BIGINT AS r FROM big GROUP BY 1),
            nn AS (SELECT sum(c2)::BIGINT AS n FROM big),
            sc AS (SELECT b.w1, b.w2, b.c2 AS n,
                     ((b.c2::HUGEINT * (SELECT n FROM nn)::HUGEINT
                       * 1000000::HUGEINT)
                      // (lm.l::HUGEINT * rm.r::HUGEINT))::BIGINT
                       AS score_e6
                   FROM big b JOIN lm USING (w1) JOIN rm USING (w2)
                   WHERE b.c2 >= {mc})
            SELECT w1, w2, n, score_e6 FROM sc
            ORDER BY score_e6 DESC, w1, w2 LIMIT {k}""".format(
            mc=_sig_default(textstats.collocations, "min_count"),
            k=_sig_default(textstats.collocations, "k")),
        "docs_char_entropy": """
            WITH d AS (SELECT doc_id, text, length(text) AS n
                       FROM documents WHERE length(text) > 0),
            ch AS (SELECT doc_id, n,
                     substr(text, unnest(generate_series(1, n)), 1) AS c
                   FROM d),
            cc AS (SELECT doc_id, n, c, count(*)::BIGINT AS v
                   FROM ch GROUP BY 1, 2, 3)
            SELECT doc_id, n::BIGINT AS n_chars,
                   sum(v * (length(bin(n // v)) - 1))::BIGINT
                     AS surprisal_bits
            FROM cc GROUP BY 1, 2""",
        "docs_source_entropy": r"""
            WITH c AS (SELECT source, count(*)::BIGINT AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS ns
                  FROM c)
            SELECT t.total AS n_docs, t.ns AS n_sources,
                   (SELECT sum(n * (length(bin(t.total // n)) - 1))
                    FROM c)::BIGINT AS surprisal_bits
            FROM t""",
        "supplier_hhi": """
            WITH r AS (SELECT l_suppkey,
                         sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100) AS BIGINT))::BIGINT AS c
                       FROM lineitem GROUP BY 1)
            SELECT count(*)::BIGINT AS n_suppliers,
                   sum(c)::BIGINT AS total_cents,
                   ((sum(c::HUGEINT * c::HUGEINT) * 100000000::HUGEINT)
                    // (sum(c)::HUGEINT * sum(c)::HUGEINT))::BIGINT
                     AS hhi_e8
            FROM r""",
        "emb_cosine_dups": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
        "docs_surprisal": r"""
            WITH tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\S+'))
                             AS token
                         FROM documents),
            n AS (SELECT count(*) AS nd FROM documents),
            df AS (SELECT token, count(DISTINCT doc_id) AS df
                   FROM tok GROUP BY 1)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   sum(strlen(bin((SELECT nd FROM n) // df.df)) - 1)::BIGINT
                     AS surprisal
            FROM tok t JOIN df USING (token) GROUP BY 1""",
        "events_anomaly": _anomaly_sql(
            _sig_default(events.anomaly_flags, "z")),
        "events_late": _late_sql(
            _sig_default(events.late_events, "allowed_s")),
        "cheapest_supplier": _CHEAPEST_SUPPLIER_SQL,
        "brand_supplier_counts": _brand_supplier_sql(
            _sig_default(relational.brand_supplier_counts, "type_prefix")),
        "emb_pq_distortion": _pq_distortion_sql(
            _sig_default(similarity.pq_distortion, "n_sub"),
            _sig_default(similarity.pq_distortion, "n_codes")),
        "emb_pq_assign": _pq_assign_sql(
            _sig_default(similarity.pq_assign, "n_sub"),
            _sig_default(similarity.pq_assign, "n_codes")),
        "docs_split": _split_sql(
            _sig_default(clean.train_val_test_split, "val_pct"),
            _sig_default(clean.train_val_test_split, "test_pct")),
        "media_features": _media_features_sql(
            _sig_default(multimodal.ResizeStage.__init__, "bins")),
        "media_frame_sample": _frame_sample_sql(
            _sig_default(multimodal.frame_sample, "every_ms")),
        "media_decode_real": _MEDIA_DECODE_REAL_SQL,
        "knn_lsh": _knn_lsh_sql(
            _sig_default(similarity.knn_lsh, "k"),
            _sig_default(similarity.knn_lsh, "query_stride"),
            _sig_default(similarity.knn_lsh, "n_planes"),
            _sig_default(similarity.knn_lsh, "n_tables")),
        "docs_gate_funnel": _gate_funnel_sql(
            _sig_default(clean.gate_funnel, "min_words"),
            _sig_default(clean.gate_funnel, "lang"),
            _sig_default(clean.gate_funnel, "threshold")),
        "events_window_top_user": _window_top_user_sql(
            _sig_default(events.window_top_user, "window_s")),
        "events_gap_quantiles": _gap_quantiles_sql(),
        "docs_simhash_bit_balance": _SIMHASH_BIT_BALANCE_SQL,
        "events_markov_entropy": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                         event_id FROM events),
            p AS (SELECT event_type AS from_type,
                    lead(event_type) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS to_type
                  FROM e),
            c AS (SELECT from_type, to_type, count(*)::BIGINT AS n
                  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT from_type, sum(n)::BIGINT AS n_total
                    FROM c GROUP BY 1)
            SELECT t.from_type, t.n_total,
                   sum(c.n * (length(bin(t.n_total // c.n)) - 1))::BIGINT
                     AS surprisal_bits
            FROM c JOIN tot t USING (from_type) GROUP BY 1, 2""",
        "events_active_days": """
            WITH ud AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day
                        FROM events),
            pu AS (SELECT user_id, count(*)::BIGINT AS n_days
                   FROM ud GROUP BY 1)
            SELECT n_days, count(*)::BIGINT AS n_users
            FROM pu GROUP BY 1""",
        "events_burstiness": """
            WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
                         count(*)::BIGINT AS c
                       FROM events GROUP BY 1, 2)
            SELECT user_id, count(*)::BIGINT AS n_hours,
                   sum(c)::BIGINT AS sum_c,
                   sum(c * c)::BIGINT AS sum_c_sq
            FROM h GROUP BY user_id""",
        "docs_heaps_stats": r"""
            WITH d AS (SELECT regexp_extract_all(lower(text), '\S+') AS w
                       FROM documents),
            s AS (SELECT len(w)::BIGINT AS l,
                         len(list_distinct(w))::BIGINT AS t FROM d)
            SELECT count(*)::BIGINT AS n_docs, sum(l)::BIGINT AS sum_len,
                   sum(t)::BIGINT AS sum_types,
                   sum(l * l)::BIGINT AS sum_len_sq,
                   sum(t * t)::BIGINT AS sum_types_sq,
                   sum(l * t)::BIGINT AS sum_len_types
            FROM s""",
        "events_heavy_hitters": _heavy_hitters_sql(
            _sig_default(events.heavy_hitters, "d"),
            _sig_default(events.heavy_hitters, "w"),
            _sig_default(events.heavy_hitters, "k")),
        "emb_semantic_dedup": _semantic_dedup_sql(
            _sig_default(dedup.semantic_dedup, "threshold"),
            _sig_default(dedup.semantic_dedup, "n_lists"),
            _sig_default(dedup.semantic_dedup, "sample_stride"),
            _sig_default(dedup.semantic_dedup, "iters")),
        "knn_ivfpq": _knn_ivfpq_sql(
            _sig_default(similarity.knn_ivfpq, "k"),
            _sig_default(similarity.knn_ivfpq, "query_stride"),
            _sig_default(similarity.knn_ivfpq, "n_lists"),
            _sig_default(similarity.knn_ivfpq, "n_probe"),
            _sig_default(similarity.knn_ivfpq, "sample_stride"),
            _sig_default(similarity.knn_ivfpq, "iters"),
            _sig_default(similarity.knn_ivfpq, "n_sub"),
            _sig_default(similarity.knn_ivfpq, "n_codes"),
            _sig_default(similarity.knn_ivfpq, "rerank")),
        "knn_ivf": _knn_ivf_sql(
            _sig_default(similarity.knn_ivf, "k"),
            _sig_default(similarity.knn_ivf, "query_stride"),
            _sig_default(similarity.knn_ivf, "n_lists"),
            _sig_default(similarity.knn_ivf, "n_probe"),
            _sig_default(similarity.knn_ivf, "sample_stride"),
            _sig_default(similarity.knn_ivf, "iters")),
        "emb_kmeans_dist": _kmeans_dist_sql(
            _sig_default(similarity.kmeans_assign_dist, "n_lists"),
            _sig_default(similarity.kmeans_assign_dist, "iters")),
        "docs_bpe_pairs": _bpe_pairs_sql(
            _sig_default(textstats.bpe_pair_counts, "k")),
        "docs_length_outliers": _length_outliers_sql(
            _sig_default(textstats.length_outliers, "lo_q"),
            _sig_default(textstats.length_outliers, "hi_q")),
        "docs_topic_clusters": _topic_clusters_sql(
            _sig_default(textstats.topic_clusters, "n_clusters"),
            _sig_default(textstats.topic_clusters, "dim"),
            _sig_default(textstats.topic_clusters, "iters")),
        "docs_cluster_lang_purity": """
            SELECT tc.cluster_id, d.lang, count(*)::BIGINT AS n
            FROM ({topic}) tc JOIN documents d USING (doc_id)
            GROUP BY 1, 2""".format(topic=_topic_clusters_sql(
            _sig_default(textstats.cluster_lang_purity, "n_clusters"),
            _sig_default(textstats.cluster_lang_purity, "dim"),
            _sig_default(textstats.cluster_lang_purity, "iters"))),
        "docs_incremental_new": rf"""
            WITH h AS (SELECT doc_id, md5(text) AS text_hash,
                         md5_number_upper(doc_id::VARCHAR)
                           % {_sig_default(dedup.incremental_new, "mod")} = 0
                           AS old
                       FROM documents),
            old_h AS (SELECT DISTINCT text_hash FROM h WHERE old),
            new_h AS (SELECT min(doc_id)::BIGINT AS doc_id, text_hash
                      FROM h WHERE NOT old GROUP BY text_hash)
            SELECT n.doc_id, n.text_hash
            FROM new_h n ANTI JOIN old_h o ON n.text_hash = o.text_hash""",
        "knn_bruteforce": """
            WITH qv AS (SELECT vec_id,
                          list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                      AS BIGINT)) AS qq
                        FROM embeddings),
            comp AS (SELECT vec_id, generate_subscripts(qq, 1) - 1 AS d,
                            unnest(qq) AS v FROM qv),
            nrm AS (SELECT vec_id, sum(v * v)::BIGINT AS ssq
                    FROM comp GROUP BY 1),
            q AS (SELECT vec_id AS qid FROM embeddings
                  WHERE vec_id % {stride} = 0),
            dd AS (SELECT q.qid, b.vec_id AS nid,
                     sum(a.v * b.v)::BIGINT AS dot
                   FROM q
                   JOIN comp a ON a.vec_id = q.qid
                   JOIN comp b ON b.d = a.d AND b.vec_id <> q.qid
                   GROUP BY 1, 2),
            scored AS (SELECT dd.qid, dd.nid,
                         row_number() OVER (PARTITION BY dd.qid
                           ORDER BY {ikey} DESC, dd.nid) AS rnk
                       FROM dd JOIN nrm n ON n.vec_id = dd.nid)
            SELECT qid AS query_id, rnk, nid AS neighbor_id
            FROM scored WHERE rnk <= {k}""".format(
            stride=_sig_default(similarity.knn_bruteforce, "query_stride"),
            k=_sig_default(similarity.knn_bruteforce, "k"),
            ikey=_ikey_sql("dd.dot", "n.ssq")),
        "events_windowed": """
            SELECT event_type,
                   epoch_us(ts)//3600000000 AS window_id,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
            FROM events GROUP BY event_type, epoch_us(ts)//3600000000""",
        "events_sessionize": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
            s AS (SELECT user_id, event_id, ts_us,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                          OR ts_us - lag(ts_us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            g AS (SELECT user_id, ts_us,
                   (SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_idx
                  FROM s)
            SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
                   min(ts_us) AS start_us, max(ts_us) AS end_us
            FROM g GROUP BY user_id, session_idx""",
        "events_top_users": """
            SELECT user_id, sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
            FROM events GROUP BY user_id
            ORDER BY cents DESC, user_id LIMIT 10""",
        "top_suppliers": """
            SELECT s_name,
                   sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))::BIGINT AS cents
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name ORDER BY cents DESC, s_name LIMIT 10""",
        "order_priorities": """
            SELECT o_orderpriority, count(*)::BIGINT AS n
            FROM orders GROUP BY o_orderpriority""",
        "nation_revenue": """
            SELECT n_name, sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "customers_no_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP
                                    '2000-01-01')""",
        "top_orders_per_cust": """
            WITH o AS (SELECT o_custkey, o_orderkey,
                         CAST(round(o_totalprice*100) AS BIGINT) AS cents
                       FROM orders),
            r AS (SELECT o_custkey, o_orderkey, cents,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY cents DESC, o_orderkey) AS rnk
                  FROM o)
            SELECT o_custkey, o_orderkey, rnk::BIGINT AS rnk, cents
            FROM r WHERE rnk <= 3""",
        "events_rolling": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                         CAST(round(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_id, user_id, ts_us,
                   (SUM(cents) OVER w)::BIGINT AS roll_cents,
                   (COUNT(*) OVER w)::BIGINT AS roll_n
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
        "events_dau": """
            SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
                   count(DISTINCT user_id)::BIGINT AS dau,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1""",
        "events_retention": """
            WITH uw AS (SELECT DISTINCT user_id,
                          (epoch_us(ts) // 604800000000) AS week
                        FROM events),
            c AS (SELECT week,
                    min(week) OVER (PARTITION BY user_id) AS cohort_week
                  FROM uw)
            SELECT cohort_week::BIGINT AS cohort_week, week::BIGINT AS week,
                   count(*)::BIGINT AS n_users
            FROM c GROUP BY 1, 2""",
        "events_transitions": """
            WITH s AS (SELECT event_type,
                         lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS next_type
                       FROM events)
            SELECT event_type AS from_type, next_type AS to_type,
                   count(*)::BIGINT AS n
            FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2""",
        "cust_order_histogram": """
            WITH pc AS (SELECT c_custkey,
                          count(o_orderkey) AS n_orders
                        FROM customer LEFT JOIN orders
                          ON o_custkey = c_custkey
                        GROUP BY c_custkey)
            SELECT n_orders::BIGINT AS n_orders,
                   count(*)::BIGINT AS n_custs
            FROM pc GROUP BY n_orders""",
        "filtered_revenue": """
            SELECT coalesce(sum(CAST(round(
                     l_extendedprice * l_discount * 100) AS BIGINT)),
                     0)::BIGINT AS revenue_c,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24""",
        "promo_revenue": """
            WITH li AS (SELECT l_partkey,
                          (year(l_shipdate)*100
                           + month(l_shipdate))::BIGINT AS ship_month,
                          CAST(round(l_extendedprice*(1-l_discount)*100)
                               AS BIGINT) AS cents
                        FROM lineitem)
            SELECT ship_month,
                   sum(CASE WHEN p_type = 'PROMO' THEN cents
                       ELSE 0 END)::BIGINT AS promo_c,
                   sum(cents)::BIGINT AS total_c
            FROM li JOIN part ON l_partkey = p_partkey
            GROUP BY ship_month""",
        "events_cumulative": """
            WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us,
                         CAST(round(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_id, ts_us, cents,
                   (SUM(cents) OVER (ORDER BY ts_us, event_id))::BIGINT
                     AS cum_cents
            FROM e""",
        "docs_pagerank": """
            WITH n AS (SELECT doc_id AS node FROM documents),
            cnt AS (SELECT count(*) AS nn FROM documents),
            e AS (SELECT node AS src, (node*31 + 7) % nn AS dst FROM n, cnt
                  UNION ALL
                  SELECT node, (node*31 + 14) % nn FROM n, cnt
                  UNION ALL
                  SELECT node, (node*31 + 21) % nn FROM n, cnt),
            s0 AS (SELECT node, 1000000::BIGINT AS s FROM n),
            i1 AS (SELECT e.dst AS node,
                     sum((s0.s * 85 // 100) // 3) AS inc
                   FROM e JOIN s0 ON e.src = s0.node GROUP BY e.dst),
            s1 AS (SELECT n.node,
                     (150000 + coalesce(i1.inc, 0))::BIGINT AS s
                   FROM n LEFT JOIN i1 ON n.node = i1.node),
            i2 AS (SELECT e.dst AS node,
                     sum((s1.s * 85 // 100) // 3) AS inc
                   FROM e JOIN s1 ON e.src = s1.node GROUP BY e.dst),
            s2 AS (SELECT n.node,
                     (150000 + coalesce(i2.inc, 0))::BIGINT AS s
                   FROM n LEFT JOIN i2 ON n.node = i2.node),
            i3 AS (SELECT e.dst AS node,
                     sum((s2.s * 85 // 100) // 3) AS inc
                   FROM e JOIN s2 ON e.src = s2.node GROUP BY e.dst),
            s3 AS (SELECT n.node,
                     (150000 + coalesce(i3.inc, 0))::BIGINT AS s
                   FROM n LEFT JOIN i3 ON n.node = i3.node)
            SELECT node, s AS score FROM s3""",
        "docs_hits": """
            WITH nn AS (SELECT count(*) AS c FROM documents),
            nodes AS (SELECT doc_id AS node FROM documents),
            edges AS (SELECT node AS src,
                        (node*31 + 7*j.j) % (SELECT c FROM nn) AS dst
                      FROM nodes, (VALUES (1),(2),(3)) j(j)),
            a1 AS (SELECT dst AS node, sum(1000000)::BIGINT AS a
                   FROM edges GROUP BY dst),
            a1f AS (SELECT nd.node, coalesce(a1.a, 0) AS a
                    FROM nodes nd LEFT JOIN a1 USING(node)),
            h1 AS (SELECT e.src AS node, sum(a1f.a)::BIGINT AS h
                   FROM edges e JOIN a1f ON a1f.node = e.dst GROUP BY e.src),
            a2 AS (SELECT e.dst AS node, sum(h1.h)::BIGINT AS a
                   FROM edges e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
            a2f AS (SELECT nd.node, coalesce(a2.a, 0) AS a
                    FROM nodes nd LEFT JOIN a2 USING(node)),
            h2 AS (SELECT e.src AS node, sum(a2f.a)::BIGINT AS h
                   FROM edges e JOIN a2f ON a2f.node = e.dst GROUP BY e.src)
            SELECT nd.node, a2f.a AS auth, h2.h AS hub
            FROM nodes nd JOIN a2f USING(node) JOIN h2 USING(node)""",
        "docs_strip_boilerplate": _strip_boilerplate_sql(
            _sig_default(clean.strip_boilerplate, "k")),
        "docs_clean_text_corpus": """
            WITH surv AS ({surv}),
            st AS ({strip})
            SELECT s.doc_id, st.clean_text,
                   len(regexp_extract_all(st.clean_text,
                                          '\\S+'))::BIGINT
                     AS n_tokens_clean
            FROM surv s JOIN st USING (doc_id)""".format(
            surv=_clean_corpus_sql(),
            strip=_strip_boilerplate_sql(
                _sig_default(clean.clean_text_corpus, "k"))),
        "docs_boilerplate": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                       FROM documents),
            pos AS (SELECT doc_id, toks,
                      unnest(generate_series(0, (len(toks) + 9) // 10 - 1))
                        AS j
                    FROM d WHERE len(toks) >= 1),
            ch AS (SELECT doc_id,
                     array_to_string(toks[10*j + 1 : 10*j + 10], ' ')
                       AS chunk
                   FROM pos),
            stats AS (SELECT md5(chunk) AS chunk_hash, chunk,
                        count(DISTINCT doc_id)::BIGINT AS df,
                        count(*)::BIGINT AS n_copies
                      FROM ch GROUP BY 1, 2)
            SELECT chunk_hash, chunk, df, n_copies FROM stats
            ORDER BY df DESC, chunk_hash LIMIT {}""".format(
            _sig_default(dedup.boilerplate_chunks, "k")),
        "docs_dup_rate_by_source": """
            WITH h AS (SELECT doc_id, source, md5(text) AS text_hash
                       FROM documents),
            w AS (SELECT text_hash, min(doc_id) AS winner
                  FROM h GROUP BY text_hash)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN doc_id != winner THEN 1 ELSE 0
                       END)::BIGINT AS n_dups
            FROM h JOIN w USING(text_hash) GROUP BY source""",
        "docs_keywords": r"""
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\S+') AS ws
                          FROM documents),
            occ AS (SELECT doc_id, unnest(ws) AS token FROM toks),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM occ GROUP BY ALL),
            dfreq AS (SELECT token, count(*)::BIGINT AS df
                      FROM tf GROUP BY token),
            nd AS (SELECT count(*)::BIGINT AS c FROM documents),
            sc AS (SELECT doc_id, token, tf,
                     (tf * (length(bin((SELECT c FROM nd) // df)) - 1))::BIGINT
                       AS score
                   FROM tf JOIN dfreq USING(token)),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, token) AS rn FROM sc)
            SELECT doc_id, token, tf, score FROM r WHERE rn <= {}""".format(
            _sig_default(textstats.keywords, "k")),
        "docs_containment_dups": _containment_sql(
            _sig_default(dedup.containment_dups, "threshold")),
        # window/slide constants derive from the engine defaults (the
        # _sig_default convention): slide in µs, window_s//slide_s
        # emission slots — one constant drives both sides of each twin
        "events_sliding_users": """
            SELECT (epoch_us(ts)//{slide_us} - j.j) AS window_id,
                   count(DISTINCT user_id)::BIGINT AS users
            FROM events, (VALUES {slots}) j(j) GROUP BY 1""".format(
            slide_us=_sig_default(events.sliding_users, "slide_s")
            * 1_000_000,
            slots=",".join(
                f"({i})" for i in range(
                    _sig_default(events.sliding_users, "window_s")
                    // _sig_default(events.sliding_users, "slide_s")))),
        "events_window_users": """
            SELECT epoch_us(ts)//{win_us} AS window_id,
                   count(DISTINCT user_id)::BIGINT AS users
            FROM events GROUP BY 1""".format(
            win_us=_sig_default(events.window_users, "window_s")
            * 1_000_000),
        "docs_bigram_surprisal": r"""
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\S+') AS ws
                          FROM documents),
            pos AS (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2),
            pairs AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM pos),
            doc_tf AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf
                       FROM pairs GROUP BY ALL),
            big AS (SELECT w1, w2, sum(tf)::BIGINT AS c2
                    FROM doc_tf GROUP BY ALL),
            pre AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM big GROUP BY w1)
            SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
                   sum(tf * (length(bin(c1 // c2)) - 1))::BIGINT AS surprisal
            FROM doc_tf JOIN big USING(w1, w2) JOIN pre USING(w1)
            GROUP BY doc_id""",
        "docs_hapax_rate": r"""
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\S+') AS ws
                          FROM documents),
            occ AS (SELECT doc_id, unnest(ws) AS token FROM toks),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM occ GROUP BY ALL),
            dfreq AS (SELECT token, count(*)::BIGINT AS df
                      FROM tf GROUP BY token),
            tot AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens
                    FROM tf GROUP BY doc_id),
            hx AS (SELECT doc_id, sum(tf)::BIGINT AS hapax
                   FROM tf JOIN dfreq USING(token)
                   WHERE df = 1 GROUP BY doc_id)
            SELECT t.doc_id, t.n_tokens, coalesce(hx.hapax, 0) AS hapax
            FROM tot t LEFT JOIN hx USING(doc_id)""",
        "docs_doc_frequency": r"""
            WITH tok AS (SELECT DISTINCT doc_id,
                           unnest(regexp_extract_all(lower(text), '\S+'))
                             AS token
                         FROM documents)
            SELECT token, count(*)::BIGINT AS df
            FROM tok GROUP BY token
            ORDER BY df DESC, token LIMIT 200""",
        "emb_lsh_code": _lsh_code_sql(
            _sig_default(similarity.lsh_code, "n_tables"),
            _sig_default(similarity.lsh_code, "n_bits"),
            _sig_default(similarity.lsh_code, "dims")),
        "emb_rp_sketch": _rp_sketch_sql(
            _sig_default(similarity.rp_sketch, "k"),
            _sig_default(similarity.rp_sketch, "dims")),
        "docs_knn_text": _knn_text_sql(
            _sig_default(textstats.knn_text, "k"),
            _sig_default(textstats.knn_text, "query_stride"),
            _sig_default(textstats.knn_text, "dim")),
        "emb_ivf_assign": _ivf_assign_sql(
            _sig_default(similarity.ivf_assign, "n_centroids")),
        "emb_label_separation": """
            WITH e AS (SELECT label, generate_subscripts(embedding,1) AS dim,
                         unnest(list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE)*1000)
                                     AS BIGINT))) AS q
                       FROM embeddings),
            c AS (SELECT label::BIGINT AS label, dim::BIGINT AS dim,
                    sum(q)::BIGINT AS q_sum, count(*)::BIGINT AS n
                  FROM e GROUP BY 1,2),
            m AS (SELECT label, dim,
                    CAST(round(q_sum*1.0/n) AS BIGINT) AS mv FROM c)
            SELECT a.label AS label_a, b.label AS label_b,
                   sum((a.mv - b.mv)*(a.mv - b.mv))::BIGINT AS dist2
            FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label
            GROUP BY 1,2""",
        "emb_label_centroids": """
            WITH e AS (SELECT label,
                         generate_subscripts(embedding, 1) AS dim,
                         unnest(list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                     AS BIGINT))) AS q
                       FROM embeddings)
            SELECT label::BIGINT AS label, dim::BIGINT AS dim,
                   sum(q)::BIGINT AS q_sum, count(*)::BIGINT AS n_vecs
            FROM e GROUP BY 1, 2""",
        "returned_items": """
            SELECT c_custkey, c_name, n_name,
                   sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                            AS BIGINT))::BIGINT AS cents
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3
            ORDER BY cents DESC, c_custkey LIMIT 20""",
        "large_orders": """
            WITH q AS (SELECT l_orderkey,
                         sum(CAST(l_quantity AS BIGINT)) AS sum_qty
                       FROM lineitem GROUP BY 1
                       HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
            SELECT o_orderkey, o_custkey AS c_custkey, c_name,
                   epoch_us(o_orderdate) AS o_orderdate_us,
                   CAST(round(o_totalprice*100) AS BIGINT) AS total_c,
                   sum_qty::BIGINT AS sum_qty
            FROM q
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey""",
        "high_balance_inactive": """
            WITH a AS (SELECT (sum(CAST(round(c_acctbal*100) AS BIGINT))
                               / 100.0) / count(*) AS v
                       FROM customer WHERE c_acctbal > 0),
            active AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '2000-07-01')
            SELECT n_name, count(*)::BIGINT AS n_custs,
                   sum(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT
                     AS acctbal_c
            FROM customer CROSS JOIN a
            JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > a.v
              AND c_custkey NOT IN (SELECT o_custkey FROM active)
            GROUP BY 1""",
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate)::BIGINT AS l_year,
                   sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                            AS BIGINT))::BIGINT AS cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
              AND year(l_shipdate) BETWEEN 1995 AND 1996
            GROUP BY 1, 2, 3""",
        "market_share": """
            SELECT year(o_orderdate)::BIGINT AS o_year,
                   sum(CASE WHEN s_nationkey =
                         (SELECT n_nationkey FROM nation
                          WHERE n_name = 'NATION_1')
                       THEN cents ELSE 0 END)::BIGINT AS nation_c,
                   sum(cents)::BIGINT AS total_c
            FROM (SELECT l_orderkey, l_suppkey, l_partkey,
                    CAST(round(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT) AS cents
                  FROM lineitem) li
            JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n2.n_regionkey
                       AND r_name = 'ASIA'
            WHERE year(o_orderdate) BETWEEN 1995 AND 1996
            GROUP BY 1""",
        "small_qty_revenue": """
            WITH pk AS (SELECT p_partkey FROM part
                        WHERE p_brand = 'Brand#13'),
            avgq AS (SELECT l_partkey,
                       0.2 * ((sum(CAST(l_quantity AS BIGINT))::DOUBLE)
                              / count(*)) AS thr
                     FROM lineitem JOIN pk ON p_partkey = l_partkey
                     GROUP BY 1)
            SELECT coalesce(sum(CAST(round(l_extendedprice*100)
                                     AS BIGINT)), 0)::BIGINT AS revenue_c,
                   count(*)::BIGINT AS n_rows
            FROM lineitem JOIN avgq ON avgq.l_partkey = lineitem.l_partkey
            WHERE l_quantity < thr""",
        "discounted_revenue": """
            SELECT coalesce(sum(CAST(round(l_extendedprice*(1-l_discount)
                                           *100) AS BIGINT)),
                            0)::BIGINT AS revenue_c,
                   count(*)::BIGINT AS n_rows
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)""",
        "events_first_touch": """
            WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                         event_type,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS rnk
                       FROM events)
            SELECT user_id, ts_us AS first_ts_us,
                   event_id AS first_event_id, event_type AS first_type
            FROM r WHERE rnk = 1""",
        "events_gap_stats": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events)
            SELECT user_id, count(prev)::BIGINT AS n_gaps,
                   coalesce(sum(ts_us - prev), 0)::BIGINT AS sum_gap_us,
                   coalesce(max(ts_us - prev), 0)::BIGINT AS max_gap_us
            FROM e GROUP BY user_id""",
        "events_last_touch": """
            WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                         event_type,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnk
                       FROM events)
            SELECT user_id, ts_us AS last_ts_us,
                   event_id AS last_event_id, event_type AS last_type
            FROM r WHERE rnk = 1""",
        "events_session_stats": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
            s AS (SELECT user_id, event_id, ts_us,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                          OR ts_us - lag(ts_us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            g AS (SELECT user_id, ts_us,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_idx
                  FROM s),
            sess AS (SELECT user_id, session_idx,
                       count(*)::BIGINT AS n_events,
                       max(ts_us) - min(ts_us) AS dur_us
                     FROM g GROUP BY 1, 2)
            SELECT n_events, count(*)::BIGINT AS n_sessions,
                   sum(dur_us)::BIGINT AS sum_duration_us
            FROM sess GROUP BY n_events""",
        "events_hourly": """
            SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
                   count(DISTINCT user_id)::BIGINT AS n_users,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1""",
        "ship_lag_stats": """
            SELECT o_orderpriority, count(*)::BIGINT AS n,
                   sum(epoch_us(l_shipdate) // 86400000000
                       - epoch_us(o_orderdate) // 86400000000)::BIGINT
                     AS sum_lag_days,
                   max(epoch_us(l_shipdate) // 86400000000
                       - epoch_us(o_orderdate) // 86400000000)::BIGINT
                     AS max_lag_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1""",
        "top_supplier_revenue": """
            WITH rev AS (SELECT l_suppkey AS s_suppkey,
                           sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                                    AS BIGINT))::BIGINT AS cents
                         FROM lineitem
                         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate <  TIMESTAMP '1996-04-01'
                         GROUP BY 1)
            SELECT s_suppkey, cents, s_name
            FROM rev JOIN supplier USING (s_suppkey)
            WHERE cents = (SELECT max(cents) FROM rev)""",
        "order_supplier_diversity": """
            WITH d AS (SELECT l_orderkey,
                         count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
                       FROM lineitem GROUP BY 1)
            SELECT n_suppliers, count(*)::BIGINT AS n_orders
            FROM d GROUP BY 1""",
        "docs_top_terms": r"""
            WITH tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\S+'))
                             AS term
                         FROM documents),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM tok GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                   FROM tok GROUP BY 1),
            r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                    row_number() OVER (PARTITION BY tf.doc_id
                      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rnk
                  FROM tf JOIN df USING (term))
            SELECT doc_id, term, tf, df FROM r WHERE rnk <= 3""",
        "events_median_value": """
            WITH c AS (SELECT event_type,
                         CAST(round(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_type, count(*)::BIGINT AS n,
                   min(cents)::BIGINT AS min_cents,
                   quantile_disc(cents, 0.5)::BIGINT AS med_cents,
                   max(cents)::BIGINT AS max_cents
            FROM c GROUP BY event_type""",
        "waiting_suppliers": """
            WITH j AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                         CASE WHEN epoch_us(l_shipdate) // 86400000000
                                   - epoch_us(o_orderdate) // 86400000000
                                   > 90 THEN 1 ELSE 0 END AS late
                       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       WHERE o_orderstatus = 'F'),
            p AS (SELECT ok, sk, max(late) AS late FROM j GROUP BY 1, 2),
            o AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late
                  FROM p GROUP BY 1),
            q AS (SELECT p.sk FROM p JOIN o USING (ok)
                  WHERE p.late = 1 AND o.n_supp >= 2 AND o.n_late = 1)
            SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
            FROM q JOIN supplier ON sk = s_suppkey GROUP BY 1, 2""",
        "label_doc_stats": """
            SELECT label::BIGINT AS label, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars,
                   max(n_chars)::BIGINT AS max_chars
            FROM embeddings JOIN documents ON vec_id = doc_id
            GROUP BY 1""",
        "docs_dup_rate": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   count(DISTINCT md5(text))::BIGINT AS n_unique
            FROM documents GROUP BY source""",
        "supplier_profit": """
            SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
                   sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                            AS BIGINT))::BIGINT AS cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            GROUP BY 1, 2""",
        "events_value_percentiles": """
            WITH c AS (SELECT event_type,
                         CAST(round(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_type, count(*)::BIGINT AS n,
                   quantile_disc(cents, 0.25)::BIGINT AS p25_cents,
                   quantile_disc(cents, 0.5)::BIGINT AS p50_cents,
                   quantile_disc(cents, 0.75)::BIGINT AS p75_cents,
                   quantile_disc(cents, 0.9)::BIGINT AS p90_cents
            FROM c GROUP BY event_type""",
        "events_hopping": _hopping_sql(
            _sig_default(events.hopping_counts, "window_s"),
            _sig_default(events.hopping_counts, "hop_s")),
        "local_supplier_volume": """
            SELECT n_name,
                   sum(CAST(round(l_extendedprice*(1-l_discount)*100)
                            AS BIGINT))::BIGINT AS cents
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
                         AND s_nationkey = c_nationkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY 1""",
        "events_props_stats": """
            WITH k AS (SELECT event_type,
                         CAST(NULLIF(regexp_extract(props,
                                '"k":\\s*(\\d+)', 1), '') AS BIGINT) AS k
                       FROM events)
            SELECT event_type, count(k)::BIGINT AS n,
                   sum(k)::BIGINT AS k_sum, min(k)::BIGINT AS k_min,
                   max(k)::BIGINT AS k_max
            FROM k GROUP BY 1""",
        # HLL sketch twin: identical md5-upper64 hash, register merge, and
        # EXACT-integer raw estimator; ln() in the small-range branch is
        # verified exhaustively (all 4095 n_zero values at p=12) to round
        # identically in CPython and DuckDB — see events.dau_hll.
        "events_dau_hll": """
            WITH u AS (SELECT DISTINCT epoch_us(ts)//86400000000 AS day,
                                       user_id FROM events),
            h AS (SELECT day,
                    md5_number_upper(user_id::VARCHAR)::UBIGINT AS h FROM u),
            b AS (SELECT day, (h >> 52)::BIGINT AS bucket,
                    (h & ((1::UBIGINT << 52) - 1)) AS w FROM h),
            r AS (SELECT day, bucket,
                    CASE WHEN w = 0 THEN 53
                         ELSE 52 - length(ltrim(bin(w), '0')) + 1 END AS rho
                  FROM b),
            mx AS (SELECT day, bucket, max(rho) AS rho FROM r GROUP BY 1, 2),
            s AS (SELECT day,
                    (sum(1::HUGEINT << (53 - rho))
                     + ((4096 - count(*))::HUGEINT << 53)) AS S,
                    (4096 - count(*))::BIGINT AS n_zero
                  FROM mx GROUP BY 1),
            e AS (SELECT day, n_zero,
                    ((7213::HUGEINT * 4096 * 4096 * 4096 * (1::HUGEINT << 53))
                     // ((10000*4096 + 10790)::HUGEINT * S))::BIGINT AS raw
                  FROM s)
            SELECT day::BIGINT AS day, n_zero,
                   CASE WHEN n_zero > 0 AND raw <= 5 * 4096 // 2
                        THEN round(4096 * ln(4096::DOUBLE / n_zero))::BIGINT
                        ELSE raw END AS est
            FROM e""",
        # exact substring-duplication twin: same k-char every-offset
        # windows (substr/length count code points = Python len), same
        # md5 window hash, same total>=2 rule — see dedup.substring_dup
        "docs_substring_dup": """
            WITH d AS (SELECT doc_id, text, length(text) AS L
                       FROM documents),
            w AS (SELECT doc_id,
                    md5_number_upper(substr(text, i, 40)) AS h
                  FROM d, unnest(generate_series(1, L - 39)) AS t(i)
                  WHERE L >= 40),
            c AS (SELECT h, doc_id, count(*) AS c FROM w GROUP BY 1, 2),
            tot AS (SELECT h, sum(c) AS tot FROM c GROUP BY 1),
            dup AS (SELECT doc_id,
                      sum(CASE WHEN tot >= 2 THEN c ELSE 0 END)::BIGINT
                        AS n_dup
                    FROM c JOIN tot USING (h) GROUP BY 1)
            SELECT d.doc_id, greatest(L - 39, 0)::BIGINT AS n_win,
                   COALESCE(n_dup, 0)::BIGINT AS n_dup
            FROM d LEFT JOIN dup USING (doc_id)""",
        "docs_url_mentions": r"""
            WITH a AS (SELECT doc_id,
                text || ' Contact u' || doc_id || '@mail-' || (doc_id % 7)
                     || '.example.com or https://host-' || (doc_id % 13)
                     || '.example.org/p/' || doc_id || '?s=1 at 10.'
                     || (doc_id % 200) || '.' || (doc_id % 100) || '.'
                     || (doc_id % 50) || ' now' AS t0
              FROM documents),
            h AS (SELECT doc_id,
                    unnest(regexp_extract_all(t0,
                        'https?://([^/\s?#]+)', 1)) AS host
                  FROM a)
            SELECT host, count(DISTINCT doc_id)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_mentions
            FROM h GROUP BY 1""",
        "docs_lang_confusion": f"""
            SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n
            FROM documents d JOIN ({_langid_sql()}) p USING (doc_id)
            GROUP BY 1, 2""",
        "docs_oov_rate": r"""
            WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '\S+')) AS tk
                  FROM documents),
            df AS (SELECT tk, count(DISTINCT doc_id) AS df
                   FROM tok GROUP BY 1),
            vocab AS (SELECT tk FROM df ORDER BY df DESC, tk LIMIT 100),
            agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                      sum(CASE WHEN tk NOT IN (SELECT tk FROM vocab)
                               THEN 1 ELSE 0 END)::BIGINT AS n_oov
                    FROM tok GROUP BY 1)
            SELECT d.doc_id, COALESCE(n_tokens, 0)::BIGINT AS n_tokens,
                   COALESCE(n_oov, 0)::BIGINT AS n_oov
            FROM documents d LEFT JOIN agg USING (doc_id)""",
    }
