"""Mirror of the driver's correctness gate: run every SQL-checkable
``queries()`` entry via Ray Data AND its ``oracle_sql()`` twin via DuckDB on
the same parquet tables; compare row counts + order-insensitive values.
Also sanity tests for the rows-only (non-SQL) operators."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df


@pytest.fixture(scope="module")
def qmap(ray_session):
    import __ray_entry__ as e
    return e.queries(), e.oracle_sql()


def _oracle_keys() -> list[str]:
    # parametrize over the live oracle_sql() keys so a new SQL-checked
    # query can never silently skip the parity gate
    import __ray_entry__ as e
    return sorted(e.oracle_sql())


SQL_CHECKED = _oracle_keys()


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(qmap, name):
    queries, oracles = qmap
    got = _normalize(_to_df(queries[name](SF)))
    want = _normalize(_duck(oracles[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_oracle_key_has_query(qmap):
    queries, oracles = qmap
    assert set(oracles) <= set(queries)


def test_rows_only_queries_run(qmap):
    queries, oracles = qmap
    rows_only = set(queries) - set(oracles) - {
        "crawl_records", "crawl_visit_log", "crawl_seen_set", "crawl_edges",
        "crawl_meta"}  # crawl queries covered by the parity suite
    for name in sorted(rows_only):
        df = _to_df(queries[name](SF))
        assert df is not None and len(df) >= 0, name


# ---------------------------------------------------------- rows-only depth

def test_minhash_finds_planted_near_dups(ray_session, tmp_path):
    """Plant near-duplicate docs; MinHash-LSH must find exactly the planted
    pairs that brute-force Jaccard confirms."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_scrapper_ray.pipelines import dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the old stone bridge")
    texts = [base,
             base + " tonight",                       # near-dup of 0
             base.replace("quick", "slow"),           # near-dup of 0
             "completely different words entirely unrelated content here "
             "nothing shared with anything else at all in this one",
             base]                                    # exact dup of 0
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path / "mh"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.minhash_dups(str(d), threshold=0.7).take_all()}
    # brute force
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if dedup.jaccard(texts[i], texts[j]) >= 0.7:
                want.add((i, j))
    assert want, "fixture must contain near-dups"
    # LSH may miss borderline pairs but must find exact/near dups; require
    # full recall here (these pairs are far above threshold)
    assert got == want


def test_simhash_matches_bruteforce(ray_session, tmp_path):
    """Chunk-LSH (4x16-bit bands) has guaranteed 100% recall at hamming<=3
    (pigeonhole: <=3 flipped bits leave >=1 of 4 chunks intact), so the
    operator's pairs must EQUAL brute-force hamming<=3 pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_scrapper_ray.pipelines import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base, base + " phi", "unrelated totally different words here",
             base]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path / "sh"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_dups(str(d)).take_all()}
    sigs = [dedup.simhash64(s) for s in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ham = bin(sigs[i] ^ sigs[j]).count("1")
            if ham <= 3:
                want[(i, j)] = ham
    assert (0, 3) in want and want[(0, 3)] == 0  # fixture sanity: exact dup
    assert pairs == want


@pytest.mark.parametrize("ann_name,floor", [("knn_lsh", 0.5),
                                            ("knn_ivf", 0.6),
                                            ("knn_ivfpq", 0.5)])
def test_knn_ann_recall(ray_session, qmap, ann_name, floor):
    """ANN recall@5 vs brute force must be reasonable on the embeddings."""
    queries, _ = qmap
    bf = _to_df(queries["knn_bruteforce"](SF))
    ann = _to_df(queries[ann_name](SF))
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    ann_sets = ann.groupby("query_id")["neighbor_id"].apply(set)
    recalls = []
    for q, want in bf_sets.items():
        got = ann_sets.get(q, set())
        recalls.append(len(got & want) / len(want))
    assert sum(recalls) / len(recalls) >= floor


def test_media_strict_decode_raises(ray_session):
    from go_scrapper_ray.pipelines import multimodal

    with pytest.raises(Exception):  # NotImplementedError surfaces via Ray
        multimodal.media_features(SF, decode="strict").take(1)


def test_langid_predicts_marker_langs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_scrapper_ray.pipelines import textstats

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["the cat and the dog sitting of the mat",
                                    "der hund und die katze schlafen ein",
                                    "的是了在的是了在"], pa.string())})
    d = tmp_path / "li"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    preds = {r["doc_id"]: r["pred_lang"]
             for r in textstats.langid(str(d), concurrency=1).take_all()}
    assert preds[0] == "en" and preds[1] == "de" and preds[2] == "zh"


@pytest.mark.parametrize("small_graph_limit", [2_000_000, 0],
                         ids=["union-find", "distributed-cc"])
def test_dup_clusters_assigns_components(ray_session, tmp_path,
                                         small_graph_limit):
    """Near-dup cluster assignment: docs connected through the minhash pair
    graph share a cluster_id = min doc_id of the component; singletons map
    to themselves — including TRANSITIVE closure (0~1 and 1~2 => one
    cluster even if 0~2 alone is borderline).  Both the small-graph
    union-find gate and the log-round distributed CC must agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_scrapper_ray.pipelines import dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the old stone bridge")
    texts = [base,
             base + " tonight",
             base.replace("quick", "slow"),
             "completely different words entirely unrelated content here "
             "nothing shared with anything else at all in this one",
             base,
             "second island of unique text with its own private vocabulary "
             "spoken by nobody else in the corpus whatsoever today"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path / "cc"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    labels = {r["doc_id"]: r["cluster_id"]
              for r in dedup.dup_clusters(
                  str(d), threshold=0.7,
                  small_graph_limit=small_graph_limit).take_all()}
    assert len(labels) == len(texts)
    # union-find ground truth from the pair list
    pairs = [(r["doc_a"], r["doc_b"])
             for r in dedup.minhash_dups(str(d), threshold=0.7).take_all()]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    want = {}
    for i in range(len(texts)):
        root = find(i)
        want.setdefault(root, []).append(i)
    expect = {i: min(members) for members in want.values() for i in members}
    assert labels == expect
    assert labels[3] == 3 and labels[5] == 5  # singletons
    assert labels[0] == labels[1] == labels[2] == labels[4] == 0


def test_dau_hll_accuracy(ray_session, qmap):
    """HLL estimate tracks exact count-distinct (the SQL twin pins
    bit-exactness; this pins that the sketch is a sane estimator —
    p=12 linear-counting regime: well under 1.04/sqrt(m) ~ 1.6% typical)."""
    queries, _ = qmap
    est = {r["day"]: r["est"]
           for r in _to_df(queries["events_dau_hll"](SF)).to_dict("records")}
    exact = {r["day"]: r["dau"]
             for r in _to_df(queries["events_dau"](SF)).to_dict("records")}
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(3, 0.05 * n), (day, est[day], n)


def test_mixture_quota_multibatch_combiner(ray_session):
    """The per-batch partial top-K is a real combiner: forcing many small
    batches (so no batch sees a whole stratum) must give the identical
    quota as the single-batch path and as DuckDB's rank window."""
    import duckdb

    from go_scrapper_ray.pipelines import textstats

    one = _to_df(textstats.mixture_quota(SF, per_source=7)) \
        .sort_values("doc_id", ignore_index=True)
    many = _to_df(textstats.mixture_quota(SF, per_source=7, batch_size=16)) \
        .sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(one, many)

    want = duckdb.sql(f"""
        WITH h AS (SELECT doc_id, source,
                          md5_number_upper(doc_id::VARCHAR) AS h
                   FROM read_parquet('{SF}/documents.parquet'))
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY h, doc_id) AS rn FROM h)
        WHERE rn <= 7 ORDER BY doc_id""").fetchdf()
    pd.testing.assert_frame_equal(many, want, check_dtype=False)


def test_ivf_assign_centroids_self(ray_session):
    """Each centroid vector must assign to itself (its self-dot dominates
    by Cauchy-Schwarz in the quantized space unless an exact duplicate
    ties, where the smaller id wins — either way list_id == vec_id for
    the smallest-id copy), and every corpus vector gets exactly one row."""
    import duckdb

    from go_scrapper_ray.pipelines import similarity

    df = _to_df(similarity.ivf_assign(SF))
    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/embeddings.parquet')").fetchone()[0]
    assert len(df) == n == df["vec_id"].nunique()
    byv = dict(zip(df["vec_id"], df["list_id"]))
    for cid in range(8):
        assert byv[cid] <= cid, (cid, byv[cid])
    assert set(df["list_id"]) <= set(range(8))


def test_lsh_code_buckets_duplicates(ray_session, tmp_path):
    """Identical embeddings must land in identical buckets in every table
    (sign-LSH is a pure function of the vector), and codes stay in
    [0, 2^n_bits)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_scrapper_ray.pipelines import similarity

    df = _to_df(similarity.lsh_code(SF))
    assert df["code"].between(0, 255).all()
    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/embeddings.parquet')").fetchone()[0]
    assert len(df) == n * 4

    # plant an exact duplicate: vec 999 copies vec 0
    t = pq.read_table(f"{SF}/embeddings.parquet")
    first = t.slice(0, 1).to_pydict()
    first["vec_id"] = [999]
    dup = pa.Table.from_pydict(first, schema=t.schema)
    pq.write_table(pa.concat_tables([t, dup]),
                   str(tmp_path / "embeddings.parquet"))
    df2 = _to_df(similarity.lsh_code(str(tmp_path)))
    key = df2.set_index(["vec_id", "table_id"])["code"]
    v0 = int(t["vec_id"][0].as_py())
    for tb in range(4):
        assert key[(999, tb)] == key[(v0, tb)], tb
    # and the original ids' codes are unchanged by the extra row
    base = df.set_index(["vec_id", "table_id"])["code"]
    assert key.drop(index=999, level=0).sort_index().equals(
        base.sort_index())
