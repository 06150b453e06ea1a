"""Resumable partitioned sink: per-bucket skip on re-run, partial cleanup,
read-back equivalence."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"


def _survivors_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()[["cluster_id", "doc_id"]]
    return df.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)


def test_resumable_partitioned_write(ray_session, tmp_path):
    from go_scrapper_ray.pipelines import clean

    out = tmp_path / "clean_out"
    res = clean.clean_corpus(SF).materialize()
    want = _survivors_df(res)

    written = clean.write_partitioned_resumable(res, str(out), num_buckets=4)
    assert sorted(written) == [0, 1, 2, 3]
    assert all((out / f"bucket={k}" / "_done").exists() for k in range(4))

    # read-back equals the in-memory result (bucket column rides along)
    back = clean.read_partitioned(str(out)).to_pandas()
    got = back[["cluster_id", "doc_id"]] \
        .sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # re-run: everything done → nothing written, files untouched
    mtimes = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    assert clean.write_partitioned_resumable(res, str(out),
                                             num_buckets=4) == []
    assert {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")} == mtimes

    # crash-sim: bucket 2 loses its marker (partial write) → only bucket 2
    # is rebuilt; other buckets' files untouched
    import shutil
    shutil.rmtree(out / "bucket=2")
    others = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    assert clean.write_partitioned_resumable(res, str(out),
                                             num_buckets=4) == [2]
    for p, m in others.items():
        assert p.stat().st_mtime_ns == m, f"{p} was rewritten"
    back2 = clean.read_partitioned(str(out)).to_pandas()
    got2 = back2[["cluster_id", "doc_id"]] \
        .sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)


def test_train_shards_writer(ray_session, tmp_path):
    """Deterministic shuffle-shard writer: every doc in exactly one shard,
    pos dense 0..n-1 per shard and ordered by (md5-upper64, doc_id);
    out_dir writes one parquet + _done per shard; marked shards are
    skipped on re-run."""
    import duckdb

    from go_scrapper_ray.pipelines import clean

    out = tmp_path / "shards"
    df = clean.train_shards(SF, n_shards=4, out_dir=str(out)).to_pandas()

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n_docs == df["doc_id"].nunique()
    for k, g in df.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g))), k
        d = out / f"shard={k}"
        assert (d / "_done").exists()
        back = pd.read_parquet(d / "part.parquet")
        assert list(back["pos"]) == list(range(len(back)))
        assert set(back["doc_id"]) == set(g["doc_id"])
        assert back["text"].notna().all()

    # determinism + resume: re-run returns identical assignment and does
    # not rewrite marked shards
    mtimes = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    df2 = clean.train_shards(SF, n_shards=4, out_dir=str(out)).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id", ignore_index=True),
        df2.sort_values("doc_id", ignore_index=True))
    assert {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")} == mtimes


def test_train_shards_manifest_invalidation(ray_session, tmp_path):
    """Changing n_shards over the same out_dir must invalidate the old
    shard dirs (the _manifest records the params + corpus fingerprint),
    never return a fresh assignment on top of stale shard files."""
    from go_scrapper_ray.pipelines import clean

    out = tmp_path / "shards"
    clean.train_shards(SF, n_shards=4, out_dir=str(out)).materialize()
    assert (out / "shard=3" / "_done").exists()

    df = clean.train_shards(SF, n_shards=2, out_dir=str(out)).to_pandas()
    # stale 4-shard dirs are gone; only shard=0/1 remain, and the parquet
    # on disk matches the returned 2-shard assignment
    assert not (out / "shard=3").exists() and not (out / "shard=2").exists()
    for k in (0, 1):
        back = pd.read_parquet(out / f"shard={k}" / "part.parquet")
        want = df[df["shard"] == k]
        assert set(back["doc_id"]) == set(want["doc_id"])


def test_clean_corpus_gates_are_real(ray_session):
    """Survivors must pass every gate: no near-dup pair among survivors,
    no exact-hash dup, all predicted-en, all >= min_words tokens."""
    import duckdb

    from go_scrapper_ray.pipelines import clean, dedup, textstats

    surv = set(clean.clean_corpus(SF).to_pandas()["doc_id"])
    assert surv, "clean corpus is empty"

    pairs = dedup.minhash_dups(SF).to_pandas()
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert not (a in surv and b in surv), (a, b)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    hashes = con.execute(
        "SELECT md5(text) FROM documents WHERE doc_id IN "
        f"({','.join(map(str, surv))})").fetchall()
    assert len({h[0] for h in hashes}) == len(hashes)

    lang = textstats.langid(SF).to_pandas()
    lang_of = dict(zip(lang["doc_id"], lang["pred_lang"]))
    toks = textstats.token_count(SF).to_pandas()
    ntok = dict(zip(toks["doc_id"], toks["n_tokens"]))
    for d in surv:
        assert lang_of[d] == "en"
        assert ntok[d] >= 20


def test_dedup_keep_best_picks_longest(ray_session):
    """Every cluster survives exactly once, the survivor is a member, and
    no member has more tokens (or equal tokens with a smaller id)."""
    from go_scrapper_ray.pipelines import clean, dedup, textstats

    best = clean.dedup_keep_best(SF).to_pandas()
    cl = dedup.dup_clusters(SF).to_pandas()
    nt = dict(zip(*(textstats.token_count(SF).to_pandas()[c]
                    for c in ("doc_id", "n_tokens"))))

    members: dict[int, list[int]] = {}
    for d, c in zip(cl["doc_id"], cl["cluster_id"]):
        members.setdefault(c, []).append(d)
    assert set(best["cluster_id"]) == set(members)
    assert len(best) == len(members)
    for c, d, n in zip(best["cluster_id"], best["doc_id"], best["n_tokens"]):
        assert d in members[c]
        assert n == nt[d]
        for other in members[c]:
            # no member strictly beats the survivor under
            # (n_tokens DESC, doc_id ASC)
            assert nt[other] < n or (nt[other] == n and other >= d), \
                (c, d, other)
