"""Distributed-engine vs serial-oracle parity (BASELINE.md correctness gate):
byte-identical ordered JSONL records per seed, identical statuses/meta,
identical visit log (seq / url / status / attempt / virtual politeness ts),
identical final URL-seen set and link-graph edges."""

from __future__ import annotations

import pytest

from oracle import OracleCrawl


@pytest.fixture(scope="module")
def oracle(fixture_corpus):
    corpus_dir, _ = fixture_corpus
    return OracleCrawl(corpus_dir).run()


@pytest.fixture(scope="module")
def engine_result(ray_session, fixture_corpus, tmp_path_factory):
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, _ = fixture_corpus
    wd = tmp_path_factory.mktemp("crawl_wd")
    eng = CrawlEngine(corpus_dir, str(wd), checkpoints=True)
    return eng.run()


def test_statuses_match(oracle, engine_result):
    got = {sid: o.status for sid, o in engine_result.outcomes.items()}
    want = {sid: o.status for sid, o in oracle.outcomes.items()}
    assert got == want


def test_jsonl_byte_parity(oracle, engine_result):
    for sid in oracle.outcomes:
        want = oracle.jsonl_lines(sid)
        got = engine_result.jsonl_lines(sid)
        assert got == want, f"seed {sid}: {len(got)} vs {len(want)} lines"


def test_seen_set_match(oracle, engine_result):
    want = sorted(oracle.seen.items())
    assert engine_result.seen == want


def test_edges_match(oracle, engine_result):
    assert sorted(engine_result.edges) == sorted(oracle.edges)


def test_visit_log_match(oracle, engine_result):
    want = oracle.visit_log
    got = engine_result.visit_log()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for k in ("seq", "seed_id", "url", "host", "depth", "kind",
                  "status", "attempt", "virtual_ts_ms"):
            assert g[k] == w[k], (k, g, w)
        assert g["canon"] == w["canon_url"]
        assert g["url_hash"] == w["url_hash"]


def test_meta_match(oracle, engine_result):
    import json
    meta = json.loads((engine_result.workdir / "meta.json").read_text())
    for sid in oracle.outcomes:
        assert meta[str(sid)] == oracle.meta(sid), sid


def test_item_counts(oracle, engine_result):
    for sid, o in oracle.outcomes.items():
        assert engine_result.outcomes[sid].item_scraped_count == \
            o.item_scraped_count, sid


def test_seedctl_shard_count_invariance(ray_session, fixture_corpus,
                                        engine_result, tmp_path_factory):
    """Byte output must be invariant to the seed-state shard count (the
    per-seed state machine is hash-partitioned bookkeeping, not a
    semantic boundary): a 1-shard run equals the default-8-shard run."""
    import json

    from go_scrapper_ray.config import CrawlConfig
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, _ = fixture_corpus
    cfg = CrawlConfig.from_json(
        (__import__("pathlib").Path(corpus_dir) / "crawl_config.json")
        .read_text())
    cfg.num_seed_shards = 1
    wd = tmp_path_factory.mktemp("crawl_wd_1shard")
    res1 = CrawlEngine(corpus_dir, str(wd), cfg=cfg,
                       checkpoints=False).run()

    assert {s: o.status for s, o in res1.outcomes.items()} == \
        {s: o.status for s, o in engine_result.outcomes.items()}
    assert res1.seen == engine_result.seen
    for sid in engine_result.outcomes:
        assert res1.jsonl_lines(sid) == engine_result.jsonl_lines(sid), sid
    m1 = json.loads((res1.workdir / "meta.json").read_text())
    m8 = json.loads((engine_result.workdir / "meta.json").read_text())
    assert m1 == m8
