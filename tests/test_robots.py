"""Robots-enforcement parity (north-rule robots caching; the reference
IGNORES robots — collyfunc.go:68 — so ignore_robots=True is the parity
default and enforcement is the rebuild's added mode).  The fixture
robots.txt disallows /not_recommended_reviews/, so enforcement must
suppress the whole non-recommended branch identically in the engine and
the serial oracle."""

from __future__ import annotations

import pytest

from oracle import OracleCrawl


@pytest.fixture(scope="module")
def oracle_r(fixture_corpus):
    corpus_dir, _ = fixture_corpus
    return OracleCrawl(corpus_dir, enforce_robots=True).run()


@pytest.fixture(scope="module")
def engine_r(ray_session, fixture_corpus, tmp_path_factory):
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, _ = fixture_corpus
    wd = tmp_path_factory.mktemp("crawl_robots_wd")
    eng = CrawlEngine(corpus_dir, str(wd), checkpoints=False,
                      enforce_robots=True)
    return eng.run()


def test_robots_actually_blocks(oracle_r, fixture_corpus):
    # the mode must change behavior: no non-rec fetches in the visit log
    paths = [v["canon_url"] for v in oracle_r.visit_log]
    assert not any("/not_recommended_reviews/" in p for p in paths)
    unenforced = OracleCrawl(fixture_corpus[0]).run()
    assert any("/not_recommended_reviews/" in v["canon_url"]
               for v in unenforced.visit_log)


def test_robots_statuses_match(oracle_r, engine_r):
    got = {sid: o.status for sid, o in engine_r.outcomes.items()}
    want = {sid: o.status for sid, o in oracle_r.outcomes.items()}
    assert got == want


def test_robots_jsonl_byte_parity(oracle_r, engine_r):
    for sid in oracle_r.outcomes:
        assert engine_r.jsonl_lines(sid) == oracle_r.jsonl_lines(sid), sid


def test_robots_visit_log_match(oracle_r, engine_r):
    want = oracle_r.visit_log
    got = engine_r.visit_log()
    assert len(got) == len(want)
    keys = ("seq", "seed_id", "kind", "status", "attempt", "virtual_ts_ms")
    for g, w in zip(got, want):
        assert g["canon"] == w["canon_url"]
        assert {k: g[k] for k in keys} == {k: w[k] for k in keys}


def test_robots_seen_set_match(oracle_r, engine_r):
    assert sorted(engine_r.seen) == sorted(oracle_r.seen.items())
