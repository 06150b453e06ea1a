"""Hot-host skew + politeness backpressure evidence (north rule: "handles
hot-host skew via salted repartitioning"; SURVEY.md §4.2).

Design under test: fetch/extract shard by url_hash (per-URL — a hot host's
pages spread across ALL fetch buckets), while politeness state for a host
lives on exactly ONE frontier shard (per-host clocks must be singular).
``max_per_host_per_round`` bounds a hot host's per-round fetches without
changing the final output."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from go_scrapper_ray import urlkit  # noqa: E402


def test_hot_host_salts_across_fetch_buckets():
    """1000 URLs of ONE host must spread across every fetch bucket (the
    url_hash salt), so no fetch task inherits the whole hot host."""
    nb = 16
    buckets = Counter(
        urlkit.url_hash64(f"https://www.hot.example/biz/p{i}") % nb
        for i in range(1000))
    assert len(buckets) == nb
    assert max(buckets.values()) < 3 * (1000 // nb)  # no pathological skew


def test_hot_host_single_politeness_shard():
    """All URLs of one host route to exactly one frontier shard (politeness
    clocks must be singular per host), regardless of path."""
    shards = {urlkit.host_hash64(urlkit.host_of(
        urlkit.canonicalize(f"https://www.hot.example/biz/p{i}"))) % 4
        for i in range(100)}
    assert len(shards) == 1


@pytest.mark.usefixtures("ray_session")
def test_per_host_round_cap_bounds_and_preserves_output(fixture_corpus,
                                                        tmp_path):
    """max_per_host_per_round=2: no host exceeds 2 fetches in any round, the
    crawl takes more rounds, and the FINAL records/seen/statuses are
    identical to the uncapped run (backpressure is a scheduling knob, not a
    semantics knob)."""
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus, _ = fixture_corpus

    eng_free = CrawlEngine(corpus, str(tmp_path / "free"), checkpoints=False)
    res_free = eng_free.run()

    eng_cap = CrawlEngine(corpus, str(tmp_path / "capped"), checkpoints=False,
                          max_per_host_per_round=2)
    res_cap = eng_cap.run()

    # bound holds per (round, host)
    per = Counter()
    for r in res_cap.visit_log():
        per[(r["round"], r["host"])] += 1
    assert max(per.values()) <= 2
    assert eng_cap.round > eng_free.round  # backpressure stretches rounds

    # identical final artifacts
    assert res_cap.seen == res_free.seen
    assert res_cap.edges == res_free.edges
    assert ({s: o.status for s, o in res_cap.outcomes.items()}
            == {s: o.status for s, o in res_free.outcomes.items()})
    if res_free.records is None:
        assert res_cap.records is None
    else:
        a = sorted((r["seed_id"], r["rank"], r["jsonl"])
                   for r in res_free.records.take_all())
        b = sorted((r["seed_id"], r["rank"], r["jsonl"])
                   for r in res_cap.records.take_all())
        assert a == b
