"""Kill-and-resume (north rule): a crawl resumed from any complete round
checkpoint must produce byte-identical final outputs — records, statuses,
seen set, and the visit-log tail."""

from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="module")
def full_run(ray_session, fixture_corpus, tmp_path_factory):
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, _ = fixture_corpus
    wd = tmp_path_factory.mktemp("resume_full")
    eng = CrawlEngine(corpus_dir, str(wd), checkpoints=True)
    res = eng.run()
    return corpus_dir, wd, res


def test_resume_from_mid_checkpoint(full_run, tmp_path_factory):
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, wd, full = full_run
    ck_rounds = sorted(int(p.name.split("=")[1])
                       for p in (wd / "checkpoint").iterdir()
                       if (p / "_complete").exists())
    assert len(ck_rounds) >= 3
    mid = ck_rounds[len(ck_rounds) // 2]

    wd2 = tmp_path_factory.mktemp("resume_mid")
    shutil.rmtree(wd2)
    shutil.copytree(wd, wd2)

    eng2 = CrawlEngine(corpus_dir, str(wd2), checkpoints=True)
    eng2.resume_from(mid)
    res2 = eng2.resume_run()

    # identical final state
    assert {s: o.status for s, o in res2.outcomes.items()} == \
        {s: o.status for s, o in full.outcomes.items()}
    assert res2.seen == full.seen
    for sid in full.outcomes:
        assert res2.jsonl_lines(sid) == full.jsonl_lines(sid), sid
    # visit log identical (the resumed tail re-executes deterministically)
    want = [(v["seq"], v["canon"], v["status"], v["attempt"], v["virtual_ts_ms"])
            for v in full.visit_log()]
    got = [(v["seq"], v["canon"], v["status"], v["attempt"], v["virtual_ts_ms"])
           for v in res2.visit_log()]
    assert got == want


def test_checkpoint_metrics(full_run):
    """Every complete checkpoint carries a metrics.json (lineage = the
    round=N shard-file layout; metrics = driver timers + progress)."""
    import json

    _, wd, full = full_run
    cks = [p for p in (wd / "checkpoint").iterdir()
           if (p / "_complete").exists()]
    assert cks
    for ck in cks:
        m = json.loads((ck / "metrics.json").read_text())
        assert m["round"] == int(ck.name.split("=")[1])
        assert m["frontier_shards"] >= 1 and m["seen_shards"] >= 1
        assert m["seq"] >= 0 and m["seeds"] >= 1
        assert isinstance(m["timings_s"], dict)
    # records_so_far counts RAW extracted records (pre-watermark-truncation,
    # pre-finalize), so it bounds the final line count from above and grows
    # monotonically across rounds
    counts = [json.loads((ck / "metrics.json").read_text())["records_so_far"]
              for ck in sorted(cks, key=lambda p: int(p.name.split("=")[1]))]
    assert counts == sorted(counts)
    assert counts[-1] >= sum(
        len(full.jsonl_lines(s)) for s in full.outcomes)


def test_resume_from_round_zero(full_run, tmp_path_factory):
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, wd, full = full_run
    first = sorted(int(p.name.split("=")[1])
                   for p in (wd / "checkpoint").iterdir()
                   if (p / "_complete").exists())[0]
    wd3 = tmp_path_factory.mktemp("resume_zero")
    shutil.rmtree(wd3)
    shutil.copytree(wd, wd3)
    eng = CrawlEngine(corpus_dir, str(wd3), checkpoints=True)
    eng.resume_from(first)
    res = eng.resume_run()
    assert {s: o.status for s, o in res.outcomes.items()} == \
        {s: o.status for s, o in full.outcomes.items()}
    for sid in full.outcomes:
        assert res.jsonl_lines(sid) == full.jsonl_lines(sid), sid


def test_resume_rejects_mismatched_seedctl_shards(full_run,
                                                  tmp_path_factory):
    """A checkpoint is sharded by sid % num_seed_shards — resuming with a
    different shard count must fail loudly, not silently drop seeds."""
    from pathlib import Path

    from go_scrapper_ray.config import CrawlConfig
    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, wd, _ = full_run
    first = sorted(int(p.name.split("=")[1])
                   for p in (wd / "checkpoint").iterdir()
                   if (p / "_complete").exists())[0]
    wd4 = tmp_path_factory.mktemp("resume_badshards")
    shutil.rmtree(wd4)
    shutil.copytree(wd, wd4)
    cfg = CrawlConfig.from_json(
        (Path(corpus_dir) / "crawl_config.json").read_text())
    cfg.num_seed_shards = 3  # checkpoint was written with the default 8
    eng = CrawlEngine(corpus_dir, str(wd4), cfg=cfg, checkpoints=True)
    with pytest.raises(ValueError, match="seedctl"):
        eng.resume_from(first)


def test_resume_rejects_legacy_checkpoint_format(full_run,
                                                 tmp_path_factory):
    """A pre-seedctl-shard checkpoint (per-seed state inline in
    driver.json, no seedctl_*.json) gets a dedicated format error, not a
    misleading shard-count mismatch."""
    import json

    from go_scrapper_ray.pipelines.crawl import CrawlEngine

    corpus_dir, wd, _ = full_run
    first = sorted(int(p.name.split("=")[1])
                   for p in (wd / "checkpoint").iterdir()
                   if (p / "_complete").exists())[0]
    wd5 = tmp_path_factory.mktemp("resume_legacy")
    shutil.rmtree(wd5)
    shutil.copytree(wd, wd5)
    ckdir = wd5 / "checkpoint" / f"round={first}"
    for p in ckdir.glob("seedctl_*.json"):
        p.unlink()
    drv = json.loads((ckdir / "driver.json").read_text())
    drv["outcomes"] = {"0": {"status": 1}}  # legacy inline per-seed state
    (ckdir / "driver.json").write_text(json.dumps(drv))
    eng = CrawlEngine(corpus_dir, str(wd5), checkpoints=True)
    with pytest.raises(ValueError, match="legacy pre-seedctl-shard"):
        eng.resume_from(first)
