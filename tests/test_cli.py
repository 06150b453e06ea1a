"""CLI surface (go_scrapper_ray/__main__.py): the reference's cobra entry
(S1/S2, main.go:179-220) — base64(JSON) Spider decode, single-seed crawl,
append-mode JSONL sink, <base>-meta.json derivation."""

from __future__ import annotations

import base64
import json
from pathlib import Path

import pytest

from go_scrapper_ray.__main__ import (decode_spider_arg, main,
                                      meta_path_for, spider_to_seed_row)
from oracle import OracleCrawl


def _b64(d: dict) -> str:
    return base64.b64encode(json.dumps(d).encode()).decode()


def test_decode_spider_arg_roundtrip():
    d = {"profile_key": "https://x", "first_page_only": 1}
    assert decode_spider_arg(f"SPIDER={_b64(d)}") == d


@pytest.mark.parametrize("bad", [
    "NOEQUALS",                       # no NAME=VALUE split
    "S=not!!base64",                  # invalid base64
    "S=" + base64.b64encode(b"{not json").decode(),  # invalid JSON
])
def test_decode_spider_arg_malformed(bad):
    with pytest.raises(ValueError):
        decode_spider_arg(bad)


def test_malformed_arg_exits_nonzero(tmp_path):
    # setPlace panics on malformed input (main.go:209-218) → rc 1
    assert main(["--corpus", str(tmp_path), "-a", "S=zzz!!"]) == 1


def test_meta_path_for():
    # main.go:973-975: strip after the LAST dot, append -meta.json
    assert meta_path_for("out/reviews.jsonl") == "out/reviews-meta.json"
    assert meta_path_for("a.b.c.jsonl") == "a.b.c-meta.json"
    assert meta_path_for("noext") == "noext-meta.json"


def test_spider_to_seed_row_defaults():
    r = spider_to_seed_row({})
    assert r["url"] == "" and r["first_page_only"] == 0
    assert r["last_review_hashes"] == []


def test_cli_single_seed_matches_oracle(ray_session, fixture_corpus,
                                        tmp_path):
    """-a SPIDER=<b64> crawls exactly that seed; JSONL bytes and meta match
    the serial oracle run restricted to the same seed."""
    corpus_dir, _ = fixture_corpus
    oc = OracleCrawl(corpus_dir)
    seed = next(s for s in oc.seeds if s["url"])
    oc.seeds = [seed]
    oc.run()
    want = oc.jsonl_lines(seed["seed_id"])

    spider = {"profile_key": seed["url"],
              "business_name": seed["business_name"],
              "first_page_only": seed["first_page_only"],
              "last_review_hashes": list(seed["last_review_hashes"]),
              "address": {"street": seed["addr_street"],
                          "city": seed["addr_city"],
                          "state": seed["addr_state"],
                          "zip": seed["addr_zip"]}}
    out = tmp_path / "cli" / "reviews.jsonl"
    rc = main(["--corpus", corpus_dir, "-a", f"SPIDER={_b64(spider)}",
               "-o", str(out), "-s", f"WORKDIR={tmp_path / 'wd'}"])
    assert rc == 0
    got = out.read_text().splitlines()
    # NOTE: the CLI maps the single spider to seed_id 0; byte parity is on
    # the record lines themselves
    assert got == want

    meta = json.loads(Path(meta_path_for(str(out))).read_text())
    assert meta == oc.meta(seed["seed_id"])


def test_cli_append_mode(ray_session, fixture_corpus, tmp_path):
    """O_APPEND|O_CREATE parity (main.go:936-948): a second run appends."""
    corpus_dir, _ = fixture_corpus
    oc = OracleCrawl(corpus_dir)
    seed = next(s for s in oc.seeds if s["url"])
    spider = {"profile_key": seed["url"]}
    out = tmp_path / "reviews.jsonl"
    for _ in range(2):
        assert main(["--corpus", corpus_dir, "-a", f"SPIDER={_b64(spider)}",
                     "-o", str(out),
                     "-s", f"WORKDIR={tmp_path / 'wd2'}"]) == 0
    lines = out.read_text().splitlines()
    assert len(lines) % 2 == 0 and len(lines) > 0
    half = len(lines) // 2
    assert lines[:half] == lines[half:]


def test_cli_auto_resume_on_rerun(ray_session, fixture_corpus, tmp_path,
                                  capsys):
    """Re-submitting the same command over a stable WORKDIR must RESUME
    from the latest complete checkpoint (not rmtree it and restart), and
    -s RESUME=0 must force the fresh-run path instead."""
    corpus_dir, _ = fixture_corpus
    oc = OracleCrawl(corpus_dir)
    seed = next(s for s in oc.seeds if s["url"])
    spider = {"profile_key": seed["url"]}
    out = tmp_path / "reviews.jsonl"
    wd = tmp_path / "wd"

    assert main(["--corpus", corpus_dir, "-a", f"SPIDER={_b64(spider)}",
                 "-o", str(out), "-s", f"WORKDIR={wd}"]) == 0
    assert not capsys.readouterr().err.count("resuming")
    first = out.read_text().splitlines()
    cks = {p.name for p in (wd / "checkpoint").iterdir()
           if (p / "_complete").exists()}
    assert cks

    # rerun: resumes (stderr notice), checkpoints survive, output appends
    # byte-identically
    assert main(["--corpus", corpus_dir, "-a", f"SPIDER={_b64(spider)}",
                 "-o", str(out), "-s", f"WORKDIR={wd}"]) == 0
    assert "resuming from checkpoint" in capsys.readouterr().err
    assert {p.name for p in (wd / "checkpoint").iterdir()
            if (p / "_complete").exists()} >= cks
    lines = out.read_text().splitlines()
    assert lines == first + first

    # RESUME=0: fresh run — no resume notice, still identical output
    assert main(["--corpus", corpus_dir, "-a", f"SPIDER={_b64(spider)}",
                 "-o", str(out), "-s", f"WORKDIR={wd}",
                 "-s", "RESUME=0"]) == 0
    assert "resuming" not in capsys.readouterr().err
    assert out.read_text().splitlines() == first * 3


def test_cli_resume_refuses_different_spider(ray_session, fixture_corpus,
                                             tmp_path, capsys):
    """A stable WORKDIR reused with a DIFFERENT spider must not resume the
    old job's checkpoints (that would emit the old spider's records) — the
    job signature forces a fresh run instead."""
    corpus_dir, _ = fixture_corpus
    oc = OracleCrawl(corpus_dir)
    urls = [s["url"] for s in oc.seeds if s["url"]]
    assert len(urls) >= 2
    wd = tmp_path / "wd"
    out_a = tmp_path / "a.jsonl"
    out_b = tmp_path / "b.jsonl"

    assert main(["--corpus", corpus_dir,
                 "-a", f"SPIDER={_b64({'profile_key': urls[0]})}",
                 "-o", str(out_a), "-s", f"WORKDIR={wd}"]) == 0
    capsys.readouterr()
    assert main(["--corpus", corpus_dir,
                 "-a", f"SPIDER={_b64({'profile_key': urls[1]})}",
                 "-o", str(out_b), "-s", f"WORKDIR={wd}"]) == 0
    err = capsys.readouterr().err
    assert "not resuming" in err and "DIFFERENT job" in err
    # spider B got ITS OWN crawl, not A's resumed records
    oc_b = OracleCrawl(corpus_dir)
    seed_b = next(s for s in oc_b.seeds if s["url"] == urls[1])
    oc_b.seeds = [seed_b]
    oc_b.run()
    assert out_b.read_text().splitlines() == \
        oc_b.jsonl_lines(seed_b["seed_id"])
