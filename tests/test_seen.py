"""SeenShard at load: the exact dict must stay authoritative past the cuckoo
filter's default capacity (1<<16 slots) — over-full inserts can evict
resident fingerprints, so a filter miss must never be read as 'new'
(regression for the silent-duplicate-scheduling bug)."""

from __future__ import annotations

import sys
from pathlib import Path

import ray

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from go_scrapper_ray.state.cuckoo import CuckooFilter
from go_scrapper_ray.state.seen import SeenShard


def test_seen_shard_past_filter_capacity(ray_session):
    n = 100_000  # > 65_536 default filter slots
    shard = SeenShard.remote(0)
    hashes = [((i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)) for i in range(n)]
    canons = [f"https://h{i % 997}.example.com/p/{i}" for i in range(n)]

    first, second = [], []
    B = 8192
    for i in range(0, n, B):
        first.extend(ray.get(
            shard.add_if_new.remote(hashes[i:i+B], canons[i:i+B])))
    assert all(first), "every distinct hash must be new on first insert"
    assert ray.get(shard.size.remote()) == n

    for i in range(0, n, B):
        second.extend(ray.get(
            shard.add_if_new.remote(hashes[i:i+B], canons[i:i+B])))
    dupes_reported_new = sum(second)
    assert dupes_reported_new == 0, (
        f"{dupes_reported_new} previously-seen URLs reported new "
        "(filter eviction treated as authoritative)")

    assert all(ray.get(shard.contains.remote(hashes[:B])))
    ray.kill(shard)


def test_cuckoo_filter_reports_overfull():
    cf = CuckooFilter(1 << 10)  # 1024 slots
    failed = 0
    for i in range(4096):
        h = (i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        if not cf.add(h):
            failed += 1
    assert failed > 0, "filter must signal over-full instead of lying"


def test_filter_backlog_flushes_at_checkpoint(ray_session, tmp_path):
    """Deferred cuckoo inserts (off the resolve critical path) must land in
    the filter before any boundary that could consult it: after checkpoint
    the flushed filter answers positively for every inserted hash."""
    s = SeenShard.remote(0)
    hashes = list(range(1000, 2000))
    ray.get(s.add_if_new.remote(hashes, [f"u{h}" for h in hashes]))
    p = str(tmp_path / "seen.parquet")
    assert ray.get(s.checkpoint.remote(p)) == len(hashes)

    # restore into a fresh shard: exact set and filter rebuilt together
    s2 = SeenShard.remote(1)
    assert ray.get(s2.restore.remote(p)) == len(hashes)
    assert ray.get(s2.contains.remote(hashes)) == [True] * len(hashes)
    # previously-seen stays non-new after the deferred-flush round trip
    again = ray.get(s2.add_if_new.remote(hashes[:10], ["x"] * 10))
    assert again == [False] * 10


def test_resolve_dedups_at_least_once_submission(ray_session):
    """At-least-once delivery safety: a round task that is speculatively
    re-executed re-submits the SAME link table to the seen shards.
    resolve() must pick the same winners and push each URL to the frontier
    exactly once (the vectorized first-occurrence pick dedups duplicate
    rows; the exact dict blocks cross-round replays)."""
    import numpy as np
    import pyarrow as pa
    import ray
    from go_scrapper_ray.state.frontier import FrontierShard
    from go_scrapper_ray.state.seen import SeenShard

    fcfg = {"delay_ms": 0, "jitter_ms": 0, "jitter_seed": 1,
            "ignore_robots": True, "max_per_host_per_round": 0}
    frontier = [FrontierShard.remote(0, fcfg)]
    seen = SeenShard.remote(0)
    ray.get(seen.set_frontier.remote(frontier))

    def links(n):
        return pa.table({
            "seed_id": pa.array(list(range(n)), pa.int64()),
            "page_seq": pa.array([10 + i for i in range(n)], pa.int64()),
            "emit_idx": pa.array([0] * n, pa.int32()),
            "l_url": pa.array([f"https://h.example/p{i}" for i in range(n)]),
            "l_canon": pa.array([f"https://h.example/p{i}" for i in range(n)]),
            "l_hash": pa.array(list(range(100, 100 + n)), pa.uint64()),
            "l_host": pa.array(["h.example"] * n),
            "l_hosthash": pa.array([7] * n, pa.uint64()),
            "l_kind": pa.array(["feed"] * n),
            "l_depth": pa.array([1] * n, pa.int32()),
            "l_rel": pa.array(["x"] * n),
            "l_src": pa.array(["https://h.example/"] * n),
        })

    t = links(5)
    ray.get(seen.submit.remote(t))
    ray.get(seen.submit.remote(t))      # duplicate delivery (task retry)
    edges, cand, _ = ray.get(seen.resolve.remote())
    assert edges.num_rows == 5          # one edge per URL, not 10
    assert ray.get(frontier[0].pending.remote()) == 5  # one push per URL

    # cross-round replay: the SAME table again later must add nothing
    ray.get(seen.submit.remote(t))
    edges2, _, _ = ray.get(seen.resolve.remote())
    assert edges2 is None or edges2.num_rows == 0
    assert ray.get(frontier[0].pending.remote()) == 5
