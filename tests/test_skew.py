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


# --------------------------------------------------- hot-USER event skew
# (VERDICT r4 item 6: per-user operators must not serialize a bot user
# holding ~10% of all events onto one task)

def _hot_user_corpus(tmp_path, n=20_000, hot_share=0.10, n_users=50):
    """events.parquet where user 7 owns ``hot_share`` of all events,
    timestamps interleaved so sessions/gaps are nontrivial."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n_hot = int(n * hot_share)
    users = np.concatenate([
        np.full(n_hot, 7, dtype=np.int64),
        rng.integers(100, 100 + n_users, size=n - n_hot, dtype=np.int64)])
    rng.shuffle(users)
    # gaps drawn around the 1800 s session threshold
    ts = np.cumsum(rng.integers(1, 3_600_000_000, size=n)) \
        + 1_600_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path), tbl


def _serial_sessions(tbl, gap_s=1800):
    import numpy as np
    import pandas as pd

    df = (tbl.select(["user_id", "ts", "event_id"]).to_pandas())
    df["ts_us"] = df["ts"].astype("int64")
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_s * 1_000_000
        sess = np.cumsum(new) - 1
        for s in range(sess[-1] + 1):
            m = sess == s
            out.append((uid, s, int(m.sum()), int(ts[m].min()),
                        int(ts[m].max())))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_sessionize_hot_user_block_distributed(tmp_path):
    """sessionize must produce the exact serial answer when one user owns
    10% of events AND the sorted stream is split into many small blocks
    (so the hot user spans multiple blocks and every boundary-stitch path
    — merge, chain, numbering offsets — is exercised)."""
    import ray.data as rd
    from ray.data.context import DataContext

    sf_dir, tbl = _hot_user_corpus(tmp_path)
    from go_scrapper_ray.pipelines import events

    old = DataContext.get_current().target_max_block_size
    DataContext.get_current().target_max_block_size = 64 * 1024  # many blocks
    try:
        got = sorted(
            (r["user_id"], r["session_idx"], r["n_events"], r["start_us"],
             r["end_us"]) for r in events.sessionize(sf_dir).take_all())
    finally:
        DataContext.get_current().target_max_block_size = old
    assert got == _serial_sessions(tbl)


@pytest.mark.usefixtures("ray_session")
def test_gap_stats_hot_user_block_distributed(tmp_path):
    """user_gap_stats decomposable partials + boundary gaps must equal the
    serial per-user answer under the same hot-user many-block regime."""
    import numpy as np
    from ray.data.context import DataContext

    sf_dir, tbl = _hot_user_corpus(tmp_path)
    from go_scrapper_ray.pipelines import events

    old = DataContext.get_current().target_max_block_size
    DataContext.get_current().target_max_block_size = 64 * 1024
    try:
        got = {r["user_id"]: (r["n_gaps"], r["sum_gap_us"], r["max_gap_us"])
               for r in events.user_gap_stats(sf_dir).take_all()}
    finally:
        DataContext.get_current().target_max_block_size = old

    df = tbl.select(["user_id", "ts", "event_id"]).to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    for uid, g in df.groupby("user_id"):
        ts = g.sort_values(["ts_us", "event_id"])["ts_us"].to_numpy()
        gaps = ts[1:] - ts[:-1]
        want = (len(gaps), int(gaps.sum()) if len(gaps) else 0,
                int(gaps.max()) if len(gaps) else 0)
        assert got[uid] == want, uid


def _hot_user_mixed_corpus(tmp_path, n=24_000, hot_share=0.10):
    """events.parquet with a hot user, mixed types, and deliberate
    same-(user, ts) collisions (every 7th event repeats the previous
    timestamp) so the sorted-block forward-peer paths are exercised."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n_hot = int(n * hot_share)
    users = np.concatenate([
        np.full(n_hot, 7, dtype=np.int64),
        rng.integers(100, 160, size=n - n_hot, dtype=np.int64)])
    rng.shuffle(users)
    gaps = rng.integers(1, 2_000_000_000, size=n)
    gaps[::7] = 0  # ts collisions (global AND within users after sort)
    ts = np.cumsum(gaps) + 1_600_000_000_000_000
    types = rng.choice(["view", "click", "purchase"], size=n)
    vals = np.round(rng.uniform(0.5, 99.5, size=n), 2)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(types.tolist()),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path), tbl


@pytest.mark.usefixtures("ray_session")
def test_asof_range_rolling_hot_user_block_distributed(tmp_path):
    """asof_join / range_join / rolling_value sorted-block rewrites must
    equal the serial per-user reference under a hot user, many small
    blocks, and same-(user, ts) collisions (back-window + forward-peer
    context paths all exercised)."""
    import numpy as np
    import pandas as pd
    from ray.data.context import DataContext

    sf_dir, tbl = _hot_user_mixed_corpus(tmp_path)
    from go_scrapper_ray.pipelines import events

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    W = 3600 * 1_000_000

    old = DataContext.get_current().target_max_block_size
    DataContext.get_current().target_max_block_size = 64 * 1024
    try:
        got_asof = events.asof_join(sf_dir).to_pandas()
        got_range = events.range_join(sf_dir).to_pandas()
        got_roll = events.rolling_value(sf_dir).to_pandas()
    finally:
        DataContext.get_current().target_max_block_size = old

    # serial references (the original per-user formulations)
    asof_rows, range_rows, roll_rows = [], [], []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        # asof: purchase vs click
        left = g[g["event_type"] == "purchase"]
        right = g[g["event_type"] == "click"]
        r_ts = right["ts_us"].to_numpy()
        if len(left) and len(right):
            idx = np.searchsorted(r_ts, left["ts_us"].to_numpy(),
                                  side="right") - 1
            hit = idx >= 0
            for le, lt, i in zip(left["event_id"].to_numpy()[hit],
                                 left["ts_us"].to_numpy()[hit], idx[hit]):
                asof_rows.append((le, uid, lt,
                                  int(right["event_id"].to_numpy()[i]),
                                  int(r_ts[i]), int(lt - r_ts[i])))
        # range: purchases vs clicks in [ts-W, ts)
        rc = cents[(g["event_type"] == "click").to_numpy()]
        pref = np.concatenate(([0], np.cumsum(rc)))
        l_ts = left["ts_us"].to_numpy()
        lo = np.searchsorted(r_ts, l_ts - W, side="left")
        hi = np.searchsorted(r_ts, l_ts, side="left")
        for le, lt, a, b in zip(left["event_id"].to_numpy(), l_ts, lo, hi):
            range_rows.append((le, uid, lt, int(b - a),
                               int(pref[b] - pref[a])))
        # rolling over ALL events
        ts_all = g["ts_us"].to_numpy()
        csum = np.cumsum(cents)
        lo = np.searchsorted(ts_all, ts_all - W, side="left")
        hi = np.searchsorted(ts_all, ts_all, side="right")
        roll = csum[hi - 1] - np.where(lo > 0, csum[lo - 1], 0)
        for ei, t, rl, nn in zip(g["event_id"].to_numpy(), ts_all,
                                 roll, hi - lo):
            roll_rows.append((ei, uid, t, int(rl), int(nn)))

    def norm(df_, cols):
        return sorted(map(tuple, df_[cols].to_numpy().tolist()))

    assert norm(got_asof, ["event_id", "user_id", "ts_us",
                           "prior_event_id", "prior_ts_us", "gap_us"]) \
        == sorted(asof_rows)
    assert norm(got_range, ["event_id", "user_id", "ts_us",
                            "n_clicks_1h", "click_cents_1h"]) \
        == sorted(range_rows)
    assert norm(got_roll, ["event_id", "user_id", "ts_us",
                           "roll_cents", "roll_n"]) == sorted(roll_rows)


@pytest.mark.usefixtures("ray_session")
def test_funnel_hot_user_shuffle_only(tmp_path):
    """funnel's join-chain decomposition must equal the serial per-user
    reference under the hot-user mixed corpus (no per-user group exists
    anywhere in the pipeline)."""
    import numpy as np
    from ray.data.context import DataContext

    sf_dir, tbl = _hot_user_mixed_corpus(tmp_path)
    from go_scrapper_ray.pipelines import events

    old = DataContext.get_current().target_max_block_size
    DataContext.get_current().target_max_block_size = 64 * 1024
    try:
        got = {r["user_id"]: (r["n_views"], r["n_clicks"], r["n_purchases"],
                              r["first_view_us"],
                              r["first_click_after_view_us"],
                              r["first_purchase_us"])
               for r in events.funnel(sf_dir).take_all()}
    finally:
        DataContext.get_current().target_max_block_size = old

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    for uid, g in df.groupby("user_id"):
        ts = {k: g.loc[g["event_type"] == k, "ts_us"].to_numpy()
              for k in ("view", "click", "purchase")}
        fv = int(ts["view"].min()) if len(ts["view"]) else -1
        fc = -1
        if fv >= 0:
            c = ts["click"][ts["click"] >= fv]
            fc = int(c.min()) if len(c) else -1
        fp = -1
        if fc >= 0:
            p = ts["purchase"][ts["purchase"] >= fc]
            fp = int(p.min()) if len(p) else -1
        assert got[uid] == (len(ts["view"]), len(ts["click"]),
                            len(ts["purchase"]), fv, fc, fp), uid


@pytest.mark.usefixtures("ray_session")
def test_late_events_hot_user_block_distributed(tmp_path):
    """late_events' carry-scalar sorted-block shape must equal the serial
    arrival-order reference under the hot-user mixed corpus and many
    small blocks."""
    import numpy as np
    from ray.data.context import DataContext

    sf_dir, tbl = _hot_user_mixed_corpus(tmp_path)
    from go_scrapper_ray.pipelines import events

    old = DataContext.get_current().target_max_block_size
    DataContext.get_current().target_max_block_size = 64 * 1024
    try:
        got = {r["user_id"]: (r["n_events"], r["n_late"])
               for r in events.late_events(sf_dir).take_all()}
    finally:
        DataContext.get_current().target_max_block_size = old

    df = tbl.to_pandas()
    df["us"] = df["ts"].astype("int64")
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("event_id", kind="mergesort")
        us = g["us"].to_numpy()
        prior = np.maximum.accumulate(us)[:-1]
        late = int((us[1:] < prior).sum())
        assert got[uid] == (len(g), late), uid
