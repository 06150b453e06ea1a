"""Stream-shaped operators over the ``events`` table (SURVEY.md §2.8: the
reference's only streaming concerns are politeness/windows; these are the
engine's general-purpose analogs — Ray Data treats the stream as an ordered,
partitioned log).

Monetary-style sums use integer cents so the DuckDB oracle comparison is
exact (float sum order is non-deterministic under parallelism)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..agg import hash_agg, partition_ids, topk



def _events(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(columns))


def windowed_counts(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """(event_type, window_id, n, cents): tumbling-window aggregate.
    Pre-aggregated inside map_batches (one row per (type, window) per batch)
    before the global groupby — combiner-before-shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64())
        window_id = pc.divide(epoch_us, 1_000_000 * window_s)
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        tmp = pa.table({"event_type": t["event_type"],
                        "window_id": window_id.cast(pa.int64()),
                        "cents": cents})
        g = tmp.group_by(["event_type", "window_id"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["event_type", "window_id", "p_cents", "p_n"])

    return hash_agg(_events(sf_dir, ("ts", "event_type", "value"))
                    .map_batches(partial, batch_format="pyarrow"),
                    ["event_type", "window_id"],
                    [("p_n", "sum", "n"), ("p_cents", "sum", "cents")])


_SESS_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("session_idx", pa.int64()),
    ("n_events", pa.int64()), ("start_us", pa.int64()),
    ("end_us", pa.int64())])


def sessionize(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """(user_id, session_idx, n_events, start_us, end_us): session windows
    with a 30-min inactivity gap, per user.

    Scale shape — HOT-USER SAFE (no per-user group ever materializes):
    one range-partitioned ``sort`` on (user, ts, event_id), then each
    block sessionizes its own slice vectorized, and the driver stitches
    the O(blocks) boundary fragments (a session that spans a block cut
    merges across the cut; chains spanning many blocks fold left) — the
    ``cumulative_value`` two-pass pattern.  A bot user holding 10% of all
    events is simply 10% of the sorted blocks, processed in parallel;
    driver state and per-task work stay O(block), never O(hot user).
    Per-user session_idx numbering flows through the same O(blocks)
    walk (only block-boundary users need cross-block offsets)."""
    import ray

    gap_us = gap_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts_us": t["ts"].cast(pa.int64())})

    refs = (_events(sf_dir, ("ts", "user_id", "event_id"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    @ray.remote(num_cpus=0.5, num_returns=2)
    def block_sessionize(tb: pa.Table):
        """ONE heavy pass per block: the local session table (user_id,
        local per-user ordinal, n, start, end — session-count-sized, kept
        in the object store) and the O(1) boundary meta the driver stitch
        needs, as two return objects so the driver gathers only meta."""
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _SESS_SCHEMA.empty_table(), None
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        n_sess = int(new.sum())
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u)) - 1
        su = u[starts]
        run_first = np.ones(n_sess, dtype=bool)
        run_first[1:] = su[1:] != su[:-1]
        run_id = np.cumsum(run_first) - 1
        first_pos = np.flatnonzero(run_first)
        local_idx = np.arange(n_sess) - first_pos[run_id]
        sess = pa.table({
            "user_id": pa.array(su, pa.int64()),
            "session_idx": pa.array(local_idx, pa.int64()),  # LOCAL idx
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends], pa.int64())})
        fu, lu = int(u[0]), int(u[-1])
        meta = {"fu": fu, "fu_ts": int(ts[0]), "lu": lu,
                "lu_ts": int(ts[-1]), "n_sess": n_sess,
                "n_fu": int((su == fu).sum()), "n_lu": int((su == lu).sum()),
                "first": (int(ts[starts[0]]), int(ts[ends[0]]),
                          int(ends[0] - starts[0] + 1)),
                "last": (int(ts[starts[-1]]), int(ts[ends[-1]]),
                         int(ends[-1] - starts[-1] + 1))}
        return sess, meta

    ret = [block_sessionize.remote(r) for r in refs]
    sess_refs = [r[0] for r in ret]
    metas = ray.get([r[1] for r in ret])
    live = [(i, m) for i, m in enumerate(metas) if m is not None]

    # ---- O(blocks) driver stitch: merge flags, per-block user offsets,
    # and the chain-merged boundary sessions
    drop_first = {i: False for i, _ in live}
    drop_last = {i: False for i, _ in live}
    offs: dict[int, dict[int, int]] = {i: {} for i, _ in live}
    merged_rows: list[tuple[int, int, int, int, int]] = []

    carry_user: "int | None" = None
    completed = 0          # fully closed sessions of carry_user so far
    open_frag: "tuple[int, int, int] | None" = None  # (start, end, n)
    open_multi = False     # does open_frag span >1 block
    open_src: "int | None" = None  # block owning the first fragment

    def _close_open():
        nonlocal open_frag, open_multi, open_src
        if open_frag is not None and open_multi:
            merged_rows.append((carry_user, completed, open_frag[2],
                                open_frag[0], open_frag[1]))
        open_frag, open_multi, open_src = None, False, None

    for i, m in live:
        merged_here = False
        if carry_user is not None:
            if (m["fu"] == carry_user
                    and m["fu_ts"] - open_frag[1] <= gap_us):
                # block i's first session continues the open session
                merged_here = True
                drop_first[i] = True
                if not open_multi:
                    drop_last[open_src] = True
                    open_multi = True
                fs = m["first"]
                open_frag = (open_frag[0], fs[1], open_frag[2] + fs[2])
                offs[i][m["fu"]] = completed
            else:
                _close_open()
                if m["fu"] == carry_user:
                    offs[i][m["fu"]] = completed + 1
        if merged_here and (m["fu"] != m["lu"] or m["n_sess"] > 1):
            # the merged session closed inside block i
            _close_open()
        # open candidate: block i's last session
        base_lu = offs[i].get(m["lu"], 0)
        offs[i][m["lu"]] = base_lu
        new_completed = base_lu + m["n_lu"] - 1
        if open_frag is None:
            open_frag = m["last"]
            open_src = i
            open_multi = False
        carry_user = m["lu"]
        completed = new_completed
    _close_open()

    @ray.remote(num_cpus=0.25)
    def patch(sess: pa.Table, dfirst: bool, dlast: bool,
              off: dict) -> pa.Table:
        """TINY pass over the session-count-sized wave-1 table: apply the
        boundary drops and per-user global offsets the stitch decided."""
        n = sess.num_rows
        if n == 0:
            return sess
        su = sess["user_id"].to_numpy(zero_copy_only=False)
        gidx = (sess["session_idx"].to_numpy(zero_copy_only=False)
                + np.array([off.get(int(x), 0) for x in su],
                           dtype=np.int64))
        keep = np.ones(n, dtype=bool)
        if dfirst:
            keep[0] = False
        if dlast and (n > 1 or not dfirst):
            keep[-1] = False
        return pa.table({
            "user_id": pa.array(su[keep], pa.int64()),
            "session_idx": pa.array(gidx[keep], pa.int64()),
            "n_events": sess["n_events"].filter(pa.array(keep)),
            "start_us": sess["start_us"].filter(pa.array(keep)),
            "end_us": sess["end_us"].filter(pa.array(keep))})

    out_refs = [patch.remote(s, drop_first.get(i, False),
                             drop_last.get(i, False), offs.get(i, {}))
                for i, s in enumerate(sess_refs)]
    mtbl = pa.table({
        "user_id": pa.array([r[0] for r in merged_rows], pa.int64()),
        "session_idx": pa.array([r[1] for r in merged_rows], pa.int64()),
        "n_events": pa.array([r[2] for r in merged_rows], pa.int64()),
        "start_us": pa.array([r[3] for r in merged_rows], pa.int64()),
        "end_us": pa.array([r[4] for r in merged_rows], pa.int64())})
    return rd.from_arrow_refs(out_refs).union(rd.from_arrow(mtbl))


import ray as _ray_mod


@_ray_mod.remote(num_cpus=0.25)
def _block_bounds(tb: pa.Table):
    """(fu, fu_ts, lu, lu_ts) of a (user, ts, event_id)-sorted block —
    the O(1) metadata the sorted-block context walks run on."""
    if tb.num_rows == 0 or "user_id" not in tb.column_names:
        return None
    u = tb["user_id"].to_numpy(zero_copy_only=False)
    ts = tb["ts_us"].to_numpy(zero_copy_only=False)
    return (int(u[0]), int(ts[0]), int(u[-1]), int(ts[-1]))


def _back_window_ctx(live: list[int], bounds: dict,
                     window_us: int) -> dict[int, list[int]]:
    """Back-window context per block: the contiguous run of EARLIER
    blocks that can still hold rows of this block's first user within
    ``window_us`` of its first row.  Within one user the stream is
    ts-sorted across blocks, so the walk stops at the first earlier
    block whose last ts falls below the bound.  O(blocks) total."""
    out: dict[int, list[int]] = {i: [] for i in live}
    for pos, i in enumerate(live):
        fu, fu_ts, _lu, _lts = bounds[i]
        lob = fu_ts - window_us
        js: list[int] = []
        for j in reversed(live[:pos]):
            fu_j, _fts_j, lu_j, lts_j = bounds[j]
            if lu_j != fu or lts_j < lob:
                break
            js.append(j)
            if fu_j != fu:  # block j starts a different user: run ends
                break
        out[i] = list(reversed(js))
    return out


def _fwd_eq_ctx(live: list[int], bounds: dict) -> dict[int, list[int]]:
    """Forward equal-ts context per block: the contiguous run of LATER
    blocks that start with the same (user, ts) this block ends on — the
    only place same-ts peers of a block's tail rows can hide (the stream
    is (user, ts, event_id)-sorted).  O(blocks) total."""
    out: dict[int, list[int]] = {i: [] for i in live}
    for pos, i in enumerate(live):
        _fu, _fts, lu, lts = bounds[i]
        for j in live[pos + 1:]:
            fu_j, fts_j, lu_j, lts_j = bounds[j]
            if fu_j != lu or fts_j != lts:
                break
            out[i].append(j)
            if lu_j != lu or lts_j != lts:  # run ends inside j
                break
    return out


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click") -> rd.Dataset:
    """(event_id, user_id, ts_us, prior_event_id, prior_ts_us, gap_us):
    per-user AS-OF join — each `left_type` event matched to the latest
    `right_type` event at-or-before it (ties on ts broken by max event_id).
    Lefts with no prior right are dropped (inner as-of).

    Ray Data has no as-of join primitive.  Scale shape — HOT-USER SAFE
    (the sessionize sorted-block pattern): one range-partitioned sort on
    (user, ts, event_id); each block matches its own lefts vectorized;
    the ONLY cross-block state is (a) the latest earlier-block right of
    the block's first user — a single row the driver chains through
    O(blocks) metadata — and (b) same-ts peer rights in the forward
    equal-(user, ts) run (a right with the left's exact ts but a larger
    event_id can land in the next block)."""
    import ray

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array([left_type, right_type]))
        t = t.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "is_left": pc.equal(t["event_type"], left_type),
        })

    refs = (_events(sf_dir, ("ts", "user_id", "event_id", "event_type"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def meta(tb: pa.Table):
        """(fu, fu_ts, lu, lu_ts, lr_ts, lr_eid): block bounds + the last
        RIGHT row of the block's last user (None sentinel -1)."""
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return None
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        eid = tb["event_id"].to_numpy(zero_copy_only=False)
        il = tb["is_left"].to_numpy(zero_copy_only=False)
        lu = int(u[-1])
        rmask = (u == lu) & ~il
        if rmask.any():
            last = np.flatnonzero(rmask)[-1]
            lr = (int(ts[last]), int(eid[last]))
        else:
            lr = None
        return (int(u[0]), int(ts[0]), lu, int(ts[-1]), lr)

    metas = ray.get([meta.remote(r) for r in refs])
    live = [i for i, m in enumerate(metas) if m is not None]
    bounds = {i: metas[i][:4] for i in live}
    fwd = _fwd_eq_ctx(live, bounds)

    # chain the latest-right carry through the sorted block sequence
    carry_in: dict[int, "tuple[int, int] | None"] = {}
    carry: "tuple[int, int] | None" = None
    carry_user: "int | None" = None
    for i in live:
        fu, _fts, lu, _lts, lr = metas[i]
        carry_in[i] = carry if carry_user == fu else None
        if lr is not None:
            carry, carry_user = lr, lu
        elif not (fu == lu and carry_user == lu):
            carry, carry_user = None, lu

    _OUT = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts_us", pa.int64()), ("prior_event_id", pa.int64()),
        ("prior_ts_us", pa.int64()), ("gap_us", pa.int64())])

    @ray.remote(num_cpus=0.5)
    def block_asof(tb: pa.Table, cin, fu, lu, lts, *fwd_blocks) -> pa.Table:
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _OUT.empty_table()
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        eid = tb["event_id"].to_numpy(zero_copy_only=False)
        il = tb["is_left"].to_numpy(zero_copy_only=False)
        # forward same-(user, ts) peer rights from the run blocks
        f_ts, f_eid = [], []
        for fb in fwd_blocks:
            fu_b = fb["user_id"].to_numpy(zero_copy_only=False)
            ft = fb["ts_us"].to_numpy(zero_copy_only=False)
            m = (fu_b == lu) & (ft == lts) & \
                ~fb["is_left"].to_numpy(zero_copy_only=False)
            f_ts.append(ft[m])
            f_eid.append(fb["event_id"].to_numpy(zero_copy_only=False)[m])
        cols = {k: [] for k in ("event_id", "user_id", "ts_us",
                                "prior_event_id", "prior_ts_us", "gap_us")}
        seg_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        seg_ends = np.append(seg_starts[1:], len(u))
        for s, e in zip(seg_starts, seg_ends):
            usr = int(u[s])
            lm = il[s:e]
            l_ts, l_eid = ts[s:e][lm], eid[s:e][lm]
            r_ts, r_eid = ts[s:e][~lm], eid[s:e][~lm]
            if usr == fu and cin is not None:
                r_ts = np.concatenate(([cin[0]], r_ts))
                r_eid = np.concatenate(([cin[1]], r_eid))
            if usr == lu and f_ts:
                r_ts = np.concatenate([r_ts] + f_ts)
                r_eid = np.concatenate([r_eid] + f_eid)
            if not len(l_ts) or not len(r_ts):
                continue
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            hit = idx >= 0
            idx = idx[hit]
            cols["event_id"].append(l_eid[hit])
            cols["user_id"].append(np.full(int(hit.sum()), usr, np.int64))
            cols["ts_us"].append(l_ts[hit])
            cols["prior_event_id"].append(r_eid[idx])
            cols["prior_ts_us"].append(r_ts[idx])
            cols["gap_us"].append(l_ts[hit] - r_ts[idx])
        if not cols["event_id"]:
            return _OUT.empty_table()
        return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                         for k, v in cols.items()})

    out_refs = [block_asof.remote(refs[i], carry_in[i], metas[i][0],
                                  metas[i][2], metas[i][3],
                                  *[refs[j] for j in fwd[i]])
                for i in live]
    if not out_refs:
        return rd.from_arrow(_OUT.empty_table())
    return rd.from_arrow_refs(out_refs)


def top_users_by_value(sf_dir: str, n: int = 10) -> rd.Dataset:
    """(user_id, cents): top-N users by total value — partial per batch,
    groupby sum, global top-N (sort on the tiny aggregate)."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        tmp = pa.table({"user_id": t["user_id"], "cents": cents})
        g = tmp.group_by("user_id").aggregate([("cents", "sum")])
        return g.rename_columns(["user_id", "p_cents"])

    agg = hash_agg(_events(sf_dir, ("user_id", "value"))
                   .map_batches(partial, batch_format="pyarrow"),
                   "user_id", [("p_cents", "sum", "cents")])
    return topk(agg, [("cents", "descending"), ("user_id", "ascending")], n)

def funnel(sf_dir: str) -> rd.Dataset:
    """(user_id, n_views, n_clicks, n_purchases, first_view_us,
    first_click_after_view_us, first_purchase_us): per-user conversion
    funnel view -> click -> purchase.  Stage k's timestamp is the earliest
    event of that type at-or-after stage k-1's timestamp; unreached stages
    are -1 (sentinel, not null, so the int64 schema is stable whether or
    not any user converts).  Same groupby(user_id) partitioning contract
    as sessionize (one user's events fit one group)."""

    TYPES = ("view", "click", "purchase")

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(list(TYPES)))
        t = t.filter(keep)
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts_us": t["ts"].cast(pa.int64())})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = {k: g.loc[g["event_type"] == k, "ts_us"].to_numpy()
              for k in TYPES}
        first_view = int(ts["view"].min()) if len(ts["view"]) else -1
        first_click = -1
        if first_view >= 0:
            c = ts["click"][ts["click"] >= first_view]
            first_click = int(c.min()) if len(c) else -1
        first_purchase = -1
        if first_click >= 0:
            p = ts["purchase"][ts["purchase"] >= first_click]
            first_purchase = int(p.min()) if len(p) else -1
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_views": pd.array([len(ts["view"])], dtype="int64"),
            "n_clicks": pd.array([len(ts["click"])], dtype="int64"),
            "n_purchases": pd.array([len(ts["purchase"])], dtype="int64"),
            "first_view_us": pd.array([first_view], dtype="int64"),
            "first_click_after_view_us": pd.array([first_click],
                                                  dtype="int64"),
            "first_purchase_us": pd.array([first_purchase], dtype="int64"),
        })

    return (_events(sf_dir, ("ts", "user_id", "event_type"))
            .map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))


def range_join(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """(event_id, user_id, ts_us, n_clicks_1h, click_cents_1h): per-user
    RANGE JOIN — each purchase joined to the clicks in the preceding
    ``window_s`` half-open window [ts - window_s, ts).  Ray Data has no
    range-join primitive.

    Scale shape — HOT-USER SAFE (the sessionize sorted-block pattern):
    one range-partitioned sort on (user, ts, event_id); each block
    range-joins its own purchases vectorized (per-segment prefix-sum +
    two searchsorted probes); the only cross-block input is the BACK
    window context — clicks of the block's first user within
    ``window_s`` of its first row, pulled zero-copy from the contiguous
    run of earlier same-user blocks the driver identifies from O(blocks)
    bounds.  The window is half-open, so no forward peers exist."""
    import ray

    W = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "click"]))
        t = t.filter(keep)
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "is_left": pc.equal(t["event_type"], "purchase"),
                         "cents": cents})

    refs = (_events(sf_dir, ("ts", "user_id", "event_id", "event_type",
                             "value"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    bounds_l = ray.get([_block_bounds.remote(r) for r in refs])
    live = [i for i, b in enumerate(bounds_l) if b is not None]
    bounds = {i: bounds_l[i] for i in live}
    back = _back_window_ctx(live, bounds, W)

    _OUT = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts_us", pa.int64()), ("n_clicks_1h", pa.int64()),
        ("click_cents_1h", pa.int64())])

    @ray.remote(num_cpus=0.5)
    def block_range(tb: pa.Table, fu, fu_ts, *back_blocks) -> pa.Table:
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _OUT.empty_table()
        # back-context clicks of the first user within its window
        b_ts, b_cents = [], []
        for bb in back_blocks:
            bu = bb["user_id"].to_numpy(zero_copy_only=False)
            bt = bb["ts_us"].to_numpy(zero_copy_only=False)
            m = (bu == fu) & (bt >= fu_ts - W) & \
                ~bb["is_left"].to_numpy(zero_copy_only=False)
            b_ts.append(bt[m])
            b_cents.append(bb["cents"].to_numpy(zero_copy_only=False)[m])
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        eid = tb["event_id"].to_numpy(zero_copy_only=False)
        il = tb["is_left"].to_numpy(zero_copy_only=False)
        cents = tb["cents"].to_numpy(zero_copy_only=False)
        cols = {k: [] for k in ("event_id", "user_id", "ts_us",
                                "n_clicks_1h", "click_cents_1h")}
        seg_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        seg_ends = np.append(seg_starts[1:], len(u))
        for s, e in zip(seg_starts, seg_ends):
            usr = int(u[s])
            lm = il[s:e]
            l_ts, l_eid = ts[s:e][lm], eid[s:e][lm]
            if not len(l_ts):
                continue
            r_ts, r_c = ts[s:e][~lm], cents[s:e][~lm]
            if usr == fu and b_ts:
                r_ts = np.concatenate(b_ts + [r_ts])
                r_c = np.concatenate(b_cents + [r_c])
            pref = np.concatenate(([0], np.cumsum(r_c)))
            lo = np.searchsorted(r_ts, l_ts - W, side="left")
            hi = np.searchsorted(r_ts, l_ts, side="left")
            cols["event_id"].append(l_eid)
            cols["user_id"].append(np.full(len(l_ts), usr, np.int64))
            cols["ts_us"].append(l_ts)
            cols["n_clicks_1h"].append((hi - lo).astype(np.int64))
            cols["click_cents_1h"].append(pref[hi] - pref[lo])
        if not cols["event_id"]:
            return _OUT.empty_table()
        return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                         for k, v in cols.items()})

    out_refs = [block_range.remote(refs[i], bounds[i][0], bounds[i][1],
                                   *[refs[j] for j in back[i]])
                for i in live]
    if not out_refs:
        return rd.from_arrow(_OUT.empty_table())
    return rd.from_arrow_refs(out_refs)


def daily_active(sf_dir: str) -> rd.Dataset:
    """(day, dau, n_events): daily active users + event volume — the
    COUNT-DISTINCT class.  Exact distributed count-distinct in two
    shuffles, both pre-combined: (a) per-batch dedupe of (day, user)
    with partial event counts, groupby(day, user) — the only shuffle
    whose key domain is large, and its payload is already one row per
    (day, user) per batch; (b) per-batch per-day partials over that
    deduped set, groupby(day) over |days| keys."""
    DAY_US = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), DAY_US).cast(pa.int64())
        g = (pa.table({"day": day, "user_id": t["user_id"]})
             .group_by(["day", "user_id"]).aggregate([("user_id", "count")]))
        g = g.rename_columns(["day", "user_id", "p_n"])
        return g.append_column("__part",
                               pa.array(partition_ids(g, ["day"], 32)))

    # both the (day, user) distinct and the per-day rollup key on `day`,
    # so ONE day-partitioned exchange finishes both — no second shuffle
    def day_stats(g: pa.Table) -> pa.Table:
        per_uu = (g.group_by(["day", "user_id"])
                  .aggregate([("p_n", "sum")]))
        st = per_uu.group_by("day").aggregate(
            [("user_id", "count"), ("p_n_sum", "sum")])
        return st.rename_columns(["day", "dau", "n_events"])

    return (_events(sf_dir, ("ts", "user_id"))
            .map_batches(prep, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(day_stats, batch_format="pyarrow"))


def retention_cohorts(sf_dir: str, shards: int = 64) -> rd.Dataset:
    """(cohort_week, week, n_users): weekly retention triangle — users
    cohorted by their first-activity week, counted in every week they
    were active.  The self-join-shaped query (activity joined to each
    user's min) without any join:

    1. per-batch dedupe to (user, week) pairs (combiner);
    2. users hash-shard; ONE vectorized pandas kernel per shard computes
       each user's cohort via transform('min') and the shard-local
       (cohort, week) user counts — users are WHOLLY inside one shard, so
       shard-local distinct-user counts sum exactly;
    3. tiny groupby over |weeks|^2 keys.
    Group-call count is O(shards), never O(users)."""
    WEEK_US = 604_800_000_000

    def prep(t: pa.Table) -> pa.Table:
        week = pc.divide(t["ts"].cast(pa.int64()), WEEK_US).cast(pa.int64())
        g = (pa.table({"user_id": t["user_id"], "week": week})
             .group_by(["user_id", "week"]).aggregate([]))
        shard = (g["user_id"].to_numpy(zero_copy_only=False)
                 % shards).astype(np.int64)
        return g.append_column("shard", pa.array(shard, pa.int64()))

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "week"])
        cohort = df.groupby("user_id")["week"].transform("min")
        out = (df.assign(cohort_week=cohort)
               .groupby(["cohort_week", "week"], sort=False)
               .size().rename("p_n").reset_index())
        return out.astype({"cohort_week": "int64", "week": "int64",
                           "p_n": "int64"})

    return hash_agg(_events(sf_dir, ("ts", "user_id"))
                    .map_batches(prep, batch_format="pyarrow")
                    .groupby("shard")
                    .map_groups(per_shard, batch_format="pandas"),
                    ["cohort_week", "week"],
                    [("p_n", "sum", "n_users")], small=True)


def type_transitions(sf_dir: str, shards: int = 64) -> rd.Dataset:
    """(from_type, to_type, n): first-order Markov transition counts over
    each user's time-ordered event stream (SQL's lead() window) — the
    sequence-model statistic an events corpus feeds a trainer.

    Scale shape: users hash-shard (same contract as retention_cohorts —
    one user never splits); per shard ONE vectorized kernel sorts by
    (user, ts, event_id), takes the shifted pair arrays, masks user
    boundaries, and emits shard-local pair counts; final groupby over
    |type|^2 keys."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "shard": pa.array(
                (t["user_id"].to_numpy(zero_copy_only=False) % shards)
                .astype(np.int64), pa.int64())})

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "p_n": pd.Series([], dtype="int64")})
        out = (pd.DataFrame({"from_type": et[:-1][same],
                             "to_type": et[1:][same]})
               .groupby(["from_type", "to_type"], sort=False)
               .size().rename("p_n").reset_index())
        return out.astype({"p_n": "int64"})

    return hash_agg(_events(sf_dir, ("ts", "user_id", "event_id",
                                     "event_type"))
                    .map_batches(prep, batch_format="pyarrow")
                    .groupby("shard")
                    .map_groups(per_shard, batch_format="pandas"),
                    ["from_type", "to_type"], [("p_n", "sum", "n")], small=True)


def markov_entropy(sf_dir: str, shards: int = 64) -> rd.Dataset:
    """(from_type, n_total, surprisal_bits): the transition-
    PREDICTABILITY audit over :func:`type_transitions` — per source
    event type, Σ over successor types of n·floor(log2(n_total / n))
    (the floor-log2-of-integer-quotient bits convention shared with
    bigram_surprisal, exact at any width).  Formulaic streams (one
    dominant successor) score ~0 bits; uniform successor mixes score
    high — the behavioral bot/burst companion to burstiness_stats.

    Scale shape: rides the |types|²-bounded transition table; the
    finalize runs on that single bounded block."""
    tr = type_transitions(sf_dir, shards)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "n_total": pa.array([], pa.int64()),
                             "surprisal_bits": pa.array([], pa.int64())})
        df = t.to_pandas()
        tot = df.groupby("from_type")["n"].sum()
        out_f, out_t, out_s = [], [], []
        for ft, g in df.groupby("from_type", sort=True):
            T = int(tot[ft])
            bits = sum(int(n) * ((T // int(n)).bit_length() - 1)
                       for n in g["n"])
            out_f.append(ft)
            out_t.append(T)
            out_s.append(bits)
        return pa.table({"from_type": pa.array(out_f, pa.string()),
                         "n_total": pa.array(out_t, pa.int64()),
                         "surprisal_bits": pa.array(out_s, pa.int64())})

    # the transition table is |types|^2-bounded, so the one-block
    # finalize is bounded-size by construction (the dau_hll precedent)
    return tr.repartition(1).map_batches(finalize, batch_format="pyarrow")


def rolling_value(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """(event_id, user_id, ts_us, roll_cents, roll_n): per-user TRAILING
    time-window aggregate — rolling sum/count of value cents over the last
    ``window_s`` seconds, RANGE semantics (all ts peers share one frame,
    exactly SQL's RANGE BETWEEN W PRECEDING AND CURRENT ROW).

    Scale shape — HOT-USER SAFE (the sessionize sorted-block pattern):
    one range-partitioned sort on (user, ts, event_id); each block
    computes its own rows' trailing windows vectorized (per-segment
    cumsum + two searchsorted probes); cross-block inputs are the BACK
    window context of the first user and — because the window closes AT
    ts (peers included) — the forward equal-(user, ts) run of the last
    user, both pulled zero-copy from the O(blocks)-identified runs."""
    import ray

    W = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "cents": cents})

    refs = (_events(sf_dir, ("ts", "user_id", "event_id", "value"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    bounds_l = ray.get([_block_bounds.remote(r) for r in refs])
    live = [i for i, b in enumerate(bounds_l) if b is not None]
    bounds = {i: bounds_l[i] for i in live}
    back = _back_window_ctx(live, bounds, W)
    fwd = _fwd_eq_ctx(live, bounds)

    _OUT = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts_us", pa.int64()), ("roll_cents", pa.int64()),
        ("roll_n", pa.int64())])

    @ray.remote(num_cpus=0.5)
    def block_roll(tb: pa.Table, fu, fu_ts, lu, lts,
                   nback: int, *ctx_blocks) -> pa.Table:
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _OUT.empty_table()
        back_blocks = ctx_blocks[:nback]
        fwd_blocks = ctx_blocks[nback:]
        b_ts, b_c = [], []
        for bb in back_blocks:
            bu = bb["user_id"].to_numpy(zero_copy_only=False)
            bt = bb["ts_us"].to_numpy(zero_copy_only=False)
            m = (bu == fu) & (bt >= fu_ts - W)
            b_ts.append(bt[m])
            b_c.append(bb["cents"].to_numpy(zero_copy_only=False)[m])
        f_ts, f_c = [], []
        for fb in fwd_blocks:
            fu_b = fb["user_id"].to_numpy(zero_copy_only=False)
            ft = fb["ts_us"].to_numpy(zero_copy_only=False)
            m = (fu_b == lu) & (ft == lts)
            f_ts.append(ft[m])
            f_c.append(fb["cents"].to_numpy(zero_copy_only=False)[m])
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        eid = tb["event_id"].to_numpy(zero_copy_only=False)
        cents = tb["cents"].to_numpy(zero_copy_only=False)
        cols = {k: [] for k in ("event_id", "user_id", "ts_us",
                                "roll_cents", "roll_n")}
        seg_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        seg_ends = np.append(seg_starts[1:], len(u))
        for s, e in zip(seg_starts, seg_ends):
            usr = int(u[s])
            o_ts, o_c = ts[s:e], cents[s:e]
            npre = 0
            a_ts, a_c = o_ts, o_c
            if usr == fu and b_ts:
                pre_ts = np.concatenate(b_ts)
                a_ts = np.concatenate([pre_ts, a_ts])
                a_c = np.concatenate(b_c + [a_c])
                npre = len(pre_ts)
            if usr == lu and f_ts:
                a_ts = np.concatenate([a_ts] + f_ts)
                a_c = np.concatenate([a_c] + f_c)
            csum = np.cumsum(a_c)
            q_ts = o_ts  # windows computed for OWN rows only
            lo = np.searchsorted(a_ts, q_ts - W, side="left")
            hi = np.searchsorted(a_ts, q_ts, side="right")
            roll = csum[hi - 1] - np.where(lo > 0, csum[lo - 1], 0)
            cols["event_id"].append(eid[s:e])
            cols["user_id"].append(np.full(e - s, usr, np.int64))
            cols["ts_us"].append(o_ts)
            cols["roll_cents"].append(roll.astype(np.int64))
            cols["roll_n"].append((hi - lo).astype(np.int64))
        if not cols["event_id"]:
            return _OUT.empty_table()
        return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                         for k, v in cols.items()})

    out_refs = [block_roll.remote(
                    refs[i], bounds[i][0], bounds[i][1], bounds[i][2],
                    bounds[i][3], len(back[i]),
                    *[refs[j] for j in back[i]],
                    *[refs[j] for j in fwd[i]])
                for i in live]
    if not out_refs:
        return rd.from_arrow(_OUT.empty_table())
    return rd.from_arrow_refs(out_refs)


def cumulative_value(sf_dir: str) -> rd.Dataset:
    """(event_id, ts_us, cents, cum_cents): GLOBAL running total over the
    whole stream ordered by (ts, event_id) — SQL's un-partitioned
    ``SUM() OVER (ORDER BY ...)``, i.e. the distributed SCAN primitive.

    Ray Data has no scan operator; this is the canonical two-pass
    composition over the range-partitioned output of ``sort``:
    (1) one tiny task per block computes its local sum, (2) the driver
    exclusive-prefixes the O(blocks) sums, (3) one task per block adds
    its offset to a vectorized local cumsum.  Blocks never leave the
    object store; driver work is O(blocks), not O(rows)."""
    import ray

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "ts_us": t["ts"].cast(pa.int64()),
                         "cents": cents})

    refs = (_events(sf_dir, ("ts", "event_id", "value"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["ts_us", "event_id"])
            .to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def block_sum(tb: pa.Table) -> int:
        if "cents" not in tb.column_names:
            return 0
        s = pc.sum(tb["cents"]).as_py()
        return int(s) if s is not None else 0

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums[:-1], dtype=np.int64))) \
        if sums else np.array([], dtype=np.int64)

    @ray.remote(num_cpus=0.5)
    def with_cum(tb: pa.Table, off: int) -> pa.Table:
        empty_schema = pa.schema([("event_id", pa.int64()),
                                  ("ts_us", pa.int64()),
                                  ("cents", pa.int64()),
                                  ("cum_cents", pa.int64())])
        if "cents" not in tb.column_names or not len(tb):
            return empty_schema.empty_table()
        cum = off + np.cumsum(
            tb["cents"].to_numpy(zero_copy_only=False).astype(np.int64))
        return tb.append_column("cum_cents", pa.array(cum, pa.int64()))

    out = [with_cum.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)

def first_touch(sf_dir: str) -> rd.Dataset:
    """(user_id, first_ts_us, first_event_id, first_type): each user's
    first event — the attribution primitive (argmin over (ts, event_id)).

    Scale shape — NO per-user map_groups: each batch keeps its own
    first-per-user candidate (one vectorized lexsort + take-first), so the
    groupby(user_id) shuffle carries at most one row per user per batch;
    the finishing kernel repeats the same argmin over the tiny candidate
    set, sharded so group-call count is O(shards) not O(users)."""
    shards = 64

    def candidates(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        first = np.ones(len(order), dtype=bool)
        u_sorted = uid[order]
        first[1:] = u_sorted[1:] != u_sorted[:-1]
        keep = order[first]
        out = t.take(pa.array(keep, pa.int64()))
        return pa.table({
            "user_id": out["user_id"],
            "first_ts_us": out["ts"].cast(pa.int64()),
            "first_event_id": out["event_id"],
            "first_type": out["event_type"],
            "shard": pc.cast(pc.bit_wise_and(out["user_id"], shards - 1),
                             pa.int64())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "first_ts_us", "first_event_id"],
                          kind="mergesort")
        g = g.drop_duplicates("user_id", keep="first")
        return g[["user_id", "first_ts_us", "first_event_id",
                  "first_type"]]

    return (_events(sf_dir, ("ts", "user_id", "event_id", "event_type"))
            .map_batches(candidates, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(finish, batch_format="pandas"))


def user_gap_stats(sf_dir: str) -> rd.Dataset:
    """(user_id, n_gaps, sum_gap_us, max_gap_us): inter-event gap stats
    per user (lag-window diff) — the cadence profile behind bot scoring
    and session-gap tuning.  All outputs exact int64 microseconds.

    Scale shape — HOT-USER SAFE (the sessionize sorted-block pattern, no
    per-user group): consecutive gaps are local to the (user, ts,
    event_id)-sorted order, so each range-partitioned block computes its
    users' partial (n_gaps, sum_gap, max_gap) vectorized, the driver
    contributes the O(blocks) block-boundary gaps (a cut inside one
    user's run), and one user-keyed ``hash_agg`` folds the partials —
    all three stats are decomposable (sum/telescoping, count, max)."""
    import ray

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts_us": t["ts"].cast(pa.int64())})

    refs = (_events(sf_dir, ("ts", "user_id", "event_id"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    _GAP_SCHEMA = pa.schema([
        ("user_id", pa.int64()), ("p_n", pa.int64()),
        ("p_sum", pa.int64()), ("p_max", pa.int64())])

    @ray.remote(num_cpus=0.5, num_returns=2)
    def block_partial(tb: pa.Table):
        """((user, n, sum, max) partial rows, (fu, fu_ts, lu, lu_ts)) as
        TWO return objects: the driver gathers only the O(1) bounds; the
        partial tables stay in the object store (from_arrow_refs)."""
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _GAP_SCHEMA.empty_table(), None
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = np.zeros(len(u), dtype=np.int64)
        gaps[1:] = ts[1:] - ts[:-1]
        # per-user partial over this block's in-run gaps
        gu = u[same]
        gg = gaps[same]
        users = np.unique(u)
        out = {"user_id": [], "p_n": [], "p_sum": [], "p_max": []}
        if len(gu):
            import pandas as _pd
            agg = (_pd.DataFrame({"u": gu, "g": gg}).groupby("u")["g"]
                   .agg(["size", "sum", "max"]))
            have = set(agg.index)
        else:
            agg, have = None, set()
        for usr in users:
            out["user_id"].append(int(usr))
            if usr in have:
                row = agg.loc[usr]
                out["p_n"].append(int(row["size"]))
                out["p_sum"].append(int(row["sum"]))
                out["p_max"].append(int(row["max"]))
            else:
                out["p_n"].append(0)
                out["p_sum"].append(0)
                out["p_max"].append(0)
        tbl = pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})
        return tbl, (int(u[0]), int(ts[0]), int(u[-1]), int(ts[-1]))

    ret = [block_partial.remote(r) for r in refs]
    tbl_refs = [r[0] for r in ret]
    bounds = [b for b in ray.get([r[1] for r in ret]) if b is not None]
    # O(blocks) boundary gaps: a block cut inside one user's run
    brows = {"user_id": [], "p_n": [], "p_sum": [], "p_max": []}
    for (_, _, lu, lu_ts), (fu, fu_ts, _, _) in zip(bounds, bounds[1:]):
        if lu == fu:
            g = fu_ts - lu_ts
            brows["user_id"].append(lu)
            brows["p_n"].append(1)
            brows["p_sum"].append(g)
            brows["p_max"].append(g)
    btbl = pa.table({k: pa.array(v, pa.int64()) for k, v in brows.items()})

    partials = rd.from_arrow_refs(tbl_refs).union(rd.from_arrow(btbl))
    return hash_agg(partials, "user_id",
                    [("p_n", "sum", "n_gaps"),
                     ("p_sum", "sum", "sum_gap_us"),
                     ("p_max", "max", "max_gap_us")])


def last_touch(sf_dir: str) -> rd.Dataset:
    """(user_id, last_ts_us, last_event_id, last_type): each user's final
    event — last-touch attribution (argmax over (ts, event_id)), the
    mirror of first_touch and the same scale shape: per-batch candidate
    reduction (one row per user per batch) before the sharded shuffle."""
    shards = 64

    def candidates(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        # sort ascending, keep the LAST row of each user run = argmax
        order = np.lexsort((eid, ts, uid))
        last = np.ones(len(order), dtype=bool)
        u_sorted = uid[order]
        last[:-1] = u_sorted[1:] != u_sorted[:-1]
        keep = order[last]
        out = t.take(pa.array(keep, pa.int64()))
        return pa.table({
            "user_id": out["user_id"],
            "last_ts_us": out["ts"].cast(pa.int64()),
            "last_event_id": out["event_id"],
            "last_type": out["event_type"],
            "shard": pc.cast(pc.bit_wise_and(out["user_id"], shards - 1),
                             pa.int64())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "last_ts_us", "last_event_id"],
                          kind="mergesort")
        g = g.drop_duplicates("user_id", keep="last")
        return g[["user_id", "last_ts_us", "last_event_id", "last_type"]]

    return (_events(sf_dir, ("ts", "user_id", "event_id", "event_type"))
            .map_batches(candidates, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(finish, batch_format="pandas"))


def session_stats(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """(n_events, n_sessions, sum_duration_us): corpus-level histogram of
    session sizes with total in-session dwell time — the rollup consumers
    actually read after sessionization.  Composes on sessionize() (same
    partitioning contract), then pre-aggregates each sessions batch before
    the tiny groupby(n_events) shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        dur = pc.subtract(t["end_us"], t["start_us"])
        g = (pa.table({"n_events": t["n_events"], "dur_us": dur})
             .group_by("n_events")
             .aggregate([("dur_us", "count"), ("dur_us", "sum")]))
        return g.rename_columns(["n_events", "p_n", "p_dur"])

    return (sessionize(sf_dir, gap_s=gap_s)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("n_events")
            .aggregate(Sum("p_n", alias_name="n_sessions"),
                       Sum("p_dur", alias_name="sum_duration_us")))


def hourly_profile(sf_dir: str) -> rd.Dataset:
    """(hour, n_events, n_users): hour-of-day activity profile with EXACT
    distinct users — the two-shuffle count-distinct shape shared with
    daily_active: shuffle (a) groupby(hour, user) over per-batch-deduped
    pairs, shuffle (b) groupby(hour) over 24 keys."""
    HOUR_US = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        h = pc.divide(t["ts"].cast(pa.int64()), HOUR_US)
        hour = pc.subtract(h, pc.multiply(pc.divide(h, 24), 24)).cast(pa.int64())
        g = (pa.table({"hour": hour, "user_id": t["user_id"]})
             .group_by(["hour", "user_id"]).aggregate([("user_id", "count")]))
        return g.rename_columns(["hour", "user_id", "p_n"])

    per_hour_user = hash_agg(_events(sf_dir, ("ts", "user_id"))
                             .map_batches(prep, batch_format="pyarrow"),
                             ["hour", "user_id"], [("p_n", "sum", "n")])

    def hour_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("hour").aggregate([("user_id", "count"),
                                          ("n", "sum")])
        return g.rename_columns(["hour", "p_u", "p_e"])

    return hash_agg(per_hour_user.map_batches(hour_partial,
                                              batch_format="pyarrow"),
                    "hour", [("p_u", "sum", "n_users"),
                             ("p_e", "sum", "n_events")], small=True)


def median_value(sf_dir: str) -> rd.Dataset:
    """(event_type, n, min_cents, med_cents, max_cents): exact per-type
    value median (lower median = DuckDB quantile_disc 0.5) plus range.

    Scale shape: an exact grouped median normally needs a per-group sort
    of every row; instead shuffle (a) builds a (event_type, cents) COUNT
    table (per-batch combined, so it carries distinct-cents-per-batch
    rows, never events), and shuffle (b) groups that table by type — the
    per-group kernel walks the cumulative histogram, O(distinct cents),
    bounded by the value domain (price-like values), not by event count."""

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"event_type": t["event_type"], "cents": cents})
             .group_by(["event_type", "cents"])
             .aggregate([("cents", "count")]))
        return g.rename_columns(["event_type", "cents", "p_n"])

    counts = hash_agg(_events(sf_dir, ("event_type", "value"))
                      .map_batches(prep, batch_format="pyarrow"),
                      ["event_type", "cents"], [("p_n", "sum", "n_c")])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        n_c = g["n_c"].to_numpy()
        cents = g["cents"].to_numpy()
        n = int(n_c.sum())
        cum = np.cumsum(n_c)
        med = int(cents[np.searchsorted(cum, (n - 1) // 2 + 1)])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]], "n": [n],
            "min_cents": [int(cents[0])], "med_cents": [med],
            "max_cents": [int(cents[-1])]})

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pandas")


def value_percentiles(sf_dir: str) -> rd.Dataset:
    """(event_type, n, p25_cents, p50_cents, p75_cents, p90_cents): exact
    per-type discrete percentiles (DuckDB quantile_disc convention —
    element at 1-based rank ceil(q*n), probed cell-by-cell in tests).

    Same two-shuffle histogram shape as median_value: shuffle (a) builds
    the (event_type, cents) COUNT table from per-batch-combined partials,
    shuffle (b) groups that value-domain-bounded table by type; the
    per-group kernel walks the cumulative histogram once for all four
    ranks — O(distinct cents), never O(events)."""

    QS = (0.25, 0.5, 0.75, 0.9)

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"event_type": t["event_type"], "cents": cents})
             .group_by(["event_type", "cents"])
             .aggregate([("cents", "count")]))
        return g.rename_columns(["event_type", "cents", "p_n"])

    counts = hash_agg(_events(sf_dir, ("event_type", "value"))
                      .map_batches(prep, batch_format="pyarrow"),
                      ["event_type", "cents"], [("p_n", "sum", "n_c")])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        n_c = g["n_c"].to_numpy()
        cents = g["cents"].to_numpy()
        n = int(n_c.sum())
        cum = np.cumsum(n_c)
        ranks = [min(max(int(np.ceil(q * n)), 1), n) for q in QS]
        vals = [int(cents[np.searchsorted(cum, r)]) for r in ranks]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]], "n": [n],
            "p25_cents": [vals[0]], "p50_cents": [vals[1]],
            "p75_cents": [vals[2]], "p90_cents": [vals[3]]})

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pandas")


def hopping_counts(sf_dir: str, window_s: int = 3600,
                   hop_s: int = 900) -> rd.Dataset:
    """(event_type, window_id, n, cents): HOPPING (sliding) window
    aggregate — windows of ``window_s`` starting every ``hop_s``
    (window/hop must divide evenly; each event lands in window/hop
    overlapping windows, identified by their start hop index).

    The tumbling ``windowed_counts`` shape plus a vectorized fan-out:
    each batch np.repeat-expands events into their window/hop memberships
    BEFORE the in-batch combine, so the shuffle still carries
    (type, window)-cardinality partials, never the expanded events."""
    assert window_s % hop_s == 0, "window must be a multiple of hop"

    fan = window_s // hop_s
    HOP_US = 1_000_000 * hop_s

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity"
                         ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // HOP_US
        wid = np.repeat(base, fan) - np.tile(np.arange(fan, dtype=np.int64),
                                             len(base))
        et = t["event_type"].to_numpy(zero_copy_only=False)
        g = (pa.table({"event_type": pa.array(np.repeat(et, fan)),
                       "window_id": pa.array(wid),
                       "cents": pa.array(np.repeat(cents, fan))})
             .group_by(["event_type", "window_id"])
             .aggregate([("cents", "sum"), ("cents", "count")]))
        return g.rename_columns(["event_type", "window_id",
                                 "p_cents", "p_n"])

    return hash_agg(_events(sf_dir, ("ts", "event_type", "value"))
                    .map_batches(partial, batch_format="pyarrow"),
                    ["event_type", "window_id"],
                    [("p_n", "sum", "n"), ("p_cents", "sum", "cents")])


def props_stats(sf_dir: str) -> rd.Dataset:
    """(event_type, n, k_sum, k_min, k_max): stats over the schema-less
    JSON ``props`` column — the reference's dynamic hovercard map pattern
    (SURVEY.md M4 / §1.4: dynamic JSON stays INSIDE the batch kernel, a
    fixed Arrow schema comes out).  One vectorized ``pc.extract_regex``
    pulls the ``k`` field per batch (no per-row json.loads), the combine
    is the usual in-batch partial before a type-cardinality groupby."""

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        g = (pa.table({"event_type": t["event_type"], "k": k})
             .group_by(["event_type"])
             .aggregate([("k", "count"), ("k", "sum"),
                         ("k", "min"), ("k", "max")]))
        return g.rename_columns(["event_type", "p_n", "p_sum",
                                 "p_min", "p_max"])

    return hash_agg(_events(sf_dir, ("event_type", "props"))
                    .map_batches(partial, batch_format="pyarrow"),
                    ["event_type"],
                    [("p_n", "sum", "n"), ("p_sum", "sum", "k_sum"),
                     ("p_min", "min", "k_min"), ("p_max", "max", "k_max")],
                    small=True)


def dau_hll(sf_dir: str, p: int = 12) -> rd.Dataset:
    """(day, n_zero, est): APPROXIMATE daily-active-users via a
    HyperLogLog sketch (Flajolet et al. 2007) — the mergeable-sketch
    primitive a 100 TB pipeline uses where exact count-distinct
    (``daily_active``) would shuffle every (day, user) pair.

    Scale shape: each batch reduces to its (day, bucket)->max(rho)
    registers BEFORE the shuffle, so the exchange carries at most
    days x 2^p rows regardless of corpus size; register merge is an
    associative groupby-max; the estimator runs once on the
    register table (output-sized).

    Determinism (the DuckDB twin hashes bit-identically):
    * hash = md5-upper64 of the decimal user_id (``md5_number_upper``);
    * bucket = top ``p`` bits; rho = leading-zeros+1 of the remaining
      64-p bits (exact via np.frexp — sub-2^53 ints are exact doubles);
    * raw estimate in EXACT integer arithmetic: with Q = 64-p+1 and
      S = sum_j 2^(Q - rho_j) (empty registers contribute 2^Q),
      est = 7213 * m^3 * 2^Q // ((10000*m + 10790) * S)
      (alpha_m = 0.7213/(1+1.079/m) as an exact rational);
    * small-range correction (n_zero > 0 and raw <= 5m/2):
      round(m * ln(m / n_zero)) — the one float op; verified
      EXHAUSTIVELY over the full domain (all 4095 n_zero values at
      p=12) to round identically in CPython libm and DuckDB."""
    import hashlib

    M, W = 1 << p, 64 - p
    Q = W + 1

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        86_400_000_000).cast(pa.int64())
        u = (pa.table({"day": day, "user_id": t["user_id"]})
             .group_by(["day", "user_id"]).aggregate([]))
        uids = u["user_id"].to_pylist()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(x).encode()).digest()[:8],
                            "little") for x in uids),
            dtype=np.uint64, count=len(uids))
        bucket = (h >> np.uint64(W)).astype(np.int64)
        w = h & np.uint64((1 << W) - 1)
        # bit_length via frexp: w < 2^52 <= 2^53 so the double is exact
        blen = np.frexp(w.astype(np.float64))[1]
        rho = np.where(w == 0, Q, W - blen + 1).astype(np.int64)
        g = (pa.table({"day": u["day"], "bucket": pa.array(bucket),
                       "rho": pa.array(rho)})
             .group_by(["day", "bucket"]).aggregate([("rho", "max")]))
        return g.rename_columns(["day", "bucket", "p_rho"])

    regs = hash_agg(_events(sf_dir, ("ts", "user_id"))
                    .map_batches(partial, batch_format="pyarrow"),
                    ["day", "bucket"], [("p_rho", "max", "rho")])

    def finalize(t: pa.Table) -> pa.Table:
        import math
        if t.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n_zero": pa.array([], pa.int64()),
                             "est": pa.array([], pa.int64())})
        df = t.to_pandas()
        days, zeros, ests = [], [], []
        for day, g in df.groupby("day", sort=True):
            S = (sum(1 << (Q - r) for r in g["rho"]) +
                 (M - len(g)) * (1 << Q))
            raw = (7213 * M**3 * (1 << Q)) // ((10000 * M + 10790) * S)
            v = M - len(g)
            est = (round(M * math.log(M / v))
                   if v > 0 and raw <= 5 * M // 2 else raw)
            days.append(int(day)); zeros.append(v); ests.append(est)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "n_zero": pa.array(zeros, pa.int64()),
                         "est": pa.array(ests, pa.int64())})

    return regs.repartition(1).map_batches(finalize, batch_format="pyarrow")


def anomaly_flags(sf_dir: str, z: int = 3) -> rd.Dataset:
    """(event_id, event_type, cents, is_outlier): per-type z-score outlier
    flag computed ENTIRELY in exact integer arithmetic — an event is an
    outlier iff |cents − mean| > z·σ for its type, tested as

        (n·c − S)² > z² · n · (n·SS − S²)

    with S = Σ cents and SS = Σ cents² exact integer sums (order-
    independent), so the flag is bit-reproducible at any cluster width
    and DuckDB (HUGEINT) agrees exactly; Python arbitrary-precision ints
    carry the comparison (the squares overflow int64 at scale).

    Scale shape: pass 1 is a combiner-before-shuffle per-type aggregate
    (type-cardinality rows); the tiny type→(n, S, SS) table broadcasts;
    pass 2 is one streaming map_batches — the events never shuffle."""
    import ray

    def stat_partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        sq = pc.multiply(cents, cents)
        g = (pa.table({"event_type": t["event_type"], "c": cents, "sq": sq})
             .group_by("event_type")
             .aggregate([("c", "sum"), ("sq", "sum"), ("c", "count")]))
        return g.rename_columns(["event_type", "p_s", "p_ss", "p_n"])

    stats_ds = hash_agg(_events(sf_dir, ("event_type", "value"))
                        .map_batches(stat_partial, batch_format="pyarrow"),
                        "event_type", [("p_n", "sum", "n"),
                                       ("p_s", "sum", "s"),
                                       ("p_ss", "sum", "ss")], small=True)
    stats = {}
    for t in stats_ds.iter_batches(batch_format="pyarrow"):
        for et, n, s, ss in zip(t["event_type"].to_pylist(),
                                t["n"].to_pylist(), t["s"].to_pylist(),
                                t["ss"].to_pylist()):
            stats[et] = (int(n), int(s), int(ss))
    s_ref = ray.put(stats)
    z2 = z * z

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(s_ref)
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity"
                         ).cast(pa.int64()).to_pylist()
        out = []
        for et, c in zip(t["event_type"].to_pylist(), cents):
            n, s, ss = st[et]
            lhs = (n * c - s) ** 2            # exact python ints
            rhs = z2 * n * (n * ss - s * s)
            out.append(lhs > rhs)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "cents": pa.array(cents, pa.int64()),
                         "is_outlier": pa.array(out, pa.bool_())})

    return (_events(sf_dir, ("event_id", "event_type", "value"))
            .map_batches(flag, batch_format="pyarrow"))


def late_events(sf_dir: str, allowed_s: int = 0) -> rd.Dataset:
    """(user_id, n_events, n_late): out-of-order (late) event counts per
    user — the watermark primitive of a streaming ingest.  An event is
    LATE iff its ts is more than ``allowed_s`` behind the running maximum
    ts of the user's EARLIER events in arrival order (event_id — the
    deterministic stand-in for ingest order).

    Scale shape — HOT-USER SAFE (the sessionize sorted-block pattern over
    ARRIVAL order): one range-partitioned sort on (user, event_id); ONE
    heavy wave counts each block's late events carry-free and emits the
    O(1) boundary meta plus (in plasma, never via the driver) the sorted
    locally-non-late ts values of the block's first user; the driver
    chains the running-max CARRY scalar through O(blocks) metadata (max
    is order-free), and a TINY patch wave searchsorts each carry into
    its block's blob for the rows the carry flips to late; one
    user-keyed hash_agg folds the (n, late) partials."""
    import ray

    allowed_us = 1_000_000 * allowed_s

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "us": t["ts"].cast(pa.int64())})

    refs = (_events(sf_dir, ("user_id", "event_id", "ts"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "event_id"])
            .to_arrow_refs())

    _LP = pa.schema([("user_id", pa.int64()), ("p_n", pa.int64()),
                     ("p_late", pa.int64())])

    @ray.remote(num_cpus=0.5, num_returns=3)
    def block_late(tb: pa.Table):
        """(partials, meta, fu_nonlate_blob): the carry-FREE late counts
        per user in this block, O(1) boundary meta, and — as a separate
        object the driver never touches — the SORTED ts values of the
        first user's locally-non-late rows (the only rows a carried
        running max can flip to late; the tiny patch wave searchsorts
        the carry into this array)."""
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return _LP.empty_table(), None, b""
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        us = tb["us"].to_numpy(zero_copy_only=False)
        out_u, out_n, out_l = [], [], []
        seg_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        seg_ends = np.append(seg_starts[1:], len(u))
        LOW = np.int64(-(1 << 62))
        fu, lu = int(u[0]), int(u[-1])
        fu_blob = b""
        for s, e in zip(seg_starts, seg_ends):
            usr = int(u[s])
            seg = us[s:e]
            run = np.maximum.accumulate(seg)
            prior = np.empty_like(seg)
            prior[0] = LOW
            prior[1:] = run[:-1]
            late_mask = seg < prior - allowed_us
            if usr == fu:
                fu_blob = np.sort(seg[~late_mask]).tobytes()
            out_u.append(usr)
            out_n.append(e - s)
            out_l.append(int(late_mask.sum()))
        meta = (fu, lu, int(us[u == lu].max()))
        return (pa.table({"user_id": pa.array(out_u, pa.int64()),
                          "p_n": pa.array(out_n, pa.int64()),
                          "p_late": pa.array(out_l, pa.int64())}),
                meta, fu_blob)

    ret = [block_late.remote(r) for r in refs]
    part_refs = [r[0] for r in ret]
    metas = ray.get([r[1] for r in ret])
    live = [i for i, m in enumerate(metas) if m is not None]

    # O(blocks) carry chain: running max of the boundary user's ts
    carry_in: dict[int, "int | None"] = {}
    carry_user: "int | None" = None
    carry_max = 0
    for i in live:
        fu, lu, lu_max = metas[i]
        carry_in[i] = carry_max if carry_user == fu else None
        if carry_user == lu:
            carry_max = max(carry_max, lu_max)
        else:
            carry_user, carry_max = lu, lu_max

    @ray.remote(num_cpus=0.25)
    def carry_adjust(blob: bytes, fu: int, cin: int) -> pa.Table:
        """Extra-late rows the carry flips: locally-non-late fu values
        below carry − allowed (one searchsorted over the sorted blob)."""
        v = np.frombuffer(blob, np.int64)
        extra = int(np.searchsorted(v, cin - allowed_us, side="left"))
        if extra == 0:
            return _LP.empty_table()
        return pa.table({"user_id": pa.array([fu], pa.int64()),
                         "p_n": pa.array([0], pa.int64()),
                         "p_late": pa.array([extra], pa.int64())})

    adj_refs = [carry_adjust.remote(ret[i][2], metas[i][0], carry_in[i])
                for i in live if carry_in[i] is not None]
    if not live:
        return rd.from_arrow(pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()),
             ("n_late", pa.int64())]).empty_table())
    partials = rd.from_arrow_refs(part_refs + adj_refs)
    return hash_agg(partials, "user_id",
                    [("p_n", "sum", "n_events"),
                     ("p_late", "sum", "n_late")])


def active_days_hist(sf_dir: str) -> rd.Dataset:
    """(n_days, n_users): histogram of per-user ACTIVE-day counts — the
    engagement-distribution table (how many users showed up on exactly
    k distinct days).

    Scale shape: per-batch (user, day) dedupe partials → one
    (user, day)-keyed hash_agg (each pair exactly once) → per-batch
    user partials → user-keyed count → per-batch histogram partials →
    a bounded-key (≤ distinct day count) aggregate."""
    DAY_US = 86_400_000_000

    def p1(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(t["ts"].cast(pa.int64()), DAY_US),
                      pa.int64())
        g = (pa.table({"user_id": t["user_id"], "day": day})
             .group_by(["user_id", "day"]).aggregate([]))
        return g

    ud = hash_agg(
        _events(sf_dir, ("ts", "user_id"))
        .map_batches(p1, batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["user_id", "day"], [("one", "max", "one")])

    def p2(t: pa.Table) -> pa.Table:
        g = (t.select(["user_id", "one"]).group_by("user_id")
             .aggregate([("one", "sum")]))
        return g.rename_columns(["user_id", "p_d"])

    per_user = hash_agg(ud.map_batches(p2, batch_format="pyarrow"),
                        "user_id", [("p_d", "sum", "n_days")])

    def p3(t: pa.Table) -> pa.Table:
        g = (t.select(["n_days"]).group_by("n_days")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["n_days", "p_n"])

    return hash_agg(per_user.map_batches(p3, batch_format="pyarrow"),
                    "n_days", [("p_n", "sum", "n_users")], small=True)


def burstiness_stats(sf_dir: str) -> rd.Dataset:
    """(user_id, n_hours, sum_c, sum_c_sq): per-user ACTIVE-hour event
    counts' exact sufficient statistics — the Fano-factor
    (variance/mean over hourly buckets) inputs of bot/burst detection,
    in exact integer arithmetic.

    Scale shape: per-batch (user, hour) count partials (combiner), one
    (user, hour)-keyed hash_agg to exact hourly counts (each key lands
    exactly once, so the second pass squares true counts, not
    partials), per-batch user partials over that, one user-keyed
    hash_agg."""
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.divide(t["ts"].cast(pa.int64()), HOUR_US),
                       pa.int64())
        g = (pa.table({"user_id": t["user_id"], "hour": hour})
             .group_by(["user_id", "hour"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["user_id", "hour", "p_c"])

    hourly = hash_agg(_events(sf_dir, ("ts", "user_id"))
                      .map_batches(partial, batch_format="pyarrow"),
                      ["user_id", "hour"], [("p_c", "sum", "c")])

    def upart(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        g = (pa.table({"user_id": t["user_id"],
                       "p_n": pa.array(np.ones(len(c), np.int64)),
                       "p_s": t["c"],
                       "p_q": pa.array(c * c, pa.int64())})
             .group_by("user_id")
             .aggregate([("p_n", "sum"), ("p_s", "sum"), ("p_q", "sum")]))
        return g.rename_columns(["user_id", "p_n", "p_s", "p_q"])

    return hash_agg(hourly.map_batches(upart, batch_format="pyarrow"),
                    "user_id", [("p_n", "sum", "n_hours"),
                                ("p_s", "sum", "sum_c"),
                                ("p_q", "sum", "sum_c_sq")])


def gap_quantiles(sf_dir: str) -> pa.Table:
    """(q_milli, gap_us): EXACT corpus-wide quantiles of per-user
    inter-arrival gaps (quantile_disc semantics: value at index
    ceil(q·n)−1 of the sorted multiset) — the latency-profile numbers a
    streaming ingest is tuned against.

    Scale shape — exact for ANY value-domain size: gap rows come from
    the user_gap_stats sorted-block machinery (in-block run gaps + the
    O(blocks) boundary gaps); then a RANGE-PARTITIONED sort on the gap
    column and an O(blocks) driver index walk — per-block row counts
    locate the block holding each target rank, and a tiny task extracts
    that single value.  The bounded-histogram path (length_quantiles)
    assumes a small distinct domain; µs gaps don't have one, so this is
    the distributed order-statistic composition instead: sort → counts
    → point lookups, never a full materialization."""
    import ray

    from .textstats import QUANTILES

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts_us": t["ts"].cast(pa.int64())})

    refs = (_events(sf_dir, ("ts", "user_id", "event_id"))
            .map_batches(prep, batch_format="pyarrow")
            .sort(["user_id", "ts_us", "event_id"])
            .to_arrow_refs())

    @ray.remote(num_cpus=0.5, num_returns=2)
    def block_gaps(tb: pa.Table):
        if tb.num_rows == 0 or "user_id" not in tb.column_names:
            return pa.table({"gap_us": pa.array([], pa.int64())}), None
        u = tb["user_id"].to_numpy(zero_copy_only=False)
        ts = tb["ts_us"].to_numpy(zero_copy_only=False)
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = (ts - np.roll(ts, 1))[same]
        return (pa.table({"gap_us": pa.array(gaps, pa.int64())}),
                (int(u[0]), int(ts[0]), int(u[-1]), int(ts[-1])))

    ret = [block_gaps.remote(r) for r in refs]
    bounds = [b for b in ray.get([r[1] for r in ret]) if b is not None]
    brows = [fu_ts - lu_ts
             for (_, _, lu, lu_ts), (fu, fu_ts, _, _)
             in zip(bounds, bounds[1:]) if lu == fu]
    gaps_ds = (rd.from_arrow_refs([r[0] for r in ret])
               .union(rd.from_arrow(pa.table(
                   {"gap_us": pa.array(brows, pa.int64())}))))

    sorted_refs = gaps_ds.sort("gap_us").to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def nrows(tb: pa.Table) -> int:
        return tb.num_rows

    @ray.remote(num_cpus=0.25)
    def pick(tb: pa.Table, i: int) -> int:
        return int(tb["gap_us"][i].as_py())

    counts = ray.get([nrows.remote(r) for r in sorted_refs])
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    picks = []
    for q in QUANTILES:
        rank = max(1, int(np.ceil(q * total)))
        blk = int(np.searchsorted(cum, rank, side="left"))
        local = rank - (int(cum[blk - 1]) if blk else 0) - 1
        out_q.append(int(round(q * 1000)))
        picks.append(pick.remote(sorted_refs[blk], local))
    out_v = ray.get(picks)
    return pa.table({"q_milli": pa.array(out_q, pa.int64()),
                     "gap_us": pa.array(out_v, pa.int64())})


def heavy_hitters(sf_dir: str, d: int = 4, w: int = 256,
                  k: int = 20) -> rd.Dataset:
    """(user_id, n_est): top-k heavy hitters by COUNT-MIN-SKETCH estimate
    (Cormode & Muthukrishnan 2005) — the mergeable heavy-hitter primitive
    of a streaming ingest, beside dau_hll's count-distinct.  ``d`` rows ×
    ``w`` buckets; row j hashes a user to md5_upper64("cm{j}_{user}") % w
    (deterministic — DuckDB md5_number_upper reproduces it exactly); the
    estimate is the min counter across rows (always ≥ the true count).

    Scale shape: per-batch partial sketches combine BEFORE the shuffle
    (each batch forwards ≤ d×w counter rows, whatever its size); the
    merged sketch is constant-sized (d×w ints) and broadcasts; candidate
    keys come from an id-sized distinct; ranking ties break (n_est desc,
    user_id asc) so the twin orders identically."""
    import ray

    from .dedup import md5_upper64

    def bucket_of(j: int, uid: int) -> int:
        return md5_upper64(f"cm{j}_{uid}".encode()) % w

    def sketch_partial(t: pa.Table) -> pa.Table:
        """ONE pass emits both the counter partials (j >= 0) and the
        batch's distinct user ids (tagged j = -1, b = uid) — the sketch
        and the candidate-key distinct share the single column scan."""
        uids, counts = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False),
            return_counts=True)
        agg: dict[tuple[int, int], int] = {}
        for uid, n in zip(uids.tolist(), counts.tolist()):
            for j in range(d):
                key = (j, bucket_of(j, uid))
                agg[key] = agg.get(key, 0) + n
        js = [a for a, _ in agg] + [-1] * len(uids)
        bs = [b for _, b in agg] + uids.tolist()
        ns = list(agg.values()) + [0] * len(uids)
        return pa.table({"j": pa.array(js, pa.int64()),
                         "b": pa.array(bs, pa.int64()),
                         "p_n": pa.array(ns, pa.int64())})

    combined = hash_agg(_events(sf_dir, ("user_id",))
                        .map_batches(sketch_partial,
                                     batch_format="pyarrow"),
                        ["j", "b"], [("p_n", "sum", "n")],
                        small=True).materialize()
    S = np.zeros((d, w), np.int64)
    for t in combined.iter_batches(batch_format="pyarrow"):
        for j, b, n in zip(t["j"].to_pylist(), t["b"].to_pylist(),
                           t["n"].to_pylist()):
            if j >= 0:
                S[j, b] = n
    s_ref = ray.put(S)

    def pick_users(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["j"], -1))
        return pa.table({"user_id": t["b"]})

    users = combined.map_batches(pick_users, batch_format="pyarrow")

    def estimate(t: pa.Table) -> pa.Table:
        sk = ray.get(s_ref)
        uids = t["user_id"].to_pylist()
        est = [min(int(sk[j, bucket_of(j, int(u))]) for j in range(d))
               for u in uids]
        return pa.table({"user_id": pa.array(uids, pa.int64()),
                         "n_est": pa.array(est, pa.int64())})

    return topk(users.select_columns(["user_id"])
                .map_batches(estimate, batch_format="pyarrow"),
                [("n_est", "descending"), ("user_id", "ascending")], k)


def window_top_user(sf_dir: str, window_s: int = 3600,
                    shards: int = 64) -> rd.Dataset:
    """(event_type, window_id, user_id, cents): per (type, tumbling
    window), the TOP-contributing user by integer-cents sum (ties →
    smaller user_id) — the windowed-argmax primitive (who dominated each
    window), complementing the global events_top_users.

    Scale shape — no per-key Python (the top_orders_per_cust pattern):
    per-batch combine sums cents per (type, window, user); a hash_agg
    finishes the exact per-user sums; survivors hash-shard on
    (type, window) and ONE vectorized kernel per shard picks each
    window's argmax."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        wid = pc.divide(us, 1_000_000 * window_s).cast(pa.int64())
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"event_type": t["event_type"], "window_id": wid,
                       "user_id": t["user_id"], "cents": cents})
             .group_by(["event_type", "window_id", "user_id"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["event_type", "window_id", "user_id",
                                 "p_cents"])

    sums = hash_agg(_events(sf_dir, ("ts", "event_type", "user_id",
                                     "value"))
                    .map_batches(partial, batch_format="pyarrow"),
                    ["event_type", "window_id", "user_id"],
                    [("p_cents", "sum", "cents")])

    def shard_stamp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard", pa.array(partition_ids(
                t, ["event_type", "window_id"], shards), pa.int32()))

    def argmax_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cents", "user_id"],
                            ascending=[False, True], kind="mergesort")
        df = df.groupby(["event_type", "window_id"], sort=False).head(1)
        return df[["event_type", "window_id", "user_id", "cents"]]

    return (sums.map_batches(shard_stamp, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(argmax_in_shard, batch_format="pandas"))


def window_users(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """(window_id, users): EXACT distinct users per tumbling window — the
    slide_s == window_s (k=1, no multi-emit) case of
    :func:`sliding_users`; see it for the two-hash_agg distinct shape.
    The exact companion to the register-merge estimate in
    :func:`dau_hll`."""
    return sliding_users(sf_dir, window_s, window_s)


def sliding_users(sf_dir: str, window_s: int = 3600,
                  slide_s: int = 900) -> rd.Dataset:
    """(window_id, users): EXACT distinct users per SLIDING window of
    ``window_s`` seconds advancing every ``slide_s`` (window_s must be a
    multiple of slide_s; window_id · slide_s is the window start).  Each
    event multi-emits into its window_s/slide_s covering windows inside
    the batch combiner, then two chained hash_aggs finish it: the first
    globally dedupes (window_id, user_id) pairs, the second counts rows
    per window — id pairs only on the exchanges, amplification bounded
    by the overlap factor.  :func:`window_users` is the k=1 case."""

    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s

    def pairs(t: pa.Table) -> pa.Table:
        import numpy as np
        # TRUNCATING division (pc.divide), matching the DuckDB twin's
        # integer `//` and every sibling window query — numpy's floor
        # division diverges for pre-epoch timestamps
        slot = pc.divide(t["ts"].cast(pa.int64()),
                         1_000_000 * slide_s).to_numpy(zero_copy_only=False)
        w = np.concatenate([slot - j for j in range(k)])
        u = np.tile(t["user_id"].to_numpy(zero_copy_only=False), k)
        return (pa.table({"window_id": pa.array(w, pa.int64()),
                          "user_id": pa.array(u, pa.int64())})
                .group_by(["window_id", "user_id"]).aggregate([]))

    dedup = hash_agg(
        _events(sf_dir, ("ts", "user_id")).map_batches(
            pairs, batch_format="pyarrow"),
        ["window_id", "user_id"], [(None, "count_all", "c")])

    def cnt(t: pa.Table) -> pa.Table:
        g = t.select(["window_id"]).group_by("window_id").aggregate(
            [([], "count_all")])
        return g.rename_columns(["window_id", "p_u"])

    return hash_agg(dedup.map_batches(cnt, batch_format="pyarrow"),
                    "window_id", [("p_u", "sum", "users")], small=True)

