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

    from ray.data.aggregate import Sum
    return (_events(sf_dir, ("ts", "event_type", "value"))
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "window_id"])
            .aggregate(Sum("p_n", alias_name="n"),
                       Sum("p_cents", alias_name="cents")))


def sessionize(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """(user_id, session_idx, n_events, start_us, end_us): session windows
    with a 30-min inactivity gap, per user.  groupby(user).map_groups with an
    in-group sort — the documented partitioning assumption is events of one
    user fit one group (true for user-keyed web logs)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_s * 1_000_000
        sess = np.cumsum(new_session) - 1
        out = (pd.DataFrame({"session_idx": sess, "ts_us": ts})
               .groupby("session_idx")
               .agg(n_events=("ts_us", "size"), start_us=("ts_us", "min"),
                    end_us=("ts_us", "max"))
               .reset_index())
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts_us": t["ts"].cast(pa.int64())})

    return (_events(sf_dir, ("ts", "user_id", "event_id"))
            .map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))


def top_users_by_value(sf_dir: str, n: int = 10) -> rd.Dataset:
    """(user_id, cents): top-N users by total value — partial per batch,
    groupby sum, global top-N (sort on the tiny aggregate)."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        tmp = pa.table({"user_id": t["user_id"], "cents": cents})
        g = tmp.group_by("user_id").aggregate([("cents", "sum")])
        return g.rename_columns(["user_id", "p_cents"])

    from ray.data.aggregate import Sum
    agg = (_events(sf_dir, ("user_id", "value"))
           .map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(Sum("p_cents", alias_name="cents")))
    return agg.sort(["cents", "user_id"], descending=[True, False]).limit(n)
