"""hash_agg parity vs native Dataset.groupby().aggregate()."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from go_scrapper_ray.agg import hash_agg


def _sorted_df(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(7)
    n = 5000
    return pa.table({
        "ik": rng.integers(0, 900, n),
        "sk": pd.Series(rng.integers(0, 50, n)).map("s{}".format).to_numpy(object),
        "v": rng.random(n),
        "w": rng.integers(-100, 100, n),
    })


def test_int_key_sum(ray_session, table):
    ds = rd.from_arrow(table)
    got = _sorted_df(hash_agg(ds, "ik", [("v", "sum", "s")], 8), ["ik"])
    want = _sorted_df(ds.groupby("ik").aggregate(Sum("v", alias_name="s")), ["ik"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_string_key_multi_agg(ray_session, table):
    ds = rd.from_arrow(table)
    got = _sorted_df(
        hash_agg(ds, "sk",
                 [("v", "sum", "s"), ("w", "min", "lo"),
                  ("w", "max", "hi"), ("v", "mean", "m"),
                  ("v", "count", "n")], 8),
        ["sk"])
    want = _sorted_df(
        ds.groupby("sk").aggregate(
            Sum("v", alias_name="s"), Min("w", alias_name="lo"),
            Max("w", alias_name="hi"), Mean("v", alias_name="m"),
            Count("v", alias_name="n")),
        ["sk"])
    want["n"] = want["n"].astype(got["n"].dtype)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_multi_key(ray_session, table):
    ds = rd.from_arrow(table)
    got = _sorted_df(hash_agg(ds, ["ik", "sk"], [("w", "sum", "s")], 8),
                     ["ik", "sk"])
    want = _sorted_df(
        ds.groupby(["ik", "sk"]).aggregate(Sum("w", alias_name="s")),
        ["ik", "sk"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_small_path_matches_partitioned(ray_session, table):
    ds = rd.from_arrow(table)
    aggs = [("v", "sum", "s"), ("w", "min", "lo"), ("v", "count", "n")]
    got = _sorted_df(hash_agg(ds, "sk", aggs, small=True), ["sk"])
    want = _sorted_df(hash_agg(ds, "sk", aggs, 8), ["sk"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_every_key_in_one_partition(table):
    """Exactness precondition: a key never spans two partitions."""
    from go_scrapper_ray.agg import partition_ids
    parts = partition_ids(table, ["ik"], 8)
    ik = table["ik"].to_numpy()
    df = pd.DataFrame({"ik": ik, "p": parts})
    assert (df.groupby("ik")["p"].nunique() == 1).all()
