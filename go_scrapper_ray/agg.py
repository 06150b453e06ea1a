"""Vectorized exact hash aggregation for ray.data Datasets.

``Dataset.groupby(key).aggregate(...)`` in Ray 2.49 runs a Python
accumulator per GROUP (~100 us/group measured on this box: 21 s for a
190k-group Sum that Arrow computes in 0.05 s).  Every high-cardinality
aggregate in this repo (token document-frequency, per-order rollups,
fingerprint groups) pays that tax after its combiner stage.

``hash_agg`` keeps the same exact semantics with two vectorized hops:

1. ``map_batches``: append ``__part = stable_hash(keys) % P`` (numpy /
   ``pandas.util.hash_array`` — deterministic across workers, unlike
   builtin ``hash``).
2. ``groupby("__part").map_groups``: ONE shuffle keyed by the int32
   partition column (P distinct values, so the per-group Python overhead
   is paid P times, not once per key), then ``pyarrow.Table.group_by``
   inside each partition.  Each key lands in exactly one partition, so
   the per-partition Arrow aggregate is exact and global.

Scale notes: the shuffle moves exactly the combiner output (same bytes as
the native groupby would); pick ``num_partitions`` so one partition's
rows fit a worker heap (rows/P).  P defaults to 32 — at cluster scale
callers pass P ~ total_cores so every node aggregates in parallel.

Measured: 190k-group Sum over 200k rows, 32 CPUs: native 21.1 s,
hash_agg 0.25 s cold / 0.14 s warm.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def partition_ids(tbl: pa.Table, keys: Sequence[str], P: int) -> np.ndarray:
    """Stable uint64 hash of one or more key columns -> int32 in [0, P)."""
    h: np.ndarray | None = None
    for k in keys:
        col = tbl[k]
        if pa.types.is_integer(col.type):
            a = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            hk = (a ^ (a >> np.uint64(33))) * _MIX
        else:
            a = col.to_numpy(zero_copy_only=False)
            hk = pd.util.hash_array(a, categorize=False)
        h = hk if h is None else (h * _MIX) ^ hk
    assert h is not None
    return (h % np.uint64(P)).astype(np.int32)


def hash_agg(
    ds,
    keys: Union[str, Sequence[str]],
    aggs: Iterable[tuple[str, str, str]],
    num_partitions: int = 32,
    small: bool = False,
):
    """Exact distributed aggregate: ``ds.groupby(keys).aggregate(...)``.

    ``aggs`` is ``[(col, fn, alias), ...]`` with ``fn`` any pyarrow
    group_by kernel ("sum", "min", "max", "mean", "count",
    "count_distinct").  Returns a Dataset with columns ``keys + aliases``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    # (None, "count_all", alias) counts rows per group
    pa_aggs = [([] if c is None else c, fn) for c, fn, _ in aggs]
    aliases = [alias for _, _, alias in aggs]
    out_names = key_list + aliases
    P = int(num_partitions)

    def _addpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__part", pa.array([], pa.int32()))
        return b.append_column("__part", pa.array(partition_ids(b, key_list, P)))

    def _agg(g: pa.Table) -> pa.Table:
        res = (g.drop_columns(["__part"])
                .group_by(key_list)
                .aggregate(pa_aggs))
        # pyarrow orders: keys first, then "{col}_{fn}" in agg order.
        return res.rename_columns(out_names)

    if small:
        # Sort-free reduce for BOUNDED key domains (languages, hours,
        # nations, ...): coalesce the (already per-batch-combined) partials
        # into one block and aggregate once.  Moves cardinality x n_blocks
        # rows through one task — exact for every kernel since that task
        # sees all rows of every key.  Measured vs the partitioned path on
        # a 5-key Sum over sf0.1: 0.7 s vs 1.2 s (the Sort exchange is pure
        # overhead when one block can hold the whole reduced table).
        def _small(b: pa.Table) -> pa.Table:
            return b.group_by(key_list).aggregate(pa_aggs) \
                    .rename_columns(out_names)
        return ds.repartition(1).map_batches(_small, batch_format="pyarrow")

    return (ds.map_batches(_addpart, batch_format="pyarrow")
              .groupby("__part")
              .map_groups(_agg, batch_format="pyarrow"))


def distinct(ds, keys: Union[str, Sequence[str]], num_partitions: int = 32):
    """Exact distributed DISTINCT over ``keys`` with no single-block stage.

    Two hops: a per-block pre-distinct combiner (cuts exchange bytes when
    duplicates cluster inside blocks — e.g. LSH band collisions emit the
    same pair once per colliding band), then the ``hash_agg`` partitioned
    group_by, so each key lands in exactly one of ``num_partitions``
    partitions and no worker ever holds the whole key set.  Replaces the
    ``repartition(1).group_by`` shape whose ceiling is one worker's heap.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def _pre(b: pa.Table) -> pa.Table:
        return b.select(key_list).group_by(key_list).aggregate([])

    return hash_agg(ds.map_batches(_pre, batch_format="pyarrow"),
                    key_list, aggs=[], num_partitions=num_partitions)


def topk(ds, sort_keys: Sequence[tuple[str, str]], k: int):
    """Exact distributed top-k WITHOUT a global sort exchange.

    ``ds.sort(...).limit(k)`` pays the full range-partitioned sort
    (sample pass + all-to-all exchange, ~1 s of fixed cost) to keep k
    rows; but the global top-k is contained in the union of per-block
    top-ks, so a per-block vectorized head (pc.sort_indices, k rows
    kept) followed by a one-block final head is exact and ships only
    k × n_blocks rows.  ``sort_keys`` is pyarrow style:
    ``[("n", "descending"), ("gram", "ascending")]``.  Output rows come
    back sorted under the same key (same contract as sort().limit())."""
    import pyarrow.compute as pc

    keys = list(sort_keys)

    def head(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=keys)
        if len(idx) > k:
            idx = idx.slice(0, k)
        return t.take(idx)

    return (ds.map_batches(head, batch_format="pyarrow", batch_size=None)
              .repartition(1)
              .map_batches(head, batch_format="pyarrow", batch_size=None))


def hash_join(
    left,
    right,
    *,
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    left_cols: dict[str, pa.DataType],
    right_cols: dict[str, pa.DataType],
    num_partitions: int = 32,
    join_type: str = "inner",
):
    """Co-partitioned equi-join without Ray's join aggregator actors.

    ``Dataset.join`` spins up long-lived aggregator actors whose fixed
    startup/finalize cost measured ~3 s per join on this box regardless
    of input size (600k x 150k rows: native 2.94 s, this 0.39 s).  Here
    both sides are tagged into ONE union dataset (schemas harmonized by
    null-padding the other side's payload columns), hash-partitioned on
    the key, and joined per partition with Arrow's hash join — the same
    single all-to-all exchange, no actor pool.

    ``left_cols`` / ``right_cols``: payload (non-key) columns each side
    contributes, with their Arrow types (needed to build the padded
    union schema without executing the lazy datasets).  Output columns:
    ``list(on) + left_cols + right_cols`` (key names from the LEFT side);
    names must not collide.  Multi-key equi-joins pass ``on`` /
    ``right_on`` as same-length sequences.  Arrow's hash join rejects
    list-typed PAYLOAD columns — callers with list payloads keep the
    native Dataset.join.
    """
    on_list = [on] if isinstance(on, str) else list(on)
    r_list = on_list if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    nk = len(on_list)
    klabels = [f"__k{i}" for i in range(nk)]
    lnames, rnames = list(left_cols), list(right_cols)
    P = int(num_partitions)

    def _tag(key_cols, have, sideval):
        # canonical column order ([__k*] + left + right) on BOTH sides so
        # the union schemas match exactly
        def fn(b: pa.Table) -> pa.Table:
            cols: dict = {kl: b[kc] for kl, kc in zip(klabels, key_cols)}
            for nm, typ in {**left_cols, **right_cols}.items():
                cols[nm] = b[nm] if nm in have \
                    else pa.nulls(b.num_rows, typ)
            cols["__side"] = pa.array(
                np.full(b.num_rows, sideval, dtype=np.int8))
            t = pa.table(cols)
            if b.num_rows == 0:
                return t.append_column("__part",
                                       pa.array([], pa.int32()))
            return t.append_column(
                "__part", pa.array(partition_ids(t, klabels, P)))
        return fn

    def _part_join(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lt = g.filter(pc.equal(g["__side"], 0)).select(klabels + lnames)
        rt = g.filter(pc.equal(g["__side"], 1)).select(klabels + rnames)
        res = lt.join(rt, keys=klabels, join_type=join_type)
        # arrow join output: left fields (keys first) then right payload
        return res.rename_columns(on_list + lnames + rnames)

    u = (left.map_batches(_tag(on_list, left_cols, 0),
                          batch_format="pyarrow")
         .union(right.map_batches(_tag(r_list, right_cols, 1),
                                  batch_format="pyarrow")))
    return u.groupby("__part").map_groups(_part_join,
                                          batch_format="pyarrow")
