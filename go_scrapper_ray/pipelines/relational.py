"""Relational operators over the TPC-H-ish tables — the engine's general
join/aggregate capability (the reference's only join is the tiny match-service
lookup, SURVEY.md J1; these are its at-scale analogs).

Pattern: BROADCAST HASH JOIN — the small side is read once, keyed, and
``ray.put`` into the object store; the big side streams through
``map_batches`` doing a vectorized ``index_in`` + ``take``.  No all-to-all
shuffle; aggregation pre-combines per batch before the final small groupby
(combiner-before-shuffle)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..agg import hash_agg, hash_join, partition_ids, topk



def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def broadcast_join(big: rd.Dataset, small_tbl: pa.Table, big_key: str,
                   small_key: str, take_cols: list[str]) -> rd.Dataset:
    """Left-inner broadcast join: rows of ``big`` matched against the
    broadcast ``small_tbl``; unmatched rows are dropped (inner)."""
    small_ref = ray.put(small_tbl)

    def kernel(t: pa.Table) -> pa.Table:
        s = ray.get(small_ref)  # zero-copy
        idx = pc.index_in(t[big_key], value_set=s[small_key])
        mask = pc.is_valid(idx)
        t = t.filter(mask)
        idx = pc.filter(idx, mask)
        for c in take_cols:
            t = t.append_column(c, pc.take(s[c], idx))
        return t

    return big.map_batches(kernel, batch_format="pyarrow")


def top_suppliers_by_revenue(sf_dir: str, n: int = 10) -> rd.Dataset:
    """(s_name, cents): lineitem revenue per supplier, top-N — lineitem
    streams, supplier broadcasts, revenue pre-aggregates per batch (integer
    cents keep the DuckDB comparison exact)."""
    # read the (small) supplier table eagerly via pyarrow for the broadcast
    import pyarrow.parquet as pq
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            100), round_mode="half_towards_infinity")
        tmp = pa.table({"l_suppkey": t["l_suppkey"],
                        "cents": pc.cast(cents, pa.int64())})
        g = tmp.group_by("l_suppkey").aggregate([("cents", "sum")])
        return g.rename_columns(["l_suppkey", "p_cents"])

    agg = hash_agg(_read(sf_dir, "lineitem",
                         ["l_suppkey", "l_extendedprice", "l_discount"])
                   .map_batches(partial, batch_format="pyarrow"),
                   "l_suppkey", [("p_cents", "sum", "cents")])
    joined = broadcast_join(agg, sup, "l_suppkey", "s_suppkey", ["s_name"])
    return topk(joined.map_batches(
        lambda t: t.select(["s_name", "cents"]), batch_format="pyarrow"),
        [("cents", "descending"), ("s_name", "ascending")], n)


def supplier_hhi(sf_dir: str) -> rd.Dataset:
    """One row (n_suppliers, total_cents, hhi_e8): the Herfindahl–
    Hirschman concentration index of supplier revenue share, scaled by
    10^8 and computed in EXACT integer arithmetic — hhi_e8 =
    (Σ c_i² · 10^8) // (Σ c_i)² (10^8 = full-concentration), the
    supply-chain concentration audit.

    Scale shape: the per-supplier revenue aggregate is supplier-count
    bounded (the top_suppliers partial), so the finalize runs on that
    one bounded block with Python ints (the sums exceed int64; the
    DuckDB twin uses HUGEINT)."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            100), round_mode="half_towards_infinity")
        tmp = pa.table({"l_suppkey": t["l_suppkey"],
                        "cents": pc.cast(cents, pa.int64())})
        g = tmp.group_by("l_suppkey").aggregate([("cents", "sum")])
        return g.rename_columns(["l_suppkey", "p_cents"])

    agg = hash_agg(_read(sf_dir, "lineitem",
                         ["l_suppkey", "l_extendedprice", "l_discount"])
                   .map_batches(partial, batch_format="pyarrow"),
                   "l_suppkey", [("p_cents", "sum", "cents")])

    def finalize(t: pa.Table) -> pa.Table:
        cs = [int(x) for x in t["cents"].to_pylist()]
        tot = sum(cs)
        sq = sum(c * c for c in cs)
        hhi = (sq * 10 ** 8) // (tot * tot) if tot else 0
        return pa.table({"n_suppliers": pa.array([len(cs)], pa.int64()),
                         "total_cents": pa.array([tot], pa.int64()),
                         "hhi_e8": pa.array([hhi], pa.int64())})

    # supplier-count-bounded single block (the markov_entropy precedent)
    return agg.repartition(1).map_batches(finalize, batch_format="pyarrow")


def order_priority_counts(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, n): order counts per priority — pre-aggregated per
    batch, tiny final groupby."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderpriority",
                                                      "count")])
        return g.rename_columns(["o_orderpriority", "p_n"])

    return hash_agg(_read(sf_dir, "orders", ["o_orderpriority"])
                    .map_batches(partial, batch_format="pyarrow"),
                    "o_orderpriority", [("p_n", "sum", "n")], small=True)


def nation_customer_revenue(sf_dir: str) -> rd.Dataset:
    """(n_name, cents): total order value by customer nation — two chained
    broadcast joins (customer→nation keyed maps are the small sides) over a
    streaming orders scan."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100),
                             round_mode="half_towards_infinity"),
                        pa.int64())
        tmp = pa.table({"c_nationkey": t["c_nationkey"], "cents": cents})
        g = tmp.group_by("c_nationkey").aggregate([("cents", "sum")])
        return g.rename_columns(["c_nationkey", "p_cents"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    with_nat = broadcast_join(orders, cust, "o_custkey", "c_custkey",
                              ["c_nationkey"])
    agg = hash_agg(with_nat.map_batches(partial, batch_format="pyarrow"),
                   "c_nationkey", [("p_cents", "sum", "cents")], small=True)
    named = broadcast_join(agg, nation, "c_nationkey", "n_nationkey",
                           ["n_name"])
    return named.map_batches(lambda t: t.select(["n_name", "cents"]),
                             batch_format="pyarrow")


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> rd.Dataset:
    """(l_returnflag, l_linestatus, sum_qty_c, sum_base_c, sum_disc_c,
    sum_charge_c, n_rows): TPC-H-Q1-shaped pricing summary over lineitem
    rows shipped on or before ``cutoff`` — the canonical wide-scan +
    tiny-groupby aggregate.  All money/quantity sums are integer cents
    (round half-away-from-zero after the full double product, matching
    DuckDB round()), pre-combined per batch: at 100 TB the shuffle carries
    six rows per batch."""
    import numpy as np
    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["l_shipdate"].cast(pa.int64()),
                             pa.scalar(cutoff_us, pa.int64()))
        t = t.filter(keep)
        one_minus_d = pc.subtract(pa.scalar(1.0), t["l_discount"])
        disc_price = pc.multiply(t["l_extendedprice"], one_minus_d)
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), t["l_tax"]))

        def cents(x):
            return pc.round(pc.multiply(x, 100),
                            round_mode="half_towards_infinity").cast(
                                pa.int64())

        tmp = pa.table({"l_returnflag": t["l_returnflag"],
                        "l_linestatus": t["l_linestatus"],
                        "qty_c": cents(t["l_quantity"]),
                        "base_c": cents(t["l_extendedprice"]),
                        "disc_c": cents(disc_price),
                        "charge_c": cents(charge)})
        g = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_c", "sum"),
             ("charge_c", "sum"), ("qty_c", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "p_qty",
                                 "p_base", "p_disc", "p_charge", "p_n"])

    return hash_agg(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("p_qty", "sum", "sum_qty_c"), ("p_base", "sum", "sum_base_c"),
         ("p_disc", "sum", "sum_disc_c"),
         ("p_charge", "sum", "sum_charge_c"), ("p_n", "sum", "n_rows")])


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", n: int = 10) -> rd.Dataset:
    """(l_orderkey, revenue_c, o_orderdate_us, o_orderpriority): TPC-H-Q3-
    shaped 3-table join — top-N unshipped-revenue orders for one market
    segment.  Scale plan (aggregate-then-join, both joins co-partitioned):

    1. lineitem (the 100 TB side) filters on l_shipdate and pre-aggregates
       revenue cents PER ORDERKEY inside each batch, then one
       groupby(l_orderkey) — the shuffle carries (orderkey, cents), not
       line items.
    2. orders filters on o_orderdate and semi-joins customer via a
       broadcast of the segment's custkeys (customers of ONE segment are
       the small side; at larger scale swap for a hash join on custkey).
    3. the per-order revenue joins the filtered orders with Ray Data's
       hash join on l_orderkey = o_orderkey.
    4. global top-N on the tiny aggregate."""
    import numpy as np
    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    def li_partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"].cast(pa.int64()),
                          pa.scalar(cutoff_us, pa.int64()))
        t = t.filter(keep)
        rev = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})
             .group_by("l_orderkey").aggregate([("rev", "sum")]))
        return g.rename_columns(["l_orderkey", "p_rev"])

    rev_per_order = hash_agg(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow"),
        "l_orderkey", [("p_rev", "sum", "revenue_c")])

    cust = pq_segment_custkeys(sf_dir, segment)
    cust_ref = ray.put(cust)

    def o_kernel(t: pa.Table) -> pa.Table:
        keep = pc.less(t["o_orderdate"].cast(pa.int64()),
                       pa.scalar(cutoff_us, pa.int64()))
        t = t.filter(keep)
        hit = pc.is_valid(pc.index_in(t["o_custkey"],
                                      value_set=ray.get(cust_ref)))
        t = t.filter(hit)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate_us": t["o_orderdate"].cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"]})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"])
              .map_batches(o_kernel, batch_format="pyarrow"))

    joined = hash_join(rev_per_order, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"revenue_c": pa.int64()},
                       right_cols={"o_orderdate_us": pa.int64(),
                                   "o_orderpriority": pa.string()})
    top = topk(joined, [("revenue_c", "descending"),
                        ("l_orderkey", "ascending")], n)
    return top.map_batches(
        lambda t: t.select(["l_orderkey", "revenue_c", "o_orderdate_us",
                            "o_orderpriority"]),
        batch_format="pyarrow")


def pq_segment_custkeys(sf_dir: str, segment: str) -> pa.ChunkedArray:
    """custkeys of one market segment (broadcast side of Q3's semi-join)."""
    import pyarrow.parquet as pq
    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"])
    return c.filter(pc.equal(c["c_mktsegment"], segment))["c_custkey"]


def customers_without_orders(sf_dir: str,
                              since: str = "2000-01-01") -> rd.Dataset:
    """(c_custkey, c_name): ANTI-JOIN — customers with no order since
    ``since`` (TPC-H Q22's inner shape; the reference has no anti-join,
    this is the at-scale analog of its last-review-hash skip, SURVEY.md J2).

    Scale shape: the distinct recent-order custkeys are computed
    DISTRIBUTED (per-batch filter + ``pc.unique`` combine — each batch
    ships at most its own key set, not its rows), concatenated and uniqued
    once at a size bounded by |recently-active customers| int64s (same
    small-side gate class as the broadcast joins; the 100 TB fallback is a
    custkey co-partitioned anti merge, same filter kernel per partition).
    The customer side streams through one vectorized ``index_in``
    null-test."""
    import numpy as np
    import ray
    since_us = int(np.datetime64(since, "us").astype(np.int64))

    def keys_of(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["o_orderdate"].cast(pa.int64()),
                                pa.scalar(since_us, pa.int64()))
        return pa.table({"k": pc.unique(t.filter(keep)["o_custkey"])})

    keyed = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
             .map_batches(keys_of, batch_format="pyarrow"))
    blocks = [ray.get(r) for r in keyed.to_arrow_refs()]
    keys = pc.unique(pa.concat_tables(blocks)["k"].combine_chunks()) \
        if blocks else pa.array([], pa.int64())
    keys_ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)  # zero-copy
        return t.filter(pc.is_null(pc.index_in(t["c_custkey"],
                                               value_set=ks)))

    return (_read(sf_dir, "customer", ["c_custkey", "c_name"])
            .map_batches(anti, batch_format="pyarrow"))


def cust_order_histogram(sf_dir: str) -> pa.Table:
    """(n_orders, n_custs): distribution of customers by order count —
    TPC-H Q13's shape (LEFT join + two-level groupby), the classic
    power-law sanity check a crawl corpus runs on its per-host URL counts.

    Scale shape: orders pre-count per batch (combiner) then ONE
    groupby(custkey) shuffle whose payload is (key, partial) pairs; the
    second groupby's domain is |distinct order counts| (tiny), done the
    same partial way.  The LEFT-join zero bucket needs no join at all:
    it is ``count(customer) - count(active custkeys)``, two scalar
    aggregates — the only driver-side work is assembling a <100-row
    histogram table."""
    def count_per_cust(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "p_n"])

    per_cust = hash_agg(_read(sf_dir, "orders", ["o_custkey"])
                        .map_batches(count_per_cust, batch_format="pyarrow"),
                        "o_custkey", [("p_n", "sum", "n_orders")])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("n_orders").aggregate([("n_orders", "count")])
        return g.rename_columns(["n_orders", "p_c"])

    # each block's partial histogram is <= |distinct counts| rows, so the
    # final combine is a driver-side arrow group_by over a bounded table —
    # no second all-to-all shuffle for a result of ~dozens of keys
    hist = per_cust.map_batches(hist_partial, batch_format="pyarrow")
    blocks = [b for b in (ray.get(r) for r in hist.to_arrow_refs())
              if b.num_columns]  # empty partitions ship schemaless blocks
    if blocks:
        tbl = (pa.concat_tables(b.select(["n_orders", "p_c"])
                                for b in blocks)
               .group_by("n_orders").aggregate([("p_c", "sum")])
               .rename_columns(["n_orders", "n_custs"]))
        tbl = tbl.set_column(1, "n_custs", tbl["n_custs"].cast(pa.int64()))
    else:
        tbl = pa.table({"n_orders": pa.array([], pa.int64()),
                        "n_custs": pa.array([], pa.int64())})
    active = pc.sum(tbl["n_custs"]).as_py() or 0
    # total customer count from parquet footer metadata — exact, no scan
    import pyarrow.parquet as pq
    zero = (pq.ParquetFile(f"{sf_dir}/customer.parquet")
            .metadata.num_rows - active)
    if zero:
        tbl = pa.concat_tables([tbl, pa.table(
            {"n_orders": pa.array([0], pa.int64()),
             "n_custs": pa.array([zero], pa.int64())})])
    return tbl


def filtered_revenue(sf_dir: str, date_from: str = "1997-01-01",
                     date_to: str = "1998-01-01", disc_lo: float = 0.05,
                     disc_hi: float = 0.07, qty_lt: float = 24.0) -> pa.Table:
    """(revenue_c, n_rows) single row: TPC-H Q6's shape — tight
    filter + scalar aggregate, the cheapest full-scan class there is.
    Per-batch filter + partial sum; the 'shuffle' is one row per batch
    into a global Sum.  Revenue is per-row integer cents (round half-away
    after the double product) so any summation order matches DuckDB."""
    import numpy as np
    from ray.data.aggregate import Sum
    lo_us = int(np.datetime64(date_from, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_to, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(d, pa.scalar(lo_us, pa.int64())),
                    pc.less(d, pa.scalar(hi_us, pa.int64()))),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], disc_lo),
                        pc.less_equal(t["l_discount"], disc_hi)),
                pc.less(t["l_quantity"], qty_lt)))
        t = t.filter(keep)
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"], t["l_discount"]),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "p_rev": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            "p_n": pa.array([len(t)], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_discount", "l_quantity",
                  "l_extendedprice"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("p_rev", alias_name="revenue_c"),
                      Sum("p_n", alias_name="n_rows")))
    return pa.table({
        "revenue_c": pa.array([int(agg["revenue_c"])], pa.int64()),
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64())})


def promo_revenue(sf_dir: str) -> rd.Dataset:
    """(ship_month, promo_c, total_c): monthly revenue split by whether
    the part's type is PROMO — TPC-H Q14's shape, the one query class
    here whose BOTH join sides are big at scale (lineitem x part), so it
    uses the hash join, not a broadcast.

    Scale shape: lineitem pre-aggregates cents per (l_partkey,
    ship_month) INSIDE each batch before the join — the join input
    carries one row per (part, month) per batch, not per line item — and
    part is projected to (key, is_promo int).  After the join the final
    groupby's domain is |months|."""

    def li_partial(t: pa.Table) -> pa.Table:
        month = pc.add(pc.multiply(pc.year(t["l_shipdate"]), 100),
                       pc.month(t["l_shipdate"])).cast(pa.int64())
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_partkey": t["l_partkey"], "ship_month": month,
                       "cents": cents})
             .group_by(["l_partkey", "ship_month"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["l_partkey", "ship_month", "p_cents"])

    li = (_read(sf_dir, "lineitem",
                ["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))

    def part_proj(t: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": t["p_partkey"],
                         "is_promo": pc.equal(t["p_type"], "PROMO")
                         .cast(pa.int64())})

    part = (_read(sf_dir, "part", ["p_partkey", "p_type"])
            .map_batches(part_proj, batch_format="pyarrow"))
    joined = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                       left_cols={"ship_month": pa.int64(),
                                  "p_cents": pa.int64()},
                       right_cols={"is_promo": pa.int64()})

    def month_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"ship_month": t["ship_month"],
                       "promo": pc.multiply(t["p_cents"], t["is_promo"]),
                       "total": t["p_cents"]})
             .group_by("ship_month")
             .aggregate([("promo", "sum"), ("total", "sum")]))
        return g.rename_columns(["ship_month", "pp", "pt"])

    return hash_agg(joined.map_batches(month_partial,
                                       batch_format="pyarrow"),
                    "ship_month",
                    [("pp", "sum", "promo_c"), ("pt", "sum", "total_c")],
                    small=True)


def top_orders_per_cust(sf_dir: str, n: int = 3,
                        shards: int = 64) -> rd.Dataset:
    """(o_custkey, o_orderkey, rnk, cents): top-N orders per customer by
    (cents desc, o_orderkey asc) — rank-over-partition window.

    Scale shape — NO per-key map_groups (that is |custkey| Python calls):

    1. per-batch COMBINE: each batch keeps its own top-N per custkey
       (one vectorized sort + groupby.head) — survivors are bounded by
       N x keys-in-batch before any shuffle;
    2. survivors hash-shard on custkey into ``shards`` groups; ONE
       vectorized kernel per shard finishes the global rank — the
       group-call count is O(shards), key cardinality never meets Python.

    Ordering ties are broken by o_orderkey, and the rank key is integer
    cents (prices are 2-decimal, so cents order == price order and the
    DuckDB comparison is exact)."""
    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["o_totalprice"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"], "cents": cents})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cents", "o_orderkey"],
                            ascending=[False, True], kind="mergesort")
        df = df.groupby("o_custkey", sort=False).head(n)
        df["shard"] = (df["o_custkey"] % shards).astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cents", "o_orderkey"],
                            ascending=[False, True], kind="mergesort")
        df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
        df = df[df["rnk"] <= n]
        return df[["o_custkey", "o_orderkey", "rnk", "cents"]]

    return (_read(sf_dir, "orders",
                  ["o_custkey", "o_orderkey", "o_totalprice"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(combine, batch_format="pandas")
            .groupby("shard")
            .map_groups(final, batch_format="pandas"))

def returned_item_revenue(sf_dir: str, date_from: str = "1996-01-01",
                          date_to: str = "1996-04-01",
                          n: int = 20) -> rd.Dataset:
    """(c_custkey, c_name, n_name, cents): TPC-H-Q10-shaped — revenue lost
    to returned items per customer in one quarter, top-N.

    Scale shape: lineitem (the 100 TB side) filters l_returnflag=='R' and
    pre-aggregates cents PER ORDERKEY inside each batch, so the
    groupby(l_orderkey) shuffle carries (key, cents); the date-filtered
    orders quarter joins via the hash join on orderkey; the per-customer
    re-aggregate is another id-sized shuffle; customer and nation names
    attach via broadcast (dimension tables)."""
    import numpy as np
    import pyarrow.parquet as pq
    lo_us = int(np.datetime64(date_from, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_to, "us").astype(np.int64))

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "cents": cents})
             .group_by("l_orderkey").aggregate([("cents", "sum")]))
        return g.rename_columns(["l_orderkey", "p_rev"])

    rev = hash_agg(_read(sf_dir, "lineitem",
                         ["l_orderkey", "l_returnflag", "l_extendedprice",
                          "l_discount"])
                   .map_batches(li_partial, batch_format="pyarrow"),
                   "l_orderkey", [("p_rev", "sum", "rev")])

    def o_kernel(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo_us, pa.int64())),
                       pc.less(d, pa.scalar(hi_us, pa.int64())))
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey"])

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(o_kernel, batch_format="pyarrow"))
    joined = hash_join(rev, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"rev": pa.int64()},
                       right_cols={"o_custkey": pa.int64()})

    def cust_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"o_custkey": t["o_custkey"], "rev": t["rev"]})
             .group_by("o_custkey").aggregate([("rev", "sum")]))
        return g.rename_columns(["o_custkey", "p_cents"])

    per_cust = hash_agg(joined.map_batches(cust_partial,
                                           batch_format="pyarrow"),
                        "o_custkey", [("p_cents", "sum", "cents")])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    named = broadcast_join(per_cust, cust, "o_custkey", "c_custkey",
                           ["c_name", "c_nationkey"])
    named = broadcast_join(named, nation, "c_nationkey", "n_nationkey",
                           ["n_name"])
    top = topk(named, [("cents", "descending"),
                       ("o_custkey", "ascending")], n)
    return top.map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"],
                            "c_name": t["c_name"],
                            "n_name": t["n_name"],
                            "cents": t["cents"]}),
        batch_format="pyarrow")


def large_volume_orders(sf_dir: str, qty_gt: int = 250) -> rd.Dataset:
    """(o_orderkey, c_custkey, c_name, o_orderdate_us, total_c, sum_qty):
    TPC-H-Q18-shaped — orders whose total line quantity exceeds ``qty_gt``.

    Scale shape: lineitem pre-sums integer quantity per orderkey inside
    each batch (combiner), ONE groupby(l_orderkey) shuffle of (key, qty),
    HAVING filter on the tiny aggregate, then the SURVIVORS are broadcast
    (Q18's threshold keeps them to a handful per 10k orders at any scale
    — qty is uniform in [1,50], so sum > 250 needs an unusually long
    order) and orders stream past them in one map — a native join here
    measured 4 s of pure aggregator-actor fixed cost on a result of a
    few hundred keys.  Customer name via the same broadcast pattern.
    Quantities are whole numbers in [1, 50] stored as double, so the
    int64 cast is exact."""

    def li_partial(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "q": qty})
             .group_by("l_orderkey").aggregate([("q", "sum")]))
        return g.rename_columns(["l_orderkey", "p_q"])

    big_blocks = [b for b in (ray.get(r) for r in (
        hash_agg(_read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
                 .map_batches(li_partial, batch_format="pyarrow"),
                 "l_orderkey", [("p_q", "sum", "sum_qty")])
        .filter(expr=f"sum_qty > {qty_gt}")
        .to_arrow_refs())) if b.num_rows]
    big = (pa.concat_tables(big_blocks).combine_chunks() if big_blocks
           else pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "sum_qty": pa.array([], pa.int64())}))

    def o_proj(t: pa.Table) -> pa.Table:
        total_c = pc.round(pc.multiply(t["o_totalprice"], 100),
                           round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_custkey": t["o_custkey"],
                         "o_orderdate_us": t["o_orderdate"].cast(pa.int64()),
                         "total_c": total_c})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"])
              .map_batches(o_proj, batch_format="pyarrow"))
    joined = broadcast_join(orders, big, "o_orderkey", "l_orderkey",
                            ["sum_qty"])
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    named = broadcast_join(joined, cust, "c_custkey", "c_custkey",
                           ["c_name"])
    return named.map_batches(
        lambda t: t.select(["o_orderkey", "c_custkey", "c_name",
                            "o_orderdate_us", "total_c", "sum_qty"]),
        batch_format="pyarrow")


def high_balance_inactive(sf_dir: str,
                          since: str = "2000-07-01") -> rd.Dataset:
    """(n_name, n_custs, acctbal_c): TPC-H-Q22-shaped — customers whose
    account balance beats the global positive-balance average and who
    placed no order since ``since``, rolled up by nation.

    Scale shape: the average is a two-scalar distributed aggregate (sum
    cents + count, both exact int64, divided once on the driver — the
    division order matches DuckDB's avg() because both sums are exact
    integers in double range); the recently-active custkey set is built
    per-batch with ``pc.unique`` and broadcast (bounded by active
    customers, same small-side class as customers_without_orders); the
    customer scan then streams one vectorized filter + per-batch nation
    rollup."""
    import numpy as np
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    since_us = int(np.datetime64(since, "us").astype(np.int64))

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], 0.0))
        cents = pc.round(pc.multiply(pos["c_acctbal"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"p_c": pa.array([pc.sum(cents).as_py() or 0],
                                         pa.int64()),
                         "p_n": pa.array([len(pos)], pa.int64())})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    bal = (_read(sf_dir, "customer", cust_cols)
           .map_batches(bal_partial, batch_format="pyarrow")
           .aggregate(Sum("p_c", alias_name="c"), Sum("p_n",
                                                      alias_name="n")))
    # exact-int cents / count: same double division DuckDB's avg performs
    avg_bal = (int(bal["c"]) / 100.0) / int(bal["n"])

    def keys_of(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["o_orderdate"].cast(pa.int64()),
                                pa.scalar(since_us, pa.int64()))
        return pa.table({"k": pc.unique(t.filter(keep)["o_custkey"])})

    keyed = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
             .map_batches(keys_of, batch_format="pyarrow"))
    blocks = [ray.get(r) for r in keyed.to_arrow_refs()]
    keys = pc.unique(pa.concat_tables(blocks)["k"].combine_chunks()) \
        if blocks else pa.array([], pa.int64())
    keys_ref = ray.put(keys)

    def c_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], avg_bal))
        t = t.filter(pc.is_null(pc.index_in(t["c_custkey"],
                                            value_set=ray.get(keys_ref))))
        cents = pc.round(pc.multiply(t["c_acctbal"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"c_nationkey": t["c_nationkey"], "cents": cents})
             .group_by("c_nationkey")
             .aggregate([("cents", "sum"), ("cents", "count")]))
        return g.rename_columns(["c_nationkey", "p_c", "p_n"])

    agg = hash_agg(_read(sf_dir, "customer", cust_cols)
                   .map_batches(c_partial, batch_format="pyarrow"),
                   "c_nationkey",
                   [("p_n", "sum", "n_custs"), ("p_c", "sum", "acctbal_c")],
                   small=True)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    named = broadcast_join(agg, nation, "c_nationkey", "n_nationkey",
                           ["n_name"])
    return named.map_batches(
        lambda t: t.select(["n_name", "n_custs", "acctbal_c"]),
        batch_format="pyarrow")


def volume_shipping(sf_dir: str, nation_a: str = "NATION_3",
                    nation_b: str = "NATION_8", year_from: int = 1995,
                    year_to: int = 1996) -> rd.Dataset:
    """(supp_nation, cust_nation, l_year, cents): TPC-H-Q7-shaped — trade
    volume between two nations by direction and ship year.

    Scale shape: supplier is pre-FILTERED to the two nations before
    broadcast (the semi-join kills most lineitems early); lineitem
    pre-aggregates cents per (orderkey, supp_nation, year) in-batch; the
    orderkey hash join attaches the customer nation (customer→nationkey
    via broadcast dimension); the pair filter and the final tiny groupby
    run on id-sized rows throughout."""
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))
    keys = {k for k, v in name_of.items() if v in (nation_a, nation_b)}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(sup["s_nationkey"],
                              value_set=pa.array(sorted(keys))))

    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64())})
    if sup.num_rows == 0:
        # no supplier in either nation → result is empty; Ray's hash join
        # cannot finalize all-empty partitions, so short-circuit here
        return rd.from_arrow(empty)
    sup_ref = ray.put(sup)

    def li_partial(t: pa.Table) -> pa.Table:
        year = pc.year(t["l_shipdate"]).cast(pa.int64())
        keep = pc.and_(pc.greater_equal(year, year_from),
                       pc.less_equal(year, year_to))
        t, year = t.filter(keep), pc.filter(year, keep)
        s = ray.get(sup_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=s["s_suppkey"])
        hit = pc.is_valid(idx)
        t, year = t.filter(hit), pc.filter(year, hit)
        snat = pc.take(s["s_nationkey"], pc.filter(idx, hit))
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "s_nat": snat,
                       "l_year": year, "cents": cents})
             .group_by(["l_orderkey", "s_nat", "l_year"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["l_orderkey", "s_nat", "l_year", "p_c"])

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"],
                                value_set=pa.array(sorted(keys))))
    if cust.num_rows == 0:
        return rd.from_arrow(empty)
    cust_ref = ray.put(cust)

    def o_kernel(t: pa.Table) -> pa.Table:
        c = ray.get(cust_ref)
        idx = pc.index_in(t["o_custkey"], value_set=c["c_custkey"])
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        cnat = pc.take(c["c_nationkey"], pc.filter(idx, hit))
        return pa.table({"o_orderkey": t["o_orderkey"], "c_nat": cnat})

    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
              .map_batches(o_kernel, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"s_nat": pa.int32(),
                                  "l_year": pa.int64(),
                                  "p_c": pa.int64()},
                       right_cols={"c_nat": pa.int32()})

    def pair_partial(t: pa.Table) -> pa.Table:
        # keep only cross-nation pairs (both directions)
        keep = pc.not_equal(t["s_nat"], t["c_nat"])
        t = t.filter(keep)
        g = (pa.table({"s_nat": t["s_nat"], "c_nat": t["c_nat"],
                       "l_year": t["l_year"], "cents": t["p_c"]})
             .group_by(["s_nat", "c_nat", "l_year"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["s_nat", "c_nat", "l_year", "p_c"])

    agg = hash_agg(joined.map_batches(pair_partial,
                                      batch_format="pyarrow"),
                   ["s_nat", "c_nat", "l_year"],
                   [("p_c", "sum", "cents")], small=True)

    def name_kernel(t: pa.Table) -> pa.Table:
        sn = pa.array([name_of[k] for k in t["s_nat"].to_pylist()],
                      pa.string())
        cn = pa.array([name_of[k] for k in t["c_nat"].to_pylist()],
                      pa.string())
        return pa.table({"supp_nation": sn, "cust_nation": cn,
                         "l_year": t["l_year"], "cents": t["cents"]})

    return agg.map_batches(name_kernel, batch_format="pyarrow")


def market_share(sf_dir: str, region: str = "ASIA",
                 ptype: str = "PROMO", nation: str = "NATION_1",
                 year_from: int = 1995, year_to: int = 1996) -> rd.Dataset:
    """(o_year, nation_c, total_c): TPC-H-Q8-shaped — of the revenue for
    parts of one type sold to customers in one region per order year, the
    slice supplied by one nation (numerator and denominator both emitted
    as exact cents; the share is their ratio downstream).

    Scale shape: part is filtered to the type BEFORE broadcast (semi-join
    prune at the read edge); supplier broadcasts as a key→nation map;
    lineitem pre-aggregates (orderkey, is-nation) cents in-batch; orders
    filter the year window and attach the region-filtered customer set by
    broadcast; the orderkey hash join and the per-year groupby move
    id-sized rows only."""
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    reg_key = reg.filter(pc.equal(reg["r_name"],
                                  region))["r_regionkey"][0].as_py()
    region_nations = nat.filter(pc.equal(nat["n_regionkey"], reg_key))
    nation_key = nat.filter(pc.equal(nat["n_name"],
                                     nation))["n_nationkey"][0].as_py()

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    partkeys = part.filter(pc.equal(part["p_type"], ptype))["p_partkey"]
    pk_ref = ray.put(partkeys.combine_chunks())
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup_ref = ray.put(sup)

    def li_partial(t: pa.Table) -> pa.Table:
        hit = pc.is_valid(pc.index_in(t["l_partkey"],
                                      value_set=ray.get(pk_ref)))
        t = t.filter(hit)
        s = ray.get(sup_ref)
        sidx = pc.index_in(t["l_suppkey"], value_set=s["s_suppkey"])
        snat = pc.take(s["s_nationkey"], sidx)
        is_nat = pc.equal(snat, nation_key).cast(pa.int64())
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"],
                       "nat": pc.multiply(cents, is_nat), "tot": cents})
             .group_by("l_orderkey")
             .aggregate([("nat", "sum"), ("tot", "sum")]))
        return g.rename_columns(["l_orderkey", "p_nat", "p_tot"])

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(
        cust["c_nationkey"],
        value_set=region_nations["n_nationkey"].combine_chunks()))
    ck_ref = ray.put(cust["c_custkey"].combine_chunks())

    def o_kernel(t: pa.Table) -> pa.Table:
        year = pc.year(t["o_orderdate"]).cast(pa.int64())
        keep = pc.and_(pc.greater_equal(year, year_from),
                       pc.less_equal(year, year_to))
        t, year = t.filter(keep), pc.filter(year, keep)
        hit = pc.is_valid(pc.index_in(t["o_custkey"],
                                      value_set=ray.get(ck_ref)))
        return pa.table({"o_orderkey": t.filter(hit)["o_orderkey"],
                         "o_year": pc.filter(year, hit)})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(o_kernel, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"p_nat": pa.int64(),
                                  "p_tot": pa.int64()},
                       right_cols={"o_year": pa.int64()})

    def year_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"o_year": t["o_year"], "nat": t["p_nat"],
                       "tot": t["p_tot"]})
             .group_by("o_year")
             .aggregate([("nat", "sum"), ("tot", "sum")]))
        return g.rename_columns(["o_year", "pn", "pt"])

    return hash_agg(joined.map_batches(year_partial,
                                       batch_format="pyarrow"),
                    "o_year",
                    [("pn", "sum", "nation_c"), ("pt", "sum", "total_c")],
                    small=True)


def small_qty_revenue(sf_dir: str, brand: str = "Brand#13",
                      factor: float = 0.2) -> pa.Table:
    """(revenue_c, n_rows) single row: TPC-H-Q17-shaped — revenue from
    line items of one brand ordered below ``factor`` x that part's average
    quantity.

    Scale shape: pass 1 computes per-part (sum qty, count) DISTRIBUTED
    (per-batch combine, groupby over the brand's partkeys — a dimension-
    sized aggregate collected to the driver and re-broadcast as a
    key→threshold map); pass 2 streams lineitem once more with a
    vectorized lookup + filter + scalar sum.  Quantities are whole
    numbers, so sum/count is an exact-int double division — identical to
    DuckDB's avg() regardless of summation order."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    partkeys = part.filter(pc.equal(part["p_brand"],
                                    brand))["p_partkey"].combine_chunks()
    pk_ref = ray.put(partkeys)

    def qty_partial(t: pa.Table) -> pa.Table:
        hit = pc.is_valid(pc.index_in(t["l_partkey"],
                                      value_set=ray.get(pk_ref)))
        t = t.filter(hit)
        g = (pa.table({"l_partkey": t["l_partkey"],
                       "q": t["l_quantity"].cast(pa.int64())})
             .group_by("l_partkey")
             .aggregate([("q", "sum"), ("q", "count")]))
        return g.rename_columns(["l_partkey", "p_q", "p_n"])

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = hash_agg(_read(sf_dir, "lineitem", li_cols[:2])
                     .map_batches(qty_partial, batch_format="pyarrow"),
                     "l_partkey",
                     [("p_q", "sum", "sq"), ("p_n", "sum", "n")])
    # drop empty aggregate blocks: they carry an EMPTY schema, which
    # poisons concat_tables (observed on groupby outputs at sf0.1)
    blocks = [b for b in (ray.get(r) for r in stats.to_arrow_refs())
              if b.num_rows]
    st = pa.concat_tables(blocks) if blocks else pa.table(
        {"l_partkey": pa.array([], pa.int64()),
         "sq": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    import numpy as np
    thr = factor * (st["sq"].to_numpy(zero_copy_only=False).astype(float)
                    / np.maximum(st["n"].to_numpy(zero_copy_only=False), 1))
    thr_tbl = pa.table({"k": st["l_partkey"],
                        "thr": pa.array(thr, pa.float64())})
    thr_ref = ray.put(thr_tbl)

    def rev_partial(t: pa.Table) -> pa.Table:
        m = ray.get(thr_ref)
        idx = pc.index_in(t["l_partkey"], value_set=m["k"])
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        lim = pc.take(m["thr"], pc.filter(idx, hit))
        t = t.filter(pc.less(t["l_quantity"], lim))
        cents = pc.round(pc.multiply(t["l_extendedprice"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"p_rev": pa.array([pc.sum(cents).as_py() or 0],
                                           pa.int64()),
                         "p_n": pa.array([len(t)], pa.int64())})

    agg = (_read(sf_dir, "lineitem", li_cols)
           .map_batches(rev_partial, batch_format="pyarrow")
           .aggregate(Sum("p_rev", alias_name="revenue_c"),
                      Sum("p_n", alias_name="n_rows")))
    return pa.table({
        "revenue_c": pa.array([int(agg["revenue_c"])], pa.int64()),
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64())})


def discounted_revenue(sf_dir: str) -> pa.Table:
    """(revenue_c, n_rows) single row: TPC-H-Q19-shaped — revenue matching
    an OR of three (brand, size-range, quantity-range) conjunctions, the
    classic multi-predicate pushdown shape.

    Scale shape: part projects to (key, brand, size) and broadcasts once;
    lineitem streams one vectorized mask evaluation per batch and partial-
    sums exact cents — no shuffle wider than one row per batch."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    part_ref = ray.put(part)
    terms = [("Brand#11", 1, 5, 1.0, 11.0),
             ("Brand#13", 1, 10, 10.0, 20.0),
             ("Brand#22", 1, 15, 20.0, 30.0)]

    def partial(t: pa.Table) -> pa.Table:
        p = ray.get(part_ref)
        idx = pc.index_in(t["l_partkey"], value_set=p["p_partkey"])
        brand = pc.take(p["p_brand"], idx)
        size = pc.take(p["p_size"], idx)
        qty = t["l_quantity"]
        mask = None
        for b, s_lo, s_hi, q_lo, q_hi in terms:
            m = pc.and_(
                pc.and_(pc.equal(brand, b),
                        pc.and_(pc.greater_equal(size, s_lo),
                                pc.less_equal(size, s_hi))),
                pc.and_(pc.greater_equal(qty, q_lo),
                        pc.less_equal(qty, q_hi)))
            mask = m if mask is None else pc.or_(mask, m)
        mask = pc.fill_null(mask, False)
        t = t.filter(mask)
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"p_rev": pa.array([pc.sum(cents).as_py() or 0],
                                           pa.int64()),
                         "p_n": pa.array([len(t)], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice",
                  "l_discount"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("p_rev", alias_name="revenue_c"),
                      Sum("p_n", alias_name="n_rows")))
    return pa.table({
        "revenue_c": pa.array([int(agg["revenue_c"])], pa.int64()),
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64())})


def ship_lag_stats(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, n, sum_lag_days, max_lag_days): fulfilment-lag
    profile per order priority — l_shipdate minus o_orderdate in whole
    days over a NATIVE distributed hash join (lineitem ⋈ orders on
    orderkey).  Unlike the broadcast joins above, neither side here is
    filtered small, so this is the engine's genuine co-partitioned
    shuffle join showcase: both inputs are projected to id-sized rows
    (3 ints each) BEFORE the exchange, and the post-join aggregate is
    pre-combined per batch down to |priorities| rows."""
    DAY_US = 86_400_000_000

    def li_proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "ship_day": pc.divide(t["l_shipdate"].cast(pa.int64()),
                                  DAY_US).cast(pa.int64())})

    def o_proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderpriority": t["o_orderpriority"],
            "order_day": pc.divide(t["o_orderdate"].cast(pa.int64()),
                                   DAY_US).cast(pa.int64())})

    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
          .map_batches(li_proj, batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_orderpriority", "o_orderdate"])
              .map_batches(o_proj, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       left_cols={"ship_day": pa.int64()},
                       right_cols={"o_orderpriority": pa.string(),
                                   "order_day": pa.int64()})

    def lag_partial(t: pa.Table) -> pa.Table:
        lag = pc.subtract(t["ship_day"], t["order_day"])
        g = (pa.table({"o_orderpriority": t["o_orderpriority"], "lag": lag})
             .group_by("o_orderpriority")
             .aggregate([("lag", "count"), ("lag", "sum"), ("lag", "max")]))
        return g.rename_columns(["o_orderpriority", "p_n", "p_sum", "p_max"])

    return hash_agg(joined.map_batches(lag_partial,
                                       batch_format="pyarrow"),
                    "o_orderpriority",
                    [("p_n", "sum", "n"), ("p_sum", "sum", "sum_lag_days"),
                     ("p_max", "max", "max_lag_days")], small=True)


def top_supplier_revenue(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01") -> rd.Dataset:
    """(s_suppkey, s_name, cents): TPC-H-Q15-shaped — the supplier(s)
    whose revenue over a quarter equals the global maximum (ties all
    kept).  Max-of-aggregate two-pass: (1) per-supplier revenue via
    combiner-before-shuffle groupby; (2) global max reduced to ONE scalar
    on the driver (never the aggregate table), then an equality filter +
    broadcast name lookup."""
    import numpy as np
    lo = int(np.datetime64(date_from, "us").astype(np.int64))
    hi = int(np.datetime64(date_to, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(ship, pa.scalar(lo, pa.int64())),
                       pc.less(ship, pa.scalar(hi, pa.int64())))
        t = t.filter(keep)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.round(pc.multiply(rev, 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"s_suppkey": t["l_suppkey"], "cents": cents})
             .group_by("s_suppkey").aggregate([("cents", "sum")]))
        return g.rename_columns(["s_suppkey", "p_c"])

    per_supp = hash_agg(_read(sf_dir, "lineitem",
                              ["l_suppkey", "l_extendedprice", "l_discount",
                               "l_shipdate"])
                        .map_batches(partial, batch_format="pyarrow"),
                        "s_suppkey",
                        [("p_c", "sum", "cents")]).materialize()
    best = per_supp.max("cents")

    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["cents"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")
    import pyarrow.parquet as pq
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    return broadcast_join(winners, names, "s_suppkey", "s_suppkey",
                          ["s_name"])


def order_supplier_diversity(sf_dir: str) -> rd.Dataset:
    """(n_suppliers, n_orders): histogram of how many DISTINCT suppliers
    each order draws from — the per-key count-distinct class over the
    biggest table.  Shuffle (a) carries per-batch-deduped (order,
    supplier) pairs; shuffle (b) is |distinct counts| keys wide."""
    def prep(t: pa.Table) -> pa.Table:
        g = (pa.table({"l_orderkey": t["l_orderkey"],
                       "l_suppkey": t["l_suppkey"]})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("l_suppkey", "count")]))
        return g.rename_columns(["l_orderkey", "l_suppkey", "p_n"])

    # the (order, supplier) dedup and the per-order distinct count share
    # the SAME partition key prefix (l_orderkey), so both collapse inside
    # one hash_agg partition pass — dedup pairs, then count per order
    def pair_then_count(g: pa.Table) -> pa.Table:
        pairs = (g.group_by(["l_orderkey", "l_suppkey"])
                 .aggregate([("p_n", "sum")]))
        per_order = (pairs.group_by("l_orderkey")
                     .aggregate([("l_suppkey", "count")]))
        return per_order.rename_columns(["l_orderkey", "n_suppliers"])


    def addpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__part", pa.array([], pa.int32()))
        return b.append_column(
            "__part", pa.array(partition_ids(b, ["l_orderkey"], 32)))

    per_order = (_read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
                 .map_batches(prep, batch_format="pyarrow")
                 .map_batches(addpart, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(pair_then_count, batch_format="pyarrow"))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("n_suppliers").aggregate([("n_suppliers", "count")])
        return g.rename_columns(["n_suppliers", "p_n"])

    return hash_agg(per_order.map_batches(hist_partial,
                                          batch_format="pyarrow"),
                    "n_suppliers", [("p_n", "sum", "n_orders")], small=True)


def waiting_suppliers(sf_dir: str, late_days: int = 90) -> rd.Dataset:
    """(s_suppkey, s_name, numwait): TPC-H-Q21-shaped — for each supplier,
    how many finished ('F') multi-supplier orders it ALONE shipped late
    (ship lag > late_days; the synthetic schema has no commit/receipt
    dates — reference ref: go-scrapper has no relational engine at all,
    cf. SURVEY.md §2.9).  The interesting shape is the per-order
    EXISTS/NOT-EXISTS pair: another supplier exists on the order, and no
    OTHER supplier is late — both quantifiers become per-order COUNT/SUM
    native aggregates over the deduped (order, supplier, late) pair
    table, and max(late*suppkey) recovers the lone offender's identity
    inside the SAME aggregate (valid exactly when n_late==1), so no join
    back to the pair table is needed.  (A per-group Python map_groups
    kernel here measured 14.9 s at sf0.1 on per-group UDF call overhead
    over ~15k order groups; a join-back variant paid a second join's
    fixed actor cost.)

    Scale: orders filtered + projected to (orderkey, order_day) before
    the id-sized native hash join; the joined stream collapses per batch
    to (orderkey, suppkey, late) candidate rows; every later exchange
    carries id-sized rows; the final groupby is supplier-count wide;
    names come from a broadcast of the small supplier table."""
    DAY_US = 86_400_000_000

    def o_proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "order_day": pc.divide(t["o_orderdate"].cast(pa.int64()),
                                   DAY_US).cast(pa.int64())})

    def li_proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
            "ship_day": pc.divide(t["l_shipdate"].cast(pa.int64()),
                                  DAY_US).cast(pa.int64())})

    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                     "l_shipdate"])
          .map_batches(li_proj, batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_orderstatus", "o_orderdate"])
              .map_batches(o_proj, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"l_suppkey": pa.int64(),
                                  "ship_day": pa.int64()},
                       right_cols={"order_day": pa.int64()})

    def pair_partial(t: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(pc.subtract(t["ship_day"],
                                              t["order_day"]),
                                  late_days), pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"],
                       "l_suppkey": t["l_suppkey"], "late": late})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("late", "max")]))
        return g.rename_columns(["l_orderkey", "l_suppkey", "late"])

    # The pair dedup (max late per (order, supplier)) and the per-order
    # EXISTS stats share the l_orderkey partition key, so ONE hash_agg-
    # style partition pass computes both — no second shuffle.
    # late*suppkey: when exactly one supplier is late on the order,
    # max() of this recovers WHO without joining back to the pairs.

    def addpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__part", pa.array([], pa.int32()))
        return b.append_column(
            "__part", pa.array(partition_ids(b, ["l_orderkey"], 32)))

    def order_stats(g: pa.Table) -> pa.Table:
        pairs = (g.group_by(["l_orderkey", "l_suppkey"])
                 .aggregate([("late", "max")])
                 .rename_columns(["l_orderkey", "l_suppkey", "late"]))
        tmp = pa.table({
            "l_orderkey": pairs["l_orderkey"], "late": pairs["late"],
            "lsk": pc.multiply(pairs["late"], pairs["l_suppkey"])})
        st = tmp.group_by("l_orderkey").aggregate(
            [([], "count_all"), ("late", "sum"), ("lsk", "max")])
        return st.rename_columns(
            ["l_orderkey", "n_supp", "n_late", "late_sk"])

    stats = (joined.map_batches(pair_partial, batch_format="pyarrow")
             .map_batches(addpart, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(order_stats, batch_format="pyarrow"))

    def supp_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["n_supp"], 2),
                             pc.equal(t["n_late"], 1)))
        g = (pa.table({"l_suppkey": t["late_sk"]})
             .group_by("l_suppkey").aggregate([("l_suppkey", "count")]))
        return g.rename_columns(["l_suppkey", "p_w"])

    waits = hash_agg(stats.map_batches(supp_partial,
                                       batch_format="pyarrow"),
                     "l_suppkey", [("p_w", "sum", "numwait")])

    import pyarrow.parquet as pq
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    out = broadcast_join(waits, names, "l_suppkey", "s_suppkey", ["s_name"])
    return out.map_batches(
        lambda t: pa.table({"s_suppkey": t["l_suppkey"],
                            "s_name": t["s_name"],
                            "numwait": t["numwait"]}),
        batch_format="pyarrow")


def supplier_profit(sf_dir: str) -> rd.Dataset:
    """(nation, o_year, cents): TPC-H-Q9-shaped profit rollup — revenue by
    the SUPPLYING nation per ORDER year (Q9 minus partsupp cost, which the
    testdata schema has no table for; reference analog: the per-seed
    revenue rollups of main.go:1080+ generalized to a two-table join).

    Scale shape: supplier broadcasts as a suppkey→nationkey map (the small
    dimension); lineitem pre-aggregates cents per (orderkey, nation)
    in-batch so the exchange carries ~|orders| rows; orders project to
    (orderkey, year) id-sized rows; the orderkey equi-join runs on the
    actor-free co-partitioned hash_join; the final (nation, year) rollup
    has a bounded key domain → sort-free small aggregate."""
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup_ref = ray.put(sup)

    def li_partial(t: pa.Table) -> pa.Table:
        s = ray.get(sup_ref)
        sidx = pc.index_in(t["l_suppkey"], value_set=s["s_suppkey"])
        nat = pc.take(s["s_nationkey"], sidx).cast(pa.int64())
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "s_nat": nat,
                       "c": cents})
             .group_by(["l_orderkey", "s_nat"]).aggregate([("c", "sum")]))
        return g.rename_columns(["l_orderkey", "s_nat", "p_c"])

    def o_proj(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pc.year(t["o_orderdate"]).cast(pa.int64())})

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(o_proj, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"s_nat": pa.int64(), "p_c": pa.int64()},
                       right_cols={"o_year": pa.int64()})

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["s_nat", "o_year", "p_c"])
             .group_by(["s_nat", "o_year"]).aggregate([("p_c", "sum")]))
        return g.rename_columns(["s_nat", "o_year", "pp"])

    agg = hash_agg(joined.map_batches(pair_partial, batch_format="pyarrow"),
                   ["s_nat", "o_year"], [("pp", "sum", "cents")],
                   small=True)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nation = nation.set_column(0, "n_nationkey",
                               nation["n_nationkey"].cast(pa.int64()))
    named = broadcast_join(agg, nation, "s_nat", "n_nationkey", ["n_name"])
    return named.map_batches(
        lambda t: pa.table({"nation": t["n_name"], "o_year": t["o_year"],
                            "cents": t["cents"]}),
        batch_format="pyarrow")


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1995-01-01",
                          date_to: str = "1996-01-01") -> rd.Dataset:
    """(n_name, cents): TPC-H-Q5-shaped — revenue from orders whose
    customer and lineitem supplier sit in the SAME nation of one region.

    Scale shape: region→nation→{supplier, customer} are broadcast-size
    dimension tables; lineitem (the 100 TB side) semi-joins the
    region-filtered supplier via broadcast ``index_in`` and pre-aggregates
    cents per (orderkey, supp_nation) in-batch; date-filtered orders
    attach the customer nation the same way; the two id-sized streams
    meet in an orderkey hash join, the same-nation equality filter and
    the nation-sized final groupby run on id rows only."""
    import numpy as np
    import pyarrow.parquet as pq
    lo_us = int(np.datetime64(date_from, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_to, "us").astype(np.int64))

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = set(reg.filter(pc.equal(reg["r_name"], region))
                ["r_regionkey"].to_pylist())
    nat = nat.filter(pc.is_in(nat["n_regionkey"],
                              value_set=pa.array(sorted(rkeys))))
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))
    keyset = pa.array(sorted(name_of))

    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "cents": pa.array([], pa.int64())})
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(sup["s_nationkey"], value_set=keyset))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=keyset))
    if sup.num_rows == 0 or cust.num_rows == 0:
        return rd.from_arrow(empty)
    sup_ref, cust_ref = ray.put(sup), ray.put(cust)

    def li_partial(t: pa.Table) -> pa.Table:
        s = ray.get(sup_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=s["s_suppkey"])
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        snat = pc.take(s["s_nationkey"], pc.filter(idx, hit))
        cents = pc.round(
            pc.multiply(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])),
                        100),
            round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"l_orderkey": t["l_orderkey"], "s_nat": snat,
                       "cents": cents})
             .group_by(["l_orderkey", "s_nat"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["l_orderkey", "s_nat", "p_c"])

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))

    def o_kernel(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo_us, pa.int64())),
                       pc.less(d, pa.scalar(hi_us, pa.int64())))
        t = t.filter(keep)
        c = ray.get(cust_ref)
        idx = pc.index_in(t["o_custkey"], value_set=c["c_custkey"])
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        cnat = pc.take(c["c_nationkey"], pc.filter(idx, hit))
        return pa.table({"o_orderkey": t["o_orderkey"], "c_nat": cnat})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(o_kernel, batch_format="pyarrow"))
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols={"s_nat": pa.int32(),
                                  "p_c": pa.int64()},
                       right_cols={"c_nat": pa.int32()})

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["s_nat"], t["c_nat"]))
        g = (pa.table({"s_nat": t["s_nat"], "cents": t["p_c"]})
             .group_by(["s_nat"]).aggregate([("cents", "sum")]))
        return g.rename_columns(["s_nat", "p_c"])

    agg = hash_agg(joined.map_batches(pair_partial,
                                      batch_format="pyarrow"),
                   ["s_nat"], [("p_c", "sum", "cents")], small=True)

    def name_kernel(t: pa.Table) -> pa.Table:
        nn = pa.array([name_of[k] for k in t["s_nat"].to_pylist()],
                      pa.string())
        return pa.table({"n_name": nn, "cents": t["cents"]})

    return agg.map_batches(name_kernel, batch_format="pyarrow")


def cheapest_supplier(sf_dir: str, shards: int = 64) -> rd.Dataset:
    """(p_partkey, s_suppkey, s_name, cents): per part, the supplier of its
    MINIMUM-unit-price lineitem (integer cents of l_extendedprice /
    l_quantity compared cross-multiplied — exact; ties → smaller cents,
    then smaller suppkey) — the TPC-H Q2 "min-cost supplier" shape over
    the tables this corpus has (no partsupp: lineitem is the price
    evidence).

    Unit price sorts by the DOUBLE division cents/qty — an EXACT
    discriminator here, not an approximation: qty ∈ [1,50] integral, so
    distinct rationals differ by ≥ 1/2500 while the double ulp at this
    magnitude is ~1e-9, and equal rationals round to the identical double
    (IEEE division is correctly rounded).  DuckDB's double division is
    the same operation, so the twin orders identically.

    Scale shape: per-batch combine keeps one candidate row per partkey
    (one vectorized sort + groupby.head), survivors hash-shard on
    partkey, one vectorized kernel per shard picks the global winner;
    supplier names broadcast-join at the end (supplier is the small
    side)."""
    import numpy as np
    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["l_extendedprice"], 100),
                         round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"p_partkey": t["l_partkey"],
                         "s_suppkey": t["l_suppkey"],
                         "cents": cents,
                         "qty": t["l_quantity"].cast(pa.int64())})

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(unit=df["cents"].to_numpy(np.float64)
                       / df["qty"].to_numpy(np.float64))
        df = (df.sort_values(["unit", "cents", "s_suppkey"],
                             kind="mergesort")
                .groupby("p_partkey", sort=False).head(1))
        df["shard"] = (df["p_partkey"] % shards).astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return best(df)[["p_partkey", "s_suppkey", "cents"]]

    winners = (_read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_extendedprice",
                      "l_quantity"])
               .map_batches(prep, batch_format="pyarrow")
               .map_batches(best, batch_format="pandas")
               .groupby("shard")
               .map_groups(final, batch_format="pandas"))
    import pyarrow.parquet as pq
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    return broadcast_join(winners, sup, "s_suppkey", "s_suppkey",
                          ["s_name"])


def brand_supplier_counts(sf_dir: str, type_prefix: str = "STANDARD"
                          ) -> rd.Dataset:
    """(p_brand, p_size, n_suppliers): DISTINCT suppliers that shipped
    parts of each (brand, size), excluding parts whose type starts with
    ``type_prefix`` — the TPC-H Q16 supplier-diversity shape over the
    tables this corpus has (no partsupp: shipment evidence from
    lineitem).

    Scale shape: the part table broadcast-joins its (brand, size, type)
    onto the lineitem stream; per-batch DISTINCT (brand, size, suppkey)
    combine; one exact hash_agg count_distinct on the id-sized survivor
    rows."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    joined = broadcast_join(li, part, "l_partkey", "p_partkey",
                            ["p_brand", "p_type", "p_size"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.starts_with(t["p_type"], type_prefix))
        t = t.filter(mask)
        return (pa.table({"p_brand": t["p_brand"], "p_size": t["p_size"],
                          "s": t["l_suppkey"]})
                .group_by(["p_brand", "p_size", "s"]).aggregate([]))

    return hash_agg(joined.map_batches(distinct_partial,
                                       batch_format="pyarrow"),
                    ["p_brand", "p_size"],
                    [("s", "count_distinct", "n_suppliers")])
