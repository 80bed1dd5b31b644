"""Relational demo pipelines over the driver's star schema.

These exercise the engine's generic operator surface (SURVEY §2.5-§2.7:
grouped aggregation with partials, broadcast dimension joins, sort/limit
top-k, latest-per-key dedup) with DuckDB-oracle-matched column names.

Scale stance: every groupby here is partial-aggregated per block first
(:mod:`pypdfium2_ray.stages.agg`), dimension joins broadcast the small side
(:mod:`pypdfium2_ray.stages.join`), and sorts are only taken on small/top-k
results.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.join import broadcast_join


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir.rstrip('/')}/{table}.parquet", columns=columns)


def _scale_cols(ds, cols: dict[str, int]):
    """Replace float columns with scaled BIGINT (e.g. cents): hash-robust
    across engines — double bit-patterns of 'the same' rounded decimal differ
    by 1 ulp between pyarrow and DuckDB, scaled integers never do."""
    def f(t: pa.Table) -> pa.Table:
        for c, scale in cols.items():
            i = t.schema.get_field_index(c)
            scaled = pc.round(pc.multiply(pc.cast(t[c], pa.float64()),
                                          float(scale)))
            t = t.set_column(i, c, pc.cast(scaled, pa.int64()))
        return t
    return ds.map_batches(f, batch_format="pyarrow")


#: declared output schema per query — the oracle-facing contract. Pinned at
#: each tail (``@_pinned``) so a legitimately-EMPTY result still reports a
#: typed schema: Ray 2.49's all-to-all ops emit zero bundles on all-empty
#: input, downstream UDFs never run, and ``schema()`` would be None (the
#: round-3 red CORRECTNESS cell; see stages/exchange.with_output_schema).
_OUT_SCHEMAS: dict[str, pa.Schema] = {
    "lineitem_pricing_summary": pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()), ("sum_price_cents", pa.int64()),
        ("avg_disc_micro", pa.int64()), ("n_rows", pa.int64())]),
    "orders_by_region": pa.schema([
        ("r_name", pa.string()), ("n_orders", pa.int64()),
        ("sum_price_cents", pa.int64())]),
    "top_orders": pa.schema([
        ("o_orderkey", pa.int64()), ("o_totalprice_cents", pa.int64())]),
    "events_rollup": pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()),
        ("sum_value_e4", pa.int64()), ("avg_value_micro", pa.int64()),
        ("max_value_e4", pa.int64())]),
    "latest_event_per_user": pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("ts", pa.timestamp("us"))]),
    "shipping_priority": pa.schema([
        ("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]),
    "late_orders": pa.schema([
        ("o_orderpriority", pa.string()), ("n_late", pa.int64())]),
    "local_supplier_volume": pa.schema([
        ("n_name", pa.string()), ("revenue_e4", pa.int64())]),
    "big_orders": pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("o_orderkey", pa.int64()), ("orderdate_us", pa.int64()),
        ("total_cents", pa.int64()), ("qty_e2", pa.int64())]),
    "brand_promo_revenue": pa.schema([
        ("p_brand", pa.string()), ("promo_rev_e4", pa.int64()),
        ("total_rev_e4", pa.int64())]),
    "returned_revenue": pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("n_name", pa.string()), ("acctbal_cents", pa.int64()),
        ("revenue_e4", pa.int64())]),
    "order_priority_semi": pa.schema([
        ("o_orderpriority", pa.string()), ("n_orders", pa.int64())]),
    "top_supplier": pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("total_rev_e4", pa.int64())]),
    "small_qty_revenue": pa.schema([
        ("sum_cents", pa.int64()), ("n_rows", pa.int64())]),
    "idle_rich_customers": pa.schema([
        ("c_nationkey", pa.int64()), ("n_cust", pa.int64()),
        ("sum_acctbal_cents", pa.int64())]),
    "nation_flow": pa.schema([
        ("supp_nation", pa.string()), ("cust_nation", pa.string()),
        ("year", pa.int64()), ("rev_e4", pa.int64())]),
    "mkt_share": pa.schema([
        ("year", pa.int64()), ("rev_nation_e4", pa.int64()),
        ("rev_total_e4", pa.int64())]),
    "part_supplier_census": pa.schema([
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]),
    "blame_supplier": pa.schema([
        ("s_suppkey", pa.int64()), ("n_blamed", pa.int64())]),
    "important_parts": pa.schema([
        ("l_partkey", pa.int64()), ("sum_cents", pa.int64())]),
    "forecast_revenue": pa.schema([
        ("revenue_e4", pa.int64()), ("n_rows", pa.int64())]),
    "ship_delay": pa.schema([
        ("o_orderpriority", pa.string()), ("n_items", pa.int64()),
        ("sum_delay_days", pa.int64()), ("min_delay_days", pa.int64()),
        ("max_delay_days", pa.int64())]),
}


def _pinned(fn):
    """Pin *fn*'s declared output schema onto its result dataset (no-op
    for materialized ``pa.Table`` results, which carry their own)."""
    import functools

    @functools.wraps(fn)
    def wrap(sf_dir: str, *a, **kw):
        out = fn(sf_dir, *a, **kw)
        sch = _OUT_SCHEMAS.get(fn.__name__)
        if sch is not None and not isinstance(out, pa.Table):
            from pypdfium2_ray.stages.exchange import with_output_schema
            out = with_output_schema(out, sch)
        return out

    return wrap


@_pinned
def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) sums and
    means over lineitem. Partial per-block aggregation -> tiny final combine."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])
    out = grouped_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum"),
         "sum_price_cents": ("l_extendedprice", "sum"),
         "avg_disc_micro": ("l_discount", "mean"),
         "n_rows": (None, "count")},
        combine="single_block")   # flag x status: fixed enum pair
    return _scale_cols(out, {"sum_qty": 1, "sum_price_cents": 100,
                             "avg_disc_micro": 1_000_000})


@_pinned
def orders_by_region(sf_dir: str):
    """Orders rolled up to region name: broadcast the (pre-joined, tiny)
    customer->region dimension, then partial-aggregate. The fact table is
    never shuffled for the join."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir.rstrip('/')}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir.rstrip('/')}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir.rstrip('/')}/region.parquet")
    # driver-side pre-join of the dimension chain (tiny tables)
    dim = cust.join(nation, keys=["c_nationkey"], right_keys=["n_nationkey"]) \
              .join(region, keys=["n_regionkey"], right_keys=["r_regionkey"]) \
              .select(["c_custkey", "r_name"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, dim, keys="o_custkey",
                            right_keys="c_custkey")
    out = grouped_aggregate(
        joined, ["r_name"],
        {"n_orders": (None, "count"),
         "sum_price_cents": ("o_totalprice", "sum")},
        combine="single_block")   # five region names: fixed
    return _scale_cols(out, {"sum_price_cents": 100})


@_pinned
def top_orders(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice (deterministic tie-break on orderkey) —
    the sort/limit surface (SURVEY §2.6), via shuffle-free partial top-k
    (stages/topk: only k rows per block reach the final selection)."""
    from pypdfium2_ray.stages.topk import topk
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = topk(ds, ["o_totalprice", "o_orderkey"], k,
               descending=[True, False])
    out = out.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "o_totalprice_cents"]),
        batch_format="pyarrow")
    return _scale_cols(out, {"o_totalprice_cents": 100})


@_pinned
def events_rollup(sf_dir: str):
    """Per event_type counters — the run-metrics rollup shape
    (SURVEY §2.5 A-new: counters by code/status)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = grouped_aggregate(
        ds, ["event_type"],
        {"n_events": (None, "count"),
         "sum_value_e4": ("value", "sum"),
         "avg_value_micro": ("value", "mean"),
         "max_value_e4": ("value", "max")},
        combine="single_block")   # event types: fixed enum
    return _scale_cols(out, {"sum_value_e4": 10_000,
                             "avg_value_micro": 1_000_000,
                             "max_value_e4": 10_000})


@_pinned
def latest_event_per_user(sf_dir: str):
    """Latest event per user (by ts, tie-break max event_id) — the
    keep-latest-snapshot dedup of the flagship (stages/dedup.dedup_by_url)
    on the driver's events table. One vectorized per-partition kernel after
    a hash exchange (exchange.partition_map) — no per-group Python."""
    from pypdfium2_ray.stages.exchange import partition_map
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return df.drop_duplicates("user_id", keep="last")[
            ["user_id", "event_id", "ts"]]

    # partial per block shrinks the exchange to <= one row per (block, user)
    ds = ds.map_batches(keep_latest, batch_format="pandas")
    return partition_map(ds, ["user_id"], keep_latest, batch_format="pandas")


@_pinned
def shipping_priority(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """TPC-H Q3-shaped shipping priority: revenue per order for one
    market segment, top-k.

    The join shape the other relational demos don't cover: lineitem x
    orders is LARGE x LARGE (both fact tables, both key sets scale with
    the data — nothing is broadcastable), so both hops run as
    ``key_filter_join`` exchange-tier semi joins that ship KEYS ONLY:
    orders against the segment's custkeys, then the lineitem revenue
    parts against the surviving orderkeys. Revenue partials are computed
    BEFORE the orderkey exchange so only (key, int64) pairs move.

    Revenue is integer-exact: price cents x (100 - discount hundredths)
    summed as int64 (1e-4 dollar units) — 2-decimal prices/discounts make
    the roundings unambiguous on both engines.
    """
    import numpy as np

    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.topk import topk

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr=f"c_mktsegment == '{segment}'") \
        .select_columns(["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    seg_orders = key_filter_join(orders, cust, "o_custkey",
                                 right_key="c_custkey", mode="semi",
                                 tier="exchange") \
        .select_columns(["o_orderkey"])

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_part(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.rint(p * 100.0).astype(np.int64)
        d100 = np.rint(d * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "rev": cents * (100 - d100),
        })

    parts = line.map_batches(revenue_part, batch_format="pyarrow")
    seg_parts = key_filter_join(parts, seg_orders, "l_orderkey",
                                right_key="o_orderkey", mode="semi",
                                tier="exchange")
    rev = grouped_aggregate(seg_parts, ["l_orderkey"],
                            {"revenue_e4": ("rev", "sum")})
    out = topk(rev, ["revenue_e4", "l_orderkey"], k,
               descending=[True, False])
    return out.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"],
                            "revenue_e4": pc.cast(t["revenue_e4"],
                                                  pa.int64())}),
        batch_format="pyarrow")


@_pinned
def late_orders(sf_dir: str, days: int = 60):
    """TPC-H Q4-shaped EXISTS semi-join with a correlated date
    predicate: orders per priority having at least one lineitem shipped
    more than *days* after the order date.

    The decorrelation move: ``EXISTS(shipdate > orderdate + days)`` ==
    ``max(shipdate) > orderdate + days`` (the predicate is monotone in
    shipdate), so the lineitem side collapses to a per-orderkey MAX —
    per-block partials, ONE pre-combined key exchange — and the
    correlated comparison becomes a vectorized int64 filter after ONE
    repartition join onto orders. The priority count finishes in the
    single-block combine (fixed 5-value enum, no exchange).
    """
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    maxship = grouped_aggregate(line, ["l_orderkey"],
                                {"max_ship": ("l_shipdate", "max")})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                                      "o_orderdate"])
    j = lookup_join(orders,
                    {"o_orderkey": pa.int64(),
                     "o_orderpriority": pa.string(),
                     "o_orderdate": pa.timestamp("us")},
                    maxship, source_key="l_orderkey", key_col="o_orderkey",
                    payload_cols={"max_ship": pa.timestamp("us")})

    lag_us = days * 86_400 * 1_000_000

    def late(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["max_ship"], pa.int64())
        odate = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.greater(ship, pc.add(odate, lag_us))
        return t.filter(keep).select(["o_orderpriority"])

    hits = j.map_batches(late, batch_format="pyarrow")
    return grouped_aggregate(hits, ["o_orderpriority"],
                             {"n_late": (None, "count")},
                             combine="single_block")


@_pinned
def local_supplier_volume(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5-shaped local-supplier volume: revenue per nation from
    lineitems whose supplier and ordering customer sit in the SAME
    nation of one region — the colocated-parties constraint
    (``c_nationkey = s_nationkey``) that distinguishes Q5 from a plain
    star join: the filter can only be evaluated after BOTH sides'
    nation keys are attached to the fact row.

    Exchange budget: THREE keyed exchanges, all repartition joins —
    orders gains ``c_nationkey`` from the region's customers (customer
    SCALES, never broadcast), lineitem revenue rows gain
    ``s_nationkey`` from the region's suppliers (supplier scales too),
    and the fact rows gain the order's ``c_nationkey`` (pre-combined
    per ``(orderkey, s_nationkey)`` inside each block first, so the
    exchange moves partials, not raw lineitems). The nation/region
    dimension chain (25 + 5 rows at ANY scale) is read driver-side;
    the equality filter is one vectorized compare and the final rollup
    is a single-block combine over <= 25 nation groups — no exchange.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from pypdfium2_ray.stages.exchange import lookup_join

    nation = pq.read_table(f"{sf_dir.rstrip('/')}/nation.parquet")
    region_t = pq.read_table(f"{sf_dir.rstrip('/')}/region.parquet")
    rk = region_t.filter(pc.equal(region_t["r_name"], region))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rk))
    nk = pc.cast(nat["n_nationkey"], pa.int64())
    names = dict(zip(nk.to_pylist(), nat["n_name"].to_pylist()))

    def in_region(col: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(pc.cast(t[col], pa.int64()),
                                     value_set=nk))
        return f

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(in_region("c_nationkey"), batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    region_orders = lookup_join(
        orders, {"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
        cust, source_key="c_custkey", key_col="o_custkey",
        payload_cols={"c_nationkey": pa.int64()})

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(in_region("s_nationkey"), batch_format="pyarrow")
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"])

    def rev_rows(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(rev, pa.int64())})

    j_supp = lookup_join(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        {"l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
         "rev": pa.int64()},
        supp, source_key="s_suppkey", key_col="l_suppkey",
        payload_cols={"s_nationkey": pa.int64()})

    # block-local pre-combine: the orderkey exchange moves one partial
    # per (block, orderkey, s_nationkey) instead of raw lineitem rows
    def precombine(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "s_nationkey"],
                          use_threads=False).aggregate([("rev", "sum")])

    parts = j_supp.map_batches(precombine, batch_format="pyarrow")
    j_ord = lookup_join(
        parts, {"l_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                "rev_sum": pa.int64()},
        region_orders, source_key="o_orderkey", key_col="l_orderkey",
        payload_cols={"c_nationkey": pa.int64()})

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["s_nationkey"], t["c_nationkey"])
        return t.filter(keep).select(["s_nationkey", "rev_sum"])

    rolled = grouped_aggregate(
        j_ord.map_batches(local_only, batch_format="pyarrow"),
        ["s_nationkey"], {"revenue_e4": ("rev_sum", "sum")},
        combine="single_block")   # <= 25 nations: fixed enum

    def name_map(t: pa.Table) -> pa.Table:
        n_name = [names[k] for k in t["s_nationkey"].to_pylist()]
        return pa.table({"n_name": pa.array(n_name, pa.string()),
                         "revenue_e4": pc.cast(t["revenue_e4"],
                                               pa.int64())})

    return rolled.map_batches(name_map, batch_format="pyarrow")


@_pinned
def big_orders(sf_dir: str, min_qty_e2: int = 30_000):
    """TPC-H Q18-shaped large-volume-customer report: orders whose total
    lineitem quantity exceeds a threshold, with the customer name and
    order payload attached — the GROUP BY ... HAVING -> join-back shape.

    Exchange budget: THREE keyed exchanges — quantity partials
    pre-combined per block then ONE exchange to finalize the per-order
    sum (the HAVING filter is then a vectorized block map on the tiny
    survivor set), one repartition join back to orders for the
    customer key and payload, one to customer for the name (both sides
    scale — never broadcast). Quantities are exact in 1e-2 units
    (source values are integral), prices in cents.
    """
    from pypdfium2_ray.stages.exchange import lookup_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_rows(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(pc.multiply(
            pc.cast(t["l_quantity"], pa.float64()), 100.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "qty_e2": q})

    per_order = grouped_aggregate(
        line.map_batches(qty_rows, batch_format="pyarrow"),
        ["l_orderkey"], {"qty_e2": ("qty_e2", "sum")})
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["qty_e2"], min_qty_e2)),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"])
    j1 = lookup_join(
        big, {"l_orderkey": pa.int64(), "qty_e2": pa.int64()},
        orders, source_key="o_orderkey", key_col="l_orderkey",
        payload_cols={"o_custkey": pa.int64(),
                      "o_totalprice": pa.float64(),
                      "o_orderdate": pa.timestamp("us")})
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = lookup_join(
        j1, {"l_orderkey": pa.int64(), "qty_e2": pa.int64(),
             "o_custkey": pa.int64(), "o_totalprice": pa.float64(),
             "o_orderdate": pa.timestamp("us")},
        customer, source_key="c_custkey", key_col="o_custkey",
        payload_cols={"c_name": pa.string()})

    def finalize(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t["o_totalprice"], pa.float64()), 100.0)), pa.int64())
        return pa.table({
            "c_custkey": t["o_custkey"], "c_name": t["c_name"],
            "o_orderkey": t["l_orderkey"],
            "orderdate_us": pc.cast(t["o_orderdate"], pa.int64()),
            "total_cents": cents,
            "qty_e2": pc.cast(t["qty_e2"], pa.int64())})

    return j2.map_batches(finalize, batch_format="pyarrow")


@_pinned
def brand_promo_revenue(sf_dir: str, promo_type: str = "ECONOMY"):
    """TPC-H Q14-shaped conditional-revenue report per brand: for every
    ``p_brand``, the revenue from parts of one type next to the total —
    the CASE-WHEN conditional aggregate over a fact x scaling-dimension
    join (Q14's promo ratio, with numerator and denominator emitted as
    exact integers instead of one lossy double ratio).

    Exchange budget: TWO keyed exchanges — revenue pre-combined per
    partkey (block partials first, so the exchange moves one row per
    (block, partkey)), then one repartition join onto part (part SCALES
    with the data — never broadcast). The conditional split is a
    vectorized ``if_else`` block map and the per-brand rollup is a
    single-block combine over a fixed brand enum — no exchange.
    """
    import numpy as np

    from pypdfium2_ray.stages.exchange import lookup_join

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount"])

    def rev_rows(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({"l_partkey": t["l_partkey"],
                         "rev": pa.array(rev, pa.int64())})

    per_part = grouped_aggregate(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        ["l_partkey"], {"rev": ("rev", "sum")})

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])
    j = lookup_join(
        per_part, {"l_partkey": pa.int64(), "rev": pa.int64()},
        part, source_key="p_partkey", key_col="l_partkey",
        payload_cols={"p_brand": pa.string(), "p_type": pa.string()})

    def split(t: pa.Table) -> pa.Table:
        promo = pc.if_else(pc.equal(t["p_type"], promo_type),
                           t["rev"], pa.scalar(0, pa.int64()))
        return pa.table({"p_brand": t["p_brand"], "promo": promo,
                         "total": t["rev"]})

    return grouped_aggregate(
        j.map_batches(split, batch_format="pyarrow"),
        ["p_brand"], {"promo_rev_e4": ("promo", "sum"),
                      "total_rev_e4": ("total", "sum")},
        combine="single_block")   # fixed brand enum


@_pinned
def returned_revenue(sf_dir: str, k: int = 20):
    """TPC-H Q10-shaped returned-item report: top-k customers by
    revenue on returned lineitems, with name / nation / account
    balance attached — the multi-join analytics shape (fact x fact x
    dimension x tiny-dimension).

    Exchange budget: per-row integer revenue is a block map, then FOUR
    keyed exchanges — revenue pre-combined per orderkey, repartition
    join to orders for the custkey, revenue pre-combined per custkey,
    repartition join to customer for the payload (customer SCALES with
    the data — never broadcast it) — while the 25-row nation dimension
    IS broadcast (stages/join.broadcast_join), and the final top-k is
    the partial-bound selection (k x n_blocks rows move, no global
    sort). Revenue is integer-exact: cents x (100 - discount
    hundredths) summed as int64 (the shipping_priority convention)."""
    import numpy as np

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join
    from pypdfium2_ray.stages.join import broadcast_join
    from pypdfium2_ray.stages.topk import topk

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount",
                  "l_returnflag"]).filter(expr="l_returnflag == 'R'")

    def rev_rows(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(rev, pa.int64())})

    per_order = grouped_aggregate(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        ["l_orderkey"], {"rev": ("rev", "sum")})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = lookup_join(per_order,
                     {"l_orderkey": pa.int64(), "rev": pa.int64()},
                     orders, source_key="o_orderkey",
                     key_col="l_orderkey",
                     payload_cols={"o_custkey": pa.int64()})
    per_cust = grouped_aggregate(j1, ["o_custkey"],
                                 {"revenue_e4": ("rev", "sum")})

    customer = _read(sf_dir, "customer",
                     ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    j2 = lookup_join(per_cust,
                     {"o_custkey": pa.int64(), "revenue_e4": pa.int64()},
                     customer, source_key="c_custkey",
                     key_col="o_custkey",
                     payload_cols={"c_name": pa.string(),
                                   "c_nationkey": pa.int64(),
                                   "c_acctbal": pa.float64()})
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir.rstrip('/')}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    # the parquet dimension key is int32; the joined-side key was cast
    # to int64 by lookup_join — align before the Arrow hash join
    nation = pa.table({"n_nationkey": pc.cast(nation["n_nationkey"],
                                              pa.int64()),
                       "n_name": nation["n_name"]})
    j3 = broadcast_join(j2, nation, keys=["c_nationkey"],
                        right_keys=["n_nationkey"])

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "c_name": t["c_name"], "n_name": t["n_name"],
            "acctbal_cents": pa.array(cents, pa.int64()),
            "revenue_e4": pc.cast(t["revenue_e4"], pa.int64())})

    out = j3.map_batches(finalize, batch_format="pyarrow")
    return topk(out, ["revenue_e4", "c_custkey"], k,
                descending=[True, False])


@_pinned
def cust_order_dist(sf_dir: str):
    """TPC-H Q13-shaped customer order-count distribution INCLUDING the
    zero-order customers of a LEFT join — without ever joining: orders
    pre-combines to per-customer counts (ONE exchange), the count-of-
    counts rollup is enum-small (order counts per customer are bounded,
    ``single_block``), and the LEFT-join zero row is reconstructed from
    parquet-footer arithmetic (``n_customers - sum(custdist)``) — no
    customer-table scan at all, so the "join" costs one fact exchange.

    Distribution shape per TPC-H Q13 (reference has no corpus layer;
    pattern per the public spec)."""
    import pyarrow.parquet as pq

    per_cust = grouped_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"], {"c_count": (None, "count")})
    dist = grouped_aggregate(per_cust, ["c_count"],
                             {"custdist": (None, "count")},
                             combine="single_block")
    n_customers = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/customer.parquet").metadata.num_rows
    # bounded driver collect: one row per DISTINCT per-customer order
    # count (tens of rows at any scale)
    tabs = list(dist.iter_batches(batch_format="pyarrow",
                                  batch_size=None))
    t = pa.concat_tables(tabs) if tabs else pa.schema(
        [("c_count", pa.int64()), ("custdist", pa.int64())]).empty_table()
    n_zero = n_customers - (pc.sum(t["custdist"]).as_py() or 0)
    if n_zero:
        t = pa.concat_tables([t, pa.table(
            {"c_count": pa.array([0], t["c_count"].type),
             "custdist": pa.array([n_zero], t["custdist"].type)})])
    return t


@_pinned
def order_priority_semi(sf_dir: str):
    """TPC-H Q4-shaped priority census over orders that HAVE a returned
    lineitem — the EXISTS/semi-join shape. The lineitem side ships keys
    ONLY through the exchange tier of stages/join.key_filter_join (the
    returned-key set scales with the data — never broadcast), then the
    priority rollup is enum-small."""
    from pypdfium2_ray.stages.join import key_filter_join

    returned = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]) \
        .filter(expr="l_returnflag == 'R'") \
        .select_columns(["l_orderkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    sel = key_filter_join(orders, returned, "o_orderkey",
                          right_key="l_orderkey", mode="semi",
                          tier="exchange")
    return grouped_aggregate(sel, ["o_orderpriority"],
                             {"n_orders": (None, "count")},
                             combine="single_block")


#: top_supplier revenue window, shared with the oracle generator
TOP_SUPPLIER_WINDOW = ("1996-01-01", "1996-04-01")


@_pinned
def top_supplier(sf_dir: str):
    """TPC-H Q15-shaped top supplier: max-revenue supplier(s) over a
    ship-date quarter. Per-supplier revenue is ONE pre-combined exchange
    over the windowed fact; the aggregate (bounded by #suppliers, tiny
    vs the fact) is materialized once, its max taken distributedly, and
    the equality filter re-reads the SAME materialized aggregate — the
    fact table is scanned once. Winner names come from a pushdown-
    filtered supplier read of just the (typically 1) winning keys."""
    import numpy as np
    import pyarrow.parquet as pq

    lo = np.datetime64(TOP_SUPPLIER_WINDOW[0], "us")
    hi = np.datetime64(TOP_SUPPLIER_WINDOW[1], "us")

    def rev_rows(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        m = (ts >= lo) & (ts < hi)
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        d = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()).filter(
                pa.array(m)),
            "rev": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])
    per_supp = grouped_aggregate(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        ["l_suppkey"], {"total_rev_e4": ("rev", "sum")},
        out_schema=pa.schema([("l_suppkey", pa.int64()),
                              ("total_rev_e4", pa.int64())])).materialize()
    mx = per_supp.max("total_rev_e4")
    if mx is None:
        # no lineitem in the window: max() is None and the expr filter /
        # pushdown-'in' below would crash — the oracle's answer is empty
        import ray
        return ray.data.from_arrow(pa.schema(
            [("s_suppkey", pa.int64()), ("s_name", pa.string()),
             ("total_rev_e4", pa.int64())]).empty_table())
    winners = per_supp.filter(expr=f"total_rev_e4 == {mx}")
    ids = [r["l_suppkey"] for r in winners.take_all()]  # ~1 row
    names = pq.read_table(f"{sf_dir.rstrip('/')}/supplier.parquet",
                          columns=["s_suppkey", "s_name"],
                          filters=[("s_suppkey", "in", ids)])
    lut = dict(zip(names["s_suppkey"].to_pylist(),
                   names["s_name"].to_pylist()))

    def attach(t: pa.Table) -> pa.Table:
        keys = t["l_suppkey"].to_pylist()
        return pa.table({
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "s_name": pa.array([lut[k] for k in keys], pa.string()),
            "total_rev_e4": pc.cast(t["total_rev_e4"], pa.int64())})

    return winners.map_batches(attach, batch_format="pyarrow")


@_pinned
def small_qty_revenue(sf_dir: str):
    """TPC-H Q17-shaped correlated-aggregate join: revenue of lineitems
    whose quantity is below 20% of their part's average quantity. The
    per-part averages are ONE pre-combined exchange; joining them back
    onto the (part-keyed) fact is the large-x-large repartition join
    (stages/exchange.lookup_join — per-part aggregates scale with #parts,
    never broadcast). The 0.2x-average predicate cross-multiplies to
    integers (``5*qty*n < sum_qty``) so the filter is float-free, and the
    final global sum is a two-level partial (per-block, then one block).
    """
    import numpy as np

    from pypdfium2_ray.stages.exchange import lookup_join

    def prep(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                         "qty": pa.array(q, pa.int64()),
                         "price_cents": pa.array(p, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(prep, batch_format="pyarrow")
    per_part = grouped_aggregate(line, ["l_partkey"],
                                 {"sum_qty": ("qty", "sum"),
                                  "n_li": (None, "count")})
    joined = lookup_join(
        line, {"l_partkey": pa.int64(), "qty": pa.int64(),
               "price_cents": pa.int64()},
        per_part, source_key="l_partkey", key_col="l_partkey",
        payload_cols={"sum_qty": pa.int64(), "n_li": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        q = t["qty"].to_numpy()
        keep = 5 * q * t["n_li"].to_numpy() < t["sum_qty"].to_numpy()
        return pa.table({
            "s": pa.array([int(t["price_cents"].to_numpy()[keep].sum())],
                          pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "sum_cents": pa.array([pc.sum(t["s"]).as_py() or 0], pa.int64()),
            "n_rows": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64())})

    return joined.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_size=None,
                                    batch_format="pyarrow")


@_pinned
def idle_rich_customers(sf_dir: str):
    """TPC-H Q22-shaped anti-join report: customers with above-average
    (positive) balance and NO orders, rolled up per nation. The global
    average is a two-scalar partial pass (sum/count of positive cents —
    bounded collect); the threshold compare cross-multiplies to integers
    (``cents * n_pos > sum_pos``) so both engines filter identically; the
    NOT-IN is the exchange-tier anti join (order custkeys ship keys only,
    never broadcast); the nation rollup is enum-small."""
    import numpy as np

    from pypdfium2_ray.stages.join import key_filter_join

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "acctbal_cents": pa.array(cents, pa.int64())})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(prep, batch_format="pyarrow")

    def pos_partial(t: pa.Table) -> pa.Table:
        c = t["acctbal_cents"].to_numpy()
        c = c[c > 0]
        return pa.table({"s": pa.array([int(c.sum())], pa.int64()),
                         "n": pa.array([len(c)], pa.int64())})

    part_tabs = list(
        cust.map_batches(pos_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    sum_pos = sum(pc.sum(t["s"]).as_py() or 0 for t in part_tabs)
    n_pos = sum(pc.sum(t["n"]).as_py() or 0 for t in part_tabs)

    # declared output schema: keeps a legitimately-empty report typed
    # (sf0.01 yields zero idle-rich customers; without this the all-to-all
    # emits no bundles and schema() is None — the r3 red CORRECTNESS cell)
    out_schema = pa.schema([("c_nationkey", pa.int64()),
                            ("n_cust", pa.int64()),
                            ("sum_acctbal_cents", pa.int64())])
    if n_pos == 0:
        # oracle's ``cents * 0 > 0`` is false everywhere — empty report
        return grouped_aggregate(
            cust.filter(expr="acctbal_cents > acctbal_cents"),
            ["c_nationkey"],
            {"n_cust": (None, "count"),
             "sum_acctbal_cents": ("acctbal_cents", "sum")},
            combine="single_block", out_schema=out_schema)
    # integer equivalence: cents * n > s  <=>  cents > s // n (n > 0,
    # both nonneg) — folds the cross-multiply into a CONSTANT compare
    # Ray's expr parser accepts and can push down
    rich = cust.filter(expr=f"acctbal_cents > {sum_pos // n_pos}")
    idle = key_filter_join(
        rich, _read(sf_dir, "orders", ["o_custkey"]), "c_custkey",
        right_key="o_custkey", mode="anti", tier="exchange")
    return grouped_aggregate(idle, ["c_nationkey"],
                             {"n_cust": (None, "count"),
                              "sum_acctbal_cents": ("acctbal_cents", "sum")},
                             combine="single_block", out_schema=out_schema)


def _rev_rows(t, extra: dict[str, "pa.DataType"] | None = None):
    """lineitem batch -> integer revenue rows: 1e-4-dollar units from
    2-decimal price x (100 - discount hundredths) — the shared exact-
    revenue convention of the relational family. *extra* carries through
    additional lineitem columns (cast to the given types)."""
    import numpy as np
    p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    d = t["l_discount"].to_numpy(zero_copy_only=False)
    rev = (np.rint(p * 100.0).astype(np.int64)
           * (100 - np.rint(d * 100.0).astype(np.int64)))
    cols = {"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "rev": pa.array(rev, pa.int64())}
    for c, ty in (extra or {}).items():
        cols[c] = pc.cast(t[c], ty)
    return pa.table(cols)


def _ship_year(t: pa.Table, col: str = "l_shipdate") -> "np.ndarray":
    """Calendar year of a timestamp column as int64 — numpy's
    datetime64[Y] bucketing is exact calendar arithmetic, matching
    DuckDB's year()."""
    import numpy as np
    ts = t[col].to_numpy(zero_copy_only=False)
    return ts.astype("datetime64[Y]").astype(np.int64) + 1970


@_pinned
def nation_flow(sf_dir: str):
    """TPC-H Q7-shaped cross-border trade matrix: integer-exact revenue
    per (supplier nation, customer nation, ship year) over flows where
    the two parties sit in DIFFERENT nations — the generalized Q7 (the
    spec fixes one nation pair; the full matrix is the same plan with
    the pair filter widened to an inequality).

    Exchange budget — FOUR keyed exchanges, the same discipline as
    ``returned_revenue``: supplier and customer SCALE with the data and
    are never broadcast, so both nation-key attachments are repartition
    joins (``exchange.lookup_join``); the fact is pre-combined per
    (custkey, supp-nation, year) BEFORE the customer join so that
    exchange moves aggregates, not lineitems. The 25-row nation-name
    mapping is a driver-side lut applied AFTER the final rollup
    collapses to <= 25 x 24 x |years| rows, and that rollup itself is a
    single-block combine (bounded group count) — no fifth exchange.
    """
    from pypdfium2_ray.stages.exchange import lookup_join

    def prep(t: pa.Table) -> pa.Table:
        out = _rev_rows(t, {"l_suppkey": pa.int64()})
        return out.append_column("year", pa.array(_ship_year(t), pa.int64()))

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount", "l_shipdate"]) \
        .map_batches(prep, batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = lookup_join(line,
                     {"l_orderkey": pa.int64(), "rev": pa.int64(),
                      "l_suppkey": pa.int64(), "year": pa.int64()},
                     supp, source_key="s_suppkey", key_col="l_suppkey",
                     payload_cols={"s_nationkey": pa.int64()})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j2 = lookup_join(j1.select_columns(["l_orderkey", "rev",
                                        "s_nationkey", "year"]),
                     {"l_orderkey": pa.int64(), "rev": pa.int64(),
                      "s_nationkey": pa.int64(), "year": pa.int64()},
                     orders, source_key="o_orderkey", key_col="l_orderkey",
                     payload_cols={"o_custkey": pa.int64()})

    per_cust = grouped_aggregate(j2, ["o_custkey", "s_nationkey", "year"],
                                 {"rev_e4": ("rev", "sum")})
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j3 = lookup_join(per_cust,
                     {"o_custkey": pa.int64(), "s_nationkey": pa.int64(),
                      "year": pa.int64(), "rev_e4": pa.int64()},
                     cust, source_key="c_custkey", key_col="o_custkey",
                     payload_cols={"c_nationkey": pa.int64()})

    cross = j3.filter(expr="s_nationkey != c_nationkey")
    out = grouped_aggregate(cross, ["s_nationkey", "c_nationkey", "year"],
                            {"rev_e4": ("rev_e4", "sum")},
                            combine="single_block")

    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir.rstrip('/')}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    lut = dict(zip(nation["n_nationkey"].to_pylist(),
                   nation["n_name"].to_pylist()))

    def name_it(t: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": pa.array(
                [lut[k] for k in t["s_nationkey"].to_pylist()], pa.string()),
            "cust_nation": pa.array(
                [lut[k] for k in t["c_nationkey"].to_pylist()], pa.string()),
            "year": pc.cast(t["year"], pa.int64()),
            "rev_e4": pc.cast(t["rev_e4"], pa.int64())})

    return out.map_batches(name_it, batch_format="pyarrow")


#: mkt_share parameters, shared with the oracle generator
MKT_SHARE_REGION = "ASIA"
MKT_SHARE_NATION = "NATION_7"     # sits in ASIA (regionkey 7 % 5 == 2)
MKT_SHARE_TYPE = "PROMO"


@_pinned
def mkt_share(sf_dir: str):
    """TPC-H Q8-shaped market share: per ORDER year, the revenue that
    suppliers of one nation captured among all *TYPE*-part purchases by
    customers of one region — reported as integer numerator/denominator
    (``rev_nation_e4`` / ``rev_total_e4``) instead of a float ratio, so
    the oracle compare is exact and the caller divides.

    Plan shape vs the sibling reports: the part-type restriction is a
    keys-only EXCHANGE-TIER SEMI JOIN (part scales with the data — its
    filtered key set is never broadcast), the numerator is a CONDITIONAL
    aggregate (`rev * (s_nationkey == target)`) computed in the SAME
    pass as the denominator — one plan, two sums, no second scan. Five
    keyed exchanges total (semi-join, supplier attach, orders attach,
    per-customer pre-combine, customer attach); the region gate is a
    25-entry nationkey lut applied as a vectorized mask, and the final
    per-year rollup is a single-block combine (|years| groups).
    """
    import numpy as np
    import pyarrow.parquet as pq

    from pypdfium2_ray.stages.exchange import lookup_join
    from pypdfium2_ray.stages.join import key_filter_join

    # part-type key set: scales with |part| -> exchange-tier semi join
    typed_parts = _read(sf_dir, "part", ["p_partkey", "p_type"]) \
        .filter(expr=f"p_type == '{MKT_SHARE_TYPE}'") \
        .select_columns(["p_partkey"])
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"])
    typed_line = key_filter_join(line, typed_parts, "l_partkey",
                                 right_key="p_partkey", mode="semi",
                                 tier="exchange")

    rev = typed_line.map_batches(
        lambda t: _rev_rows(t, {"l_suppkey": pa.int64()}),
        batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = lookup_join(rev,
                     {"l_orderkey": pa.int64(), "rev": pa.int64(),
                      "l_suppkey": pa.int64()},
                     supp, source_key="s_suppkey", key_col="l_suppkey",
                     payload_cols={"s_nationkey": pa.int64()})

    nation = pq.read_table(f"{sf_dir.rstrip('/')}/nation.parquet")
    region = pq.read_table(f"{sf_dir.rstrip('/')}/region.parquet")
    rk_rows = region.filter(pc.equal(region["r_name"], MKT_SHARE_REGION))
    nat_rows = nation.filter(pc.equal(nation["n_name"], MKT_SHARE_NATION))
    if not rk_rows.num_rows or not nat_rows.num_rows:
        # dimension row absent (empty corpus): no qualifying purchase
        # exists — the oracle's answer is empty
        import ray
        return ray.data.from_arrow(_OUT_SCHEMAS["mkt_share"].empty_table())
    rk = rk_rows["r_regionkey"][0].as_py()
    region_nations = set(
        nation.filter(pc.equal(pc.cast(nation["n_regionkey"], pa.int64()),
                               rk))["n_nationkey"].to_pylist())
    target_nat = nat_rows["n_nationkey"][0].as_py()

    def split_rev(t: pa.Table) -> pa.Table:
        # numerator and denominator in ONE pass: rev_nat = rev where the
        # supplier sits in the target nation, else 0
        r = t["rev"].to_numpy()
        is_nat = (t["s_nationkey"].to_numpy() == target_nat)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": t["rev"],
            "rev_nat": pa.array(np.where(is_nat, r, 0), pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def order_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "year": pa.array(_ship_year(t, "o_orderdate"), pa.int64())})

    j2 = lookup_join(j1.map_batches(split_rev, batch_format="pyarrow"),
                     {"l_orderkey": pa.int64(), "rev": pa.int64(),
                      "rev_nat": pa.int64()},
                     orders.map_batches(order_prep, batch_format="pyarrow"),
                     source_key="o_orderkey", key_col="l_orderkey",
                     payload_cols={"o_custkey": pa.int64(),
                                   "year": pa.int64()})

    per_cust = grouped_aggregate(j2, ["o_custkey", "year"],
                                 {"rev_e4": ("rev", "sum"),
                                  "rev_nat_e4": ("rev_nat", "sum")})
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j3 = lookup_join(per_cust,
                     {"o_custkey": pa.int64(), "year": pa.int64(),
                      "rev_e4": pa.int64(), "rev_nat_e4": pa.int64()},
                     cust, source_key="c_custkey", key_col="o_custkey",
                     payload_cols={"c_nationkey": pa.int64()})

    nat_arr = sorted(region_nations)

    def region_gate(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"],
                        value_set=pa.array(nat_arr, pa.int64()))
        return t.filter(keep).select(["year", "rev_e4", "rev_nat_e4"])

    gated = j3.map_batches(region_gate, batch_format="pyarrow")
    return grouped_aggregate(gated, ["year"],
                             {"rev_nation_e4": ("rev_nat_e4", "sum"),
                              "rev_total_e4": ("rev_e4", "sum")},
                             combine="single_block")


@_pinned
def part_supplier_census(sf_dir: str):
    """TPC-H Q16-shaped supplier census: exact COUNT(DISTINCT supplier)
    per (brand, type, size) — over the suppliers OBSERVED in lineitem
    (this schema has no partsupp table; lineitem's (partkey, suppkey)
    pairs are its materialization).

    The post-join count-distinct discipline: distinctness is resolved by
    EXCHANGES, never by driver-side sets. Three keyed exchanges — (1)
    (partkey, suppkey) pair-dedup, pre-combined per block so the
    exchange moves unique pairs; (2) repartition join attaching part
    attrs (part SCALES — never broadcast); (3) (brand, type, size,
    suppkey) dedup, which makes the final per-attr count a plain COUNT.
    The attr domains are fixed enums (25 brands x 6 types x 50 sizes at
    ANY scale), so the final rollup is a single-block combine."""
    from pypdfium2_ray.stages.exchange import lookup_join

    pairs = grouped_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], {"n_": (None, "count")}) \
        .select_columns(["l_partkey", "l_suppkey"])

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"])
    j = lookup_join(pairs,
                    {"l_partkey": pa.int64(), "l_suppkey": pa.int64()},
                    part, source_key="p_partkey", key_col="l_partkey",
                    payload_cols={"p_brand": pa.string(),
                                  "p_type": pa.string(),
                                  "p_size": pa.int64()})

    dedup = grouped_aggregate(
        j, ["p_brand", "p_type", "p_size", "l_suppkey"],
        {"n_": (None, "count")}) \
        .select_columns(["p_brand", "p_type", "p_size"])
    return grouped_aggregate(dedup, ["p_brand", "p_type", "p_size"],
                             {"supplier_cnt": (None, "count")},
                             combine="single_block")


@_pinned
def blame_supplier(sf_dir: str):
    """TPC-H Q21-shaped blame report: for each supplier, the number of
    MULTI-supplier orders where that supplier alone shipped last — the
    'who kept the order waiting' within-group analytic (Q21's
    EXISTS(other supplier) + NOT EXISTS(other LATE supplier) pair,
    restated over this schema's shipdate as: the max shipdate is
    attained by exactly one supplier's lineitems and the order has >= 2
    distinct suppliers).

    TWO keyed exchanges: the fact exchanges ONCE on orderkey and a
    whole-partition vectorized kernel (Cython groupby max / nunique —
    every order's rows arrive complete, no per-group Python) emits at
    most one (orderkey, supplier) verdict row per order; the per-
    supplier count is a pre-combined exchange (suppliers SCALE — no
    single-block shortcut)."""
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64")})
        g = df.groupby("l_orderkey", sort=False)
        nsupp = g["l_suppkey"].transform("nunique")
        mx = g["l_shipdate"].transform("max")
        at_max = df[(df["l_shipdate"] == mx) & (nsupp >= 2)]
        per = at_max.groupby("l_orderkey", sort=False)["l_suppkey"] \
            .agg(["nunique", "first"])
        winners = per.loc[per["nunique"] == 1, "first"]
        return pd.DataFrame({"s_suppkey": winners.astype("int64").values})

    verdicts = partition_map(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate"]),
        ["l_orderkey"], kernel, batch_format="pandas")
    return grouped_aggregate(verdicts, ["s_suppkey"],
                             {"n_blamed": (None, "count")})


@_pinned
def important_parts(sf_dir: str, num: int = 6, den: int = 5):
    """TPC-H Q11-shaped 'important stock' report: parts whose lineitem
    revenue exceeds *num/den* x THE MEAN PART REVENUE — the
    HAVING-against-a-global-scalar shape where the threshold is a
    second aggregate OF THE AGGREGATE, not of the raw rows (this schema
    has no partsupp; lineitem revenue is the value analogue; a
    mean-relative threshold stays selective at every corpus size,
    unlike Q11's fixed global share, which any sub-1/share part count
    trivializes).

    ONE keyed exchange: the per-part sums (pre-combined). The aggregate
    is materialized ONCE and reused for the global folds (native
    ``.sum()``/``.count()`` over #parts rows — tiny vs the fact) and
    the filter; the raw table is scanned once. The compare
    ``s * den * n > num * t`` folds to a CONSTANT integer threshold
    (``s > (num*t) // (den*n)`` for positive int64 — the
    ``idle_rich_customers`` equivalence), keeping the filter expr
    pushdown-friendly and overflow-free at any scale."""
    import numpy as np

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    per_part = grouped_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow"),
        ["l_partkey"], {"sum_cents": ("cents", "sum")}).materialize()
    total = per_part.sum("sum_cents") or 0
    n = per_part.count() or 1
    return per_part.filter(expr=f"sum_cents > {(num * total) // (den * n)}")


#: forecast_revenue window + predicate bounds, shared with the oracle
FORECAST_WINDOW = ("1996-01-01", "1997-01-01")
FORECAST_DISC = (5, 7)       # discount hundredths, inclusive
FORECAST_MAX_QTY = 24        # quantity strictly below


@_pinned
def forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast-revenue change: SUM(price x discount)
    over lineitems in one ship-date year with discount in a band and
    quantity under a cap — the pure predicate-scan aggregate, the
    simplest plan in the family and the one that must stay EXCHANGE-FREE:
    per-block integer partials (price cents x discount hundredths ->
    1e-4-dollar units), one unkeyed coalesce, one fold. Any keyed
    exchange here would be a planner bug (pinned in test_audit).

    Column pruning matters more than compute: only 4 of 11 lineitem
    columns leave storage."""
    import numpy as np

    lo = np.datetime64(FORECAST_WINDOW[0], "us")
    hi = np.datetime64(FORECAST_WINDOW[1], "us")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        d = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = ((ts >= lo) & (ts < hi)
             & (d >= FORECAST_DISC[0]) & (d <= FORECAST_DISC[1])
             & (q < FORECAST_MAX_QTY))
        p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)[m]
        return pa.table({
            "s": pa.array([int((p * d[m]).sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_e4": pa.array([pc.sum(t["s"]).as_py() or 0],
                                   pa.int64()),
            "n_rows": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_shipdate", "l_discount", "l_quantity",
                  "l_extendedprice"])
    return line.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_size=None,
                                    batch_format="pyarrow")


@_pinned
def ship_delay(sf_dir: str):
    """Fulfilment-latency report: per order priority, the count / sum /
    min / max of (ship day − order day) across all lineitems — the
    order-to-ship SLA view. ONE repartition join (lineitem rows pick up
    their order's date + priority; orders is the smaller side but both
    grow with the data, so this is a hash join, not a broadcast), a
    vectorized day-diff, and a single-block enum combine (fixed 5-value
    priority set). Day diffs are exact int64 on both engines."""
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    j = lookup_join(line,
                    {"l_orderkey": pa.int64(),
                     "l_shipdate": pa.timestamp("us")},
                    orders, source_key="o_orderkey",
                    key_col="l_orderkey",
                    payload_cols={"o_orderdate": pa.timestamp("us"),
                                  "o_orderpriority": pa.string()})

    day_us = 86_400_000_000

    def diff(t: pa.Table) -> pa.Table:
        ship = pc.divide(pc.cast(t["l_shipdate"], pa.int64()), day_us)
        odate = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), day_us)
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "d": pc.subtract(ship, odate)})

    days = j.map_batches(diff, batch_format="pyarrow")
    return grouped_aggregate(
        days, ["o_orderpriority"],
        {"n_items": (None, "count"), "sum_delay_days": ("d", "sum"),
         "min_delay_days": ("d", "min"), "max_delay_days": ("d", "max")},
        combine="single_block")
