"""Dedup-family queries (exact/minhash/simhash/ppjoin/graph tiers).

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping; content unchanged). See
``pypdfium2_ray/queries/__init__.py`` for the layout.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.queries.common import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.extraction import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.textstats import *  # noqa: F401,F403,E501

# ---------------------------------------------------------------------------
# dedup family

def q_robots_gate(sf_dir: str):
    """Crawl-politeness gate (functions/robots, RFC 9309 longest-match
    semantics incl. the Allow override): per-host robots.txt rules parsed
    once, broadcast, one streaming filter pass over the corpus urls. The
    deterministic robots map exercises Disallow-all, prefix + longer-
    Allow override, anchored wildcard, and absent-robots hosts; each rule
    translates to an exact SQL predicate."""
    from pypdfium2_ray.functions.robots import robots_gate
    # src0: blocked entirely; src1: ids starting '1' blocked unless
    # starting '12'; src2: ids ending in 7 blocked (anchored wildcard);
    # every other host has no robots -> allowed
    robots = {
        "src0": "User-agent: *\nDisallow: /\n",
        "src1": "User-agent: *\nDisallow: /1\nAllow: /12\n",
        "src2": "User-agent: *\nDisallow: /*7$\n",
    }
    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        lambda t: pa.table({
            "url": pc.binary_join_element_wise(
                "doc://", t["source"], "/",
                pc.cast(t["doc_id"], pa.string()), ""),
            "doc_id": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    return robots_gate(ds, robots)


def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) layout key over events (stages/zorder): bit
    interleave of (user_id, ts-seconds) — the write-layout key that keeps
    BOTH dimensions prunable (locality property tested in
    tests/test_zorder.py); one vectorized pass, exact generated-SQL
    twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.zorder import add_zorder_key
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        secs = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "a": pc.cast(t["user_id"], pa.int64()),
                         "b": secs})

    out = add_zorder_key(ds.map_batches(prep, batch_format="pyarrow"),
                         "a", "b")
    return out.select_columns(["event_id", "zkey"])


#: Count-Min query config — shared with the oracle generator
CM_WIDTH, CM_DEPTH = 2048, 4
CM_QUERY_TOKENS = ("data", "the", "spark", "absent-token-xyz")


def q_cm_counts(sf_dir: str):
    """Count-Min point-count estimates (stages/freq.count_min_sketch):
    per-block distinct pre-combine, ONE (d, cell) exchange with exact
    integer cell sums, estimates = min over depth rows. The cell hash is
    the md5_number_upper twin, so the ESTIMATES (including collision
    over-counts and the absent token) are SQL-expressible exactly."""
    from pypdfium2_ray.stages.freq import (
        cm_estimate, count_min_sketch, explode_tokens)
    toks = _docs(sf_dir, ["text"]).map_batches(
        explode_tokens, batch_format="pyarrow")
    with _hint(sf_dir):
        sketch = count_min_sketch(toks, "token",
                                  width=CM_WIDTH, depth=CM_DEPTH)
    # the sketch is the bounded <= depth*width-row summary: the ONE
    # legitimate driver collect
    rows = pa.concat_tables(list(sketch.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    return cm_estimate(rows, list(CM_QUERY_TOKENS),
                       width=CM_WIDTH, depth=CM_DEPTH)


def _cm_counts_sql() -> str:
    vals = ", ".join(f"('{v}')" for v in CM_QUERY_TOKENS)
    ds = ", ".join(f"({d})" for d in range(CM_DEPTH))
    return f"""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(text,
                        '[ \t\r\n\f\v]+')) AS t
          FROM documents),
        cnt AS (SELECT t, count(*)::BIGINT AS c FROM tok
                WHERE t <> '' GROUP BY t),
        q(v) AS (VALUES {vals}),
        d(d) AS (VALUES {ds}),
        cells AS (
          SELECT q.v, d.d,
                 COALESCE(SUM(CASE WHEN
                     md5_number_upper(d.d || ':' || cnt.t) % {CM_WIDTH}
                     = md5_number_upper(d.d || ':' || q.v) % {CM_WIDTH}
                   THEN cnt.c END), 0) AS sd
          FROM q CROSS JOIN d LEFT JOIN cnt ON TRUE
          GROUP BY q.v, d.d)
        SELECT v AS value, min(sd)::BIGINT AS est FROM cells GROUP BY v"""


#: join-size-estimation config — shared with the oracle generator.
#: width sizes the over-estimate: E[excess] <= N_A*N_B/width, so a planner
#: wanting ~eps relative error on join size J provisions width ~ N_A*N_B/
#: (eps*J). 8192 keeps the sf0.01 orders|x|customer estimate within ~20%.
JS_WIDTH, JS_DEPTH = 8192, 4


def q_join_size_est(sf_dir: str):
    """Count-Min join-cardinality estimate (stages/freq.cm_join_size):
    |orders JOIN customer ON custkey| WITHOUT running the join — the
    AGMS/CM inner-product planner statistic for sizing a shuffle before
    paying for it. Distinct-key pre-combine per block, ONE bounded
    (d, cell) exchange; nothing input-sized moves. The cell hash is the
    md5_number_upper twin, so the estimate (collision over-counts
    included) is SQL-exact."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import cm_join_size
    orders = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                             columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir.rstrip('/')}/customer.parquet",
                           columns=["c_custkey"])
    with _hint(sf_dir, "orders"):
        return cm_join_size(orders, "o_custkey", cust, "c_custkey",
                            width=JS_WIDTH, depth=JS_DEPTH)


def _join_size_est_sql() -> str:
    ds = ", ".join(f"({d})" for d in range(JS_DEPTH))
    return f"""
        WITH ca AS (SELECT o_custkey AS k, count(*)::BIGINT AS c
                    FROM orders GROUP BY 1),
        cb AS (SELECT c_custkey AS k, count(*)::BIGINT AS c
               FROM customer GROUP BY 1),
        d(d) AS (VALUES {ds}),
        ga AS (SELECT d.d,
                      md5_number_upper(d.d || ':' || ca.k) % {JS_WIDTH}
                        AS cell, SUM(ca.c) AS c
               FROM d CROSS JOIN ca GROUP BY 1, 2),
        gb AS (SELECT d.d,
                      md5_number_upper(d.d || ':' || cb.k) % {JS_WIDTH}
                        AS cell, SUM(cb.c) AS c
               FROM d CROSS JOIN cb GROUP BY 1, 2),
        ip AS (SELECT ga.d, SUM(ga.c * gb.c) AS ip
               FROM ga JOIN gb ON ga.d = gb.d AND ga.cell = gb.cell
               GROUP BY 1)
        SELECT min(ip)::BIGINT AS est FROM ip"""


def q_join_size_exact(sf_dir: str):
    """Exact join cardinality without materializing the join
    (stages/freq.exact_join_size): sum_k cntA[k]*cntB[k] — per-key counts
    pre-combined per block, ONE key-width exchange, per-partition
    product-sum. Ground truth for q_join_size_est at a fraction of the
    join's payload exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import exact_join_size
    li = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                             columns=["o_orderkey"])
    with _hint(sf_dir, "lineitem"):
        return exact_join_size(li, "l_orderkey", orders, "o_orderkey")


def q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 LEFT-join order-count distribution without a join:
    one fact exchange + footer arithmetic for the zero-order row
    (pipelines/relational.cust_order_dist)."""
    from pypdfium2_ray.pipelines.relational import cust_order_dist
    with _hint(sf_dir, "orders"):
        return cust_order_dist(sf_dir)


def q_order_priority_semi(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join census
    (pipelines/relational.order_priority_semi): keys-only exchange-tier
    semi join, enum-small priority rollup."""
    from pypdfium2_ray.pipelines.relational import order_priority_semi
    with _hint(sf_dir, "lineitem"):
        return order_priority_semi(sf_dir)


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 max-revenue supplier over a ship-date quarter
    (pipelines/relational.top_supplier): one windowed fact exchange,
    distributed max over the bounded per-supplier aggregate, pushdown
    name fetch of just the winners."""
    from pypdfium2_ray.pipelines.relational import top_supplier
    with _hint(sf_dir, "lineitem"):
        return top_supplier(sf_dir)


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 correlated-aggregate join
    (pipelines/relational.small_qty_revenue): per-part averages joined
    back onto the part-keyed fact via lookup_join, integer cross-
    multiplied 0.2x-average predicate, two-level global sum."""
    from pypdfium2_ray.pipelines.relational import small_qty_revenue
    with _hint(sf_dir, "lineitem"):
        return small_qty_revenue(sf_dir)


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 anti-join report
    (pipelines/relational.idle_rich_customers): two-scalar positive-
    balance average, integer cross-multiplied threshold, exchange-tier
    NOT IN, enum-small nation rollup."""
    from pypdfium2_ray.pipelines.relational import idle_rich_customers
    with _hint(sf_dir, "customer"):
        return idle_rich_customers(sf_dir)


def q_key_skew(sf_dir: str):
    """Shuffle-planner skew histogram over events.user_id
    (stages/freq.key_skew): per-key counts in one keys-only exchange,
    log2 buckets, single-block rollup."""
    from pypdfium2_ray.stages.freq import key_skew
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id"])
    with _hint(sf_dir, "events"):
        return key_skew(ds, "user_id")


def q_nation_flow(sf_dir: str):
    """TPC-H Q7-shaped cross-border trade matrix
    (pipelines/relational.nation_flow): four keyed exchanges (supplier /
    orders / customer repartition joins + per-customer pre-combine),
    single-block final rollup, 25-row name lut applied last."""
    from pypdfium2_ray.pipelines.relational import nation_flow
    with _hint(sf_dir, "lineitem"):
        return nation_flow(sf_dir)


def q_mkt_share(sf_dir: str):
    """TPC-H Q8-shaped market share as integer numerator/denominator
    (pipelines/relational.mkt_share): exchange-tier part-type semi join,
    conditional aggregate in one pass, five keyed exchanges."""
    from pypdfium2_ray.pipelines.relational import mkt_share
    with _hint(sf_dir, "lineitem"):
        return mkt_share(sf_dir)


def q_part_supplier_census(sf_dir: str):
    """TPC-H Q16-shaped exact COUNT(DISTINCT supplier) per part
    (brand, type, size) (pipelines/relational.part_supplier_census):
    distinctness resolved by exchanges (pair-dedup, part repartition
    join, attr+supp dedup), enum-small single-block final."""
    from pypdfium2_ray.pipelines.relational import part_supplier_census
    with _hint(sf_dir, "lineitem"):
        return part_supplier_census(sf_dir)


def q_blame_supplier(sf_dir: str):
    """TPC-H Q21-shaped 'who shipped last' blame report
    (pipelines/relational.blame_supplier): one orderkey exchange +
    whole-partition vectorized verdict kernel, pre-combined per-supplier
    count."""
    from pypdfium2_ray.pipelines.relational import blame_supplier
    with _hint(sf_dir, "lineitem"):
        return blame_supplier(sf_dir)


def q_user_running_total(sf_dir: str):
    """Per-row running total — SUM(value_e4) OVER (PARTITION BY user
    ORDER BY ts, event_id) emitting EVERY event row
    (stages/sessionize.running_total): one key exchange, one global
    cumsum minus run-boundary offsets, no per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_total
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return running_total(
            ev.map_batches(prescale, batch_format="pyarrow"))


def q_event_islands(sf_dir: str):
    """Gaps-and-islands: each user's stream collapsed into maximal runs
    of equal event_type (stages/sessionize.event_islands): one key
    exchange, boundary mask + np reduceat kernel, epoch-us int64
    interval endpoints. SQL twin is the row_number-difference trick."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_islands
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return event_islands(ev)


def q_monthly_delta(sf_dir: str):
    """Period-over-period trend table per event_type at DAY grain
    (stages/agg.periodic_delta — the testdata spans one month, so day
    grain is what exercises real LAG deltas): ZERO keyed exchanges —
    (type x period) is time-bounded so the census is single-block, and
    the LAG runs on that block; first period carries the sentinel
    (COALESCE twin)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import periodic_delta
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return periodic_delta(
            ev.map_batches(prescale, batch_format="pyarrow"),
            "event_type", "ts", "value_e4", grain="day")


def q_value_centered(sf_dir: str):
    """Group-mean-centered values, all rows out — AVG() OVER
    (PARTITION BY user) as the integer pair (n_key, dev_n = v*n - sum)
    so both engines hash identically
    (stages/sessionize.group_centered): one key exchange, two Cython
    transforms, no sort."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import group_centered
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return group_centered(
            ev.map_batches(prescale, batch_format="pyarrow"))


def q_important_parts(sf_dir: str):
    """TPC-H Q11-shaped HAVING-vs-global-share report
    (pipelines/relational.important_parts): one pre-combined per-part
    exchange, aggregate materialized once for the global fold + the
    constant-folded share filter (s*d > t <=> s > t//d)."""
    from pypdfium2_ray.pipelines.relational import important_parts
    with _hint(sf_dir, "lineitem"):
        return important_parts(sf_dir)


def q_event_lag(sf_dir: str):
    """All-rows LAG emit (stages/sessionize.event_lag): every event
    with its user's previous event id, inter-arrival us, and value
    delta; sentinels for the first event. One key exchange, one shift
    + boundary mask."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_lag
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return event_lag(ev.map_batches(prescale, batch_format="pyarrow"))


def q_running_distinct(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user, all rows out
    (stages/sessionize.running_distinct): window count-distinct —
    unsupported as a native SQL window — via first-occurrence flags +
    per-key cumsum; twin is SUM(is_first) OVER. One key exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_distinct
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return running_distinct(ev)


def q_first_touch(sf_dir: str):
    """First-touch attribution for purchases
    (stages/sessionize.first_touch_attribution): sessionize (30-min
    gap) + FIRST_VALUE-of-session + conversion filter FUSED into one
    exchange + one kernel — three SQL window layers on the twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import first_touch_attribution
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return first_touch_attribution(ev, target="purchase")


def q_time_to_convert(sf_dir: str):
    """Forward-looking LEAD-to-event window
    (stages/sessionize.time_to_convert): every event annotated with us
    until its user's NEXT purchase strictly after it (-1 sentinel) —
    one exchange, one searchsorted against target-row positions; the
    twin is MIN(CASE..) OVER a 1-FOLLOWING..UNBOUNDED future frame."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_to_convert
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return time_to_convert(ev, target="purchase")


def q_user_trend(sf_dir: str):
    """Exact per-user OLS spend trend (stages/agg.grouped_ols_trend):
    slope of value_e4 vs 1-based event sequence index as the EXACT
    integer rational (slope_num, slope_den) — bit-exact vs the
    ROW_NUMBER + integer-sum SQL twin where a float slope would
    hash-diverge on summation order. One exchange, lexsort + reduceat."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_ols_trend
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_ols_trend(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "ts", "event_id", "value_e4")


def q_user_gini(sf_dir: str):
    """Exact per-user Gini spend concentration (stages/agg.grouped_gini):
    the sorted-rank Gini formula as the EXACT integer rational
    (gini_num, gini_den) over value_e4 — tie-order-invariant, so
    bit-exact vs the ROW_NUMBER SQL twin. One exchange, lexsort +
    reduceat, zero per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_gini
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_gini(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "value_e4")


def q_densify_days(sf_dir: str):
    """Calendar densification (stages/sessionize.densify_days): one row
    per user per day between first and last activity, zero-filled —
    the only row-EXPANDING window op (generate_series + LEFT JOIN twin).
    Per-block (user, day) partials, one exchange, arange+scatter kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import densify_days
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return densify_days(ev)


def q_bounce_rate(sf_dir: str):
    """Per-entry-label bounce report (stages/sessionize.bounce_rate):
    sessionize + FIRST-of-session + two aggregation levels fused into
    ONE keyed exchange with per-partition label partials and a
    single-block enum fold. Exact integer counts (rate left to the
    consumer)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import bounce_rate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return bounce_rate(ev)


def q_benford_digits(sf_dir: str):
    """Benford leading-digit profile per event type
    (stages/agg.leading_digit_counts): vectorized log-bounded //10
    digit reduction (no strings, no libm log), block partials +
    single-block enum combine — ZERO keyed exchanges. Non-positive
    values are dropped on BOTH sides (Benford convention: zero has no
    leading significant digit)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import leading_digit_counts
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        keep = pc.greater(v, 0)
        return pa.table({"event_type": pc.filter(t["event_type"], keep),
                         "value_e4": pc.filter(v, keep)})

    return leading_digit_counts(
        ev.map_batches(prescale, batch_format="pyarrow"),
        ["event_type"], "value_e4")


def q_ks_distance(sf_dir: str):
    """Exact two-sample KS distance, view vs purchase values
    (stages/agg.ks_two_sample): distinct-value ECDF support via one
    hash combine, global cumulative counts via two range prefix scans
    (no global sort), per-block pre-max + tiny fold — ONE row, the
    exact integer rational (d_num, d_den) plus both sample sizes."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import ks_two_sample
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return ks_two_sample(
            ev.map_batches(prescale, batch_format="pyarrow"),
            "value_e4", "event_type", "view", "purchase")


def q_mutual_links(sf_dir: str):
    """Reciprocal link pairs (stages/triangles.mutual_pairs): unordered
    node pairs linked in BOTH directions over the distinct synthetic
    edge set — one packed-key exchange, per-partition min/max flag
    group_by, no joins."""
    from pypdfium2_ray.stages.triangles import mutual_pairs
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        return mutual_pairs(edges)


def _mutual_links_sql() -> str:
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node
                       FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)
          FROM nodes),
        de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
                            WHERE src <> dst)
        SELECT a.src AS id_a, a.dst AS id_b
        FROM de a JOIN de b ON a.src = b.dst AND a.dst = b.src
        WHERE a.src < a.dst"""


def q_kwic_first(sf_dir: str):
    """Keyword-in-context concordance for 'merge'
    (stages/textstats.kwic_first): first occurrence per doc, 1-based
    position + 24 chars of context each side — ZERO exchanges, one
    vectorized find_substring + two byte-buffer slice gathers."""
    from pypdfium2_ray.stages.textstats import kwic_first
    ds = _docs(sf_dir, ["doc_id", "text"])
    return kwic_first(ds, "merge", ctx=24)


def q_value_cume(sf_dir: str):
    """Exact CUME_DIST rational per event (stages/topk.grouped_cume):
    peer-inclusive RANGE-frame count over value_e4 within the user,
    all rows out — one exchange, lexsort + run-end boundary masks."""
    import ray.data as rd
    from pypdfium2_ray.stages.topk import grouped_cume
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_cume(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "value_e4", "event_id")


def q_weighted_median(sf_dir: str):
    """Exact quantity-weighted lower median price per return flag
    (stages/agg.weighted_median): per-block (flag, price-cents) weight
    partials + ONE single-block combine (enum keys x bounded price
    domain) running the cumsum first-crossing rule — ZERO keyed
    exchanges, bit-exact vs the window-cumsum twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import weighted_median
    li = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])

    def prescale(t: pa.Table) -> pa.Table:
        p = pc.cast(pc.round(pc.multiply(
            pc.cast(t["l_extendedprice"], pa.float64()), 100.0)),
            pa.int64())
        w = pc.cast(pc.round(pc.cast(t["l_quantity"], pa.float64())),
                    pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "price_c": p, "qty": w})

    return weighted_median(
        li.map_batches(prescale, batch_format="pyarrow"),
        ["l_returnflag"], "price_c", "qty")


#: event_type -> bit index, alphabetical (the twin's CASE mirrors it)
TYPE_BITS = {"click": 0, "error": 1, "purchase": 2, "signup": 3,
             "view": 4}


def q_user_type_bitmask(sf_dir: str):
    """Per-user event-type bitmask + popcount
    (stages/agg.grouped_type_bitmask): OR of distinct powers of two ==
    SUM(DISTINCT bit), so the twin needs no BIT_OR; block pre-distinct
    (user, bit) pairs, ONE exchange, unknown labels rejected loudly."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_type_bitmask
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        return grouped_type_bitmask(ev, ["user_id"], "event_type",
                                    TYPE_BITS)


def q_burst_count(sf_dir: str):
    """Temporal self-join count (stages/sessionize.burst_count): every
    event annotated with how many of its user's later events fall
    within 1 hour — the banded self-join collapsed to a count. One
    exchange, composite-axis searchsorted kernel, no per-key loop."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import burst_count
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    with _hint(sf_dir, "events"):
        return burst_count(ev, window_s=3600.0)


def q_trailing_sum(sf_dir: str):
    """Event-granularity trailing 1h value sum
    (stages/sessionize.trailing_sum): peer-inclusive RANGE-frame sum
    per event — composite-axis searchsorted lower bound + run-end
    cumsum difference, one exchange, no per-key loop."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import trailing_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return trailing_sum(
            ev.map_batches(prescale, batch_format="pyarrow"),
            window_s=3600.0)


def q_active_streak(sf_dir: str):
    """Longest consecutive-active-day streak per user
    (stages/sessionize.active_streak): distinct (user, day) block
    partials, one exchange, integer gaps-and-islands kernel; the twin
    is the day - ROW_NUMBER() grouping trick."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import active_streak
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return active_streak(ev)


def q_state_duration(sf_dir: str):
    """Time-in-state per (user, event_type)
    (stages/sessionize.state_duration): each event's state holds until
    the user's next event (LEAD twin); last events hold nothing. One
    exchange, shift + boundary mask + Cython groupby-sum."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import state_duration
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return state_duration(ev)


def q_time_profile(sf_dir: str):
    """Weekly seasonality profile: event count + value sum per
    (day-of-week, hour-of-day) cell (stages/agg.grouped_aggregate,
    single-block combine over the fixed 168-cell grid — ZERO keyed
    exchanges). dow/hod come from integer epoch arithmetic on BOTH
    sides (no engine EXTRACT conventions): dow 0 = Monday."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "value"])

    def _mod(x, m):  # pc.mod is absent in this pyarrow; x >= 0 here
        return pc.subtract(x, pc.multiply(pc.divide(x, m), m))

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        dow = _mod(pc.add(pc.divide(us, 86_400_000_000), 3), 7)
        hod = _mod(pc.divide(us, 3_600_000_000), 24)
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"dow": dow, "hod": hod, "v": v})

    out = grouped_aggregate(
        ev.map_batches(widen, batch_format="pyarrow"),
        ["dow", "hod"],
        {"n_events": (None, "count"), "sum_value_e4": ("v", "sum")},
        combine="single_block")
    return _cast_i64(out, ["dow", "hod"])


def q_rfm_scores(sf_dir: str):
    """RFM segmentation — the classic marketing recency / frequency /
    monetary quintiles per user, EXACT: per-user aggregates (one
    pre-combined exchange), then THREE global range-prefix scans
    (stages/scan.ranged_prefix_sum — exclusive rank under the
    (metric, user_id) total order, no global sort), quintile =
    rank0 * 5 // n_users on both engines (the explicit NTILE formula —
    engine NTILE fill conventions never enter). Metrics are packed
    (metric << 31) | user_id composite keys, overflow-guarded."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "us": us, "v": v})

    with _hint(sf_dir, "events"):
        agg = grouped_aggregate(
            ev.map_batches(widen, batch_format="pyarrow"),
            ["user_id"],
            {"freq": (None, "count"), "mon_e4": ("v", "sum"),
             "max_us": ("us", "max")}).materialize()
    anchor_day = agg.max("max_us") // 86_400_000_000
    nu = agg.count()

    def metrics(t: pa.Table) -> pa.Table:
        rec = pc.subtract(anchor_day,
                          pc.divide(t["max_us"], 86_400_000_000))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "rec_days": rec, "freq": t["freq"],
                         "mon_e4": t["mon_e4"]})

    ds = agg.map_batches(metrics, batch_format="pyarrow")
    for metric in ("rec_days", "freq", "mon_e4"):
        def pack(t: pa.Table, _m=metric) -> pa.Table:
            m = pc.cast(t[_m], pa.int64())
            u = pc.cast(t["user_id"], pa.int64())
            if t.num_rows and (pc.max(m).as_py() >= 2 ** 32
                               or pc.min(m).as_py() < 0
                               or pc.max(u).as_py() >= 2 ** 31):
                raise ValueError(
                    f"rfm composite key would overflow on {_m} — "
                    "bucket the metric (e.g. coarser units) first")
            cols = {n: t[n] for n in t.column_names
                    if n not in ("ckey", "one")}
            cols["ckey"] = pc.add(pc.shift_left(m, 31), u)
            cols["one"] = pa.array(np.ones(t.num_rows, np.int64))
            return pa.table(cols)

        with _hint(sf_dir, "events"):
            ds = ranged_prefix_sum(
                ds.map_batches(pack, batch_format="pyarrow"),
                "ckey", "one", out=f"rank0_{metric}")

    def quintiles(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in ("user_id", "rec_days", "freq",
                                  "mon_e4")}
        for metric, q in (("rec_days", "r_q"), ("freq", "f_q"),
                          ("mon_e4", "m_q")):
            cols[q] = pc.divide(
                pc.multiply(t[f"rank0_{metric}"], 5), nu)
        return pa.table(cols)

    return ds.map_batches(quintiles, batch_format="pyarrow")


def q_spike_days(sf_dir: str):
    """Traffic-spike detector: per day, event count, the CALENDAR
    7-day-trailing baseline (RANGE frame — gap days shrink it, unlike a
    ROWS frame that would silently span gaps), and an exact integer
    spike flag (n*7 > 2*baseline). Day cardinality is bounded by the
    corpus time span, so: block partials + single-block combine + one
    searchsorted window pass — ZERO keyed exchanges."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"day": pc.divide(us, 86_400_000_000)})

    daily = grouped_aggregate(
        ev.map_batches(widen, batch_format="pyarrow"),
        ["day"], {"n_events": (None, "count")}, combine="single_block")

    def window(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        cs = np.concatenate(([0], np.cumsum(n)))
        lo = np.searchsorted(d, d - 7, side="left")
        hi = np.searchsorted(d, d, side="left")   # strictly-before rows
        trail7 = cs[hi] - cs[lo]
        spike = ((trail7 > 0) & (n * 7 > 2 * trail7)).astype(np.int64)
        return pa.table({"day": d, "n_events": n, "trail7": trail7,
                         "is_spike": spike})

    return daily.map_batches(window, batch_size=None,
                             batch_format="pyarrow")


def q_source_share(sf_dir: str):
    """Ratio-to-report per source: doc count + char volume per source
    alongside the corpus totals on every row (the SUM() OVER () shape)
    — share = n/tot stays an exact rational. Enum source cardinality ->
    block partials + single-block combine + one totals pass, ZERO
    keyed exchanges."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = _docs(sf_dir, ["source", "n_chars"])
    per = grouped_aggregate(
        ds, ["source"],
        {"n_docs": (None, "count"), "sum_chars": ("n_chars", "sum")},
        combine="single_block")

    def totals(t: pa.Table) -> pa.Table:
        td = pc.sum(t["n_docs"]).as_py() or 0
        tc = pc.sum(t["sum_chars"]).as_py() or 0
        n = t.num_rows
        return pa.table({"source": t["source"],
                         "n_docs": pc.cast(t["n_docs"], pa.int64()),
                         "sum_chars": pc.cast(t["sum_chars"],
                                              pa.int64()),
                         "tot_docs": pa.array([td] * n, pa.int64()),
                         "tot_chars": pa.array([tc] * n, pa.int64())})

    return per.map_batches(totals, batch_size=None,
                           batch_format="pyarrow")


def q_peak_day(sf_dir: str):
    """Per-user busiest day (two-level aggregate + argmax): each
    user's top activity day with its count and the user's total —
    ties break to the EARLIEST day on both engines. Per-block
    (user, day) count partials, ONE user exchange, lexsort with
    negated counts + segment-first gather — no per-user Python."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.divide(us, 86_400_000_000)}) \
            .group_by(["user_id", "day"], use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "day", "n"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "top_day": pd.Series(dtype="int64"),
                "n_top": pd.Series(dtype="int64"),
                "n_total": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "day"], sort=False,
                       as_index=False)["n"].sum()
        k = g["user_id"].to_numpy()
        d = g["day"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        order = np.lexsort((d, -n, k))
        k, d, n = k[order], d[order], n[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        runs = np.diff(np.append(starts, len(k)))
        return pd.DataFrame({
            "user_id": k[starts].astype("int64"),
            "top_day": d[starts],
            "n_top": n[starts],
            "n_total": np.add.reduceat(n, starts).astype("int64")})

    partials = ev.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_systematic_sample(sf_dir: str):
    """Deterministic systematic sample: every 100th event under the
    GLOBAL (ts, event_id) total order — the stratified-in-time audit
    draw (hash_sample is its content-keyed cousin). Exact global rank
    via stages/scan.ranged_prefix_sum over a packed
    (rebased-us << 21 | event_id) key (min-ts rebase from the parquet
    footer, no scan; loud width guards), then a modulo filter — no
    global sort."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    min_us = min(
        meta.metadata.row_group(i).column(ts_idx).statistics.min
        for i in range(meta.metadata.num_row_groups)).timestamp() \
        * 1_000_000
    min_us = int(min_us)
    ev = rd.read_parquet(path, columns=["event_id", "ts"])

    def composite(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        rel = pc.subtract(us, min_us)
        e = pc.cast(t["event_id"], pa.int64())
        if t.num_rows and (pc.max(rel).as_py() >= 2 ** 42
                           or pc.min(rel).as_py() < 0
                           or pc.max(e).as_py() >= 2 ** 21):
            raise ValueError("systematic-sample composite key would "
                             "overflow — re-derive the shift widths")
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"event_id": e, "one": one,
                         "ckey": pc.add(pc.shift_left(rel, 21), e)})

    with _hint(sf_dir, "events"):
        ranked = ranged_prefix_sum(
            ev.map_batches(composite, batch_format="pyarrow"),
            "ckey", "one", out="rank0")

    def pick(t: pa.Table) -> pa.Table:
        r = t["rank0"].to_numpy(zero_copy_only=False)
        keep = pa.array(r % 100 == 0)
        return pa.table({"event_id": pc.filter(t["event_id"], keep),
                         "rank0": pc.filter(t["rank0"], keep)})

    return ranked.map_batches(pick, batch_format="pyarrow")


def q_adoption_lag(sf_dir: str):
    """Onboarding latency: per (user, event_type), microseconds from
    the user's FIRST event to their first event of that type — the
    two-level min (feature-adoption funnel; the first-touch row is lag
    0). Per-block (user, type) min partials, ONE user exchange, kernel
    re-min + per-user transform-min subtract."""
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"], "us": us}) \
            .group_by(["user_id", "event_type"], use_threads=False) \
            .aggregate([("us", "min")]) \
            .rename_columns(["user_id", "event_type", "mt"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "lag_us": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["mt"].min()
        m0 = g.groupby("user_id", sort=False)["mt"].transform("min")
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_type": g["event_type"],
            "lag_us": (g["mt"] - m0).astype("int64")})

    partials = ev.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_session_pairs(sf_dir: str):
    """Within-session event-type co-occurrence (market-basket over
    sessions): sessionize (30-min gap) makes the baskets, then
    stages/basket.pair_support counts distinct unordered type pairs
    per session — composition of two one-exchange stages plus the
    pair-count exchange. Types map to TYPE_BITS indices on both
    engines; baskets pack (user << 16 | session), guarded."""
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    from pypdfium2_ray.stages.sessionize import sessionize
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    with _hint(sf_dir, "events"):
        sess = sessionize(ev, gap_s=1800.0)

    names = pa.array(sorted(TYPE_BITS, key=TYPE_BITS.get))

    def widen(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        s = pc.cast(t["session_id"], pa.int64())
        if t.num_rows and (pc.max(s).as_py() >= 2 ** 16
                           or pc.max(u).as_py() >= 2 ** 46):
            raise ValueError("session basket key would overflow — "
                             "re-derive the shift widths")
        item = pc.index_in(t["event_type"], value_set=names)
        if t.num_rows and item.null_count:
            raise ValueError("unmapped event_type — extend TYPE_BITS")
        return pa.table({"basket": pc.add(pc.shift_left(u, 16), s),
                         "item": pc.cast(item, pa.int64())})

    with _hint(sf_dir, "events"):
        return pair_support(sess.map_batches(widen,
                                             batch_format="pyarrow"),
                            "basket", "item")


def q_type_jaccard(sf_dir: str):
    """Audience overlap between event types: for every type pair, the
    EXACT Jaccard numerator/denominator over user sets (n_inter,
    n_union) — computed from the per-user type BITMASK (one exchange,
    stages/agg.grouped_type_bitmask), then a single-block census of the
    32 possible masks and a driver-free pair fold: intersection(a,b) =
    sum of mask counts with both bits set. No pair self-join ever
    materializes user pairs."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_type_bitmask
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        masks = grouped_type_bitmask(ev, ["user_id"], "event_type",
                                     TYPE_BITS)

    def census(t: pa.Table) -> pa.Table:
        return pa.table({"type_mask": t["type_mask"]}) \
            .group_by(["type_mask"], use_threads=False) \
            .aggregate([([], "count_all")])

    names = sorted(TYPE_BITS, key=TYPE_BITS.get)

    def pairs(t: pa.Table) -> pa.Table:
        m = t["type_mask"].to_numpy(zero_copy_only=False)
        c = t["count_all"].to_numpy(zero_copy_only=False)
        ta, tb, ni, nu = [], [], [], []
        for a in range(len(names)):
            for b_ in range(a + 1, len(names)):
                both = int(c[(m >> a & 1).astype(bool)
                             & (m >> b_ & 1).astype(bool)].sum())
                either = int(c[((m >> a & 1) | (m >> b_ & 1))
                               .astype(bool)].sum())
                na, nb = names[a], names[b_]
                lo, hi = min(na, nb), max(na, nb)
                ta.append(lo)
                tb.append(hi)
                ni.append(both)
                nu.append(either)
        return pa.table({"type_a": pa.array(ta), "type_b": pa.array(tb),
                         "n_inter": pa.array(ni, pa.int64()),
                         "n_union": pa.array(nu, pa.int64())})

    return masks.map_batches(census, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(lambda t: t.group_by(["type_mask"],
                                          use_threads=False)
                     .aggregate([("count_all", "sum")])
                     .rename_columns(["type_mask", "count_all"]),
                     batch_size=None, batch_format="pyarrow") \
        .map_batches(pairs, batch_size=None, batch_format="pyarrow")


def q_early_ltv(sf_dir: str):
    """First-week LTV per user: value accumulated within 7 days of the
    user's FIRST event, the event count in that window, and the
    lifetime total — the cohort-quality signal every acquisition
    report wants. ONE exchange; kernel is a per-user transform-min +
    one masked Cython groupby-sum (no sort needed — min and sums are
    order-free)."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "us": us, "v": v})

    week_us = 7 * 86_400_000_000

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "week1_value_e4": pd.Series(dtype="int64"),
                "week1_events": pd.Series(dtype="int64"),
                "total_value_e4": pd.Series(dtype="int64")})
        m0 = df.groupby("user_id", sort=False)["us"].transform("min")
        early = (df["us"].to_numpy() - m0.to_numpy()) < week_us
        g = pd.DataFrame({
            "user_id": df["user_id"],
            "w1v": np.where(early, df["v"].to_numpy(), 0),
            "w1n": early.astype(np.int64),
            "tv": df["v"].to_numpy()})
        out = g.groupby("user_id", sort=False, as_index=False).sum()
        out.columns = ["user_id", "week1_value_e4", "week1_events",
                       "total_value_e4"]
        return out.astype("int64")

    partials = ev.map_batches(widen, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_max_gap_at(sf_dir: str):
    """Largest silence per user WITH provenance: the maximum
    inter-event gap, plus the event ids bounding it (earliest such gap
    on ties) — gap_stats tells you HOW quiet, this tells you WHEN, the
    data-hole debugging view. ONE exchange; lexsort + diff + a
    segment-argmax with first-occurrence tie-break (cummax boundary
    trick), no per-user Python. Single-event users emit nothing."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def kernel(df):
        import pandas as pd
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "max_gap_us": pd.Series(dtype="int64"),
            "gap_start_id": pd.Series(dtype="int64"),
            "gap_end_id": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb = k[order], us[order], tb[order]
        gap_ok = np.concatenate([[False], k[1:] == k[:-1]])
        gaps = np.where(gap_ok,
                        us - np.concatenate([[0], us[:-1]]), -1)
        if not gap_ok.any():
            return empty
        # segment argmax with earliest-gap tie-break: sort rows by
        # (key, -gap, tb) and take each key's first gap row
        gi = np.flatnonzero(gap_ok)
        gk, gg = k[gi], gaps[gi]
        # tie-break on gi (= (ts, event_id) position), matching the
        # twin's ORDER BY gap DESC, ts, event_id
        o2 = np.lexsort((gi, -gg, gk))
        gk, gg, gi2 = gk[o2], gg[o2], gi[o2]
        firsts = np.flatnonzero(
            np.concatenate([[True], gk[1:] != gk[:-1]]))
        sel = gi2[firsts]
        return pd.DataFrame({
            "user_id": gk[firsts].astype("int64"),
            "max_gap_us": gg[firsts].astype("int64"),
            "gap_start_id": tb[sel - 1].astype("int64"),
            "gap_end_id": tb[sel].astype("int64")})

    with _hint(sf_dir, "events"):
        return partition_map(ev, ["user_id"], kernel,
                             batch_format="pandas")


def q_ship_delay(sf_dir: str):
    """Fulfilment-latency report (pipelines/relational.ship_delay):
    per priority count/sum/min/max of ship-day minus order-day across
    lineitems — one repartition join + vectorized day diff +
    single-block enum combine."""
    from pypdfium2_ray.pipelines.relational import ship_delay
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(ship_delay(sf_dir), ["n_items"])


def q_first_session_size(sf_dir: str):
    """Novelty-effect report (stages/sessionize.first_session_size):
    per user, first-session size + session count + lifetime events —
    one exchange, run-length reads off the session geometry."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import first_session_size
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    with _hint(sf_dir, "events"):
        return first_session_size(ev)


def q_concurrency_curve(sf_dir: str):
    """Global session-concurrency sweep line: at every distinct session
    boundary timestamp, how many sessions opened, closed, and remain
    open — the capacity-planning curve, computed WITHOUT a global sort:
    sessionize kernel emits per-partition boundary partials, one
    t-keyed combine to distinct timestamps, then two range prefix
    scans (starts<=t, ends<=t) and n_open = their difference. The
    interval sibling of ks_distance's two-ECDF machinery."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    gap_us = 1800 * 1_000_000

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"t_us": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64"),
                                 "e": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us = k[order], us[order]
        new_sess = np.concatenate([[True], k[1:] != k[:-1]]) \
            | np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(k)) - 1
        b = pd.DataFrame({
            "t_us": np.concatenate([us[starts], us[ends]]),
            "s": np.concatenate([np.ones(len(starts), np.int64),
                                 np.zeros(len(ends), np.int64)]),
            "e": np.concatenate([np.zeros(len(starts), np.int64),
                                 np.ones(len(ends), np.int64)])})
        return b.groupby("t_us", sort=False, as_index=False).sum()

    with _hint(sf_dir, "events"):
        bounds = partition_map(ev, ["user_id"], kernel,
                               batch_format="pandas")
        per_t = grouped_aggregate(bounds, ["t_us"],
                                  {"n_start": ("s", "sum"),
                                   "n_end": ("e", "sum")})
        cum = ranged_prefix_sum(per_t, "t_us", "n_start",
                                out="cs_prev")
        cum = ranged_prefix_sum(cum, "t_us", "n_end", out="ce_prev")

    def finish(t: pa.Table) -> pa.Table:
        cs = pc.add(t["cs_prev"], pc.cast(t["n_start"], pa.int64()))
        ce = pc.add(t["ce_prev"], pc.cast(t["n_end"], pa.int64()))
        return pa.table({"t_us": pc.cast(t["t_us"], pa.int64()),
                         "n_start": pc.cast(t["n_start"], pa.int64()),
                         "n_end": pc.cast(t["n_end"], pa.int64()),
                         "n_open": pc.subtract(cs, ce)})

    return cum.map_batches(finish, batch_format="pyarrow")


def q_embedding_norms(sf_dir: str):
    """Exact per-label embedding energy: vector count + the int64 sum
    of squared fixed-point components (round(x*1000)²) per label — the
    norm-distribution health check for an embedding corpus, exact on
    both engines (a float norm would hash-diverge; DuckDB twins it
    with list_transform/list_sum lambdas). Per-block numpy
    offsets+reduceat over the Arrow list buffer, single-block enum
    combine — ZERO keyed exchanges."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["label", "embedding"])

    def widen(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        # HALF-AWAY-FROM-ZERO, matching SQL round(): np.rint rounds
        # half-to-even and arbitrary float32 components DO land on
        # exact halves (unlike the 2-decimal money columns elsewhere)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        sq = q * q
        cs = np.concatenate(([0], np.cumsum(sq)))
        per_row = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table({"label": pc.cast(t["label"], pa.int64()),
                         "ss": pa.array(per_row)})

    return grouped_aggregate(
        ds.map_batches(widen, batch_format="pyarrow"),
        ["label"], {"n_vecs": (None, "count"), "sum_sq_e6": ("ss", "sum")},
        combine="single_block")


def q_norm_hist(sf_dir: str):
    """Embedding energy spectrum: vector count per integer bucket of
    the fixed-point squared norm (sum_sq_e6 // 10^6) — the norm
    distribution that catches un-normalized slices and dead vectors
    before they skew cosine tiers (embedding_norms is the per-label
    sum; this is the shape). ZERO keyed exchanges: the
    q_embedding_norms offsets+reduceat kernel per block, one integer
    floor-div bucket, single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        sq = q * q
        cs = np.concatenate(([0], np.cumsum(sq)))
        per_row = cs[offs[1:]] - cs[offs[:-1]]
        bucket = per_row // 1_000_000
        g = pd.DataFrame({"norm_bucket": bucket}) \
            .groupby("norm_bucket", as_index=False).size() \
            .rename(columns={"size": "__n"})
        return pa.Table.from_pandas(g.astype({"__n": "int64"}),
                                    preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["norm_bucket"], {"n_vecs": ("__n", "sum")},
        combine="single_block")


def q_transition_probs(sf_dir: str):
    """Markov transition table WITH denominators: every adjacent
    (prev, next) pair count plus the prev-state row total, so
    P(next|prev) = n / n_prev stays an exact rational —
    transition_counts' one exchange + a row-total pass inside the same
    single final block (the pair space is enum-sized)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import transition_counts
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    with _hint(sf_dir, "events"):
        counts = transition_counts(ds)

    def add_totals(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        df["n_prev"] = df.groupby("prev_type")["n"].transform("sum")
        return pa.Table.from_pandas(
            df.astype({"n": "int64", "n_prev": "int64"}),
            preserve_index=False)

    return counts.map_batches(add_totals, batch_size=None,
                              batch_format="pyarrow")


def q_island_lengths(sf_dir: str):
    """Run-length spectrum of the event streams: how many runs of each
    length exist per event type (retry-storm / spam signature view) —
    stages/sessionize.event_islands' runs rolled up to a
    (type, run_len) histogram; one islands exchange + a single-block
    combine (the spectrum is small: lengths are bounded by the longest
    per-user run)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.sessionize import event_islands
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        isl = event_islands(ev)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "run_len": pc.cast(t["n_events"], pa.int64())})

    return grouped_aggregate(
        isl.map_batches(project, batch_format="pyarrow"),
        ["event_type", "run_len"], {"n_runs": (None, "count")},
        combine="single_block")


def q_taste_shift(sf_dir: str):
    """Preference drift: each user's modal event type in the corpus'
    first half vs second half (split at the global midpoint day from
    the parquet footer — no scan), ties to the alphabetically first
    type; users active in only one half emit nothing. ONE exchange;
    kernel is two Cython groupbys + a negated-count lexsort argmax per
    (user, half) + an index-aligned merge."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    stats = [meta.metadata.row_group(i).column(ts_idx).statistics
             for i in range(meta.metadata.num_row_groups)]
    day = 86_400_000_000
    lo = min(int(s.min.timestamp() * 1_000_000) for s in stats) // day
    hi = max(int(s.max.timestamp() * 1_000_000) for s in stats) // day
    mid = (lo + hi + 1) // 2
    ev = rd.read_parquet(path, columns=["user_id", "ts", "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "top_first": pd.Series(dtype="object"),
                "top_second": pd.Series(dtype="object")})
        d = df["ts"].to_numpy().astype("datetime64[us]") \
            .view("int64") // day
        g = pd.DataFrame({"user_id": df["user_id"],
                          "half": (d >= mid).astype(np.int64),
                          "event_type": df["event_type"]}) \
            .groupby(["user_id", "half", "event_type"], sort=False,
                     as_index=False).size()
        k = g["user_id"].to_numpy()
        h = g["half"].to_numpy()
        lab = g["event_type"].to_numpy()
        n = g["size"].to_numpy().astype(np.int64)
        order = np.lexsort((lab, -n, h, k))
        k, h, lab = k[order], h[order], lab[order]
        firsts = np.flatnonzero(np.concatenate(
            [[True], (k[1:] != k[:-1]) | (h[1:] != h[:-1])]))
        tk, th, tl = k[firsts], h[firsts], lab[firsts]
        a = pd.DataFrame({"user_id": tk[th == 0],
                          "top_first": tl[th == 0]})
        b = pd.DataFrame({"user_id": tk[th == 1],
                          "top_second": tl[th == 1]})
        out = a.merge(b, on="user_id", how="inner")
        return out.astype({"user_id": "int64"})

    with _hint(sf_dir, "events"):
        return partition_map(ev, ["user_id"], kernel,
                             batch_format="pandas")


def q_momentum_score(sf_dir: str):
    """Runs-test flavor per user: among consecutive pairs of value
    DELTAS in (ts, event_id) order, how many agree in sign (momentum)
    vs flip (mean-reversion); zero deltas void the pair (sign product
    0). Exact integer counts — the sequential-dependence smell test a
    float autocorrelation could not hash-gate. ONE exchange; kernel is
    one lexsort + two shifts + sign-product masks + a Cython
    groupby-sum."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "v": v})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_agree": pd.Series(dtype="int64"),
                "n_flip": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        v = df["v"].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, v = k[order], v[order]
        same = k[1:] == k[:-1]
        ds_ = np.sign(v[1:] - v[:-1])
        # consecutive delta pairs within a key: both diffs intra-key
        pair_ok = same[1:] & same[:-1]
        prod = ds_[1:] * ds_[:-1]
        g = pd.DataFrame({
            "user_id": k[2:][pair_ok],
            "n_agree": (prod[pair_ok] > 0).astype(np.int64),
            "n_flip": (prod[pair_ok] < 0).astype(np.int64)})
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_agree": pd.Series(dtype="int64"),
                "n_flip": pd.Series(dtype="int64")})
        out = g.groupby("user_id", sort=False, as_index=False).sum()
        return out.astype("int64")

    partials = ev.map_batches(prescale, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_session_handoff(sf_dir: str):
    """Cross-session transition matrix
    (stages/sessionize.session_handoff): for consecutive sessions of
    one user, count (last type of session i, first type of session
    i+1) — the re-engagement flow table. ONE exchange; session
    geometry read off run-length arrays, single-block enum-sized
    combine."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import session_handoff
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return session_handoff(ev)


def q_new_vs_returning(sf_dir: str):
    """Daily new-vs-returning actives
    (stages/sessionize.new_vs_returning): per day, distinct active
    users split into first-ever-day vs seen-before — the DAU growth
    strip. Per-block distinct (user, day) pre-combine, ONE exchange,
    single-block day combine (day cardinality grows with time range,
    not corpus)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import new_vs_returning
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return new_vs_returning(ev)


def q_last_touch(sf_dir: str):
    """Last-touch attribution for purchases
    (stages/sessionize.last_touch_attribution): each conversion
    annotated with the label of the event immediately before it in the
    SAME session ('(direct)' when the conversion opens the session) —
    the final-nudge mirror of first_touch. ONE exchange; shared session
    geometry + one gated label shift."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import last_touch_attribution
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return last_touch_attribution(ev, target="purchase")


def q_purchase_gaps(sf_dir: str):
    """Repeat-purchase cadence (stages/sessionize.gap_stats over the
    purchase-filtered stream): per user, count/min/max/sum of the
    microsecond gaps between CONSECUTIVE PURCHASES — the
    reorder-interval feature behind replenishment and churn models
    (user_gap_stats measures all-event cadence; this measures the
    wallet). Vectorized pre-exchange filter, then ONE user exchange;
    single-purchase users emit nothing on both engines."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        return t.filter(m).select(["user_id", "ts"])

    with _hint(sf_dir, "events"):
        return gap_stats(ds.map_batches(keep, batch_format="pyarrow"))


def q_customer_order_gaps(sf_dir: str):
    """Order-cadence stats per customer
    (stages/sessionize.gap_stats reused on the ORDERS table): gaps
    between consecutive order dates in integer microseconds — the
    relational sibling of the event-stream cadence ops, showing the
    window kernels are table-agnostic. ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    with _hint(sf_dir, "orders"):
        return gap_stats(ds, key_col="o_custkey", ts_col="o_orderdate")


def q_length_histogram(sf_dir: str):
    """Power-of-two document-length spectrum: per bit-length bucket
    (floor(log2 n_chars)), document count and min/max length — the
    corpus-shape fingerprint that catches truncation spikes and
    boilerplate walls before training. ZERO keyed exchanges: per-block
    Cython groupby partial over an exact integer bucket (np.frexp
    exponent — exact for int64 < 2^53, no float log), single-block
    enum-sized combine; the twin is length(bin(n))-1."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        n = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        n = n[n >= 1]
        bucket = (np.frexp(n.astype(np.float64))[1] - 1).astype(np.int64)
        g = pd.DataFrame({"bucket": bucket, "n": n.astype(np.int64)}) \
            .groupby("bucket", as_index=False)["n"] \
            .agg(__n="count", __min="min", __max="max")
        return pa.Table.from_pandas(g.astype({"__n": "int64"}),
                                    preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"n_docs": ("__n", "sum"),
                     "min_chars": ("__min", "min"),
                     "max_chars": ("__max", "max")},
        combine="single_block")


def q_dim_stats(sf_dir: str):
    """Per-dimension embedding profile: for each of the 64 vector
    dimensions, count / min / max / sum of the fixed-point
    (round(x*1000), half-away-from-zero) components across the corpus —
    the per-axis health check that catches dead dims, clipped dims and
    scale drift before training. Per-block kernel reshapes the Arrow
    list buffer to (n, dim) when offsets are uniform (pure column-wise
    numpy reductions) and falls back to a dim-indexed Cython groupby
    otherwise; ZERO keyed exchanges — the partial is 64 rows/block,
    combined in one enum-sized block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        # HALF-AWAY-FROM-ZERO to match SQL round() (np.rint is
        # half-to-even; see q_embedding_norms)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        lens = np.diff(offs)
        if len(lens) and (lens == lens[0]).all():
            m = q.reshape(len(lens), int(lens[0]))
            dim = np.arange(int(lens[0]), dtype=np.int64)
            out = pd.DataFrame({"dim": dim,
                                "__n": np.full(len(dim), len(lens),
                                               dtype=np.int64),
                                "__min": m.min(axis=0),
                                "__max": m.max(axis=0),
                                "__sum": m.sum(axis=0)})
        else:  # ragged lists: per-element dim index + Cython groupby
            dimidx = np.arange(len(q), dtype=np.int64) \
                - np.repeat(offs[:-1], lens)
            g = pd.DataFrame({"dim": dimidx, "q": q}) \
                .groupby("dim", as_index=False)["q"] \
                .agg(__n="count", __min="min", __max="max", __sum="sum")
            out = g.astype({"__n": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"], {"n": ("__n", "sum"), "min_e3": ("__min", "min"),
                  "max_e3": ("__max", "max"), "sum_e3": ("__sum", "sum")},
        combine="single_block")


def q_dim_gram(sf_dir: str):
    """Exact embedding Gram matrix (upper triangle): for every
    dimension pair i <= j, the int64 sum of fixed-point component
    products over the corpus — the covariance/PCA-prep statistic
    (whitening, dead-direction detection) computed without ever
    moving a vector. Per-block kernel is ONE integer matmul
    (Q^T @ Q over the reshaped Arrow list buffer); the partial is a
    fixed d*(d+1)/2 = 2080-row table per block, combined in one
    enum-sized single block — ZERO keyed exchanges. int64 holds
    |q|<=5000 corpora to ~3e11 rows; shard + widen beyond (documented,
    not silent). The SQL twin is the generate_subscripts self-join."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if not len(lens):
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int64())})
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("dim_gram requires fixed-dim vectors")
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)) \
            .astype(np.int64).reshape(len(lens), d)
        g = q.T @ q                       # exact int64 matmul
        iu, ju = np.triu_indices(d)
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "__s": pa.array(g[iu, ju])})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], {"sum_prod_e6": ("__s", "sum")},
        combine="single_block")


def q_brand_price_quartiles(sf_dir: str):
    """Exact per-brand DISCRETE retail-price quartiles
    (agg.grouped_order_stats reused verbatim on the PART table): the
    actual element at index q*(n-1)//4 under the (price, partkey)
    total order — pricing-ladder shape per brand, zero new kernel
    code (the order-stats kernel is table-agnostic). ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_order_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                         columns=["p_brand", "p_retailprice",
                                  "p_partkey"])
    with _hint(sf_dir, "part"):
        return grouped_order_stats(ds, ["p_brand"], "p_retailprice",
                                   tiebreak="p_partkey")


#: bracket_revenue's (brand, size range, quantity range) disjunction —
#: brand-disjoint, so a line matches at most one bracket
BRACKETS = (("Brand#1", 1, 15, 1, 15),
            ("Brand#2", 10, 30, 10, 25),
            ("Brand#3", 25, 50, 20, 35))


def q_bracket_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive bracket revenue: per (brand, size
    range, quantity range) bracket, item count and exact revenue
    sum(price_e2 * (100 - disc_e2)) over the lineitem x part join —
    the multi-predicate OR filter that defeats naive pushdown. ONE
    keyed exchange: quantity pre-filter (qty <= the max bracket bound)
    prunes the fact side BEFORE the repartition join onto part (part
    scales with data — never broadcast); the bracket test is one
    vectorized mask per bracket and the rollup is a single-block
    3-row combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join

    qmax = max(b[4] for b in BRACKETS)
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def rev_rows(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = qty <= qmax
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        d = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({
            "l_partkey": t["l_partkey"].combine_chunks()
            .filter(pa.array(keep)),
            "qty": pa.array(np.rint(qty[keep]).astype(np.int64)),
            "rev": pa.array(rev, pa.int64())})

    part = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    j = lookup_join(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        {"l_partkey": pa.int64(), "qty": pa.int64(), "rev": pa.int64()},
        part, source_key="p_partkey", key_col="l_partkey",
        payload_cols={"p_brand": pa.string(), "p_size": pa.int32()})

    def brackets(t: pa.Table) -> pa.Table:
        import numpy as np
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        bid = np.zeros(len(brand), np.int64)
        for n, (b, s0, s1, q0, q1) in enumerate(BRACKETS, start=1):
            m = (brand == b) & (size >= s0) & (size <= s1) \
                & (qty >= q0) & (qty <= q1)
            bid[m] = n           # brand-disjoint: at most one match
        keep = bid > 0
        return pa.table({"bracket": pa.array(bid[keep]),
                         "rev": pa.array(rev[keep])})

    return grouped_aggregate(
        j.map_batches(brackets, batch_format="pyarrow"),
        ["bracket"], {"n_items": (None, "count"),
                      "revenue_e4": ("rev", "sum")},
        combine="single_block")


def q_type_corr_parts(sf_dir: str):
    """Exact Pearson-correlation NUMERATORS between event types: for
    every type pair i <= j, the int64 sum over users of (user's total
    i-value_e4) x (user's total j-value_e4) — "do users who spend on i
    also spend on j", the feature-correlation matrix of the per-user
    type-spend vectors (the tabular sibling of dim_gram; consumers
    divide by the per-type moments for the full r). Absent types
    contribute zero products, so partitions only emit pairs of
    locally-present types and the combine stays exact.

    ONE user exchange; the kernel is one Cython (user, type) groupby
    then ONE integer matmul (M^T @ M over the pivoted partition
    matrix), emitting enum-sized pair partials folded in a single
    block. The twin is the dense user x type pivot self-join."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"], "v": v})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"type_i": pd.Series(dtype="object"),
                                 "type_j": pd.Series(dtype="object"),
                                 "__s": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["v"].sum()
        types = np.sort(g["event_type"].unique())
        tidx = pd.Index(types)
        m = np.zeros((g["user_id"].nunique(), len(types)), np.int64)
        uid = pd.factorize(g["user_id"].to_numpy())[0]
        m[uid, tidx.get_indexer(g["event_type"].to_numpy())] = \
            g["v"].to_numpy()
        gram = m.T @ m                   # exact int64 matmul
        iu, ju = np.triu_indices(len(types))
        return pd.DataFrame({"type_i": types[iu], "type_j": types[ju],
                             "__s": gram[iu, ju]})

    partials = ev.map_batches(prescale, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        per_part = partition_map(partials, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(per_part, ["type_i", "type_j"],
                             {"sum_xy_e8": ("__s", "sum")},
                             combine="single_block")


def q_running_peak(sf_dir: str):
    """Per-row high-watermark with record flags
    (stages/sessionize.running_peak): every event annotated with its
    user's running MAX value_e4 and whether it set a STRICT new peak —
    record-breaking detection, MAX OVER (ROWS UNBOUNDED PRECEDING)
    all-rows-out. ONE exchange; Cython groupby cummax (max has no
    run-offset decomposition like cumsum, but the transform is still
    per-partition vectorized)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_peak
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return running_peak(ev.map_batches(prescale,
                                           batch_format="pyarrow"))


def q_priority_median(sf_dir: str):
    """Exact median order value per priority
    (agg.grouped_median reused verbatim on the ORDERS table — the
    non-associative aggregate is table-agnostic too). Scale e3 so the
    even-group middle-two average (a half-cent, 3 decimals on 2-decimal
    money) lands on an exact integer and no rounding mode enters the
    hash gate. ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.agg import grouped_median
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    with _hint(sf_dir, "orders"):
        out = grouped_median(ds, ["o_orderpriority"], "o_totalprice",
                             out="median_price_e3")
    return _cast_i64(_scale_cols(out, {"median_price_e3": 1_000}), [])


def q_touches_to_convert(sf_dir: str):
    """Acquisition path length (stages/sessionize.touches_before_first):
    per converting user, events strictly before the FIRST purchase in
    (ts, event_id) order — funnel depth (time_to_convert measures the
    clock, this the effort). ONE exchange; lexsort + minimum.reduceat
    over target positions."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import touches_before_first
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return touches_before_first(ev, target="purchase")


def q_order_size_hist(sf_dir: str):
    """Order-size spectrum (the Q13 construction on the FACT side):
    how many orders have exactly k lineitems — the two-level aggregate
    whose first level is keyed on orderkey (per-block partial counts
    pre-combine, ONE exchange) and whose census level is single-block
    (k is bounded by order width, not corpus size)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_orderkey"])
    per_order = grouped_aggregate(line, ["l_orderkey"],
                                  {"n_lines": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_lines": t["n_lines"]})

    return grouped_aggregate(
        per_order.map_batches(census_rows, batch_format="pyarrow"),
        ["n_lines"], {"n_orders": (None, "count")},
        combine="single_block")


def q_discount_profile(sf_dir: str):
    """Discount-band revenue profile: per discount percent (0-10),
    item count, exact quantity sum and exact e4 revenue — the Q6
    what-if grid (which band carries the margin). ZERO keyed
    exchanges: integer bucket + Cython per-block partials over an
    11-row enum, single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_quantity", "l_extendedprice",
                                    "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        d = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        q = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        return pa.table({"disc_pct": pa.array(d),
                         "qty": pa.array(q),
                         "rev": pa.array(p * (100 - d))})

    return grouped_aggregate(
        line.map_batches(prep, batch_format="pyarrow"),
        ["disc_pct"], {"n_items": (None, "count"),
                       "sum_qty": ("qty", "sum"),
                       "revenue_e4": ("rev", "sum")},
        combine="single_block")


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 predicate-scan aggregate
    (pipelines/relational.forecast_revenue): per-block integer partials,
    one coalesce, ZERO keyed exchanges (pinned); 4 of 11 lineitem
    columns read."""
    from pypdfium2_ray.pipelines.relational import forecast_revenue
    with _hint(sf_dir, "lineitem"):
        return forecast_revenue(sf_dir)


def q_dense_topk(sf_dir: str):
    """Top-k WITH TIES per event_type — every event whose whole-dollar
    value is among the type's 3 highest distinct values, with its dense
    rank (stages/topk.grouped_dense_topk): per-block k-distinct-values
    partial + ONE exchange of the survivors; co-leaders all survive
    (leaderboard semantics row_number top-k cannot express)."""
    import ray.data as rd
    from pypdfium2_ray.stages.topk import grouped_dense_topk
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        # HALF-AWAY-FROM-ZERO to match DuckDB round(): whole-unit (e0)
        # rounding of 4-decimal values CAN land on exact halves (x.5000),
        # where pc.round's default half-to-even diverges (2.5 -> 2 vs 3)
        import numpy as np
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value_e0": pa.array(v, pa.int64())})

    with _hint(sf_dir, "events"):
        return grouped_dense_topk(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"], "value_e0", k=3)


def q_dedup_exact(sf_dir: str):
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow") \
           .select_columns(["doc_id", "fingerprint"])
    with _hint(sf_dir):
        return grouped_aggregate(ds, ["fingerprint"], {
            "keep_doc_id": ("doc_id", "min"),
            "n_dups": (None, "count")})


def q_extract_toc(sf_dir: str):
    """Per-document heading outline as rows
    (stages/extract.extract_toc — the batch form of the reference's
    get_toc traversal / toc CLI, document.py:520-559): (doc_id, level,
    title, page_index, n_children) in pre-order over the synthesized
    two-page corpus; error-injected payloads parse to an empty outline
    and emit nothing on both engines. ZERO exchanges, pure streaming
    map; the twin reconstructs the deterministic h1/h2 outline from the
    synthesis predicates."""
    from pypdfium2_ray.sources.cc_from_documents import \
        read_cc_from_documents
    from pypdfium2_ray.stages.extract import extract_toc
    with _hint(sf_dir):
        return extract_toc(read_cc_from_documents(sf_dir))


def _extract_toc_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (sql_is_bad,
                                                         sql_is_enc)
    return f"""
        WITH ok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
                    FROM documents
                    WHERE NOT {sql_is_bad()} AND NOT {sql_is_enc()})
        SELECT doc_id, CAST(0 AS BIGINT) AS level,
               'Doc ' || doc_id AS title,
               CAST(0 AS BIGINT) AS page_index,
               CAST(1 AS BIGINT) AS n_children
        FROM ok
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT), 'Appendix ' || doc_id,
               CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        FROM ok"""


def q_token_length_hist(sf_dir: str):
    """Vocabulary-shape spectrum: corpus-wide token count per token
    LENGTH — the tokenizer-budget fingerprint (length mass predicts
    BPE fertility; a drift toward very long tokens flags concatenation
    bugs or non-language spill). ZERO keyed exchanges and zero Python
    per row: pc.split_pattern -> flatten -> pc.utf8_length per block
    (all Arrow C++), one np.bincount, single-block enum combine.
    Empty tokens (doubled separators) are excluded on both engines."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        lens = pc.utf8_length(toks.flatten()).to_numpy(
            zero_copy_only=False)
        lens = lens[lens > 0]
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table({"token_len": pa.array(nz.astype(np.int64)),
                         "__n": pa.array(counts[nz].astype(np.int64))})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token_len"], {"n_tokens": ("__n", "sum")},
        combine="single_block")


def q_gap_hist(sf_dir: str):
    """Corpus-wide inter-arrival spectrum: count of per-user
    consecutive-event gaps per HOUR bucket — the cadence distribution
    behind session-gap threshold tuning (where does the 30-min cut sit
    relative to the mass?). ONE user exchange (gaps need the key's
    events colocated); the kernel emits per-partition PARTIAL bucket
    counts (lexsort + diff + boundary mask + bincount), folded in a
    single block — bucket cardinality grows with the time range, not
    the corpus."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    hour_us = 3_600_000_000
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"gap_hours": pd.Series(dtype="int64"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((us, k))
        k, us = k[order], us[order]
        same = k[1:] == k[:-1]
        bucket = (np.diff(us)[same] // hour_us)
        counts = np.bincount(bucket)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"gap_hours": nz.astype("int64"),
                             "__n": counts[nz].astype("int64")})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["gap_hours"],
                             {"n_gaps": ("__n", "sum")},
                             combine="single_block")


def q_ab_split_metrics(sf_dir: str):
    """A/B experiment readout on a deterministic hash split: users are
    assigned to arm md5(user_id) % 2 (stable across runs, cluster
    sizes and shard layouts — the hash_sample discipline, so a user
    can never switch arms between reruns), then per (arm, event_type)
    the exact event count and e4 value sum — the experimentation
    primitive every growth pipeline needs BEFORE any stats test. ZERO
    keyed exchanges: arm assignment + enum-cell Cython partials per
    block, single-block combine. The per-value md5 loop is inherent to
    the hash (hash_sample note); arms hash the user id, not the row."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        uids = t["user_id"].to_pylist()
        # memoize within the block: ids repeat ~events-per-user times
        cache: dict = {}
        arm = np.fromiter(
            (cache.setdefault(u, md5_hash64(str(u).encode()) % 2)
             for u in uids), np.int64, len(uids))
        v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                    * 10_000.0).astype(np.int64)
        g = pd.DataFrame({
            "arm": arm,
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "__n": np.ones(len(v), np.int64), "__v": v}) \
            .groupby(["arm", "event_type"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["arm", "event_type"],
        {"n_events": ("__n", "sum"), "sum_value_e4": ("__v", "sum")},
        combine="single_block")


def q_order_status_matrix(sf_dir: str):
    """Order lifecycle cross-tab: per (status, priority) cell, order
    count and exact e2 total-price sum — the ops dashboard's backlog
    grid (which priorities are stuck in which status). ZERO keyed
    exchanges: the cell space is enum x enum, so per-block Cython
    partials fold in one block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        g = pd.DataFrame({
            "o_orderstatus": t["o_orderstatus"].to_numpy(
                zero_copy_only=False),
            "o_orderpriority": t["o_orderpriority"].to_numpy(
                zero_copy_only=False),
            "__n": np.ones(len(cents), np.int64), "__s": cents}) \
            .groupby(["o_orderstatus", "o_orderpriority"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("__n", "sum"), "total_price_e2": ("__s", "sum")},
        combine="single_block")


def q_bookend_types(sf_dir: str):
    """Lifetime bookend matrix: per (first type ever, last type ever)
    pair, how many users — the entry-vs-exit view at account
    granularity (session_handoff is the per-boundary view; this is one
    cell per user lifetime). ONE user exchange; the kernel reads both
    bookends off the (user, ts, event_id) lexsort run geometry and
    folds an enum^2 census per partition, combined in a single
    block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"first_type": pd.Series(dtype="object"),
                                 "last_type": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, lab = k[order], lab[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.append(starts[1:], len(k)) - 1
        g = pd.DataFrame({"first_type": lab[starts],
                          "last_type": lab[ends]})
        out = g.groupby(["first_type", "last_type"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["first_type", "last_type"],
                             {"n_users": ("__n", "sum")},
                             combine="single_block")


def q_type_dow_profile(sf_dir: str):
    """Type x day-of-week activity grid with exact value mass — which
    behaviors are weekday vs weekend (time_profile is the dow x hour
    grid; this adds the TYPE dimension and keeps the value sums). ZERO
    keyed exchanges: enum x 7 cells, per-block Cython partials,
    single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 3) % 7
        v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                    * 10_000.0).astype(np.int64)
        g = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "dow": dow.astype(np.int64),
            "__n": np.ones(len(v), np.int64), "__v": v}) \
            .groupby(["event_type", "dow"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "dow"],
        {"n_events": ("__n", "sum"), "sum_value_e4": ("__v", "sum")},
        combine="single_block")


def q_brand_return_rate(sf_dir: str):
    """Return-rate report by brand: per p_brand, item count, returned
    item count (l_returnflag = 'R') and the exact e4 revenue on each
    side — the merchandising quality table (which brands come back).
    TWO keyed exchanges, the promo_revenue shape with the conditional
    on the FACT side: per-partkey partials carry (n, n_ret, rev,
    rev_ret) so the exchange moves four ints per (block, partkey), then
    one repartition join onto part (a scaling dimension — never
    broadcast) and a single-block brand combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_partkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        ret = (t["l_returnflag"].to_numpy(zero_copy_only=False)
               == "R").astype(np.int64)
        g = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "__n": np.ones(len(rev), np.int64), "__r": ret,
            "__rev": rev, "__rrev": rev * ret}) \
            .groupby("l_partkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"], {"__n": ("__n", "sum"), "__r": ("__r", "sum"),
                        "__rev": ("__rev", "sum"),
                        "__rrev": ("__rrev", "sum")})
    part = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    j = lookup_join(
        per_part, {"l_partkey": pa.int64(), "__n": pa.int64(),
                   "__r": pa.int64(), "__rev": pa.int64(),
                   "__rrev": pa.int64()},
        part, source_key="p_partkey", key_col="l_partkey",
        payload_cols={"p_brand": pa.string()})
    return grouped_aggregate(
        j, ["p_brand"],
        {"n_items": ("__n", "sum"), "n_returned": ("__r", "sum"),
         "revenue_e4": ("__rev", "sum"),
         "returned_revenue_e4": ("__rrev", "sum")},
        combine="single_block")


def q_user_activity_hist(sf_dir: str):
    """User-activity distribution: how many users produced exactly k
    events — the engagement-depth histogram behind bot cuts and cohort
    weighting (the Q13 two-level construction on the EVENTS table).
    Per-block per-user partial counts pre-combine, ONE exchange, then
    a single-block k census (k bounded by per-user activity, not
    corpus size)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id"])
    per_user = grouped_aggregate(ev, ["user_id"],
                                 {"n_events": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_events": t["n_events"]})

    return grouped_aggregate(
        per_user.map_batches(census_rows, batch_format="pyarrow"),
        ["n_events"], {"n_users": (None, "count")},
        combine="single_block")


def q_idle_users(sf_dir: str):
    """Churn-risk recency list: every user with their last active day
    and idle_days relative to the CORPUS max day — the dormancy
    ranking feeding re-engagement campaigns. The global max day comes
    from PARQUET FOOTER STATS (no extra scan — the taste_shift trick);
    the per-user max rides ONE pre-combined exchange and the subtract
    is a transform pass."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    stats = [meta.metadata.row_group(i).column(ts_idx).statistics
             for i in range(meta.metadata.num_row_groups)]
    day = 86_400_000_000
    mx = max(int(s.max.timestamp() * 1_000_000) for s in stats) // day
    ev = rd.read_parquet(path, columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.divide(us, day)})

    with _hint(sf_dir, "events"):
        lasts = grouped_aggregate(
            ev.map_batches(to_day, batch_format="pyarrow"),
            ["user_id"], {"last_day": ("day", "max")})

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "idle_days", pc.subtract(pa.scalar(mx, pa.int64()),
                                     t["last_day"]))

    return lasts.map_batches(finish, batch_format="pyarrow")


def q_type_trigrams(sf_dir: str):
    """Third-order sequence census: every adjacent (t1, t2, t3)
    event-type TRIPLE across all user streams in (ts, event_id) order —
    the next-action-model context table one order above
    transition_counts (the pair space is |labels|^2; this is
    |labels|^3, still enum-sized at any corpus scale). ONE user
    exchange; the kernel is one lexsort + two shifted masks + a single
    Cython groupby over the triple — partials fold in one block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"t1": pd.Series(dtype="object"),
                                 "t2": pd.Series(dtype="object"),
                                 "t3": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, lab = k[order], lab[order]
        same = k[1:] == k[:-1]
        ok = same[1:] & same[:-1]
        g = pd.DataFrame({"t1": lab[:-2][ok], "t2": lab[1:-1][ok],
                          "t3": lab[2:][ok]})
        out = g.groupby(["t1", "t2", "t3"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["t1", "t2", "t3"],
                             {"n": ("__n", "sum")},
                             combine="single_block")


def q_type_cadence(sf_dir: str):
    """Per-TYPE cadence report: over every user's same-type consecutive
    event gaps, the per-type count/min/max/sum in integer microseconds —
    "how often do users view vs purchase vs error", the enum-level
    rollup of the per-user gap family (user_gap_stats is per user over
    all types; purchase_gaps is one type per user; this is every type
    across users). ONE user exchange; the kernel lexsorts (user, type,
    ts), masks (user, type) run boundaries, and folds gaps per type
    with one Cython groupby — partials are enum-sized, combined in a
    single block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64"),
                                 "__min": pd.Series(dtype="int64"),
                                 "__max": pd.Series(dtype="int64"),
                                 "__sum": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((us, lab, k))
        k, lab, us = k[order], lab[order], us[order]
        same = (k[1:] == k[:-1]) & (lab[1:] == lab[:-1])
        g = pd.DataFrame({"event_type": lab[1:][same],
                          "gap": np.diff(us)[same]})
        agg = g.groupby("event_type", sort=False, as_index=False)["gap"] \
            .agg(__n="count", __min="min", __max="max", __sum="sum")
        return agg.astype({c: "int64" for c in
                           ("__n", "__min", "__max", "__sum")})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["event_type"],
                             {"n_gaps": ("__n", "sum"),
                              "min_gap_us": ("__min", "min"),
                              "max_gap_us": ("__max", "max"),
                              "sum_gap_us": ("__sum", "sum")},
                             combine="single_block")


def q_entry_conversion(sf_dir: str):
    """Per-entry-label conversion report
    (stages/sessionize.entry_conversion): sessions vs
    purchase-containing sessions per session ENTRY label — "which
    landing flows convert", the conversion sibling of bounce_rate
    (same fused ONE-exchange shape; the rate is the consumer's
    division of two exact ints)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import entry_conversion
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return entry_conversion(ev, target="purchase")


def q_source_top_tokens(sf_dir: str, k: int = 5):
    """Per-source top-k tokens by exact count (ties broken
    alphabetically) — the per-slice vocabulary skim that catches
    boilerplate and template drift one source at a time (heavy_bigrams
    is the global view). ONE exchange, keyed on SOURCE only: per-block
    (source, token) pre-combine (Arrow split/flatten + one Cython
    groupby — the shuffle moves census rows, not text), then the
    per-partition kernel folds counts and takes head(k) per source in
    one vectorized sort."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        rep = np.repeat(src, np.diff(offs))
        g = pd.DataFrame({"source": rep, "token": flat}) \
            .groupby(["source", "token"], sort=False, as_index=False) \
            .size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g.astype({"cnt": "int64"}),
                                    preserve_index=False)

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "token": pd.Series(dtype="object"),
                                 "cnt": pd.Series(dtype="int64")})
        g = df.groupby(["source", "token"], sort=False,
                       as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "token"], ascending=[False, True],
                          kind="mergesort")
        out = g.groupby("source", sort=False).head(k)
        return out.astype({"cnt": "int64"}).reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir):
        return partition_map(partials, ["source"], kernel,
                             batch_format="pandas")


def q_dedup_keep_best(sf_dir: str):
    """Quality-keep exact dedup: per md5-fingerprint cluster, keep the
    doc with the MOST characters (ties to the lowest id) instead of
    dedup_exact's min-id policy — the curation variant that preserves
    the best copy when near-identical pages differ by truncation.
    ONE fingerprint exchange; the kernel is one lexsort on
    (fingerprint, -n_chars, doc_id) + a boundary-mask first-row gather
    — no per-group Python."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        t = add_fingerprint(t)
        return pa.table({
            "fingerprint": t["fingerprint"],
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "fingerprint": pd.Series(dtype="object"),
                "keep_doc_id": pd.Series(dtype="int64"),
                "keep_chars": pd.Series(dtype="int64"),
                "n_dups": pd.Series(dtype="int64")})
        fp = df["fingerprint"].to_numpy()
        did = df["doc_id"].to_numpy()
        nc = df["n_chars"].to_numpy()
        order = np.lexsort((did, -nc, fp))
        fp, did, nc = fp[order], did[order], nc[order]
        starts = np.flatnonzero(
            np.concatenate([[True], fp[1:] != fp[:-1]]))
        sizes = np.diff(np.append(starts, len(fp)))
        return pd.DataFrame({"fingerprint": fp[starts],
                             "keep_doc_id": did[starts].astype("int64"),
                             "keep_chars": nc[starts].astype("int64"),
                             "n_dups": sizes.astype("int64")})

    with _hint(sf_dir):
        return partition_map(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["fingerprint"], kernel, batch_format="pandas")


def q_dup_size_hist(sf_dir: str):
    """Dedup-cluster-size spectrum: how many exact-duplicate clusters
    have exactly k members — the dedup IMPACT report (k=1 mass is the
    unique tail; the k>=2 masses say how much a dedup pass will delete)
    read off the same md5-fingerprint groups as dedup_exact. ONE
    fingerprint exchange (per-block pre-combined), then the k census is
    single-block (k is bounded by duplication depth, not corpus
    size)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow") \
           .select_columns(["fingerprint"])
    with _hint(sf_dir):
        clusters = grouped_aggregate(ds, ["fingerprint"],
                                     {"cluster_size": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"cluster_size": t["cluster_size"]})

    return grouped_aggregate(
        clusters.map_batches(census_rows, batch_format="pyarrow"),
        ["cluster_size"], {"n_clusters": (None, "count")},
        combine="single_block")


def q_char_census(sf_dir: str):
    """Corpus byte-frequency fingerprint: count per byte value over
    every document's UTF-8 text — the encoding-drift / charset-anomaly
    detector (a new crawl slice with mojibake or binary spill shifts
    this distribution before any parser notices). ZERO keyed
    exchanges: the per-block kernel is ONE np.bincount over the Arrow
    string data buffer (np.frombuffer — the text bytes are never
    copied or iterated), partials are <=256-row enums folded in a
    single block. Byte == codepoint on this ASCII corpus (the twin's
    ord(); for non-ASCII corpora the engine stays byte-grain — the
    right grain for drift detection — while ord() is codepoint-grain;
    documented divergence)."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks()
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], odt)[
            arr.offset:arr.offset + len(arr) + 1]
        if not len(offs) or offs[-1] == offs[0]:
            return pa.table({"byte": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64())})
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        counts = np.bincount(data[offs[0]:offs[-1]], minlength=256)
        nz = np.flatnonzero(counts)
        return pa.table({"byte": pa.array(nz.astype(np.int64)),
                         "__n": pa.array(counts[nz].astype(np.int64))})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["byte"], {"n_chars": ("__n", "sum")},
        combine="single_block")


def q_dedup_latest_event(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import latest_event_per_user
    with _hint(sf_dir, "events"):
        return latest_event_per_user(sf_dir)


def _rem(t: pa.Table, mod: int) -> pa.Array:
    did = pc.cast(t["doc_id"], pa.int64())
    return pc.subtract(did, pc.multiply(pc.divide(did, mod), mod))


def q_normalize_text(sf_dir: str):
    """Unicode normalization pass (functions/text.normalize_text: curly
    quotes/dashes/ellipsis/NBSP folds, control strip, ws collapse, trim)
    — every row exercises the folds via deterministic planted decorations
    (curly quotes + ellipsis around the text, identical expression on the
    SQL side); one streaming vectorized map, RE2 sources shared verbatim
    with the oracle."""
    from pypdfium2_ray.functions.text import normalize_text

    def f(t: pa.Table) -> pa.Table:
        decorated = pc.binary_join_element_wise(
            "“", t["text"], "”… — ok", "")
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "norm_text": normalize_text(decorated)})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def q_snapshot_delta(sf_dir: str):
    """Two crawl snapshots of the same url space derived deterministically
    from documents (old: doc_id%3!=0; new: doc_id%2!=0 with the text of
    every doc_id%5==0 row edited) -> per-url delta class via ONE url
    exchange (stages/snapshot.snapshot_delta). FULL OUTER JOIN oracle."""
    from pypdfium2_ray.functions.text import fingerprint_md5
    from pypdfium2_ray.stages.snapshot import snapshot_delta
    base = _docs(sf_dir, ["doc_id", "text", "source"])

    def fp_snapshot(keep_mod: int, edit: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(_rem(t, keep_mod), 0))
            txt = t["text"]
            if edit:
                txt = pc.if_else(
                    pc.equal(_rem(t, 5), 0),
                    pc.binary_join_element_wise(txt, " v2", ""), txt)
            url = pc.binary_join_element_wise(
                "doc://", t["source"], "/",
                pc.cast(t["doc_id"], pa.string()), "")
            return pa.table({"url": url,
                             "fingerprint": fingerprint_md5(txt)})
        return f

    old = base.map_batches(fp_snapshot(3, False), batch_format="pyarrow")
    new = base.map_batches(fp_snapshot(2, True), batch_format="pyarrow")
    with _hint(sf_dir):
        return snapshot_delta(old, new)


def q_incremental_dedup(sf_dir: str):
    """Incremental crawl dedup: snapshot B (doc_id%4>=1, plus a planted
    copy of every %4==2 row under a shifted id) deduped against the
    fingerprint STATE of already-processed snapshot A (doc_id%4<=1) —
    drop-seen and in-snapshot keep-min-id fused into ONE fingerprint
    exchange (stages/snapshot.incremental_dedup); state keys only ever
    move. NOT-IN + GROUP BY oracle."""
    from pypdfium2_ray.functions.text import fingerprint_md5
    from pypdfium2_ray.stages.snapshot import incremental_dedup
    base = _docs(sf_dir, ["doc_id", "text"])

    def proj(lo: int, hi: int, shift: int = 0):
        def f(t: pa.Table) -> pa.Table:
            rem = _rem(t, 4)
            t = t.filter(pc.and_(pc.greater_equal(rem, lo),
                                 pc.less_equal(rem, hi)))
            did = pc.add(pc.cast(t["doc_id"], pa.int64()), shift)
            return pa.table({"doc_id": did,
                             "fingerprint": fingerprint_md5(t["text"])})
        return f

    state = base.map_batches(proj(0, 1), batch_format="pyarrow") \
                .select_columns(["fingerprint"])
    b_main = base.map_batches(proj(1, 3), batch_format="pyarrow")
    b_copy = base.map_batches(proj(2, 2, 100_000_000),
                              batch_format="pyarrow")
    with _hint(sf_dir):
        out = incremental_dedup(b_main.union(b_copy), state,
                                order_col="doc_id")
    return _cast_i64(out, ["doc_id", "n_dups"])


#: minhash query params — shared with the oracle SQL generator below.
#: threshold 0.5 sits in a wide empirical gap of the corpus's pair-Jaccard
#: distribution (background <= 0.31, planted near-dups >= 0.93 at sf0.01),
#: so LSH recall at the threshold is 1.0 with huge margin: a J=0.93 pair
#: misses all 16 bands (8 rows each) w.p. (1 - 0.93^8)^16 ~ 3e-6.
MINHASH = dict(threshold=0.5, shingle_k=5, num_perm=128, bands=16)

#: shared CTE chain computing the exact all-pairs shingle overlap (the
#: minhash oracle and the two cluster oracles build on the same pair set)
_MINHASH_CTES = f"""norm AS (
              SELECT doc_id,
                     trim(regexp_replace(text, '[ \\t\\r\\n\\f\\v]+', ' ', 'g'),
                          ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id, CASE
                WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                WHEN length(t) < {MINHASH["shingle_k"]} THEN [t]
                ELSE list_distinct([substr(t, i, {MINHASH["shingle_k"]})
                       for i in range(1, length(t) - {MINHASH["shingle_k"]} + 2)])
              END AS s FROM norm),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               AND least(len(a.s), len(b.s))
                   >= {MINHASH["threshold"]} * greatest(len(a.s), len(b.s))),
            sim AS (
              SELECT id_a, id_b,
                     len(list_intersect(sa, sb))::BIGINT AS n_inter,
                     (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
                       AS n_union
              FROM cand)"""
_MINHASH_COND = (f"n_union = 0 OR n_inter / n_union "
                 f">= {MINHASH['threshold']}")


def q_minhash_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs, verified to EXACT integer
    (n_inter, n_union) shingle overlap via repartition joins — matches the
    all-pairs exact-Jaccard SQL oracle (no driver-side corpus read, no
    text broadcast)."""
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return minhash_dup_pairs(ds, **MINHASH)


def q_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs. bands=4 pigeonhole banding makes recall at
    max_dist=3 EXACT by construction, and the md5-based fingerprint is
    SQL-expressible — the all-pairs Hamming oracle is a true oracle."""
    from pypdfium2_ray.stages.dedup import simhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return simhash_dup_pairs(ds, ngram_n=3, bands=4, max_dist=3)


def q_cocitation(sf_dir: str):
    """Co-citation 'related pages' pairs (stages/triangles
    .cocitation_counts — Dean & Henzinger WWW'99): page pairs linked by
    >= 2 distinct sources over the synthetic graph; one src exchange for
    distinct-target pair generation (out-degree-quadratic, loud max_out
    cap), one packed-key exchange for the counts."""
    from pypdfium2_ray.stages.triangles import cocitation_counts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        return cocitation_counts(edges, min_count=2)


def _cocitation_sql() -> str:
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)
          FROM nodes),
        de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
                            WHERE src <> dst)
        SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS n_common
        FROM de a JOIN de b ON a.src = b.src AND a.dst < b.dst
        GROUP BY a.dst, b.dst HAVING count(*) >= 2"""


#: deterministic walk corpus: 2 walks per node, 4 steps
WALKS_PER_NODE = 2
WALK_LEN = 4


def q_graph_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk corpus on the BSP engine
    (stages/bsp.walks_bsp): the next edge at step s of walk w from node
    u is md5_64(f\"{w}|{s}|{u}\") % outdeg(u) — run/shard/cluster-
    invariant training sequences with an exact md5_number_upper SQL
    twin. One actor round per step (frontier rows live on their current
    node's worker, whose sorted out-edges are local) instead of two
    ids-only joins; identical corpus to stages/walks.graph_walks
    (pinned in tests)."""
    from pypdfium2_ray.stages.bsp import walks_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    return walks_bsp(edges, nodes, walks_per_node=WALKS_PER_NODE,
                     length=WALK_LEN)


def _graph_walks_sql() -> str:
    """Per-step CTE: join the previous positions onto row_number-ranked
    edges where the rank equals the md5 choice (both sides UBIGINT, the
    full-range modulo the engine computes in exact python ints)."""
    T, L = WALKS_PER_NODE, WALK_LEN
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        "ie AS MATERIALIZED (SELECT src, dst,"
        " row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,"
        " count(*) OVER (PARTITION BY src) AS outdeg FROM edges)",
        f"w0 AS (SELECT node * {T} + t AS walk_id, node FROM nodes,"
        f" unnest(generate_series(0, {T - 1})) AS u(t))",
    ]
    for s in range(L):
        ctes.append(
            f"w{s + 1} AS MATERIALIZED (SELECT w.walk_id, e.dst AS node "
            f"FROM w{s} w JOIN ie e ON e.src = w.node "
            f"AND CAST(e.r AS UBIGINT) = md5_number_upper("
            f"w.walk_id::VARCHAR || '|{s}|' || w.node::VARCHAR) "
            f"% CAST(e.outdeg AS UBIGINT))")
    parts = [f"SELECT walk_id, CAST({p} AS BIGINT) AS pos, node FROM w{p}"
             for p in range(L + 1)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(parts)


#: content-defined chunking: 16-char gear window, 6 mask bits (expected
#: 64-char chunks) — small enough that the sf corpora share real chunks
CDC_WINDOW = 16
CDC_MASK_BITS = 6


def q_shared_chunks(sf_dir: str):
    """Cross-document shared chunks via content-defined chunking
    (stages/cdc — FastCDC-lineage windowed gear hash over code points):
    boundaries cut where the W-char gear sum hits the mask, chunk md5s
    pre-combined (occurrences + distinct docs) per block, ONE hash
    exchange on chunk_md5. The mask test commutes with uint64 wraparound
    (2^mask_bits | 2^64), so the HUGEINT SQL twin is exact."""
    from pypdfium2_ray.stages.cdc import shared_chunks
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return shared_chunks(ds, window=CDC_WINDOW, mask_bits=CDC_MASK_BITS)


def _shared_chunks_sql() -> str:
    """Per-position windowed gear sum as a W-wide self-join (weight
    2^(distance), summed in HUGEINT — the 48-bit gear keeps each shifted
    term within BIGINT for ``<<``), boundary rows -> lag() spans + the
    per-doc tail, chunk md5 + rollup. Short docs (< W chars) fall out of
    the tail branch as their single full-length chunk."""
    w, mask = CDC_WINDOW, (1 << CDC_MASK_BITS)
    return f"""
        WITH ch AS (SELECT doc_id, text FROM documents
                    WHERE text IS NOT NULL AND length(text) > 0),
        pos AS (SELECT doc_id, i, unicode(substr(text, i, 1)) AS cp
                FROM ch, unnest(generate_series(1, length(text))) AS t(i)),
        g AS (SELECT doc_id, i,
                     CAST(md5_number_upper(cp::VARCHAR) >> 16 AS BIGINT)
                       AS gv FROM pos),
        h AS (SELECT a.doc_id, a.i,
                     sum(CAST(b.gv << (a.i - b.i) AS HUGEINT)) AS hsum
              FROM g a JOIN g b ON b.doc_id = a.doc_id
                   AND b.i BETWEEN a.i - {w - 1} AND a.i
              WHERE a.i >= {w}
              GROUP BY a.doc_id, a.i),
        bnd AS (SELECT doc_id, i FROM h WHERE hsum % {mask} = 0),
        spans AS (
          SELECT doc_id,
                 COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                          0) + 1 AS s,
                 i AS e
          FROM bnd
          UNION ALL
          SELECT c.doc_id, COALESCE(mx.m, 0) + 1, length(c.text)
          FROM ch c LEFT JOIN (SELECT doc_id, max(i) AS m FROM bnd
                               GROUP BY doc_id) mx USING (doc_id)
          WHERE length(c.text) > COALESCE(mx.m, 0)),
        chunks AS (SELECT sp.doc_id,
                          md5(substr(c.text, sp.s, sp.e - sp.s + 1))
                            AS chunk_md5
                   FROM spans sp JOIN ch c USING (doc_id))
        SELECT chunk_md5, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY chunk_md5 HAVING count(*) >= 2"""


#: template threshold: a chunk is per-source boilerplate when it appears
#: in >= 1/5 of the source's chunk-producing docs (and >= 2 of them)
TPL_FRAC = (1, 5)


def q_template_chunks(sf_dir: str):
    """Per-source template (boilerplate) chunks (stages/cdc
    .template_chunks): CDC chunk contents present in >= 20% of a
    source's docs — the nav-bar/footer detector. Numerators AND the
    per-source denominators both derive from ONE chunk-row scan (the
    denominator rides the exchange as ``chunk_md5=''`` sentinel rows),
    so the whole rollup is one pass + ONE hash exchange on source.
    Threshold compared in exact integers: n_docs*5 >= src_docs."""
    from pypdfium2_ray.stages.cdc import template_chunks
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    with _hint(sf_dir):
        return template_chunks(ds, group_col="source", window=CDC_WINDOW,
                               mask_bits=CDC_MASK_BITS,
                               frac_num=TPL_FRAC[0], frac_den=TPL_FRAC[1])


def _template_chunks_sql() -> str:
    """Same chunker CTEs as _shared_chunks_sql (source carried through),
    plus a per-source chunk-producing-doc total and the integer-exact
    20% threshold."""
    w, mask = CDC_WINDOW, (1 << CDC_MASK_BITS)
    num, den = TPL_FRAC
    return f"""
        WITH ch AS (SELECT doc_id, text, source FROM documents
                    WHERE text IS NOT NULL AND length(text) > 0),
        pos AS (SELECT doc_id, i, unicode(substr(text, i, 1)) AS cp
                FROM ch, unnest(generate_series(1, length(text))) AS t(i)),
        g AS (SELECT doc_id, i,
                     CAST(md5_number_upper(cp::VARCHAR) >> 16 AS BIGINT)
                       AS gv FROM pos),
        h AS (SELECT a.doc_id, a.i,
                     sum(CAST(b.gv << (a.i - b.i) AS HUGEINT)) AS hsum
              FROM g a JOIN g b ON b.doc_id = a.doc_id
                   AND b.i BETWEEN a.i - {w - 1} AND a.i
              WHERE a.i >= {w}
              GROUP BY a.doc_id, a.i),
        bnd AS (SELECT doc_id, i FROM h WHERE hsum % {mask} = 0),
        spans AS (
          SELECT doc_id,
                 COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                          0) + 1 AS s,
                 i AS e
          FROM bnd
          UNION ALL
          SELECT c.doc_id, COALESCE(mx.m, 0) + 1, length(c.text)
          FROM ch c LEFT JOIN (SELECT doc_id, max(i) AS m FROM bnd
                               GROUP BY doc_id) mx USING (doc_id)
          WHERE length(c.text) > COALESCE(mx.m, 0)),
        chunks AS (SELECT sp.doc_id, c.source,
                          md5(substr(c.text, sp.s, sp.e - sp.s + 1))
                            AS chunk_md5
                   FROM spans sp JOIN ch c USING (doc_id)),
        tot AS (SELECT source, count(*) AS src_docs FROM ch
                GROUP BY source),
        agg AS (SELECT source, chunk_md5,
                       count(DISTINCT doc_id) AS n_docs
                FROM chunks GROUP BY source, chunk_md5)
        SELECT a.source, a.chunk_md5, a.n_docs::BIGINT AS n_docs,
               t.src_docs::BIGINT AS src_docs
        FROM agg a JOIN tot t USING (source)
        WHERE a.n_docs * {den} >= t.src_docs * {num}
          AND a.n_docs >= 2"""


def _decorate_boilerplate(t):
    """Plant deterministic per-source boilerplate lines around each doc
    (the normalize_text planting pattern — the synthetic corpus is
    single-line, so the template structure is SQL-composed identically
    on both sides): a nav header + copyright footer on EVERY doc (100%),
    a promo line on doc_id%3==0 (33% >= 20% threshold: stripped), a rare
    notice on doc_id%50==0 (2% < 20%: kept)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    t = t.filter(pc.is_valid(t["text"]))
    did = pc.cast(t["doc_id"], pa.int64()).combine_chunks()
    src = pc.cast(t["source"], pa.string()).combine_chunks()
    d = did.to_numpy(zero_copy_only=False)
    cat = (lambda *parts: pc.binary_join_element_wise(*parts, ""))
    promo = pc.if_else(pa.array(d % 3 == 0),
                       cat("subscribe to ", src, " newsletter\n"),
                       pa.scalar(""))
    rare = pc.if_else(pa.array(d % 50 == 0),
                      cat("rare notice ", src, "\n"), pa.scalar(""))
    text = cat("home | ", src, " | about\n", promo,
               t["text"].combine_chunks(), "\n", rare, "(c) 2026 ", src)
    return pa.table({"doc_id": did, "text": text, "source": src})


def q_strip_boilerplate(sf_dir: str):
    """Per-source boilerplate LINE stripping (stages/boilerplate
    .strip_boilerplate — the rewrite tier of the template family):
    lines in >= 20% of a source's docs are removed and the doc
    reassembled. Census pays ONE source exchange (sentinel-row
    denominators on the same exchange); the rewrite pays one more with
    the text payload crossing the wire once. Planted header/footer
    (100%) and promo (33%) lines must vanish; the rare notice (2%) and
    the body must survive — threshold exercised on both sides."""
    from pypdfium2_ray.stages.boilerplate import strip_boilerplate
    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        _decorate_boilerplate, batch_format="pyarrow")
    with _hint(sf_dir):
        return strip_boilerplate(ds, frac_num=TPL_FRAC[0],
                                 frac_den=TPL_FRAC[1])


def _strip_boilerplate_sql() -> str:
    """Line explode via the list-index idiom (no WITH ORDINALITY in
    DuckDB), per-source frequency census, LEFT-JOIN template flag,
    ordered string_agg rebuild; COALESCE('') keeps all-boilerplate docs
    alive like the engine does."""
    num, den = TPL_FRAC
    return f"""
        WITH d0 AS (SELECT doc_id, source, text FROM documents
                    WHERE text IS NOT NULL),
        dec AS (SELECT doc_id, source,
                  'home | ' || source || ' | about' || chr(10) ||
                  CASE WHEN doc_id % 3 = 0 THEN
                    'subscribe to ' || source || ' newsletter' || chr(10)
                    ELSE '' END ||
                  text || chr(10) ||
                  CASE WHEN doc_id % 50 = 0 THEN
                    'rare notice ' || source || chr(10) ELSE '' END ||
                  '(c) 2026 ' || source AS text
                FROM d0),
        ls AS (SELECT doc_id, source, string_split(text, chr(10)) AS l
               FROM dec),
        lines AS (SELECT doc_id, source, i, l[i] AS ln
                  FROM ls, unnest(generate_series(1, len(l))) AS t(i)),
        tot AS (SELECT source, count(*) AS sd FROM dec GROUP BY source),
        freq AS (SELECT source, md5(ln) AS lm,
                        count(DISTINCT doc_id) AS n
                 FROM lines GROUP BY source, md5(ln)),
        tpl AS (SELECT f.source, f.lm FROM freq f JOIN tot USING (source)
                WHERE f.n * {den} >= sd * {num} AND f.n >= 2),
        mk AS (SELECT l.doc_id, l.i, l.ln, (t.lm IS NOT NULL) AS is_tpl
               FROM lines l LEFT JOIN tpl t
                 ON t.source = l.source AND t.lm = md5(l.ln))
        SELECT doc_id,
               COALESCE(string_agg(ln, chr(10) ORDER BY i)
                        FILTER (WHERE NOT is_tpl), '') AS clean_text,
               (count(*) FILTER (WHERE is_tpl))::BIGINT AS n_dropped
        FROM mk GROUP BY doc_id"""


#: fp_neighbors value window (unsigned-64 fingerprint line): ~C(n,2) *
#: 2*delta/2^64 expected pairs on a uniform corpus — a handful at
#: sf0.001, ~400 at sf0.01
FPN_DELTA = 1 << 48


def q_fp_neighbors(sf_dir: str):
    """Sorted-neighborhood blocking pairs (stages/blocking): docs whose
    64-bit simhash fingerprints land within FPN_DELTA of each other on
    the unsigned line. ONE range-bucket exchange with halo replication
    (delta/W = 1/256 of rows ride twice); the exactly-once emission rule
    (higher member native) makes the pair set — and the exact distances
    — hash-comparable to the HUGEINT range-join SQL twin."""
    from pypdfium2_ray.stages.blocking import fingerprint_window_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return fingerprint_window_pairs(ds, ngram_n=3, delta=FPN_DELTA)


def q_top_user_per_type(sf_dir: str):
    """Grouped mode (most frequent value per group, deterministic
    tie-break): exact (event_type, user) counts then grouped_topk(k=1) —
    per-block partial quota, one survivors exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.topk import grouped_topk
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        cnt = grouped_aggregate(ds, ["event_type", "user_id"],
                                {"n": (None, "count")})
        return grouped_topk(cnt, ["event_type"], ["n", "user_id"], k=1,
                            descending=[True, False])


def q_user_rolling_7d(sf_dir: str):
    """7-day trailing event count per user per active day
    (stages/window.rolling_window_sum — the RANGE-window analogue):
    per-(user, day) counts then ONE user exchange with a composite-key
    searchsorted kernel (zero per-user Python). Oracle: the same RANGE
    window in SQL."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.window import rolling_window_sum

    def to_day(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "day": pc.divide(us, 86_400_000_000)})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"]).map_batches(
        to_day, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        daily = grouped_aggregate(ds, ["user_id", "day"],
                                  {"n": (None, "count")})
        return rolling_window_sum(daily, "user_id", "day", "n",
                                  window=7, out="n_7d")


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped top revenue orders for one market segment — the
    LARGE x LARGE join path (pipelines/relational.shipping_priority):
    two keys-only exchange-tier semi joins, integer-exact revenue
    (price-cents x discount-hundredths)."""
    from pypdfium2_ray.pipelines.relational import shipping_priority
    with _hint(sf_dir, "lineitem"):
        return shipping_priority(sf_dir, segment="BUILDING", k=10)


def q_cohort_retention(sf_dir: str):
    """Cohort-retention matrix over events (stages/sessionize.
    cohort_retention): day buckets, first-seen cohort via grouped min +
    repartition join, exact distinct active users per (cohort_day,
    day_offset) cell."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import cohort_retention
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return cohort_retention(ds)


def q_length_rank(sf_dir: str):
    """Per-language window rank (stages/topk.grouped_rank — the
    row_number() analogue: one exchange, per-partition sort + run-offset
    arange, zero per-group Python). Rank by (n_chars, doc_id) ascending."""
    from pypdfium2_ray.stages.topk import grouped_rank
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    with _hint(sf_dir):
        out = grouped_rank(ds, ["lang"], ["n_chars", "doc_id"])
    return _cast_i64(out, ["n_chars", "rank"])


def q_pack_offsets(sf_dir: str):
    """GPT-style sequence packing (stages/scan.pack_offsets): distributed
    two-phase range scan computes each doc's exact start offset in the
    key-ordered concatenation, then the example ids it spans at
    example_len=1024 — all integer arithmetic, verified by a window
    cumsum oracle."""
    from pypdfium2_ray.stages.scan import pack_offsets
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    with _hint(sf_dir):
        out = pack_offsets(ds, example_len=1024)
    return _cast_i64(out, ["n_chars"])


def q_shuffle_assign(sf_dir: str):
    """Deterministic training-data shuffle (stages/shuffle.
    deterministic_shuffle): shard = md5(doc_id) % 16, position = rank
    within shard by (md5 >> 1, doc_id) — the reproducible epoch-order
    export; whole order verified by a window-function oracle."""
    from pypdfium2_ray.stages.shuffle import deterministic_shuffle
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    with _hint(sf_dir):
        out = deterministic_shuffle(ds, key_col="doc_id", n_shards=16)
    return _cast_i64(out, ["n_chars"])


#: negative_pairs: hash-ring buckets / negatives per anchor
NEG_BUCKETS = 16
NEG_K = 2


def q_negative_pairs(sf_dir: str):
    """Deterministic contrastive-negative mining (stages/shuffle.
    ring_negative_pairs): k=2 negatives per doc by cyclic next-neighbor
    pairing within md5-hash buckets sorted by (md5 >> 1, doc_id) — the
    in-batch-negatives recipe with no RNG, reproducible across runs and
    cluster sizes. One ids-only exchange; the twin replays the ring
    with row_number/count window functions."""
    from pypdfium2_ray.stages.shuffle import ring_negative_pairs
    ds = _docs(sf_dir, ["doc_id"])
    with _hint(sf_dir):
        return ring_negative_pairs(ds, key_col="doc_id",
                                   n_buckets=NEG_BUCKETS, k=NEG_K)


def _negative_pairs_sql() -> str:
    js = ", ".join(str(j) for j in range(1, NEG_K + 1))
    return f"""
WITH h AS (SELECT doc_id,
                  md5_number_upper(doc_id::VARCHAR) AS m FROM documents),
r AS (SELECT doc_id,
             (m % {NEG_BUCKETS})::BIGINT AS bkt,
             row_number() OVER (PARTITION BY m % {NEG_BUCKETS}
                                ORDER BY m >> 1, doc_id) AS rn,
             count(*) OVER (PARTITION BY m % {NEG_BUCKETS}) AS c
      FROM h),
js AS (SELECT unnest([{js}]) AS j)
SELECT a.doc_id AS anchor, nb.doc_id AS negative
FROM r a CROSS JOIN js
JOIN r nb ON nb.bkt = a.bkt AND nb.rn = (a.rn - 1 + js.j) % a.c + 1
WHERE js.j < a.c"""


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) in the INTEGER-EXACT regime
    (stages/ann.semantic_dedup_exact): kmeans_exact clusters + the
    in-cluster cosine threshold cross-multiplied to integers
    (cos > 0.95  <=>  ab > 0 AND 400*ab^2 > 361*aa*bb over e3-quantized
    vectors) — no float in any keep decision, so the unrolled SQL twin
    matches row-for-row (previously rows-only). Keep-min-id semantics,
    ONE cluster exchange, int64-exact Gram matrix per cluster."""
    from pypdfium2_ray.stages.ann import semantic_dedup_exact
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return semantic_dedup_exact(ds, k=8, n_iter=5, tau_sq=(361, 400),
                                scale=1000)


def q_collocations(sf_dir: str):
    """Top-20 bigram collocations with integer-exact PMI ingredients
    (stages/freq.collocations): exact bigram + unigram counts (one
    exchange each, per-block pre-combine), global partial top-k, and
    marginal lookups that prefilter the vocabulary against the 40
    candidate words before any exchange."""
    from pypdfium2_ray.stages.freq import collocations
    ds = _docs(sf_dir, ["text"])
    with _hint(sf_dir):
        return collocations(ds, k=20)


def q_kmeans_assign(sf_dir: str):
    """Distributed k-means over the embeddings corpus in the
    INTEGER-EXACT regime (stages/ann.kmeans_exact): e3-quantized
    vectors, integer squared-Euclidean assignment (ties to the lowest
    cluster), floor-division centroid updates, md5-ordered seeds —
    the pagerank fixed-point discipline applied to clustering, so the
    iterative algorithm has a TRUE unrolled-CTE SQL twin (previously
    rows-only). Broadcast centroids + one vectorized pass per block +
    k x d integer partials in a single-block combine; the spherical
    float variant (stages/ann.kmeans) stays the ANN-tier default."""
    from pypdfium2_ray.stages.ann import kmeans_exact
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    _, assign = kmeans_exact(ds, k=8, n_iter=5, scale=1000)
    return assign


def _kmeans_sql(n_iter: int = 5, k: int = 8, scale: int = 1000,
                tail: str = "SELECT vec_id, cluster FROM afin") -> str:
    """Unrolled-CTE integer Lloyd k-means twin (stages/ann.kmeans_exact):
    the same trick as the pagerank/hits oracles — an iterative algorithm
    whose state is integers is just n_iter CTE pairs. Seeds via
    md5_number_upper (== functions/sketch.md5_hash64), assignment via
    integer squared-Euclidean + (dist, cluster) row_number, update via
    floor(sum/count) double division (exact under the engine's 2^53
    guard), empty clusters COALESCE to the previous centroid."""
    def assign(name, cents):
        return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT v.vec_id, c.cluster,
                 sum((v.val - c.val) * (v.val - c.val)) AS dist
          FROM v JOIN {cents} c USING (dim)
          GROUP BY 1, 2))
  WHERE rn = 1)"""

    ctes = [f"""v AS (
  SELECT vec_id::BIGINT AS vec_id,
         (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale})
              AS BIGINT) AS val
  FROM embeddings)""", f"""seeds AS (
  SELECT vec_id::BIGINT AS vec_id,
         row_number() OVER (
             ORDER BY md5_number_upper(vec_id::VARCHAR) >> 1, vec_id)
           - 1 AS cluster
  FROM embeddings
  QUALIFY cluster < {k})""", """c0 AS (
  SELECT s.cluster, v.dim, v.val FROM seeds s JOIN v USING (vec_id))"""]
    for i in range(1, n_iter + 1):
        ctes.append(assign(f"a{i}", f"c{i - 1}"))
        ctes.append(f"""u{i} AS (
  SELECT a.cluster, v.dim,
         CAST(floor(CAST(sum(v.val) AS DOUBLE) / count(*)) AS BIGINT)
           AS val
  FROM a{i} a JOIN v USING (vec_id)
  GROUP BY 1, 2)""")
        ctes.append(f"""c{i} AS (
  SELECT c.cluster, c.dim, COALESCE(u.val, c.val) AS val
  FROM c{i - 1} c LEFT JOIN u{i} u USING (cluster, dim))""")
    ctes.append(assign("afin", f"c{n_iter}"))
    return "WITH " + ",\n".join(ctes) + "\n" + tail


def _semantic_dedup_sql(n_iter: int = 5, k: int = 8, scale: int = 1000,
                        p: int = 361, q: int = 400) -> str:
    """SemDeDup twin on top of :func:`_kmeans_sql`: in-cluster pair
    cosine threshold cross-multiplied to integers
    (ab > 0 AND q*ab^2 > p*aa*bb over the same e-quantized vectors);
    a row drops when ANY lower-id cluster member clears the threshold."""
    tail = f""", norms AS (
  SELECT vec_id, sum(val * val) AS nn FROM v GROUP BY 1),
sims AS (
  SELECT a.vec_id AS ka, b.vec_id AS kb,
         sum(va.val * vb.val) AS ab
  FROM afin a
  JOIN afin b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id AND vb.dim = va.dim
  GROUP BY 1, 2),
dups AS (
  SELECT DISTINCT s.kb AS vec_id
  FROM sims s
  JOIN norms na ON na.vec_id = s.ka
  JOIN norms nb ON nb.vec_id = s.kb
  WHERE s.ab > 0 AND {q} * s.ab * s.ab > {p} * na.nn * nb.nn)
SELECT a.vec_id, a.cluster FROM afin a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)"""
    return _kmeans_sql(n_iter=n_iter, k=k, scale=scale, tail=tail)


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid ingredients (stages/ann.
    grouped_vector_sums): one reduceat pass per block over the (rows x
    dims) matrix, scaled-integer sums (floor(v * 1e6) — float summation
    order can never flip a bit), enum-keyed single-block combine (no
    exchange). The oracle recomputes the same integer sums via
    unnest + generate_subscripts."""
    from pypdfium2_ray.stages.ann import grouped_vector_sums
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding", "label"])
    out = grouped_vector_sums(ds, key_col="label", vec_col="embedding")
    return _cast_i64(out, ["label"])


def q_audio_features(sf_dir: str):
    """REAL audio decode end-to-end (the WAV leg of the multimodal
    tier): synthesize a deterministic 16-bit PCM WAV per document
    (functions/wav.encode_wav — samples are a pure integer function of
    (doc_id, n_chars)), decode it back with the from-scratch RIFF
    parser (stages/multimodal.DecodeAudio), and report integer-exact
    sample features (sum of squares, peak). The oracle recomputes every
    field — including the sample math via a list comprehension — from
    the documents table alone."""
    import numpy as np

    from pypdfium2_ray.functions.wav import encode_wav
    from pypdfium2_ray.stages.multimodal import decode_audio

    def to_wav(t: pa.Table) -> pa.Table:
        payloads = []
        for d, n in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            s = ((np.arange(int(n), dtype=np.int64) * 7 + int(d)) % 65536
                 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, 8000 + (int(d) % 4) * 4000))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        to_wav, batch_format="pyarrow")
    out = decode_audio(ds).select_columns(
        ["id", "sample_rate", "channels", "bits_per_sample", "n_samples",
         "duration_us", "sum_sq", "peak"])
    return _cast_i64(out, ["sample_rate", "channels", "bits_per_sample"])


def q_audio_resample(sf_dir: str):
    """REAL audio resample end-to-end (multimodal.ResampleAudio — the
    audio analogue of image_resize): same deterministic PCM synth as
    audio_features, decimate by 2 (NN gather on the frame axis), halve
    the rate, RE-ENCODE, and report the re-parsed container's integer
    features — the oracle recomputes the decimated sample math
    (range step 2) from the documents table alone, so the full decode →
    gather → encode → decode chain is hash-gated."""
    import numpy as np

    from pypdfium2_ray.functions.wav import encode_wav
    from pypdfium2_ray.stages.multimodal import resample_audio

    def to_wav(t: pa.Table) -> pa.Table:
        payloads = []
        for d, n in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            s = ((np.arange(int(n), dtype=np.int64) * 7 + int(d)) % 65536
                 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, 8000 + (int(d) % 4) * 4000))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        to_wav, batch_format="pyarrow")
    out = resample_audio(ds, factor=2).select_columns(
        ["id", "sample_rate", "n_samples", "duration_us", "sum_sq",
         "peak"])
    return _cast_i64(out, ["sample_rate"])


def q_stratified_sample(sf_dir: str):
    """Per-language quota sample (data mixing: cap every language at 30
    docs) with deterministic md5-hash membership — stages/topk.
    stratified_sample; QUALIFY row_number oracle over the same halved
    md5_number_upper ordering."""
    from pypdfium2_ray.stages.topk import stratified_sample
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    with _hint(sf_dir):
        out = stratified_sample(ds, ["lang"], "doc_id", k=30)
    return _cast_i64(out, ["n_chars"])


def q_span_dedup(sf_dir: str):
    """Duplicate-span removal (fixed 10-token windows, keep globally
    first occurrence, docs reassembled from surviving spans) — the
    distributable approximation of Lee-et-al exact substring dedup.
    Two exchanges: span-value keep-first (hot keys pre-combined per
    block) then per-doc reassembly via one vectorized binary_join."""
    from pypdfium2_ray.stages.dedup import span_dedup
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return span_dedup(ds, span_tokens=10)


def _minhash_pairs(sf_dir: str):
    """Shared ids-only near-dup pair edge list for the cluster queries."""
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    return minhash_dup_pairs(ds, **MINHASH).select_columns(["id_a", "id_b"])


def q_neardup_clusters(sf_dir: str):
    """Duplicate-cluster labeling: MinHash+LSH pairs -> distributed
    connected components (alternating large-star/small-star,
    stages/components.py — ids-only exchanges, O(log n) rounds) ->
    (doc_id, component-min-id) for every doc in any near-dup cluster.
    Oracle: the same pair set fed to a WITH RECURSIVE reachability walk."""
    with _hint(sf_dir):
        from pypdfium2_ray.stages.components import connected_components
        return connected_components(_minhash_pairs(sf_dir))


def q_neardup_keep_one(sf_dir: str):
    """The end-to-end FineWeb/C4-style near-dedup: cluster the near-dup
    pairs, keep the min-id doc per cluster, drop the rest — an ANTI join
    of the corpus against the non-canonical member ids (ids broadcast
    once, zero payload shuffle; stages/join.key_filter_join)."""
    with _hint(sf_dir):
        from pypdfium2_ray.stages.components import connected_components
        from pypdfium2_ray.stages.join import key_filter_join
        cc = connected_components(_minhash_pairs(sf_dir)).materialize()
        losers = cc.filter(expr="doc_id != component") \
                   .select_columns(["doc_id"])
        docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        out = key_filter_join(docs, losers, "doc_id", mode="anti")
    return _cast_i64(out, ["n_chars"])


#: PageRank link-graph synthesis — pure doc_id arithmetic, so the DuckDB
#: oracle builds the identical edge list. Three out-edges per page:
#: a scatter permutation ((src*PR_MULT+1) % N), a HUB link (src % PR_HUBS
#: — the first PR_HUBS pages collect ~N/PR_HUBS in-links each, the
#: power-law-ish skew a real web graph has), and a cluster link
#: ((src//3) % N). Parallel edges / self-loops are allowed (both sides
#: agree; tested in tests/test_pagerank.py).
PR_MULT = 7919
PR_HUBS = 97
PR_ITERS = 4
PR_DAMPING = 85
PR_INIT = 10**9


def _synth_link_edges(n: int):
    """Per-batch builder of the synthetic skewed link graph (shared by
    q_pagerank and q_hits — identical edge list both sides)."""
    import numpy as np

    def edges(t: pa.Table) -> pa.Table:
        s = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        srcs = np.repeat(s, 3)
        dst = np.stack([(s * PR_MULT + 1) % n,       # scatter permutation
                        s % PR_HUBS,                 # hub link (skew)
                        (s // 3) % n],               # cluster link
                       axis=1).reshape(-1)
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return edges


def q_pagerank(sf_dir: str):
    """Link-graph PageRank (stages/pagerank — the canonical web-scale
    iterative graph op): synthesize a deterministic 3-out-regular link
    graph over the doc ids, run PR_ITERS damped integer fixed-point
    iterations (two ids-only exchanges per iteration: rank->edge join +
    per-dst sum). Integer-scaled arithmetic makes the result bit-identical
    at any partitioning; the oracle unrolls the same update rule as
    chained CTEs."""
    from pypdfium2_ray.stages.bsp import pagerank_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    out = pagerank_bsp(docs.map_batches(edges, batch_format="pyarrow"),
                       nodes, iters=PR_ITERS, damping_pct=PR_DAMPING,
                       init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rank_scaled": t["rank"]}),
        batch_format="pyarrow")


#: dup_spans: 5-token sliding windows, >=2 corpus-wide occurrences —
#: 58/71/2468 maximal spans at sf0.001/0.01/0.1 (live scale growth)
DSP_WINDOW = 5
DSP_MIN_COUNT = 2


def q_dup_spans(sf_dir: str):
    """Any-alignment duplicated-span detection (stages/dupspans — the
    Lee ACL'22 ExactSubstr semantics in distributable sliding-gram
    form): census every sliding 5-token gram (per-block pre-combined
    md5 partials, ONE exchange — the operator's only one), broadcast
    the bounded duplicated-gram set once, then a pure per-block span
    pass merges each doc's hit windows into maximal [s_tok, e_tok)
    spans — doc text never crosses the wire. Catches duplicates at ANY
    offset, unlike the fixed-window span_dedup."""
    from pypdfium2_ray.stages.dupspans import dup_spans
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return dup_spans(ds, window=DSP_WINDOW, min_count=DSP_MIN_COUNT)


def _dup_spans_sql() -> str:
    w, mc = DSP_WINDOW, DSP_MIN_COUNT
    cat = " || ' ' || ".join(f"a[i+{j}]" if j else "a[i]" for j in range(w))
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
           text, {ws}), x -> x <> '') AS a FROM documents),
g AS (SELECT doc_id, unnest([{{'p': i - 1, 'h': md5({cat})}}
      for i in range(1, len(a) - {w - 2})]) AS x FROM t),
gg AS (SELECT doc_id, x.p AS s, x.p + {w} AS e, x.h AS h FROM g),
dup AS (SELECT h FROM gg GROUP BY h HAVING count(*) >= {mc}),
hit AS (SELECT doc_id, s, e FROM gg JOIN dup USING (h)),
m AS (SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS ni
      FROM hit WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)),
isl AS (SELECT doc_id, s, e,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS island FROM m)
SELECT doc_id, min(s)::BIGINT AS s_tok, max(e)::BIGINT AS e_tok,
       count(*)::BIGINT AS n_windows
FROM isl GROUP BY doc_id, island"""


#: phrase with live occurrences at every sf (9/3/10 match starts)
PHRASE = ("big", "order", "scan")


def q_phrase_search(sf_dir: str):
    """Exact phrase query answered from the positional inverted index
    (stages/invindex.positional_postings + phrase_match — the IR
    textbook positional intersection, Manning IIR ch.2): postings are
    built term-partitioned (one exchange — the index layout, a doc's
    terms deliberately NOT co-located), then each phrase slot j emits
    ids-only (doc, pos - j, j) rows and ONE (doc, adj) exchange +
    vectorized group-count finds starts where all slots align. Returns
    (doc_id, pos) match starts."""
    from pypdfium2_ray.stages.invindex import (phrase_match,
                                               positional_postings)
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        postings = positional_postings(ds)
        return phrase_match(postings, list(PHRASE))


def _phrase_search_sql() -> str:
    k = len(PHRASE)
    cond = " AND ".join(f"a[i+{j}] = '{w}'" for j, w in enumerate(PHRASE))
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
                   text, {ws}), x -> x <> '') AS a FROM documents)
        SELECT doc_id,
               unnest([i - 1 for i in range(1, len(a) - {k - 2})
                       if {cond}])::BIGINT AS pos
        FROM t"""


#: bool_search: all_of / none_of term sets (mid-selectivity, ~10%)
BOOL_ALL = ("vector", "window")
BOOL_NONE = ("spark",)


def q_bool_search(sf_dir: str):
    """Conjunctive boolean retrieval with negation
    (stages/invindex.boolean_search): docs containing every all_of term
    and no none_of term. Because a document is row-contained this is a
    ZERO-exchange streaming map — per block: tokenize, is_in-filter to
    the query terms, distinct (doc, term), one pyarrow group_by counts
    positive/total query-term hits per doc."""
    from pypdfium2_ray.stages.invindex import boolean_search
    ds = _docs(sf_dir, ["doc_id", "text"])
    return boolean_search(ds, list(BOOL_ALL), list(BOOL_NONE))


def _bool_search_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    pos = ", ".join(f"'{t}'" for t in BOOL_ALL)
    neg = ", ".join(f"'{t}'" for t in BOOL_NONE)
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '{ws}')) AS term
  FROM documents),
m AS (SELECT doc_id,
             sum((term IN ({pos}))::INT) AS np,
             sum((term IN ({neg}))::INT) AS nn
      FROM pairs GROUP BY doc_id)
SELECT doc_id FROM m WHERE np = {len(BOOL_ALL)} AND nn = 0"""


def q_trustrank(sf_dir: str):
    """Seed-personalized PageRank — TrustRank (stages/pagerank
    .personalized_pagerank, Gyongyi VLDB'04): the teleport term lands
    only on the trusted seed set (doc_id % 500 == 7, the BFS seed list),
    so authority flows outward from seeds and spam-like unreachable
    clusters stay at 0. Same two-exchange-per-iteration budget as
    pagerank — the static seed base folds into the sum exchange as a
    max aggregate; integer fixed-point, bit-identical at any
    partitioning, unrolled by the twin as chained CTEs."""
    from pypdfium2_ray.stages.bsp import pagerank_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    def seed_rows(t: pa.Table) -> pa.Table:
        node = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            node[node % BFS_SEED_MOD == BFS_SEED_RESIDUE], pa.int64())})

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    out = pagerank_bsp(
        docs.map_batches(edges, batch_format="pyarrow"), nodes,
        seeds=seeds, iters=PR_ITERS, damping_pct=PR_DAMPING, init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "trust_scaled": t["rank"]}),
        batch_format="pyarrow")


def _trustrank_sql() -> str:
    base = ((100 - PR_DAMPING) * PR_INIT) // 100
    seed = (f"CASE WHEN n.node % {BFS_SEED_MOD} = {BFS_SEED_RESIDUE} "
            f"THEN {base} ELSE 0 END")
    n0 = (f"SELECT node, CASE WHEN node % {BFS_SEED_MOD} = "
          f"{BFS_SEED_RESIDUE} THEN CAST({PR_INIT} AS BIGINT) "
          f"ELSE 0 END AS r FROM nodes")
    parts = [f"""WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
edges AS (SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn) AS dst FROM nodes UNION ALL SELECT node, node % {PR_HUBS} FROM nodes UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS ({n0})"""]
    for i in range(1, PR_ITERS + 1):
        parts.append(f""",
r{i} AS (SELECT n.node, CAST({seed} + {PR_DAMPING} * COALESCE(s.insum, 0) // 100 AS BIGINT) AS r FROM nodes n LEFT JOIN (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS insum FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst) s USING (node))""")
    parts.append(
        f"\nSELECT node AS doc_id, r AS trust_scaled FROM r{PR_ITERS}")
    return "".join(parts)


#: held-out "benchmark prompts" for n-gram-overlap decontamination —
#: each embeds a word trigram that genuinely occurs in the corpus (df
#: 7-9 at sf0.001), surrounded by novel words (the paraphrase case the
#: substring scan misses)
NGRAM_HELDOUT = ("please explain the big order scan now",
                 "typical group slow spark job behavior",
                 "remember the line agg hash trick")
NGRAM_N = 3


def q_ngram_decontaminate(sf_dir: str):
    """Benchmark decontamination by word n-gram OVERLAP
    (stages/textstats.ngram_decontaminate — the GPT-3 appendix-C
    discipline, the third decontamination tier next to the exact-hash
    blocklist and the verbatim substring scan): drop every document
    sharing any trigram with the held-out prompts. Per-block vectorized
    trigram explode + is_in against the broadcast held-out grams; only
    distinct hit ids leave workers; broadcast anti join back."""
    from pypdfium2_ray.stages.textstats import ngram_decontaminate
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ngram_decontaminate(ds, list(NGRAM_HELDOUT), n=NGRAM_N)
    return out.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                            "n_chars": pc.cast(pc.utf8_length(t["text"]),
                                               pa.int64())}),
        batch_format="pyarrow")


def _ngram_decontaminate_sql() -> str:
    import re as _re
    grams: set[str] = set()
    for h in NGRAM_HELDOUT:
        toks = [w for w in _re.split(r"[ \t\r\n\f\v]+", h) if w]
        grams.update(" ".join(toks[i:i + NGRAM_N])
                     for i in range(len(toks) - NGRAM_N + 1))
    vals = ", ".join("'" + g + "'" for g in sorted(grams))
    ws = r"'[ \t\r\n\f\v]+'"
    joined = " || ' ' || ".join(
        f"a[i+{j}]" if j else "a[i]" for j in range(NGRAM_N))
    return f"""
        WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
                   text, {ws}), x -> x <> '') AS a FROM documents),
        g AS (SELECT doc_id, unnest([{joined}
              for i in range(1, len(a) - {NGRAM_N - 2})]) AS gram FROM t),
        hit AS (SELECT DISTINCT doc_id FROM g WHERE gram IN ({vals}))
        SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM hit)"""


#: unigram-LM vocabulary cap — small enough that rare corpus terms fall
#: OUT of vocabulary, so the smoothing path is oracle-exercised too
LM_VOCAB = 50


def q_lm_score(sf_dir: str):
    """CCNet-style corpus LM quality score (stages/lmscore): top-50
    unigram vocabulary estimated on the corpus (one term exchange), then
    one streaming pass summing micro-scaled per-token log-probs per
    document (vocab broadcast via ray.put once; per-doc segment sums are
    block-complete cumsum differences). OOV smoothing 0.5/T; fixed-point
    ints end-to-end so the chained-CTE oracle is bit-exact."""
    from pypdfium2_ray.stages.lmscore import lm_score
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return lm_score(ds, vocab_size=LM_VOCAB)


def _lm_score_sql() -> str:
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                 text, {ws}), x -> x <> '')) AS term
          FROM documents),
        tot AS (SELECT count(*)::BIGINT AS t FROM toks),
        counts AS (SELECT term, count(*)::BIGINT AS c FROM toks
                   GROUP BY term),
        vocab AS (SELECT term, c FROM counts
                  ORDER BY c DESC, term LIMIT {LM_VOCAB}),
        lp AS (SELECT term, CAST(floor(ln(CAST(c AS DOUBLE) /
                    (SELECT t FROM tot)) * 1000000) AS BIGINT) AS lp
               FROM vocab),
        tok_lp AS (
          SELECT tk.doc_id,
                 COALESCE(lp.lp, CAST(floor(ln(0.5 / (SELECT t FROM tot))
                          * 1000000) AS BIGINT)) AS lp
          FROM toks tk LEFT JOIN lp ON tk.term = lp.term),
        agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                       CAST(sum(lp) AS BIGINT) AS logp_micro
                FROM tok_lp GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
               COALESCE(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)"""


#: mixture weights (permille kept per source) for the data-mixing query:
#: full / half / one-tenth tiers
MIX_PERMILLE = {**{f"src{i}": 1000 for i in range(4)},
                **{f"src{i}": 500 for i in range(4, 8)}}
MIX_DEFAULT = 100


def q_mixture_sample(sf_dir: str):
    """Deterministic weighted mixture sampling
    (stages/textstats.mixture_sample — the data-mixing primitive: keep
    source s at permille[s]/1000 by md5-hash membership, so the blend is
    run/shard/cluster-invariant and nested across weight changes). One
    streaming filter, thresholds broadcast as a closure constant."""
    from pypdfium2_ray.stages.textstats import mixture_sample
    ds = _docs(sf_dir, ["doc_id", "source"])
    return mixture_sample(ds, "doc_id", "source", MIX_PERMILLE,
                          default_permille=MIX_DEFAULT)


def _mixture_sql() -> str:
    cases = " ".join(f"WHEN '{s}' THEN {p}"
                     for s, p in sorted(MIX_PERMILLE.items()))
    return f"""
        SELECT doc_id, source FROM documents
        WHERE md5_number_upper(doc_id::VARCHAR) % 1000 <
              CASE source {cases} ELSE {MIX_DEFAULT} END"""


#: held-out "benchmark" phrases for the substring contamination scan
CONTAM_PHRASES = ("data merge", "query window", "fast hash")


def q_contamination_scan(sf_dir: str):
    """Benchmark-contamination scan by SUBSTRING
    (stages/textstats.substring_scan — the complement of the exact-hash
    q_decontaminate blocklist: verbatim phrase leaks inside longer pages,
    which fingerprint dedup never catches). One vectorized
    match_substring pass per phrase, hit rows only; summarized per phrase
    with a single-block combine (the phrase set is enum-sized)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import substring_scan
    ds = _docs(sf_dir, ["doc_id", "text"])
    hits = substring_scan(ds, list(CONTAM_PHRASES))
    return grouped_aggregate(hits, keys=["phrase"],
                             specs={"n_docs": (None, "count"),
                                    "min_doc": ("doc_id", "min")},
                             combine="single_block")


def _contamination_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in CONTAM_PHRASES)
    return f"""
        SELECT p.phrase, count(*)::BIGINT AS n_docs, min(d.doc_id) AS min_doc
        FROM documents d JOIN (VALUES {vals}) p(phrase)
          ON contains(d.text, p.phrase)
        GROUP BY 1"""


def q_url_dedup(sf_dir: str):
    """Crawl-frontier URL dedup: synthesize two messy spellings of each
    page URL from doc_id (uppercase host + default port + fragment vs the
    clean form — pure doc_id arithmetic, SQL-composable), canonicalize
    them (functions/url.canonicalize_url: RFC-3986-style fragment strip,
    case-fold of scheme+authority, default-port drop, root-slash
    collapse), and collapse duplicates with a per-canonical-URL rollup
    (one hash exchange; the curation step that keeps a crawl from
    fetching/training the same page twice)."""
    from pypdfium2_ray.functions.url import canonicalize_url
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def synth(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        pid = pc.divide(did, 2)
        site = pc.cast(pc.subtract(pid, pc.multiply(
            pc.divide(pid, 7), 7)), pa.string())     # pid % 7 (no pc.modulo)
        pid_s = pc.cast(pid, pa.string())
        messy = pc.binary_join_element_wise(
            pa.array(["HTTP://Site-"] * t.num_rows), site,
            pa.array([".Example.COM:80/page/"] * t.num_rows), pid_s,
            pa.array(["/#top"] * t.num_rows), "")
        clean = pc.binary_join_element_wise(
            pa.array(["http://site-"] * t.num_rows), site,
            pa.array([".example.com/page/"] * t.num_rows), pid_s,
            pa.array(["/"] * t.num_rows), "")
        odd = pc.equal(pc.subtract(did, pc.multiply(pc.divide(did, 2), 2)), 1)
        return pa.table({"doc_id": did,
                         "url": pc.if_else(odd, clean, messy)})

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "url_canon": canonicalize_url(t["url"])})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow") \
                                  .map_batches(canon, batch_format="pyarrow")
    with _hint(sf_dir):
        return grouped_aggregate(ds, keys=["url_canon"],
                                 specs={"n_dups": (None, "count"),
                                        "min_doc": ("doc_id", "min")})


def _url_dedup_sql() -> str:
    from pypdfium2_ray.functions.url import sql_canonicalize_url
    return f"""
        WITH raw AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 1
                   THEN 'http://site-' || CAST((doc_id // 2) % 7 AS VARCHAR)
                        || '.example.com/page/'
                        || CAST(doc_id // 2 AS VARCHAR) || '/'
                   ELSE 'HTTP://Site-' || CAST((doc_id // 2) % 7 AS VARCHAR)
                        || '.Example.COM:80/page/'
                        || CAST(doc_id // 2 AS VARCHAR) || '/#top'
                 END AS url
          FROM documents)
        SELECT {sql_canonicalize_url('url')} AS url_canon,
               count(*)::BIGINT AS n_dups,
               min(doc_id) AS min_doc
        FROM raw GROUP BY 1"""


def q_extract_links(sf_dir: str):
    """Hyperlink extraction over the raw crawl payloads
    (stages/linkgraph.extract_links): one compiled-regex anchor scan per
    document, nav/footer INCLUDED (a link graph wants every edge, unlike
    the stripped text tier); rows whose payload fails the parser's
    decode gate (docmodel.htmldoc.decode_payload — the exact
    parse_document refusal set) emit nothing, so the oracle's
    synthesis-predicate WHERE is exact. Each ok page carries the two
    boilerplate chrome links plus the per-doc related-page link."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import extract_links
    return extract_links(read_cc_from_documents(sf_dir))


def _extract_links_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    return f"""
        SELECT doc_id, '/' AS href, 'Home' AS anchor
        FROM documents WHERE {ok}
        UNION ALL
        SELECT doc_id, '/about', 'About' FROM documents WHERE {ok}
        UNION ALL
        SELECT doc_id,
               '/page/' || CAST((doc_id * {LINK_MULT} + {LINK_ADD})
                                % {LINK_MOD} AS VARCHAR),
               'rel ' || CAST(doc_id AS VARCHAR)
        FROM documents WHERE {ok}"""


def q_extract_tables(sf_dir: str):
    """HTML <table> extraction to relational cell rows
    (stages/tables.extract_tables): per-doc SAX table walk behind the
    SHARED decode gate (decode_payload — identical refusal set to the
    flagship parse, so the deterministic error slice emits nothing and
    the oracle's synthesis predicate is exact). Pure per-block map, zero
    exchanges. The wrap='table' page shape plants a 5-row metadata table
    whose cells are pure (doc_id, lang, source, length(text))
    expressions — the oracle reconstructs all 10 cells per ok doc."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.tables import extract_tables
    return extract_tables(read_cc_from_documents(sf_dir, wrap="table"))


def _extract_tables_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import sql_is_bad, sql_is_enc
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    cells = [
        (0, 0, "TRUE", "'key'"), (0, 1, "TRUE", "'value'"),
        (1, 0, "FALSE", "'id'"), (1, 1, "FALSE", "CAST(doc_id AS VARCHAR)"),
        (2, 0, "FALSE", "'lang'"), (2, 1, "FALSE", "lang"),
        (3, 0, "FALSE", "'source'"), (3, 1, "FALSE", "source"),
        (4, 0, "FALSE", "'chars'"),
        (4, 1, "FALSE", "CAST(length(text) AS VARCHAR)"),
    ]
    parts = [
        f"SELECT doc_id, 0::BIGINT AS table_idx, {r}::BIGINT AS row_idx, "
        f"{c}::BIGINT AS col_idx, {h} AS is_header, {v} AS cell "
        f"FROM documents WHERE {ok}"
        for r, c, h, v in cells]
    return " UNION ALL ".join(parts)


def q_extract_jsonld(sf_dir: str):
    """JSON-LD structured-data extraction (stages/structured
    .extract_jsonld): ld+json script bodies (CDATA to the tokenizer)
    -> json.loads -> flattened scalar rows with dotted/indexed paths,
    behind the SHARED decode gate. The wrap='ld' page plants a
    schema.org Article whose 8 scalar fields (incl. a nested author.name
    and a keywords[i] array) are pure SQL expressions."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.structured import extract_jsonld
    return extract_jsonld(read_cc_from_documents(sf_dir, wrap="ld"))


def _extract_jsonld_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import sql_is_bad, sql_is_enc
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    fields = [
        ("'@context'", "'https://schema.org'", "str"),
        ("'@type'", "'Article'", "str"),
        ("'headline'", "'Doc ' || CAST(doc_id AS VARCHAR)", "str"),
        ("'wordCount'", "CAST(length(text) AS VARCHAR)", "num"),
        ("'inLanguage'", "lang", "str"),
        ("'author.name'", "source", "str"),
        ("'keywords[0]'", "'crawl'", "str"),
        ("'keywords[1]'", "lang", "str"),
    ]
    parts = [
        f"SELECT doc_id, 0::BIGINT AS block_idx, {p} AS path, "
        f"{v} AS value, '{t}' AS value_type FROM documents WHERE {ok}"
        for p, v, t in fields]
    return " UNION ALL ".join(parts)


def q_anchor_text(sf_dir: str):
    """Anchor-text index per link TARGET (stages/linkgraph.
    anchor_text_index): n_refs / distinct-anchor count / sorted
    '|'-joined anchor texts — per-block pre-combine, ONE href exchange,
    reduceat+binary_join kernel. string_agg(ORDER BY) oracle over the
    same synthesis-predicate link list as extract_links."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import anchor_text_index, extract_links
    with _hint(sf_dir):
        return anchor_text_index(
            extract_links(read_cc_from_documents(sf_dir)))


def _anchor_text_sql() -> str:
    return f"""
        WITH links AS ({_extract_links_sql()}),
        pairs AS (
          SELECT href, anchor, count(*) AS cnt
          FROM links GROUP BY 1, 2)
        SELECT href, sum(cnt)::BIGINT AS n_refs,
               count(*)::BIGINT AS n_anchors,
               string_agg(anchor, '|' ORDER BY anchor) AS anchors
        FROM pairs GROUP BY href"""


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier generation, composed purely from existing
    primitives: parse out-links from raw payloads (extract_links), keep
    intra-site page targets (links_to_edges — vectorized href parse),
    per-block distinct pre-combine + one dst exchange (distinct_rows),
    then ANTI join against the already-crawled id set (key_filter_join,
    keys only) — the unseen targets a scheduler would enqueue next. The
    crawled set is the EVEN doc_ids (a mid-crawl snapshot: at larger sf
    the id space covers every link target, so all-docs-crawled would
    leave a degenerate empty frontier). NOT-IN oracle over the synthesis
    link predicates."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.dedup import distinct_rows
    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.linkgraph import extract_links, links_to_edges
    from pypdfium2_ray.sources.cc_from_documents import LINK_MOD

    def evens(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(_rem(t, 2), 0)).select(["doc_id"])

    crawled = _docs(sf_dir, ["doc_id"]).map_batches(
        evens, batch_format="pyarrow")
    with _hint(sf_dir):
        edges = links_to_edges(
            extract_links(read_cc_from_documents(sf_dir)),
            n_nodes=LINK_MOD)
        targets = distinct_rows(edges.select_columns(["dst"]), ["dst"])
        out = key_filter_join(targets, crawled, "dst",
                              right_key="doc_id", mode="anti")
    return _cast_i64(out, ["dst"])


def _crawl_frontier_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    return f"""
        SELECT DISTINCT
               (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} AS dst
        FROM documents WHERE {ok}
          AND (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD}
              NOT IN (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)"""


def q_link_pagerank(sf_dir: str):
    """The extraction tier feeding the graph tier END-TO-END: parse
    hyperlinks out of the raw crawl payloads (q_extract_links), keep the
    intra-site page links with existing targets
    (stages/linkgraph.links_to_edges — vectorized extract + dangling
    filter), and rank pages with the integer fixed-point PageRank. The
    oracle unrolls the same iterations over the synthesis-predicate edge
    list."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import extract_links, links_to_edges
    from pypdfium2_ray.stages.bsp import pagerank_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    links = extract_links(read_cc_from_documents(sf_dir))
    edges = links_to_edges(links, n_nodes=n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    out = pagerank_bsp(edges, nodes, iters=PR_ITERS,
                       damping_pct=PR_DAMPING, init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rank_scaled": t["rank"]}),
        batch_format="pyarrow")


def _link_pagerank_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    edges = (
        "edges AS (SELECT CAST(doc_id AS BIGINT) AS src, "
        f"CAST((doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} AS BIGINT)"
        " AS dst FROM documents "
        f"WHERE NOT {sql_is_bad()} AND NOT {sql_is_enc()} "
        f"AND (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} "
        "< (SELECT n FROM nn))")
    return _pagerank_sql(edges_cte=edges)


#: BM25 query: a common term, a mid-df term and a rare term (df 379/403/25
#: at sf0.001) so the idf spread actually orders the results
BM25_TERMS = ("data", "merge", "dup")
BM25_K = 15


def q_bm25_topk(sf_dir: str):
    """Corpus search: top-k documents by fixed-point BM25 over the query
    terms (stages/bm25 — scalar pre-pass + block-local tf/dl candidate
    extraction + one ids-only exchange for the per-doc sum + partial
    top-k; the corpus text never enters an exchange). Integer-scaled
    score arithmetic; idf is floor(ln(...)*1e6) on identical float64
    inputs both sides."""
    from pypdfium2_ray.stages.bm25 import bm25_topk
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return bm25_topk(ds, list(BM25_TERMS), k=BM25_K)


def _bm25_sql(k1_milli: int = 1200, b_milli: int = 750) -> str:
    """The engine's exact fixed-point BM25 (stages/bm25 docstring) as
    chained CTEs — every op BIGINT floor division on non-negative values
    except the shared floor(ln(...)*1e6) idf."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(text, {ws})) AS term
          FROM documents),
        cand AS (
          SELECT doc_id, term, count(*)::BIGINT AS tf
          FROM toks WHERE term IN ({terms}) GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, length(list_filter(regexp_split_to_array(
                 text, {ws}), x -> x <> ''))::BIGINT AS dl
          FROM documents),
        sc AS (SELECT count(*)::BIGINT AS n,
                      CAST(sum(dl) * 1000 // count(*) AS BIGINT)
                        AS avgdl_milli FROM dl),
        dfs AS (SELECT term, count(*)::BIGINT AS df FROM cand
                GROUP BY term),
        idf AS (SELECT term,
                       CAST(floor(ln(1.0 + ((SELECT n FROM sc) - df + 0.5)
                            / (df + 0.5)) * 1000000) AS BIGINT)
                         AS idf_micro
                FROM dfs),
        scored AS (
          SELECT c.doc_id,
                 CAST(i.idf_micro * (c.tf * {k1_milli + 1000} * 1000 //
                   (c.tf * 1000 + {k1_milli} * ((1000 - {b_milli})
                      + {b_milli} * (d.dl * 1000000 //
                        (SELECT avgdl_milli FROM sc)) // 1000) // 1000))
                   // 1000 AS BIGINT) AS score_micro
          FROM cand c JOIN dl d USING (doc_id) JOIN idf i USING (term))
        SELECT doc_id, CAST(sum(score_micro) AS BIGINT) AS score_micro
        FROM scored GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id LIMIT {BM25_K}"""


def _pagerank_sql(edges_cte: str | None = None) -> str:
    """The engine's exact integer update rule unrolled as chained CTEs
    (fixed iteration count => no recursion needed; every op is BIGINT
    floor division on non-negative values, bit-identical both sides).
    ``edges_cte``: the ``edges AS (...)`` definition — defaults to the
    synthetic skewed web graph of :func:`q_pagerank`."""
    base = ((100 - PR_DAMPING) * PR_INIT) // 100
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        edges_cte or (
            f"edges AS ("
            f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
            " AS dst FROM nodes"
            f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
            " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
            " FROM nodes)"),
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(PR_ITERS):
        ctes.append(
            f"r{k + 1} AS (SELECT n.node, CAST({base} + {PR_DAMPING} * "
            "COALESCE(s.insum, 0) // 100 AS BIGINT) AS r "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS node, SUM(r.r // d.outdeg) AS insum "
            f"FROM edges e JOIN r{k} r ON e.src = r.node "
            "JOIN deg d ON d.src = e.src "
            "GROUP BY e.dst) s USING (node))")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, r AS rank_scaled FROM r{PR_ITERS}")


HITS_ITERS = 4
HITS_INIT = 10**6


def q_hits(sf_dir: str):
    """HITS hubs & authorities over the same synthetic skewed link graph
    as q_pagerank, on the BSP actor-pool engine (stages/bsp.hits_bsp):
    edges partition into worker actors ONCE, then each half-step is one
    round of destination-hashed partial-sum shard transfers instead of
    two hash exchanges — same int64 max-rescale trajectory as
    stages/hits.hits (bit-equality pinned in tests/test_hits.py), so the
    unrolled integer SQL twin is unchanged."""
    from pypdfium2_ray.stages.bsp import hits_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    out = hits_bsp(docs.map_batches(edges, batch_format="pyarrow"),
                   nodes, iters=HITS_ITERS, init=HITS_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "auth": t["auth"],
                            "hub": t["hub"]}),
        batch_format="pyarrow")


def _hits_sql() -> str:
    """The engine's exact half-step trajectory unrolled as chained CTEs:
    per half-step a LEFT JOIN sum (COALESCE 0 keeps sinks/isolates) and the
    integer rescale ``raw // greatest(max(raw) // init, 1)`` as a scalar
    subquery — every op BIGINT/HUGEINT floor division on non-negative
    values, bit-identical to stages/hits.py."""
    init = HITS_INIT
    ctes = [
        "nodes AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        f"h0 AS (SELECT node, CAST({init} AS BIGINT) AS v FROM nodes)",
    ]
    for k in range(HITS_ITERS):
        ctes.append(
            f"ar{k + 1} AS MATERIALIZED (SELECT n.node, COALESCE(s.v_sum, 0) AS raw "
            "FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(h.v) AS v_sum FROM edges e "
            f"JOIN h{k} h ON e.src = h.node GROUP BY e.dst) s USING (node))")
        ctes.append(
            f"a{k + 1} AS MATERIALIZED (SELECT node, raw // greatest("
            f"(SELECT max(raw) FROM ar{k + 1}) // {init}, 1) AS v "
            f"FROM ar{k + 1})")
        ctes.append(
            f"hr{k + 1} AS MATERIALIZED (SELECT n.node, COALESCE(s.v_sum, 0) AS raw "
            "FROM nodes n LEFT JOIN ("
            f"SELECT e.src AS node, SUM(a.v) AS v_sum FROM edges e "
            f"JOIN a{k + 1} a ON e.dst = a.node GROUP BY e.src) s "
            "USING (node))")
        ctes.append(
            f"h{k + 1} AS MATERIALIZED (SELECT node, raw // greatest("
            f"(SELECT max(raw) FROM hr{k + 1}) // {init}, 1) AS v "
            f"FROM hr{k + 1})")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT a.node AS doc_id, CAST(a.v AS BIGINT) AS auth, "
              f"CAST(h.v AS BIGINT) AS hub "
              f"FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (node)")


def _synth_tri_edges(n: int):
    """q_triangles edge builder: the shared pagerank/hits skewed graph
    (``_synth_link_edges``) PLUS an intra-cluster chain link
    (src -> src+1 when src % 3 != 2) — each 3-cluster then closes two
    triangles with its shared ``(src//3) % n`` target, keeping the
    triangle population dense (~2n/3) at every sf instead of relying on
    the sparse modular coincidences of the base graph alone."""
    base = _synth_link_edges(n)

    def edges(t: pa.Table) -> pa.Table:
        import numpy as np
        b = base(t)
        s = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        m = (s % 3 != 2) & (s + 1 < n)
        extra = pa.table({"src": pa.array(s[m], pa.int64()),
                          "dst": pa.array(s[m] + 1, pa.int64())})
        return pa.concat_tables([b, extra])

    return edges


def q_triangles(sf_dir: str):
    """Per-node triangle counts over the synthetic link graph
    (stages/triangles — degree-oriented wedge generation + oriented-edge
    semi-join, Suri & Vassilvitskii WWW'11): all exchanges carry 2-3
    int64s, hub skew is neutralized by the (degree, id) orientation, and
    the count is exact — the all-pairs-free SQL twin enumerates each
    triangle once via the u<v canonical three-way join."""
    from pypdfium2_ray.stages.triangles import triangle_counts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = triangle_counts(edges)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "n_triangles": t["n_triangles"]}),
        batch_format="pyarrow")


#: kcore: k=5 peels the shared densified graph non-trivially (degree-4
#: chain/cluster nodes die, hub neighborhoods survive); 3 peel rounds is
#: the bounded-round contract (the BFS fixed-hop discipline) — the peel
#: has NOT converged at 3 rounds (fixpoint is ~20-36 rounds on this
#: graph) and both sides define the result as the 3-round peel
KCORE_K = 5
KCORE_ROUNDS = 3


def q_kcore(sf_dir: str):
    """Bounded-round k-core peel over the synthetic link graph
    on the BSP engine (stages/bsp.kcore_bsp — Montresor PODC'11
    decrement peeling): one mark/emit/apply actor round per peel round,
    degrees maintained by decrements along just-killed nodes' edges
    (invariant: deg[] == degree within the alive-induced subgraph), so
    each round is bit-equal to the exchange tier's degree-exchange +
    two-semi-join recompute (pinned in tests). Output (doc_id, deg) is
    each survivor's degree within the final induced subgraph; the SQL
    twin unrolls the same R rounds as chained MATERIALIZED CTEs."""
    from pypdfium2_ray.stages.bsp import kcore_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    out = kcore_bsp(edges, k=KCORE_K, rounds=KCORE_ROUNDS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "deg": t["deg"]}),
        batch_format="pyarrow")


def _kcore_sql() -> str:
    """Unrolled peel: e0 = distinct canonical undirected (both-dir)
    edges of the shared densified graph; per round deg -> survivors
    (deg >= k) -> induced edges. MATERIALIZED per hop: e_r is referenced
    by both d_{r+1} and e_{r+1}, and DuckDB's default inlining would
    re-evaluate the chain exponentially (the hits-oracle lesson)."""
    k = KCORE_K
    parts = ["""
WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
raw AS (
  SELECT node AS src, (node * 7919 + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL SELECT node, node % 97 FROM nodes
  UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
  UNION ALL SELECT node, node + 1 FROM nodes
    WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src <> dst),
e0 AS MATERIALIZED (
  SELECT lo AS s, hi AS d FROM und UNION ALL SELECT hi, lo FROM und)"""]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT s, count(*) AS c FROM e{r - 1} GROUP BY s),
n{r} AS MATERIALIZED (SELECT s FROM d{r} WHERE c >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{r - 1} e
  JOIN n{r} a ON e.s = a.s JOIN n{r} b ON e.d = b.s)""")
    parts.append(f"""
SELECT s AS doc_id, count(*)::BIGINT AS deg
FROM e{KCORE_ROUNDS} GROUP BY s""")
    return "".join(parts)


#: communities: 3 synchronous LPA rounds over the shared densified
#: graph — the bounded-round contract (synchronous LPA can 2-cycle on
#: bipartite regions, so a fixed R is part of the operator definition,
#: not a truncation); 3 rounds already collapses the graph to large
#: hub-anchored communities
LPA_ROUNDS = 3


def q_communities(sf_dir: str):
    """Bounded-round synchronous label propagation over the synthetic
    link graph (stages/labelprop — Raghavan Phys.Rev.E'07 with the
    deterministic synchronous/min-label-tie-break contract): label(v,0)
    = v, each round every node takes its neighbors' modal label (ties
    to the smallest), on the BSP engine (stages/bsp
    .label_propagation_bsp): one emit/combine actor round per round —
    neighbor labels travel as (node, label, count) pre-combined shards
    — instead of a label-fetch join plus an argmax exchange;
    bit-identical to stages/labelprop at any worker count (pinned in
    tests); the twin unrolls the same R rounds."""
    from pypdfium2_ray.stages.bsp import label_propagation_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    out = label_propagation_bsp(edges, rounds=LPA_ROUNDS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "community": t["lbl"]}),
        batch_format="pyarrow")


def _communities_sql() -> str:
    """Unrolled synchronous LPA: e0 = the kcore twin's canonical
    both-direction edge set; per round neighbor-label counts ->
    row_number() pick of (max count, min label). MATERIALIZED per hop
    (each l_r feeds the next round's join — the hits-oracle inlining
    lesson)."""
    parts = ["""
WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
raw AS (
  SELECT node AS src, (node * 7919 + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL SELECT node, node % 97 FROM nodes
  UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
  UNION ALL SELECT node, node + 1 FROM nodes
    WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src <> dst),
e0 AS MATERIALIZED (
  SELECT lo AS s, hi AS d FROM und UNION ALL SELECT hi, lo FROM und),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lbl FROM e0)"""]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(f""",
c{r} AS (
  SELECT e.s AS node, l.lbl, count(*) AS c
  FROM e0 e JOIN l{r - 1} l ON l.node = e.d GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl) AS rn
    FROM c{r}) WHERE rn = 1)""")
    parts.append(f"""
SELECT node AS doc_id, lbl AS community FROM l{LPA_ROUNDS}""")
    return "".join(parts)


#: crawl_depth: seeds are doc_id % 500 == 7 (1 seed at sf0.001 scaling
#: to 100 at sf0.1); 6 hops over the 3-out-regular graph reaches most
#: of the corpus without the result degenerating to all-zeros
BFS_SEED_MOD = 500
BFS_SEED_RESIDUE = 7
BFS_HOPS = 6


def q_crawl_depth(sf_dir: str):
    """Crawl depth from the seed list, on the BSP actor-pool engine
    (stages/bsp.bfs_bsp): min directed hops from any seed, clipped at
    BFS_HOPS — one actor round per hop (frontier neighbors as dst-hashed
    id shards, driver-side newly-settled convergence) instead of a
    join + grouped-min exchange pair. The min semilattice makes the
    result bit-identical to stages/bfs.bfs_depths at any partitioning
    (pinned in tests) and the fixed hop count unrolls to exact integer
    SQL."""
    from pypdfium2_ray.stages.bsp import bfs_bsp
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")

    def seed_rows(t: pa.Table) -> pa.Table:
        import numpy as np
        node = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            node[node % BFS_SEED_MOD == BFS_SEED_RESIDUE], pa.int64())})

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    out = bfs_bsp(edges, seeds, hops=BFS_HOPS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "depth": t["depth"]}),
        batch_format="pyarrow")


def _crawl_depth_sql() -> str:
    """One chained CTE per hop (the pagerank/hits unroll discipline):
    d_{k+1} = grouped min over d_k UNION ALL (edges JOIN d_k ON src).
    Expanding ALL settled rows (not just the frontier) re-derives only
    larger-or-equal depths, so the engine's frontier optimization is
    invisible. MATERIALIZED per hop: DuckDB would otherwise inline each
    d_k into the next hop's two references, doubling the plan per hop."""
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        f"d0 AS (SELECT node, CAST(0 AS BIGINT) AS depth FROM nodes "
        f"WHERE node % {BFS_SEED_MOD} = {BFS_SEED_RESIDUE})",
    ]
    for k in range(BFS_HOPS):
        ctes.append(
            f"d{k + 1} AS MATERIALIZED (SELECT node, min(depth) AS depth "
            f"FROM (SELECT node, depth FROM d{k} "
            f"UNION ALL SELECT e.dst, d.depth + 1 "
            f"FROM edges e JOIN d{k} d ON e.src = d.node) GROUP BY node)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, depth FROM d{BFS_HOPS}")


def _triangles_sql() -> str:
    """Canonical-triangle enumeration: distinct undirected u<v edges,
    three-way join (a<b<c exactly once), per-corner explode + count —
    the same triangle SET the oriented engine confirms, so the per-node
    counts match exactly. ``und`` is MATERIALIZED: DuckDB would otherwise
    inline the DISTINCT subtree into all three join references."""
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
          UNION ALL SELECT node, node + 1 FROM nodes
            WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
        und AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges WHERE src <> dst),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri)
        SELECT node AS doc_id, count(*) AS n_triangles
        FROM tn GROUP BY node"""


def q_local_clustering(sf_dir: str):
    """Exact local-clustering-coefficient parts per node
    (stages/triangles.clustering_parts): n_triangles and
    n_wedges = d*(d-1)/2 for every node of degree >= 2, so
    T/wedges stays an exact rational — the per-node community-density
    signal on the shared synthetic link graph. The triangle machinery
    plus ONE left repartition join (triangle-free nodes fill 0;
    degree-1 nodes emit nothing on both engines)."""
    from pypdfium2_ray.stages.triangles import clustering_parts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = clustering_parts(edges)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "n_triangles": t["n_triangles"],
                            "n_wedges": t["n_wedges"]}),
        batch_format="pyarrow")


def _local_clustering_sql() -> str:
    """The :func:`_triangles_sql` construction plus degrees and the
    left join: wedge counts from the distinct undirected degree,
    triangle counts COALESCEd to 0, degree-1 nodes excluded."""
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
          UNION ALL SELECT node, node + 1 FROM nodes
            WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
        und AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges WHERE src <> dst),
        deg AS (SELECT node, count(*)::BIGINT AS d
                FROM (SELECT u AS node FROM und
                      UNION ALL SELECT v FROM und)
                GROUP BY node),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri),
        tc AS (SELECT node, count(*)::BIGINT AS n_triangles
               FROM tn GROUP BY node)
        SELECT deg.node AS doc_id,
               COALESCE(tc.n_triangles, 0)::BIGINT AS n_triangles,
               (d * (d - 1) // 2)::BIGINT AS n_wedges
        FROM deg LEFT JOIN tc USING (node)
        WHERE d >= 2"""




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
