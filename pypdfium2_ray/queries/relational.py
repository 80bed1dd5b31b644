"""TPC-H-shaped relational query surface.

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping). One deliberate behavior change rode the split
(everything else is a pure move): ``q_merge_snapshot``'s inner builders
gained explicit ``pa.string()`` types on the op/text arrays —
``pa.array([])`` is NULL-typed, so a small block with no matching ids
used to break the delta concat on zero-row inputs. See
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
from pypdfium2_ray.queries.dedup import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.similarity import *  # noqa: F401,F403,E501

# ---------------------------------------------------------------------------
# relational surface

def q_pricing_summary(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import lineitem_pricing_summary
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(lineitem_pricing_summary(sf_dir), ["n_rows"])


def q_orders_by_region(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import orders_by_region
    with _hint(sf_dir, "orders"):
        return _cast_i64(orders_by_region(sf_dir), ["n_orders"])


def q_top_orders(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import top_orders
    return top_orders(sf_dir)


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10-shaped top-20 customers by returned-item revenue
    (pipelines/relational.returned_revenue): fact x fact x dimension x
    tiny-dimension — four keyed exchanges (two pre-combined aggs, two
    repartition joins; customer scales so it is never broadcast),
    nation broadcast, partial-bound top-k, integer-exact revenue."""
    from pypdfium2_ray.pipelines.relational import returned_revenue
    with _hint(sf_dir, "lineitem"):
        return returned_revenue(sf_dir)


def _returned_revenue_sql() -> str:
    return """
WITH rev AS (
  SELECT o_custkey,
         sum((round(l_extendedprice*100))::BIGINT
             * (100 - (round(l_discount*100))::BIGINT))::BIGINT
           AS revenue_e4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' GROUP BY o_custkey)
SELECT c.c_custkey, c.c_name, n.n_name,
       (round(c.c_acctbal*100))::BIGINT AS acctbal_cents,
       r.revenue_e4
FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_e4 DESC, c.c_custkey LIMIT 20"""


def q_local_volume(sf_dir: str):
    """TPC-H Q5-shaped local-supplier volume (pipelines/relational.
    local_supplier_volume): per-nation revenue where supplier and
    customer share the nation, one region — three repartition joins
    (customer and supplier both scale, never broadcast), block-local
    partials before the orderkey exchange, single-block nation rollup."""
    from pypdfium2_ray.pipelines.relational import local_supplier_volume
    with _hint(sf_dir, "lineitem"):
        return local_supplier_volume(sf_dir)


def _local_volume_sql() -> str:
    return """
SELECT n_name,
       sum((round(l_extendedprice*100))::BIGINT
           * (100 - (round(l_discount*100))::BIGINT))::BIGINT AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name"""


def q_big_orders(sf_dir: str):
    """TPC-H Q18-shaped large-volume orders (pipelines/relational.
    big_orders): per-order quantity sum HAVING > 300, joined back to
    orders and customer — one pre-combined agg exchange + two
    repartition joins."""
    from pypdfium2_ray.pipelines.relational import big_orders
    with _hint(sf_dir, "lineitem"):
        return big_orders(sf_dir)


def _big_orders_sql() -> str:
    return """
WITH q AS (
  SELECT l_orderkey, sum((round(l_quantity*100))::BIGINT) AS qty_e2
  FROM lineitem GROUP BY l_orderkey
  HAVING sum((round(l_quantity*100))::BIGINT) > 30000)
SELECT c_custkey, c_name, o_orderkey,
       epoch_us(o_orderdate) AS orderdate_us,
       (round(o_totalprice*100))::BIGINT AS total_cents, qty_e2
FROM q JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey"""


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped conditional revenue per brand (pipelines/
    relational.brand_promo_revenue): promo-type vs total revenue as
    exact integers — per-partkey pre-combined exchange + one
    repartition join onto the scaling part dimension, single-block
    brand rollup."""
    from pypdfium2_ray.pipelines.relational import brand_promo_revenue
    with _hint(sf_dir, "lineitem"):
        return brand_promo_revenue(sf_dir)


def _promo_revenue_sql() -> str:
    return """
WITH rev AS (
  SELECT l_partkey,
         (round(l_extendedprice*100))::BIGINT
         * (100 - (round(l_discount*100))::BIGINT) AS rev
  FROM lineitem)
SELECT p_brand,
       sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)::BIGINT
         AS promo_rev_e4,
       sum(rev)::BIGINT AS total_rev_e4
FROM rev JOIN part ON l_partkey = p_partkey
GROUP BY p_brand"""


def q_user_event_pivot(sf_dir: str):
    """Long->wide pivot (stages/pivot.pivot_counts): one row per user
    with an int64 count column per event type. Label census is a
    no-exchange single-block rollup over the fixed type enum; the pivot
    is per-block (key,label) partials + ONE key exchange + a vectorized
    per-partition crosstab."""
    import ray.data as rd
    from pypdfium2_ray.stages.pivot import label_census, pivot_counts
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        labels = label_census(ev, "event_type")
        return pivot_counts(ev, "user_id", "event_type", labels)


def _user_event_pivot_sql() -> str:
    # labels fixed by the generator's event-type enum; the census is
    # oracle-checked implicitly (a missing/extra label changes the schema)
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{lb}')::BIGINT AS n_{lb}"
        for lb in ("click", "error", "purchase", "signup", "view"))
    return f"SELECT user_id,\n       {cols}\nFROM events GROUP BY user_id"


def q_type_distinct_users(sf_dir: str):
    """Exact per-type COUNT(DISTINCT user) (stages/agg.
    grouped_count_distinct): per-block pre-distinct on the (type, user)
    pair, ONE pair exchange, per-partition distinct+count partials,
    single-block combine over the fixed type enum. The sketch twin is
    distinct_users_hll; this is the exact tier."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_count_distinct
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        return grouped_count_distinct(ev, ["event_type"], "user_id",
                                      out="n_users",
                                      combine="single_block")


def q_value_moments(sf_dir: str):
    """Per-type second-order integer moments of (seconds-into-2024,
    value_e4) (stages/agg.grouped_moments): n / sum_x / sum_y / sum_xx /
    sum_yy / sum_xy — the associative partials behind variance,
    covariance, correlation and OLS slope, emitted as exact int64 sums
    (a float corr would hash-diverge across engines' summation orders).
    ZERO keyed exchanges: block partials + single-block enum combine."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_moments
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        x = pc.subtract(pc.divide(us, 1_000_000), 1_704_067_200)
        y = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "x": x, "y": y})

    with _hint(sf_dir, "events"):
        return grouped_moments(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["event_type"], "x", "y", combine="single_block")


def _value_moments_sql() -> str:
    return """
WITH m AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000 - 1704067200) AS x,
         (round(value * 10000))::BIGINT AS y
  FROM events)
SELECT event_type, count(*)::BIGINT AS n,
       sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
       sum(x*x)::BIGINT AS sum_xx, sum(y*y)::BIGINT AS sum_yy,
       sum(x*y)::BIGINT AS sum_xy
FROM m GROUP BY event_type"""


def q_user_pareto(sf_dir: str):
    """Pareto-maximal users under (activity, spend) dominance
    (stages/skyline): per-user (n_events, sum_value_e4) via one
    pre-combined key exchange, then the skyline filter — a two-level
    reduction with NO further exchange (any globally maximal point is
    maximal in its own block, so per-block fronts + one tiny combine)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.skyline import skyline
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "value_e4": y})

    with _hint(sf_dir, "events"):
        per_user = grouped_aggregate(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"],
            {"n_events": (None, "count"),
             "sum_value_e4": ("value_e4", "sum")})
        return skyline(per_user, "n_events", "sum_value_e4")


def _user_pareto_sql() -> str:
    return """
WITH u AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         sum((round(value*10000))::BIGINT)::BIGINT AS sum_value_e4
  FROM events GROUP BY user_id)
SELECT * FROM u p
WHERE NOT EXISTS (
  SELECT 1 FROM u q
  WHERE q.n_events >= p.n_events AND q.sum_value_e4 >= p.sum_value_e4
    AND (q.n_events > p.n_events OR q.sum_value_e4 > p.sum_value_e4))"""


def q_table_digest(sf_dir: str):
    """Bucketed anti-entropy digest (stages/digest.table_digest): per
    md5-bucket row count + XOR of row hashes over (doc_id, lang,
    n_chars) — equality of two sides' 64x3 digests certifies row-
    multiset equality without moving either table; a mismatch localizes
    repair to 1/64 of the keyspace. ZERO exchanges: per-block partials,
    single-block XOR combine, bit-identical at any partitioning."""
    from pypdfium2_ray.stages.digest import table_digest
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return table_digest(ds, ["doc_id", "lang", "n_chars"], n_buckets=64)


def _table_digest_sql() -> str:
    h = "md5_number_upper(doc_id::VARCHAR || '|' || lang || '|' || n_chars::VARCHAR)"
    return f"""
WITH d AS (
  SELECT ({h} % 64)::BIGINT AS bucket, (({h} >> 1))::BIGINT AS hv
  FROM documents)
SELECT b.range::BIGINT AS bucket, count(d.hv)::BIGINT AS n_rows,
       COALESCE(bit_xor(d.hv), 0)::BIGINT AS xor_hash
FROM range(64) b LEFT JOIN d ON d.bucket = b.range
GROUP BY b.range"""


def q_chars_ntile(sf_dir: str):
    """Global equi-depth decile of every doc under the (n_chars, doc_id)
    total order (stages/scan.ranged_prefix_sum with val=1: the exact
    exclusive global rank — two-phase range scan, ONE keyed exchange),
    then decile = rank*10 // N with N from the parquet footer (no
    scan). The global-window-function shape (NTILE) that hash groupby
    cannot express."""
    import pyarrow.parquet as pq
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    n_total = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def composite(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        c = pc.cast(t["n_chars"], pa.int64())
        if t.num_rows and (pc.max(d).as_py() >= 2 ** 33
                           or pc.max(c).as_py() >= 2 ** 29):
            raise ValueError("composite ntile key would overflow — "
                             "re-derive the shift widths")
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"doc_id": d, "n_chars": c, "one": one,
                         "ckey": pc.add(pc.shift_left(c, 33), d)})

    import numpy as np
    with _hint(sf_dir):
        ranked = ranged_prefix_sum(
            ds.map_batches(composite, batch_format="pyarrow"),
            "ckey", "one", out="rank0")

    def decile(t: pa.Table) -> pa.Table:
        r = t["rank0"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"],
                         "decile": pa.array(r * 10 // n_total, pa.int64())})

    return ranked.map_batches(decile, batch_format="pyarrow")


def _chars_ntile_sql() -> str:
    return """
SELECT doc_id, n_chars,
       (((row_number() OVER (ORDER BY n_chars, doc_id)) - 1) * 10
        // (SELECT count(*) FROM documents))::BIGINT AS decile
FROM documents"""


def q_sorted_layout(sf_dir: str):
    """TeraSort-style globally-ordered layout: every doc's exact global
    position under the (n_chars, doc_id) total order, with bucket
    boundaries from a DETERMINISTIC content-keyed sample
    (stages/scan.sample_boundaries — a pure function of the key set,
    identical at any run/partitioning/cluster size) instead of the
    linear min/max map — the balance fix for skewed keys; assignment
    monotonicity keeps exactness regardless. ONE keyed exchange plus
    the bounded sample pass."""
    import numpy as np
    from pypdfium2_ray.stages.scan import (ranged_prefix_sum,
                                           sample_boundaries)
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def composite(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        c = pc.cast(t["n_chars"], pa.int64())
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"doc_id": d, "n_chars": c, "one": one,
                         "ckey": pc.add(pc.shift_left(c, 33), d)})

    cds = ds.map_batches(composite, batch_format="pyarrow")
    with _hint(sf_dir):
        cuts = sample_boundaries(cds, "ckey", n_buckets=8, modulus=16)
        ranked = ranged_prefix_sum(cds, "ckey", "one", out="global_pos",
                                   boundaries=cuts)
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "n_chars", "global_pos"]),
        batch_format="pyarrow")


def _sorted_layout_sql() -> str:
    return """
SELECT doc_id, n_chars,
       ((row_number() OVER (ORDER BY n_chars, doc_id)) - 1)::BIGINT
         AS global_pos
FROM documents"""


def q_basket_pairs(sf_dir: str):
    """Market-basket pair support, top-20 (stages/basket.pair_support):
    co-purchased part pairs across orders — per-block pre-distinct, ONE
    basket exchange, output-sensitive vectorized diagonal pair sweep +
    per-partition pre-combine, ONE pair exchange, partial-bound top-k.
    Set semantics (duplicate items per basket count once)."""
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    from pypdfium2_ray.stages.topk import topk
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"])
    with _hint(sf_dir, "lineitem"):
        sup = pair_support(line, "l_orderkey", "l_partkey")
        return topk(sup, ["n_baskets", "item_a", "item_b"], 20,
                    descending=[True, False, False])


def _basket_pairs_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       count(*)::BIGINT AS n_baskets
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_baskets DESC, item_a, item_b LIMIT 20"""


def q_user_paths(sf_dir: str):
    """Ordered per-user journey strings (stages/sessionize.event_paths):
    each user's event types joined in (ts, event_id) order — ONE key
    exchange, one lexsort + pyarrow list-aggregate (encounter order ==
    sort order) + ONE binary_join per partition, zero per-key Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_paths
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return event_paths(ev)


def _user_paths_sql() -> str:
    return """
SELECT user_id, count(*)::BIGINT AS n_events,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id"""


def q_user_value_integral(sf_dir: str):
    """Per-user time-weighted value integral (stages/sessionize.
    time_weighted_sum): sum(dt_seconds x value_e4) over consecutive
    events, each interval weighted by its LEFT endpoint — the
    metering/billing aggregate (state held at v until the next change).
    ONE key exchange, whole-partition vectorized kernel; single-event
    users integrate to 0 and still emit."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_weighted_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return time_weighted_sum(
            ev.map_batches(prescale, batch_format="pyarrow"))


def _user_value_integral_sql() -> str:
    return """
WITH o AS (
  SELECT user_id, (round(value*10000))::BIGINT AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS tn
  FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       COALESCE(sum(((tn - t) // 1000000) * v), 0)::BIGINT
         AS integral_e4
FROM o GROUP BY user_id"""


def q_late_orders(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join (pipelines/relational.
    late_orders): orders per priority with >= 1 lineitem shipped > 60
    days after the order date. Decorrelated: EXISTS over a monotone
    predicate == per-orderkey MAX, so lineitem collapses to partials +
    one key exchange, one repartition join, vectorized filter,
    single-block enum count."""
    from pypdfium2_ray.pipelines.relational import late_orders
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(late_orders(sf_dir), ["n_late"])


def q_events_rollup(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import events_rollup
    with _hint(sf_dir, "events"):
        return _cast_i64(events_rollup(sf_dir), ["n_events"])


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (stages/window): per (hour, event_type)
    counters — the windowed-aggregate custom op."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.window import tumbling_window
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "event_type", "value"])
    with _hint(sf_dir, "events"):
        out = tumbling_window(ds, "ts", "hour", keys=["event_type"],
                              aggs={"n_events": (None, "count"),
                                    "sum_value_e4": ("value", "sum")})
    return _cast_i64(_scale_cols(out, {"sum_value_e4": 10_000}), ["n_events"])


def q_events_median(sf_dir: str):
    """Exact per-type median event value (stages/agg.grouped_median — the
    non-associative aggregate: one hash exchange, vectorized pandas median
    per partition)."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.agg import grouped_median
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])
    with _hint(sf_dir, "events"):
        out = grouped_median(ds, ["event_type"], "value",
                             out="median_value_e4")
    return _cast_i64(_scale_cols(out, {"median_value_e4": 10_000}), [])


def q_user_decay(sf_dir: str):
    """Recency-decayed per-user activity score (stages/agg.
    grouped_decay_sum): each event contributes value_e4 >> hours-back
    from the user's latest event (half-life 1h, shift-capped at 40) —
    exponential decay with exact integer semantics on both engines (a
    binary shift, never libm pow). ONE user exchange, two Cython
    groupby passes."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_decay_sum
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])
    with _hint(sf_dir, "events"):
        return grouped_decay_sum(ds, ["user_id"], "ts", "value")


def _user_decay_sql() -> str:
    return """
WITH e AS (SELECT user_id, ts, round(value * 10000)::BIGINT AS v,
                  max(ts) OVER (PARTITION BY user_id) AS latest
           FROM events)
SELECT user_id,
       sum(v // (1::BIGINT << least(
           (epoch_us(latest) - epoch_us(ts)) // 3600000000,
           40)))::BIGINT AS decay_e4
FROM e GROUP BY user_id"""


def _docs_v2(sf_dir: str):
    """Deterministic second crawl of the documents table: doc_id%9==4
    gone, doc_id%6==1 text-updated (' UPD'), doc_id%13==2 re-published
    under doc_id+1e7 (' NEWDOC') — every rule pure doc_id arithmetic so
    the oracle composes it in SQL."""
    import ray.data as rd

    def mutate(t: pa.Table) -> pa.Table:
        import numpy as np
        idn = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        base = t.filter(pa.array(idn % 9 != 4))
        bid = base["doc_id"].combine_chunks()
        bidn = bid.to_numpy(zero_copy_only=False)
        upd = pa.array(bidn % 6 == 1)
        text2 = pc.if_else(
            upd, pc.binary_join_element_wise(
                base["text"].combine_chunks(), " UPD", ""),
            base["text"].combine_chunks())
        v2 = pa.table({"doc_id": bid, "text": text2,
                       "lang": base["lang"], "source": base["source"]})
        new_m = pa.array(bidn % 13 == 2)
        nid = bid.filter(new_m)
        new = pa.table({
            "doc_id": pc.add(nid, 10_000_000),
            "text": pc.binary_join_element_wise(
                base["text"].combine_chunks().filter(new_m),
                " NEWDOC", ""),
            "lang": base["lang"].combine_chunks().filter(new_m),
            "source": base["source"].combine_chunks().filter(new_m)})
        return pa.concat_tables([v2, new])

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(mutate, batch_format="pyarrow")


_EXTRACT_COLS = ["url", "status", "err_code", "n_pages", "n_chars",
                 "extracted_text"]


def _v1_extract_cache(sf_dir: str) -> str:
    """The v1 crawl's extraction results persisted ONCE per sf_dir as
    parquet — the stored artifact a production incremental run reuses
    (the incremental_dedup persisted-state convention; idempotent
    temp-then-rename cache like _warc_corpus)."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_xv1_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    tmp = out + ".build"
    v1 = _extract(sf_dir, "range").select_columns(_EXTRACT_COLS)
    v1.write_parquet(tmp)
    os.replace(tmp, out)
    return out


def q_incremental_extract(sf_dir: str):
    """The incremental crawl round, composed end-to-end: fingerprint
    both snapshots (ids+hash only), snapshot_delta classifies each url,
    ONLY new/changed pages run the extraction stack (semi-join before
    the parser — the whole point of incrementality), unchanged urls
    reuse the persisted v1 results, and the union is the new extraction
    table. The ORACLE is the full recompute over the v2 documents —
    incremental must equal full, byte-exact per url, or the composition
    is wrong. Exchanges: 1 delta classify + 2 keys-only semi joins; the
    delta table is materialized once as the split point (production
    writes it to parquet instead)."""
    from functools import partial as _p

    import ray.data as rd
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import (
        documents_to_cc, read_cc_from_documents)
    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.snapshot import snapshot_delta

    def add_fp(t: pa.Table) -> pa.Table:
        fp = [md5_hash64(v) >> 1 for v in t["html"].to_pylist()]
        return pa.table({"url": t["url"],
                         "fingerprint": pa.array(fp, pa.int64())})

    v1_cc = read_cc_from_documents(sf_dir)
    v2_cc = _docs_v2(sf_dir).map_batches(documents_to_cc,
                                         batch_format="pyarrow")
    with _hint(sf_dir):
        delta = snapshot_delta(
            v1_cc.map_batches(add_fp, batch_format="pyarrow"),
            v2_cc.map_batches(add_fp, batch_format="pyarrow"),
            key="url").materialize()
        todo = delta.filter(
            expr="delta == 'new' or delta == 'changed'") \
            .select_columns(["url"])
        same = delta.filter(expr="delta == 'unchanged'") \
            .select_columns(["url"])
        prior = rd.read_parquet(_v1_extract_cache(sf_dir))
        reuse = key_filter_join(prior, same, "url", mode="semi",
                                tier="exchange")
        fresh_in = key_filter_join(v2_cc, todo, "url", mode="semi",
                                   tier="exchange")
        fresh = extract_pipeline(
            ds=fresh_in, skew_split=True,
            extract_opts=dict(strategy="range", include_pages=False,
                              include_rects=False,
                              layout=LayoutParams(page_width=1e9)))
    fresh = _cast_i64(fresh.select_columns(_EXTRACT_COLS),
                      ["err_code", "n_pages", "n_chars"])
    reuse = _cast_i64(reuse.select_columns(_EXTRACT_COLS),
                      ["err_code", "n_pages", "n_chars"])
    return reuse.union(fresh)


def q_merge_snapshot(sf_dir: str):
    """Changelog MERGE (stages/snapshot.apply_changelog — the
    upsert/delete incremental-materialization primitive of
    log-structured table formats): base snapshot + a deterministic
    synthetic changelog (updates for doc_id%5==0 at v1, deletes for
    doc_id%7==3 at v2, inserts keyed doc_id+1e7 for doc_id%11==0);
    per key the highest version wins, winning deletes drop the key.
    Union + ONE key exchange + vectorized keep-last kernel with a loud
    (key, version)-uniqueness contract."""
    from pypdfium2_ray.stages.snapshot import apply_changelog

    def as_base(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"], "text": t["text"],
            "version": pa.array(np.zeros(n, np.int64)),
            "op": pa.array(["upsert"] * n, pa.string())})

    def as_delta(t: pa.Table) -> pa.Table:
        import numpy as np
        ids = t["doc_id"].combine_chunks()
        txt = t["text"].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        upd_m = pa.array(idn % 5 == 0)
        n_upd = int((idn % 5 == 0).sum())
        upd = pa.table({
            "doc_id": ids.filter(upd_m),
            "text": pc.binary_join_element_wise(
                txt.filter(upd_m), " [v2]", ""),
            "version": pa.array(np.full(n_upd, 1, np.int64)),
            "op": pa.array(["upsert"] * n_upd, pa.string())})
        del_m = pa.array(idn % 7 == 3)
        n_del = int((idn % 7 == 3).sum())
        dele = pa.table({
            "doc_id": ids.filter(del_m),
            "text": pa.array([""] * n_del, pa.string()),
            # explicit string type: pa.array([]) of an empty Python
            # list is NULL-typed, and a small block can legitimately
            # contain no %7==3 ids — the concat below would then see
            # mismatched schemas (surfaced at 32-CPU block counts)
            "version": pa.array(np.full(n_del, 2, np.int64)),
            "op": pa.array(["delete"] * n_del, pa.string())})
        ins_m = pa.array(idn % 11 == 0)
        n_ins = int((idn % 11 == 0).sum())
        ins_ids = ids.filter(ins_m)
        ins = pa.table({
            "doc_id": pc.add(ins_ids, 10_000_000),
            "text": pc.binary_join_element_wise(
                "new doc ", pc.cast(ins_ids, pa.string()), ""),
            "version": pa.array(np.full(n_ins, 1, np.int64)),
            "op": pa.array(["upsert"] * n_ins, pa.string())})
        return pa.concat_tables([upd, dele, ins])

    base = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        as_base, batch_format="pyarrow")
    delta = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        as_delta, batch_format="pyarrow")
    with _hint(sf_dir):
        merged = apply_changelog(base, delta)

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "rev": pc.cast(t["version"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow")


def _merge_snapshot_sql() -> str:
    return """
WITH log AS (
  SELECT doc_id, text, 0 AS version, 'upsert' AS op FROM documents
  UNION ALL
  SELECT doc_id, text || ' [v2]', 1, 'upsert' FROM documents
  WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, '', 2, 'delete' FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id + 10000000, 'new doc ' || doc_id, 1, 'upsert'
  FROM documents WHERE doc_id % 11 = 0),
r AS (SELECT doc_id, text, version, op,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY version DESC) AS rn
      FROM log)
SELECT doc_id, version::BIGINT AS rev, length(text)::BIGINT AS n_chars
FROM r WHERE rn = 1 AND op = 'upsert'"""


def q_props_stats(sf_dir: str):
    """Semi-structured field projection + rollup over the events JSON
    props column: extract $.k with Arrow's C++ JSON block parser (the
    whole column joins to one newline-delimited buffer per block — rows
    never pass through Python objects; a loud guard rejects embedded
    newlines, which the corpus convention forbids), then the per-type
    enum rollup in the single-block combine tier."""
    import io

    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def extract(t: pa.Table) -> pa.Table:
        import pyarrow.json as pj
        pr = pc.fill_null(t["props"], "{}")
        if pc.any(pc.match_substring(pr, "\n")).as_py():
            raise ValueError("props values must be single-line JSON "
                             "for the block parse")
        payload = "\n".join(pr.to_pylist()).encode()
        parsed = pj.read_json(io.BytesIO(payload))
        return pa.table({"event_type": t["event_type"],
                         "k": pc.cast(parsed["k"], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "props"])
    ds = ds.map_batches(extract, batch_size=None, batch_format="pyarrow")
    return _cast_i64(grouped_aggregate(
        ds, ["event_type"],
        {"n_events": (None, "count"), "sum_k": ("k", "sum"),
         "min_k": ("k", "min"), "max_k": ("k", "max")},
        combine="single_block"), ["sum_k", "min_k", "max_k"])


def _props_stats_sql() -> str:
    return """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type"""


def q_lang_mode(sf_dir: str):
    """Per-source dominant language (stages/agg.grouped_mode): the
    modal lang per source with (count DESC, lang ASC) tie-break — the
    majority-label aggregate of mixture accounting. Per-block counts
    pre-combine, ONE source exchange, vectorized argmax kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mode
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["source", "lang"])
    with _hint(sf_dir):
        return grouped_mode(ds, ["source"], "lang",
                            out_val="mode_lang", out_n="n_docs")


def _lang_mode_sql() -> str:
    return """
WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
           FROM documents GROUP BY 1, 2),
r AS (SELECT source, lang, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rn
      FROM c)
SELECT source, lang AS mode_lang, n AS n_docs FROM r WHERE rn = 1"""


def q_user_gap_stats(sf_dir: str):
    """Per-user inter-arrival-time stats (stages/sessionize.gap_stats):
    gaps between consecutive events in ts order, integer microseconds
    end-to-end — the lead/lag window family as a batch aggregate
    (burstiness / bot-cadence features). Single-event users emit
    nothing; ONE user exchange, lexsort+diff+mask kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return gap_stats(ds)


def _user_gap_stats_sql() -> str:
    return """
WITH g AS (SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts) AS gap
           FROM events)
SELECT user_id, count(*)::BIGINT AS n_gaps, min(gap)::BIGINT AS min_gap_us,
       max(gap)::BIGINT AS max_gap_us, sum(gap)::BIGINT AS sum_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY user_id"""


def q_overlap_pairs(sf_dir: str):
    """Per-user interval OVERLAP join (intervals.overlap_join): events
    become sessions [ts, ts + (1 + value_e2 % 600) s); even event_ids
    are side A, odd side B; emit every same-user cross-side overlapping
    pair — the temporal-join primitive point-in-interval range joins
    cannot express. ONE user exchange + an output-sensitive vectorized
    offset sweep (pass d compares the partition shifted by d; monotone
    starts make the first empty pass a proof of completeness)."""
    import ray.data as rd
    from pypdfium2_ray.stages.intervals import overlap_join

    def to_iv(t: pa.Table) -> pa.Table:
        import numpy as np
        ts = t["ts"].combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view("int64")
        v = np.rint(t["value"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "s": pa.array(ts, pa.int64()),
            "e": pa.array(ts + (1 + v % 600) * 1_000_000, pa.int64()),
            "side": pa.array((eid % 2).astype(np.int8)),
            "event_id": t["event_id"]})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(to_iv, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return overlap_join(ds, "user_id", "s", "e", "side", "event_id")


def _overlap_pairs_sql() -> str:
    return """
WITH iv AS (SELECT event_id, user_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                     + (1 + (round(value*100))::BIGINT % 600) * 1000000
                     AS e
            FROM events),
a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
b AS (SELECT * FROM iv WHERE event_id % 2 = 1)
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM a JOIN b ON a.user_id = b.user_id
WHERE a.s < b.e AND b.s < a.e"""


def q_event_transitions(sf_dir: str):
    """Markov transition counts over per-user event streams
    (sessionize.transition_counts): every adjacent (prev_type,
    next_type) pair in (ts, event_id) order, summed across users — the
    sequence-mining aggregate (funnel checks one fixed pattern; this
    counts them all). ONE user exchange emitting per-partition partial
    pair counts; the enum-sized final combine is single-block."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import transition_counts
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    with _hint(sf_dir, "events"):
        return _cast_i64(transition_counts(ds), ["n"])


def _event_transitions_sql() -> str:
    return """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS prev_type, event_type AS next_type, count(*)::BIGINT AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2"""


def q_events_quartiles(sf_dir: str):
    """Exact per-type DISCRETE quartiles (agg.grouped_order_stats): the
    actual element at index q*(n-1)//4 under the (value, event_id)
    total order — real rows, no interpolation, so doubles hash-match
    the row_number twin bit-for-bit (interpolated quantiles would put
    IEEE expression order in the gate). One exchange, one vectorized
    gather kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_order_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value", "event_id"])
    with _hint(sf_dir, "events"):
        return grouped_order_stats(ds, ["event_type"], "value",
                                   tiebreak="event_id")


def _events_quartiles_sql() -> str:
    picks = ", ".join(
        f"max(CASE WHEN rn - 1 = {q} * (c - 1) // 4 THEN value END) AS q{q}"
        for q in (1, 2, 3))
    return f"""
WITH r AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS c
           FROM events)
SELECT event_type, {picks} FROM r GROUP BY event_type"""


def q_heavy_bigrams(sf_dir: str):
    """Exact heavy-hitter word bigrams across the corpus via the two-pass
    Misra-Gries sketch-then-verify op (stages/freq.heavy_hitters): blocks
    reduce to k counters, only candidates are re-counted exactly — the
    result is EXACT (hash-checked vs HAVING count >= ceil(frac*N)).
    k_sketch=2048 >= N/threshold = 1/frac, the documented completeness
    rule."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import explode_bigrams, heavy_hitters

    def make():
        return rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                               columns=["text"])             .map_batches(explode_bigrams, batch_size=None,
                         batch_format="pyarrow")
    with _hint(sf_dir):
        return heavy_hitters(make, "token", threshold_frac=0.001,
                             k_sketch=2048)


def q_distinct_users(sf_dir: str):
    """Exact count(distinct user_id) per event_type
    (stages/freq.grouped_distinct_count): per-block distinct pre-combine,
    ONE pair exchange, enum-keyed single-block count."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import grouped_distinct_count
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        return grouped_distinct_count(ds, ["event_type"], "user_id",
                                      combine="single_block")


def q_distinct_users_hll(sf_dir: str):
    """HyperLogLog tier of distinct_users: one 2^p-byte register row per
    (block, group) moves instead of the distinct pairs — the cardinality
    path when the pair exchange stops being affordable. Runs the
    ``hash="md5"`` tier so the ESTIMATE itself is SQL-exact (md5 registers,
    exact-integer harmonic sum, libm-twinned linear-counting correction —
    the Count-Min discipline applied to cardinality); the production
    ``hash="fast"`` tier is bound-tested in tests/test_freq.py."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import grouped_distinct_hll
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_distinct_hll(ds, ["event_type"], "user_id",
                                out="est_micro", combine="single_block",
                                hash="md5")


#: SQL twin of the md5 HLL tier (p=12): registers from md5_number_upper,
#: rho via bin() bit length, the harmonic sum as the EXACT integer
#: N = zeros*2^53 + sum(2^(53-rho)) in HUGEINT, and the same
#: double-expression estimate order as stages/freq._hll_estimate_micro.
_HLL_ORACLE = """
    WITH vals AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v
                  FROM events WHERE user_id IS NOT NULL),
    h AS (SELECT event_type, md5_number_upper(v) AS h FROM vals),
    rr AS (SELECT event_type, CAST(h >> 52 AS BIGINT) AS idx,
                  CASE WHEN (h & 4503599627370495::UBIGINT) = 0 THEN 53
                       ELSE 53 - length(bin(h & 4503599627370495::UBIGINT))
                  END AS rho
           FROM h),
    regs AS (SELECT event_type, idx, MAX(rho) AS m
             FROM rr GROUP BY event_type, idx),
    agg AS (SELECT event_type, COUNT(*) AS npres,
                   SUM(CAST(1::BIGINT << (53 - m) AS HUGEINT)) AS s
            FROM regs GROUP BY event_type),
    est AS (SELECT event_type, 4096 - npres AS zeros,
                   CAST(4096 - npres AS HUGEINT)
                     * 9007199254740992::HUGEINT + s AS n
            FROM agg)
    SELECT event_type,
           CAST(floor(CASE
                 WHEN ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                      * 9007199254740992.0 / CAST(n AS DOUBLE) <= 10240.0
                  AND zeros > 0
                 THEN 4096.0 * ln(4096.0 / zeros)
                 ELSE ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                      * 9007199254740992.0 / CAST(n AS DOUBLE)
               END * 1e6) AS BIGINT) AS est_micro
    FROM est"""


def q_events_median_sketch(sf_dir: str):
    """Approximate per-type median via the DETERMINISTIC log-bucket
    histogram sketch (stages/digest.grouped_quantile_hist — HdrHistogram
    power-of-2 bucketing): fixed bucket boundaries mean the merge is
    plain count addition, so unlike the t-digest tier the estimate is
    bit-identical at any block layout AND has an exact SQL twin
    (previously rows-only; guaranteed rel. error <= 2^-5 vs the true
    median). The t-digest tier (agg.grouped_quantile_sketch) remains the
    adaptive-precision default with its rank-error-bound tests
    (tests/test_tdigest.py); this is the whole-corpus quantile path
    where exact grouped_median's full-projection exchange is no longer
    affordable — only (type, bucket, count) rows ever move."""
    import ray.data as rd
    from pypdfium2_ray.stages.digest import grouped_quantile_hist
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_quantile_hist(ds, ["event_type"], "value", q=(1, 2),
                                 sub_bits=5, scale=100,
                                 out="median_est_micro",
                                 combine="single_block")  # fixed enum


def _events_median_sketch_sql(sub_bits: int = 5, scale: int = 100,
                              qnum: int = 1, qden: int = 2) -> str:
    """Twin of grouped_quantile_hist: the bucketing is pure integer
    arithmetic (bitlength via length(bin(x)) — the HLL oracle's trick),
    so cumulative-count rank selection reproduces the engine exactly."""
    return f"""
        WITH x AS (
          SELECT event_type,
                 CAST(floor(value * {scale}) AS BIGINT) AS x
          FROM events WHERE value IS NOT NULL),
        b AS (
          SELECT event_type, x,
                 CASE WHEN length(bin(x)) - 1 - {sub_bits} > 0
                      THEN length(bin(x)) - 1 - {sub_bits} ELSE 0
                 END AS e
          FROM x),
        bk AS (
          SELECT event_type, e, x >> e AS m, count(*)::BIGINT AS c
          FROM b GROUP BY 1, 2, 3),
        r AS (
          SELECT event_type, c, (m << e) AS lo,
                 ((m << e) + (((m + 1) << e) - 1)) // 2 AS rep,
                 sum(c) OVER (PARTITION BY event_type
                              ORDER BY (m << e)) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS w
          FROM bk),
        sel AS (
          SELECT event_type, rep,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY lo) AS rn
          FROM r WHERE cum >= ((w - 1) * {qnum}) // {qden} + 1)
        SELECT event_type,
               CAST(rep * 1000000 // {scale} AS BIGINT)
                 AS median_est_micro
        FROM sel WHERE rn = 1"""


def q_path_census(sf_dir: str):
    """URL path-prefix census (stages/pathcensus.path_prefix_census):
    page counts per path prefix at every depth — per-DEPTH vectorized
    prefix build (bounded loop over levels, never rows), pre-combined
    partials, ONE prefix exchange, loud max_depth truncation. Planted
    3-level paths /cat{id%5}/sub{id%17}/p{id} behind a real
    scheme+host (exercising the scheme strip)."""
    from pypdfium2_ray.stages.pathcensus import path_prefix_census

    def to_urls(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        m5 = pc.subtract(did, pc.multiply(pc.divide(did, 5), 5))
        m17 = pc.subtract(did, pc.multiply(pc.divide(did, 17), 17))
        url = pc.binary_join_element_wise(
            "https://", pc.cast(t["source"], pa.string()),
            "/cat", pc.cast(m5, pa.string()),
            "/sub", pc.cast(m17, pa.string()),
            "/p", pc.cast(did, pa.string()), "")
        return pa.table({"url": url})

    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        to_urls, batch_format="pyarrow")
    with _hint(sf_dir):
        return path_prefix_census(ds, max_depth=8)


def _path_census_sql() -> str:
    return """
        WITH pref AS (
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR) AS prefix,
                 1 AS depth FROM documents
          UNION ALL
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
                 || '/sub' || CAST(doc_id % 17 AS VARCHAR), 2
          FROM documents
          UNION ALL
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
                 || '/sub' || CAST(doc_id % 17 AS VARCHAR)
                 || '/p' || CAST(doc_id AS VARCHAR), 3
          FROM documents)
        SELECT prefix, depth::BIGINT AS depth,
               count(*)::BIGINT AS n_pages
        FROM pref GROUP BY prefix, depth"""


VOCAB_MIN_COUNT = 2


#: oov_rate: vocabulary size for the per-doc OOV accounting
OOV_K = 20


def q_oov_rate(sf_dir: str):
    """Per-doc out-of-vocabulary counts against the corpus's own top-20
    token vocabulary (stages/vocab.oov_counts): census exchange +
    partial-bound top-k + a broadcast k-token set, then a ZERO-exchange
    per-block doc rollup — how much of each document a k-token
    vocabulary fails to cover (tokenizer sizing / quality signal)."""
    from pypdfium2_ray.stages.vocab import oov_counts
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return oov_counts(ds, vocab_k=OOV_K)


def _oov_rate_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '{ws}'))
               AS token FROM documents),
cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY token),
vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT {OOV_K})
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum((token NOT IN (SELECT token FROM vocab))::INT)::BIGINT AS n_oov
FROM tok GROUP BY doc_id"""


def q_vocab_coverage(sf_dir: str):
    """Tokenizer-prep vocabulary table (stages/vocab.vocab_coverage):
    exact global token census (per-block Counter pre-combine, ONE token
    exchange), (cnt DESC, token ASC) total-order ranks, EXACT integer
    cumulative coverage (cum_cnt/total_cnt, denominator counting
    below-cut occurrences from the same census — nothing rescans the
    corpus). The post-cut ordered scan is single-partition by design
    with a loud ceiling (heavy-hitter bound <= occurrences/min_count)."""
    from pypdfium2_ray.stages.vocab import vocab_coverage
    ds = _docs(sf_dir, ["text"])
    with _hint(sf_dir):
        return vocab_coverage(ds, min_count=VOCAB_MIN_COUNT)


def _vocab_coverage_sql() -> str:
    return f"""
        WITH tok AS (SELECT unnest(regexp_extract_all(text,
                       '[^ \t\r\n\f\v]+')) AS token FROM documents
                     WHERE text IS NOT NULL),
        cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok
                GROUP BY token),
        tot AS (SELECT sum(c)::BIGINT AS t FROM cnt),
        v AS (SELECT token, c,
                     row_number() OVER (ORDER BY c DESC, token) AS rank,
                     sum(c) OVER (ORDER BY c DESC, token
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM cnt WHERE c >= {VOCAB_MIN_COUNT})
        SELECT rank::BIGINT AS rank, token, c AS cnt,
               cum::BIGINT AS cum_cnt, (SELECT t FROM tot) AS total_cnt
        FROM v"""


def q_interval_coverage(sf_dir: str):
    """Gaps-and-islands interval merge (stages/intervals
    .interval_coverage): per-user overlap-merged coverage of synthetic
    watch-windows [ts, ts + (event_id%120+30) min] — islands split where
    s > running max(e) (touching merges), covered = sum of island
    spans. ONE user exchange; kernel is lexsort + Cython groupby.cummax
    + reduceat, int64 µs end to end."""
    import ray.data as rd
    from pypdfium2_ray.stages.intervals import interval_coverage

    def to_iv(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        eid = pc.cast(t["event_id"], pa.int64())
        rem = pc.subtract(eid, pc.multiply(pc.divide(eid, 120), 120))
        mins = pc.add(rem, 30)
        dur = pc.multiply(mins, pa.scalar(60_000_000, pa.int64()))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "s": s, "e": pc.add(s, dur)})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"]
                         ).map_batches(to_iv, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        out = interval_coverage(ds, key_col="user_id")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["user_id", "n_islands", "covered"])

    return out.map_batches(rename, batch_format="pyarrow")


def _interval_coverage_sql() -> str:
    return """
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                           epoch_us(ts) + (event_id % 120 + 30)
                             * 60 * 1000000 AS e
                    FROM events),
        m AS (SELECT user_id, s, e,
                     CASE WHEN max(e) OVER w IS NULL
                               OR s > max(e) OVER w
                          THEN 1 ELSE 0 END AS ni
              FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING)),
        isl AS (SELECT user_id, s, e,
                       sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS island
                FROM m),
        per AS (SELECT user_id, island, max(e) - min(s) AS cov
                FROM isl GROUP BY user_id, island)
        SELECT user_id, count(*)::BIGINT AS n_islands,
               sum(cov)::BIGINT AS covered
        FROM per GROUP BY user_id"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered conversion funnel (stages/funnel.funnel): deepest
    view->click->purchase stage per user with STRICT chaining (each step
    strictly after the previous step's first time), convert_us for full
    conversions (-1 sentinel otherwise — no NULLs, the driver gate
    cannot order mixed-null columns). Events pre-filtered to step types
    and projected to (user, step, int64 µs) before the ONE user
    exchange; the kernel is chained groupby-min/merge pandas, int64
    throughout (reindex fills are int64 MAX, never NaN — the
    bigint-float trap)."""
    import ray.data as rd
    from pypdfium2_ray.stages.funnel import funnel
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    with _hint(sf_dir, "events"):
        return funnel(ds, steps=FUNNEL_STEPS)


def _funnel_sql() -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
        WITH e AS (SELECT user_id, event_type, ts FROM events
                   WHERE event_type IN ('{s1}', '{s2}', '{s3}')),
        t1 AS (SELECT user_id, min(ts) AS ts1 FROM e
               WHERE event_type = '{s1}' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM e
               JOIN t1 USING (user_id)
               WHERE event_type = '{s2}' AND e.ts > t1.ts1
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM e
               JOIN t2 USING (user_id)
               WHERE event_type = '{s3}' AND e.ts > t2.ts2
               GROUP BY e.user_id),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT u.user_id,
               (CASE WHEN ts3 IS NOT NULL THEN 3
                     WHEN ts2 IS NOT NULL THEN 2
                     WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS stage,
               COALESCE(epoch_us(ts3) - epoch_us(ts1), -1)::BIGINT
                 AS convert_us
        FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
               LEFT JOIN t3 USING (user_id)"""


def q_session_stats(sf_dir: str):
    """Per-session aggregates: sessionize (gap 30 min) then group by
    (user, session) — event count and session span in seconds. The classic
    session-window aggregate, composed from the session-id op + the
    partial/combine aggregation."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.sessionize import sessionize
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    with _hint(sf_dir, "events"):
        s = sessionize(ds, key="user_id", ts_col="ts", gap_s=1800)
        out = grouped_aggregate(s, ["user_id", "session_id"], {
            "n_events": (None, "count"),
            "t_min": ("ts", "min"),
            "t_max": ("ts", "max")})

    def span(t: pa.Table) -> pa.Table:
        dur = pc.divide(pc.cast(pc.subtract(
            pc.cast(t["t_max"], pa.int64()),
            pc.cast(t["t_min"], pa.int64())), pa.int64()), 1_000_000)
        return pa.table({"user_id": t["user_id"],
                         "session_id": t["session_id"],
                         "n_events": pc.cast(t["n_events"], pa.int64()),
                         "span_s": pc.cast(dur, pa.int64())})
    return out.map_batches(span, batch_format="pyarrow")


#: value buckets for the range-join query: [lo, hi) -> bucket id.
#: SQL VALUES and the broadcast interval table are generated from THIS list
#: so the two sides cannot drift.
VALUE_BUCKETS = [(i, float(i * 50), float((i + 1) * 50)) for i in range(20)]


def q_events_value_bucket(sf_dir: str):
    """Range join (stages/rangejoin): events.value -> containing bucket
    interval (broadcast interval table + searchsorted), then counts."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.rangejoin import range_join
    intervals = pa.table({
        "bucket": pa.array([b for b, _, _ in VALUE_BUCKETS], pa.int64()),
        "lo": pa.array([lo for _, lo, _ in VALUE_BUCKETS]),
        "hi": pa.array([hi for _, _, hi in VALUE_BUCKETS]),
    })
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "value"])
    joined = range_join(ds, intervals, value_col="value")
    with _hint(sf_dir, "events"):
        return grouped_aggregate(joined, ["bucket"],
                                 {"n_events": (None, "count")},
                                 combine="single_block")  # fixed buckets


def q_asof_last_purchase(sf_dir: str):
    """As-of join (stages/asof): each click event joined to the same
    user's most recent strictly-earlier purchase event."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.asof import asof_join

    def read_type(et, rename=None):
        ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])
        ds = ds.map_batches(
            lambda t, et=et: t.filter(pc.equal(t["event_type"], et))
                              .drop_columns(["event_type"]),
            batch_format="pyarrow")
        if rename:
            ds = ds.map_batches(
                lambda t: t.rename_columns([rename.get(c, c)
                                            for c in t.column_names]),
                batch_format="pyarrow")
        return ds

    left = read_type("click").map_batches(
        lambda t: t.drop_columns(["value"]), batch_format="pyarrow")
    right = read_type("purchase",
                      rename={"event_id": "p_event_id", "value": "p_value_e4"})
    with _hint(sf_dir, "events"):
        out = asof_join(left, right, by="user_id", on="ts")
    return _scale_cols(out, {"p_value_e4": 10_000})




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
