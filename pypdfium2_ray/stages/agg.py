"""Shuffle-minimizing grouped aggregation (partial + combine).

The reference aggregates only trivially (per-run counters,
``cli/pageobjects.py:84-124``, ``cli/fonts.py:60-77``); at 100 TB a naive
``ds.groupby(keys).aggregate(...)`` shuffles every row. This stage pushes the
aggregation *partial* into a ``map_batches`` combiner (pyarrow ``group_by``
per block — vectorized, zero Python rows), so the wide exchange only moves
``n_blocks x n_groups`` partial rows; the final combine is a hash-partitioned
``map_batches`` running ONE pyarrow ``group_by`` per partition — vectorized
even at billions of groups (no per-group Python calls; see
``stages/exchange.partition_map``).

SURVEY §2.5 A-new ("partial+final: per-batch partials in the actor ->
groupby") and the guide's pre-aggregation pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

#: supported aggregation kinds
_KINDS = ("sum", "count", "min", "max", "mean")


def grouped_aggregate(ds, keys: list[str], specs: dict[str, tuple[str | None, str]],
                      batch_format: str = "pyarrow",
                      num_partitions: int | None = None):
    """Grouped aggregation with per-block partials.

    ``specs``: ``out_name -> (column, kind)`` with kind in
    ``{"sum","count","min","max","mean"}``; ``count`` is row count
    (column ignored, may be None). Output columns are exactly
    ``keys + list(specs)`` — name them to match the SQL oracle.
    """
    for out, (_col, kind) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported agg kind {kind!r} for {out!r}")

    # --- partial: one pyarrow group_by per block -------------------------
    # partial columns: "{col}_{fn}" (means need sum + per-column valid count:
    # SQL AVG skips nulls, so dividing by the all-rows count would diverge
    # on null-bearing columns)
    partial_aggs: list[tuple[str, str]] = []   # (col, fn) for pa group_by, unique
    need_count_all = any(kind == "count" for (_c, kind) in specs.values())

    for out, (col, kind) in specs.items():
        fn = {"sum": "sum", "mean": "sum", "min": "min", "max": "max"}.get(kind)
        if fn and (col, fn) not in partial_aggs:
            partial_aggs.append((col, fn))
        if kind == "mean" and (col, "count") not in partial_aggs:
            partial_aggs.append((col, "count"))   # valid (non-null) count

    def partial(batch: pa.Table) -> pa.Table:
        aggs = list(partial_aggs)
        if need_count_all:
            aggs.append(([], "count_all"))
        return batch.group_by(keys, use_threads=False).aggregate(aggs)

    partials = ds.map_batches(partial, batch_format=batch_format)

    # --- combine: hash-partition partials on keys, then one vectorized
    # pyarrow group_by per partition (pyarrow names partials "{col}_{fn}";
    # re-aggregating appends the combine fn: "{col}_sum_sum" etc.)
    combine_aggs: list[tuple[str, str]] = []
    for col, fn in partial_aggs:
        comb = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[fn]
        combine_aggs.append((f"{col}_{fn}", comb))
    if need_count_all:
        combine_aggs.append(("count_all", "sum"))

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate(combine_aggs)
        cols = {k: g[k] for k in keys}
        for out, (col, kind) in specs.items():
            if kind == "sum":
                cols[out] = g[f"{col}_sum_sum"]
            elif kind == "count":
                cols[out] = pc.cast(g["count_all_sum"], pa.int64())
            elif kind == "mean":
                cols[out] = pc.divide(
                    pc.cast(g[f"{col}_sum_sum"], pa.float64()),
                    pc.cast(g[f"{col}_count_sum"], pa.float64()))
            elif kind == "min":
                cols[out] = g[f"{col}_min_min"]
            elif kind == "max":
                cols[out] = g[f"{col}_max_max"]
        return pa.table(cols)

    return partition_map(partials, keys, combine,
                         num_partitions=num_partitions)


def grouped_median(ds, keys: list[str], col: str, out: str = "median",
                   num_partitions: int | None = None):
    """Exact per-group median — a NON-associative aggregate, so no
    partial/combine split exists: every group's rows must colocate. One
    hash exchange (``partition_map``) then a single pandas
    ``groupby().median()`` per partition (Cython-vectorized, not a Python
    call per group). Even-sized groups average the middle two values,
    matching SQL ``median()`` over numerics.

    Scale note: this moves the full (keys, col) projection through the
    exchange — select those columns upstream; for sketch-based quantiles
    at whole-corpus scale, a t-digest partial would go in
    :func:`grouped_aggregate` instead."""
    import pandas as pd

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, dropna=False)[col].median().reset_index()
        return g.rename(columns={col: out})

    proj = ds.select_columns(keys + [col])
    return partition_map(proj, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)
