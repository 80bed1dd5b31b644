"""Shuffle-minimizing grouped aggregation (partial + combine).

The reference aggregates only trivially (per-run counters,
``cli/pageobjects.py:84-124``, ``cli/fonts.py:60-77``); at 100 TB a naive
``ds.groupby(keys).aggregate(...)`` shuffles every row. This stage pushes the
aggregation *partial* into a ``map_batches`` combiner (pyarrow ``group_by``
per block — vectorized, zero Python rows), so the wide exchange only moves
``n_blocks x n_groups`` partial rows; the final combine is a tiny
``groupby().map_groups``.

SURVEY §2.5 A-new ("partial+final: per-batch partials in the actor ->
groupby") and the guide's pre-aggregation pattern.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

#: supported aggregation kinds -> (partial pyarrow agg fns, combine, finalize)
_KINDS = ("sum", "count", "min", "max", "mean")


def grouped_aggregate(ds, keys: list[str], specs: dict[str, tuple[str | None, str]],
                      batch_format: str = "pyarrow"):
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
        gb = batch.group_by(keys, use_threads=False).aggregate(aggs)
        return gb

    partials = ds.map_batches(partial, batch_format=batch_format)

    # pyarrow names aggregates "{col}_{fn}" and "count_all"
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        for out, (col, kind) in specs.items():
            if kind == "sum":
                row[out] = [g[f"{col}_sum"].sum()]
            elif kind == "count":
                row[out] = [int(g["count_all"].sum())]
            elif kind == "mean":
                row[out] = [g[f"{col}_sum"].sum() / g[f"{col}_count"].sum()]
            elif kind == "min":
                row[out] = [g[f"{col}_min"].min()]
            elif kind == "max":
                row[out] = [g[f"{col}_max"].max()]
        return pd.DataFrame(row)

    return partials.groupby(keys).map_groups(combine, batch_format="pandas")
