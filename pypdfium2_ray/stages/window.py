"""Tumbling-window aggregation over an event-time column.

The reference has no streaming concepts (SURVEY §2.9); training-data and
telemetry pipelines need at least fixed (tumbling) windows. A tumbling
window over already-materialized data is a pure composition: vectorized
``floor_temporal`` to assign each row its window start, then the
partial+combine grouped aggregation of :mod:`pypdfium2_ray.stages.agg` —
no custom exchange, no watermark state (batch semantics; late data is
just data).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate

#: floor_temporal units accepted (matching DuckDB date_trunc granularities)
UNITS = ("minute", "hour", "day", "week", "month")


def tumbling_window(ds, ts_col: str, unit: str = "hour",
                    keys: list[str] | None = None,
                    aggs: dict[str, tuple[str | None, str]] | None = None,
                    window_col: str = "window_start"):
    """Aggregate per (window, *keys*). ``aggs`` as in grouped_aggregate."""
    if unit not in UNITS:
        raise ValueError(f"unit must be one of {UNITS}")
    keys = keys or []
    aggs = aggs or {"n_rows": (None, "count")}

    def assign(t: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(t[ts_col], unit=unit)
        return t.append_column(window_col, ws)

    windowed = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_aggregate(windowed, [window_col] + keys, aggs)
