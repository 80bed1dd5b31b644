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


def hopping_window(ds, ts_col: str, size_s: int, hop_s: int,
                   keys: list[str] | None = None,
                   aggs: dict[str, tuple[str | None, str]] | None = None,
                   window_col: str = "window_start"):
    """Hopping (sliding) window aggregate: windows of ``size_s`` seconds
    every ``hop_s`` seconds (``size_s % hop_s == 0``); each event lands in
    ``size_s / hop_s`` windows. The fan-out is a vectorized numpy repeat
    inside ``map_batches`` (each row replicated once per covering window
    with its window start attached), then the same partial+combine grouped
    aggregation as the tumbling path — the replication happens BEFORE the
    partial, so the exchange still only moves per-block aggregates.

    Window starts are epoch-aligned (``floor(ts / hop) * hop`` walking
    back ``size/hop`` hops), identical to the SQL oracle's
    ``to_timestamp(floor(epoch(ts)/hop)*hop - k*hop)`` construction.
    """
    keys = keys or []
    aggs = aggs or {"n_rows": (None, "count")}
    fanned = hopping_fan_out(ds, ts_col, size_s, hop_s, window_col)
    return grouped_aggregate(fanned, [window_col] + keys, aggs)


def hopping_fan_out(ds, ts_col: str, size_s: int, hop_s: int,
                    window_col: str = "window_start"):
    """The hopping-window REPLICATION alone (each row repeated once per
    covering window with its epoch-aligned window start attached) —
    exposed so non-associative window aggregates compose with it (e.g.
    per-window exact distinct counts via ``freq.grouped_distinct_count``,
    which needs the raw pairs, not pre-aggregated partials)."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    n_windows = size_s // hop_s

    import numpy as np

    def fan_out(t: pa.Table) -> pa.Table:
        # normalize to microseconds FIRST: the raw int64 view of a
        # timestamp column is in the column's own unit (a timestamp[ns]
        # input would make the us-based hop grid 1000x too fine, silently)
        ts_us = t[ts_col].combine_chunks().cast(pa.timestamp("us"))
        epoch_us = ts_us.cast(pa.int64()).to_numpy(zero_copy_only=False)
        hop_us = hop_s * 1_000_000
        last_start = (epoch_us // hop_us) * hop_us
        # starts for k = 0..n_windows-1: last_start - k*hop (vectorized grid)
        ks = np.arange(n_windows, dtype=np.int64) * hop_us
        starts = (last_start[:, None] - ks[None, :]).reshape(-1)
        idx = np.repeat(np.arange(len(epoch_us), dtype=np.int64), n_windows)
        out = t.take(pa.array(idx))
        return out.append_column(
            window_col, pa.array(starts, pa.int64()).cast(pa.timestamp("us")))

    return ds.map_batches(fan_out, batch_format="pyarrow")


def rolling_window_sum(ds, key_col: str, time_col: str, val_col: str,
                       window: int, out: str = "rolling_sum",
                       num_partitions: int | None = None):
    """Trailing-window sum per key: for each row, the sum of *val_col*
    over the key's rows with ``time in [t - window + 1, t]`` — the
    ``sum(v) OVER (PARTITION BY key ORDER BY t RANGE BETWEEN window-1
    PRECEDING AND CURRENT ROW)`` analogue. *time_col* must be
    non-negative integers with one row per (key, time); *val_col* int64.

    ONE hash exchange on the key, then a fully vectorized kernel: sort by
    (key, t), inclusive prefix sums, and ONE ``np.searchsorted`` over the
    composite key ``key * 2^33 + t`` finds every row's window start — no
    per-key Python even with millions of keys in a partition. The 2^33
    spacing guarantees ``comp - (window-1)`` can never land inside the
    previous key's range for any t, window < 2^32; keys must be
    non-negative < 2^30 (composite stays in int64)."""
    import numpy as np

    from pypdfium2_ray.stages.exchange import partition_map

    assert 0 < window < (1 << 32)

    def kernel(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        tm = pc.cast(t[time_col], pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tm, k))
        k_s, t_s, v_s = k[order], tm[order], v[order]
        comp = k_s * (1 << 33) + t_s
        cum = np.cumsum(v_s)
        lo = np.searchsorted(comp, comp - (window - 1), side="left")
        win = cum - np.where(lo > 0, cum[lo - 1], 0)
        # rows before index 0 contribute nothing; lo==0 means the window
        # starts at the array head (cum[-1] guard above)
        res = t.take(pa.array(order))
        return res.append_column(out, pa.array(win, pa.int64()))

    return partition_map(ds, [key_col], kernel,
                         num_partitions=num_partitions)
