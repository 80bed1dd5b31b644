"""Range (interval) join against a broadcast interval table.

An operator Ray Data lacks: assign each row the interval(s) containing its
value. For the common case — a SMALL interval dimension (bucket tables,
SLA tiers, price bands) — the scale-correct plan is a broadcast, not a
shuffle: ship the sorted interval table once (``ray.put``), and per batch
do one vectorized ``np.searchsorted`` over the interval starts.

Assumes non-overlapping intervals sorted by ``lo`` (validated at build
time); rows outside every interval are dropped (inner) or kept with nulls
(left). For large interval sides, pre-bucket both sides by a coarse grid
and use groupby — not needed here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _RangeJoiner:
    def __init__(self, intervals_ref, value_col: str, lo_col: str,
                 hi_col: str, join_type: str):
        import ray
        t = ray.get(intervals_ref) if isinstance(intervals_ref, ray.ObjectRef) else intervals_ref
        idx = np.argsort(t[lo_col].to_numpy())
        self.lo = t[lo_col].to_numpy()[idx].astype(np.float64)
        self.hi = t[hi_col].to_numpy()[idx].astype(np.float64)
        if (self.hi[:-1] > self.lo[1:]).any():
            raise ValueError("intervals overlap — range join requires "
                             "non-overlapping intervals")
        self.payload = t.take(pa.array(idx)).drop_columns([lo_col, hi_col])
        self.value_col = value_col
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch[self.value_col].to_numpy().astype(np.float64)
        pos = np.searchsorted(self.lo, v, side="right") - 1
        valid = (pos >= 0) & (v < self.hi[np.clip(pos, 0, None)])
        if self.join_type == "inner":
            batch = batch.filter(pa.array(valid))
            pos = pos[valid]
            take = pa.array(pos.astype(np.int64))
        else:
            take = pa.array([int(p) if ok else None
                             for p, ok in zip(pos, valid)], pa.int64())
        matched = self.payload.take(take)
        for name in matched.column_names:
            batch = batch.append_column(name, matched[name])
        return batch


def range_join(ds, intervals: pa.Table, value_col: str, lo_col: str = "lo",
               hi_col: str = "hi", join_type: str = "inner", **mb_kwargs):
    """Join rows of ``ds`` to the interval of *intervals* containing
    ``value_col`` (half-open ``[lo, hi)``); interval payload columns are
    appended. Broadcast once, vectorized searchsorted per batch."""
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    ref = ray.put(intervals)
    return ds.map_batches(
        warm_task(_RangeJoiner, intervals_ref=ref, value_col=value_col,
                  lo_col=lo_col, hi_col=hi_col, join_type=join_type),
        batch_format="pyarrow", **mb_kwargs)
