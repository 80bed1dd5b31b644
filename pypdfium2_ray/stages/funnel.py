"""Ordered-funnel analysis — stage progression per user within an event
stream (view -> click -> purchase), the conversion report shape.

Semantics (deterministic, strict ordering): ``t1`` = the user's earliest
step-1 event; ``t_{k+1}`` = the earliest step-(k+1) event STRICTLY after
``t_k``. ``stage`` = deepest step reached; ``convert_us`` = ``t_last -
t_1`` in microseconds for full conversions, ``-1`` otherwise (an int
sentinel, never NULL — the driver gate cannot order mixed-null
columns). The population is users with at least one event of ANY step
type, so a user who clicked without viewing reports stage 0 rather than
disappearing.

Distributed shape: the event stream is pre-filtered to the step types
and projected to ``(user:int64, step:int8, ts_us:int64)`` — then ONE
hash exchange on user and a per-partition kernel that is pure pandas
groupby-min / merge chains (no per-user Python). Timestamps convert to
int64 microseconds before the exchange, so every comparison is exact
integer. Funnels longer than 3 steps chain the same merge once per
extra step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map


def _prefilter(steps: tuple, user_col: str, type_col: str, ts_col: str):
    def fn(t: pa.Table) -> pa.Table:
        step_of = {s: i for i, s in enumerate(steps)}
        mask = pc.is_in(t[type_col], value_set=pa.array(list(steps)))
        t = t.filter(mask)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        idx = pc.index_in(t[type_col].combine_chunks(),
                          value_set=pa.array(list(steps)))
        return pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "step": pc.cast(idx, pa.int8()),
            "ts_us": ts})

    return fn


def _kernel(n_steps: int):
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "stage": pa.array([], pa.int64()),
                             "convert_us": pa.array([], pa.int64())})
        df = t.to_pandas()
        users = pd.Index(np.unique(df["user"].to_numpy()))
        # chained strict-after mins: one groupby-min + one aligned filter
        # per step — vectorized across all users in the partition
        prev: pd.Series | None = None
        firsts: list[pd.Series] = []
        for k in range(n_steps):
            sub = df[df["step"] == k]
            if prev is not None:
                # int64 MAX fill keeps the comparison in exact int64 —
                # a NaN fill would coerce the column to float64, which
                # cannot represent post-2262-era... or any >2^53 int64
                # exactly (the repo's standing bigint-float trap)
                bound = prev.reindex(
                    sub["user"].to_numpy(),
                    fill_value=np.int64(np.iinfo(np.int64).max)).to_numpy()
                sub = sub[sub["ts_us"].to_numpy() > bound]
            cur = sub.groupby("user")["ts_us"].min()
            firsts.append(cur)
            prev = cur
        stage = np.zeros(len(users), np.int64)
        for k, cur in enumerate(firsts):
            stage[users.isin(cur.index)] = k + 1
        zero = np.int64(0)                    # same trap: no NaN floats
        t1 = firsts[0].reindex(users, fill_value=zero).to_numpy()
        tl = firsts[-1].reindex(users, fill_value=zero).to_numpy()
        full = stage == n_steps
        convert = np.where(full, tl - t1, -1).astype(np.int64)
        return pa.table({"user_id": pa.array(users.to_numpy(), pa.int64()),
                         "stage": pa.array(stage, pa.int64()),
                         "convert_us": pa.array(convert, pa.int64())})

    return fn


def funnel(ds, steps: tuple = ("view", "click", "purchase"),
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts", num_partitions: int | None = None):
    """Dataset[(user_id, stage, convert_us)] — see module docstring.
    ``steps`` must be distinct; stage k requires an event of step k
    strictly after the user's step-(k-1) time."""
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    rows = ds.map_batches(_prefilter(tuple(steps), user_col, type_col,
                                     ts_col),
                          batch_format="pyarrow")
    return partition_map(rows, ["user"], _kernel(len(steps)),
                         num_partitions=num_partitions)
