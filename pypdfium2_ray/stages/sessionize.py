"""Gap-based sessionization — per-key ordered stateful computation.

Assign each event a session id that increments whenever the gap to the
user's previous event exceeds ``gap``: the classic clickstream session
operator (no reference analogue; SURVEY §2.9 noted the reference has no
streaming concepts — this is the batch form every telemetry pipeline
needs).

Plan: one hash exchange (``exchange.partition_map`` on *key*) colocates
each key's events; the whole partition is then processed by ONE
vectorized kernel (sort by (key, ts), diff + cumsum with key-boundary
reset — no per-group Python calls, which at billions of users would be
billions of interpreter calls under ``map_groups``). Same partitioning
assumption as the as-of join: one key's events fit one worker.
"""

from __future__ import annotations

import pandas as pd


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0, out_col: str = "session_id",
               num_partitions: int | None = None):
    """Append ``out_col``: 0-based session index per *key*, new session when
    the time since the previous event exceeds ``gap_s`` seconds."""
    from pypdfium2_ray.stages.exchange import partition_map
    gap = pd.Timedelta(seconds=gap_s)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        # vectorized over the whole partition: a "new session" is a gap
        # break within a key; the first row of each key always starts
        # session 0 (key-boundary rows are masked out of the gap test)
        same_key = df[key].eq(df[key].shift())
        new_session = (df[ts_col].diff() > gap) & same_key
        df[out_col] = new_session.groupby(df[key].values).cumsum() \
                                 .astype("int64")
        return df

    return partition_map(ds, [key], per_partition, batch_format="pandas",
                         num_partitions=num_partitions)
