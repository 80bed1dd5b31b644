"""Gap-based sessionization — per-key ordered stateful computation.

Assign each event a session id that increments whenever the gap to the
user's previous event exceeds ``gap``: the classic clickstream session
operator (no reference analogue; SURVEY §2.9 noted the reference has no
streaming concepts — this is the batch form every telemetry pipeline
needs).

Plan: one hash exchange (``groupby(key)``) colocates each key's events;
the per-group computation is fully vectorized (diff + cumsum, no Python
row loop). Same partitioning assumption as the as-of join: one key's
events fit one worker.
"""

from __future__ import annotations

import pandas as pd


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0, out_col: str = "session_id"):
    """Append ``out_col``: 0-based session index per *key*, new session when
    the time since the previous event exceeds ``gap_s`` seconds."""
    gap = pd.Timedelta(seconds=gap_s)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_session = g[ts_col].diff() > gap          # first row -> NaT -> False
        g[out_col] = new_session.cumsum().astype("int64")
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
