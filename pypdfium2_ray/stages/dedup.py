"""Exact url-level dedup at ingest — the one mandatory shuffle of the
flagship pipeline (SURVEY §2.7 SET-new, §7.3).

No reference analogue (the closest is font dedup by address,
``cli/fonts.py:66-72``); at crawl scale the same url appears in many WARC
snapshots and must be collapsed to one row before the expensive parse.

Implementation: hash-partition on ``url`` via ``groupby("url")`` and keep one
row per group by ``warc_ts`` (default: latest snapshot wins). The group fn is
vectorized pandas (idxmax/idxmin), not a Python row loop.
"""

from __future__ import annotations

import pandas as pd


def _keep_latest(g: pd.DataFrame) -> pd.DataFrame:
    return g.loc[[g["warc_ts"].idxmax()]]


def _keep_earliest(g: pd.DataFrame) -> pd.DataFrame:
    return g.loc[[g["warc_ts"].idxmin()]]


def dedup_by_url(ds, keep: str = "latest"):
    """One row per ``url``; ``keep`` in {"latest", "earliest"} by ``warc_ts``."""
    fn = _keep_latest if keep == "latest" else _keep_earliest
    return ds.groupby("url").map_groups(fn, batch_format="pandas")
