"""Pivot (long -> wide crosstab) over a label enum.

The relational surface the rollup/aggregate family doesn't cover: turn a
``(key, label)`` event stream into ONE row per key with a count column per
label — the feature-matrix / per-entity-counter layout consumed by
downstream joins and models (reference analogue: the per-run counter
tables of ``cli/pageobjects.py:84-124``, which print one column per object
type; here the pivot is a distributed operator, not a print loop).

Scale shape: the label set must be FIXED and globally known — pivot output
schemas cannot vary per partition (Arrow unions by name), so *labels* is
an explicit caller contract. For enum-like columns the census is a
pre-combined single-block rollup (``stages/agg.grouped_aggregate`` with
``combine="single_block"`` — no exchange) whose result is at most
``n_labels`` rows at any corpus size. The pivot itself is: per-block
``(key, label)`` count partials (one pyarrow ``group_by`` per block — the
exchange then moves at most ``n_blocks x n_keys_per_block x n_labels``
partial rows, never raw events), ONE hash exchange on the key, and a
vectorized per-partition crosstab (pandas ``pivot_table`` — Cython
groupby, zero per-key Python) reindexed to the fixed label columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from pypdfium2_ray.stages.exchange import partition_map


def label_census(ds, label_col: str) -> list[str]:
    """The distinct labels of an enum-like column, sorted — a
    pre-combined single-block rollup (NO hash exchange; output is
    ``n_labels`` rows at any scale). ONLY for columns whose cardinality
    is fixed as the data grows (types, statuses, languages)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    t = grouped_aggregate(ds.select_columns([label_col]), [label_col],
                          {"n": (None, "count")},
                          combine="single_block") \
        .take_batch(100_000, batch_format="pyarrow")
    return sorted(t[label_col].to_pylist())


def pivot_counts(ds, key: str, label_col: str, labels: list[str],
                 prefix: str = "n_", num_partitions: int | None = None):
    """One row per *key* with an int64 count column per label
    (``{prefix}{label}``), zero-filled where a key never saw a label.
    Rows whose label is outside *labels* are dropped (the caller's
    census defines the schema). Output columns: ``[key] + counts``.
    """
    out_cols = [f"{prefix}{lb}" for lb in labels]

    def partial(t: pa.Table) -> pa.Table:
        return t.select([key, label_col]).group_by(
            [key, label_col], use_threads=False).aggregate([([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def crosstab(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 **{c: pd.Series([], dtype="int64")
                                    for c in out_cols}})
        df = t.to_pandas()
        df = df[df[label_col].isin(labels)]     # census defines the schema
        if df.empty:
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 **{c: pd.Series([], dtype="int64")
                                    for c in out_cols}})
        wide = df.pivot_table(index=key, columns=label_col,
                              values="count_all", aggfunc="sum",
                              fill_value=0)
        wide = wide.reindex(columns=labels, fill_value=0).astype("int64")
        wide.columns = out_cols
        return wide.reset_index()

    return partition_map(parts, [key], crosstab, batch_format="pyarrow",
                         num_partitions=num_partitions)
