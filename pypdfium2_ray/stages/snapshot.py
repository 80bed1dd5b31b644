"""Cross-snapshot crawl curation: what changed between two crawls, and
dedup of a new snapshot against the fingerprints of everything already
processed.

A recurring crawl is a sequence of snapshots of the same url space; the two
operators every incremental pipeline needs are

- :func:`snapshot_delta` — classify each url across two snapshots
  (``new`` / ``gone`` / ``changed`` / ``unchanged``) so downstream work
  touches only changed content, and
- :func:`incremental_dedup` — drop rows whose content fingerprint was
  already seen in ANY previous run (persisted state) AND collapse
  duplicates within the new snapshot itself, in ONE fused exchange.

Scale shape: only ``(key, fingerprint)`` pairs ever enter an exchange —
never document payloads. Both operators are single-exchange: the state /
old side is tagged and unioned with the new side, hash-partitioned once on
the key, and a vectorized per-partition kernel does the classification or
keep-one (no per-group Python, no second shuffle). State grows by appending
one parquet file of new fingerprints per run (resumable layout; see
:func:`append_state`).

No reference analogue — pypdfium2 is single-document (the closest surface
is ``get_identifier``'s permanent/changing id pair, document.py:278-292,
which is exactly the permanent-key + content-fingerprint split used here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pypdfium2_ray.stages.exchange import partition_map


class SnapshotKeyError(ValueError):
    """A key appeared more than once on one side — snapshots must be
    per-url deduped first (``dedup_by_url``). Loud by design."""


def _tag(side: int):
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__side", pa.array(np.full(t.num_rows, side, np.int8)))
    return f


def snapshot_delta(old_ds, new_ds, key: str = "url",
                   fp_col: str = "fingerprint",
                   num_partitions: int | None = None):
    """Per-``key`` delta between two snapshots, each already one-row-per-key
    with a content fingerprint column: returns ``(key, delta)`` rows where
    delta ∈ {'new','gone','changed','unchanged'}.

    Union of the two tagged ``(key, fp)`` projections -> ONE hash exchange
    on ``key`` -> vectorized run-length classification per partition.
    """
    old = old_ds.select_columns([key, fp_col]).map_batches(
        _tag(0), batch_format="pyarrow")
    new = new_ds.select_columns([key, fp_col]).map_batches(
        _tag(1), batch_format="pyarrow")

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "delta": pa.array([], pa.string())})
        t = t.sort_by([(key, "ascending"), ("__side", "ascending")])
        keys = np.asarray(t[key].to_numpy(zero_copy_only=False))
        side = t["__side"].to_numpy()
        fps = np.asarray(t[fp_col].to_numpy(zero_copy_only=False))
        new_run = np.ones(len(keys), dtype=bool)
        new_run[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(keys)))
        if (lengths > 2).any():
            k = keys[starts[lengths > 2][0]]
            raise SnapshotKeyError(
                f"key {k!r} occurs >2 times across the two snapshots — "
                "dedup each snapshot per key first")
        out = np.empty(len(starts), dtype=object)
        singles = lengths == 1
        # lone row: side 1 -> only in new; side 0 -> only in old
        out[singles & (side[starts] == 1)] = "new"
        out[singles & (side[starts] == 0)] = "gone"
        pairs = ~singles
        ps = starts[pairs]
        if ps.size and (side[ps] == side[ps + 1]).any():
            k = keys[ps[side[ps] == side[ps + 1]][0]]
            raise SnapshotKeyError(
                f"key {k!r} occurs twice in one snapshot — dedup first")
        same = np.zeros(len(starts), dtype=bool)
        same[pairs] = fps[ps] == fps[ps + 1]
        out[pairs & same] = "unchanged"
        out[pairs & ~same] = "changed"
        return pa.table({key: pa.array(keys[starts].tolist(),
                                       t.schema.field(key).type),
                         "delta": pa.array(out.tolist(), pa.string())})

    both = old.union(new)
    return partition_map(both, [key], classify,
                         num_partitions=num_partitions)


def incremental_dedup(new_ds, state, fp_col: str = "fingerprint",
                      order_col: str = "url",
                      num_partitions: int | None = None):
    """Keep exactly one row per NEVER-SEEN fingerprint: rows whose ``fp_col``
    appears in ``state`` (a Dataset / pyarrow Table of previously-processed
    fingerprints, key column only) are dropped; within the new snapshot,
    duplicate fingerprints keep the minimum ``order_col`` row
    (deterministic at any partitioning).

    Both jobs share one key, so they FUSE into a single exchange: state
    keys ride in as side-0 key-only rows, the per-partition kernel drops
    any fingerprint group containing a state row and keeps the first
    survivor otherwise. An ``n_dups`` column counts the new-side group size
    (observability: how much the snapshot self-duplicated).
    """
    import ray.data as rd
    if isinstance(state, pa.Table):
        state = rd.from_arrow(state.select([fp_col]))
    else:
        state = state.select_columns([fp_col])
    schema = new_ds.schema()
    new_cols = list(schema.names)
    new_types = dict(zip(schema.names, schema.types))   # plain dict: the
    # worker closure must never capture the Dataset object itself

    def pad_state(t: pa.Table) -> pa.Table:
        cols = {fp_col: t[fp_col].cast(new_types[fp_col])}
        for c in new_cols:
            if c != fp_col:
                cols[c] = pa.nulls(t.num_rows, new_types[c])
        out = pa.table(cols).select(new_cols)
        return out.append_column(
            "__side", pa.array(np.zeros(t.num_rows, np.int8)))

    new_tagged = new_ds.map_batches(_tag(1), batch_format="pyarrow")
    state_padded = state.map_batches(pad_state, batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        base = t.drop_columns(["__side"]).append_column(
            "n_dups", pa.array(np.zeros(t.num_rows, np.int64)))
        if t.num_rows == 0:
            return base
        t = t.sort_by([(fp_col, "ascending"), ("__side", "ascending"),
                       (order_col, "ascending")])
        fps = np.asarray(t[fp_col].to_numpy(zero_copy_only=False))
        side = t["__side"].to_numpy()
        new_run = np.ones(len(fps), dtype=bool)
        new_run[1:] = fps[1:] != fps[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(fps)))
        # a group is seen-before iff its first row (sides sorted) is state
        fresh = side[starts] == 1
        # survivor = first row of each fresh group (min order_col)
        take = starts[fresh]
        kept = t.take(pa.array(take)).drop_columns(["__side"])
        return kept.append_column(
            "n_dups", pa.array(lengths[fresh], pa.int64()))

    both = new_tagged.union(state_padded)
    return partition_map(both, [fp_col], keep,
                         num_partitions=num_partitions)


def append_state(survivors, state_dir: str, fp_col: str = "fingerprint"):
    """Persist this run's surviving fingerprints as ONE MORE parquet file
    set under ``state_dir`` (append-only layout: the next run's
    ``read_parquet(state_dir)`` sees the union — no rewrite, resumable)."""
    survivors.select_columns([fp_col]).write_parquet(state_dir)


def apply_changelog(base, delta, key_col: str = "doc_id",
                    version_col: str = "version", op_col: str = "op",
                    num_partitions: int | None = None):
    """MERGE a changelog into a base snapshot — the incremental-
    materialization primitive (the upsert/delete semantics of
    log-structured table formats): both sides share one schema
    ``(key, payload..., version, op)`` with op in {'upsert',
    'delete'}; per key the HIGHEST version wins, and a winning delete
    removes the key. Returns the new snapshot (op column dropped).

    (key, version) must be unique across base ∪ delta — the changelog
    contract; enforced loudly per partition so a malformed log can
    never silently pick a winner by sort accident. Union + ONE hash
    exchange on the key + a vectorized keep-last kernel (mergesort,
    drop_duplicates, boolean mask) — the snapshot_delta shape with
    winner-selection instead of classification."""
    import pandas as pd

    u = base.union(delta)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if df.duplicated([key_col, version_col]).any():
            raise ValueError(
                "apply_changelog: duplicate (key, version) rows in the "
                "changelog — winners would depend on sort accident")
        df = df.sort_values([key_col, version_col], kind="mergesort")
        keep = df.drop_duplicates(key_col, keep="last")
        keep = keep[keep[op_col] != "delete"]
        return keep.drop(columns=[op_col])

    return partition_map(u, [key_col], kernel, batch_format="pandas",
                         num_partitions=num_partitions)
