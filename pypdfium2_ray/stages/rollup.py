"""Hierarchical ROLLUP aggregate — GROUP BY ROLLUP(k1, k2, ...) semantics
with the raw data exchanged ONCE.

The relational rollup (per-(source,lang) rows + per-source subtotals +
a grand total) is the corpus-reporting shape every crawl dashboard
needs. The naive distributed plan aggregates the raw table once per
grouping level (L+1 full scans + exchanges); the classic fix is
aggregate algebra: the supported measures are DISTRIBUTIVE (count /
sum / min / max), so every coarser level is computable FROM the finest
level's finalized rows — which are smaller than the raw input by the
group ratio. Costs: one full-data exchange on the finest key, then one
tiny exchange per coarser level over already-aggregated rows (level L
sees at most |distinct finest groups| input rows). Each level is
materialized before branching (emit + next level) — the components/BFS
convention — so NO level's lineage re-executes the raw scan; the raw
table is read and exchanged exactly once.

Output schema mirrors SQL ROLLUP: one row per group at every level,
rolled-up key columns NULL, plus ``level`` = number of keys kept
(len(keys) = finest ... 0 = grand total; the SQL twin's
``len(keys) - grouping(k1) - ... `` expression). A truly empty input
emits nothing (SQL ROLLUP would emit a count-0 grand-total row; the
driver corpora are never empty and tests pin the divergence).

Exact integer semantics throughout (no float paths) — bit-identical at
any partitioning.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map


def _partial_fn(keys: list[str], aggs: dict):
    """Raw block -> finest-level partial rows (count becomes a summable
    partial)."""

    def fn(t: pa.Table) -> pa.Table:
        specs = [(spec[1], spec[0]) for spec in aggs.values()
                 if spec[0] != "count"]
        g = t.group_by(keys, use_threads=False).aggregate(
            specs + [([], "count_all")])
        cols = {k: g[k] for k in keys}
        for out, spec in aggs.items():
            if spec[0] == "count":
                cols[out] = pc.cast(g["count_all"], pa.int64())
            else:
                cols[out] = pc.cast(g[f"{spec[1]}_{spec[0]}"], pa.int64())
        return pa.table(cols)

    return fn


def _merge_fn(keys: list[str], aggs: dict, level: int):
    """Finer rows -> finalized rows at *level* (count/sum re-sum,
    min/max re-min/max). ``level >= 1``; the grand total uses
    :func:`_total_fn`."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({n: pa.array([], pa.int64())
                             for n in keys[:level] + list(aggs)})
        specs = [(out, "sum" if spec[0] in ("count", "sum") else spec[0])
                 for out, spec in aggs.items()]
        g = t.group_by(keys[:level], use_threads=False).aggregate(specs)
        cols = {k: g[k] for k in keys[:level]}
        for out, op in specs:
            cols[out] = pc.cast(g[f"{out}_{op}"], pa.int64())
        return pa.table(cols)

    return fn


def _total_fn(aggs: dict):
    """Whole-table (no keys) merge — the grand-total kernel."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({out: pa.array([], pa.int64())
                             for out in aggs})
        cols = {}
        for out, spec in aggs.items():
            op = "sum" if spec[0] in ("count", "sum") else spec[0]
            fnc = {"sum": pc.sum, "min": pc.min, "max": pc.max}[op]
            cols[out] = pa.array([fnc(t[out]).as_py()], pa.int64())
        return pa.table(cols)

    return fn


def _emit(t: pa.Table, keys: list[str], aggs: dict, level: int,
          key_types: dict, fill) -> pa.Table:
    n = t.num_rows
    cols = {}
    for i, k in enumerate(keys):
        if i < level:
            cols[k] = pc.cast(t[k], key_types[k])
        elif fill is None:
            cols[k] = pa.nulls(n, key_types[k])
        else:
            cols[k] = pa.array([fill] * n).cast(key_types[k])
    for out in aggs:
        cols[out] = pc.cast(t[out], pa.int64())
    cols["level"] = pa.array([level] * n, pa.int64())
    return pa.table(cols)


def rollup_aggregate(ds, keys: list[str], aggs: dict[str, tuple],
                     key_types: dict[str, pa.DataType] | None = None,
                     fill=None, num_partitions: int | None = None):
    """Dataset of ROLLUP rows: finest groups + every prefix-subtotal
    level + the grand total, rolled-up keys NULL, ``level`` = kept key
    count. Raw data pays ONE exchange (the finest key); each coarser
    level re-exchanges only the previous level's (materialized,
    already-small) finalized rows.

    ``aggs``: output column -> ``("count",)`` or ``("sum"|"min"|"max",
    input_col)``. All integer-exact. ``fill`` substitutes a sentinel for
    the NULL rolled-up keys (drivers whose result comparison cannot
    order mixed null/str columns COALESCE both sides).
    """
    if not keys:
        raise ValueError("need at least one rollup key")
    for out, spec in aggs.items():
        if spec[0] not in ("count", "sum", "min", "max"):
            raise ValueError(f"unsupported agg {spec!r} for {out!r} — "
                             "distributive count/sum/min/max only "
                             "(algebraic measures need their own "
                             "partials; avg = sum/count downstream)")
    key_types = key_types or {k: pa.string() for k in keys}
    n_keys = len(keys)

    partials = ds.map_batches(_partial_fn(keys, aggs),
                              batch_format="pyarrow")
    cur = partition_map(partials, keys, _merge_fn(keys, aggs, n_keys),
                        num_partitions=num_partitions).materialize()
    levels = [cur.map_batches(
        lambda t, lv=n_keys: _emit(t, keys, aggs, lv, key_types, fill),
        batch_format="pyarrow")]
    for level in range(n_keys - 1, -1, -1):
        if level > 0:
            cur = partition_map(cur, keys[:level],
                                _merge_fn(keys, aggs, level),
                                num_partitions=num_partitions)
        else:
            cur = (cur.map_batches(_total_fn(aggs),
                                   batch_format="pyarrow")
                   .repartition(1)
                   .map_batches(_total_fn(aggs), batch_size=None,
                                batch_format="pyarrow"))
        cur = cur.materialize()
        levels.append(cur.map_batches(
            lambda t, lv=level: _emit(t, keys, aggs, lv, key_types, fill),
            batch_format="pyarrow"))
    out = levels[0]
    for more in levels[1:]:
        out = out.union(more)
    return out


def _merge_subset(keys: list[str], kept: list[str], aggs: dict):
    """Finest-level rows -> finalized rows grouped on an arbitrary key
    SUBSET (the CUBE generalization of :func:`_merge_fn`'s prefixes)."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({n: pa.array([], pa.int64())
                             for n in kept + list(aggs)})
        specs = [(out, "sum" if spec[0] in ("count", "sum") else spec[0])
                 for out, spec in aggs.items()]
        g = t.group_by(kept, use_threads=False).aggregate(specs)
        cols = {k: g[k] for k in kept}
        for out, op in specs:
            cols[out] = pc.cast(g[f"{out}_{op}"], pa.int64())
        return pa.table(cols)

    return fn


def _emit_subset(t: pa.Table, keys: list[str], kept: set, aggs: dict,
                 key_types: dict, fill, gid: int) -> pa.Table:
    n = t.num_rows
    cols = {}
    for k in keys:
        if k in kept:
            cols[k] = pc.cast(t[k], key_types[k])
        elif fill is None:
            cols[k] = pa.nulls(n, key_types[k])
        else:
            cols[k] = pa.array([fill] * n).cast(key_types[k])
    for out in aggs:
        cols[out] = pc.cast(t[out], pa.int64())
    cols["grouping_id"] = pa.array([gid] * n, pa.int64())
    return pa.table(cols)


def cube_aggregate(ds, keys: list[str], aggs: dict[str, tuple],
                   key_types: dict[str, pa.DataType] | None = None,
                   fill=None, num_partitions: int | None = None):
    """GROUP BY CUBE(k1, ..., kn): one row per group for EVERY key
    subset, rolled-up keys NULL (or *fill*), plus ``grouping_id`` — the
    SQL GROUPING_ID bitmask (keys[0] is the most significant bit; bit
    set = key rolled up), which is what keeps a sentinel-filled output
    unambiguous when a real key value could equal the sentinel.

    Same aggregate-algebra shape as :func:`rollup_aggregate`: the raw
    table is scanned and exchanged exactly ONCE (the finest grouping,
    materialized); each of the other ``2^n - 2`` subsets re-aggregates
    those already-finalized rows (at most |finest groups| input rows per
    subset — tiny), and the grand total is a single-block fold. The
    ``2^n`` grouping-set count is inherent to CUBE, not a plan defect;
    n beyond ~4 keys is a modeling smell either way. Distributive
    measures only (count/sum/min/max), all integer-exact.
    """
    if not keys:
        raise ValueError("need at least one cube key")
    for out, spec in aggs.items():
        if spec[0] not in ("count", "sum", "min", "max"):
            raise ValueError(f"unsupported agg {spec!r} for {out!r} — "
                             "distributive count/sum/min/max only")
    key_types = key_types or {k: pa.string() for k in keys}
    n_keys = len(keys)

    partials = ds.map_batches(_partial_fn(keys, aggs),
                              batch_format="pyarrow")
    finest = partition_map(partials, keys, _merge_fn(keys, aggs, n_keys),
                           num_partitions=num_partitions).materialize()

    out = finest.map_batches(
        lambda t: _emit_subset(t, keys, set(keys), aggs, key_types,
                               fill, 0),
        batch_format="pyarrow")
    for mask in range(1, 2 ** n_keys):
        kept = [k for i, k in enumerate(keys)
                if not (mask >> (n_keys - 1 - i)) & 1]
        if kept:
            lvl = partition_map(finest, kept,
                                _merge_subset(keys, kept, aggs),
                                num_partitions=num_partitions)
        else:
            lvl = (finest.map_batches(_total_fn(aggs),
                                      batch_format="pyarrow")
                   .repartition(1)
                   .map_batches(_total_fn(aggs), batch_size=None,
                                batch_format="pyarrow"))
        out = out.union(lvl.map_batches(
            lambda t, kp=frozenset(kept), g=mask: _emit_subset(
                t, keys, kp, aggs, key_types, fill, g),
            batch_format="pyarrow"))
    return out
