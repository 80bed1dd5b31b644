"""Key-based exchange primitives: hash partitioning and repartition joins.

Ray Data's sort-based ``groupby(k).map_groups(fn)`` calls ``fn`` once per
key group — a Python call per group, which at crawl scale (billions of
urls / fingerprints / candidate pairs) is billions of interpreter calls.
The scale-right shape is *hash partition by key, then one vectorized
``map_batches`` call per partition* (every key's rows are complete within
one block, so per-partition kernels like sort + ``drop_duplicates`` or a
pyarrow ``group_by`` give exactly the per-group answer with zero per-group
Python).

Ray implements that exchange natively (``Dataset.repartition(keys=...)``
and ``Dataset.join``) but only under the hash-shuffle strategy, which is
NOT safe to enable globally: sort-based ``map_groups`` pipelines deadlock
under it (observed on this Ray 2.49: default 64 aggregator actors starve
an 8-CPU pool). Each Dataset chain snapshots its own ``DataContext`` at
source-creation time (``Dataset.context`` -> ``plan._context``), and the
planner consults that snapshot at execution — so :func:`_enable_hash`
flips the strategy on the *dataset's own* context, scoping it to the one
chain without touching unrelated pipelines. Aggregator actors are capped
at the cluster CPU count so small clusters (the 4-CPU test fixture)
cannot deadlock on actor scheduling.

No reference analogue: pypdfium2 is single-document (the closest is the mp
pool fan-out, ``cli/render.py:401-524``); this layer exists to make the
corpus-level ops (dedup, joins, grouped finalize) scale.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def default_partitions(cap: int = 200) -> int:
    """Partition count tied to cluster size: ~1 partition per CPU (each
    hash-shuffle partition gets an aggregator slot; more would queue, many
    more would deadlock small clusters), capped for giant clusters."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus))


def _enable_hash(ds, num_partitions: int | None) -> int:
    """Switch *this dataset chain's* snapshotted context to hash shuffle
    (required by keyed repartition / join) and bound its aggregator count.
    Returns the resolved partition count."""
    from ray.data.context import ShuffleStrategy
    n = num_partitions or default_partitions()
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = max(
        ds.context.max_hash_shuffle_aggregators or 0, n)
    return n


def partition_map(ds, keys: list[str], fn: Callable[[pa.Table], pa.Table],
                  num_partitions: int | None = None,
                  batch_format: str = "pyarrow", **mb_kwargs):
    """Hash-partition ``ds`` on *keys*, then apply one vectorized ``fn``
    per partition (``batch_size=None`` => whole-block batches; every key's
    rows arrive complete in exactly one call).

    This is the billions-of-groups replacement for
    ``groupby(keys).map_groups`` — ``fn`` must be a *per-partition* kernel
    (e.g. ``pandas sort_values + drop_duplicates`` or pyarrow ``group_by``),
    not a per-group one.
    """
    n = _enable_hash(ds, num_partitions)
    out = ds.repartition(num_blocks=n, keys=keys)
    return out.map_batches(fn, batch_size=None, batch_format=batch_format,
                           **mb_kwargs)


def lookup_join(target, target_cols: dict[str, pa.DataType],
                source, source_key: str, key_col: str,
                payload_cols: dict[str, pa.DataType],
                source_payload: dict[str, str] | None = None,
                num_partitions: int | None = None):
    """Repartition (hash) join: attach *source*'s payload columns onto
    *target* rows where ``target[key_col] == source[source_key]`` (inner).

    Both sides are null-padded to one shared schema, tagged, unioned, and
    hash-exchanged ONCE on the key; each partition then runs a single
    vectorized pyarrow ``Table.join`` — no driver materialization, no
    broadcast, no per-group Python. The small-side-broadcast pattern
    (stages/join.broadcast_join) stays the right call for dimension
    tables; this is for large-x-large equi-joins (candidate pairs back to
    the corpus).

    Built on union + :func:`partition_map` rather than the experimental
    ``Dataset.join``, which (Ray 2.49) crashes when a hash-repartitioned
    input carries the zero-column empty blocks its own aggregators emit
    for empty partitions.

    ``target_cols`` / ``payload_cols`` are the static schemas of the two
    sides (callers know them by construction); ``key_col`` must be one of
    ``target_cols``. ``source_payload`` maps an output payload name to the
    source column it comes from (default: same name).
    """
    t_names = list(target_cols)
    p_names = list(payload_cols)
    src_of = source_payload or {}
    assert key_col in target_cols and not set(p_names) & set(t_names)
    key_type = target_cols[key_col]

    def pad_target(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: pc.cast(t[c], target_cols[c]) for c in t_names}
        cols.update({c: pa.nulls(n, ty) for c, ty in payload_cols.items()})
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def pad_source(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: pa.nulls(n, ty) for c, ty in target_cols.items()}
        cols[key_col] = pc.cast(t[source_key], key_type)
        cols.update({c: pc.cast(t[src_of.get(c, c)], payload_cols[c])
                     for c in p_names})
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    tagged = target.map_batches(pad_target, batch_format="pyarrow").union(
        source.map_batches(pad_source, batch_format="pyarrow"))

    def kernel(t: pa.Table) -> pa.Table:
        # local merge via index_in + take (NOT pyarrow Table.join, which
        # rejects list-typed non-key columns): source keys are unique by
        # contract (a lookup), so first-match == only-match, and take()
        # gathers any payload type (strings, list<float>, binary) zero-copy
        side = t["__side"]
        tgt = t.filter(pc.equal(side, 0))
        src = t.filter(pc.equal(side, 1))
        idx = pc.index_in(tgt[key_col].combine_chunks(),
                          value_set=src[key_col].combine_chunks())
        mask = pc.is_valid(idx)
        tgt = tgt.filter(mask)
        idx = idx.filter(mask)
        cols = {c: tgt[c] for c in t_names}
        for c in p_names:
            cols[c] = pc.take(src[c].combine_chunks(), idx)
        return pa.table(cols)

    return partition_map(tagged, [key_col], kernel,
                         num_partitions=num_partitions)
