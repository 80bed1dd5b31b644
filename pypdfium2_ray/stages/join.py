"""Broadcast (map-side) join: ship the small side once per actor.

The reference has no relational joins (SURVEY §2.4); at crawl scale the only
affordable join against a dimension table is a broadcast: ``ray.put`` the
small table ONCE, each actor ``ray.get``s it ONCE in ``__init__`` (zero-copy
from the local object store), and every batch joins against it with pyarrow's
vectorized hash join — no all-to-all shuffle of the big side.

Use for: url blocklists, dimension lookups (customer/nation/region), label
maps. Do NOT use when the "small" side exceeds worker heap — repartition both
sides on the key instead.
"""

from __future__ import annotations

import pyarrow as pa


class BroadcastJoiner:
    """``map_batches`` actor: batch JOIN small_table (pyarrow hash join)."""

    def __init__(self, small_ref, keys, right_keys=None, join_type: str = "inner"):
        import ray
        self.small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        rk = right_keys if right_keys is not None else keys
        self.right_keys = [rk] if isinstance(rk, str) else list(rk)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.keys, right_keys=self.right_keys,
                          join_type=self.join_type)


def broadcast_join(ds, small: pa.Table, keys, right_keys=None,
                   join_type: str = "inner", mode: str = "tasks",
                   concurrency=(1, 4), **mb_kwargs):
    """Join ``ds`` (big, streaming) against ``small`` (in-memory table).

    The small table is put into the object store once; each worker fetches
    it once (zero-copy from the local store). Per-batch work is a
    vectorized Arrow hash join. ``mode="tasks"`` uses a per-worker warm
    joiner (elastic scheduling); ``mode="actors"`` an explicit pool.
    """
    import ray
    ref = ray.put(small)
    kwargs = dict(small_ref=ref, keys=keys, right_keys=right_keys,
                  join_type=join_type)
    if mode == "tasks":
        from pypdfium2_ray.stages.warm import warm_task
        return ds.map_batches(warm_task(BroadcastJoiner, **kwargs),
                              batch_format="pyarrow", **mb_kwargs)
    return ds.map_batches(
        BroadcastJoiner, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", concurrency=concurrency, **mb_kwargs)


def key_filter_join(ds, right, key_col: str, right_key: str | None = None,
                    mode: str = "semi", tier: str = "broadcast",
                    max_broadcast_rows: int = 5_000_000,
                    num_partitions: int | None = None):
    """Semi / anti join: keep ``ds`` rows whose ``key_col`` is (semi) or
    is not (anti) present in ``right`` — the blocklist / decontamination
    primitive (drop the held-out split, a denylisted host list, an
    already-processed id set) without ever joining payloads.

    ``right``: a pyarrow Table or a Dataset; only its key column is used.

    Tiers:

    - ``"broadcast"`` (default): the DISTINCT right keys are collected
      once, ``ray.put`` once, and every batch filters with one vectorized
      ``is_in`` — zero shuffle, the right call whenever the key set fits
      driver/worker memory (ids are small: 10^8 int64 keys ~ 800 MB). If
      the right side exceeds ``max_broadcast_rows`` the call falls
      through to the exchange tier WITH A LOUD LOG (correctness
      identical).
    - ``"exchange"``: both sides hash-partition on the key (right side
      ships keys ONLY), each partition filters with a local ``is_in`` —
      the any-scale path.

    Unlike ``pyarrow.Table.join(join_type='left semi')`` this never
    touches non-key columns, so list/binary payloads pass through
    untouched (Arrow's join rejects list-typed columns).
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_map

    assert mode in ("semi", "anti")
    rk = right_key or key_col
    schema = ds.schema()                   # ray.data.Schema wrapper
    if schema is None:
        # schema-less left side == provably empty (Ray's all-to-all ops
        # emit zero bundles on all-empty input): semi/anti of empty is
        # empty — pass it through; callers pin typing at their tail
        # (stages/exchange.with_output_schema)
        return ds
    l_types = dict(zip(schema.names, schema.types))
    key_type = l_types[key_col]

    def _distinct_right_keys() -> pa.Array:
        if isinstance(right, pa.Table):
            return pc.unique(pc.cast(right[rk], key_type))
        arrs = [pc.cast(b[rk], key_type)
                for b in right.select_columns([rk])
                .iter_batches(batch_format="pyarrow", batch_size=None)
                if b.num_rows]
        return pc.unique(pa.chunked_array(arrs or [pa.array([], key_type)]))

    if tier == "broadcast":
        n_right = (right.num_rows if isinstance(right, pa.Table)
                   else right.count())
        if n_right > max_broadcast_rows:
            import logging
            logging.getLogger(__name__).warning(
                "key_filter_join: right side has %d rows > "
                "max_broadcast_rows=%d — falling through to the exchange "
                "tier", n_right, max_broadcast_rows)
            tier = "exchange"
        else:
            keys_ref = ray.put(_distinct_right_keys())

            def filt(t: pa.Table) -> pa.Table:
                keys = ray.get(keys_ref)        # plasma-local, zero-copy
                m = pc.is_in(pc.cast(t[key_col], key_type), value_set=keys)
                if mode == "anti":
                    m = pc.invert(m)
                return t.filter(m)

            return ds.map_batches(filt, batch_format="pyarrow")

    # exchange tier: pad right to the left schema (nulls) + side tag,
    # union, ONE hash exchange on the key, local is_in per partition
    l_names = list(l_types)

    def pad_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in l_names}
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(t.num_rows, ty) for c, ty in l_types.items()}
        cols[key_col] = pc.cast(t[rk], key_type)
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    right_ds = (rd.from_arrow(right.select([rk])) if isinstance(right, pa.Table)
                else right.select_columns([rk]))
    tagged = ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow"))

    def kernel(t: pa.Table) -> pa.Table:
        side = t["__side"]
        left = t.filter(pc.equal(side, 0))
        rkeys = t.filter(pc.equal(side, 1))[key_col].combine_chunks()
        m = pc.is_in(left[key_col].combine_chunks(), value_set=rkeys)
        if mode == "anti":
            m = pc.invert(m)
        return left.filter(m).select(l_names)

    return partition_map(tagged, [key_col], kernel,
                         num_partitions=num_partitions)
