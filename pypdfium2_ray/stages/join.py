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
