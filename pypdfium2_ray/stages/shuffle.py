"""Deterministic training-data shuffle/export.

``ds.random_shuffle()`` is an all-to-all exchange whose output changes
every run — useless for reproducible training-data epochs and resumable
exports. The standard web-scale alternative is HASH shuffling: shard =
``md5(key) % n_shards`` and within-shard order by the hash itself, so the
global order is a pure function of the keys — identical across runs,
cluster sizes, shard layouts and retries, and any subset of shards is a
valid uniform subsample.

Shape: one cheap map adds (shard, halved-hash), ONE hash exchange on
``shard`` colocates each output shard, and a vectorized per-partition
kernel sorts by (hash, key) and assigns positions. ``write_shuffled``
sinks each shard as its own ``shard=N`` parquet directory (hive layout —
the resumable-output convention shared with ``state/checkpoint``).

No reference analogue (single-document engine); the op exists for the
training-pipeline surface (deterministic epoch order, like webdataset
shard shuffling but content-keyed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pypdfium2_ray.stages.exchange import partition_map


def _add_shard_hash(key_col: str, n_shards: int):
    from pypdfium2_ray.functions.sketch import md5_hash64

    def f(t: pa.Table) -> pa.Table:
        hs = [md5_hash64(str(v).encode())
              for v in t[key_col].to_pylist()]
        shard = pa.array([h % n_shards for h in hs], pa.int64())
        half = pa.array([h >> 1 for h in hs], pa.int64())
        return t.append_column("shard", shard).append_column("__h", half)

    return f


def _rank_kernel(key_col: str):
    def kernel(t: pa.Table) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False)
        h = t["__h"].to_numpy(zero_copy_only=False)
        k = t[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h, sh))
        sh_s = sh[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sh_s[1:] != sh_s[:-1])))
        offs = np.repeat(starts, np.diff(np.append(starts, len(sh_s))))
        pos = np.arange(len(sh_s)) - offs
        out = t.take(pa.array(order)).drop_columns(["__h"])
        return out.append_column("pos", pa.array(pos, pa.int64()))

    return kernel


def deterministic_shuffle(ds, key_col: str = "doc_id", n_shards: int = 16,
                          num_partitions: int | None = None):
    """Attach ``(shard, pos)`` to every row: shard = ``md5(key) %
    n_shards``, pos = rank within the shard by ``(md5(key) >> 1, key)``
    — both exactly reproducible in SQL (``md5_number_upper``), so the
    whole shuffle order is oracle-checkable. One exchange, vectorized
    rank kernel, payload columns ride along untouched."""
    hashed = ds.map_batches(_add_shard_hash(key_col, n_shards),
                            batch_format="pyarrow")
    return partition_map(hashed, ["shard"], _rank_kernel(key_col),
                         num_partitions=num_partitions)


def write_shuffled(ds, out_dir: str, key_col: str = "doc_id",
                   n_shards: int = 16,
                   num_partitions: int | None = None):
    """Sink the deterministic shuffle as hive-partitioned parquet
    (``shard=N/`` directories, rows position-ordered within each file
    group) — the resumable, reproducible training-data export."""
    out = deterministic_shuffle(ds, key_col=key_col, n_shards=n_shards,
                                num_partitions=num_partitions)
    out.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir


def ring_negative_pairs(ds, key_col: str = "doc_id", n_buckets: int = 16,
                        k: int = 2, num_partitions: int | None = None):
    """``(anchor, negative)`` — k deterministic contrastive negatives
    per row, mined by RING PAIRING over the hash-shuffled order: rows
    land in ``md5(key) % n_buckets`` buckets, each bucket sorts by
    ``(md5(key) >> 1, key)``, and row i pairs with rows i+1..i+k
    (cyclic). Because the hash order is content-keyed and uniform, the
    neighbors are uniform random draws from the corpus — yet the pair
    set is a pure function of the key set: identical across runs,
    cluster sizes and retries (random negative sampling without an RNG,
    the in-batch-negatives recipe of contrastive training made
    reproducible).

    Ids-only: the ONE exchange carries (key, bucket, halved-hash);
    a size-c bucket emits only offsets j < c (j >= c wraps onto the
    anchor itself or a neighbor already emitted under j mod c), so
    singleton buckets emit nothing, no pair repeats, and every
    negative differs from its anchor. Scale: buckets hold
    ~n/n_buckets rows; n_buckets grows with the corpus (it is a shard
    count, not a cluster property)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    hashed = ds.select_columns([key_col]).map_batches(
        _add_shard_hash(key_col, n_buckets), batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False)
        h = t["__h"].to_numpy(zero_copy_only=False)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, h, sh))
        sh_s, keys_s = sh[order], keys[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sh_s[1:] != sh_s[:-1])))
        sizes = np.diff(np.append(starts, len(sh_s)))
        offs = np.repeat(starts, sizes)
        c = np.repeat(sizes, sizes)
        pos = np.arange(len(sh_s)) - offs
        anchors, negatives = [], []
        for j in range(1, k + 1):
            keep = j < c
            tgt = offs[keep] + (pos[keep] + j) % c[keep]
            anchors.append(keys_s[keep])
            negatives.append(keys_s[tgt])
        cat = (lambda xs: np.concatenate(xs) if xs else
               np.zeros(0, np.int64))
        return pa.table({"anchor": pa.array(cat(anchors), pa.int64()),
                         "negative": pa.array(cat(negatives), pa.int64())})

    return partition_map(hashed, ["shard"], kernel,
                         num_partitions=num_partitions)
