"""Distributed prefix sum (scan) + sequence-packing offsets.

``sum(val) OVER (ORDER BY key)`` is the one classic primitive Ray Data
has no operator for: it needs a GLOBAL order, which ``groupby`` (hash)
cannot give. The two-phase range scan is the textbook distributed
answer:

1. bucket every row by key range (one cheap pass; boundaries from a
   single min/max pre-scan — balance affects speed, never correctness);
2. per-bucket totals (tiny: one row per bucket per block, combined in a
   single block) give the driver the B bucket offsets — an exclusive
   cumsum over B numbers;
3. ONE hash exchange on the bucket id, then a vectorized per-bucket
   kernel sorts by key and adds ``bucket_offset + local_cumsum``.

Payload columns ride the exchange untouched. Everything is integer
arithmetic, so the scan is exactly reproducible at any partitioning.

The flagship use is GPT-style sequence packing: concatenate documents in
key order and cut fixed-size training examples — each doc's start offset
is exactly this prefix sum, and its first/last example ids are integer
divisions of (start, start+len-1).

No reference analogue (single-document engine); standard parallel-scan
construction (Blelloch-style two-phase).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map


def _minmax(ds, key_col: str) -> tuple[int, int] | None:
    """Single-pass per-block min/max partials; tiny driver combine."""
    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col]
        return pa.table({"lo": [pc.min(k).as_py()],
                         "hi": [pc.max(k).as_py()]})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    los = [r["lo"] for r in rows if r["lo"] is not None]
    his = [r["hi"] for r in rows if r["hi"] is not None]
    if not los:
        return None
    return min(los), max(his)


def sample_boundaries(ds, key_col: str, n_buckets: int,
                      modulus: int = 64, max_sample: int = 1_000_000):
    """Deterministic sampled bucket boundaries — the TeraSort move for
    SKEWED keys, where :func:`ranged_prefix_sum`'s default linear
    min/max bucketing collapses (zipf-ish keys put almost every row in
    bucket 0; balance suffers, correctness never does).

    Sampling is content-keyed (``md5_hash64(key) % modulus == 0``), so
    the boundaries — hence the whole plan — are a pure function of the
    key set: identical across runs, partitionings and cluster sizes
    (the repo's determinism convention; ``ds.random_sample`` would not
    be). The sample is collected driver-side (bounded: ``max_sample``
    rows, loudly enforced — size *modulus* so corpus/modulus fits) and
    reduced to ``n_buckets - 1`` quantile cut points.
    """
    from pypdfium2_ray.functions.sketch import md5_hash64

    def keep(t: pa.Table) -> pa.Table:
        k = t[key_col].to_pylist()
        mask = pa.array([md5_hash64(str(v).encode()) % modulus == 0
                         for v in k])
        return t.select([key_col]).filter(mask)

    parts = [b for b in ds.map_batches(keep, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)]
    n_sampled = sum(b.num_rows for b in parts)
    if n_sampled > max_sample:
        raise ValueError(
            f"boundary sample {n_sampled} exceeded "
            f"max_sample={max_sample} — raise modulus so corpus/modulus "
            "fits driver-side")
    if n_sampled == 0:
        return np.array([], np.int64)
    keys = np.sort(pa.concat_tables(parts)[key_col]
                   .to_numpy(zero_copy_only=False).astype(np.int64))
    idx = (np.arange(1, n_buckets) * len(keys)) // n_buckets
    return np.unique(keys[idx])


def ranged_prefix_sum(ds, key_col: str, val_col: str,
                      out: str = "cum_prev",
                      num_partitions: int | None = None,
                      boundaries=None):
    """Attach ``out`` = sum of *val_col* over all rows with a strictly
    smaller *key_col* (exclusive running total in key order; int64).

    *key_col* must be unique integers (it is the total order — ties
    would make "smaller" ambiguous); *val_col* non-negative integers.

    ``boundaries`` (optional, sorted int64 cut points — e.g. from
    :func:`sample_boundaries`): overrides the linear min/max bucket map
    with ``searchsorted`` range assignment. Any monotone bucketing is
    CORRECT (the kernel re-sorts within buckets and offsets are exact);
    boundaries only fix BALANCE when keys are skewed.
    """
    import ray

    from pypdfium2_ray.stages.exchange import _PARTITION_HINT, \
        default_partitions

    if boundaries is not None:
        cuts = np.asarray(boundaries, np.int64)
        n_buckets = len(cuts) + 1

        def add_bucket(t: pa.Table) -> pa.Table:
            k = pc.cast(t[key_col],
                        pa.int64()).to_numpy(zero_copy_only=False)
            b = np.searchsorted(cuts, k, side="right")
            return t.append_column("__bucket",
                                   pa.array(b.astype(np.int64)))
    else:
        mm = _minmax(ds, key_col)
        if mm is None:
            def empty(t: pa.Table) -> pa.Table:
                return t.append_column(out, pa.array([], pa.int64()))
            return ds.map_batches(empty, batch_format="pyarrow")
        lo, hi = int(mm[0]), int(mm[1])
        n_buckets = num_partitions or _PARTITION_HINT.get() \
            or default_partitions()
        span = hi - lo + 1
        # division form, NOT (k - lo) * n_buckets // span: the multiply
        # overflows int64 for wide composite keys (e.g. us << 21) and a
        # wrapped bucket id silently breaks the monotone-bucketing
        # contract the offsets rely on
        step = (span + n_buckets - 1) // n_buckets

        def add_bucket(t: pa.Table) -> pa.Table:
            k = pc.cast(t[key_col],
                        pa.int64()).to_numpy(zero_copy_only=False)
            b = (k - lo) // step
            return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()  # consumed twice (totals pass + rank pass); the
    # alternative is re-reading the source — at 100 TB prefer re-read
    # or a checkpointed bucket pass; at bench scale materialize is right

    def bucket_totals(t: pa.Table) -> pa.Table:
        b = t["__bucket"].to_numpy(zero_copy_only=False)
        v = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        # exact int64 per-bucket sums via sort + reduceat (bincount
        # accumulates in float64 — not integer-exact past 2^53)
        order = np.argsort(b, kind="stable")
        b_s, v_s = b[order], v[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], b_s[1:] != b_s[:-1]))) if len(b_s) else np.array([], np.int64)
        tot = np.zeros(n_buckets, np.int64)
        if len(starts):
            tot[b_s[starts]] = np.add.reduceat(v_s, starts)
        return pa.table({"bucket": np.arange(n_buckets, dtype=np.int64),
                         "total": tot})

    parts = bucketed.map_batches(bucket_totals,
                                 batch_format="pyarrow").take_all()
    totals = np.zeros(n_buckets, np.int64)
    for r in parts:
        totals[r["bucket"]] += r["total"]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    off_ref = ray.put(offsets)

    def rank_kernel(t: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = t["__bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, b))
        k_s, v_s, b_s = k[order], v[order], b[order]
        cum = np.cumsum(v_s) - v_s
        # reset the running total at bucket starts, then add the
        # bucket's global offset
        starts = np.flatnonzero(np.concatenate(
            ([True], b_s[1:] != b_s[:-1]))) if len(b_s) else np.array([], np.int64)
        base = np.zeros(len(b_s), np.int64)
        if len(starts):
            reset = cum[starts]
            base = np.repeat(offs[b_s[starts]] - reset,
                             np.diff(np.append(starts, len(b_s))))
        res = t.take(pa.array(order)).drop_columns(["__bucket"])
        return res.append_column(out, pa.array(cum + base, pa.int64()))

    return partition_map(bucketed, ["__bucket"], rank_kernel,
                         num_partitions=n_buckets)


def pack_offsets(ds, key_col: str = "doc_id", len_col: str = "n_chars",
                 example_len: int = 1024,
                 num_partitions: int | None = None):
    """Sequence-packing map: concatenate documents in *key_col* order and
    cut fixed ``example_len`` training examples. Emits per doc:
    ``start_off`` (global start offset), ``first_example`` and
    ``last_example`` (the example ids the doc spans; zero-length docs
    span only their start boundary)."""
    cum = ranged_prefix_sum(ds, key_col, len_col, out="start_off",
                            num_partitions=num_partitions)

    def examples(t: pa.Table) -> pa.Table:
        s = t["start_off"].to_numpy(zero_copy_only=False)
        n = pc.cast(t[len_col], pa.int64()).to_numpy(zero_copy_only=False)
        first = s // example_len
        last = np.where(n > 0, (s + n - 1) // example_len, first)
        t = t.append_column("first_example", pa.array(first, pa.int64()))
        return t.append_column("last_example", pa.array(last, pa.int64()))

    return cum.map_batches(examples, batch_format="pyarrow")
