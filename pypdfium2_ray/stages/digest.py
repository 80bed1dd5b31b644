"""Bucketed table digest — prove two table copies equal WITHOUT moving
either one.

The anti-entropy primitive of replicated/multi-site pipelines: each side
computes a tiny (n_buckets x 3) digest locally — per md5-bucket row count
and XOR of row hashes — and equality of the digests certifies equality of
the row MULTISETS (up to md5 collisions and XOR's self-cancelling pairs:
a row appearing an even number of times XORs out, which the per-bucket
COUNT guards). Mismatched buckets localize the diff to 1/n_buckets of the
keyspace, so repair re-ships only those buckets — the Merkle/anti-entropy
move of Dynamo-style systems, here as ONE exchange-free streaming pass.

XOR is the right combine because it is associative, commutative and
order-free — the digest is bit-identical at ANY partitioning, shard
layout or cluster size, which is the whole point. Per-block partials
(vectorized sort + ``np.bitwise_xor.reduceat``) coalesce into one block;
n_buckets is fixed, so the combine input is ``n_blocks x n_buckets`` rows
at any corpus size. The per-row md5 is a Python-loop hash like
``textstats.hash_sample`` — inherent to md5, not vectorizable, and the
portability contract (DuckDB ``md5_number_upper`` twin) is what makes the
digest verifiable across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def table_digest(ds, cols: list[str], n_buckets: int = 64,
                 sep: str = "|"):
    """Digest rows over *cols*: one row per md5-bucket with ``n_rows``
    and ``xor_hash`` (XOR of per-row ``md5_hash64 >> 1``, so values stay
    in BIGINT range). Row serialization is ``sep.join(str(v))`` —
    matching SQL ``col1::VARCHAR || sep || ...``; columns must not
    contain *sep*-ambiguous free text unless the caller accepts
    concatenation aliasing (keys + scalars are the intended use).
    Output: ``(bucket, n_rows, xor_hash)`` sorted by bucket, all int64.
    """
    from pypdfium2_ray.functions.sketch import md5_hash64

    def partial(t: pa.Table) -> pa.Table:
        arrs = [t[c].to_pylist() for c in cols]
        h = np.fromiter(
            (md5_hash64(sep.join(str(v) for v in row).encode())
             for row in zip(*arrs)),
            dtype=np.uint64, count=t.num_rows)
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        v = (h >> np.uint64(1)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        b_s, v_s = b[order], v[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], b_s[1:] != b_s[:-1]))) if len(b_s) else \
            np.array([], np.int64)
        n = np.zeros(n_buckets, np.int64)
        x = np.zeros(n_buckets, np.int64)
        if len(starts):
            sizes = np.diff(np.append(starts, len(b_s)))
            n[b_s[starts]] = sizes
            x[b_s[starts]] = np.bitwise_xor.reduceat(v_s, starts)
        return pa.table({"bucket": np.arange(n_buckets, dtype=np.int64),
                         "n_rows": n, "xor_hash": x})

    def combine(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        n = t["n_rows"].to_numpy(zero_copy_only=False)
        v = t["xor_hash"].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b_s, n_s, v_s = b[order], n[order], v[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], b_s[1:] != b_s[:-1]))) if len(b_s) else \
            np.array([], np.int64)
        nn = np.zeros(n_buckets, np.int64)
        xx = np.zeros(n_buckets, np.int64)
        if len(starts):
            nn[b_s[starts]] = np.add.reduceat(n_s, starts)
            xx[b_s[starts]] = np.bitwise_xor.reduceat(v_s, starts)
        return pa.table({"bucket": np.arange(n_buckets, dtype=np.int64),
                         "n_rows": nn, "xor_hash": xx})

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow")
    return parts.repartition(1).map_batches(combine, batch_size=None,
                                            batch_format="pyarrow")
