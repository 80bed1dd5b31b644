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


def grouped_quantile_hist(ds, keys: list[str], col: str,
                          q: tuple[int, int] = (1, 2), sub_bits: int = 5,
                          scale: int = 100, out: str = "median_est_micro",
                          num_partitions: int | None = None,
                          combine: str = "exchange"):
    """Deterministic mergeable per-group quantile via a base-2 log-bucket
    histogram (the HdrHistogram / DDSketch bucketing idea — public — with
    power-of-2 boundaries so EVERY quantity is integer arithmetic).

    Unlike the t-digest tier (:func:`agg.grouped_quantile_sketch`, whose
    estimates move in the last error digits with block layout — inherent
    to centroid sketches), this sketch's buckets have FIXED boundaries,
    so the merge is plain count addition: the result is bit-identical at
    any partitioning, block size or cluster shape, and an exact SQL twin
    exists. Guaranteed relative error <= 2^-sub_bits on the estimate.

    Semantics (all int64; both engines compute exactly this):

    - ``x = floor(v * scale)`` per row; v must be >= 0 (loud guard —
      truncation vs floor diverges on negatives across engines);
    - bucket of x: ``e = max(bitlength(x) - 1 - sub_bits, 0)``,
      ``m = x >> e`` — values below ``2^(sub_bits+1)`` are EXACT
      (e == 0), larger ones keep their top ``sub_bits+1`` bits;
    - per-group weight W; 0-based target rank ``r = ((W-1) * qnum) //
      qden`` with ``q = (qnum, qden)`` the exact rational quantile
      (median = (1, 2) -> the lower median's bucket);
    - the answer is the representative ``rep = (lo + hi) // 2`` of the
      first bucket (ascending ``lo = m << e``) whose cumulative count
      exceeds r, reported as ``rep * 1_000_000 // scale`` micro-units.

    Shape: per-block partial = (keys, e, m, count) rows — bounded by
    ``n_groups x ~(64 - sub_bits) x 2^sub_bits`` whatever the block holds
    — then ONE keyed exchange (or ``combine="single_block"`` for
    enum-like keys) and a vectorized cumsum kernel per partition.
    """
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    qnum, qden = q
    sub = int(sub_bits)

    def _xbuckets(x: np.ndarray):
        if (x < 0).any():
            raise ValueError(
                "grouped_quantile_hist requires nonnegative values "
                "(bitlength bucketing; floor vs truncation diverges "
                "on negatives)")
        if (x >= 2 ** 53).any():
            raise ValueError(
                "grouped_quantile_hist: x >= 2^53 — frexp bitlength "
                "would round; lower scale")
        # exact bitlength via frexp: x = mant * 2^exp, 0.5 <= mant < 1
        # => bitlength(x) == exp (exact for x < 2^53)
        _, ex = np.frexp(x.astype(np.float64))
        e = np.maximum(ex - 1 - sub, 0).astype(np.int64)
        return e, x >> e

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[col])
        x = np.floor(df[col].to_numpy(np.float64) * scale).astype(np.int64)
        e, m = _xbuckets(x)
        g = df[keys].copy()
        g["__e"], g["__m"] = e, m
        res = g.groupby(keys + ["__e", "__m"], sort=False, dropna=False) \
               .size().rename("__c").reset_index()
        return res

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            res = df[keys].iloc[:0].copy()
            res[out] = pd.Series([], dtype="int64")
            return res
        g = df.groupby(keys + ["__e", "__m"], sort=False, dropna=False) \
              ["__c"].sum().reset_index()
        e = g["__e"].to_numpy(np.int64)
        m = g["__m"].to_numpy(np.int64)
        lo = m << e
        hi = ((m + 1) << e) - 1
        g["__lo"], g["__rep"] = lo, (lo + hi) // 2
        g = g.sort_values(keys + ["__lo"], kind="mergesort")
        grp = g.groupby(keys, sort=False, dropna=False)
        cum = grp["__c"].cumsum().to_numpy(np.int64)
        w = grp["__c"].transform("sum").to_numpy(np.int64)
        r = (w - 1) * qnum // qden
        sel = g.loc[cum >= r + 1].groupby(keys, sort=False,
                                          dropna=False).head(1)
        res = sel[keys].reset_index(drop=True)
        res[out] = (sel["__rep"].to_numpy(np.int64) * 1_000_000 // scale)
        return res

    proj = ds.select_columns(keys + [col])
    partials = proj.map_batches(partial, batch_size=None,
                                batch_format="pandas")
    if combine == "single_block":
        return partials.repartition(1).map_batches(
            finalize, batch_size=None, batch_format="pandas")
    return partition_map(partials, keys, finalize, batch_format="pandas",
                         num_partitions=num_partitions)
