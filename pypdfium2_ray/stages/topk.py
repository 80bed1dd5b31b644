"""Distributed top-k without a global sort (SURVEY §2.6 O-new).

``ds.sort(...).limit(k)`` is an all-to-all range exchange of EVERY row; for
top-k the per-block partial bound means only ``k x n_blocks`` rows ever
move: each block keeps its local top-k (vectorized pandas ``nlargest``-
style sort-head), the tiny union is sorted once on one node.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def topk(ds, cols: list[str], k: int, descending: list[bool] | bool = True):
    """Global top-k rows by ``cols`` (ties broken by later columns).

    ``descending``: bool or per-column list, as in ``Dataset.sort``.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(cols)
    ascending = [not d for d in descending]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(cols, ascending=ascending, kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols, ascending=ascending,
                              kind="mergesort").head(k)

    # the union of partials is <= k * n_blocks rows — tiny; collapse it to
    # ONE block and run the final selection as a single vectorized
    # whole-block call (no groupby machinery for a one-group combine)
    return partials.repartition(1).map_batches(
        final, batch_size=None, batch_format="pandas")


def grouped_topk(ds, keys: list[str], order_cols: list[str], k: int,
                 descending: list[bool] | bool = True,
                 num_partitions: int | None = None):
    """Top-k rows WITHIN each group (per-domain caps, best-N-per-language
    — the curation primitive that bounds any one group's contribution to
    a training set).

    Per-block partial: each block keeps its local per-group top-k (only
    ``k x groups-in-block`` rows survive, vectorized pandas
    sort+groupby.head — Cython, no per-group Python), then ONE hash
    exchange on *keys* colocates each group's partials and the same
    kernel finalizes. Ties broken by later ``order_cols``; make the last
    one unique for determinism.
    """
    from pypdfium2_ray.stages.exchange import partition_map

    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    ascending = [not d for d in descending]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending,
                            kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(k)

    partials = ds.map_batches(local_topk, batch_format="pandas")
    return partition_map(partials, keys, local_topk, batch_format="pandas",
                         num_partitions=num_partitions)


def stratified_sample(ds, keys: list[str], key_col: str, k: int,
                      num_partitions: int | None = None):
    """Deterministic per-group quota sample: keep each group's *k* rows
    with the smallest ``md5_hash64(key_col) >> 1`` (ties broken by the
    key itself) — the data-mixing primitive ("cap every language /
    domain at N docs") with run-, cluster- and shard-invariant
    membership, unlike ``ds.random_sample``.

    The hash is halved so it stays int64-safe on both the engine and the
    DuckDB twin (``md5_number_upper(key::VARCHAR) >> 1`` — order is
    preserved because ``>>1`` is monotonic; equal halves tie-break on the
    key identically on both sides).  Built on :func:`grouped_topk`: per-
    block partial quota then ONE hash exchange of the survivors.
    """
    from pypdfium2_ray.functions.sketch import md5_hash64

    def add_hash(t: pa.Table) -> pa.Table:
        import pyarrow as _pa
        h = [md5_hash64(str(v).encode()) >> 1
             for v in t[key_col].to_pylist()]
        return t.append_column("__h", _pa.array(h, _pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = grouped_topk(hashed, keys, ["__h", key_col], k=k,
                       descending=False, num_partitions=num_partitions)
    return out.drop_columns(["__h"])


def grouped_rank(ds, keys: list[str], order_cols: list[str],
                 out: str = "rank", descending: list[bool] | bool = False,
                 num_partitions: int | None = None):
    """Window rank: ``row_number() OVER (PARTITION BY keys ORDER BY
    order_cols)`` (1-based; make the last order col unique for
    determinism). ONE hash exchange on *keys*, then a vectorized
    per-partition kernel: sort + per-group arange via run offsets — no
    per-group Python at any group count. Payload columns ride along."""
    import numpy as np
    import pyarrow as pa

    from pypdfium2_ray.stages.exchange import partition_map

    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    ascending = [not d for d in descending]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_cols,
                            ascending=[True] * len(keys) + ascending,
                            kind="mergesort").reset_index(drop=True)
        gid = df.groupby(keys, sort=False, dropna=False).ngroup() \
            .to_numpy()
        starts = np.flatnonzero(np.concatenate(
            ([True], gid[1:] != gid[:-1]))) if len(gid) else \
            np.array([], np.int64)
        offs = np.repeat(starts, np.diff(np.append(starts, len(gid)))) \
            if len(starts) else np.array([], np.int64)
        df[out] = np.arange(len(gid)) - offs + 1
        return df

    return partition_map(ds, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_dense_topk(ds, keys: list[str], value_col: str, k: int,
                       out: str = "rank",
                       num_partitions: int | None = None):
    """Top-k WITH TIES per group — every row whose value is among the
    group's k highest DISTINCT values, annotated with that value's
    dense rank (``QUALIFY DENSE_RANK() OVER (PARTITION BY keys ORDER BY
    value DESC) <= k``). The leaderboard semantics ``grouped_topk``
    (row_number) cannot express: co-leaders all survive, and output
    size is data-dependent.

    Same two-level shape as ``grouped_topk`` and the proof carries
    over to ranks: within a block, a row's distinct values above it
    are a SUBSET of the group's global ones, so block dense rank <=
    global dense rank — any global top-k-distinct row survives its
    block partial. Partial bound is k DISTINCT VALUES per (group,
    block), not k rows; adversarial all-ties data degrades the bound
    (documented, never silently capped — ties are the semantics).
    Kernel is one Cython ``groupby.rank(method="dense")`` per level;
    ONE hash exchange of the survivors."""
    from pypdfium2_ray.stages.exchange import partition_map

    def level(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(**{out: pd.Series(dtype="int64")})
        r = df.groupby(keys, sort=False, dropna=False)[value_col] \
            .rank(method="dense", ascending=False)
        df = df.assign(**{out: r.astype("int64")})
        return df[df[out] <= k]

    partials = ds.map_batches(level, batch_format="pandas")
    return partition_map(partials, keys, level, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_cume(ds, keys: list[str], value_col: str, tiebreak: str,
                 num_partitions: int | None = None):
    """Exact CUME_DIST as an integer rational, all rows out: per row,
    ``cd_num`` = number of rows in its group with value <= its value
    (peers INCLUDED — the RANGE-frame semantics that row_number and
    dense_rank cannot express) and ``cd_den`` = group size;
    ``CUME_DIST() = cd_num / cd_den`` exactly, with no float division
    to hash-diverge. The twin is ``COUNT(*) OVER (... ORDER BY value
    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)``.

    ONE hash exchange; vectorized kernel: lexsort by (keys, value),
    boundary masks find value-run ENDS within each group (every peer
    reports the run's last index — that is the peer-inclusive count),
    per-group rebase via run offsets. No per-group Python."""
    import numpy as np
    import pyarrow as pa

    from pypdfium2_ray.stages.exchange import partition_map

    key = keys[0] if len(keys) == 1 else None
    if key is None:
        raise ValueError("grouped_cume supports a single key column")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                "cd_num": pd.Series(dtype="int64"),
                "cd_den": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        v = df[value_col].to_numpy()
        tb = df[tiebreak].to_numpy()
        order = np.lexsort((tb, v, k))
        k, v, tb = k[order], v[order], tb[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        kstarts = np.flatnonzero(new_key)
        kruns = np.diff(np.append(kstarts, n))
        # value-run geometry within keys: a run breaks on key OR value
        new_run = new_key | np.concatenate([[True], v[1:] != v[:-1]])
        rstarts = np.flatnonzero(new_run)
        rruns = np.diff(np.append(rstarts, n))
        run_end = np.repeat(rstarts + rruns, rruns)   # 1-past-peers, global
        seg_start = np.repeat(kstarts, kruns)
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             "cd_num": (run_end - seg_start)
                             .astype("int64"),
                             "cd_den": np.repeat(kruns, kruns)
                             .astype("int64")})

    return partition_map(ds.select_columns([key, value_col, tiebreak]),
                         [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)
