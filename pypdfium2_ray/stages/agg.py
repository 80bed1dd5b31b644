"""Shuffle-minimizing grouped aggregation (partial + combine).

The reference aggregates only trivially (per-run counters,
``cli/pageobjects.py:84-124``, ``cli/fonts.py:60-77``); at 100 TB a naive
``ds.groupby(keys).aggregate(...)`` shuffles every row. This stage pushes the
aggregation *partial* into a ``map_batches`` combiner (pyarrow ``group_by``
per block — vectorized, zero Python rows), so the wide exchange only moves
``n_blocks x n_groups`` partial rows; the final combine is a hash-partitioned
``map_batches`` running ONE pyarrow ``group_by`` per partition — vectorized
even at billions of groups (no per-group Python calls; see
``stages/exchange.partition_map``).

SURVEY §2.5 A-new ("partial+final: per-batch partials in the actor ->
groupby") and the guide's pre-aggregation pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

#: supported aggregation kinds
_KINDS = ("sum", "count", "min", "max", "mean")


def grouped_aggregate(ds, keys: list[str], specs: dict[str, tuple[str | None, str]],
                      batch_format: str = "pyarrow",
                      num_partitions: int | None = None,
                      combine: str = "exchange",
                      out_schema: "pa.Schema | None" = None):
    """Grouped aggregation with per-block partials.

    ``specs``: ``out_name -> (column, kind)`` with kind in
    ``{"sum","count","min","max","mean"}``; ``count`` is row count
    (column ignored, may be None). Output columns are exactly
    ``keys + list(specs)`` — name them to match the SQL oracle.

    ``combine`` picks the final-combine tier:

    - ``"exchange"`` (default) — hash-partition the partials on *keys*
      and combine per partition. Right whenever group cardinality grows
      with the data (urls, fingerprints, sessions).
    - ``"single_block"`` — coalesce the partials to ONE block and combine
      there, with NO hash exchange (so no aggregator-actor spawn: on this
      Ray 2.49 an exchange pays ~0.15 s per aggregator cold, the dominant
      cost of a small rollup). ONLY for enum-like keys whose cardinality
      is fixed at any corpus size (status codes, languages, flag pairs,
      value buckets): the coalesced input is ``n_partial_blocks x
      n_groups`` rows — a few hundred MB even at 100 TB for <=1k groups,
      but unbounded if groups scale with the data.

    ``out_schema`` (optional) declares the output schema
    (``keys + list(specs)`` columns) so a legitimately-empty result stays
    typed — Ray 2.49's all-to-all ops emit zero bundles for all-empty
    input and the downstream combine never runs, so without the
    declaration ``schema()`` is None on empty results (see
    ``stages/exchange.with_output_schema``). Pass it whenever the
    aggregate's INPUT can be empty (post-filter, anti-join tails).
    """
    if combine not in ("exchange", "single_block"):
        raise ValueError(f"unknown combine tier {combine!r}")
    for out, (_col, kind) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported agg kind {kind!r} for {out!r}")

    # --- partial: one pyarrow group_by per block -------------------------
    # partial columns: "{col}_{fn}" (means need sum + per-column valid count:
    # SQL AVG skips nulls, so dividing by the all-rows count would diverge
    # on null-bearing columns)
    partial_aggs: list[tuple[str, str]] = []   # (col, fn) for pa group_by, unique
    need_count_all = any(kind == "count" for (_c, kind) in specs.values())

    for out, (col, kind) in specs.items():
        fn = {"sum": "sum", "mean": "sum", "min": "min", "max": "max"}.get(kind)
        if fn and (col, fn) not in partial_aggs:
            partial_aggs.append((col, fn))
        if kind == "mean" and (col, "count") not in partial_aggs:
            partial_aggs.append((col, "count"))   # valid (non-null) count

    def partial(batch: pa.Table):
        # zero-COLUMN degenerate blocks (hash-shuffle aggregators emit
        # them for empty partitions upstream) contribute nothing — yield
        # no block rather than KeyError on the missing key columns
        if batch.num_columns:
            aggs = list(partial_aggs)
            if need_count_all:
                aggs.append(([], "count_all"))
            yield batch.group_by(keys, use_threads=False).aggregate(aggs)

    partials = ds.map_batches(partial, batch_format=batch_format)

    # --- combine: hash-partition partials on keys, then one vectorized
    # pyarrow group_by per partition (pyarrow names partials "{col}_{fn}";
    # re-aggregating appends the combine fn: "{col}_sum_sum" etc.)
    combine_aggs: list[tuple[str, str]] = []
    for col, fn in partial_aggs:
        comb = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[fn]
        combine_aggs.append((f"{col}_{fn}", comb))
    if need_count_all:
        combine_aggs.append(("count_all", "sum"))

    def combine_fn(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate(combine_aggs)
        cols = {k: g[k] for k in keys}
        for out, (col, kind) in specs.items():
            if kind == "sum":
                cols[out] = g[f"{col}_sum_sum"]
            elif kind == "count":
                cols[out] = pc.cast(g["count_all_sum"], pa.int64())
            elif kind == "mean":
                cols[out] = pc.divide(
                    pc.cast(g[f"{col}_sum_sum"], pa.float64()),
                    pc.cast(g[f"{col}_count_sum"], pa.float64()))
            elif kind == "min":
                cols[out] = g[f"{col}_min_min"]
            elif kind == "max":
                cols[out] = g[f"{col}_max_max"]
        return pa.table(cols)

    if combine == "single_block":
        from pypdfium2_ray.stages.exchange import (_schema_guarded,
                                                   with_output_schema)
        out = partials.repartition(1).map_batches(
            _schema_guarded(combine_fn, out_schema), batch_size=None,
            batch_format="pyarrow")
        if out_schema is not None:
            out = with_output_schema(out, out_schema)
        return out
    return partition_map(partials, keys, combine_fn,
                         num_partitions=num_partitions,
                         out_schema=out_schema)


def grouped_median(ds, keys: list[str], col: str, out: str = "median",
                   num_partitions: int | None = None):
    """Exact per-group median — a NON-associative aggregate, so no
    partial/combine split exists: every group's rows must colocate. One
    hash exchange (``partition_map``) then a single pandas
    ``groupby().median()`` per partition (Cython-vectorized, not a Python
    call per group). Even-sized groups average the middle two values,
    matching SQL ``median()`` over numerics.

    Scale note: this moves the full (keys, col) projection through the
    exchange — select those columns upstream; for sketch-based quantiles
    at whole-corpus scale, a t-digest partial would go in
    :func:`grouped_aggregate` instead."""
    import pandas as pd

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, dropna=False)[col].median().reset_index()
        return g.rename(columns={col: out})

    proj = ds.select_columns(keys + [col])
    return partition_map(proj, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_quantile_sketch(ds, keys: list[str], col: str, q: float = 0.5,
                            out: str = "median_est", delta: float = 200,
                            num_partitions: int | None = None,
                            combine: str = "exchange"):
    """Approximate per-group quantile via t-digest — the sketch tier of
    :func:`grouped_median` (its docstring names this path): each block
    compresses to <= ~delta/2 centroids per group, so the exchange moves
    only ``n_blocks x n_groups x delta/2`` centroid rows instead of the
    full ``(keys, col)`` projection. Rank error ~ ``q(1-q)/delta``
    (tested); estimates may differ in the last error digits across block
    layouts — inherent to mergeable sketches, the bound is not.

    ``combine`` as in :func:`grouped_aggregate` (``"single_block"`` for
    enum-like keys skips the hash exchange entirely).
    """
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.functions import tdigest

    def _centroids_df(df: pd.DataFrame, vcol: str, wcol: str | None):
        v = df[vcol].to_numpy(np.float64)
        w = (np.ones_like(v) if wcol is None
             else df[wcol].to_numpy(np.float64))
        gid = df.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        cg, cm, cw = tdigest.compress(gid, v, w, delta)
        uniq, first = np.unique(gid, return_index=True)
        rep = first[np.searchsorted(uniq, cg)]       # a row index per gid
        res = df.iloc[rep][keys].reset_index(drop=True)
        res["__td_mean"], res["__td_w"] = cm, cw
        return res, gid, uniq, first

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[col])
        if not len(df):
            return pd.DataFrame({**{k: df[k] for k in keys},
                                 "__td_mean": pd.Series([], dtype=float),
                                 "__td_w": pd.Series([], dtype=float)})
        return _centroids_df(df, col, None)[0]

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({**{k: df[k] for k in keys},
                                 out: pd.Series([], dtype=float)})
        merged = _centroids_df(df, "__td_mean", "__td_w")[0]
        gid2 = merged.groupby(keys, sort=False, dropna=False) \
                     .ngroup().to_numpy()
        est = tdigest.quantile(gid2, merged["__td_mean"].to_numpy(),
                               merged["__td_w"].to_numpy(), q,
                               int(gid2.max()) + 1)
        res = merged.loc[~pd.Series(gid2).duplicated().to_numpy(),
                         keys].reset_index(drop=True)
        res[out] = est[np.unique(gid2)]
        return res

    proj = ds.select_columns(keys + [col])
    partials = proj.map_batches(partial, batch_size=None,
                                batch_format="pandas")
    if combine == "single_block":
        return partials.repartition(1).map_batches(
            finalize, batch_size=None, batch_format="pandas")
    return partition_map(partials, keys, finalize, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_decay_sum(ds, keys: list[str], ts_col: str, value_col: str,
                      out: str = "decay_e4",
                      unit_us: int = 3_600_000_000, max_shift: int = 40,
                      scale: int = 10_000,
                      num_partitions: int | None = None):
    """Recency-decayed grouped sum — the exponential-decay activity
    score (recommender/abuse-detection recency weighting) with EXACT
    integer semantics: each row contributes ``round(value*scale) >>
    min(age_units, max_shift)`` where age is whole ``unit_us``
    intervals back from the GROUP's latest event (half-life = one
    unit). The decay is a binary shift on both engines — no libm
    ``pow`` whose rounding the SQL twin could not reproduce; the twin
    is ``v // (1::BIGINT << least(age, max_shift))``. Values must be
    nonnegative (>> floors, SQL // truncates toward zero — equal only
    for >= 0; enforced loudly). ONE hash exchange; the kernel is two
    Cython groupby passes (transform max + sum), zero per-group Python.
    """
    import numpy as np
    import pandas as pd

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({**{k: df[k] for k in keys},
                                 out: pd.Series([], dtype="int64")})
        # normalize to us regardless of the block's datetime64 resolution
        # (parquet arrives [us], pandas-born frames [ns] — the window.py
        # unit guard, without it ns inputs age 1000x too fast)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        latest = df.groupby(keys, sort=False)[ts_col].transform("max") \
            .to_numpy().astype("datetime64[us]").view("int64")
        age = (latest - ts) // unit_us
        v = np.rint(df[value_col].to_numpy() * scale).astype(np.int64)
        if (v < 0).any():
            raise ValueError("grouped_decay_sum requires nonnegative "
                             "values: >> floors but SQL // truncates, "
                             "so negatives diverge between the engines")
        shift = np.minimum(age, max_shift)
        g = df[keys].assign(**{out: v >> shift})
        return g.groupby(keys, sort=False, as_index=False)[out].sum()

    ds = ds.select_columns(keys + [ts_col, value_col])
    return partition_map(ds, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_mode(ds, keys: list[str], col: str, out_val: str = "mode",
                 out_n: str = "n", num_partitions: int | None = None):
    """Per-group MODE with a deterministic tie-break: the value of
    ``col`` with the highest count per key group, ties broken by
    smallest value — so the result is a pure function of the input set
    (the dominant-language / dominant-mime / majority-label aggregate).

    Classic two-level shape: per-block (keys, col) counts via pyarrow
    ``group_by`` shrink the wire to <= one row per (block, key, value),
    ONE hash exchange on *keys*, then a vectorized per-partition argmax
    (sum counts, sort by (n DESC, value ASC), keep first per key) —
    no per-group Python."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys + [col], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(keys + [col, "__n"])

    pre = ds.select_columns(keys + [col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + [col], sort=False, as_index=False)["__n"] \
            .sum()
        g = g.sort_values(keys + ["__n", col],
                          ascending=[True] * len(keys) + [False, True],
                          kind="mergesort")
        g = g.drop_duplicates(keys, keep="first")
        return g.rename(columns={col: out_val, "__n": out_n})

    return partition_map(pre, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_order_stats(ds, keys: list[str], col: str, tiebreak: str,
                        quarters=(1, 2, 3),
                        num_partitions: int | None = None):
    """Exact per-group DISCRETE order statistics: for each quarter q the
    ACTUAL element at sorted index ``q*(n-1)//4`` under the total order
    ``(col, tiebreak)`` — no interpolation, so the values are real rows
    and the SQL twin (row_number == index+1) matches bit-for-bit even on
    doubles (where interpolated quantiles would put IEEE expression
    order in the gate). Same colocation shape as grouped_median: one
    hash exchange, then a single vectorized kernel (lexsort, run
    geometry, one fancy-index gather per quarter)."""
    import numpy as np
    import pandas as pd

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({**{k: df[k] for k in keys},
                                 **{f"q{q}": pd.Series([], df[col].dtype)
                                    for q in quarters}})
        order = np.lexsort([df[tiebreak].to_numpy(), df[col].to_numpy()]
                           + [df[k].to_numpy() for k in reversed(keys)])
        kd = df.iloc[order]
        gid = kd.groupby(keys, sort=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.concatenate(
            ([True], gid[1:] != gid[:-1])))
        sizes = np.diff(np.append(starts, len(gid)))
        vals = kd[col].to_numpy()
        out = {k: kd[k].to_numpy()[starts] for k in keys}
        for q in quarters:
            out[f"q{q}"] = vals[starts + q * (sizes - 1) // 4]
        return pd.DataFrame(out)

    proj = ds.select_columns(keys + [col, tiebreak])
    return partition_map(proj, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_count_distinct(ds, keys: list[str], col: str,
                           out: str = "n_distinct",
                           combine: str = "exchange",
                           num_partitions: int | None = None):
    """Exact per-group COUNT(DISTINCT col) — the two-level aggregate:
    distinctness is decided on the ``(keys, col)`` PAIR axis, the count
    on the ``keys`` axis, and the two never share a partitioning.

    Shape: per-block pre-distinct (one pyarrow ``group_by`` — a block
    contributes each pair once, so the exchange moves at most
    ``n_blocks x pairs_per_block`` rows, never raw events), ONE hash
    exchange on ``keys + [col]`` colocating equal pairs, a per-partition
    distinct + count yielding per-partition partials (globally correct:
    a pair lives in exactly one partition), then the partial counts
    combine through :func:`grouped_aggregate` — ``combine="exchange"``
    (second, tiny exchange) when key cardinality scales with the data,
    ``combine="single_block"`` (total ONE exchange) for enum-like keys.

    The sketch twin for corpus-scale cardinalities is
    ``stages/textstats`` HLL (``distinct_users_hll``); this is the exact
    tier.
    """
    pair = keys + [col]

    def pre_distinct(t: pa.Table) -> pa.Table:
        return t.select(pair).group_by(pair, use_threads=False).aggregate([])

    dedup = ds.map_batches(pre_distinct, batch_format="pyarrow")

    def pair_count(t: pa.Table) -> pa.Table:
        u = t.group_by(pair, use_threads=False).aggregate([])
        return u.group_by(keys, use_threads=False).aggregate(
            [([], "count_all")])

    partials = partition_map(dedup, pair, pair_count,
                             num_partitions=num_partitions)
    return grouped_aggregate(partials, keys, {out: ("count_all", "sum")},
                             combine=combine,
                             num_partitions=num_partitions)


def grouped_moments(ds, keys: list[str], x_col: str, y_col: str,
                    combine: str = "exchange",
                    num_partitions: int | None = None):
    """Per-group second-order INTEGER moments of two pre-scaled int64
    columns: ``n, sum_x, sum_y, sum_xx, sum_yy, sum_xy`` — the
    associative partials behind variance, covariance, correlation and
    OLS slope (all derivable downstream with one scalar formula each;
    emitting the raw sums keeps the driver gate integer-exact where a
    float corr would hash-diverge across engines' summation orders).

    The caller pre-scales: inputs must be int64 with units chosen so
    every per-group sum fits (|sum x^2| < 2^63 — e.g. seconds-since-
    epoch-start, value in 1e-4 units). Products are one vectorized
    numpy multiply per block; everything downstream is
    :func:`grouped_aggregate` (per-block partials + one exchange, or a
    single-block combine for enum keys).
    """
    import numpy as np

    def widen(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {k: t[k] for k in keys}
        cols.update({"x": pa.array(x), "y": pa.array(y),
                     "xx": pa.array(x * x), "yy": pa.array(y * y),
                     "xy": pa.array(x * y)})
        return pa.table(cols)

    return grouped_aggregate(
        ds.select_columns(keys + [x_col, y_col])
          .map_batches(widen, batch_format="pyarrow"),
        keys,
        {"n": (None, "count"), "sum_x": ("x", "sum"),
         "sum_y": ("y", "sum"), "sum_xx": ("xx", "sum"),
         "sum_yy": ("yy", "sum"), "sum_xy": ("xy", "sum")},
        combine=combine, num_partitions=num_partitions)


def grouped_mad_outliers(ds, keys: list[str], col: str, tiebreak: str,
                         thresh_num: int = 3, thresh_den: int = 1,
                         num_partitions: int | None = None):
    """Robust per-group outlier detection: emit the rows whose distance
    from the group median exceeds ``(thresh_num/thresh_den) x MAD``
    (median absolute deviation) — the curation filter that survives the
    skew that makes mean/stddev gates useless (a single 1e9 value drags
    a z-score gate's own threshold past every other outlier; the median
    and MAD ignore it).

    Exactness discipline: *doubled* discrete medians keep everything in
    int64 — ``med2 = v[(n-1)//2] + v[n//2]`` over the ``(col, tiebreak)``
    total order (odd n: twice the middle element; even: the sum of the
    middle two — exactly 2x the SQL ``median``), per-row deviation
    ``dev2 = |2v - med2|`` (= 2x the true deviation), and ``mad4`` = the
    doubled discrete median of ``dev2`` (= 4x the true MAD). The outlier
    test ``|v - med| > t x MAD`` becomes the integer cross-multiplication
    ``2 x dev2 x thresh_den > thresh_num x mad4`` — no division, no
    floats, bit-reproducible against a row_number SQL twin.

    Degenerate MAD: when more than half a group equals its median,
    ``mad4 = 0`` and EVERY value off the median is flagged — the standard
    MAD collapse, deterministic and intentional (callers wanting a floor
    pass ``thresh_den`` scaled against a minimum absolute deviation).

    Scale shape: non-associative twice over (a median of deviations from
    a median), so the group must colocate — ONE hash exchange on *keys*
    (:func:`exchange.partition_map`), then a whole-partition vectorized
    kernel: two lexsorts + run-geometry gathers, zero per-group Python.
    Only the ``keys + [col, tiebreak]`` projection moves.

    Output: the outlier rows as ``keys + [tiebreak, col, dev2, mad4]``.
    """
    import numpy as np
    import pandas as pd

    def _doubled_median(sort_cols, gid_sorted, starts, sizes, vals_sorted):
        lo = vals_sorted[starts + (sizes - 1) // 2]
        hi = vals_sorted[starts + sizes // 2]
        return lo + hi

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = keys + [tiebreak, col, "dev2", "mad4"]
        if not len(df):
            empty = {k: df[k] for k in keys + [tiebreak, col]}
            empty["dev2"] = pd.Series([], dtype="int64")
            empty["mad4"] = pd.Series([], dtype="int64")
            return pd.DataFrame(empty)[cols]
        v = df[col].to_numpy()
        tb = df[tiebreak].to_numpy()
        karr = [df[k].to_numpy() for k in keys]
        # pass 1: doubled median of v per group
        o1 = np.lexsort([tb, v] + list(reversed(karr)))
        gid = df.groupby(keys, sort=False).ngroup().to_numpy()
        g1 = gid[o1]
        starts = np.flatnonzero(np.concatenate(([True], g1[1:] != g1[:-1])))
        sizes = np.diff(np.append(starts, len(g1)))
        med2_g = _doubled_median(None, g1, starts, sizes, v[o1])
        # group-id -> med2 lookup (gids are 0..n_groups-1 but starts order
        # follows the sort; scatter into a dense array)
        n_groups = int(gid.max()) + 1
        med2_by_gid = np.zeros(n_groups, dtype=np.int64)
        med2_by_gid[g1[starts]] = med2_g
        dev2 = np.abs(2 * v - med2_by_gid[gid])
        # pass 2: doubled median of dev2 per group
        o2 = np.lexsort([tb, dev2] + list(reversed(karr)))
        g2 = gid[o2]
        starts2 = np.flatnonzero(np.concatenate(([True],
                                                 g2[1:] != g2[:-1])))
        sizes2 = np.diff(np.append(starts2, len(g2)))
        mad4_g = _doubled_median(None, g2, starts2, sizes2, dev2[o2])
        mad4_by_gid = np.zeros(n_groups, dtype=np.int64)
        mad4_by_gid[g2[starts2]] = mad4_g
        mad4 = mad4_by_gid[gid]
        mask = 2 * dev2 * thresh_den > thresh_num * mad4
        out = {k: a[mask] for k, a in zip(keys, karr)}
        out[tiebreak] = tb[mask]
        out[col] = v[mask]
        out["dev2"] = dev2[mask]
        out["mad4"] = mad4[mask]
        return pd.DataFrame(out)[cols]

    proj = ds.select_columns(keys + [col, tiebreak])
    return partition_map(proj, keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)


#: periodic_delta's first-period marker: no real NULLs ever cross the
#: driver hash gate (it cannot sort mixed None/int), so the LAG hole is
#: a sentinel far outside any reachable sum (|values| are ~1e12 at
#: 100 TB; int64 holds +-9.2e18)
PERIOD_DELTA_SENTINEL = -(10 ** 17)


def periodic_delta(ds, label_col: str, ts_col: str, value_col: str,
                   out_sum: str = "sum_e4", out_delta: str = "delta_e4",
                   grain: str = "month"):
    """Period-over-period report: per (label, calendar period) sum of
    the pre-scaled int64 *value_col*, each row annotated with the delta
    vs the label's PREVIOUS period — ``sum - LAG(sum) OVER (PARTITION
    BY label ORDER BY period)``, the trend table.

    ZERO keyed exchanges: (label x period) is time-bounded, not
    data-bounded (|labels| is an enum, periods grow with the calendar),
    so the census rides the ``single_block`` tier — per-block pyarrow
    partials, one coalesced combine — and the LAG runs on that same
    single block (sort + shifted compare, a few thousand rows at any
    corpus size). First period of a label carries
    :data:`PERIOD_DELTA_SENTINEL` (COALESCE twin on the oracle side).

    ``grain``: ``"month"`` keys on ``year*100 + month``; ``"day"`` on
    ``year*10000 + month*100 + day`` — both via numpy datetime64
    calendar bucketing == DuckDB's year()/month()/day(). The LAG is
    over ADJACENT PRESENT periods (LAG semantics), not calendar
    adjacency — an empty period is skipped, not zero-filled, on both
    engines.
    """
    import numpy as np

    if grain not in ("month", "day"):
        raise ValueError(f"unknown grain {grain!r}")

    def prep(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        m = ts.astype("datetime64[M]").astype(np.int64)   # months since 1970
        ym = (m // 12 + 1970) * 100 + (m % 12 + 1)
        if grain == "day":
            day = (ts.astype("datetime64[D]")
                   - ts.astype("datetime64[M]")).astype(np.int64) + 1
            ym = ym * 100 + day
        return pa.table({label_col: t[label_col],
                         "ym": pa.array(ym, pa.int64()),
                         value_col: t[value_col]})

    monthly = grouped_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                                [label_col, "ym"],
                                {out_sum: (value_col, "sum")},
                                combine="single_block")

    def add_delta(t: pa.Table) -> pa.Table:
        lab = t[label_col].to_numpy(zero_copy_only=False)
        ym = t["ym"].to_numpy()
        s = t[out_sum].to_numpy().astype(np.int64)
        order = np.lexsort((ym, lab))
        lab, ym, s = lab[order], ym[order], s[order]
        same = np.concatenate([[False], lab[1:] == lab[:-1]])
        delta = np.where(same, s - np.concatenate([[0], s[:-1]]),
                         PERIOD_DELTA_SENTINEL)
        return pa.table({label_col: pa.array(lab),
                         "ym": pa.array(ym, pa.int64()),
                         out_sum: pa.array(s, pa.int64()),
                         out_delta: pa.array(delta, pa.int64())})

    return monthly.map_batches(add_delta, batch_size=None,
                               batch_format="pyarrow")


def grouped_ols_trend(ds, keys: list[str], ts_col: str, tiebreak: str,
                      value_col: str,
                      num_partitions: int | None = None):
    """Exact per-group OLS trend of *value_col* against the event's
    1-based SEQUENCE INDEX in ``(ts, tiebreak)`` order — "is this user's
    spend drifting up or down per event" — emitted as the EXACT integer
    rational ``slope = slope_num / slope_den`` with

        slope_num = n*Σxy − Σx·Σy,   slope_den = n*Σxx − (Σx)²

    (x = row_number, y = caller-pre-scaled int64). A float slope would
    hash-diverge across engines' summation orders; the rational is
    bit-exact (the SQL twin is the same integer formula over
    ``ROW_NUMBER() OVER``). ``slope_den = n²(n²−1)/12`` exactly — it is
    emitted anyway so the consumer never re-derives the formula. Groups
    with n == 1 are dropped (den 0, slope undefined).

    ONE hash exchange; the kernel is one lexsort + segment geometry +
    two ``np.add.reduceat`` passes — zero per-group Python. Overflow is
    guarded loudly: requires n³·max|y| < 2⁶³ per group (at web scale
    pre-aggregate to a coarser grain first — e.g. daily sums — before
    fitting)."""
    import numpy as np
    import pandas as pd

    key = keys[0] if len(keys) == 1 else None
    if key is None:
        raise ValueError("grouped_ols_trend supports a single key column")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "slope_num": pd.Series(dtype="int64"),
                "slope_den": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        y = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, y = k[order], y[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        n = np.diff(np.append(starts, len(k))).astype(np.int64)
        nmax = int(n.max())
        ymax = int(np.abs(y).max()) if len(y) else 0
        # num needs n³·max|y| < 2⁶³; den's largest INTERMEDIATE is
        # n·Σxx = n²(n+1)(2n+1)/6 ≈ n⁴/3, which for small max|y| (e.g. 1)
        # wraps long before the num guard trips (n ≳ 103k) — check both,
        # with the den bound computed exactly in Python ints
        if (nmax ** 3 * max(ymax, 1) >= 2 ** 63
                or nmax * (nmax * (nmax + 1) * (2 * nmax + 1) // 6)
                >= 2 ** 63):
            raise ValueError(
                f"grouped_ols_trend int64 overflow risk: n={nmax}, "
                f"max|y|={ymax} — pre-aggregate to a coarser grain")
        x = np.arange(len(k), dtype=np.int64) \
            - np.repeat(starts, n).astype(np.int64) + 1
        sum_y = np.add.reduceat(y, starts)
        sum_xy = np.add.reduceat(x * y, starts)
        sum_x = n * (n + 1) // 2
        sum_xx = n * (n + 1) * (2 * n + 1) // 6
        num = n * sum_xy - sum_x * sum_y
        den = n * sum_xx - sum_x * sum_x
        keep = n >= 2
        return pd.DataFrame({key: k[starts][keep].astype("int64"),
                             "n": n[keep],
                             "slope_num": num[keep],
                             "slope_den": den[keep]})

    proj = ds.select_columns([key, ts_col, tiebreak, value_col])
    return partition_map(proj, [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def grouped_gini(ds, keys: list[str], value_col: str,
                 num_partitions: int | None = None):
    """Exact per-group Gini concentration of a nonnegative pre-scaled
    int64 *value_col* — "how unequal is this user's spend across their
    events" (0 = perfectly even, →1 = one event dominates) — emitted as
    the EXACT integer rational ``gini = gini_num / gini_den`` with

        gini_num = 2·Σ(i·x₍ᵢ₎) − (n+1)·Σx,   gini_den = n·Σx

    over x ascending, i = 1..n. Tie order cannot matter (equal x swap
    rank but Σ i·x over a tied block is order-invariant), so the
    rational is bit-exact and the SQL twin is the same formula over
    ``ROW_NUMBER() OVER (ORDER BY x)``. Zero-sum groups emit den 0
    rather than erroring (no division happens here). Negative values
    are rejected loudly (Gini is undefined below zero).

    ONE hash exchange; lexsort + segment geometry + two
    ``np.add.reduceat`` — zero per-group Python. Overflow guard:
    n²·max(x) < 2⁶³ per group."""
    import numpy as np
    import pandas as pd

    key = keys[0] if len(keys) == 1 else None
    if key is None:
        raise ValueError("grouped_gini supports a single key column")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "gini_num": pd.Series(dtype="int64"),
                "gini_den": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        x = df[value_col].to_numpy().astype(np.int64)
        if (x < 0).any():
            raise ValueError("grouped_gini requires nonnegative values")
        order = np.lexsort((x, k))
        k, x = k[order], x[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        n = np.diff(np.append(starts, len(k))).astype(np.int64)
        nmax = int(n.max())
        xmax = int(x.max()) if len(x) else 0
        if nmax * nmax * max(xmax, 1) >= 2 ** 62:
            raise ValueError(
                f"grouped_gini int64 overflow risk: n={nmax}, "
                f"max(x)={xmax} — pre-scale down or pre-aggregate")
        i = np.arange(len(k), dtype=np.int64) \
            - np.repeat(starts, n).astype(np.int64) + 1
        sum_x = np.add.reduceat(x, starts)
        sum_ix = np.add.reduceat(i * x, starts)
        num = 2 * sum_ix - (n + 1) * sum_x
        den = n * sum_x
        return pd.DataFrame({key: k[starts].astype("int64"),
                             "n": n,
                             "gini_num": num,
                             "gini_den": den})

    proj = ds.select_columns([key, value_col])
    return partition_map(proj, [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def leading_digit_counts(ds, keys: list[str], value_col: str,
                         out: str = "n"):
    """Benford / leading-significant-digit profile: counts per
    ``keys + (digit,)`` of the first decimal digit of a POSITIVE
    pre-scaled int64 *value_col* — the classic fraud / synthetic-data
    smell test (organic magnitudes follow Benford's log law; generated
    or capped ones don't). Zero/negative values are rejected loudly
    (they have no leading significant digit).

    ZERO keyed exchanges: the digit is a vectorized log-bounded
    ``//10`` reduction per block (<= 19 passes for int64, no string
    round-trip, no libm log whose edge rounding the SQL twin could
    miss), then block partials + single-block enum combine — digit x
    enum-keys cardinality is fixed at any corpus size."""
    import numpy as np

    def widen(t: pa.Table) -> pa.Table:
        d = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) and int(d.min()) <= 0:
            raise ValueError("leading_digit_counts requires positive "
                             "values (no leading digit below 1)")
        d = d.copy()
        while len(d) and int(d.max()) >= 10:
            big = d >= 10
            d[big] //= 10
        cols = {k: t[k] for k in keys}
        cols["digit"] = pa.array(d)
        return pa.table(cols)

    return grouped_aggregate(
        ds.select_columns(keys + [value_col])
          .map_batches(widen, batch_format="pyarrow"),
        keys + ["digit"], {out: (None, "count")}, combine="single_block")


def ks_two_sample(ds, value_col: str, side_col: str, side_a, side_b):
    """Exact two-sample Kolmogorov–Smirnov distance between the
    *value_col* distributions of two populations (``side_col`` ==
    *side_a* vs *side_b*) — the distribution-drift gate every corpus
    refresh wants ("did purchase values shift vs views"). Emitted as
    ONE row, the EXACT integer rational ``D = d_num / d_den`` with

        d_num = max over distinct v of |cum_a(v)*n_b − cum_b(v)*n_a|
        d_den = n_a * n_b

    (cum = inclusive counts in value order), bit-exact vs the
    window-cumsum SQL twin; a float ECDF would hash-diverge. Requires
    ``n_a * n_b < 2⁶³`` — KS is scale-free, sample first at web scale.

    Shape: per-block (value, side) partials → ONE hash-exchange combine
    to distinct values (materialized: it is the shrunken ECDF support,
    reused three times — totals + two prefix scans — without
    recompute) → :func:`~pypdfium2_ray.stages.scan.ranged_prefix_sum`
    per side (range exchanges: global cumulative counts WITHOUT a
    global sort) → per-block pre-max → single tiny fold. The driver
    touches only the two scalar totals and the final row."""
    import numpy as np

    from pypdfium2_ray.stages.scan import ranged_prefix_sum

    def widen(t: pa.Table) -> pa.Table:
        s = t[side_col].to_numpy(zero_copy_only=False)
        a = (s == side_a).astype(np.int64)
        b = (s == side_b).astype(np.int64)
        keep = (a + b) > 0
        return pa.table({value_col: pc.filter(t[value_col],
                                              pa.array(keep)),
                         "ca": pa.array(a[keep]), "cb": pa.array(b[keep])})

    per_value = grouped_aggregate(
        ds.select_columns([value_col, side_col])
          .map_batches(widen, batch_format="pyarrow"),
        [value_col], {"ca": ("ca", "sum"), "cb": ("cb", "sum")}) \
        .materialize()
    tot = per_value.sum(["ca", "cb"]) or {}
    n_a = int(tot.get("sum(ca)") or 0)
    n_b = int(tot.get("sum(cb)") or 0)
    if n_a * n_b >= 2 ** 63:
        raise ValueError("ks_two_sample int64 overflow: sample first")

    cum = ranged_prefix_sum(per_value, value_col, "ca", out="cum_a_prev")
    cum = ranged_prefix_sum(cum, value_col, "cb", out="cum_b_prev")

    def block_max(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum_a = t["cum_a_prev"].to_numpy(zero_copy_only=False) + ca
        cum_b = t["cum_b_prev"].to_numpy(zero_copy_only=False) + cb
        d = np.abs(cum_a * n_b - cum_b * n_a)
        return pa.table({"d_part": pa.array(
            [int(d.max())] if len(d) else [], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        mx = pc.max(t["d_part"]).as_py() if t.num_rows else None
        return pa.table({"d_num": pa.array([int(mx or 0)], pa.int64()),
                         "d_den": pa.array([n_a * n_b], pa.int64()),
                         "n_a": pa.array([n_a], pa.int64()),
                         "n_b": pa.array([n_b], pa.int64())})

    return cum.map_batches(block_max, batch_format="pyarrow") \
        .repartition(1).map_batches(fold, batch_size=None,
                                    batch_format="pyarrow")


def weighted_median(ds, keys: list[str], value_col: str, weight_col: str,
                    out: str = "wmedian"):
    """Exact per-group LOWER WEIGHTED MEDIAN of an int64 *value_col*
    under nonnegative int64 *weight_col*: the smallest value v with
    ``2 * cumweight(<= v) >= total_weight`` — the quantity-weighted
    "typical price" (an unweighted median over repeated rows, computed
    without materializing the repeats). Integer comparisons end to end;
    the SQL twin is the same window-cumsum crossing rule, so the
    result is bit-exact.

    ZERO keyed exchanges — for ENUM-cardinality keys only: per-block
    ``(keys, value)`` weight partials (one pyarrow group_by per block)
    shrink each block to its distinct values, then ONE single-block
    combine runs the lexsort + segment cumsum + first-crossing kernel.
    The coalesced input is bounded by n_groups x distinct-value
    cardinality (document the bound for your domain — prices in cents
    are ~1e6 rows per group even at 100 TB); for keys that grow with
    the data use a hash exchange on *keys* instead."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({**{k: t[k] for k in keys},
                         "v": pc.cast(t[value_col], pa.int64()),
                         "w": pc.cast(t[weight_col], pa.int64())}) \
            .group_by(keys + ["v"], use_threads=False) \
            .aggregate([("w", "sum")])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: t[k] if k in t.column_names
                                else pa.array([], pa.string())
                                for k in keys},
                             out: pa.array([], pa.int64())})
        g = t.group_by(keys + ["v"], use_threads=False) \
            .aggregate([("w_sum", "sum")])
        df = g.to_pandas()
        order = np.lexsort([df["v"].to_numpy()]
                           + [df[k].to_numpy() for k in reversed(keys)])
        df = df.iloc[order]
        w = df["w_sum_sum"].to_numpy().astype(np.int64)
        if len(w) and int(w.min()) < 0:
            raise ValueError("weighted_median requires nonnegative "
                             "weights")
        gid = df.groupby(keys, sort=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.concatenate(
            ([True], gid[1:] != gid[:-1])))
        runs = np.diff(np.append(starts, len(gid)))
        cw = np.cumsum(w)
        base = np.repeat(cw[starts] - w[starts], runs)
        cw = cw - base
        tw = np.repeat(np.add.reduceat(w, starts), runs)
        crossing = 2 * cw >= tw
        # first crossing per group: a crossing row whose predecessor
        # within the group is not crossing (cw nondecreasing => the
        # crossing set is a suffix of each group)
        first = crossing & ~np.concatenate([[False], crossing[:-1]])
        first[starts] = crossing[starts]
        sel = df.iloc[np.flatnonzero(first)]
        cols = {k: sel[k].to_numpy() for k in keys}
        cols[out] = sel["v"].to_numpy().astype(np.int64)
        return pa.table(cols)

    partials = ds.select_columns(keys + [value_col, weight_col]) \
        .map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(kernel, batch_size=None,
                                               batch_format="pyarrow")


def grouped_type_bitmask(ds, keys: list[str], label_col: str,
                         bit_map: dict[str, int],
                         out: str = "type_mask",
                         num_partitions: int | None = None):
    """Per-group BIT_OR over an enum label column: each group's set of
    seen labels packed into one int64 mask (bit *bit_map[label]*), plus
    the popcount — the feature-hashing "which event families has this
    user touched" encoding. Because the bits are distinct powers of
    two, ``OR == SUM(DISTINCT bit)``, which is exactly the SQL twin —
    no engine-specific BIT_OR needed. Unknown labels are rejected
    loudly (a silent 0 bit would alias 'absent').

    ONE hash exchange: blocks pre-distinct ``(keys, bit)`` pairs (one
    pyarrow group_by), the per-partition kernel re-distincts and sums —
    bits per group are globally distinct after the key exchange."""
    import numpy as np

    items = sorted(bit_map.items())
    names = np.array([k for k, _ in items])
    bits = np.array([1 << b for _, b in items], np.int64)

    def widen(t: pa.Table) -> pa.Table:
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(str)
        idx = np.searchsorted(names, lab)
        bad = (idx >= len(names)) | (names[np.minimum(
            idx, len(names) - 1)] != lab)
        if bad.any():
            raise ValueError(
                f"grouped_type_bitmask: unmapped labels "
                f"{sorted(set(lab[bad]))[:5]} — extend bit_map")
        return pa.table({**{k: t[k] for k in keys},
                         "bit": pa.array(bits[idx])}) \
            .group_by(keys + ["bit"], use_threads=False).aggregate([])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({**{k: pa.array([], pa.int64()) for k in keys},
                          out: pa.array([], pa.int64()),
                          "n_types": pa.array([], pa.int64())})
        if t.num_rows == 0 or "bit" not in t.column_names:
            return empty
        d = t.group_by(keys + ["bit"], use_threads=False).aggregate([]) \
            .group_by(keys, use_threads=False) \
            .aggregate([("bit", "sum"), ([], "count_all")])
        cols = {k: d[k] for k in keys}
        cols[out] = pc.cast(d["bit_sum"], pa.int64())
        cols["n_types"] = pc.cast(d["count_all"], pa.int64())
        return pa.table(cols)

    widened = ds.select_columns(keys + [label_col]) \
        .map_batches(widen, batch_format="pyarrow")
    return partition_map(widened, keys, kernel,
                         num_partitions=num_partitions)
