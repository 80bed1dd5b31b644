"""Frequency / cardinality operators: exact heavy hitters via a mergeable
Misra-Gries sketch, exact grouped distinct counts, and a HyperLogLog tier.

Heavy hitters ("which tokens/urls/hosts appear >= phi of the time") is the
classic can't-groupby-everything problem: an exact ``groupby(token)`` at
100 TB shuffles every token occurrence. The scale shape here is the
two-pass sketch-then-verify:

1. **Sketch pass** — each block reduces its token counts to a k-counter
   Misra-Gries summary (Misra & Gries 1982; mergeability per Agarwal et
   al., "Mergeable Summaries", PODS'12): keep the k largest counts minus
   the (k+1)-th largest. Any item's true count is under-counted by at most
   ``err = sum of per-reduction decrements <= N/k``, so with
   ``k >= N/threshold`` every true heavy hitter provably survives. The
   exchange moves <= ``k x n_blocks`` (value, cnt) rows — pre-aggregated,
   like every other exchange in this repo — and per-value sums finalize in
   one vectorized kernel per partition. The error budget rides along as
   null-value sentinel rows (one per block: its decrement total + its raw
   item total), so the candidate gate knows both N and err EXACTLY with no
   extra pass.
2. **Verify pass** — the candidate set (tiny by construction) is broadcast
   (``ray.put``), a second scan counts ONLY candidate values (vectorized
   ``is_in`` filter), and the final ``>= threshold`` filter runs on exact
   counts. Output is therefore EXACT — the sketch only bounds what must be
   re-counted — which is what makes the op oracle-checkable
   (``HAVING count(*) >= threshold`` in SQL).

If ``err >= threshold`` the sketch cannot certify completeness; the op
raises with the sizing rule rather than silently returning a subset (the
repo's no-silent-caps discipline).

No reference analogue (pypdfium2 has no corpus layer); the op family is
standard large-scale training-data curation (vocabulary pruning, boilerplate
token discovery, hot-key detection before a shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

#: whitespace class shared with the docmodel / text twins
from pypdfium2_ray.functions.text import WS_RE


def explode_tokens(t: pa.Table, col: str = "text",
                   out: str = "token") -> pa.Table:
    """One row per whitespace-delimited token (vectorized RE2 split +
    list_flatten; empty tokens from leading/trailing runs dropped).
    SQL twin: ``unnest(regexp_split_to_array(col, '[ \\t\\r\\n\\f\\v]+'))
    ... WHERE token <> ''``."""
    toks = pc.list_flatten(pc.split_pattern_regex(t[col], WS_RE))
    toks = toks.filter(pc.not_equal(toks, ""))
    return pa.table({out: toks})


def explode_bigrams(t: pa.Table, col: str = "text",
                    out: str = "token") -> pa.Table:
    """One row per adjacent word pair ("w1 w2") within each document —
    all offsets arithmetic, no Python per row: split to token lists, drop
    empty tokens, join each token with its successor, and mask out the
    pairs that straddle a document boundary. SQL twin (DuckDB list
    comprehension over the same split): ``unnest([a[i] || ' ' || a[i+1]
    for i in range(1, len(a))])`` with ``a = list_filter(split, t ->
    t <> '')``."""
    toks = pc.split_pattern_regex(t[col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    offs = la.offsets.to_numpy()
    doc = np.repeat(np.arange(len(la), dtype=np.int64), np.diff(offs))
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    doc = doc[keep.to_numpy(zero_copy_only=False)]
    if len(flat) < 2:
        return pa.table({out: pa.array([], pa.string())})
    pairs = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    return pa.table({out: pairs.filter(pa.array(doc[1:] == doc[:-1]))})


def explode_ngrams(t: pa.Table, n: int, col: str = "text",
                   doc_col: str | None = None,
                   out: str = "gram") -> pa.Table:
    """One row per word n-gram ("w1 ... wn") within each document — the
    n-ary generalization of :func:`explode_bigrams` (same offsets
    arithmetic: n shifted slices joined element-wise, boundary-straddling
    windows masked). ``doc_col`` carries the id through when given. SQL
    twin: ``unnest([a[i] || ' ' || ... || a[i+n-1] for i in
    range(1, len(a) - (n-1))])``."""
    toks = pc.split_pattern_regex(t[col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    offs = la.offsets.to_numpy()
    row = np.repeat(np.arange(len(la), dtype=np.int64), np.diff(offs))
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    row = row[keep.to_numpy(zero_copy_only=False)]
    cols = {}
    if len(flat) < n:
        cols[out] = pa.array([], pa.string())
        if doc_col is not None:
            cols[doc_col] = pa.array([], pa.int64())
        return pa.table(cols)
    m = len(flat) - (n - 1)
    grams = pc.binary_join_element_wise(
        *(flat.slice(j, m) for j in range(n)), " ")
    intra = row[n - 1:] == row[:m]          # window stays in one doc
    cols[out] = grams.filter(pa.array(intra))
    if doc_col is not None:
        cols[doc_col] = pc.take(pc.cast(t[doc_col], pa.int64()),
                                pa.array(row[:m][intra]))
    return pa.table(cols)


def _mg_reduce(vals: np.ndarray, counts: np.ndarray, k: int):
    """Reduce exact (value, count) pairs to <= k Misra-Gries counters.
    Returns (vals, stored_counts, decrement) where every surviving count
    was lowered by exactly ``decrement`` (the (k+1)-th largest count) and
    any item's true count <= stored + decrement."""
    if vals.size <= k:
        return vals, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    c_star = int(counts[order[k]])
    keep = order[:k][counts[order[:k]] > c_star]
    return vals[keep], counts[keep] - c_star, c_star


def heavy_hitters(make_ds, value_col: str,
                  threshold_frac: float | None = None,
                  threshold_count: int | None = None,
                  k_sketch: int = 4096,
                  num_partitions: int | None = None):
    """Exact values occurring >= threshold times in ``make_ds()``'s
    ``value_col`` (two-pass sketch-then-verify; see module docstring).

    ``make_ds``: zero-arg callable returning the (lazy) input Dataset —
    called once per pass, so each pass streams its own scan instead of
    re-executing a shared lineage twice implicitly.

    Threshold: ``threshold_count`` absolute, or ``threshold_frac`` of the
    total row count N (resolved exactly from the sketch pass's sentinel
    totals). Completeness requires ``k_sketch >= N / threshold`` — checked
    at runtime (raises, never silently incomplete).

    Returns a Dataset with columns ``(value_col, n)`` — exact counts.
    """
    import ray

    assert (threshold_frac is None) != (threshold_count is None), \
        "exactly one of threshold_frac / threshold_count"

    def partial(t: pa.Table) -> pa.Table:
        s = t[value_col].to_pandas()
        vc = s.value_counts()
        vals, counts, dec = _mg_reduce(
            vc.index.to_numpy(), vc.to_numpy(np.int64), k_sketch)
        # sentinel row (null value): this block's raw total + decrement
        return pa.table({
            value_col: pa.array(list(vals) + [None], pa.string()),
            "cnt": pa.array(np.r_[counts, len(s)], type=pa.int64()),
            "err": pa.array(np.r_[np.zeros(vals.size, np.int64), dec],
                            type=pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        return t.group_by([value_col], use_threads=False).aggregate(
            [("cnt", "sum"), ("err", "sum")])

    sketch = partition_map(
        make_ds().map_batches(partial, batch_size=None,
                              batch_format="pyarrow"),
        [value_col], combine, num_partitions=num_partitions)
    # tiny by construction: <= k_sketch surviving counters + sentinels
    summary = sketch.to_pandas()

    sent = summary[value_col].isna()
    n_total = int(summary.loc[sent, "cnt_sum"].sum())
    err = int(summary.loc[sent, "err_sum"].sum())
    threshold = (int(threshold_count) if threshold_count is not None
                 else max(1, int(np.ceil(threshold_frac * n_total))))
    if err >= threshold:
        raise ValueError(
            f"heavy_hitters sketch cannot certify completeness: undercount "
            f"bound err={err} >= threshold={threshold}. Raise k_sketch to "
            f">= N/threshold = {-(-n_total // max(threshold, 1))} "
            f"(N={n_total}, k_sketch={k_sketch}).")
    cand = summary.loc[~sent & (summary["cnt_sum"] >= threshold - err),
                       value_col]
    cand_ref = ray.put(pa.array(cand.to_numpy(), pa.string()))

    def count_candidates(t: pa.Table) -> pa.Table:
        vals = ray.get(cand_ref)                     # plasma-local, shared
        col = t[value_col]
        kept = col.filter(pc.is_in(col, value_set=vals))
        vc = kept.to_pandas().value_counts()
        return pa.table({value_col: pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    partials = make_ds().map_batches(count_candidates, batch_size=None,
                                     batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by([value_col], use_threads=False).aggregate(
            [("n", "sum")])
        g = pa.table({value_col: g[value_col],
                      "n": pc.cast(g["n_sum"], pa.int64())})
        return g.filter(pc.greater_equal(g["n"], threshold))

    # candidate cardinality is sketch-bounded => single-block combine
    return partials.repartition(1).map_batches(final, batch_size=None,
                                               batch_format="pyarrow")


# ===========================================================================
# distinct counts: exact (oracle-checkable) and HyperLogLog (sketch tier)

def grouped_distinct_count(ds, keys: list[str], col: str,
                           out: str = "n_distinct",
                           num_partitions: int | None = None,
                           combine: str = "exchange"):
    """Exact ``count(distinct col)`` per group: per-block distinct
    (pre-combine) -> ONE hash exchange on ``keys + [col]`` (equal pairs
    co-partition, so a per-partition distinct is globally exact) -> count
    per key. ``combine`` sizes the final count tier as in
    ``agg.grouped_aggregate`` (``single_block`` for enum-like keys)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate

    pair_cols = keys + [col]

    def distinct(t: pa.Table) -> pa.Table:
        return t.select(pair_cols).group_by(
            pair_cols, use_threads=False).aggregate([])

    pre = ds.map_batches(distinct, batch_format="pyarrow")
    pairs = partition_map(pre, pair_cols, distinct,
                          num_partitions=num_partitions)
    return grouped_aggregate(pairs, keys, {out: (None, "count")},
                             combine=combine)


#: HLL precision: 2^p registers; standard error ~ 1.04 / sqrt(2^p)
HLL_P = 12


def _hll_registers(gid: np.ndarray, values: pd.Series, n_groups: int,
                   p: int = HLL_P) -> np.ndarray:
    """(n_groups, 2^p) uint8 register matrix — fully vectorized: one
    deterministic 64-bit hash per value (pandas ``hash_array``, fixed
    hash_key), top ``p`` bits pick the register, leading-zero count of the
    rest sets it (Flajolet et al., HyperLogLog, AofA'07)."""
    from pandas.util import hash_array
    assert p >= 12, "clz-via-log2 sentinel needs p >= 12"
    h = hash_array(values.to_numpy(), hash_key="pypdfium2rayhll0")
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel ones
    # rho = leading zeros of rest + 1, via float64 log2 on the top bits
    # (exact: rest >> 11 keeps 53 bits, enough to locate the highest bit)
    top = (rest >> np.uint64(11)).astype(np.float64)
    rho = (64 - 11) - np.floor(np.log2(top)).astype(np.int64)
    regs = np.zeros((n_groups, 1 << p), np.uint8)
    np.maximum.at(regs, (gid, idx), rho.astype(np.uint8))
    return regs


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Bias-corrected HLL estimate per row of a register matrix (small- and
    large-range corrections per the paper)."""
    m = regs.shape[1]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)),
                                 axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    est[small] = (m * np.log(m / zeros[small]))
    return est


def _hll_registers_md5(gid: np.ndarray, values: pd.Series, n_groups: int,
                       p: int = HLL_P) -> np.ndarray:
    """Register matrix with an exact SQL twin: hash = DuckDB
    ``md5_number_upper(CAST(v AS VARCHAR))`` (``sketch.md5_hash64``), top
    ``p`` bits pick the register, ``rho = (64-p+1) - bit_length(low bits)``.
    Bit length comes from ``np.frexp``'s exponent — exact for any integer
    below 2^53 (no log2 rounding hazard), hence the ``p >= 11`` bound."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    assert p >= 11, "frexp bit-length needs the low field <= 53 bits"
    codes, uniq = pd.factorize(values)           # md5 once per distinct value
    hu = np.fromiter((md5_hash64(str(v).encode()) for v in uniq),
                     dtype=np.uint64, count=len(uniq))
    h = hu[codes]
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    bl = np.frexp(low.astype(np.float64))[1]     # == bit_length; 0 for low=0
    rho = ((64 - p + 1) - bl).astype(np.uint8)   # low=0 -> max rho, sentinel
    regs = np.zeros((n_groups, 1 << p), np.uint8)
    np.maximum.at(regs, (gid, idx), rho)
    return regs


def _hll_estimate_micro(regs: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """``floor(estimate * 1e6)`` per register row, SQL-reproducible: the
    harmonic sum is a dyadic rational computed EXACTLY as the integer
    ``N = zeros * 2^Q + sum(2^(Q - M_j))`` (``Q = 64-p+1`` = max rho), so
    ``raw = (alpha*m^2) * 2^Q / N`` is one IEEE double expression evaluated
    in the same order on both sides; the small-range correction's ``ln`` is
    the platform libm on both numpy and DuckDB (bit-exact per the bm25
    discipline, stages/bm25.py:31-37)."""
    m = regs.shape[1]
    q = 64 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    out = np.empty(regs.shape[0], np.int64)
    for i in range(regs.shape[0]):               # few groups; exact int N
        counts = np.bincount(regs[i], minlength=q + 1)
        n = int(counts[0]) << q
        for j in range(1, q + 1):
            n += int(counts[j]) << (q - j)
        zeros = int(counts[0])
        raw = (alpha * (m * m)) * float(1 << q) / float(n)
        est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
        out[i] = int(np.floor(est * 1e6))
    return out


def grouped_distinct_hll(ds, keys: list[str], col: str,
                         out: str = "n_distinct_est", p: int = HLL_P,
                         num_partitions: int | None = None,
                         combine: str = "exchange", hash: str = "fast"):
    """Approximate distinct count per group — the sketch tier of
    :func:`grouped_distinct_count` for when the exact pair exchange is no
    longer affordable: each block emits ONE ``2^p``-byte register row per
    group (merge = elementwise max, order- and layout-independent), so the
    exchange moves ``n_blocks x n_groups`` fixed-size rows regardless of
    value cardinality. Standard error ~ ``1.04/sqrt(2^p)`` (~1.6% at the
    default p=12; bound-tested in tests/test_freq.py).

    ``hash="md5"`` switches to the SQL-twinned tier: md5-based registers
    (one md5 per distinct value per block) and a fixed-point
    ``floor(est*1e6)`` estimate whose every ingredient — register indices,
    rho values, the exact-integer harmonic sum, the linear-counting
    correction — is reproducible in DuckDB, making the ESTIMATE itself
    (hash collisions and bias included) oracle-checkable, the same
    discipline as the Count-Min tier. ``hash="fast"`` (default) keeps the
    cheaper vectorized pandas hash and float estimate for production use."""
    fixed_point = hash == "md5"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[col])
        if fixed_point:
            df = df.drop_duplicates(subset=keys + [col])
        if not len(df):
            return pd.DataFrame({**{k: df[k] for k in keys},
                                 "__hll": pd.Series([], dtype=object)})
        gid = df.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        mk = _hll_registers_md5 if fixed_point else _hll_registers
        regs = mk(gid, df[col], int(gid.max()) + 1, p)
        rep = np.unique(gid, return_index=True)[1]
        res = df.iloc[rep][keys].reset_index(drop=True)
        res["__hll"] = list(regs)                    # fixed-size u8 rows
        return res

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        gid = df.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        regs = np.zeros((int(gid.max()) + 1, 1 << p), np.uint8)
        np.maximum.at(regs, gid,
                      np.stack(df["__hll"].to_numpy()))  # merge = max
        rep = np.unique(gid, return_index=True)[1]
        res = df.iloc[rep][keys].reset_index(drop=True)
        if fixed_point:
            res[out] = _hll_estimate_micro(regs, p)
        else:
            res[out] = np.round(_hll_estimate(regs)).astype(np.int64)
        return res

    proj = ds.select_columns(keys + [col])
    partials = proj.map_batches(partial, batch_size=None,
                                batch_format="pandas")
    if combine == "single_block":
        return partials.repartition(1).map_batches(
            finalize, batch_size=None, batch_format="pandas")
    return partition_map(partials, keys, finalize, batch_format="pandas",
                         num_partitions=num_partitions)


def collocations(ds, text_col: str = "text", k: int = 20,
                 num_partitions: int | None = None):
    """Top-*k* word-bigram collocations with integer-exact PMI
    ingredients: ``(w1, w2, n_pair, n_w1, n_w2, n_total)``.

    PMI itself is ``log(n_pair * n_total / (n_w1 * n_w2))`` — left to the
    caller because the *counts* are exactly reproducible (hash-oracle-
    checkable) while a float log is 1-ulp-fragile across engines.

    Shape: bigram and unigram exact counts via ``grouped_aggregate``
    (per-block pre-combined partials, one exchange each), global top-k of
    the bigram table (partial top-k per block — only ``k x n_blocks``
    rows move), then the two marginal lookups run as ``lookup_join``s
    whose semi-join prefilter broadcasts the 2k candidate words and
    filters the vocabulary table *before* the exchange. The vocabulary
    table is materialized once (vocab << corpus) because three consumers
    (total-count aggregate + two joins) would otherwise re-execute its
    lineage.
    """
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join
    from pypdfium2_ray.stages.topk import topk

    bigr = ds.map_batches(explode_bigrams, batch_format="pyarrow")
    bcnt = grouped_aggregate(bigr, ["token"], {"n_pair": (None, "count")},
                             num_partitions=num_partitions)
    top = topk(bcnt, ["n_pair", "token"], k, descending=[True, False])

    def split_pair(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["token"], " ", max_splits=1)
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "n_pair": pc.cast(t["n_pair"], pa.int64()),
        })

    top = top.map_batches(split_pair, batch_format="pyarrow")

    uni = ds.map_batches(explode_tokens, batch_format="pyarrow")
    ucnt = grouped_aggregate(uni, ["token"], {"n": (None, "count")},
                             num_partitions=num_partitions).materialize()
    n_total = int(ucnt.sum("n") or 0)

    j = lookup_join(top, {"w1": pa.string(), "w2": pa.string(),
                          "n_pair": pa.int64()},
                    ucnt, source_key="token", key_col="w1",
                    payload_cols={"n_w1": pa.int64()},
                    source_payload={"n_w1": "n"},
                    num_partitions=num_partitions,
                    prefilter_keys=1_000_000)
    j = lookup_join(j, {"w1": pa.string(), "w2": pa.string(),
                        "n_pair": pa.int64(), "n_w1": pa.int64()},
                    ucnt, source_key="token", key_col="w2",
                    payload_cols={"n_w2": pa.int64()},
                    source_payload={"n_w2": "n"},
                    num_partitions=num_partitions,
                    prefilter_keys=1_000_000)

    def add_total(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_total", pa.array(np.full(t.num_rows, n_total, np.int64)))

    return j.map_batches(add_total, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch tier (Cormode & Muthukrishnan, J. Algorithms 2005)

def count_min_sketch(make_ds, value_col: str, width: int = 1024,
                     depth: int = 4, num_partitions: int | None = None):
    """Distributed Count-Min sketch over a value stream: the mergeable
    point-query summary (est >= true always; est <= true + e*N/width
    w.p. 1 - (1/2)^depth) — the ALL-items companion of the Misra-Gries
    heavy-hitter pass above (MG answers "who is frequent", CM answers
    "how frequent is X" for ANY X without keeping the vocabulary).

    Scale shape: per block, counts collapse to DISTINCT values first
    (one md5 per distinct value, not per occurrence), the block's
    NONZERO cells ship as pre-combined ``(d, cell, cnt)`` rows, ONE hash
    exchange on (d, cell) sums them — cell counts are exact integer sums,
    so the sketch is bit-identical at any partitioning. Cell hash is the
    ``md5_number_upper`` twin (``md5_hash64(f"{d}:{value}")`` % width),
    which makes even the ESTIMATES oracle-expressible in SQL.

    Returns a Dataset of ``(d:int32, cell:int64, count:int64)`` nonzero
    cells (<= depth*width rows total — the bounded summary; collect it
    driver-side for point queries via :func:`cm_estimate`).
    """
    from pypdfium2_ray.functions.sketch import md5_hash64

    def partial(t: pa.Table) -> pa.Table:
        vc = t.select([value_col]).group_by([value_col]) \
            .aggregate([([], "count_all")])
        vals = vc[value_col].to_pylist()
        cnts = vc["count_all"].to_numpy()
        ds_, cells, counts = [], [], []
        for d in range(depth):
            for v, c in zip(vals, cnts):
                ds_.append(d)
                cells.append(md5_hash64(f"{d}:{v}".encode()) % width)
                counts.append(int(c))
        t2 = pa.table({"d": pa.array(ds_, pa.int32()),
                       "cell": pa.array(cells, pa.int64()),
                       "count": pa.array(counts, pa.int64())})
        # collapse same-cell collisions within the block
        g = t2.group_by(["d", "cell"]).aggregate([("count", "sum")])
        return g.rename_columns(["d", "cell", "count"])

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int32()),
                             "cell": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        g = t.group_by(["d", "cell"]).aggregate([("count", "sum")])
        return g.rename_columns(["d", "cell", "count"])

    ds = make_ds() if callable(make_ds) else make_ds
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, ["d", "cell"], combine,
                         num_partitions=num_partitions)


def cm_estimate(sketch: pa.Table, values, width: int = 1024,
                depth: int = 4) -> pa.Table:
    """Point-query estimates from a COLLECTED sketch table (the bounded
    <= depth*width-row summary): est(v) = min over d of cell count.
    Returns ``(value, est)``."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    lut = {(d, c): n for d, c, n in zip(sketch["d"].to_pylist(),
                                        sketch["cell"].to_pylist(),
                                        sketch["count"].to_pylist())}
    out_v, out_e = [], []
    for v in values:
        est = min(lut.get((d, md5_hash64(f"{d}:{v}".encode()) % width), 0)
                  for d in range(depth))
        out_v.append(v)
        out_e.append(int(est))
    return pa.table({"value": pa.array(out_v, pa.string()),
                     "est": pa.array(out_e, pa.int64())})


def cm_join_size(ds_a, key_a: str, ds_b, key_b: str, width: int = 2048,
                 depth: int = 4, num_partitions: int | None = None):
    """Equi-join cardinality estimation WITHOUT running the join: the
    Count-Min inner product (AGMS/CM classic) —
    ``est = min_d sum_cell cntA[d][cell] * cntB[d][cell]`` where each
    side's keys are counted into the same ``(d, cell)`` grid as
    :func:`count_min_sketch`. Hash collisions only ever ADD cross terms,
    so ``est >= |A JOIN B|`` always, and ``E[excess] <= N_A*N_B/width``
    per row — the planner-statistics primitive for sizing a shuffle
    before paying for it.

    Scale shape: each block collapses to distinct-key counts first, ships
    pre-combined ``(d, cell, cnt_a, cnt_b)`` rows (zero on the foreign
    side), ONE hash exchange on ``(d, cell)`` sums both sides and emits
    per-partition PARTIAL per-d inner products; the final combine is a
    single block (``depth x n_partitions`` rows). Nothing the size of
    either input ever moves — the whole estimate costs two streaming
    passes plus one bounded exchange.

    The cell hash is the ``md5_number_upper`` twin (``md5_hash64`` of
    ``f"{d}:{key}"``), so the ESTIMATE itself — including every collision
    over-count — is SQL-expressible exactly.

    Returns a one-row Dataset ``{est: int64}``.
    """
    from pypdfium2_ray.functions.sketch import md5_hash64

    def make_partial(key_col: str, a_side: bool):
        def partial(t: pa.Table) -> pa.Table:
            vc = t.select([key_col]).group_by([key_col]) \
                .aggregate([([], "count_all")])
            vals = vc[key_col].to_pylist()
            cnts = vc["count_all"].to_numpy()
            ds_, cells, counts = [], [], []
            for d in range(depth):
                for v, c in zip(vals, cnts):
                    ds_.append(d)
                    cells.append(md5_hash64(f"{d}:{v}".encode()) % width)
                    counts.append(int(c))
            zero = [0] * len(ds_)
            t2 = pa.table({"d": pa.array(ds_, pa.int32()),
                           "cell": pa.array(cells, pa.int64()),
                           "cnt_a": pa.array(counts if a_side else zero,
                                             pa.int64()),
                           "cnt_b": pa.array(zero if a_side else counts,
                                             pa.int64())})
            g = t2.group_by(["d", "cell"]).aggregate(
                [("cnt_a", "sum"), ("cnt_b", "sum")])
            return g.rename_columns(["d", "cell", "cnt_a", "cnt_b"])
        return partial

    pa_a = ds_a.map_batches(make_partial(key_a, True),
                            batch_format="pyarrow")
    pa_b = ds_b.map_batches(make_partial(key_b, False),
                            batch_format="pyarrow")

    def ip_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int32()),
                             "ip": pa.array([], pa.int64())})
        g = t.group_by(["d", "cell"]).aggregate(
            [("cnt_a", "sum"), ("cnt_b", "sum")])
        d = g["d"].to_numpy()
        prod = g["cnt_a_sum"].to_numpy() * g["cnt_b_sum"].to_numpy()
        # per-d partial sums within this partition, int64-exact
        # (np.bincount weights would round-trip through float64;
        # products are bounded by N_A*N_B << 2^63 per the docstring)
        out_d, inv = np.unique(d, return_inverse=True)
        acc = np.zeros(len(out_d), dtype=np.int64)
        np.add.at(acc, inv, prod)
        return pa.table({"d": pa.array(out_d.astype("int32"), pa.int32()),
                         "ip": pa.array(acc, pa.int64())})

    partials = partition_map(pa_a.union(pa_b), ["d", "cell"], ip_partial,
                             num_partitions=num_partitions)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"est": pa.array([0], pa.int64())})
        g = t.group_by(["d"]).aggregate([("ip", "sum")])
        est = min(g["ip_sum"].to_pylist())
        return pa.table({"est": pa.array([int(est)], pa.int64())})

    return partials.repartition(1).map_batches(
        final, batch_size=None, batch_format="pyarrow")


def exact_join_size(ds_a, key_a: str, ds_b, key_b: str,
                    num_partitions: int | None = None):
    """EXACT equi-join cardinality without materializing the join:
    ``sum_k cntA[k] * cntB[k]``. Per-block pre-combined per-key counts on
    each side (two streaming passes), ONE hash exchange on the key, a
    vectorized per-partition sum-then-product, and a single-block total —
    the ground truth :func:`cm_join_size` is checked against, at one
    key-width exchange instead of the join's full-payload one.

    Returns a one-row Dataset ``{exact: int64}``.
    """

    def make_partial(key_col: str, a_side: bool):
        def partial(t: pa.Table) -> pa.Table:
            vc = t.select([key_col]).group_by([key_col]) \
                .aggregate([([], "count_all")])
            n = vc.num_rows
            zero = pa.array([0] * n, pa.int64())
            cnt = vc["count_all"].cast(pa.int64())
            return pa.table({"k": vc[key_col].cast(pa.int64()),
                             "cnt_a": cnt if a_side else zero,
                             "cnt_b": zero if a_side else cnt})
        return partial

    pa_a = ds_a.map_batches(make_partial(key_a, True),
                            batch_format="pyarrow")
    pa_b = ds_b.map_batches(make_partial(key_b, False),
                            batch_format="pyarrow")

    def prod_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s": pa.array([0], pa.int64())})
        g = t.group_by(["k"]).aggregate(
            [("cnt_a", "sum"), ("cnt_b", "sum")])
        prod = g["cnt_a_sum"].to_numpy() * g["cnt_b_sum"].to_numpy()
        return pa.table({"s": pa.array([int(prod.sum())], pa.int64())})

    partials = partition_map(pa_a.union(pa_b), ["k"], prod_partial,
                             num_partitions=num_partitions)

    def final(t: pa.Table) -> pa.Table:
        tot = int(pc.sum(t["s"]).as_py() or 0)
        return pa.table({"exact": pa.array([tot], pa.int64())})

    return partials.repartition(1).map_batches(
        final, batch_size=None, batch_format="pyarrow")


def key_skew(ds, key_col: str, num_partitions: int | None = None):
    """Shuffle-planner skew report: the log2 histogram of per-key row
    counts — "how hot is the hottest key, how many keys live in each
    size decade" — the statistic that decides whether a groupby needs
    salting BEFORE paying for the shuffle (companion to
    :func:`cm_join_size` in the planner-stats family).

    Per-key counts are ONE pre-combined exchange (the same cost as the
    groupby being planned MINUS its payload — keys + int64 only);
    bucketing ``floor(log2(cnt))`` collapses that to <= 64 rows per
    block, so the final rollup is a no-exchange single-block combine.
    ``log2`` is exact-safe here: the bucket of an integer count only
    changes at exact powers of two, where IEEE log2 is exact, and the
    nearest representable neighbors are >> one ulp away — both engines
    floor identically.

    Returns ``{bucket, n_keys, n_rows, max_cnt}`` — bucket b covers
    counts in [2^b, 2^(b+1)).
    """
    from pypdfium2_ray.stages.agg import grouped_aggregate

    per_key = grouped_aggregate(ds, [key_col], {"cnt": (None, "count")},
                                num_partitions=num_partitions)

    def bucketize(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy()
        b = np.floor(np.log2(cnt)).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n_keys_": pa.array(np.ones(len(b), np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    rows = per_key.map_batches(bucketize, batch_format="pyarrow")
    return grouped_aggregate(rows, ["bucket"],
                             {"n_keys": ("n_keys_", "sum"),
                              "n_rows": ("cnt", "sum"),
                              "max_cnt": ("cnt", "max")},
                             combine="single_block")
