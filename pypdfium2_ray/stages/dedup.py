"""Exact url-level dedup at ingest — the one mandatory shuffle of the
flagship pipeline (SURVEY §2.7 SET-new, §7.3).

No reference analogue (the closest is font dedup by address,
``cli/fonts.py:66-72``); at crawl scale the same url appears in many WARC
snapshots and must be collapsed to one row before the expensive parse.

Implementation: per-block partial dedup (combiner), then ONE hash exchange
on ``url`` (``exchange.partition_map``) with a vectorized per-partition
keep-one kernel — no per-group Python calls even at billions of urls.
"""

from __future__ import annotations

import pandas as pd

from pypdfium2_ray.stages.exchange import partition_map


def _keep_one_kernel(key_cols: list[str], ts_col: str, last: bool):
    """Vectorized keep-one-per-key over a whole Arrow block: kept row
    indices are computed on the (small) key/ts columns only, then gathered
    with a zero-copy Arrow ``take`` — large payload columns (html) never
    convert to pandas."""
    import pyarrow as _pa

    import numpy as _np

    def kernel(t):
        keys = t.select(key_cols + [ts_col]).to_pandas()
        keys = keys.sort_values(ts_col, kind="mergesort")
        kept = keys.drop_duplicates(key_cols, keep="last" if last else "first")
        return t.take(_pa.array(_np.sort(kept.index.to_numpy())))

    return kernel


def dedup_by_url(ds, keep: str = "latest", pre_combine: bool = True,
                 num_partitions: int | None = None):
    """One row per ``url``; ``keep`` in {"latest", "earliest"} by ``warc_ts``.

    ``pre_combine``: keep-one-per-url is associative, so a per-block partial
    dedup BEFORE the hash shuffle drops every within-block duplicate from the
    exchange — at crawl scale (many snapshots of the same url per ingest
    partition) this shrinks the one mandatory shuffle by the local dup
    factor. Ties on ``warc_ts`` are broken arbitrarily (same-url same-ts
    snapshots are pathological input).
    """
    last = keep == "latest"
    kernel = _keep_one_kernel(["url"], "warc_ts", last)
    if pre_combine:
        ds = ds.map_batches(kernel, batch_format="pyarrow")
    return partition_map(ds, ["url"], kernel, num_partitions=num_partitions)


# ===========================================================================
# corpus-level dedup family (training-data curation ops; no reference
# analogue — pypdfium2 is single-document. SURVEY §2.7 SET-new, widened.)

import numpy as np
import pyarrow as pa

from pypdfium2_ray.functions.sketch import (
    band_keys, char_shingles, minhash_signature, popcount64,
    simhash64, simhash_band_keys, word_ngrams,
)
from pypdfium2_ray.stages.exchange import lookup_join


def _run_starts(*key_arrays: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of equal-key runs over pre-sorted parallel arrays —
    the vectorized group detector used by the per-partition pair kernels."""
    n = len(key_arrays[0])
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for a in key_arrays:
        new[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(new)
    lengths = np.diff(np.append(starts, n))
    return starts, lengths


def _bucket_pairs_partition(df: pd.DataFrame, id_col: str, max_bucket: int,
                            with_hamming: bool = False,
                            max_dist: int | None = None):
    """All unordered id pairs within each LSH bucket of ONE hash partition.

    The partition arrives with complete buckets (hash exchange on
    (band, band_key)) but unsorted; it is sorted once (vectorized), runs
    are detected vectorized, and only buckets with >= 2 members (the rare,
    real candidate work) are looped — each loop iteration is itself a
    vectorized ``triu_indices`` pair expansion. Oversized buckets are
    truncated at ``max_bucket`` to bound quadratic blowup on degenerate
    data. With ``with_hamming`` the rows must carry ``simhash_hi/lo``;
    per-pair Hamming distance is computed (vectorized popcount) and
    filtered at ``max_dist`` in place.
    """
    df = df.sort_values(["band", "band_key", id_col], kind="mergesort")
    band = df["band"].to_numpy()
    key = df["band_key"].to_numpy()
    ids = df[id_col].to_numpy().astype(np.int64)
    # drop duplicate ids within a bucket (adjacent after the sort): a
    # corpus carrying the same id twice would otherwise pair it with
    # itself and emit degenerate (id, id) rows
    if len(ids) > 1:
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ~((band[1:] == band[:-1]) & (key[1:] == key[:-1])
                     & (ids[1:] == ids[:-1]))
        if not keep.all():
            band, key, ids = band[keep], key[keep], ids[keep]
            df = df.iloc[np.flatnonzero(keep)]
    hashes = None
    if with_hamming:
        hashes = ((df["simhash_hi"].to_numpy().astype(np.uint64) << np.uint64(1))
                  | df["simhash_lo"].to_numpy().astype(np.uint64))
    starts, lengths = _run_starts(band, key)
    # NO SILENT CAPS: a bucket beyond max_bucket loses the pairs involving
    # its dropped members — make every cap hit observable in worker logs
    # (rolled up by the driver's log dedup) with enough data to re-size.
    n_trunc = int((lengths > max_bucket).sum())
    if n_trunc:
        import logging
        logging.getLogger(__name__).warning(
            "bucket-pairs truncation: %d bucket(s) exceed max_bucket=%d "
            "(largest=%d); pairs involving dropped members are LOST — "
            "raise max_bucket or re-band", n_trunc, max_bucket,
            int(lengths.max()))
    out_a, out_b, out_d = [], [], []
    for r in np.flatnonzero(lengths >= 2):
        s = starts[r]
        m = int(min(lengths[r], max_bucket))
        sub = ids[s:s + m]
        ii, jj = np.triu_indices(m, k=1)
        a, b = sub[ii], sub[jj]
        if hashes is not None:
            d = popcount64(hashes[s + ii] ^ hashes[s + jj])
            keep = d <= max_dist
            a, b, d = a[keep], b[keep], d[keep]
            out_d.append(d)
        out_a.append(a)
        out_b.append(b)
    cat = (lambda xs: np.concatenate(xs) if xs else np.zeros(0, np.int64))
    cols = {"id_a": cat(out_a), "id_b": cat(out_b)}
    if hashes is not None:
        cols["hamming"] = cat(out_d)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def distinct_rows(ds, keys: list[str], num_partitions: int | None = None):
    """Exactly-one-row-per-key via hash exchange + vectorized per-partition
    ``drop_duplicates`` — the pair-dedup step of every LSH family (a pair
    found in multiple bands appears once), with zero per-group Python."""
    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(keys),
                                    preserve_index=False, schema=t.schema)

    return partition_map(ds, keys, kernel, num_partitions=num_partitions)


class _MinhashBands:
    """Actor: text -> shingles -> minhash signature -> LSH band rows.
    Permutation params are built once per actor (seeded — identical
    everywhere), the warm-state pattern of SURVEY §2.3 ST1."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int,
                 shingle_k: int, seed: int, shingle_kind: str = "char"):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_k = shingle_k
        self.seed = seed
        self.shingle_fn = char_shingles if shingle_kind == "char" else word_ngrams
        # prime the (cached) permutation table once per actor
        minhash_signature(set([b"warmup"]), num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(self.shingle_fn(t or "", self.shingle_k),
                                    self.num_perm, self.seed)
            for b, k in enumerate(band_keys(sig, self.bands)):
                out_id.append(i)
                out_band.append(b)
                # store as int64 (hash64 >> 1 keeps it non-negative-safe)
                out_key.append(k >> 1)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "band_key": pa.array(out_key, pa.int64())})


class _VerifyJaccardJoined:
    """Batch fn: rows already carry BOTH texts (from the repartition join);
    compute exact shingle Jaccard per pair. Shingle sets are memoized per
    worker (bounded) — candidate ids repeat across pairs within a
    partition. No corpus broadcast, no driver materialization."""

    _MAX_CACHE = 4096

    def __init__(self, threshold: float, shingle_k: int,
                 shingle_kind: str = "char"):
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.shingle_fn = char_shingles if shingle_kind == "char" else word_ngrams
        self._cache: dict[int, set] = {}

    def _shingles(self, i: int, text: str | None) -> set:
        s = self._cache.get(i)
        if s is None:
            s = self.shingle_fn(text or "", self.shingle_k)
            if len(self._cache) >= self._MAX_CACHE:
                self._cache.clear()
            self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_pylist()
        ib = batch["id_b"].to_pylist()
        ta = batch["__text_a"].to_pylist()
        tb = batch["__text_b"].to_pylist()
        rows = {"id_a": [], "id_b": [], "n_inter": [], "n_union": []}
        for a, b, xa, xb in zip(ia, ib, ta, tb):
            sa, sb = self._shingles(a, xa), self._shingles(b, xb)
            inter = len(sa & sb)
            union = len(sa | sb)
            # float-division compare: BOTH the engine and the SQL oracle
            # divide the same two int64s in IEEE double, so the comparison
            # is bit-identical across the two (0/0 counts as a dup, matching
            # jaccard()'s empty-empty convention)
            if union == 0 or inter / union >= self.threshold:
                rows["id_a"].append(a)
                rows["id_b"].append(b)
                rows["n_inter"].append(inter)
                rows["n_union"].append(union)
        return pa.table({
            "id_a": pa.array(rows["id_a"], pa.int64()),
            "id_b": pa.array(rows["id_b"], pa.int64()),
            "n_inter": pa.array(rows["n_inter"], pa.int64()),
            "n_union": pa.array(rows["n_union"], pa.int64()),
        })


def minhash_dup_pairs(ds, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 5,
                      shingle_kind: str = "char", threshold: float = 0.7,
                      seed: int = 1, max_bucket: int = 500,
                      num_partitions: int | None = None,
                      concurrency=None, **mb_kwargs):
    """MinHash+LSH near-duplicate pairs over a text column.

    shingle -> minhash -> band rows (ids only — no text ever enters the
    band exchange) -> hash-partitioned vectorized bucket pairing ->
    pair-distinct -> repartition JOIN back to ``(id, text)`` -> exact
    shingle-Jaccard verify. Returns ``(id_a, id_b, n_inter, n_union)``
    (exact integers — oracle-robust) with ``id_a < id_b`` and
    ``n_inter/n_union >= threshold``.

    Scale: the only full-corpus exchanges are the band-row shuffle (ids +
    two small ints per band) and the two text joins, each restricted to an
    inner join against the (tiny) candidate-pair set. No broadcast of the
    corpus, no driver-side materialization.
    """
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.warm import warm_task
    kw = dict(id_col=id_col, text_col=text_col, num_perm=num_perm,
              bands=bands, shingle_k=shingle_k, seed=seed,
              shingle_kind=shingle_kind)
    if concurrency is not None:
        band_rows = ds.map_batches(_MinhashBands, fn_constructor_kwargs=kw,
                                   batch_format="pyarrow",
                                   concurrency=concurrency, **mb_kwargs)
    else:
        band_rows = ds.map_batches(warm_task(_MinhashBands, **kw),
                                   batch_format="pyarrow", **mb_kwargs)

    candidates = partition_map(
        band_rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "doc_id", max_bucket),
        num_partitions=num_partitions)

    # pair-distinct is FUSED into the first join's exchange (equal pairs
    # share id_a, so they co-partition) — one exchange saved. The
    # candidate set is tiny vs the corpus, so both joins run a semi-join
    # prefilter: candidate ids broadcast once, corpus blocks filtered
    # BEFORE the exchange — only candidate texts ever shuffle.
    pair_cols = {"id_a": pa.int64(), "id_b": pa.int64()}
    j = lookup_join(candidates, pair_cols, ds, source_key=id_col,
                    key_col="id_a",
                    payload_cols={"__text_a": pa.string()},
                    source_payload={"__text_a": text_col},
                    distinct_target_on=["id_a", "id_b"],
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    j = lookup_join(j, {**pair_cols, "__text_a": pa.string()}, ds,
                    source_key=id_col, key_col="id_b",
                    payload_cols={"__text_b": pa.string()},
                    source_payload={"__text_b": text_col},
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)

    verified = j.map_batches(
        warm_task(_VerifyJaccardJoined, threshold=threshold,
                  shingle_k=shingle_k, shingle_kind=shingle_kind),
        batch_format="pyarrow")
    return verified


class _SimhashBands:
    """Actor: text -> 64-bit simhash -> pigeonhole band rows (hash carried
    on every row so pair verification needs no further lookup)."""

    def __init__(self, id_col: str, text_col: str, ngram_n: int, bands: int):
        self.id_col = id_col
        self.text_col = text_col
        self.ngram_n = ngram_n
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_key, out_hi, out_lo = [], [], [], [], []
        for i, t in zip(ids, texts):
            h = simhash64(word_ngrams(t or "", self.ngram_n))
            for b, k in enumerate(simhash_band_keys(h, self.bands)):
                out_id.append(i)
                out_band.append(b)
                out_key.append(k)
                out_hi.append(h >> 1)   # int64-safe; low bit kept separately
                out_lo.append(h & 1)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "band_key": pa.array(out_key, pa.int64()),
                         "simhash_hi": pa.array(out_hi, pa.int64()),
                         "simhash_lo": pa.array(out_lo, pa.int64())})


def simhash_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      ngram_n: int = 3, bands: int = 4, max_dist: int = 3,
                      max_bucket: int = 500, num_partitions: int | None = None,
                      concurrency=None, **mb_kwargs):
    """SimHash near-duplicate pairs: 64-bit fingerprint, pigeonhole banding
    (dist <= bands-1 guaranteed to share a band => with the default
    ``max_dist <= bands - 1`` recall is EXACT by construction, which is what
    lets the all-pairs SQL fingerprint oracle check this query), exact
    Hamming verify inside buckets (vectorized popcount). Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.warm import warm_task
    kw = dict(id_col=id_col, text_col=text_col, ngram_n=ngram_n, bands=bands)
    if concurrency is not None:
        band_rows = ds.map_batches(_SimhashBands, fn_constructor_kwargs=kw,
                                   batch_format="pyarrow",
                                   concurrency=concurrency, **mb_kwargs)
    else:
        band_rows = ds.map_batches(warm_task(_SimhashBands, **kw),
                                   batch_format="pyarrow", **mb_kwargs)

    pairs = partition_map(
        band_rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "doc_id", max_bucket,
                                          with_hamming=True,
                                          max_dist=max_dist),
        num_partitions=num_partitions)
    return distinct_rows(pairs, ["id_a", "id_b"],
                         num_partitions=num_partitions)


# ===========================================================================
# duplicate-span removal (corpus-level exact span dedup)

def _tokenize_flat(texts: pa.ChunkedArray | pa.Array):
    """Whitespace-tokenize a string column vectorized: returns
    ``(flat_tokens, tokens_per_row)`` with empty tokens (leading/trailing
    whitespace artifacts of split) removed — matching DuckDB's
    ``regexp_extract_all(text, '[^ \\t\\r\\n\\f\\v]+')``."""
    import pyarrow.compute as pc
    lists = pc.split_pattern_regex(texts, pattern="[ \t\r\n\f\v]+")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
             .astype(np.int64)
    flat = pc.list_flatten(lists).combine_chunks()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if len(lens):
        row_of = np.repeat(np.arange(len(lens)), lens)
        dropped = np.bincount(row_of[~keep_np], minlength=len(lens))
        lens = lens - dropped
    return flat.filter(keep), lens


def _chunk_offsets(tok_counts: np.ndarray, k: int) -> np.ndarray:
    """List offsets (int64) chunking each row's tokens into consecutive
    windows of *k* (last window ragged). Chunks are contiguous within and
    across rows, so one offsets vector describes them all."""
    n_chunks = (tok_counts + k - 1) // k
    total_chunks = int(n_chunks.sum())
    row_tok_start = np.cumsum(tok_counts) - tok_counts
    intra = np.arange(total_chunks) \
        - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    starts = np.repeat(row_tok_start, n_chunks) + k * intra
    return np.append(starts, int(tok_counts.sum())), n_chunks


def _explode_spans(id_col: str, text_col: str, k: int):
    """Per-batch vectorized explode: doc text -> one row per consecutive
    k-token span ``(doc_id, span_idx, span)``. Token split, chunk
    grouping and the space-join are all Arrow kernels (split_pattern_regex
    / ListArray offsets / binary_join) — no per-row Python."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        flat, lens = _tokenize_flat(t[text_col])
        offsets, n_chunks = _chunk_offsets(lens, k)
        spans = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat),
            " ")
        ids = t[id_col].to_numpy(zero_copy_only=False)
        intra = np.arange(len(spans)) \
            - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        return pa.table({
            "doc_id": np.repeat(ids, n_chunks),
            "span_idx": intra.astype(np.int64),
            "span": spans,
        })

    return f


def _span_keep_first(t: pa.Table) -> pa.Table:
    """Keep the globally-first ``(doc_id, span_idx)`` occurrence of each
    span value. Used both as the per-block pre-combiner (shrinks hot
    boilerplate keys to <=1 row per block before the exchange) and as the
    per-partition finalizer (spans co-partition on their value)."""
    df = t.select(["doc_id", "span_idx"]).to_pandas()
    df["__span"] = t["span"].to_pandas()
    df = df.sort_values(["__span", "doc_id", "span_idx"], kind="mergesort")
    kept = df.drop_duplicates("__span", keep="first")
    return t.take(pa.array(np.sort(kept.index.to_numpy())))


def _reassemble_spans(t: pa.Table) -> pa.Table:
    """Per-partition doc reassembly: sort kept spans by (doc_id,
    span_idx), group into per-doc lists via run offsets, one vectorized
    ``binary_join``. Docs whose every span was removed produce no row
    (matching the SQL GROUP BY)."""
    import pyarrow.compute as pc
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    idx = t["span_idx"].to_numpy(zero_copy_only=False)
    order = np.lexsort((idx, ids))
    ids = ids[order]
    spans = t["span"].take(pa.array(order)).combine_chunks()
    starts, lengths = _run_starts(ids)
    offsets = np.append(starts, len(ids))
    text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), spans), " ")
    return pa.table({"doc_id": ids[starts], "text": text,
                     "n_spans": lengths.astype(np.int64)})


def span_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               span_tokens: int = 10, num_partitions: int | None = None):
    """Corpus-level duplicate-span removal: split every doc into
    consecutive *span_tokens*-token windows, drop every occurrence of a
    span except the globally first (ordered by ``(doc_id, span_idx)``),
    and reassemble each doc from its surviving spans (space-joined, i.e.
    whitespace-normalized). Returns ``(doc_id, text, n_spans)``; docs
    with no tokens (or no surviving spans) emit no row.

    This is the distributable fixed-window approximation of exact
    substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22 — public paper — uses suffix arrays;
    a fixed window trades boundary alignment for a pure two-exchange
    shuffle shape). Scale: the span exchange carries (span text, id,
    idx); hot boilerplate spans are pre-combined per block so no key
    exceeds one row per input block; the doc exchange is skew-free.
    """
    lines = ds.map_batches(_explode_spans(id_col, text_col, span_tokens),
                           batch_format="pyarrow")
    pre = lines.map_batches(_span_keep_first, batch_format="pyarrow")
    kept = partition_map(pre, ["span"], _span_keep_first,
                         num_partitions=num_partitions)
    return partition_map(kept, ["doc_id"], _reassemble_spans,
                         num_partitions=num_partitions)


def prefix_dup_owner(ds, id_col: str = "doc_id", text_col: str = "text",
                     prefix_len: int = 20, sentinel: int = -1,
                     num_partitions: int | None = None):
    """``(doc_id, dup_of)`` — canonical-owner ASSIGNMENT for every row
    (the left-outer complement of the dedup family, which only emits
    pairs or survivors): docs sharing a ``prefix_len``-char key prefix
    form a cluster, ``dup_of`` is the cluster's min doc id when the
    cluster has >= 2 members and ``sentinel`` otherwise (never null —
    the driver gate cannot sort mixed-null columns; the SQL twin wraps
    the same rule in COALESCE/CASE).

    The prefix key is the template/title fingerprint tier: boilerplate
    templates, mirrored headlines and republished articles share their
    opening characters long before full-text hashes agree. ONE hash
    exchange on the key, then a whole-partition pandas
    ``groupby.transform`` (min + size, both Cython) — owner lookup and
    assignment fused into the group kernel, no separate join."""
    import pandas as pd

    import pyarrow.compute as pc

    from pypdfium2_ray.stages.exchange import partition_map

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.fill_null(t[text_col], ""), 0, prefix_len)
        return pa.table({"doc_id": pc.cast(t[id_col], pa.int64()),
                         "__key": key})

    keys_ds = ds.select_columns([id_col, text_col]).map_batches(
        keyed, batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("__key", sort=False)["doc_id"]
        owner = g.transform("min").to_numpy()
        size = g.transform("size").to_numpy()
        dup_of = np.where(size > 1, owner, sentinel)
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(),
                                            pa.int64()),
                         "dup_of": pa.array(dup_of, pa.int64())})

    return partition_map(keys_ds, ["__key"], kernel,
                         num_partitions=num_partitions)
