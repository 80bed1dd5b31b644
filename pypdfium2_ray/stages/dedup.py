"""Exact url-level dedup at ingest — the one mandatory shuffle of the
flagship pipeline (SURVEY §2.7 SET-new, §7.3).

No reference analogue (the closest is font dedup by address,
``cli/fonts.py:66-72``); at crawl scale the same url appears in many WARC
snapshots and must be collapsed to one row before the expensive parse.

Implementation: hash-partition on ``url`` via ``groupby("url")`` and keep one
row per group by ``warc_ts`` (default: latest snapshot wins). The group fn is
vectorized pandas (idxmax/idxmin), not a Python row loop.
"""

from __future__ import annotations

import pandas as pd


def _keep_latest(g: pd.DataFrame) -> pd.DataFrame:
    return g.loc[[g["warc_ts"].idxmax()]]


def _keep_earliest(g: pd.DataFrame) -> pd.DataFrame:
    return g.loc[[g["warc_ts"].idxmin()]]


def dedup_by_url(ds, keep: str = "latest", pre_combine: bool = True):
    """One row per ``url``; ``keep`` in {"latest", "earliest"} by ``warc_ts``.

    ``pre_combine``: keep-one-per-url is associative, so a per-block partial
    dedup BEFORE the hash shuffle drops every within-block duplicate from the
    exchange — at crawl scale (many snapshots of the same url per ingest
    partition) this shrinks the one mandatory shuffle by the local dup
    factor. Ties on ``warc_ts`` are broken arbitrarily (same-url same-ts
    snapshots are pathological input).
    """
    fn = _keep_latest if keep == "latest" else _keep_earliest
    if pre_combine:
        last = keep == "latest"

        def partial(t):
            # compute kept row indices on the two key columns only, then
            # take() — the (large binary) html column never converts to
            # pandas, just a zero-copy Arrow gather
            import pyarrow as _pa
            keys = t.select(["url", "warc_ts"]).to_pandas()
            keys = keys.sort_values("warc_ts", kind="mergesort")
            kept = keys.drop_duplicates("url", keep="last" if last else "first")
            return t.take(_pa.array(sorted(kept.index)))

        ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("url").map_groups(fn, batch_format="pandas")


# ===========================================================================
# corpus-level dedup family (training-data curation ops; no reference
# analogue — pypdfium2 is single-document. SURVEY §2.7 SET-new, widened.)

import numpy as np
import pyarrow as pa

from pypdfium2_ray.functions.sketch import (
    band_keys, char_shingles, hamming64, jaccard, minhash_signature,
    simhash64, simhash_band_keys, word_ngrams,
)


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                         "id_b": pd.Series([], dtype="int64")})


def _bucket_pairs(g: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """All unordered id pairs within one LSH bucket (ids sorted so a < b).
    Oversized buckets are truncated (logged via a flag column upstream is
    overkill here; the cap bounds quadratic blowup on degenerate data)."""
    ids = np.sort(g["doc_id"].unique().astype(np.int64))[:max_bucket]
    if len(ids) < 2:
        return _empty_pairs()
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


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


class _VerifyJaccard:
    """Actor: verify candidate pairs with exact shingle Jaccard against a
    broadcast id->text map. Broadcast is the small-side pattern; at corpus
    sizes beyond worker heap, repartition-join texts onto pairs instead."""

    def __init__(self, texts_ref, threshold: float, shingle_k: int,
                 shingle_kind: str = "char"):
        import ray
        t = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.shingle_fn = char_shingles if shingle_kind == "char" else word_ngrams
        ids = t.column(0).to_pylist()
        texts = t.column(1).to_pylist()
        self.texts = dict(zip(ids, texts))
        self._cache: dict[int, set] = {}

    def _shingles(self, i: int) -> set:
        s = self._cache.get(i)
        if s is None:
            s = self.shingle_fn(self.texts.get(i) or "", self.shingle_k)
            self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_pylist()
        ib = batch["id_b"].to_pylist()
        sims = [jaccard(self._shingles(a), self._shingles(b)) for a, b in zip(ia, ib)]
        t = pa.table({"id_a": pa.array(ia, pa.int64()),
                      "id_b": pa.array(ib, pa.int64()),
                      "jaccard_sim": pa.array([round(s, 6) for s in sims], pa.float64())})
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["jaccard_sim"], self.threshold))


def minhash_dup_pairs(ds, texts: "pa.Table", id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 5,
                      shingle_kind: str = "char", threshold: float = 0.7,
                      seed: int = 1, max_bucket: int = 500,
                      concurrency=None, **mb_kwargs):
    """MinHash+LSH near-duplicate pairs over a text column.

    shingle -> minhash -> band bucket ``groupby`` -> candidate pairs ->
    pair-dedup -> exact-Jaccard verify (broadcast texts). Returns
    ``(id_a, id_b, jaccard_sim)`` with ``id_a < id_b``, jaccard >= threshold.
    """
    import ray
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

    candidates = band_rows.groupby(["band", "band_key"]).map_groups(
        lambda g: _bucket_pairs(g, max_bucket), batch_format="pandas")

    # verify BEFORE the pair-distinct groupby: verification is idempotent
    # and filters hard, so the dedup exchange runs on the (small) surviving
    # set instead of every band-duplicated candidate; the per-worker shingle
    # cache absorbs the repeated jaccard computations
    ref = ray.put(texts.select([id_col, text_col]))
    verified = candidates.map_batches(
        warm_task(_VerifyJaccard, texts_ref=ref, threshold=threshold,
                  shingle_k=shingle_k, shingle_kind=shingle_kind),
        batch_format="pyarrow")
    return verified.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


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
                      max_bucket: int = 500, concurrency=None, **mb_kwargs):
    """SimHash near-duplicate pairs: 64-bit fingerprint, pigeonhole banding
    (dist <= bands-1 guaranteed to share a band), exact Hamming verify inside
    buckets. Returns (id_a, id_b, hamming) with id_a < id_b."""
    from pypdfium2_ray.stages.warm import warm_task
    kw = dict(id_col=id_col, text_col=text_col, ngram_n=ngram_n, bands=bands)
    if concurrency is not None:
        band_rows = ds.map_batches(_SimhashBands, fn_constructor_kwargs=kw,
                                   batch_format="pyarrow",
                                   concurrency=concurrency, **mb_kwargs)
    else:
        band_rows = ds.map_batches(warm_task(_SimhashBands, **kw),
                                   batch_format="pyarrow", **mb_kwargs)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id").head(max_bucket)
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ids = g["doc_id"].to_numpy().astype(np.int64)
        hashes = [(int(hi) << 1) | int(lo) for hi, lo in
                  zip(g["simhash_hi"], g["simhash_lo"])]
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = hamming64(hashes[x], hashes[y])
                if d <= max_dist:
                    rows.append((ids[x], ids[y], d))
        if not rows:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        a, b, d = zip(*rows)
        return pd.DataFrame({"id_a": list(a), "id_b": list(b), "hamming": list(d)})

    pairs = band_rows.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
