"""Product-quantization (PQ) ANN tier — the memory-scale path for
similarity search over corpora whose raw embeddings don't fit the cluster
(Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public method).

Shape:

- :func:`train_pq` — per-subspace Lloyd iterations on a driver-side SAMPLE
  (the same contract as ``ann.train_centroids``: seeded, pure numpy,
  deterministic; feed it ``ds.random_sample(...).take_batch(n)``).
- :func:`pq_encode` — distributed encode: each (normalized) vector becomes
  ``m`` uint8 codes (one per subspace). dim-64 float64 compresses 64x;
  at 10^12 vectors the CODE table is what a cluster can hold and scan.
- :func:`pq_topk` — asymmetric-distance (ADC) top-k: per-query lookup
  tables of subspace dot products, built once per block actor in
  FIXED-POINT micro-units (int64), so every row's score is an exact
  integer sum of ``m`` table entries — bit-identical at any partitioning,
  block size or cluster shape. Per-block vectorized gather+sum and
  partial top-k; the global combine reuses ``ann._finalize_topk``'s ONE
  ids-only exchange.

Exactness regime (tested in tests/test_pq.py): when the codebooks contain
every distinct subvector of the corpus, encoding is lossless and
``pq_topk`` provably equals brute-force cosine top-k. With trained
codebooks PQ is approximate by construction — recall is config-validated
in tests, not SQL-provable, so the driver query is a rows-only check
(same class as ``kmeans_assign``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pypdfium2_ray.stages.ann import (
    _finalize_topk, _normalize, stack_embeddings)

#: fixed-point units for ADC table entries (micro-units keep |sim| <= 1
#: sums well inside int64 at any m)
ADC_SCALE = 1_000_000


def train_pq(train: pa.Table, m: int = 8, k: int = 256, n_iter: int = 10,
             seed: int = 11, vec_col: str = "embedding") -> np.ndarray:
    """Codebooks ``(m, k, dim/m)``: plain-L2 Lloyd per subspace over the
    NORMALIZED training vectors (normalization matches the cosine scoring
    downstream). Deterministic: seeded init, fixed iteration count, empty
    clusters keep their previous centroid."""
    X = _normalize(stack_embeddings(train[vec_col]))
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(k, n)
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(n_iter):
            # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
            scores = Xs @ C.T - 0.5 * (C * C).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return books


def _encode_block(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 nearest-centroid codes."""
    m, k, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = books[s]
        scores = Xs @ C.T - 0.5 * (C * C).sum(axis=1)
        codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


class _PqEncode:
    """Per-block encoder (codebooks broadcast once per actor/process)."""

    def __init__(self, books_ref, id_col: str, vec_col: str):
        import ray
        self.books = (ray.get(books_ref)
                      if isinstance(books_ref, ray.ObjectRef) else books_ref)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(stack_embeddings(batch[self.vec_col]))
        codes = _encode_block(X, self.books)
        m = codes.shape[1]
        flat = pa.array(codes.reshape(-1), pa.uint8())
        return pa.table({
            self.id_col: batch[self.id_col].cast(pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(flat, m),
        })


def pq_encode(ds, books, id_col: str = "vec_id",
              vec_col: str = "embedding", **mb_kwargs):
    """Distributed encode: ``(id, embedding)`` -> ``(id, codes)`` (uint8
    FixedSizeList of length m). One streaming pass, codebooks shipped
    through the object store once."""
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    ref = ray.put(np.ascontiguousarray(books))
    return ds.map_batches(
        warm_task(_PqEncode, books_ref=ref, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", **mb_kwargs)


class _PqPartialTopK:
    """Per-block ADC partial top-k over a PQ-coded corpus."""

    def __init__(self, luts_ref, qids_ref, k: int, id_col: str,
                 exclude_self: bool):
        import ray
        self.luts = (ray.get(luts_ref)
                     if isinstance(luts_ref, ray.ObjectRef) else luts_ref)
        self.qids = (ray.get(qids_ref)
                     if isinstance(qids_ref, ray.ObjectRef) else qids_ref)
        self.k = k
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        la = batch["codes"].combine_chunks()
        m = la.type.list_size
        codes = la.values.to_numpy(zero_copy_only=False) \
            .reshape(-1, m).astype(np.int64)
        n = len(ids)
        out_q, out_id, out_sim = [], [], []
        sub_idx = np.arange(m)
        for j, qid in enumerate(self.qids):
            lut = self.luts[j]                       # (m, k) int64
            sims = lut[sub_idx, codes].sum(axis=1)   # exact int64 per row
            # mask = min+1: -(int64.min) OVERFLOWS BACK to int64.min, so a
            # min-masked row would win the argpartition below; min+1
            # negates cleanly to int64.max and sorts last as intended
            mask_val = np.iinfo(np.int64).min + 1
            if self.exclude_self:
                sims = np.where(ids == qid, mask_val, sims)
            kk = min(self.k, n)
            # integer ADC scores tie often — the block's candidate pick
            # must honor the GLOBAL tie-break (sim desc, id asc) or the
            # finalize sees the wrong k rows: keep every boundary tie,
            # then tie-stable sort and cut
            if kk < n:
                part = np.argpartition(-sims, kk - 1)
                boundary = sims[part[kk - 1]]
                cand = np.flatnonzero(sims >= boundary)
            else:
                cand = np.arange(n)
            cand = cand[np.lexsort((ids[cand], -sims[cand]))][:kk]
            keep = cand[sims[cand] != mask_val]
            out_q.append(np.full(len(keep), qid, dtype=np.int64))
            out_id.append(ids[keep].astype(np.int64))
            out_sim.append(sims[keep])
        empty = np.array([], np.int64)
        return pa.table({
            "query_id": np.concatenate(out_q) if out_q else empty,
            "neighbor_id": np.concatenate(out_id) if out_id else empty,
            "sim": np.concatenate(out_sim) if out_sim else empty,
        })


def pq_topk(codes_ds, queries: pa.Table, books, k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            exclude_self: bool = True, num_partitions: int | None = None,
            **mb_kwargs):
    """ADC top-k per query row over an encoded corpus: LUT[q][s][c] =
    round(ADC_SCALE * q_s . C[s][c]) built driver-side (nq x m x k ints —
    tiny), broadcast once; per-block score = integer LUT gather+sum;
    partial top-k; shared one-exchange finalize (ties: higher sim, lower
    neighbor_id — exact on ints)."""
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    books = np.ascontiguousarray(books)
    m, kc, dsub = books.shape
    Q = _normalize(stack_embeddings(queries[vec_col]))
    qids = queries[id_col].to_numpy().astype(np.int64)
    luts = np.empty((len(qids), m, kc), dtype=np.int64)
    for s in range(m):
        qs = Q[:, s * dsub:(s + 1) * dsub]           # (nq, dsub)
        luts[:, s, :] = np.round(ADC_SCALE * (qs @ books[s].T))
    partials = codes_ds.map_batches(
        warm_task(_PqPartialTopK, luts_ref=ray.put(luts),
                  qids_ref=ray.put(qids), k=k, id_col=id_col,
                  exclude_self=exclude_self),
        batch_format="pyarrow", **mb_kwargs)
    return _finalize_topk(partials, k, scale=None, round_digits=None,
                          num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# integer-exact PQ — the hash-exact oracle regime (same fixed-point
# discipline as ann.kmeans_exact: every quantity any decision touches is
# int64, so training + encoding + ADC scoring are replicable row-for-row
# by an unrolled SQL twin; the float tier above stays the recall-tuned
# ANN default)

def train_pq_exact(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                   m: int = 8, k: int = 8, n_iter: int = 3,
                   scale: int = 1000) -> np.ndarray:
    """Distributed integer Lloyd per subspace over the WHOLE corpus.

    Identical discipline to :func:`ann.kmeans_exact`, run for all ``m``
    subspaces in the same passes:

    - vectors quantize once: ``e = floor(float64(v) * scale)``;
    - seeds: the k rows with the smallest ``(md5_hash64(id) >> 1, id)``
      seed EVERY subspace (book ``s``'s centroid ``j`` is seed row
      ``j``'s ``s``-th subvector) — one global seed pick, not one per
      subspace;
    - assign: integer squared-Euclidean per subspace, ties to the lowest
      centroid index; update: elementwise ``floor(sum / count)``; empty
      centroids keep their previous value (all inherited via
      ``ann._exact_assign`` + the 2^53 sum guard).

    One broadcast + one vectorized pass per iteration emitting
    ``m * k * dsub`` integer partial rows per block; single-block
    combine. Returns int64 codebooks ``(m, k, dsub)``.
    """
    import ray

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.ann import _exact_assign, _int_embeddings
    from pypdfium2_ray.stages.topk import topk

    def add_hash(t: pa.Table) -> pa.Table:
        h = [md5_hash64(str(v).encode()) >> 1
             for v in t[id_col].to_pylist()]
        return t.append_column("__h", pa.array(h, pa.int64()))

    seeds = topk(ds.map_batches(add_hash, batch_format="pyarrow"),
                 ["__h", id_col], k=k, descending=False) \
        .to_pandas()                          # k rows — driver-side tiny
    S0 = np.stack([_int_embeddings(pa.array([list(v)], pa.list_(
        pa.float32())), scale)[0] for v in seeds[vec_col]])   # (k, dim)
    dim = S0.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.ascontiguousarray(
        S0.reshape(k, m, dsub).transpose(1, 0, 2))            # (m, k, dsub)

    def partial(ref):
        def fn(t: pa.Table) -> pa.Table:
            B = ray.get(ref)
            E = _int_embeddings(t[vec_col], scale)
            S = np.zeros((m, k, dsub), np.int64)
            n = np.zeros((m, k), np.int64)
            for s in range(m):
                Es = E[:, s * dsub:(s + 1) * dsub]
                a = _exact_assign(Es, B[s])
                np.add.at(S[s], a, Es)
                n[s] += np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "sub": np.repeat(np.arange(m, dtype=np.int64), k * dsub),
                "cluster": np.tile(
                    np.repeat(np.arange(k, dtype=np.int64), dsub), m),
                "dim": np.tile(np.arange(dsub, dtype=np.int64), m * k),
                "s": S.reshape(-1),
                "n": np.repeat(n.reshape(-1), dsub)})
        return fn

    for _ in range(n_iter):
        ref = ray.put(books)
        tot = grouped_aggregate(
            ds.map_batches(partial(ref), batch_format="pyarrow"),
            ["sub", "cluster", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
            combine="single_block").to_pandas()
        newB = books.copy()
        for (sb, cl), grp in tot.groupby(["sub", "cluster"]):
            g = grp.sort_values("dim")
            n_vec = int(g["n"].iloc[0])
            if n_vec > 0:
                sums = g["s"].to_numpy()
                if int(np.abs(sums).max(initial=0)) >= 2 ** 53:
                    raise ValueError(
                        "train_pq_exact: per-centroid |sum| >= 2^53 — "
                        "the oracle's double floor-division would round; "
                        "lower scale or raise k")
                newB[int(sb), int(cl)] = np.floor_divide(sums, n_vec)
        books = newB
    return books


class _PqEncodeExact:
    """Per-block integer nearest-centroid encoder (ties to the lowest
    centroid index, matching the SQL twin's ``ORDER BY dist, cluster``)."""

    def __init__(self, books_ref, id_col: str, vec_col: str, scale: int):
        import ray
        self.books = (ray.get(books_ref)
                      if isinstance(books_ref, ray.ObjectRef) else books_ref)
        self.id_col = id_col
        self.vec_col = vec_col
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.stages.ann import _exact_assign, _int_embeddings
        E = _int_embeddings(batch[self.vec_col], self.scale)
        m, k, dsub = self.books.shape
        codes = np.empty((len(E), m), dtype=np.uint8)
        for s in range(m):
            codes[:, s] = _exact_assign(
                E[:, s * dsub:(s + 1) * dsub], self.books[s])
        flat = pa.array(codes.reshape(-1), pa.uint8())
        return pa.table({
            self.id_col: batch[self.id_col].cast(pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(flat, m),
        })


def pq_encode_exact(ds, books, scale: int = 1000, id_col: str = "vec_id",
                    vec_col: str = "embedding", **mb_kwargs):
    """Distributed integer encode against int64 codebooks."""
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    ref = ray.put(np.ascontiguousarray(books))
    return ds.map_batches(
        warm_task(_PqEncodeExact, books_ref=ref, id_col=id_col,
                  vec_col=vec_col, scale=scale),
        batch_format="pyarrow", **mb_kwargs)


def pq_topk_exact(codes_ds, queries: pa.Table, books, k: int = 10,
                  scale: int = 1000, id_col: str = "vec_id",
                  vec_col: str = "embedding", exclude_self: bool = True,
                  num_partitions: int | None = None, **mb_kwargs):
    """ADC top-k in the integer-exact regime: LUT[q][s][c] is the EXACT
    int64 inner product of the e-quantized query subvector with centroid
    ``c`` (no normalization, no rounding — unlike the float tier's
    ``round(ADC_SCALE * ...)``), so every row score is an exact integer
    and the unrolled SQL twin reproduces the result row-for-row.
    Same per-block gather+sum partials and one-exchange finalize."""
    import ray
    from pypdfium2_ray.stages.ann import _int_embeddings
    from pypdfium2_ray.stages.warm import warm_task
    books = np.ascontiguousarray(books)
    m, kc, dsub = books.shape
    Eq = _int_embeddings(queries[vec_col], scale)
    qids = queries[id_col].to_numpy().astype(np.int64)
    maxabs = max(int(np.abs(Eq).max(initial=0)),
                 int(np.abs(books).max(initial=0)))
    if dsub * kc and m * dsub * maxabs * maxabs >= 2 ** 62:
        raise ValueError(
            f"pq_topk_exact int64 overflow risk: max|e|={maxabs} — "
            "lower the quantization scale")
    luts = np.empty((len(qids), m, kc), dtype=np.int64)
    for s in range(m):
        luts[:, s, :] = Eq[:, s * dsub:(s + 1) * dsub] @ books[s].T
    partials = codes_ds.map_batches(
        warm_task(_PqPartialTopK, luts_ref=ray.put(luts),
                  qids_ref=ray.put(qids), k=k, id_col=id_col,
                  exclude_self=exclude_self),
        batch_format="pyarrow", **mb_kwargs)
    return _finalize_topk(partials, k, scale=None, round_digits=None,
                          num_partitions=num_partitions)
