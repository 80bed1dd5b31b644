"""Similarity search + embedding dedup over an embedding column
(``list<float>``) — the SURVEY-mandated training-data ops:

- :func:`ann_topk` — brute-force cosine top-k: the query matrix is broadcast
  (``ray.put`` once, fetched once per actor), each block does ONE numpy
  matmul and emits only its per-query partial top-k, so the final combine
  shuffles ``n_blocks x n_queries x k`` tiny rows, never the embeddings.
- :func:`ivf_topk` — the coarse-quantizer (IVF) approximate top-k scale
  path: broadcast centroids, probe-restricted scoring.
- :func:`embedding_dup_pairs` — near-duplicate pairs by cosine >= tau against
  a broadcast corpus matrix (exact; right up to worker-heap corpus sizes,
  and the recommended tier for LOW thresholds where bucketing degenerates).
- :func:`embedding_lsh_dup_pairs` — random-hyperplane LSH bucketing tier
  for HIGH-threshold near-dup at beyond-heap scale: ids-only band shuffle,
  bucket-local candidate pairs, vectors resolved via repartition joins.
- :func:`ivf_dup_pairs` — cluster-locality (multi-probe IVF cell) tier for
  moderate thresholds; shares the LSH tier's candidate-verify machinery.

Embedding decode is zero-copy: the Arrow list array's flat values buffer is
reshaped ``(n, d)`` without copying.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stack_embeddings(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 view of a fixed-length ``list<float>`` column —
    zero-copy reshape of the flat values buffer."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    d = len(flat) // n if n else 0
    return flat.reshape(n, d).astype(np.float64)


def _normalize(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


class _PartialTopK:
    """Actor: per-block cosine partial top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 exclude_self: bool):
        import ray
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q[id_col].to_numpy()
        self.Qn = _normalize(stack_embeddings(q[vec_col]))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        Xn = _normalize(stack_embeddings(batch[self.vec_col]))
        sims = Xn @ self.Qn.T                      # (n, nq)
        if self.exclude_self:
            mask = ids[:, None] == self.qids[None, :]
            sims = np.where(mask, -np.inf, sims)
        k = min(self.k, sims.shape[0])
        out_q, out_id, out_sim = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            if k < len(col):
                cand = np.argpartition(-col, k - 1)[:k]
            else:
                cand = np.arange(len(col))
            keep = cand[np.isfinite(col[cand])]
            out_q.append(np.full(len(keep), qid, dtype=np.int64))
            out_id.append(ids[keep].astype(np.int64))
            out_sim.append(col[keep])
        return pa.table({
            "query_id": np.concatenate(out_q) if out_q else np.array([], np.int64),
            "neighbor_id": np.concatenate(out_id) if out_id else np.array([], np.int64),
            "sim": np.concatenate(out_sim) if out_sim else np.array([], np.float64),
        })


def _finalize_topk(partials, k: int, scale: int | None,
                   round_digits: int | None,
                   num_partitions: int | None = None):
    """Combine per-block partial top-k rows into the global per-query
    top-k: ONE hash exchange on ``query_id`` then a single vectorized
    kernel per partition (``sort_values`` + ``groupby.head`` — both Cython,
    zero per-group Python calls even at millions of query ids; the
    per-group-pandas ``groupby().map_groups`` pattern this replaces costs a
    Python call per query). Deterministic tie-break: higher sim first,
    then lower neighbor_id."""
    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k)
        if scale is not None:
            df = df.assign(sim_centi=(df["sim"] * scale).round().astype("int64"))
            df = df.drop(columns=["sim"])
        elif round_digits is not None:
            df = df.assign(sim=df["sim"].round(round_digits))
        return df.reset_index(drop=True)

    return partition_map(partials, ["query_id"], kernel,
                         batch_format="pandas",
                         num_partitions=num_partitions)


def ann_topk(ds, queries: pa.Table, k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True,
             round_digits: int | None = 4, scale: int | None = None,
             num_partitions: int | None = None,
             concurrency=None, **mb_kwargs):
    """Global cosine top-k per query row of *queries*.

    Partial top-k per block (matmul), tiny final combine (the exchange
    moves ``n_blocks x n_queries x k`` small rows, never embeddings).
    With ``scale``, ``sim`` is replaced by ``sim_centi``-style scaled
    BIGINT (hash-robust across engines; see relational._scale_cols).
    """
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    ref = ray.put(queries)
    kw = dict(queries_ref=ref, k=k, id_col=id_col, vec_col=vec_col,
              exclude_self=exclude_self)
    if concurrency is not None:
        # explicit cap -> actor pool (bounds broadcast copies / memory)
        partials = ds.map_batches(_PartialTopK, fn_constructor_kwargs=kw,
                                  batch_format="pyarrow",
                                  concurrency=concurrency, **mb_kwargs)
    else:
        partials = ds.map_batches(warm_task(_PartialTopK, **kw),
                                  batch_format="pyarrow", **mb_kwargs)
    return _finalize_topk(partials, k, scale, round_digits,
                          num_partitions=num_partitions)


class _PairsVsBroadcast:
    """Actor: block rows x broadcast corpus -> near-dup pairs (a < b)."""

    def __init__(self, corpus_ref, tau: float, id_col: str, vec_col: str):
        import ray
        c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
        self.cids = c[id_col].to_numpy().astype(np.int64)
        self.Cn = _normalize(stack_embeddings(c[vec_col]))
        self.tau = tau
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        Xn = _normalize(stack_embeddings(batch[self.vec_col]))
        sims = Xn @ self.Cn.T
        # keep only a < b so each unordered pair appears exactly once globally
        ii, jj = np.nonzero((sims >= self.tau) & (ids[:, None] < self.cids[None, :]))
        return pa.table({
            "id_a": ids[ii], "id_b": self.cids[jj],
            "sim": sims[ii, jj],
        })


def embedding_dup_pairs(ds, corpus: pa.Table, tau: float = 0.9,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        round_digits: int | None = 4, scale: int | None = None,
                        concurrency=None, **mb_kwargs):
    """Exact near-duplicate pairs (cosine >= tau), corpus broadcast once."""
    import ray
    import pyarrow.compute as pc
    from pypdfium2_ray.stages.warm import warm_task
    ref = ray.put(corpus)
    kw = dict(corpus_ref=ref, tau=tau, id_col=id_col, vec_col=vec_col)
    if concurrency is not None:
        pairs = ds.map_batches(_PairsVsBroadcast, fn_constructor_kwargs=kw,
                               batch_format="pyarrow",
                               concurrency=concurrency, **mb_kwargs)
    else:
        pairs = ds.map_batches(warm_task(_PairsVsBroadcast, **kw),
                               batch_format="pyarrow", **mb_kwargs)
    if scale is not None:
        def to_scaled(t: pa.Table) -> pa.Table:
            centi = pc.cast(pc.round(pc.multiply(t["sim"], float(scale))),
                            pa.int64())
            return t.drop_columns(["sim"]).append_column("sim_centi", centi)
        pairs = pairs.map_batches(to_scaled, batch_format="pyarrow")
    elif round_digits is not None:
        pairs = pairs.map_batches(
            lambda t: t.set_column(t.schema.get_field_index("sim"), "sim",
                                   pc.round(t["sim"], ndigits=round_digits)),
            batch_format="pyarrow")
    return pairs


class _HyperplaneBands:
    """Actor: random-hyperplane LSH band keys per row (signature bits are a
    fixed seeded projection — identical across actors/batches)."""

    def __init__(self, dim: int, n_bits: int = 32, bands: int = 4,
                 seed: int = 7, id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.H = rng.standard_normal((dim, n_bits))
        self.bands = bands
        self.rows = n_bits // bands
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        X = stack_embeddings(batch[self.vec_col])
        bits = (X @ self.H) > 0                                # (n, n_bits)
        out_band, out_key, out_id = [], [], []
        weights = (1 << np.arange(self.rows, dtype=np.int64))
        for b in range(self.bands):
            chunk = bits[:, b * self.rows:(b + 1) * self.rows]
            keys = chunk.astype(np.int64) @ weights
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_key.append(keys)
            out_id.append(ids)
        # ids + two small ints ONLY — the embedding column never enters the
        # band exchange (a bands x replication of the vector data otherwise)
        return pa.table({
            "band": np.concatenate(out_band),
            "band_key": np.concatenate(out_key),
            "vec_id": np.concatenate(out_id),
        })


def embedding_lsh_dup_pairs(ds, dim: int, tau: float = 0.9, n_bits: int = 32,
                            bands: int = 4, seed: int = 7,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            round_digits: int | None = 4,
                            scale: int | None = None,
                            max_bucket: int = 500,
                            num_partitions: int | None = None,
                            concurrency=None, **mb_kwargs):
    """Scale path: LSH-bucketed near-dup pairs. Only bucket-mates are
    compared; recall is tuned by band/bit counts (exhaustive enough configs
    reach recall 1 on a given corpus, which is how the driver query matches
    the exact-pairs SQL oracle). Candidate pairs carry ids only; vectors are
    resolved AFTER pair-distinct via two repartition joins against the
    corpus, then verified with one vectorized row-wise cosine kernel —
    no vector replication through the band shuffle, no broadcast.

    Threshold-regime caveat (measure before choosing this tier): hyperplane
    LSH separates sharply only for HIGH similarity thresholds. The per-bit
    collision probability is ``p = 1 - acos(tau)/pi`` — at a true near-dup
    threshold (tau=0.9, p=0.86) a 16x8-bit banding gives recall ~1 with
    tiny buckets, but at a low threshold (tau=0.45, p=0.65) recall-1
    banding forces 1-2-bit bands whose 2^r buckets hold O(n/2^r) rows, and
    candidate mass degenerates toward all-pairs. In that regime prefer
    :func:`embedding_dup_pairs` (broadcast tier, one matmul per block, no
    pair materialization) until the corpus outgrows worker heap, or an
    IVF-cell-local pair search."""
    from pypdfium2_ray.stages.dedup import _bucket_pairs_partition
    from pypdfium2_ray.stages.exchange import lookup_join, partition_map
    from pypdfium2_ray.stages.warm import warm_task
    import pyarrow.compute as pc
    kw = dict(dim=dim, n_bits=n_bits, bands=bands, seed=seed,
              id_col=id_col, vec_col=vec_col)
    if concurrency is not None:
        band_rows = ds.map_batches(_HyperplaneBands, fn_constructor_kwargs=kw,
                                   batch_format="pyarrow",
                                   concurrency=concurrency, **mb_kwargs)
    else:
        band_rows = ds.map_batches(warm_task(_HyperplaneBands, **kw),
                                   batch_format="pyarrow", **mb_kwargs)

    candidates = partition_map(
        band_rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "vec_id",
                                          max_bucket),
        num_partitions=num_partitions)
    return _verify_candidate_pairs(candidates, ds, tau=tau, id_col=id_col,
                                   vec_col=vec_col,
                                   round_digits=round_digits, scale=scale,
                                   num_partitions=num_partitions)


def _scale_sim(out, scale: int | None, round_digits: int | None):
    """Shared sim-column finalization: scaled BIGINT (hash-robust) or
    rounded double."""
    import pyarrow.compute as pc
    if scale is not None:
        def to_scaled(t: pa.Table) -> pa.Table:
            centi = pc.cast(pc.round(pc.multiply(t["sim"], float(scale))),
                            pa.int64())
            return t.drop_columns(["sim"]).append_column("sim_centi", centi)
        return out.map_batches(to_scaled, batch_format="pyarrow")
    if round_digits is not None:
        return out.map_batches(
            lambda t: t.set_column(t.schema.get_field_index("sim"), "sim",
                                   pc.round(t["sim"], ndigits=round_digits)),
            batch_format="pyarrow")
    return out


def _verify_candidate_pairs(candidates, ds, tau: float, id_col: str,
                            vec_col: str, round_digits: int | None,
                            scale: int | None,
                            num_partitions: int | None):
    """Shared verify tail of the LSH and IVF dedup tiers: candidate
    (id_a, id_b) rows -> two repartition joins back to the corpus (the
    pair-distinct fused into the first join's exchange — pairs sharing
    id_a co-partition) -> one vectorized row-wise cosine kernel -> sim
    finalization."""
    from pypdfium2_ray.stages.exchange import lookup_join
    import pyarrow.compute as pc
    vec_type = pa.list_(pa.float32())
    pair_cols = {"id_a": pa.int64(), "id_b": pa.int64()}
    # candidate set << corpus: semi-join prefilter keeps the corpus
    # vectors out of the exchange (only candidate ids' vectors shuffle)
    j = lookup_join(candidates, pair_cols, ds, source_key=id_col,
                    key_col="id_a",
                    payload_cols={"__vec_a": vec_type},
                    source_payload={"__vec_a": vec_col},
                    distinct_target_on=["id_a", "id_b"],
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    j = lookup_join(j, {**pair_cols, "__vec_a": vec_type}, ds,
                    source_key=id_col, key_col="id_b",
                    payload_cols={"__vec_b": vec_type},
                    source_payload={"__vec_b": vec_col},
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        A = _normalize(stack_embeddings(t["__vec_a"]))
        B = _normalize(stack_embeddings(t["__vec_b"]))
        sims = np.einsum("ij,ij->i", A, B)
        keep = sims >= tau
        return pa.table({
            "id_a": pc.cast(t["id_a"], pa.int64()).filter(pa.array(keep)),
            "id_b": pc.cast(t["id_b"], pa.int64()).filter(pa.array(keep)),
            "sim": pa.array(sims[keep], pa.float64()),
        })

    return _scale_sim(j.map_batches(verify, batch_format="pyarrow"),
                      scale, round_digits)


def ivf_dup_pairs(ds, train: pa.Table, tau: float = 0.9,
                  n_centroids: int = 16, n_assign: int = 2, seed: int = 11,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  round_digits: int | None = 4, scale: int | None = None,
                  max_bucket: int = 2000,
                  num_partitions: int | None = None, **mb_kwargs):
    """IVF-cell-local near-duplicate pairs — the scale tier for LOW
    similarity thresholds, where hyperplane LSH degenerates (see
    :func:`embedding_lsh_dup_pairs`): cluster locality groups vectors that
    are merely *close*, not near-identical.

    Each vector is assigned to its ``n_assign`` nearest centroids
    (multi-probe: a pair straddling a cell boundary still meets in one of
    the probed cells); candidate pairs are cell-mates; verification is the
    same ids-only repartition-join + vectorized cosine as the LSH tier.
    Candidate mass ~ n^2 * n_assign^2 / n_centroids for balanced cells —
    tune ``n_centroids ~ sqrt(n)`` upward with corpus size. Recall is high
    but not structural; like the LSH tier, configs are validated against
    the exact oracle on the target corpus (recall 1.0 at the driver gate).

    NO SILENT CAP EXCEPTIONS: ``max_bucket`` truncates a cell's candidate
    enumeration at that many members (sorted by id) to bound quadratic
    blowup on skewed cells — pairs involving dropped members are LOST.
    Multi-probe inflates cell membership ~``n_assign``x, so size
    ``max_bucket`` >= n_assign * n / n_centroids for the corpus at hand
    (the default 2000 covers the bench fixtures with slack).
    """
    from pypdfium2_ray.stages.dedup import _bucket_pairs_partition
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.warm import warm_task

    C = train_centroids(train, n_centroids, seed=seed, vec_col=vec_col)

    class _CellRows:
        """Batch fn: (cell, vec_id) row per probed cell — ids only, the
        same narrow-exchange discipline as the LSH band rows."""

        def __init__(self, centroids_ref, n_assign: int):
            import ray
            self.C = (ray.get(centroids_ref)
                      if isinstance(centroids_ref, ray.ObjectRef)
                      else centroids_ref)
            self.n_assign = n_assign

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:    # stack_embeddings infers d=0 -> matmul error
                return pa.table({"band": pa.array([], pa.int64()),
                                 "band_key": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64())})
            ids = batch[id_col].to_numpy().astype(np.int64)
            Xn = _normalize(stack_embeddings(batch[vec_col]))
            sims = Xn @ self.C.T                         # (n, k)
            k = min(self.n_assign, sims.shape[1])
            cells = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            out_id = np.repeat(ids, k)
            out_cell = cells.reshape(-1).astype(np.int64)
            return pa.table({
                "band": pa.array(np.zeros(len(out_id), np.int64)),
                "band_key": pa.array(out_cell),
                "vec_id": pa.array(out_id),
            })

    import ray
    rows = ds.map_batches(
        warm_task(_CellRows, centroids_ref=ray.put(C), n_assign=n_assign),
        batch_format="pyarrow", **mb_kwargs)

    candidates = partition_map(
        rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "vec_id",
                                          max_bucket),
        num_partitions=num_partitions)
    return _verify_candidate_pairs(candidates, ds, tau=tau, id_col=id_col,
                                   vec_col=vec_col,
                                   round_digits=round_digits, scale=scale,
                                   num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the coarse-quantizer scale path

def train_centroids(train: pa.Table, n_centroids: int = 16, n_iter: int = 10,
                    seed: int = 11, vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means on (normalized) training vectors — seeded lloyd
    iterations, pure numpy, deterministic. Train on a driver-side sample
    (``ds.random_sample`` upstream at scale)."""
    X = _normalize(stack_embeddings(train[vec_col]))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C


class _IvfPartialTopK:
    """Per-block IVF-restricted partial top-k: rows are assigned to their
    nearest centroid; a row is a candidate for a query only if its centroid
    is in that query's probe list — the bulk of the corpus is skipped."""

    def __init__(self, queries_ref, centroids_ref, probe_ref, k: int,
                 id_col: str, vec_col: str, exclude_self: bool):
        import ray
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.probe = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        self.qids = q[id_col].to_numpy()
        self.Qn = _normalize(stack_embeddings(q[vec_col]))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        Xn = _normalize(stack_embeddings(batch[self.vec_col]))
        assign = np.argmax(Xn @ self.C.T, axis=1)            # (n,)
        # allowed[i, j]: row i's centroid is probed by query j
        allowed = self.probe[:, assign].T                    # (n, nq)
        sims = Xn @ self.Qn.T
        sims = np.where(allowed, sims, -np.inf)
        if self.exclude_self:
            sims = np.where(ids[:, None] == self.qids[None, :], -np.inf, sims)
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, sims.shape[0])
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            cand = np.argpartition(-col, k - 1)[:k] if k < len(col) \
                else np.arange(len(col))
            keep = cand[np.isfinite(col[cand])]
            out_q.append(np.full(len(keep), qid, dtype=np.int64))
            out_id.append(ids[keep].astype(np.int64))
            out_sim.append(col[keep])
        return pa.table({
            "query_id": np.concatenate(out_q) if out_q else np.array([], np.int64),
            "neighbor_id": np.concatenate(out_id) if out_id else np.array([], np.int64),
            "sim": np.concatenate(out_sim) if out_sim else np.array([], np.float64),
        })


def ivf_topk(ds, queries: pa.Table, train: pa.Table, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 11,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True, round_digits: int | None = 4,
             scale: int | None = None, num_partitions: int | None = None,
             **mb_kwargs):
    """IVF approximate top-k: train a coarse quantizer (seeded spherical
    k-means), probe each query's ``nprobe`` nearest centroids, and only
    score rows assigned to probed centroids. Recall < 1 by construction —
    nprobe/n_centroids tune it; with nprobe == n_centroids this equals the
    brute-force :func:`ann_topk`."""
    import ray
    from pypdfium2_ray.stages.warm import warm_task
    C = train_centroids(train, n_centroids, seed=seed, vec_col=vec_col)
    Qn = _normalize(stack_embeddings(queries[vec_col]))
    order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]      # (nq, nprobe)
    probe = np.zeros((len(Qn), len(C)), dtype=bool)
    for j in range(len(Qn)):
        probe[j, order[j]] = True

    partials = ds.map_batches(
        warm_task(_IvfPartialTopK, queries_ref=ray.put(queries),
                  centroids_ref=ray.put(C), probe_ref=ray.put(probe), k=k,
                  id_col=id_col, vec_col=vec_col, exclude_self=exclude_self),
        batch_format="pyarrow", **mb_kwargs)
    return _finalize_topk(partials, k, scale, round_digits,
                          num_partitions=num_partitions)


def grouped_vector_sums(ds, key_col: str = "label",
                        vec_col: str = "embedding",
                        scale: int = 1_000_000,
                        num_partitions: int | None = None):
    """Per-group embedding centroid ingredients: exploded
    ``(key, dim, sum_scaled, n_vecs)`` rows where ``sum_scaled`` is the
    group sum of ``floor(value * scale)`` per dimension — integer-exact
    (float summation order never matters), so the centroid
    ``sum_scaled / (scale * n_vecs)`` is reproducible across cluster
    sizes and hash-oracle-checkable.

    Per-block partial: one stable argsort by key + ``np.add.reduceat``
    over the (rows, dims) matrix — a single vectorized pass regardless
    of group count; emitted partials are ``groups-in-block x dims`` rows.
    Final combine is ``grouped_aggregate(combine="single_block")``:
    (key, dim) cardinality is fixed at any corpus size (labels x dims),
    the enum-keyed tier that skips the hash exchange entirely.
    """
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        X = stack_embeddings(t[vec_col])
        S = np.floor(X * scale).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys_s, S_s = keys[order], S[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], keys_s[1:] != keys_s[:-1])))
        lengths = np.diff(np.append(starts, len(keys_s)))
        sums = np.add.reduceat(S_s, starts, axis=0)
        k, d = sums.shape
        return pa.table({
            key_col: np.repeat(keys_s[starts], d),
            "dim": np.tile(np.arange(d, dtype=np.int64), k),
            "sum_scaled": sums.reshape(-1),
            "n_vecs": np.repeat(lengths.astype(np.int64), d),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(
        partials, [key_col, "dim"],
        {"sum_scaled": ("sum_scaled", "sum"), "n_vecs": ("n_vecs", "sum")},
        combine="single_block", num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# distributed k-means (iterative; run- and partitioning-invariant)

def _kmeans_partial(centroids_ref, vec_col: str, scale: int):
    """Per-block Lloyd partial: assign rows to their nearest (cosine)
    centroid, then emit integer-scaled per-cluster per-dim sums + counts
    (one argsort + reduceat pass). Integer sums make the update step
    invariant to block order and partitioning — float accumulation order
    can never perturb the next iteration's centroids."""
    import ray

    def f(t: pa.Table) -> pa.Table:
        C = ray.get(centroids_ref)
        Xn = _normalize(stack_embeddings(t[vec_col]))
        assign = np.argmax(Xn @ C.T, axis=1)
        S = np.floor(Xn * scale).astype(np.int64)
        order = np.argsort(assign, kind="stable")
        a_s, S_s = assign[order], S[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], a_s[1:] != a_s[:-1])))
        lengths = np.diff(np.append(starts, len(a_s)))
        sums = np.add.reduceat(S_s, starts, axis=0)
        k, d = sums.shape
        return pa.table({
            "cluster": np.repeat(a_s[starts].astype(np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), k),
            "s": sums.reshape(-1),
            "n": np.repeat(lengths.astype(np.int64), d),
        })

    return f


def kmeans(ds, id_col: str = "vec_id", vec_col: str = "embedding",
           k: int = 8, n_iter: int = 10, scale: int = 1 << 20,
           num_partitions: int | None = None):
    """Distributed spherical k-means over an embedding column.

    Semantic clustering for curation (cluster-balanced sampling, semantic
    dedup buckets, SemDeDup-style pruning). Every step is deterministic
    AND partitioning-invariant, so the same input yields byte-identical
    assignments at any cluster size:

    - init: the *k* rows with the smallest halved-md5 id hash (the
      stratified-sample ordering — no RNG, no data order dependence);
    - assign: centroids broadcast via ``ray.put`` once per iteration,
      one vectorized matmul per block;
    - update: integer-scaled per-cluster sums (``floor(x * scale)``)
      reduced per block and combined in a single block (k x d rows per
      block partial — tiny), so float summation order never moves a
      centroid; empty clusters keep their previous centroid.

    Returns ``(centroids, assignments)``: the final (k, d) float64 array
    and a Dataset ``(id_col, cluster)``. No SQL oracle (iterative);
    tests check exact equality against a single-process replica and
    across partitionings.
    """
    import ray

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.topk import topk

    def add_hash(t: pa.Table) -> pa.Table:
        h = [md5_hash64(str(v).encode()) >> 1
             for v in t[id_col].to_pylist()]
        return t.append_column("__h", pa.array(h, pa.int64()))

    seeds = topk(ds.map_batches(add_hash, batch_format="pyarrow"),
                 ["__h", id_col], k=k, descending=False) \
        .to_pandas()                          # k rows — driver-side tiny
    C = _normalize(np.array(
        [np.asarray(v, dtype=np.float64) for v in seeds[vec_col]]))

    d = C.shape[1]
    for _ in range(n_iter):
        ref = ray.put(C)
        partials = ds.map_batches(_kmeans_partial(ref, vec_col, scale),
                                  batch_format="pyarrow")
        # combine: k*d fixed-cardinality keys — single coalesced block,
        # then the (tiny) totals come to the driver to form the next C
        from pypdfium2_ray.stages.agg import grouped_aggregate
        tot = grouped_aggregate(
            partials, ["cluster", "dim"],
            {"s": ("s", "sum"), "n": ("n", "sum")},
            combine="single_block").to_pandas()
        newC = C.copy()
        for cl, grp in tot.groupby("cluster"):
            g = grp.sort_values("dim")
            vec = g["s"].to_numpy(np.float64) / scale
            nrm = np.linalg.norm(vec)
            if nrm > 0:
                newC[int(cl)] = vec / nrm
        C = newC

    ref = ray.put(C)

    def assign_final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        Cf = ray.get(ref)
        Xn = _normalize(stack_embeddings(t[vec_col]))
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "cluster": np.argmax(Xn @ Cf.T, axis=1).astype(np.int64),
        })

    return C, ds.map_batches(assign_final, batch_format="pyarrow")


def semantic_dedup(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                   k: int = 8, n_iter: int = 5, tau: float = 0.95,
                   max_cluster: int = 100_000,
                   num_partitions: int | None = None):
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023 — public paper):
    k-means the embedding space, then within each cluster drop every row
    whose cosine similarity to a LOWER-id cluster member is > *tau* (the
    min-id member of each semantic duplicate group survives).

    Shape: :func:`kmeans` assignments (partitioning-invariant) are joined
    back to the vectors by a repartition join keyed on the id, then ONE
    hash exchange on ``cluster`` colocates each cluster and a vectorized
    kernel does the pairwise pass (sort by id, one matmul, upper-triangle
    max). Keeps are therefore deterministic at any parallelism.

    ``max_cluster``: NO SILENT CAPS — a cluster larger than this raises
    (the pairwise pass is O(m^2); re-run with larger *k* or a smaller
    corpus shard, or lift the cap deliberately).

    Returns ``(id_col, cluster)`` rows for the KEPT ids only.
    """
    from pypdfium2_ray.stages.exchange import lookup_join, partition_map

    _, assign = kmeans(ds, id_col=id_col, vec_col=vec_col, k=k,
                       n_iter=n_iter, num_partitions=num_partitions)
    joined = lookup_join(
        assign, {id_col: pa.int64(), "cluster": pa.int64()},
        ds, source_key=id_col, key_col=id_col,
        payload_cols={"__vec": pa.list_(pa.float32())},
        source_payload={"__vec": vec_col},
        num_partitions=num_partitions)

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        X = _normalize(stack_embeddings(t["__vec"]))
        order = np.lexsort((ids, cl))
        ids, cl, X = ids[order], cl[order], X[order]
        starts = np.flatnonzero(np.concatenate(([True], cl[1:] != cl[:-1])))
        ends = np.append(starts[1:], len(cl))
        keep_ids, keep_cl = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_cluster:
                raise RuntimeError(
                    f"semantic_dedup: cluster {cl[s]} has {m} members > "
                    f"max_cluster={max_cluster}; raise k or the cap")
            S = X[s:e] @ X[s:e].T
            # a row is dropped iff some EARLIER (smaller-id) member is
            # more similar than tau
            dup = (np.triu(S, 1) > tau).any(axis=0)
            keep_ids.append(ids[s:e][~dup])
            keep_cl.append(cl[s:e][~dup])
        if not keep_ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({id_col: np.concatenate(keep_ids),
                         "cluster": np.concatenate(keep_cl)})

    return partition_map(joined, ["cluster"], prune,
                         num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# integer-exact k-means / SemDeDup — the hash-exact oracle regime

def _int_embeddings(col, scale: int) -> np.ndarray:
    """e = floor(float64(v) * scale) per dim, int64 — the same
    quantization the SQL twin computes as
    ``floor(CAST(v AS DOUBLE) * scale)`` (float32 -> float64 is exact,
    so both sides floor the identical product)."""
    X = stack_embeddings(col)                 # float64 already
    return np.floor(X * float(scale)).astype(np.int64)


def _exact_assign(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin of integer squared-Euclidean distance, ties to the LOWEST
    cluster index (np.argmin first-occurrence == SQL ORDER BY dist,
    cluster). Loud int64 overflow guard: d * (2*maxabs)^2 per term."""
    if not len(E):
        return np.zeros(0, np.int64)
    d = E.shape[1]
    maxabs = max(int(np.abs(E).max(initial=0)),
                 int(np.abs(C).max(initial=0)))
    if d * (2 * maxabs) ** 2 >= 2 ** 63:
        raise ValueError(
            f"kmeans_exact int64 overflow risk: dim={d}, max|e|={maxabs} "
            "— lower the quantization scale")
    diff = E[:, None, :] - C[None, :, :]
    dist = (diff * diff).sum(axis=2)
    return np.argmin(dist, axis=1).astype(np.int64)


def kmeans_exact(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                 k: int = 8, n_iter: int = 5, scale: int = 1000,
                 num_partitions: int | None = None):
    """Integer Lloyd k-means — the HASH-EXACT regime: every quantity the
    cluster decision touches is int64, so the assignment is not just
    partitioning-invariant (like the spherical :func:`kmeans`) but
    replicable row-for-row by an unrolled SQL oracle, the same
    fixed-point discipline that made pagerank/trustrank/hits exact.

    - vectors quantize ONCE: ``e = floor(float64(v) * scale)`` (e3 by
      default — clustering a quantized embedding is still clustering);
    - distance: squared Euclidean over int64, summation-order-free;
    - assignment ties break to the lowest cluster index;
    - update: elementwise ``floor(sum / count)`` (exact floor division;
      the per-cluster |sum| < 2^53 guard keeps the oracle's
      ``floor(CAST(s AS DOUBLE)/n)`` double division exact too);
    - empty clusters keep their previous centroid;
    - seeds: the k rows with the smallest
      ``(md5_number_upper(id::VARCHAR) >> 1, id)`` — cluster j is the
      j-th smallest (functions/sketch.md5_hash64 == DuckDB
      md5_number_upper, verified).

    Same distributed shape as :func:`kmeans`: broadcast centroids, one
    vectorized pass per block, k x d integer partials combined in a
    single block. Returns ``(centroids int64 (k, d), assignments
    Dataset (id_col, cluster))``.
    """
    import ray

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.topk import topk

    def add_hash(t: pa.Table) -> pa.Table:
        h = [md5_hash64(str(v).encode()) >> 1
             for v in t[id_col].to_pylist()]
        return t.append_column("__h", pa.array(h, pa.int64()))

    seeds = topk(ds.map_batches(add_hash, batch_format="pyarrow"),
                 ["__h", id_col], k=k, descending=False) \
        .to_pandas()                          # k rows — driver-side tiny
    C = np.stack([_int_embeddings(pa.array([list(v)], pa.list_(
        pa.float32())), scale)[0] for v in seeds[vec_col]])
    d = C.shape[1]

    def partial(ref):
        def fn(t: pa.Table) -> pa.Table:
            Cc = ray.get(ref)
            E = _int_embeddings(t[vec_col], scale)
            a = _exact_assign(E, Cc)
            S = np.zeros((k, d), np.int64)
            np.add.at(S, a, E)
            n = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "s": S.reshape(-1),
                "n": np.repeat(n, d)})
        return fn

    for _ in range(n_iter):
        ref = ray.put(C)
        tot = grouped_aggregate(
            ds.map_batches(partial(ref), batch_format="pyarrow"),
            ["cluster", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
            combine="single_block").to_pandas()
        newC = C.copy()
        for cl, grp in tot.groupby("cluster"):
            g = grp.sort_values("dim")
            n_vec = int(g["n"].iloc[0])
            if n_vec > 0:
                s = g["s"].to_numpy()
                if int(np.abs(s).max(initial=0)) >= 2 ** 53:
                    raise ValueError(
                        "kmeans_exact: per-cluster |sum| >= 2^53 — the "
                        "oracle's double floor-division would round; "
                        "lower scale or raise k")
                newC[int(cl)] = np.floor_divide(s, n_vec)
        C = newC

    ref = ray.put(C)

    def assign_final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        Cf = ray.get(ref)
        E = _int_embeddings(t[vec_col], scale)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "cluster": _exact_assign(E, Cf)})

    return C, ds.map_batches(assign_final, batch_format="pyarrow")


def semantic_dedup_exact(ds, id_col: str = "vec_id",
                         vec_col: str = "embedding", k: int = 8,
                         n_iter: int = 5, tau_sq: tuple[int, int] = (361, 400),
                         scale: int = 1000, max_cluster: int = 100_000,
                         num_partitions: int | None = None):
    """SemDeDup in the integer-exact regime: :func:`kmeans_exact`
    clusters, then the in-cluster cosine threshold is cross-multiplied
    to integers over the SAME e-quantized vectors —

        cos(a, b) > tau   <=>   ab > 0  AND  q*ab^2 > p*aa*bb

    with ``tau_sq = (p, q)`` the exact rational tau^2 (0.95^2 = 361/400).
    No float enters any keep decision, so the unrolled SQL twin matches
    row-for-row. Keep-min-id semantics and the distributed shape (join
    vectors back, ONE cluster exchange, vectorized in-cluster pass) are
    identical to :func:`semantic_dedup`; the integer Gram matrix is an
    exact int64 matmul (guarded: q * (max aa)^2 < 2^63)."""
    from pypdfium2_ray.stages.exchange import lookup_join, partition_map
    p, q = tau_sq

    _, assign = kmeans_exact(ds, id_col=id_col, vec_col=vec_col, k=k,
                             n_iter=n_iter, scale=scale,
                             num_partitions=num_partitions)
    joined = lookup_join(
        assign, {id_col: pa.int64(), "cluster": pa.int64()},
        ds, source_key=id_col, key_col=id_col,
        payload_cols={"__vec": pa.list_(pa.float32())},
        source_payload={"__vec": vec_col},
        num_partitions=num_partitions)

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        E = _int_embeddings(t["__vec"], scale)
        order = np.lexsort((ids, cl))
        ids, cl, E = ids[order], cl[order], E[order]
        starts = np.flatnonzero(np.concatenate(([True], cl[1:] != cl[:-1])))
        ends = np.append(starts[1:], len(cl))
        keep_ids, keep_cl = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_cluster:
                raise RuntimeError(
                    f"semantic_dedup_exact: cluster {cl[s]} has {m} "
                    f"members > max_cluster={max_cluster}")
            G = E[s:e] @ E[s:e].T             # int64-exact Gram
            diag = np.diagonal(G)
            mx = int(diag.max(initial=0))     # |ab| <= max aa (C-S)
            if max(p, q) * mx * mx >= 2 ** 63:
                raise ValueError(
                    "semantic_dedup_exact int64 overflow risk: "
                    f"max|e|^2 sum {mx} with tau_sq=({p},{q}) — lower "
                    "the quantization scale")
            cond = (G > 0) & (q * G * G > p * np.outer(diag, diag))
            dup = np.triu(cond, 1).any(axis=0)
            keep_ids.append(ids[s:e][~dup])
            keep_cl.append(cl[s:e][~dup])
        if not keep_ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({id_col: np.concatenate(keep_ids),
                         "cluster": np.concatenate(keep_cl)})

    return partition_map(joined, ["cluster"], prune,
                         num_partitions=num_partitions)
