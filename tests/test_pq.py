"""Product-quantization ANN tier (stages/pq.py)."""

import numpy as np
import pyarrow as pa
import pytest

from pypdfium2_ray.stages.pq import (
    ADC_SCALE, _encode_block, pq_encode, pq_topk, train_pq)
from pypdfium2_ray.stages.ann import _normalize


def _table(X, ids=None):
    ids = np.arange(len(X), dtype=np.int64) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float64()))})


def _alphabet_corpus(n=120, dim=16, m=4, letters=6, seed=3):
    """Vectors whose subvectors come from a small alphabet: with the
    alphabet AS the codebooks, PQ encoding is lossless."""
    rng = np.random.RandomState(seed)
    alpha = rng.randn(m, letters, dim // m)
    picks = rng.randint(0, letters, size=(n, m))
    X = np.concatenate([alpha[s][picks[:, s]] for s in range(m)], axis=1)
    return X, alpha


def test_lossless_codebooks_equal_brute_force(ray_session):
    import ray.data as rd
    X, books = _alphabet_corpus()
    Xn = _normalize(X)
    t = _table(X)
    queries = _table(X[:3], ids=np.array([0, 1, 2], np.int64))
    codes = pq_encode(rd.from_arrow(t), books)
    got = pq_topk(codes, queries, books, k=5).to_pandas()
    got = got.sort_values(["query_id", "sim", "neighbor_id"],
                          ascending=[True, False, True])
    # exact reference in the same fixed point: lossless codebooks mean the
    # ADC score IS the (rounded) true subspace-dot sum
    Qn = Xn[:3]
    for qi in range(3):
        lut_sim = np.zeros(len(X), dtype=np.int64)
        for s in range(4):
            qs = Qn[qi, s * 4:(s + 1) * 4]
            lut = np.round(ADC_SCALE * (books[s] @ qs)).astype(np.int64)
            enc = _encode_block(Xn, books)[:, s]
            lut_sim += lut[enc]
        lut_sim[qi] = np.iinfo(np.int64).min + 1      # exclude_self
        # (+1: -int64.min overflows back to itself and would sort FIRST)
        order = np.lexsort((np.arange(len(X)), -lut_sim))
        order = order[lut_sim[order] != np.iinfo(np.int64).min + 1][:5]
        want_ids = order.tolist()
        g = got[got["query_id"] == qi]
        assert g["neighbor_id"].tolist() == want_ids
        assert g["sim"].tolist() == lut_sim[order].tolist()


def test_partition_invariance(ray_session):
    import ray.data as rd
    X, books = _alphabet_corpus(n=90)
    queries = _table(X[:2], ids=np.array([0, 1], np.int64))
    a = pq_topk(pq_encode(rd.from_arrow(_table(X)), books),
                queries, books, k=4).to_pandas()
    b = pq_topk(pq_encode(rd.from_arrow(_table(X)).repartition(7), books),
                queries, books, k=4, num_partitions=3).to_pandas()
    key = ["query_id", "sim", "neighbor_id"]
    assert (a.sort_values(key).reset_index(drop=True)[key].values.tolist()
            == b.sort_values(key).reset_index(drop=True)[key].values.tolist())


def test_trained_recall_on_clustered_data(ray_session):
    """Tightly clustered corpus: trained PQ must put each query's own
    cluster twin at rank 1."""
    import ray.data as rd
    rng = np.random.RandomState(7)
    protos = rng.randn(12, 32)
    X = np.repeat(protos, 8, axis=0) + 1e-4 * rng.randn(96, 32)
    t = _table(X)
    books = train_pq(t, m=8, k=12, n_iter=12, seed=5)
    assert books.shape == (8, 12, 4)
    queries = _table(X[::8][:4], ids=np.arange(0, 32, 8, dtype=np.int64))
    got = pq_topk(pq_encode(rd.from_arrow(t), books), queries, books,
                  k=7).to_pandas()
    for qid in range(0, 32, 8):
        neigh = set(got[got["query_id"] == qid]["neighbor_id"])
        twins = {qid + d for d in range(1, 8)}       # same-cluster rows
        assert len(neigh & twins) == 7               # all twins retrieved


def test_encode_layout(ray_session):
    import ray.data as rd
    X, books = _alphabet_corpus(n=20)
    out = pq_encode(rd.from_arrow(_table(X)), books).take_batch(
        20, batch_format="pyarrow")
    assert out["codes"].type == pa.list_(pa.uint8(), 4)
    assert out.num_rows == 20


def test_train_pq_rejects_bad_dim():
    X, _ = _alphabet_corpus(n=10, dim=16, m=4)
    with pytest.raises(ValueError):
        train_pq(_table(X), m=5)


# ---------------------------------------------------------------------------
# integer-exact tier (train_pq_exact / pq_encode_exact / pq_topk_exact)

def _exact_replica(X, ids, qids, m, k, n_iter, scale, topk):
    """Pure-numpy single-process replica of the integer-exact PQ chain."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.ann import _exact_assign

    E = np.floor(np.asarray(X, np.float64) * scale).astype(np.int64)
    dim = E.shape[1]
    dsub = dim // m
    hs = np.array([md5_hash64(str(int(v)).encode()) >> 1 for v in ids])
    seed_rows = np.lexsort((ids, hs))[:k]
    books = E[seed_rows].reshape(k, m, dsub).transpose(1, 0, 2).copy()
    for _ in range(n_iter):
        newB = books.copy()
        for s in range(m):
            Es = E[:, s * dsub:(s + 1) * dsub]
            a = _exact_assign(Es, books[s])
            for j in range(k):
                mem = Es[a == j]
                if len(mem):
                    newB[s][j] = np.floor_divide(mem.sum(axis=0), len(mem))
        books = newB
    codes = np.stack([
        _exact_assign(E[:, s * dsub:(s + 1) * dsub], books[s])
        for s in range(m)], axis=1)
    out = {}
    for qi in qids:
        q = E[list(ids).index(qi)]
        sims = np.zeros(len(E), np.int64)
        for s in range(m):
            lut = books[s] @ q[s * dsub:(s + 1) * dsub]
            sims += lut[codes[:, s]]
        keep = np.array([i for i in range(len(E)) if ids[i] != qi])
        order = keep[np.lexsort((ids[keep], -sims[keep]))][:topk]
        out[qi] = (ids[order].tolist(), sims[order].tolist())
    return out


def test_exact_tier_matches_replica(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.pq import (
        pq_encode_exact, pq_topk_exact, train_pq_exact)
    rng = np.random.RandomState(7)
    X = rng.randn(90, 16)
    ids = np.arange(90, dtype=np.int64)
    t = _table(X, ids)
    ds = rd.from_arrow(t)
    books = train_pq_exact(ds, m=4, k=5, n_iter=2, scale=1000)
    queries = _table(X[:2], ids=ids[:2])
    got = pq_topk_exact(pq_encode_exact(ds, books, scale=1000),
                        queries, books, k=6, scale=1000).to_pandas()
    got = got.sort_values(["query_id", "sim", "neighbor_id"],
                          ascending=[True, False, True])
    want = _exact_replica(X, ids, [0, 1], m=4, k=5, n_iter=2,
                          scale=1000, topk=6)
    for qi in (0, 1):
        g = got[got["query_id"] == qi]
        assert g["neighbor_id"].tolist() == want[qi][0]
        assert g["sim"].tolist() == want[qi][1]


def test_exact_tier_partition_invariant(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.pq import (
        pq_encode_exact, pq_topk_exact, train_pq_exact)
    rng = np.random.RandomState(11)
    X = rng.randn(80, 16)
    t = _table(X)
    queries = _table(X[:2], ids=np.array([0, 1], np.int64))

    def run(nparts):
        ds = rd.from_arrow(t).repartition(nparts)
        books = train_pq_exact(ds, m=4, k=4, n_iter=2, scale=1000)
        out = pq_topk_exact(pq_encode_exact(ds, books, scale=1000),
                            queries, books, k=5, scale=1000).to_pandas()
        return out.sort_values(["query_id", "sim", "neighbor_id"],
                               ascending=[True, False, True]) \
                  .reset_index(drop=True)

    a, b = run(1), run(7)
    assert a.equals(b)
