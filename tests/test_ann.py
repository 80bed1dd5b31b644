"""Similarity-search stages: brute-force top-k (exact, vs numpy oracle) and
LSH near-dup pairs (recall vs the exact pair set on clustered data)."""

import numpy as np
import pyarrow as pa
import pytest


def _make_embeddings(n=80, d=16, seed=3):
    rng = np.random.RandomState(seed)
    # three tight clusters + noise -> guaranteed near-dup structure
    centers = rng.standard_normal((3, d)) * 3
    X = np.concatenate([
        centers[i % 3] + 0.05 * rng.standard_normal(d) for i in range(n)
    ]).reshape(n, d)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in X],
                              pa.list_(pa.float32())),
    })


@pytest.fixture(scope="module")
def emb():
    return _make_embeddings()


def _np_topk(emb, qids, k):
    X = np.array([list(v) for v in emb["embedding"].to_pylist()], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Xn @ Xn[q]
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


def test_ann_topk_matches_numpy(ray_session, emb):
    import ray.data as rd
    import pyarrow.compute as pc
    from pypdfium2_ray.stages.ann import ann_topk
    qids = (0, 1, 2)
    queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array(qids)))
    ds = rd.from_arrow(emb).repartition(4)
    got = ann_topk(ds, queries, k=5, round_digits=None).to_pandas()
    expected = _np_topk(emb, qids, 5)
    for q in qids:
        g = got[got["query_id"] == q].sort_values(["sim", "neighbor_id"],
                                                  ascending=[False, True])
        assert list(g["neighbor_id"]) == expected[q]


def test_embedding_dup_pairs_exact(ray_session, emb):
    import ray.data as rd
    from pypdfium2_ray.stages.ann import embedding_dup_pairs, stack_embeddings, _normalize
    ds = rd.from_arrow(emb).repartition(3)
    got = embedding_dup_pairs(ds, emb, tau=0.999, round_digits=None).to_pandas()
    # oracle
    Xn = _normalize(stack_embeddings(emb["embedding"]))
    sims = Xn @ Xn.T
    ii, jj = np.nonzero(np.triu(sims >= 0.999, k=1))
    expected = set(zip(ii.tolist(), jj.tolist()))
    assert set(zip(got["id_a"], got["id_b"])) == expected
    assert len(expected) > 0            # clusters guarantee pairs exist


def test_embedding_lsh_recall(ray_session, emb):
    import ray.data as rd
    from pypdfium2_ray.stages.ann import (
        embedding_lsh_dup_pairs, embedding_dup_pairs)
    ds = rd.from_arrow(emb).repartition(3)
    exact = embedding_dup_pairs(ds, emb, tau=0.999, round_digits=None).to_pandas()
    lsh = embedding_lsh_dup_pairs(ds, dim=16, tau=0.999, n_bits=16, bands=8,
                                  round_digits=None).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lsh_pairs <= exact_pairs                       # no false positives
    # near-identical vectors share nearly all hyperplane signs: high recall
    assert len(lsh_pairs) >= 0.9 * len(exact_pairs)


def test_stack_embeddings_shape(emb):
    from pypdfium2_ray.stages.ann import stack_embeddings
    X = stack_embeddings(emb["embedding"])
    assert X.shape == (80, 16)
    assert X.dtype == np.float64


def test_ivf_topk_recall(ray_session, emb):
    """IVF with clustered data: high recall vs exact at modest nprobe, and
    exact equivalence when probing every centroid."""
    import ray.data as rd
    import pyarrow.compute as pc
    from pypdfium2_ray.stages.ann import ann_topk, ivf_topk
    qids = (0, 1, 2)
    queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array(qids)))
    ds = rd.from_arrow(emb).repartition(4)

    exact = ann_topk(ds, queries, k=5, round_digits=None).to_pandas()
    ivf_all = ivf_topk(ds, queries, emb, k=5, n_centroids=6, nprobe=6,
                       round_digits=None).to_pandas()
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(ivf_all[ivf_all["query_id"] == q]["neighbor_id"])
        assert a == e                                   # full probe == exact

    ivf = ivf_topk(ds, queries, emb, k=5, n_centroids=6, nprobe=2,
                   round_digits=None).to_pandas()
    hits = 0
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        hits += len(a & e)
    assert hits >= 0.8 * 3 * 5           # tight clusters -> high recall


def test_train_centroids_deterministic(emb):
    from pypdfium2_ray.stages.ann import train_centroids
    import numpy as np
    c1 = train_centroids(emb, 6)
    c2 = train_centroids(emb, 6)
    assert np.array_equal(c1, c2)


def test_ivf_dup_pairs_on_clustered_data(ray_session):
    """On data with real cluster structure (the regime IVF is built for),
    cell-local pairing must find every near-dup pair exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.ann import ivf_dup_pairs
    rng = np.random.RandomState(13)
    centers = rng.standard_normal((5, 16)) * 10
    vecs, ids = [], []
    for i in range(100):
        c = centers[i % 5]
        vecs.append(c + rng.standard_normal(16) * 0.05)   # tight clusters
        ids.append(i)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([v.astype(np.float32).tolist()
                                         for v in vecs],
                                        pa.list_(pa.float32()))})
    # exact pairs at tau: brute force
    X = np.stack(vecs)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    tau = 0.99
    ii, jj = np.nonzero(np.triu(S >= tau, k=1))
    exact = {(int(a), int(b)) for a, b in zip(ii, jj)}
    assert len(exact) > 100                              # real work

    out = ivf_dup_pairs(rd.from_arrow(t), t, tau=tau, n_centroids=5,
                        n_assign=1, seed=3).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert got == exact                                  # recall AND precision 1
    assert (out["sim"] >= tau).all()


def test_grouped_vector_sums_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.ann import grouped_vector_sums

    rng = np.random.default_rng(5)
    X = rng.standard_normal((50, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 50)
    t = pa.table({"label": labels,
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float32()))})
    out = grouped_vector_sums(rd.from_arrow(t).repartition(4),
                              key_col="label").to_pandas()
    S = np.floor(X.astype(np.float64) * 1_000_000).astype(np.int64)
    for lb in range(3):
        mask = labels == lb
        for d in range(4):
            row = out[(out.label == lb) & (out.dim == d)]
            assert int(row.sum_scaled.iloc[0]) == int(S[mask, d].sum())
            assert int(row.n_vecs.iloc[0]) == int(mask.sum())


def test_kmeans_partition_invariant_and_matches_replica(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.ann import _normalize, kmeans

    rng = np.random.default_rng(9)
    # 3 separated blobs
    centers = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]],
                       np.float64)
    X = np.vstack([centers[i % 3] + rng.standard_normal(4) * 0.3
                   for i in range(90)]).astype(np.float32)
    t = pa.table({"vec_id": list(range(90)),
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float32()))})

    def run(n_parts):
        C, assign = kmeans(rd.from_arrow(t).repartition(n_parts),
                           k=3, n_iter=5)
        return C, assign.to_pandas().sort_values("vec_id") \
                        .cluster.to_numpy()

    C2, a2 = run(2)
    C8, a8 = run(8)
    np.testing.assert_array_equal(a2, a8)           # partition-invariant
    np.testing.assert_array_equal(C2, C8)

    # exact single-process replica of the integer-scaled Lloyd updates
    scale = 1 << 20
    Xn = _normalize(X.astype(np.float64))
    order = sorted(range(90), key=lambda i: (md5_hash64(str(i).encode())
                                             >> 1, i))[:3]
    C = _normalize(Xn[order])
    for _ in range(5):
        assign = np.argmax(Xn @ C.T, axis=1)
        S = np.floor(Xn * scale).astype(np.int64)
        newC = C.copy()
        for cl in range(3):
            m = assign == cl
            if m.any():
                v = S[m].sum(axis=0).astype(np.float64) / scale
                n = np.linalg.norm(v)
                if n > 0:
                    newC[cl] = v / n
        C = newC
    np.testing.assert_array_equal(C2, C)
    np.testing.assert_array_equal(a2, np.argmax(Xn @ C.T, axis=1))
    # blobs recovered: each blob maps to one cluster
    for b in range(3):
        assert len({a2[i] for i in range(90) if i % 3 == b}) == 1


def test_semantic_dedup_drops_near_copies_keeps_min_id(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.ann import semantic_dedup

    rng = np.random.default_rng(11)
    # mild concentration: within-blob cosines stay well under tau, so
    # only the planted exact copies count as semantic duplicates
    centers = np.array([[3, 0, 0, 0], [0, 3, 0, 0]], np.float64)
    rows, ids = [], []
    for i in range(40):
        base = centers[i % 2] + rng.standard_normal(4)
        rows.append(base)
        ids.append(i)
    # plant exact duplicates of ids 0 and 1 at higher ids
    for j, src in enumerate((0, 1, 0)):
        rows.append(rows[src])
        ids.append(100 + j)
    X = np.array(rows, np.float32)
    t = pa.table({"vec_id": ids,
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float32()))})

    def run(parts):
        out = semantic_dedup(rd.from_arrow(t).repartition(parts),
                             k=2, n_iter=4, tau=0.999)
        return sorted(out.to_pandas().vec_id)

    kept2 = run(2)
    assert run(6) == kept2                       # partition-invariant
    # planted copies dropped, originals kept
    assert 0 in kept2 and 1 in kept2
    assert not any(i >= 100 for i in kept2)
    assert kept2 == list(range(40))


def test_semantic_dedup_cluster_cap_raises(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pypdfium2_ray.stages.ann import semantic_dedup

    X = np.ones((30, 4), np.float32)
    t = pa.table({"vec_id": list(range(30)),
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float32()))})
    with pytest.raises(Exception, match="max_cluster"):
        semantic_dedup(rd.from_arrow(t), k=1, n_iter=1,
                       max_cluster=10).to_pandas()


# --- integer-exact regime (the hash-exact oracle twins) --------------------

def _blob_table(n=90, seed=9):
    import numpy as np
    import pyarrow as pa
    rng = np.random.default_rng(seed)
    centers = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]],
                       np.float64)
    X = np.vstack([centers[i % 3] + rng.standard_normal(4) * 0.3
                   for i in range(n)]).astype(np.float32)
    return pa.table({"vec_id": list(range(n)),
                     "embedding": pa.array(X.tolist(),
                                           pa.list_(pa.float32()))}), X


def test_kmeans_exact_partition_invariant_and_matches_replica(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.ann import kmeans_exact

    t, X = _blob_table()
    scale = 1000

    def run(n_parts):
        C, assign = kmeans_exact(rd.from_arrow(t).repartition(n_parts),
                                 k=3, n_iter=4, scale=scale)
        return C, assign.to_pandas().sort_values("vec_id") \
                        .cluster.to_numpy()

    C2, a2 = run(2)
    C8, a8 = run(8)
    np.testing.assert_array_equal(a2, a8)
    np.testing.assert_array_equal(C2, C8)

    # single-process integer Lloyd replica
    E = np.floor(X.astype(np.float64) * scale).astype(np.int64)
    seeds = sorted(range(len(E)),
                   key=lambda i: (md5_hash64(str(i).encode()) >> 1, i))[:3]
    C = E[seeds].copy()
    for _ in range(4):
        d2 = ((E[:, None, :] - C[None]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(3):
            m = a == j
            if m.any():
                C[j] = np.floor_divide(E[m].sum(axis=0), int(m.sum()))
    d2 = ((E[:, None, :] - C[None]) ** 2).sum(axis=2)
    np.testing.assert_array_equal(a2, np.argmin(d2, axis=1))
    np.testing.assert_array_equal(C2, C)


def test_semantic_dedup_exact_keeps_min_id(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.ann import semantic_dedup_exact

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    # ids 100+ are exact copies of ids 0..19 -> must drop, min id kept
    X = np.vstack([base, base[:20]])
    ids = list(range(40)) + list(range(100, 120))
    t = pa.table({"vec_id": ids,
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float32()))})
    out = semantic_dedup_exact(rd.from_arrow(t).repartition(4),
                               k=2, n_iter=3, tau_sq=(361, 400),
                               scale=1000).to_pandas()
    kept = sorted(out.vec_id.tolist())
    assert kept == list(range(40)), kept   # every copy dropped, originals kept

    # partition-invariance
    out2 = semantic_dedup_exact(rd.from_arrow(t).repartition(9),
                                k=2, n_iter=3, tau_sq=(361, 400),
                                scale=1000).to_pandas()
    assert sorted(out2.vec_id.tolist()) == kept
