"""Seed-personalized PageRank / TrustRank (stages/pagerank
.personalized_pagerank): replica-exactness vs a single-process integer
reference, seed-locality semantics, and partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.pagerank import personalized_pagerank


def _ref(edges, n_nodes, seeds, iters=5, damping_pct=85, init=10**9):
    """Single-process integer replica of the documented update rule."""
    is_seed = np.zeros(n_nodes, dtype=bool)
    is_seed[list(seeds)] = True
    r = np.where(is_seed, np.int64(init), np.int64(0))
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n_nodes).astype(np.int64)
    base = np.where(is_seed, ((100 - damping_pct) * init) // 100, 0)
    for _ in range(iters):
        contrib = r[src] // outdeg[src]
        insum = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(insum, dst, contrib)
        r = base + damping_pct * insum.astype(np.int64) // 100
    return r


def _run(edges, n_nodes, seeds, n_parts=None, **kw):
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n_nodes), pa.int64())}))
    sd = rd.from_arrow(pa.table({
        "node": pa.array(sorted(seeds), pa.int64())}))
    if n_parts:
        e = e.repartition(n_parts)
        nodes = nodes.repartition(n_parts)
    out = personalized_pagerank(e, nodes, sd, num_partitions=n_parts,
                                **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_matches_integer_replica(ray_session):
    rng = np.random.RandomState(3)
    n = 40
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 160), rng.randint(0, n, 160))]
    seeds = {0, 7, 23}
    out = _run(edges, n, seeds, n_parts=4)
    ref = _ref(edges, n, seeds)
    assert out["node"].tolist() == list(range(n))
    assert out["rank"].to_numpy().tolist() == ref.tolist()


def test_trust_stays_seed_local(ray_session):
    # two disjoint 3-cycles; seeds only in the first — the second
    # component (a "link farm" with no seed in-path) holds trust 0
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    out = _run(edges, 6, {0})
    assert out["rank"][3] == out["rank"][4] == out["rank"][5] == 0
    assert out["rank"][0] > 0 and out["rank"][1] > 0


def test_seed_teleport_only_on_seeds(ray_session):
    # a seed with no in-links keeps exactly the teleport term after the
    # first iteration; a non-seed with no in-links decays to 0
    edges = [(0, 1), (2, 1)]
    out = _run(edges, 3, {0}, iters=5)
    base = ((100 - 85) * 10**9) // 100
    assert out["rank"][0] == base
    assert out["rank"][2] == 0
    assert out["rank"][1] > 0


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(9)
    n = 30
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 120), rng.randint(0, n, 120))]
    a = _run(edges, n, {1, 13}, n_parts=1)
    b = _run(edges, n, {1, 13}, n_parts=5)
    assert a["rank"].tolist() == b["rank"].tolist()
