"""PageRank (stages/pagerank): replica-exactness vs a single-process
integer reference, sink/isolate handling, and partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.pagerank import pagerank


def _ref_pagerank(edges, n_nodes, iters=5, damping_pct=85, init=10**9):
    """Single-process integer replica of the documented update rule."""
    r = np.full(n_nodes, init, dtype=np.int64)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n_nodes).astype(np.int64)
    base = ((100 - damping_pct) * init) // 100
    for _ in range(iters):
        contrib = r[src] // outdeg[src]
        insum = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(insum, dst, contrib)
        r = base + damping_pct * insum.astype(np.int64) // 100
    return r


def _run(edges, n_nodes, n_parts=None, **kw):
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n_nodes), pa.int64())}))
    if n_parts:
        e = e.repartition(n_parts)
        nodes = nodes.repartition(n_parts)
    out = pagerank(e, nodes, num_partitions=n_parts, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_pagerank_matches_integer_replica(ray_session):
    rng = np.random.RandomState(7)
    n = 40
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 160), rng.randint(0, n, 160))]
    out = _run(edges, n, n_parts=4)
    ref = _ref_pagerank(edges, n)
    assert out["node"].tolist() == list(range(n))
    assert out["rank"].to_numpy().tolist() == ref.tolist()


def test_pagerank_sinks_and_isolates(ray_session):
    # node 3 is a sink (no out-edges), node 4 is fully isolated
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    out = _run(edges, 5)
    ref = _ref_pagerank(edges, 5)
    assert out["rank"].tolist() == ref.tolist()
    base = ((100 - 85) * 10**9) // 100
    assert out["rank"][4] == base          # isolate: teleport term only
    assert out["rank"][3] > base           # sink still RECEIVES mass


def test_pagerank_partition_invariant(ray_session):
    rng = np.random.RandomState(11)
    n = 60
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 300), rng.randint(0, n, 300))]
    a = _run(edges, n, n_parts=2, iters=3)
    b = _run(edges, n, n_parts=8, iters=3)
    assert a["rank"].tolist() == b["rank"].tolist()


def test_pagerank_parallel_edges_count_twice(ray_session):
    out1 = _run([(0, 1)], 2, iters=1)
    out2 = _run([(0, 1), (0, 1)], 2, iters=1)
    base = ((100 - 85) * 10**9) // 100
    # one edge: outdeg 1 -> contrib init; two parallel: outdeg 2, 2x init//2
    assert out1["rank"][1] == base + 85 * 10**9 // 100
    assert out2["rank"][1] == base + 85 * (2 * (10**9 // 2)) // 100


def test_pagerank_bad_damping(ray_session):
    with pytest.raises(ValueError):
        _run([(0, 1)], 2, damping_pct=101)


# ---------------------------------------------------------------------------
# BSP actor-pool engine (stages/bsp.pagerank_bsp) — bit-identical to the
# exchange-tier pagerank / personalized_pagerank

def _run_bsp(edges, n_nodes, num_workers, seeds=None, **kw):
    from pypdfium2_ray.stages.bsp import pagerank_bsp
    e = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in edges], pa.int64()),
        "dst": pa.array([y for _, y in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n_nodes), pa.int64())}))
    sd = None
    if seeds is not None:
        sd = rd.from_arrow(pa.table({
            "node": pa.array(seeds, pa.int64())}))
    out = pagerank_bsp(e, nodes, seeds=sd, num_workers=num_workers,
                       **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


@pytest.mark.parametrize("num_workers", [1, 4])
def test_bsp_pagerank_matches_replica(ray_session, num_workers):
    rng = np.random.RandomState(5)
    n = 45
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 180), rng.randint(0, n, 180))]
    out = _run_bsp(edges, n, num_workers)
    want = _ref_pagerank(edges, n)
    assert out["node"].tolist() == list(range(n))
    assert out["rank"].to_numpy().tolist() == want.tolist()


def test_bsp_equals_exchange_engine(ray_session):
    rng = np.random.RandomState(9)
    n = 50
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 200), rng.randint(0, n, 200))]
    bsp = _run_bsp(edges, n, num_workers=3)
    ref = _run(edges, n, n_parts=4)
    assert bsp.equals(ref)


def test_bsp_trustrank_equals_personalized(ray_session):
    from pypdfium2_ray.stages.pagerank import personalized_pagerank
    rng = np.random.RandomState(13)
    n = 40
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 160), rng.randint(0, n, 160))]
    seeds = [3, 17, 29]
    bsp = _run_bsp(edges, n, num_workers=3, seeds=seeds)
    e = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in edges], pa.int64()),
        "dst": pa.array([y for _, y in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n), pa.int64())}))
    sd = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))
    ref = personalized_pagerank(e, nodes, sd).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert bsp.equals(ref)
    # unreachable non-seeds hold 0
    assert (bsp.loc[~bsp["node"].isin(seeds), "rank"] >= 0).all()


def test_bsp_seed_outside_nodes_raises(ray_session):
    with pytest.raises(Exception, match="seed outside node set"):
        _run_bsp([(0, 1)], 2, num_workers=2, seeds=[7])
