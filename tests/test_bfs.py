"""Multi-source BFS crawl depth (stages/bfs.py)."""

import collections

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.bfs import bfs_depths
from pypdfium2_ray.stages.exchange import partition_hint


def _bfs(edges, seeds, hops, parts=2) -> dict[int, int]:
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    st = pa.table({"node": pa.array(seeds, pa.int64())})
    with partition_hint(parts):
        out = bfs_depths(rd.from_arrow(et), rd.from_arrow(st), hops).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["depth"]))


def _brute(edges, seeds, hops) -> dict[int, int]:
    adj = collections.defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for k in range(hops):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = k + 1
                    nxt.add(v)
        frontier = nxt
    return dist


def test_line_graph_depth_clips_at_hops():
    edges = [(i, i + 1) for i in range(10)]
    assert _bfs(edges, [0], 4) == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_direction_respected_and_unreachable_absent():
    edges = [(0, 1), (2, 1), (3, 4)]
    assert _bfs(edges, [0], 3) == {0: 0, 1: 1}


def test_two_seeds_take_min():
    edges = [(0, 1), (1, 2), (2, 3), (9, 3)]
    assert _bfs(edges, [0, 9], 5) == {0: 0, 9: 0, 1: 1, 2: 2, 3: 1}


def test_cycle_settles():
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _bfs(edges, [0], 10) == {0: 0, 1: 1, 2: 2}


def test_duplicate_seeds_and_edges():
    edges = [(0, 1), (0, 1), (1, 2)]
    assert _bfs(edges, [0, 0, 1], 3) == {0: 0, 1: 0, 2: 1}


def test_frontier_exhaustion_early_exit():
    edges = [(0, 1)]
    assert _bfs(edges, [0], 50) == {0: 0, 1: 1}


def test_matches_brute_force_and_partition_invariant():
    n = 80
    edges = [(s, (s * 7 + 1) % n) for s in range(n)] + \
            [(s, s % 5) for s in range(n)]
    seeds = [3, 44]
    want = _brute(edges, seeds, 4)
    assert _bfs(edges, seeds, 4, parts=1) == want
    assert _bfs(edges, seeds, 4, parts=5) == want


def test_zero_hops_is_seed_set():
    assert _bfs([(0, 1)], [5, 0], 0) == {0: 0, 5: 0}


# ---------------------------------------------------------------------------
# BSP engine (stages/bsp.bfs_bsp) — identical fixed point to bfs_depths

@pytest.mark.parametrize("num_workers", [1, 3])
def test_bsp_bfs_equals_exchange_engine(ray_session, num_workers):
    import ray.data as rd

    from pypdfium2_ray.stages.bfs import bfs_depths
    from pypdfium2_ray.stages.bsp import bfs_bsp
    rng = np.random.RandomState(3)
    n = 60
    edges_t = pa.table({
        "src": pa.array(rng.randint(0, n, 240), pa.int64()),
        "dst": pa.array(rng.randint(0, n, 240), pa.int64())})
    seeds_t = pa.table({"node": pa.array([0, 7, 7, 31], pa.int64())})
    for hops in (0, 2, 5):
        bsp = bfs_bsp(rd.from_arrow(edges_t), rd.from_arrow(seeds_t),
                      hops=hops, num_workers=num_workers).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        ref = bfs_depths(rd.from_arrow(edges_t), rd.from_arrow(seeds_t),
                         hops=hops).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert bsp.equals(ref), hops


def test_bsp_bfs_early_exit_and_unreachable(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import bfs_bsp
    # 0 -> 1 -> 2; 5 -> 6 disconnected from the seed
    edges_t = pa.table({"src": pa.array([0, 1, 5], pa.int64()),
                        "dst": pa.array([1, 2, 6], pa.int64())})
    seeds_t = pa.table({"node": pa.array([0], pa.int64())})
    out = bfs_bsp(rd.from_arrow(edges_t), rd.from_arrow(seeds_t),
                  hops=10, num_workers=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [0, 1, 2]
    assert out["depth"].tolist() == [0, 1, 2]
