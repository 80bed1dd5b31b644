"""Bounded-round k-core peeling (stages/kcore.py)."""

import collections

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.kcore import kcore


def _run(edges, k, rounds, parts=2) -> dict[int, int]:
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    with partition_hint(parts):
        out = kcore(rd.from_arrow(et), k=k, rounds=rounds).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["deg"]))


def _brute(edges, k, rounds) -> dict[int, int]:
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    cur = {v for e in und for v in e}
    for _ in range(rounds):
        deg = collections.Counter()
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        surv = {v for v in cur if deg[v] >= k}
        if surv == cur:
            break
        cur = surv
        und = {(a, b) for a, b in und if a in cur and b in cur}
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


def test_triangle_survives_pendant_peels():
    # triangle 1-2-3 plus a pendant path 3-4-5: k=2 peels 5 then 4,
    # the triangle survives with deg 2 everywhere
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _run(edges, k=2, rounds=3) == {1: 2, 2: 2, 3: 2}


def test_bounded_rounds_stop_mid_cascade():
    # path 1-2-3-4-5-6 with k=2: each round peels both endpoints;
    # 1 round leaves 2-3-4-5, which is NOT the (empty) 2-core
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    assert _run(edges, k=2, rounds=1) == {2: 1, 3: 2, 4: 2, 5: 1}
    assert _run(edges, k=2, rounds=10) == {}


def test_duplicates_loops_direction_normalized():
    # parallel edges, both directions and self-loops collapse to the
    # simple graph: a square with k=2 survives with deg 2
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 4), (4, 1), (3, 3)]
    assert _run(edges, k=2, rounds=4) == {1: 2, 2: 2, 3: 2, 4: 2}


def test_zero_rounds_is_simple_degree():
    edges = [(1, 2), (2, 3), (2, 3), (3, 1), (4, 1)]
    assert _run(edges, k=99, rounds=0) == {1: 3, 2: 2, 3: 2, 4: 1}


def test_empty_core_schema():
    et = pa.table({"src": pa.array([1], pa.int64()),
                   "dst": pa.array([2], pa.int64())})
    out = kcore(rd.from_arrow(et), k=5, rounds=2)
    assert out.count() == 0
    assert {f.name for f in out.schema().base_schema} >= {"node", "deg"}


def test_brute_force_random_graph():
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    for k in (2, 3, 4):
        assert _run(edges, k=k, rounds=4) == _brute(edges, k, 4)


def test_partition_invariance():
    import random
    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    assert _run(edges, 3, 3, parts=1) == _run(edges, 3, 3, parts=5)


def test_validation():
    et = pa.table({"src": pa.array([1], pa.int64()),
                   "dst": pa.array([2], pa.int64())})
    with pytest.raises(ValueError):
        kcore(rd.from_arrow(et), k=0, rounds=1)
    with pytest.raises(ValueError):
        kcore(rd.from_arrow(et), k=2, rounds=-1)


# ---------------------------------------------------------------------------
# BSP engine (stages/bsp.kcore_bsp) — identical bounded-round peel

@pytest.mark.parametrize("num_workers", [1, 3])
def test_bsp_kcore_equals_exchange_engine(ray_session, num_workers):
    import numpy as np
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import kcore_bsp
    rng = np.random.RandomState(3)
    n = 60
    edges_t = pa.table({
        "src": pa.array(rng.randint(0, n, 300), pa.int64()),
        "dst": pa.array(rng.randint(0, n, 300), pa.int64())})
    for k, rounds in ((2, 0), (2, 3), (3, 10), (5, 10)):
        bsp = kcore_bsp(rd.from_arrow(edges_t), k=k, rounds=rounds,
                        num_workers=num_workers).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        ref = kcore(rd.from_arrow(edges_t), k=k, rounds=rounds) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert bsp.equals(ref), (k, rounds)


def test_bsp_kcore_empty_core(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import kcore_bsp
    # a path graph has no 3-core
    edges_t = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                        "dst": pa.array([1, 2, 3], pa.int64())})
    out = kcore_bsp(rd.from_arrow(edges_t), k=3, rounds=10,
                    num_workers=2).to_pandas()
    assert len(out) == 0
