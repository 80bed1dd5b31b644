"""Synchronous label propagation (stages/labelprop.label_propagation)."""

import collections

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.labelprop import label_propagation


def _run(edges, rounds, parts=2):
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    with partition_hint(parts):
        out = label_propagation(rd.from_arrow(t), rounds=rounds).to_pandas()
    return dict(zip(out["node"], out["community"]))


def _brute(edges, rounds):
    """Reference synchronous LPA: simple undirected graph, modal
    neighbor label, ties to the smallest label."""
    adj = collections.defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    lbl = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, ns in adj.items():
            cnt = collections.Counter(lbl[u] for u in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lbl = nxt
    return lbl


TWO_CLIQUES = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)]


def test_cliques_converge_to_min_member():
    # within a clique every node sees the others; min-label tie-breaks
    # pull each clique to its smallest id and keep the cliques apart
    lbl = _run(TWO_CLIQUES, rounds=3)
    assert lbl == _brute(TWO_CLIQUES, 3)
    assert len({lbl[0], lbl[10]}) == 2
    assert lbl[0] == lbl[1] == lbl[2]
    assert lbl[10] == lbl[11] == lbl[12]


def test_matches_brute_force_on_mixed_graph():
    # deterministic pseudo-random graph with hubs, chains and a loop
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)]
    edges += [(i, i + 1) for i in range(0, 22, 2)]
    edges += [(5, 5), (4, 9), (9, 4)]  # self-loop + duplicate direction
    for r in (0, 1, 2, 4):
        assert _run(edges, rounds=r) == _brute(edges, r), f"round {r}"


def test_round_zero_is_identity():
    lbl = _run(TWO_CLIQUES, rounds=0)
    assert lbl == {v: v for v in (0, 1, 2, 10, 11, 12)}


def test_synchronous_two_cycle_is_pinned():
    # a single undirected edge 2-cycles under synchronous update:
    # round 1 swaps the labels, round 2 swaps back
    assert _run([(7, 8)], rounds=1) == {7: 8, 8: 7}
    assert _run([(7, 8)], rounds=2) == {7: 7, 8: 8}


def test_partition_invariance():
    edges = [(i, (i * 5 + 1) % 17) for i in range(17)]
    assert _run(edges, rounds=3, parts=1) == _run(edges, rounds=3, parts=4)


def test_isolated_nodes_absent_and_validation():
    # self-loop-only node never appears (no surviving edge)
    lbl = _run([(1, 2), (9, 9)], rounds=1)
    assert 9 not in lbl and set(lbl) == {1, 2}
    with pytest.raises(ValueError):
        _run([(1, 2)], rounds=-1)


# ---------------------------------------------------------------------------
# BSP engine (stages/bsp.label_propagation_bsp) — identical R-round map

@pytest.mark.parametrize("num_workers", [1, 3])
def test_bsp_lpa_equals_exchange_engine(ray_session, num_workers):
    import numpy as np
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import label_propagation_bsp
    rng = np.random.RandomState(7)
    n = 50
    edges_t = pa.table({
        "src": pa.array(rng.randint(0, n, 250), pa.int64()),
        "dst": pa.array(rng.randint(0, n, 250), pa.int64())})
    for rounds in (0, 1, 4):
        bsp = label_propagation_bsp(rd.from_arrow(edges_t), rounds=rounds,
                                    num_workers=num_workers).to_pandas()
        bsp = bsp.rename(columns={"lbl": "community"}) \
            .sort_values("node").reset_index(drop=True)
        ref = label_propagation(rd.from_arrow(edges_t), rounds=rounds) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert bsp.equals(ref), rounds
