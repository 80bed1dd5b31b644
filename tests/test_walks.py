"""Deterministic hash-driven graph walks (stages/walks.py)."""

import collections

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.functions.sketch import md5_hash64
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.walks import graph_walks


def _walks(edges, nodes, T, L, parts=2):
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({"node": pa.array(nodes, pa.int64())})
    with partition_hint(parts):
        out = graph_walks(rd.from_arrow(et), rd.from_arrow(nt),
                          walks_per_node=T, length=L).to_pandas()
    walks = collections.defaultdict(dict)
    for w, p, n in zip(out["walk_id"], out["pos"], out["node"]):
        assert p not in walks[w], "duplicate (walk, pos) row"
        walks[w][p] = n
    return {w: [d[p] for p in sorted(d)] for w, d in walks.items()}


def _brute(edges, nodes, T, L):
    adj = collections.defaultdict(list)
    for s, d in sorted(edges, key=lambda e: (e[0], e[1])):
        adj[s].append(d)
    out = {}
    for u in nodes:
        for t in range(T):
            w = u * T + t
            path, cur = [u], u
            for s in range(L):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[md5_hash64(f"{w}|{s}|{cur}".encode()) % len(nbrs)]
                path.append(cur)
            out[w] = path
    return out


def test_matches_scalar_reference():
    n = 30
    edges = [(s, (s * 7 + 1) % n) for s in range(n)] + \
            [(s, s % 5) for s in range(n)] + [(s, (s // 3) % n)
                                              for s in range(n)]
    nodes = list(range(n))
    assert _walks(edges, nodes, T=2, L=4) == _brute(edges, nodes, 2, 4)


def test_sink_ends_walk_early():
    edges = [(0, 1), (1, 2)]        # 2 is a sink
    got = _walks(edges, [0, 1, 2], T=1, L=5)
    assert got[0 * 1 + 0] == [0, 1, 2]
    assert got[2 * 1 + 0] == [2]


def test_multigraph_duplicate_edges_bias_choice():
    # node 0 has edges to 1 (x3) and 2 (x1): ranks 0,1,2 -> 1, rank 3 -> 2
    edges = [(0, 1), (0, 1), (0, 1), (0, 2)]
    got = _walks(edges, [0], T=8, L=1)
    nxt = [got[t][1] for t in range(8)]
    want = [[1, 1, 1, 2][md5_hash64(f"{t}|0|0".encode()) % 4]
            for t in range(8)]
    assert nxt == want


def test_walks_per_node_ids_and_lengths():
    edges = [(0, 1), (1, 0)]
    got = _walks(edges, [0, 1], T=3, L=2)
    assert set(got) == {0, 1, 2, 3, 4, 5}
    assert all(len(p) == 3 for p in got.values())


def test_partition_invariance():
    n = 24
    edges = [(s, (s * 11 + 3) % n) for s in range(n)] + \
            [(s, (s + 1) % n) for s in range(n)]
    nodes = list(range(n))
    assert _walks(edges, nodes, 2, 3, parts=1) == \
        _walks(edges, nodes, 2, 3, parts=5)


def test_id_bound_is_loud():
    with pytest.raises(Exception, match="2\\^31"):
        _walks([(1 << 31, 1)], [1 << 31], 1, 1)


# ---------------------------------------------------------------------------
# BSP engine (stages/bsp.walks_bsp) — identical walk corpus

@pytest.mark.parametrize("num_workers", [1, 3])
def test_bsp_walks_equal_exchange_engine(ray_session, num_workers):
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import walks_bsp
    rng = np.random.RandomState(5)
    n = 30
    edges_t = pa.table({
        "src": pa.array(rng.randint(0, n, 120), pa.int64()),
        "dst": pa.array(rng.randint(0, n, 120), pa.int64())})
    nodes_t = pa.table({"node": pa.array(range(n), pa.int64())})
    bsp = walks_bsp(rd.from_arrow(edges_t), rd.from_arrow(nodes_t),
                    walks_per_node=2, length=4,
                    num_workers=num_workers).to_pandas() \
        .sort_values(["walk_id", "pos"]).reset_index(drop=True)
    ref = graph_walks(rd.from_arrow(edges_t), rd.from_arrow(nodes_t),
                      walks_per_node=2, length=4).to_pandas() \
        .sort_values(["walk_id", "pos"]).reset_index(drop=True)
    assert bsp.equals(ref)


def test_bsp_walks_sinks_stop_early(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.bsp import walks_bsp
    # 0 -> 1 (1 is a sink): every walk from 0 is exactly 2 rows, from 1
    # exactly 1 row
    edges_t = pa.table({"src": pa.array([0], pa.int64()),
                        "dst": pa.array([1], pa.int64())})
    nodes_t = pa.table({"node": pa.array([0, 1], pa.int64())})
    out = walks_bsp(rd.from_arrow(edges_t), rd.from_arrow(nodes_t),
                    walks_per_node=1, length=5,
                    num_workers=2).to_pandas() \
        .sort_values(["walk_id", "pos"]).reset_index(drop=True)
    assert out[out["walk_id"] == 0]["node"].tolist() == [0, 1]
    assert out[out["walk_id"] == 1]["node"].tolist() == [1]
