"""Triangle counting (stages/triangles.py — degree-oriented wedge join)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.triangles import triangle_counts


def _counts(edges: list[tuple[int, int]], parts=2, **kw) -> dict[int, int]:
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    with partition_hint(parts):
        ds = triangle_counts(rd.from_arrow(t), **kw)
        out = ds.to_pandas()
    if out.empty:        # Ray's schema()/to_pandas drop columns on 0 rows
        return {}
    assert set(out.columns) == {"node", "n_triangles"}
    return dict(zip(out["node"], out["n_triangles"]))


def _brute(edges) -> dict[int, int]:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    cnt = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return {n: c for n, c in cnt.items() if c}


def test_k4_every_node_in_three_triangles():
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _counts(k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicates_reversals_and_self_loops_are_canonicalized():
    tri = [(0, 1), (1, 2), (2, 0)]
    messy = tri + [(1, 0), (2, 1), (0, 2), (0, 1), (7, 7), (3, 3)]
    assert _counts(messy) == {0: 1, 1: 1, 2: 1}


def test_triangle_free_graph_emits_no_rows():
    path = [(0, 1), (1, 2), (2, 3), (3, 4)]
    star = [(10, i) for i in range(11, 18)]
    assert _counts(path + star) == {}


def test_star_with_one_chord():
    # hub 0 with 8 spokes; one chord between spokes 3-4 closes exactly
    # one triangle — the skew case degree orientation exists for (the
    # hub is every edge's high endpoint, so it centers no wedge)
    edges = [(0, i) for i in range(1, 9)] + [(3, 4)]
    assert _counts(edges) == {0: 1, 3: 1, 4: 1}


def test_matches_brute_force_on_synthetic_graph():
    n = 60
    s = np.arange(n)
    edges = (list(zip(s, (s * 7 + 1) % n)) + list(zip(s, s % 5))
             + list(zip(s, (s // 3) % n)))
    edges = [(int(a), int(b)) for a, b in edges]
    assert _counts(edges, parts=3) == _brute(edges)


def test_partition_invariance():
    n = 40
    s = np.arange(n)
    edges = [(int(a), int(b)) for a, b in
             list(zip(s, (s * 11 + 3) % n)) + list(zip(s, (s + 1) % n))]
    assert _counts(edges, parts=1) == _counts(edges, parts=5)


def test_id_bound_is_loud():
    with pytest.raises(Exception, match="2\\^31"):
        _counts([(1 << 31, 1), (1, 2), (2, 1 << 31)])
