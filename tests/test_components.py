"""Connected components over duplicate-pair edge lists
(stages/components.py — alternating large-star/small-star)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.components import connected_components
from pypdfium2_ray.stages.exchange import partition_hint


def _cc(pairs: pa.Table, **kw) -> dict[int, int]:
    with partition_hint(2):
        ds = connected_components(rd.from_arrow(pairs), **kw)
        assert set(ds.schema().names) == {"doc_id", "component"}
        out = ds.to_pandas()
    if out.empty:           # Ray's to_pandas drops columns on 0 rows
        return {}
    assert len(out) == out["doc_id"].nunique()
    return dict(zip(out["doc_id"], out["component"]))


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out = {}
    for mem in comps.values():
        m = min(mem)
        for x in mem:
            out[x] = m
    return out


def test_path_triangle_pair_selfloop():
    # path 0..5 (worst case for label propagation), triangle, pair,
    # self-loop (ignored)
    pairs = pa.table({"id_a": [0, 1, 2, 3, 4, 10, 11, 10, 20, 30],
                      "id_b": [1, 2, 3, 4, 5, 11, 12, 12, 21, 30]})
    got = _cc(pairs)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_empty_and_selfloops_only():
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    assert _cc(empty) == {}
    loops = pa.table({"id_a": [7, 8], "id_b": [7, 8]})
    assert _cc(loops) == {}


def test_duplicate_and_reversed_edges():
    pairs = pa.table({"id_a": [1, 2, 1, 2, 2],
                      "id_b": [2, 1, 2, 3, 3]})
    assert _cc(pairs) == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 300, 400)
    b = rng.integers(0, 300, 400)
    pairs = pa.table({"id_a": a, "id_b": b})
    assert _cc(pairs) == _union_find(zip(a.tolist(), b.tolist()))


def test_long_path_converges_in_log_rounds():
    # a 64-node path: naive min-label propagation needs 63 rounds;
    # alternating stars must finish well inside max_rounds=12
    n = 64
    pairs = pa.table({"id_a": list(range(n - 1)),
                      "id_b": list(range(1, n))})
    got = _cc(pairs, max_rounds=12)
    assert got == {i: 0 for i in range(n)}


def test_unconverged_raises():
    pairs = pa.table({"id_a": [0, 1, 2], "id_b": [1, 2, 3]})
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(pairs, max_rounds=1)
