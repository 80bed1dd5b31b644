"""Co-citation counts (stages/triangles.cocitation_counts)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.triangles import cocitation_counts


def _cocite(edges, min_count=2, parts=2, **kw):
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    with partition_hint(parts):
        out = cocitation_counts(rd.from_arrow(t), min_count=min_count,
                                **kw).to_pandas()
    if out.empty:
        return {}
    return {(a, b): c for a, b, c in
            zip(out["id_a"], out["id_b"], out["n_common"])}


def _brute(edges, min_count):
    outs = {}
    for s, d in edges:
        if s != d:
            outs.setdefault(s, set()).add(d)
    cnt = {}
    for s, ds in outs.items():
        for a, b in itertools.combinations(sorted(ds), 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return {p: c for p, c in cnt.items() if c >= min_count}


def test_basic_cocitation():
    edges = [(100, 1), (100, 2), (100, 3), (200, 2), (200, 3)]
    assert _cocite(edges) == {(2, 3): 2}
    assert _cocite(edges, min_count=1) == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_duplicate_links_count_once_per_source():
    edges = [(100, 1), (100, 1), (100, 2), (200, 1), (200, 2)]
    assert _cocite(edges) == {(1, 2): 2}


def test_self_loops_ignored():
    edges = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3)]
    assert _cocite(edges, min_count=1) == {(2, 3): 1}


def test_matches_brute_force_and_partition_invariance():
    n = 50
    edges = [(int(s), int((s * 7 + 1) % n)) for s in range(n)] + \
            [(int(s), int(s % 5)) for s in range(n)] + \
            [(int(s), int((s // 3) % n)) for s in range(n)]
    want = _brute(edges, 2)
    assert _cocite(edges, parts=1) == want
    assert _cocite(edges, parts=5) == want


def test_truncation_is_loud(caplog):
    from pypdfium2_ray.stages.triangles import _cocite_pairs_kernel
    t = pa.table({"src": pa.array([0] * 10, pa.int64()),
                  "dst": pa.array(list(range(1, 11)), pa.int64())})
    with caplog.at_level("WARNING",
                         logger="pypdfium2_ray.stages.triangles"):
        out = _cocite_pairs_kernel(4)(t)
    assert any("co-citation truncation" in r.message for r in caplog.records)
    assert out.num_rows == 4 * 3 // 2


@pytest.mark.parametrize("nparts", [1, 4])
def test_mutual_pairs(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.triangles import mutual_pairs
    rng = np.random.RandomState(13)
    n_nodes, n_edges = 30, 500
    src = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    # duplicates + self-loops on purpose: canon must drop/unify them
    df = pd.DataFrame({"src": np.concatenate([src, src[:50]]),
                       "dst": np.concatenate([dst, dst[:50]])})
    got = mutual_pairs(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    es = set((int(a), int(b)) for a, b in zip(df.src, df.dst) if a != b)
    exp = sorted((a, b) for (a, b) in es if a < b and (b, a) in es)
    assert list(map(tuple, got.to_numpy())) == exp
    assert len(exp) > 0
    # wide ids rejected loudly (packing is 31-bit)
    bad = pd.DataFrame({"src": [2**40], "dst": [1]})
    with pytest.raises(Exception, match="2\\^31"):
        mutual_pairs(rd.from_pandas(bad)).materialize()
