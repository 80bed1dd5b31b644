"""HITS (stages/hits): replica-exactness vs a single-process integer
reference, hub/authority semantics on a star graph, partition invariance,
and the q_hits/oracle pair at sf0.001."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.hits import hits


def _ref_hits(edges, n_nodes, iters=4, init=10**6):
    """Single-process integer replica of the documented half-step rule."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    h = np.full(n_nodes, init, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(iters):
        araw = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(araw, dst, h[src])
        a = araw // max(1, int(araw.max()) // init)
        hraw = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(hraw, src, a[dst])
        h = hraw // max(1, int(hraw.max()) // init)
    return a, h


def _run(edges, n_nodes, n_parts=None, **kw):
    e = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in edges], pa.int64()),
        "dst": pa.array([y for _, y in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n_nodes), pa.int64())}))
    if n_parts:
        e = e.repartition(n_parts)
        nodes = nodes.repartition(n_parts)
    out = hits(e, nodes, num_partitions=n_parts, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_hits_matches_integer_replica(ray_session):
    rng = np.random.RandomState(3)
    n = 40
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 160), rng.randint(0, n, 160))]
    out = _run(edges, n, n_parts=4)
    a, h = _ref_hits(edges, n)
    assert out["node"].tolist() == list(range(n))
    assert out["auth"].to_numpy().tolist() == a.tolist()
    assert out["hub"].to_numpy().tolist() == h.tolist()


def test_hits_star_graph_semantics(ray_session):
    """Node 0 links to 1..9 (a directory page): it must get the top hub
    score and zero authority; the leaves the top authority and zero hub."""
    edges = [(0, i) for i in range(1, 10)]
    out = _run(edges, 10, iters=3)
    assert out.loc[0, "hub"] == out["hub"].max() > 0
    assert out.loc[0, "auth"] == 0
    assert (out.loc[1:, "auth"] == out["auth"].max()).all()
    assert (out.loc[1:, "auth"] > 0).all()
    assert (out.loc[1:, "hub"] == 0).all()


def test_hits_partition_invariance(ray_session):
    rng = np.random.RandomState(11)
    n = 30
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 90), rng.randint(0, n, 90))]
    outs = [_run(edges, n, n_parts=p, iters=2) for p in (None, 5)]
    for o in outs[1:]:
        assert o.equals(outs[0])


def test_hits_isolates_keep_rows(ray_session):
    """Nodes with no edges at all stay in the output with 0/0 scores."""
    out = _run([(0, 1)], 4, iters=1)
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out.loc[2, ["auth", "hub"]].tolist() == [0, 0]
    assert out.loc[3, ["auth", "hub"]].tolist() == [0, 0]


def test_hits_query_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["hits"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["hits"]).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    # the skewed graph must actually separate scores
    assert got["auth"].nunique() > 5
    assert got["hub"].nunique() > 5


# ---------------------------------------------------------------------------
# BSP actor-pool engine (stages/bsp.hits_bsp) — must be bit-identical to
# the pure Ray Data formulation at any worker count

def _run_bsp(edges, n_nodes, num_workers, n_parts=None, **kw):
    from pypdfium2_ray.stages.bsp import hits_bsp
    e = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in edges], pa.int64()),
        "dst": pa.array([y for _, y in edges], pa.int64())}))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(range(n_nodes), pa.int64())}))
    if n_parts:
        e = e.repartition(n_parts)
        nodes = nodes.repartition(n_parts)
    out = hits_bsp(e, nodes, num_workers=num_workers, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


@pytest.mark.parametrize("num_workers", [1, 3])
def test_bsp_matches_integer_replica(ray_session, num_workers):
    rng = np.random.RandomState(7)
    n = 50
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 200), rng.randint(0, n, 200))]
    out = _run_bsp(edges, n, num_workers, n_parts=5)
    a, h = _ref_hits(edges, n)
    assert out["node"].tolist() == list(range(n))
    assert out["auth"].to_numpy().tolist() == a.tolist()
    assert out["hub"].to_numpy().tolist() == h.tolist()


def test_bsp_equals_ray_data_engine(ray_session):
    """The two engines must agree row-for-row (q_hits switched to BSP;
    the SQL oracle was derived from the Ray Data trajectory)."""
    rng = np.random.RandomState(11)
    n = 60
    edges = [(int(a), int(b))
             for a, b in zip(rng.randint(0, n, 240), rng.randint(0, n, 240))]
    bsp = _run_bsp(edges, n, num_workers=4, n_parts=3)
    ref = _run(edges, n, n_parts=3)
    assert bsp.equals(ref[["node", "auth", "hub"]])


def test_bsp_isolates_and_parallel_edges(ray_session):
    """Isolated nodes keep zero scores (the _zero_rows semantics);
    parallel edges contribute once per copy."""
    edges = [(0, 1), (0, 1), (2, 1)]         # node 3 isolated
    out = _run_bsp(edges, 4, num_workers=2)
    a, h = _ref_hits(edges, 4)
    assert out["auth"].to_numpy().tolist() == a.tolist()
    assert out["hub"].to_numpy().tolist() == h.tolist()
    assert out.loc[3, "auth"] == 0 and out.loc[3, "hub"] == 0
