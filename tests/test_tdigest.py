"""t-digest sketch: rank-error bounds (functions/tdigest) and the Dataset
tier (stages/agg.grouped_quantile_sketch) against the exact median.

The sketch contract is a BOUND, not a value: estimates differ in the last
rank-error digits across block layouts (inherent to mergeable sketches),
so every assertion here is a rank-error bound — including under an
adversarial pre-sorted layout where each partial sees a disjoint value
range (worst case for naive streaming quantiles).
"""

import numpy as np
import pandas as pd
import pytest

from pypdfium2_ray.functions import tdigest

DELTA = 200


def _rank_err(values: np.ndarray, est: float, q: float) -> float:
    xs = np.sort(values)
    return abs(np.searchsorted(xs, est) / xs.size - q)


def test_single_group_median_bound():
    rng = np.random.default_rng(7)
    x = rng.lognormal(0, 1, 50_000)
    gid = np.zeros(x.size, np.int64)
    cg, cm, cw = tdigest.compress(gid, x, np.ones_like(x), DELTA)
    assert cg.size <= DELTA           # compression actually compresses
    assert cw.sum() == pytest.approx(x.size)
    est = tdigest.quantile(cg, cm, cw, 0.5, 1)[0]
    assert _rank_err(x, est, 0.5) < 1.0 / DELTA


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
def test_grouped_quantile_bound(q):
    rng = np.random.default_rng(11)
    g = rng.integers(0, 50, 200_000)
    v = rng.normal(g * 10.0, 1 + g % 5, 200_000)
    cg, cm, cw = tdigest.compress(g, v, np.ones_like(v), DELTA)
    est = tdigest.quantile(cg, cm, cw, q, 50)
    for k in range(50):
        assert _rank_err(v[g == k], est[k], q) < 2.0 / DELTA


def test_merge_of_partials_keeps_bound_adversarial_layout():
    """Partials over SORTED contiguous chunks (each digest sees a disjoint
    value range — the layout that breaks naive averaging) still merge to a
    within-bound global digest."""
    rng = np.random.default_rng(3)
    x = np.sort(rng.exponential(5.0, 60_000))
    chunks = np.array_split(x, 64)
    parts = [tdigest.compress(np.zeros(c.size, np.int64), c,
                              np.ones(c.size), DELTA) for c in chunks]
    mg = np.concatenate([p[0] for p in parts])
    mm = np.concatenate([p[1] for p in parts])
    mw = np.concatenate([p[2] for p in parts])
    cg, cm, cw = tdigest.compress(mg, mm, mw, DELTA)
    assert cg.size <= DELTA
    est = tdigest.quantile(cg, cm, cw, 0.5, 1)[0]
    assert _rank_err(x, est, 0.5) < 1.0 / DELTA


def test_tiny_and_single_value_groups_exact():
    """Groups smaller than the centroid budget are represented exactly:
    the median of {5} is 5, of {1,3} is 2 (mid-interpolation)."""
    gid = np.array([0, 1, 1], np.int64)
    v = np.array([5.0, 1.0, 3.0])
    cg, cm, cw = tdigest.compress(gid, v, np.ones_like(v), DELTA)
    est = tdigest.quantile(cg, cm, cw, 0.5, 2)
    assert est[0] == 5.0
    assert est[1] == pytest.approx(2.0)


def test_empty_input():
    e = np.array([], np.int64)
    cg = tdigest.quantile(e, np.array([]), np.array([]), 0.5, 3)
    assert np.isnan(cg).all()


def test_dataset_sketch_vs_exact_median(ray_session, tmp_path):
    """The Dataset tier end-to-end (partial per block -> exchange of
    centroids only -> finalize), checked against the EXACT grouped median
    of the same data: every group's estimate within 1% rank error, on
    both combine tiers, across two block layouts."""
    import ray.data as rd

    from pypdfium2_ray.stages.agg import grouped_median, \
        grouped_quantile_sketch

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 40_000),
        "v": rng.lognormal(1.0, 0.7, 40_000),
    })
    path = str(tmp_path / "t.parquet")
    df.to_parquet(path, index=False)

    exact = grouped_median(rd.read_parquet(path), ["k"], "v",
                           num_partitions=4).to_pandas() \
        .set_index("k")["median"]

    for combine in ("single_block", "exchange"):
        for blocks in (2, 16):      # layout-independence of the BOUND
            ds = rd.read_parquet(path, override_num_blocks=blocks)
            got = grouped_quantile_sketch(
                ds, ["k"], "v", q=0.5, delta=DELTA, num_partitions=4,
                combine=combine).to_pandas().set_index("k")["median_est"]
            assert set(got.index) == set(exact.index)
            for k, est in got.items():
                grp = df.loc[df["k"] == k, "v"].to_numpy()
                assert _rank_err(grp, est, 0.5) < 0.01, (combine, blocks, k)


def test_query_entry_runs(ray_session):
    """events_median_sketch query entry (now the deterministic log-bucket
    histogram tier, stages/digest.grouped_quantile_hist): sane rows, and
    each estimate within its guaranteed 2^-5 relative error of the
    type's exact median."""
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = E.queries()["events_median_sketch"](sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    assert set(got["event_type"]) == set(ev["event_type"])
    for _, row in got.iterrows():
        grp = ev.loc[ev["event_type"] == row["event_type"],
                     "value"].to_numpy(float)
        exact = np.quantile(grp, 0.5, method="inverted_cdf")
        est = row["median_est_micro"] / 1e6
        assert abs(est - exact) <= exact * 2 ** -5 + 0.01, \
            (row["event_type"], est, exact)
