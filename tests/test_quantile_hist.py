"""Deterministic log-bucket quantile histogram
(stages/digest.grouped_quantile_hist).

Fixed power-of-2 bucket boundaries make the sketch bit-identical at any
partitioning (unlike t-digest) with a guaranteed 2^-sub_bits relative
error — these tests pin the error bound, the exact-regime behavior for
small values, layout invariance, and the nonnegative guard.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pypdfium2_ray.stages.digest import grouped_quantile_hist


def _ds(df, blocks=4):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


def _run(df, blocks=4, **kw):
    out = grouped_quantile_hist(
        _ds(df, blocks), ["k"], "v",
        **{"q": (1, 2), "sub_bits": 5, "scale": 100, **kw}).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_error_bound_vs_exact_median(ray_session):
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "k": rng.choice(list("abc"), size=3000),
        "v": np.abs(rng.lognormal(3.0, 1.5, size=3000))})
    got = _run(df)
    for _, row in got.iterrows():
        grp = df.loc[df["k"] == row["k"], "v"].to_numpy()
        exact = np.quantile(grp, 0.5, method="inverted_cdf")
        est = row["median_est_micro"] / 1e6
        assert abs(est - exact) <= exact * 2 ** -5 + 0.01, (row["k"], est,
                                                           exact)


def test_small_values_exact_regime(ray_session):
    """Values with x = floor(v*scale) < 2^(sub_bits+1) land in singleton
    buckets -> the estimate IS the exact (lower-median) value."""
    df = pd.DataFrame({"k": ["a"] * 5, "v": [0.01, 0.05, 0.13, 0.31, 0.63]})
    got = _run(df)
    assert got["median_est_micro"].tolist() == [130_000]


def test_partition_invariance_bitwise(ray_session):
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": rng.choice(list("xyz"), size=2000),
        "v": np.abs(rng.normal(200, 90, size=2000))})
    runs = [_run(df, blocks=b) for b in (1, 3, 17)]
    assert runs[0].equals(runs[1]) and runs[1].equals(runs[2])
    # and the single_block combine gives the identical answer
    sb = _run(df, blocks=5, combine="single_block")
    assert runs[0].equals(sb)


def test_quantile_rational(ray_session):
    """q = (9, 10) -> p90 by the same rank rule."""
    df = pd.DataFrame({"k": ["a"] * 100, "v": np.arange(1.0, 101.0)})
    got = _run(df, q=(9, 10))
    exact = np.quantile(df["v"], 0.9, method="inverted_cdf")
    est = got["median_est_micro"][0] / 1e6
    assert abs(est - exact) <= exact * 2 ** -5 + 0.01


def test_negative_values_raise(ray_session):
    df = pd.DataFrame({"k": ["a", "a"], "v": [1.0, -2.0]})
    with pytest.raises(Exception, match="nonnegative"):
        _run(df).to_string()
