"""pivot_counts / label_census vs pandas crosstab brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def long_table():
    rng = np.random.RandomState(7)
    n = 4000
    return pa.table({
        "k": rng.randint(0, 300, n).astype(np.int64),
        "label": rng.choice(["click", "view", "buy"], n,
                            p=[0.5, 0.4, 0.1]).tolist(),
    })


def _expected(t: pa.Table, labels):
    df = t.to_pandas()
    wide = pd.crosstab(df["k"], df["label"]).reindex(
        columns=labels, fill_value=0).astype("int64")
    wide.columns = [f"n_{c}" for c in labels]
    return wide.reset_index().sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("nparts", [1, 7])
def test_pivot_counts_matches_crosstab(ray_session, long_table, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.pivot import pivot_counts
    ds = rd.from_arrow(long_table).repartition(nparts)
    got = pivot_counts(ds, "k", "label", ["click", "view", "buy"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = _expected(long_table, ["click", "view", "buy"])
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()].astype("int64"), exp)


def test_pivot_zero_fill_and_label_drop(ray_session):
    """A key that never saw a label gets 0; labels outside the census
    are dropped entirely (the caller's label list IS the schema)."""
    import ray.data as rd
    from pypdfium2_ray.stages.pivot import pivot_counts
    t = pa.table({"k": [1, 1, 2, 3], "label": ["a", "a", "b", "zz"]})
    got = pivot_counts(rd.from_arrow(t), "k", "label", ["a", "b"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = pd.DataFrame({"k": [1, 2], "n_a": [2, 0], "n_b": [0, 1]})
    # key 3 only carried the out-of-vocab label -> it has no row
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_label_census(ray_session, long_table):
    import ray.data as rd
    from pypdfium2_ray.stages.pivot import label_census
    ds = rd.from_arrow(long_table).repartition(5)
    assert label_census(ds, "label") == ["buy", "click", "view"]
