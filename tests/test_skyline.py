"""2-D Pareto skyline vs an O(n^2) dominance oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute(x, y):
    keep = []
    for i in range(len(x)):
        dominated = any(
            (x[j] >= x[i] and y[j] >= y[i]
             and (x[j] > x[i] or y[j] > y[i]))
            for j in range(len(x)))
        keep.append(not dominated)
    return np.array(keep)


@pytest.mark.parametrize("nparts", [1, 6])
@pytest.mark.parametrize("seed", [0, 1])
def test_skyline_matches_brute(ray_session, nparts, seed):
    import ray.data as rd
    from pypdfium2_ray.stages.skyline import skyline
    rng = np.random.RandomState(seed)
    n = 400
    # mix: correlated cloud + anti-correlated arc + exact duplicates
    x = np.concatenate([rng.randint(0, 100, n),
                        np.arange(50), [7, 7, 7]]).astype(np.int64)
    y = np.concatenate([rng.randint(0, 100, n),
                        50 - np.arange(50), [93, 93, 5]]).astype(np.int64)
    t = pa.table({"id": pa.array(range(len(x)), pa.int64()),
                  "x": x, "y": y})
    got = skyline(rd.from_arrow(t).repartition(nparts), "x", "y") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    exp = t.to_pandas()[_brute(x, y)].sort_values("id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_skyline_duplicates_survive_together(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.skyline import skyline
    t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "x": pa.array([5, 5, 1], pa.int64()),
                  "y": pa.array([5, 5, 1], pa.int64())})
    got = skyline(rd.from_arrow(t), "x", "y").to_pandas()
    assert sorted(got["id"]) == [0, 1]


def test_skyline_empty(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.skyline import skyline
    t = pa.table({"x": pa.array([], pa.int64()),
                  "y": pa.array([], pa.int64())})
    assert skyline(rd.from_arrow(t), "x", "y").count() == 0
