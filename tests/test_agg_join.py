"""Partial-aggregation groupby and broadcast join vs in-memory oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def facts():
    rng = np.random.RandomState(11)
    n = 5000
    return pa.table({
        "k1": rng.choice(["a", "b", "c"], n).tolist(),
        "k2": rng.choice(["x", "y"], n).tolist(),
        "v": rng.uniform(0, 100, n),
        "fk": rng.randint(0, 20, n).astype(np.int64),
    })


def test_grouped_aggregate_matches_pandas(ray_session, facts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.from_arrow(facts).repartition(8)
    got = grouped_aggregate(ds, ["k1", "k2"], {
        "sum_v": ("v", "sum"),
        "n": (None, "count"),
        "avg_v": ("v", "mean"),
        "min_v": ("v", "min"),
        "max_v": ("v", "max"),
    }).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)

    pdf = facts.to_pandas()
    exp = pdf.groupby(["k1", "k2"], as_index=False).agg(
        sum_v=("v", "sum"), n=("v", "size"), avg_v=("v", "mean"),
        min_v=("v", "min"), max_v=("v", "max"),
    ).sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "sum_v", "n", "avg_v", "min_v", "max_v"]].astype(
            {"n": "int64"}),
        exp, check_dtype=False, rtol=1e-12)


def test_grouped_aggregate_single_key_count_only(ray_session, facts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.from_arrow(facts)
    got = grouped_aggregate(ds, ["k1"], {"n": (None, "count")}).to_pandas()
    exp = facts.to_pandas().groupby("k1").size()
    assert dict(zip(got["k1"], got["n"])) == exp.to_dict()


def test_broadcast_join(ray_session, facts):
    import ray.data as rd
    from pypdfium2_ray.stages.join import broadcast_join
    dim = pa.table({
        "id": pa.array(np.arange(10, dtype=np.int64)),   # only half the fks
        "name": [f"dim{i}" for i in range(10)],
    })
    ds = rd.from_arrow(facts).repartition(4)
    got = broadcast_join(ds, dim, keys="fk", right_keys="id").to_pandas()
    exp = facts.to_pandas().merge(
        dim.to_pandas(), left_on="fk", right_on="id")
    assert len(got) == len(exp)                           # inner join drops
    assert set(got["name"]) == set(exp["name"])
    assert (got["fk"] < 10).all()


def test_topk_matches_sort(ray_session, facts):
    import ray.data as rd
    from pypdfium2_ray.stages.topk import topk
    ds = rd.from_arrow(facts).repartition(6)
    got = topk(ds, ["v", "fk"], 7, descending=[True, False]).to_pandas()
    exp = facts.to_pandas().sort_values(
        ["v", "fk"], ascending=[False, True]).head(7).reset_index(drop=True)
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["v", "fk"]], exp[["v", "fk"]])


def test_broadcast_join_task_mode(ray_session, facts):
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.join import broadcast_join
    dim = pa.table({"id": pa.array(np.arange(20, dtype=np.int64)),
                    "name": [f"d{i}" for i in range(20)]})
    ds = rd.from_arrow(facts).repartition(4)
    a = broadcast_join(ds, dim, keys="fk", right_keys="id", mode="tasks").to_pandas()
    b = broadcast_join(ds, dim, keys="fk", right_keys="id", mode="actors").to_pandas()
    assert len(a) == len(b) == len(facts)
    assert sorted(a["name"]) == sorted(b["name"])


def test_warm_task_cache_bounded_and_reused():
    from pypdfium2_ray.stages import warm

    class Counting:
        built = 0
        def __init__(self, tag):
            Counting.built += 1
            self.tag = tag
        def __call__(self, batch):
            return batch

    warm._INSTANCES.clear()
    fn = warm.warm_task(Counting, tag="a")
    fn(None); fn(None)
    assert Counting.built == 1                    # reused per process
    # eviction keeps the cache bounded
    for i in range(20):
        warm.warm_task(Counting, tag=f"t{i}")(None)
    assert len(warm._INSTANCES) <= 16
    warm._INSTANCES.clear()


def test_grouped_median_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_median
    rng = np.random.RandomState(17)
    t = pa.table({
        "k": pa.array(rng.randint(0, 13, size=500), pa.int64()),
        "v": pa.array(rng.rand(500) * 100),
    })
    out = grouped_median(rd.from_arrow(t).repartition(5), ["k"], "v",
                         num_partitions=4).to_pandas()
    exp = (t.to_pandas().groupby("k")["v"].median()
            .reset_index().rename(columns={"v": "median"}))
    got = out.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
