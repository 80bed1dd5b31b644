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


def test_key_filter_join_semi_anti(ray_session, tmp_path):
    """Semi/anti (blocklist) join: both tiers equal pandas isin, and
    list-typed payload columns pass through untouched (pyarrow's own
    'left semi' join would reject them)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.join import key_filter_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 100, 5_000),
                         "v": rng.normal(size=5_000)})
    left["emb"] = [list(map(float, rng.normal(size=3))) for _ in range(5_000)]
    p = str(tmp_path / "left.parquet")
    left.to_parquet(p, index=False)
    block = pa.table({"k": pa.array([1, 5, 7, 7, 42, 99], pa.int64())})

    want_semi = set(left.loc[left["k"].isin(block["k"].to_pylist()), "v"])
    want_anti = set(left.loc[~left["k"].isin(block["k"].to_pylist()), "v"])
    for tier in ("broadcast", "exchange"):
        ds = rd.read_parquet(p, override_num_blocks=4)
        semi = key_filter_join(ds, block, "k", mode="semi", tier=tier,
                               num_partitions=4).to_pandas()
        anti = key_filter_join(ds, block, "k", mode="anti", tier=tier,
                               num_partitions=4).to_pandas()
        assert set(semi["v"]) == want_semi, tier
        assert set(anti["v"]) == want_anti, tier
        assert len(semi) + len(anti) == len(left)
        assert [len(e) for e in semi["emb"]] == [3] * len(semi)  # lists OK

    # right side as a Dataset + oversized-broadcast fallthrough (loud log,
    # same answer)
    block_ds = rd.from_arrow(block)
    semi2 = key_filter_join(rd.read_parquet(p), block_ds, "k", mode="semi",
                            tier="broadcast", max_broadcast_rows=2,
                            num_partitions=4).to_pandas()
    assert set(semi2["v"]) == want_semi


def test_stratified_sample_deterministic_quota(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.topk import stratified_sample

    t = pa.table({"doc_id": list(range(40)),
                  "grp": ["a" if i % 2 else "b" for i in range(40)]})
    with partition_hint(2):
        out = stratified_sample(rd.from_arrow(t), ["grp"], "doc_id",
                                k=5).to_pandas()
    assert sorted(out.columns) == ["doc_id", "grp"]
    assert out.groupby("grp").size().to_dict() == {"a": 5, "b": 5}
    # membership matches the direct hash ordering
    for g in ("a", "b"):
        ids = [i for i in range(40) if ("a" if i % 2 else "b") == g]
        exp = sorted(ids, key=lambda i: (md5_hash64(str(i).encode()) >> 1,
                                         i))[:5]
        assert sorted(out[out.grp == g].doc_id) == sorted(exp)
    # rerun is identical (determinism)
    with partition_hint(3):
        out2 = stratified_sample(rd.from_arrow(t), ["grp"], "doc_id",
                                 k=5).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_late_orders_decorrelation_edges(ray_session, tmp_path):
    """EXISTS via per-key MAX: strict > at exactly +days excluded;
    orders with no lineitems excluded; one late lineitem suffices."""
    import pandas as pd

    from pypdfium2_ray.pipelines.relational import late_orders
    from pypdfium2_ray.stages.exchange import partition_hint
    d0 = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1] * 4,
        "o_orderstatus": ["O"] * 4,
        "o_totalprice": [1.0] * 4,
        "o_orderdate": [d0] * 4,
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"],
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],          # order 4: no lineitems
        "l_shipdate": [d0 + 61 * day, d0 + day,   # 1: late (one suffices)
                       d0 + 60 * day,             # 2: exactly +60 — NOT late
                       d0 + 100 * day],           # 3: late
    })
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    with partition_hint(2):
        out = late_orders(str(tmp_path)).to_pandas()
    got = dict(zip(out.o_orderpriority, out.n_late))
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_grouped_decay_sum(ray_session):
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from pypdfium2_ray.stages.agg import grouped_decay_sum
    from pypdfium2_ray.stages.exchange import partition_hint
    t0 = pd.Timestamp("2024-03-01 12:00:00")
    h = pd.Timedelta(hours=1)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [t0, t0 - h, t0 - 3 * h,       # ages 0,1,3 vs user max
               t0 - 5 * h, t0 - 5 * h - 50 * 3600 * h / 3600,  # cap>40
               t0],
        "value": [1.0, 1.0, 8.0, 2.0, 3.0, 0.5]})
    with partition_hint(2):
        out = grouped_decay_sum(rd.from_pandas(df).repartition(3),
                                ["user_id"], "ts", "value").to_pandas()
    got = dict(zip(out.user_id, out.decay_e4))
    # u1: 10000>>0 + 10000>>1 + 80000>>3 = 25000
    # u2: latest = t0-5h -> ages 0 and 50(capped 40): 20000 + 30000>>40=0
    # u3: 5000
    assert got == {1: 25000, 2: 20000, 3: 5000}
    with _pytest.raises(Exception, match="nonnegative"):
        bad = df.assign(value=[-1.0] * 6)
        grouped_decay_sum(rd.from_pandas(bad), ["user_id"], "ts",
                          "value").to_pandas()


def test_grouped_mode_tiebreak(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.agg import grouped_mode
    from pypdfium2_ray.stages.exchange import partition_hint
    t = pa.table({"k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                  "v": ["b", "a", "b", "a",      # tie 2-2 -> 'a' wins
                        "z", "z"]})
    for parts in (1, 3):
        with partition_hint(2):
            out = grouped_mode(rd.from_arrow(t).repartition(parts),
                               ["k"], "v").to_pandas()
        got = {r.k: (r.mode, r.n) for r in out.itertuples()}
        assert got == {1: ("a", 2), 2: ("z", 2)}


def test_props_extract_newline_guard(ray_session, tmp_path):
    """The block JSON parse requires single-line values — multiline
    props must raise loudly, not silently shift rows."""
    import importlib

    import pytest as _pytest
    import pyarrow.parquet as pq
    E = importlib.import_module("__ray_entry__")
    pq.write_table(pa.table({"event_type": ["a"],
                             "props": ['{"k":\n 1}']}),
                   str(tmp_path / "events.parquet"))
    with _pytest.raises(Exception, match="single-line"):
        E.queries()["props_stats"](str(tmp_path)).to_pandas()


def test_grouped_order_stats(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pypdfium2_ray.stages.agg import grouped_order_stats
    from pypdfium2_ray.stages.exchange import partition_hint
    rng = np.random.RandomState(5)
    df = pd.DataFrame({"g": rng.randint(0, 4, 200),
                       "v": rng.rand(200),
                       "id": np.arange(200)})
    for parts in (1, 5):
        with partition_hint(3):
            out = grouped_order_stats(
                rd.from_pandas(df).repartition(parts), ["g"], "v",
                tiebreak="id").to_pandas().set_index("g").sort_index()
        for g, grp in df.groupby("g"):
            vals = grp.sort_values(["v", "id"])["v"].to_numpy()
            n = len(vals)
            for q in (1, 2, 3):
                assert out.loc[g, f"q{q}"] == vals[q * (n - 1) // 4], (g, q)


@pytest.mark.parametrize("combine", ["exchange", "single_block"])
def test_grouped_count_distinct(ray_session, facts, combine):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_count_distinct
    ds = rd.from_arrow(facts).repartition(6)
    got = grouped_count_distinct(ds, ["k1"], "fk", out="n_fk",
                                 combine=combine) \
        .to_pandas().sort_values("k1").reset_index(drop=True)
    pdf = facts.to_pandas()
    exp = pdf.groupby("k1", as_index=False).agg(
        n_fk=("fk", "nunique")).sort_values("k1").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n_fk": "int64"}), exp)


@pytest.mark.parametrize("combine", ["exchange", "single_block"])
def test_grouped_moments(ray_session, combine):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_moments
    rng = np.random.RandomState(3)
    n = 3000
    t = pa.table({
        "g": rng.choice(["a", "b"], n).tolist(),
        "x": rng.randint(-50, 50, n).astype(np.int64),
        "y": rng.randint(0, 1000, n).astype(np.int64),
    })
    got = grouped_moments(rd.from_arrow(t).repartition(5), ["g"],
                          "x", "y", combine=combine) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    df = t.to_pandas()
    df["xx"], df["yy"], df["xy"] = df.x * df.x, df.y * df.y, df.x * df.y
    exp = df.groupby("g", as_index=False).agg(
        n=("x", "size"), sum_x=("x", "sum"), sum_y=("y", "sum"),
        sum_xx=("xx", "sum"), sum_yy=("yy", "sum"), sum_xy=("xy", "sum"))
    cols = ["g", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    pd.testing.assert_frame_equal(
        got[cols].astype({c: "int64" for c in cols[1:]}), exp[cols])


def _mad_brute(df, thresh_num=3, thresh_den=1):
    """Brute-force doubled-median MAD outliers per group."""
    out = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        n = len(v)
        med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
        dev2 = np.abs(2 * sub["v"].to_numpy() - med2)
        d = np.sort(dev2)
        mad4 = int(d[(n - 1) // 2]) + int(d[n // 2])
        m = 2 * dev2 * thresh_den > thresh_num * mad4
        for tb, vv, dd in zip(sub["tb"].to_numpy()[m],
                              sub["v"].to_numpy()[m], dev2[m]):
            out.append((g, int(tb), int(vv), int(dd), mad4))
    return sorted(out)


@pytest.mark.parametrize("nparts", [1, 7])
def test_grouped_mad_outliers(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mad_outliers
    rng = np.random.RandomState(7)
    n = 4000
    base = rng.randint(90, 110, n).astype(np.int64)
    # inject unambiguous outliers
    base[::97] += 10_000
    t = pa.table({"g": rng.choice(["a", "b", "c"], n).tolist(),
                  "tb": np.arange(n, dtype=np.int64),
                  "v": base})
    got = grouped_mad_outliers(rd.from_arrow(t).repartition(nparts),
                               ["g"], "v", tiebreak="tb").to_pandas()
    got_rows = sorted(zip(got["g"], got["tb"].astype(int),
                          got["v"].astype(int), got["dev2"].astype(int),
                          got["mad4"].astype(int)))
    assert got_rows == _mad_brute(t.to_pandas())
    assert len(got_rows) >= n // 97  # every injected outlier flagged


def test_grouped_mad_degenerate_zero_mad(ray_session):
    """>half the group at the median -> mad4 = 0 -> every off-median
    value flags (the documented MAD collapse)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mad_outliers
    t = pa.table({"g": ["x"] * 6,
                  "tb": np.arange(6, dtype=np.int64),
                  "v": np.array([5, 5, 5, 5, 9, 2], dtype=np.int64)})
    got = grouped_mad_outliers(rd.from_arrow(t), ["g"], "v",
                               tiebreak="tb").to_pandas()
    assert sorted(got["v"].astype(int)) == [2, 9]


def test_k_anonymize(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.privacy import k_anonymize
    rng = np.random.RandomState(11)
    n = 2000
    t = pa.table({"qa": rng.choice(["u", "v", "w"], n).tolist(),
                  "qb": rng.randint(0, 40, n).astype(np.int64),
                  "payload": np.arange(n, dtype=np.int64)})
    got = k_anonymize(rd.from_arrow(t).repartition(5), ["qa", "qb"],
                      k=15).to_pandas()
    df = t.to_pandas()
    sizes = df.groupby(["qa", "qb"])["payload"].transform("size")
    exp = df[sizes >= 15]
    assert sorted(got["payload"]) == sorted(exp["payload"])
    assert list(got.columns) == ["qa", "qb", "payload"]  # schema kept
    # every surviving combo really has >= k rows
    surv = got.groupby(["qa", "qb"]).size()
    assert (surv >= 15).all() and len(surv) > 0
