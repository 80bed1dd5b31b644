"""Market-basket pair support + ordered event paths vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_pairs(df):
    from collections import Counter
    c = Counter()
    for _, g in df.drop_duplicates().groupby("b"):
        items = sorted(set(g["i"]))
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                c[(items[x], items[y])] += 1
    return c


@pytest.mark.parametrize("nparts", [1, 5])
def test_pair_support_matches_brute(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    rng = np.random.RandomState(2)
    n = 3000
    df = pd.DataFrame({"b": rng.randint(0, 400, n).astype(np.int64),
                       "i": rng.randint(0, 30, n).astype(np.int64)})
    got = pair_support(rd.from_pandas(df).repartition(nparts), "b", "i") \
        .to_pandas().sort_values(["item_a", "item_b"]) \
        .reset_index(drop=True)
    exp = _brute_pairs(df)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[(r.item_a, r.item_b)] == r.n_baskets


def test_pair_support_set_semantics(ray_session):
    """A duplicated item within one basket counts once."""
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    df = pd.DataFrame({"b": [1, 1, 1, 2, 2], "i": [7, 7, 9, 7, 9]})
    got = pair_support(rd.from_pandas(df), "b", "i").to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == [7, 9, 2]


def test_singleton_baskets_emit_nothing(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    df = pd.DataFrame({"b": [1, 2, 3], "i": [4, 5, 6]})
    assert pair_support(rd.from_pandas(df), "b", "i").count() == 0


@pytest.mark.parametrize("nparts", [1, 4])
def test_event_paths_ordered(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_paths
    rng = np.random.RandomState(9)
    n = 800
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 500, n)],      # ts ties likely
        "event_type": rng.choice(["a", "bb", "c"], n).tolist(),
    }).sample(frac=1.0, random_state=1).reset_index(drop=True)
    got = event_paths(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    exp = (df.sort_values(["ts", "event_id"])
             .groupby("user_id")["event_type"]
             .agg(lambda s: "->".join(s)).reset_index(name="path"))
    exp["n_events"] = df.groupby("user_id").size().values
    exp = exp[["user_id", "n_events", "path"]]
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64"}), exp.astype({"n_events": "int64"}))


@pytest.mark.parametrize("nparts", [1, 4])
def test_time_weighted_sum(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_weighted_sum
    rng = np.random.RandomState(4)
    n = 600
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 30, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 100, n)],       # many ts ties
        "value_e4": rng.randint(0, 1000, n).astype(np.int64),
    })
    df.loc[len(df)] = [999, n, t0, 7]                   # single-event user
    got = time_weighted_sum(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)

    def brute(g):
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = g["value_e4"].to_numpy()
        return int((np.diff(t) // 1_000_000 * v[:-1]).sum())

    exp = df.groupby("user_id").apply(brute, include_groups=False) \
        .reset_index(name="integral_e4")
    exp.insert(1, "n_events", df.groupby("user_id").size().values)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))
    assert got.loc[got.user_id == 999, "integral_e4"].item() == 0


@pytest.mark.parametrize("nparts", [1, 4])
def test_running_total(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_total
    rng = np.random.RandomState(5)
    n = 600
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 30, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 100, n)],       # many ts ties
        "value_e4": rng.randint(-500, 1000, n).astype(np.int64),
    }).sample(frac=1.0, random_state=2).reset_index(drop=True)
    got = running_total(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == n                               # all rows out
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["run_total_e4"] = exp.groupby("user_id")["value_e4"].cumsum()
    exp = exp[["event_id", "user_id", "run_total_e4"]] \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@pytest.mark.parametrize("nparts", [1, 4])
def test_event_islands(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_islands
    rng = np.random.RandomState(6)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 80, n)],        # heavy ts ties
        "event_type": rng.choice(["a", "b"], n).tolist(),
    }).sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = event_islands(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values(["user_id", "start_us", "first_id"]) \
        .reset_index(drop=True)

    # brute: walk each user's (ts, event_id)-ordered stream
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ids = g["event_id"].to_numpy()
        labs = g["event_type"].to_numpy()
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or labs[i] != labs[i - 1]:
                rows.append((uid, labs[start], i - start, us[start],
                             us[i - 1], ids[start:i].min()))
                start = i
    exp = pd.DataFrame(rows, columns=["user_id", "event_type", "n_events",
                                      "start_us", "end_us", "first_id"]) \
        .sort_values(["user_id", "start_us", "first_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # islands tile the stream exactly
    assert got["n_events"].sum() == n


@pytest.mark.parametrize("nparts", [1, 4])
def test_group_centered(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import group_centered
    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value_e4": rng.randint(-1000, 1000, n).astype(np.int64),
    })
    got = group_centered(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    g = df.groupby("user_id")["value_e4"]
    exp = pd.DataFrame({
        "event_id": df["event_id"],
        "user_id": df["user_id"],
        "n_key": g.transform("size").astype("int64"),
        "dev_n": (df["value_e4"] * g.transform("size")
                  - g.transform("sum")).astype("int64")})
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
    # deviations sum to zero within every group (exact centering)
    assert (got.groupby("user_id")["dev_n"].sum() == 0).all()


@pytest.mark.parametrize("grain", ["month", "day"])
def test_periodic_delta(ray_session, grain):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import (
        PERIOD_DELTA_SENTINEL, periodic_delta)
    rng = np.random.RandomState(8)
    n = 500
    t0 = pd.Timestamp("2023-11-15")
    df = pd.DataFrame({
        "lab": rng.choice(["x", "y"], n).tolist(),
        "ts": [t0 + pd.Timedelta(days=int(d), hours=int(h))
               for d, h in zip(rng.randint(0, 120, n),
                               rng.randint(0, 24, n))],  # crosses years
        "v": rng.randint(-50, 100, n).astype(np.int64),
    })
    got = periodic_delta(rd.from_pandas(df).repartition(3),
                         "lab", "ts", "v", grain=grain) \
        .to_pandas().sort_values(["lab", "ym"]).reset_index(drop=True)
    if grain == "month":
        ym = df["ts"].dt.year * 100 + df["ts"].dt.month
    else:
        ym = (df["ts"].dt.year * 10000 + df["ts"].dt.month * 100
              + df["ts"].dt.day)
    exp = df.assign(ym=ym.astype("int64")) \
        .groupby(["lab", "ym"], as_index=False)["v"].sum() \
        .rename(columns={"v": "sum_e4"}) \
        .sort_values(["lab", "ym"]).reset_index(drop=True)
    lag = exp.groupby("lab")["sum_e4"].shift(1)
    exp["delta_e4"] = np.where(lag.isna(), PERIOD_DELTA_SENTINEL,
                               exp["sum_e4"] - lag.fillna(0)).astype("int64")
    exp = exp.rename(columns={"lab": "lab"})
    got = got.astype({"sum_e4": "int64", "delta_e4": "int64"})
    exp = exp.astype({"sum_e4": "int64", "delta_e4": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    # every label's first period is the sentinel, exactly once
    assert (got[got.delta_e4 == PERIOD_DELTA_SENTINEL]
            .groupby("lab").size() == 1).all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_event_lag(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_lag
    rng = np.random.RandomState(10)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 90, n)],        # ts ties
        "value_e4": rng.randint(-500, 500, n).astype(np.int64),
    }).sample(frac=1.0, random_state=4).reset_index(drop=True)
    got = event_lag(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == n
    s = df.sort_values(["user_id", "ts", "event_id"]).copy()
    us = s["ts"].astype("datetime64[us]").astype("int64")
    g = s.groupby("user_id")
    exp = pd.DataFrame({
        "event_id": s["event_id"],
        "user_id": s["user_id"],
        "prev_id": g["event_id"].shift(1).fillna(-1).astype("int64"),
        "dt_us": (us - us.groupby(s["user_id"]).shift(1)).fillna(-1)
                 .astype("int64"),
        "dv": (s["value_e4"] - g["value_e4"].shift(1)).fillna(0)
              .astype("int64"),
    }).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
    # exactly one sentinel row per key
    assert (got[got.prev_id == -1].groupby("user_id").size() == 1).all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_running_distinct(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_distinct
    rng = np.random.RandomState(11)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 70, n)],        # heavy ts ties
        "event_type": rng.choice(list("abcde"), n).tolist(),
    }).sample(frac=1.0, random_state=5).reset_index(drop=True)
    got = running_distinct(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == n
    s = df.sort_values(["user_id", "ts", "event_id"])
    seen, out = {}, {}
    for uid, lab, eid in zip(s["user_id"], s["event_type"], s["event_id"]):
        seen.setdefault(uid, set()).add(lab)
        out[eid] = len(seen[uid])
    exp = pd.DataFrame({"event_id": df["event_id"],
                        "user_id": df["user_id"],
                        "n_distinct": df["event_id"].map(out)}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # last value per user equals the user's total distinct count
    tail = got.sort_values("event_id").groupby("user_id")["n_distinct"] \
        .max()
    tot = df.groupby("user_id")["event_type"].nunique()
    assert (tail == tot).all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_first_touch_attribution(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import first_touch_attribution
    rng = np.random.RandomState(12)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 15, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        # minute-scale jumps so 30s gap splits sessions frequently
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in np.sort(rng.randint(0, 3000, n))],
        "event_type": rng.choice(["view", "click", "buy"], n).tolist(),
    }).sample(frac=1.0, random_state=6).reset_index(drop=True)
    got = first_touch_attribution(
        rd.from_pandas(df).repartition(nparts), target="buy",
        gap_s=30.0).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)

    # brute walk
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last_us, sid, first = None, -1, None
        for _, r in g.iterrows():
            us = r["ts"].value // 1000  # ns -> us
            if last_us is None or us - last_us > 30_000_000:
                sid += 1
                first = r["event_type"]
            last_us = us
            if r["event_type"] == "buy":
                rows.append((r["event_id"], uid, sid, first))
    exp = pd.DataFrame(rows, columns=["event_id", "user_id",
                                      "session_id", "first_touch"]) \
        .sort_values("event_id").reset_index(drop=True)
    exp = exp.astype({"event_id": "int64", "user_id": "int64",
                      "session_id": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    # the gap cut really fires: multiple sessions exist for some user
    assert (exp.groupby("user_id")["session_id"].max() > 0).any()


@pytest.mark.parametrize("nparts", [1, 4])
def test_time_to_convert(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_to_convert
    rng = np.random.RandomState(21)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    secs = np.sort(rng.randint(0, 3000, n))
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s)) for s in secs],
        "event_type": rng.choice(["view", "click", "buy"], n).tolist(),
    }).sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = time_to_convert(
        rd.from_pandas(df).repartition(nparts), target="buy") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    # brute walk: for each row, scan forward in (ts, event_id) order
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        for i in range(len(g)):
            dt = -1
            for j in range(i + 1, len(g)):
                if g["event_type"][j] == "buy":
                    dt = int(us[j] - us[i])
                    break
            rows.append((int(g["event_id"][i]), uid, dt))
    exp = pd.DataFrame(rows, columns=["event_id", "user_id",
                                      "us_to_convert"]) \
        .sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "user_id": "int64",
                 "us_to_convert": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    assert (exp["us_to_convert"] == -1).any()          # tail sentinel fires
    assert (exp["us_to_convert"] >= 0).any()           # real conversions too


@pytest.mark.parametrize("nparts", [1, 4])
def test_grouped_ols_trend(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_ols_trend
    rng = np.random.RandomState(33)
    n = 300
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 10, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 5000, n)],
        "value_e4": rng.randint(-500, 5000, n).astype(np.int64),
    })
    got = grouped_ols_trend(
        rd.from_pandas(df).repartition(nparts),
        ["user_id"], "ts", "event_id", "value_e4") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    for _, r in got.iterrows():
        g = df[df.user_id == r.user_id].sort_values(["ts", "event_id"])
        y = g["value_e4"].to_numpy().astype(float)
        x = np.arange(1, len(y) + 1, dtype=float)
        slope = np.polyfit(x, y, 1)[0]
        assert r.n == len(y)
        assert abs(r.slope_num / r.slope_den - slope) < 1e-9
    # exact perfectly-linear group: slope must be the exact rational
    lin = pd.DataFrame({
        "user_id": np.full(7, 99, dtype=np.int64),
        "event_id": np.arange(7, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=i) for i in range(7)],
        "value_e4": (3 * np.arange(7) + 11).astype(np.int64)})
    one = grouped_ols_trend(rd.from_pandas(lin), ["user_id"], "ts",
                            "event_id", "value_e4").to_pandas()
    assert one.slope_num[0] * 1 == 3 * one.slope_den[0]


@pytest.mark.parametrize("nparts", [1, 4])
def test_grouped_gini(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_gini
    rng = np.random.RandomState(44)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.randint(0, 10, n).astype(np.int64),
        "value_e4": rng.randint(0, 5000, n).astype(np.int64),
    })
    got = grouped_gini(rd.from_pandas(df).repartition(nparts),
                       ["user_id"], "value_e4") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    for _, r in got.iterrows():
        x = np.sort(df[df.user_id == r.user_id]["value_e4"].to_numpy())
        i = np.arange(1, len(x) + 1)
        num = 2 * int((i * x).sum()) - (len(x) + 1) * int(x.sum())
        assert (r.gini_num, r.gini_den) == (num, len(x) * int(x.sum()))
    # degenerate shapes: all-equal -> gini 0; one-hot -> (n-1)/n
    deg = pd.DataFrame({
        "user_id": np.repeat([1, 2], 5).astype(np.int64),
        "value_e4": np.array([7, 7, 7, 7, 7, 0, 0, 0, 0, 100],
                             dtype=np.int64)})
    g2 = grouped_gini(rd.from_pandas(deg), ["user_id"], "value_e4") \
        .to_pandas().set_index("user_id")
    assert g2.loc[1, "gini_num"] == 0
    assert g2.loc[2, "gini_num"] * 5 == 4 * g2.loc[2, "gini_den"]
    # negative values rejected loudly
    bad = pd.DataFrame({"user_id": np.zeros(2, np.int64),
                        "value_e4": np.array([-1, 5], np.int64)})
    with pytest.raises(Exception, match="nonnegative"):
        grouped_gini(rd.from_pandas(bad), ["user_id"],
                     "value_e4").materialize()


@pytest.mark.parametrize("nparts", [1, 4])
def test_densify_days(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import densify_days
    rng = np.random.RandomState(55)
    n = 200
    t0 = pd.Timestamp("2024-03-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 8, n).astype(np.int64),
        # sparse: 40-day window, many users skip days
        "ts": [t0 + pd.Timedelta(days=int(d), seconds=int(s))
               for d, s in zip(rng.randint(0, 40, n),
                               rng.randint(0, 86400, n))],
    })
    got = densify_days(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values(["user_id", "day"]) \
        .reset_index(drop=True)
    rows = []
    day = df["ts"].astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    bf = pd.DataFrame({"user_id": df.user_id, "day": day})
    for uid, g in bf.groupby("user_id"):
        cnt = g.groupby("day").size()
        for d in range(int(g.day.min()), int(g.day.max()) + 1):
            rows.append((uid, d, int(cnt.get(d, 0))))
    exp = pd.DataFrame(rows, columns=["user_id", "day", "n_events"]) \
        .astype("int64").sort_values(["user_id", "day"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert (exp.n_events == 0).any()        # gaps really get zero-filled
    # outlier span guard fires loudly
    bad = pd.DataFrame({"user_id": np.zeros(2, np.int64),
                        "ts": [pd.Timestamp("1970-01-02"),
                               pd.Timestamp("2024-01-01")]})
    with pytest.raises(Exception, match="max_span"):
        densify_days(rd.from_pandas(bad)).materialize()


@pytest.mark.parametrize("nparts", [1, 4])
def test_bounce_rate(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import bounce_rate
    rng = np.random.RandomState(66)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 15, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in np.sort(rng.randint(0, 3000, n))],
        "event_type": rng.choice(["view", "click", "buy"], n).tolist(),
    }).sample(frac=1.0, random_state=9).reset_index(drop=True)
    got = bounce_rate(rd.from_pandas(df).repartition(nparts),
                      gap_s=30.0).to_pandas() \
        .sort_values("first_touch").reset_index(drop=True)
    sess = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last, cur = None, None
        for _, r in g.iterrows():
            us = r["ts"].value // 1000
            if last is None or us - last > 30_000_000:
                cur = (uid, len(sess))
                sess[cur] = [r["event_type"], 0]
            sess[cur][1] += 1
            last = us
    agg = {}
    for first, sz in sess.values():
        a = agg.setdefault(first, [0, 0])
        a[0] += 1
        a[1] += int(sz == 1)
    exp = pd.DataFrame(
        [(k, v[0], v[1]) for k, v in agg.items()],
        columns=["first_touch", "n_sessions", "n_bounces"]) \
        .astype({"n_sessions": "int64", "n_bounces": "int64"}) \
        .sort_values("first_touch").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got.n_bounces.sum() > 0


@pytest.mark.parametrize("nparts", [1, 4])
def test_leading_digit_counts(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import leading_digit_counts
    rng = np.random.RandomState(77)
    v = rng.randint(1, 10**6, 500).astype(np.int64)
    df = pd.DataFrame({
        "grp": rng.randint(0, 3, 500).astype(np.int64), "x": v})
    got = leading_digit_counts(
        rd.from_pandas(df).repartition(nparts), ["grp"], "x") \
        .to_pandas().sort_values(["grp", "digit"]).reset_index(drop=True)
    lead = np.array([int(str(x)[0]) for x in v], dtype=np.int64)
    exp = pd.DataFrame({"grp": df.grp, "digit": lead}) \
        .groupby(["grp", "digit"], as_index=False).size() \
        .rename(columns={"size": "n"}).astype("int64") \
        .sort_values(["grp", "digit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    bad = pd.DataFrame({"grp": np.zeros(2, np.int64),
                        "x": np.array([0, 5], np.int64)})
    with pytest.raises(Exception, match="positive"):
        leading_digit_counts(rd.from_pandas(bad), ["grp"],
                             "x").materialize()


@pytest.mark.parametrize("nparts", [1, 4])
def test_ks_two_sample(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import ks_two_sample
    rng = np.random.RandomState(88)
    a = rng.randint(0, 200, 300).astype(np.int64)          # uniform-ish
    b = (rng.randint(0, 200, 200) // 2 + 100).astype(np.int64)  # shifted
    df = pd.DataFrame({
        "v": np.concatenate([a, b]),
        "side": ["a"] * len(a) + ["b"] * len(b)})
    got = ks_two_sample(rd.from_pandas(df).repartition(nparts),
                        "v", "side", "a", "b").to_pandas()
    # brute ECDF max-gap on the union support
    sup = np.unique(df.v)
    ca = np.searchsorted(np.sort(a), sup, side="right")
    cb = np.searchsorted(np.sort(b), sup, side="right")
    d_num = int(np.abs(ca * len(b) - cb * len(a)).max())
    assert got.d_num[0] == d_num
    assert got.d_den[0] == len(a) * len(b)
    assert (got.n_a[0], got.n_b[0]) == (len(a), len(b))
    assert 0 < d_num < len(a) * len(b)
    # identical samples -> D = 0; disjoint supports -> D = 1
    same = pd.DataFrame({"v": np.tile(a, 2),
                         "side": ["a"] * len(a) + ["b"] * len(a)})
    g0 = ks_two_sample(rd.from_pandas(same), "v", "side", "a", "b") \
        .to_pandas()
    assert g0.d_num[0] == 0
    disj = pd.DataFrame({"v": np.concatenate([a, a + 10_000]),
                         "side": ["a"] * len(a) + ["b"] * len(a)})
    g1 = ks_two_sample(rd.from_pandas(disj), "v", "side", "a", "b") \
        .to_pandas()
    assert g1.d_num[0] == g1.d_den[0]
    # exchange budget on REAL data: each ranged_prefix_sum materializes
    # its bucketed input (lineage truncation), so the FINAL segment holds
    # exactly one keyed exchange (the second scan's bucket shuffle)
    from pypdfium2_ray.stages.audit import count_exchanges
    assert count_exchanges(
        ks_two_sample(rd.from_pandas(df), "v", "side", "a", "b")) == 1


@pytest.mark.parametrize("nparts", [1, 4])
def test_grouped_cume(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.topk import grouped_cume
    rng = np.random.RandomState(99)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "v": rng.randint(0, 15, n).astype(np.int64),   # heavy ties
    })
    got = grouped_cume(rd.from_pandas(df).repartition(nparts),
                       ["user_id"], "v", "event_id") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    cd_num = []
    for _, r in df.iterrows():
        g = df[df.user_id == r.user_id]
        cd_num.append(int((g.v <= r.v).sum()))
    exp = pd.DataFrame({
        "event_id": df.event_id, "user_id": df.user_id,
        "cd_num": np.array(cd_num, np.int64),
        "cd_den": df.groupby("user_id")["v"].transform("size")
        .astype("int64")})
    pd.testing.assert_frame_equal(got, exp)
    # peers share cd_num; the group's max value has cd_num == cd_den
    m = got.groupby("user_id").apply(
        lambda g: g.loc[g.cd_num.idxmax(), "cd_num"]
        == g.cd_den.iloc[0], include_groups=False)
    assert m.all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_weighted_median(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import weighted_median
    rng = np.random.RandomState(101)
    n = 500
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c"], n).tolist(),
        "v": rng.randint(0, 50, n).astype(np.int64),
        "w": rng.randint(0, 5, n).astype(np.int64),   # zero weights too
    })
    got = weighted_median(rd.from_pandas(df).repartition(nparts),
                          ["grp"], "v", "w") \
        .to_pandas().sort_values("grp").reset_index(drop=True)
    for _, r in got.iterrows():
        g = df[df.grp == r.grp]
        expanded = np.sort(np.repeat(g.v.to_numpy(), g.w.to_numpy()))
        # lower weighted median == element at ceil(W/2)-1 of the expanded
        # multiset (2*cum >= W first crossing)
        exp = int(expanded[(len(expanded) + 1) // 2 - 1])
        assert int(r.wmedian) == exp, r.grp
    assert set(got.grp) == {"a", "b", "c"}
    # negative weights rejected loudly
    bad = pd.DataFrame({"grp": ["a"], "v": [1], "w": [-2]})
    with pytest.raises(Exception, match="nonnegative"):
        weighted_median(rd.from_pandas(bad), ["grp"], "v",
                        "w").materialize()


@pytest.mark.parametrize("nparts", [1, 4])
def test_grouped_type_bitmask(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_type_bitmask
    rng = np.random.RandomState(111)
    n = 300
    bm = {"x": 0, "y": 1, "z": 2}
    df = pd.DataFrame({
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "lab": rng.choice(["x", "y", "z"], n).tolist()})
    got = grouped_type_bitmask(
        rd.from_pandas(df).repartition(nparts), ["user_id"], "lab", bm) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    for _, r in got.iterrows():
        seen = set(df[df.user_id == r.user_id]["lab"])
        mask = sum(1 << bm[s] for s in seen)
        assert (int(r.type_mask), int(r.n_types)) == (mask, len(seen))
    bad = pd.DataFrame({"user_id": [1], "lab": ["q"]})
    with pytest.raises(Exception, match="unmapped"):
        grouped_type_bitmask(rd.from_pandas(bad), ["user_id"], "lab",
                             bm).materialize()


@pytest.mark.parametrize("nparts", [1, 4])
def test_burst_count(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import burst_count
    rng = np.random.RandomState(121)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    secs = rng.randint(0, 600, n)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 10, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s)) for s in secs],
    }).sample(frac=1.0, random_state=11).reset_index(drop=True)
    got = burst_count(rd.from_pandas(df).repartition(nparts),
                      window_s=60.0) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    exp = []
    for i in range(n):
        c = 0
        for j in range(n):
            if df.user_id[j] != df.user_id[i] or j == i:
                continue
            after = (us[j] > us[i]) or (us[j] == us[i]
                                        and df.event_id[j]
                                        > df.event_id[i])
            if after and us[j] - us[i] <= 60_000_000:
                c += 1
        exp.append(c)
    exp_df = pd.DataFrame({
        "event_id": df.event_id, "user_id": df.user_id,
        "n_burst": np.array(exp, np.int64)}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp_df)
    assert got.n_burst.max() > 0
    # the stream's last event per user has zero following bursts
    last = df.sort_values(["ts", "event_id"]).groupby("user_id").tail(1)
    assert (got.set_index("event_id").loc[last.event_id, "n_burst"]
            == 0).all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_trailing_sum(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import trailing_sum
    rng = np.random.RandomState(131)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    secs = rng.randint(0, 600, n)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 10, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s)) for s in secs],
        "value_e4": rng.randint(-100, 500, n).astype(np.int64),
    }).sample(frac=1.0, random_state=13).reset_index(drop=True)
    got = trailing_sum(rd.from_pandas(df).repartition(nparts),
                       window_s=60.0) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    exp = []
    for i in range(n):
        tot = 0
        for j in range(n):
            if df.user_id[j] == df.user_id[i] \
                    and us[i] - 60_000_000 <= us[j] <= us[i]:
                tot += int(df.value_e4[j])   # peers included, RANGE frame
        exp.append(tot)
    exp_df = pd.DataFrame({
        "event_id": df.event_id, "user_id": df.user_id,
        "trail_sum_e4": np.array(exp, np.int64)}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp_df)


@pytest.mark.parametrize("nparts", [1, 4])
def test_active_streak(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import active_streak
    rng = np.random.RandomState(141)
    n = 300
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 10, n).astype(np.int64),
        "ts": [t0 + pd.Timedelta(days=int(d), seconds=int(s))
               for d, s in zip(rng.randint(0, 25, n),
                               rng.randint(0, 86400, n))],
    })
    got = active_streak(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    days = df["ts"].astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    for _, r in got.iterrows():
        d = np.sort(np.unique(days[df.user_id == r.user_id]))
        best = cur = 1
        for i in range(1, len(d)):
            cur = cur + 1 if d[i] - d[i - 1] == 1 else 1
            best = max(best, cur)
        assert (int(r.max_streak), int(r.n_active_days)) \
            == (best, len(d))
    assert got.max_streak.max() > 1        # real streaks exist
    assert (got.max_streak <= got.n_active_days).all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_state_duration(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import state_duration
    rng = np.random.RandomState(151)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(seconds=int(s))
               for s in np.sort(rng.randint(0, 5000, n))],
        "event_type": rng.choice(["a", "b", "c"], n).tolist(),
    }).sample(frac=1.0, random_state=15).reset_index(drop=True)
    got = state_duration(rd.from_pandas(df).repartition(nparts)) \
        .to_pandas().sort_values(["user_id", "event_type"]) \
        .reset_index(drop=True)
    agg = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        labs = g["event_type"].to_numpy()
        for i in range(len(g) - 1):
            a = agg.setdefault((uid, labs[i]), [0, 0])
            a[0] += int(us[i + 1] - us[i])
            a[1] += 1
    exp = pd.DataFrame(
        [(u, l, v[0], v[1]) for (u, l), v in sorted(agg.items())],
        columns=["user_id", "event_type", "dur_us", "n_holds"]) \
        .astype({"user_id": "int64", "dur_us": "int64",
                 "n_holds": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # per user, total time in states == last ts - first ts
    tot = got.groupby("user_id")["dur_us"].sum()
    span = df.groupby("user_id")["ts"].agg(
        lambda s: (s.max() - s.min()).value // 1000)
    assert (tot == span.loc[tot.index]).all()
