"""Unit tests for the custom operators Ray Data lacks: as-of join and
tumbling-window aggregation (stages/asof, stages/window)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=300, users=12, seed=9):
    rng = np.random.RandomState(seed)
    ts = np.sort(rng.randint(0, 10_000_000, n)).astype("int64")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.randint(0, users, n).astype(np.int64)),
        "ts": pa.array(ts * 1000, pa.timestamp("us")),
        "value": pa.array(rng.uniform(0, 10, n)),
    })


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.asof import asof_join
    t = _events()
    df = t.to_pandas()
    left = df[df["event_id"] % 2 == 0][["event_id", "user_id", "ts"]]
    right = df[df["event_id"] % 2 == 1].rename(
        columns={"event_id": "r_id", "value": "r_value"})[
        ["r_id", "user_id", "ts", "r_value"]]

    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(3),
        by="user_id", on="ts").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=False)
    exp = exp[exp["r_id"].notna()].sort_values("event_id").reset_index(drop=True)

    assert list(got["event_id"]) == list(exp["event_id"])
    assert list(got["r_id"].astype("int64")) == list(exp["r_id"].astype("int64"))
    # the matched right row is strictly earlier and the latest such
    merged = got.merge(df[["event_id", "ts"]], left_on="r_id",
                       right_on="event_id", suffixes=("", "_r"))
    assert (merged["ts_r"] < merged["ts"]).all()


def test_asof_join_left_keeps_unmatched(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.asof import asof_join
    left = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "k": pa.array([7, 8], pa.int64()),
                     "ts": pa.array([100, 200], pa.timestamp("us"))})
    right = pa.table({"k": pa.array([7], pa.int64()),
                      "ts": pa.array([50], pa.timestamp("us")),
                      "rv": pa.array([1.5])})
    inner = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      by="k", on="ts").to_pandas()
    assert list(inner["id"]) == [1]
    outer = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      by="k", on="ts", join_type="left").to_pandas()
    assert sorted(outer["id"]) == [1, 2]
    assert outer.loc[outer["id"] == 2, "rv"].isna().all()


def test_tumbling_window_matches_pandas(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.window import tumbling_window
    t = _events()
    got = tumbling_window(rd.from_arrow(t).repartition(5), "ts", "minute",
                          aggs={"n": (None, "count"), "sv": ("value", "sum")}) \
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    df = t.to_pandas()
    df["window_start"] = df["ts"].dt.floor("min")
    exp = df.groupby("window_start", as_index=False).agg(
        n=("value", "size"), sv=("value", "sum")) \
        .sort_values("window_start").reset_index(drop=True)
    assert list(got["window_start"]) == list(exp["window_start"])
    assert list(got["n"]) == list(exp["n"])
    assert np.allclose(got["sv"], exp["sv"])


def test_tumbling_window_bad_unit():
    from pypdfium2_ray.stages.window import tumbling_window
    with pytest.raises(ValueError):
        tumbling_window(None, "ts", "fortnight")


def test_range_join(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.rangejoin import range_join
    intervals = pa.table({"bucket": pa.array([0, 1, 2], pa.int64()),
                          "lo": [0.0, 10.0, 20.0],
                          "hi": [10.0, 20.0, 30.0]})
    rows = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                     "v": [5.0, 10.0, 19.99, 35.0, -1.0]})
    got = range_join(rd.from_arrow(rows).repartition(2), intervals,
                     value_col="v").to_pandas().sort_values("id")
    assert dict(zip(got["id"], got["bucket"])) == {1: 0, 2: 1, 3: 1}
    left = range_join(rd.from_arrow(rows), intervals, value_col="v",
                      join_type="left").to_pandas().sort_values("id")
    assert len(left) == 5
    assert left.loc[left["id"] == 4, "bucket"].isna().all()


def test_range_join_rejects_overlap(ray_session):
    import pytest as _pt
    import ray.data as rd
    from pypdfium2_ray.stages.rangejoin import range_join
    bad = pa.table({"bucket": pa.array([0, 1], pa.int64()),
                    "lo": [0.0, 5.0], "hi": [10.0, 15.0]})
    rows = pa.table({"id": pa.array([1], pa.int64()), "v": [1.0]})
    with _pt.raises(Exception):
        range_join(rd.from_arrow(rows), bad, value_col="v").to_pandas()


def test_asof_join_preserves_big_int64_ids(ray_session):
    """int64 ids beyond 2^53 must survive (no float64 widening)."""
    import ray.data as rd
    from pypdfium2_ray.stages.asof import asof_join
    big = 9_223_372_036_854_775_000   # near int64 max, not float-representable
    left = pa.table({"id": pa.array([big + 1, big + 2], pa.int64()),
                     "k": pa.array([1, 1], pa.int64()),
                     "ts": pa.array([100, 200], pa.timestamp("us"))})
    right = pa.table({"rid": pa.array([big + 3], pa.int64()),
                      "k": pa.array([1], pa.int64()),
                      "ts": pa.array([50], pa.timestamp("us"))})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    by="k", on="ts").to_pandas().sort_values("id")
    assert list(out["id"]) == [big + 1, big + 2]
    assert list(out["rid"]) == [big + 3, big + 3]


def test_sessionize(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import sessionize
    base = 1_700_000_000_000_000  # us
    t = pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        # user 1: gaps 10min, 40min (new session), 5min; user 2: one gap 2h
        "ts": pa.array([base, base + 600_000_000, base + 3_000_000_000,
                        base + 3_300_000_000, base, base + 7_200_000_000],
                       pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t).repartition(3), gap_s=1800) \
        .to_pandas().sort_values("event_id")
    assert list(out["session_id"]) == [0, 0, 1, 1, 0, 1]


def test_bpe_token_count_parity_and_sanity():
    import duckdb
    from pypdfium2_ray.functions.text import bpe_token_count, sql_bpe_token_count
    texts = pa.array(["Hello world, it's 2024!", "don't stop", "", "   ", "a1b2"])
    ours = bpe_token_count(texts).to_pylist()
    con = duckdb.connect(); con.register("t", pa.table({"text": texts}))
    theirs = [r[0] for r in con.sql(
        f"SELECT {sql_bpe_token_count('text')} FROM t").fetchall()]
    assert ours == theirs
    assert ours[0] >= 6          # Hello/world/,/it/'s/2024/!
    assert ours[2] == 0


def test_hopping_window_counts(ray_session):
    """Each event must land in exactly size/hop windows, counts matching a
    brute-force pandas fan-out."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.window import hopping_window
    rng = np.random.RandomState(9)
    ts = pd.to_datetime(rng.randint(0, 3600 * 24, size=400), unit="s")
    t = pa.table({"ts": pa.array(ts.astype("datetime64[us]")),
                  "v": pa.array(rng.rand(400))})
    out = hopping_window(rd.from_arrow(t).repartition(4), "ts",
                         size_s=7200, hop_s=3600,
                         aggs={"n": (None, "count"), "s": ("v", "sum")}
                         ).to_pandas()
    assert out["n"].sum() == 800                     # 2 windows per event
    # brute force
    df = t.to_pandas()
    rows = []
    for k in (0, 1):
        w = df["ts"].dt.floor("h") - pd.Timedelta(hours=k)
        rows.append(pd.DataFrame({"window_start": w, "v": df["v"]}))
    exp = (pd.concat(rows).groupby("window_start")
           .agg(n=("v", "size"), s=("v", "sum")).reset_index())
    got = out.sort_values("window_start").reset_index(drop=True)
    exp = exp.sort_values("window_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["window_start", "n"]],
                                  exp[["window_start", "n"]],
                                  check_dtype=False)
    assert np.allclose(got["s"], exp["s"])


def test_hopping_window_validates_hop():
    import pytest
    from pypdfium2_ray.stages.window import hopping_window
    with pytest.raises(ValueError):
        hopping_window(None, "ts", size_s=100, hop_s=33)


def test_winnow_min_hash():
    import duckdb
    from pypdfium2_ray.functions.sketch import winnow_min_hash
    m, n = winnow_min_hash("hello world rolling hash", k=8)
    assert winnow_min_hash("hello world rolling hash", k=8) == (m, n)
    assert n == len("hello world rolling hash") - 8 + 1
    assert winnow_min_hash("", k=8) == (None, 0)
    assert winnow_min_hash("   \t ", k=8) == (None, 0)
    assert winnow_min_hash("tiny", k=8)[1] == 1      # whole-text window
    # whitespace-collapse normalization
    assert winnow_min_hash("a  b\tc", k=3) == winnow_min_hash("a b c", k=3)
    # SQL twin agreement on one value
    con = duckdb.connect()
    got = con.execute(
        "select min(md5_number_upper(s) >> 1) from "
        "(select unnest([substr('hello world rolling hash', i, 8) "
        " for i in range(1, 18)]) as s)").fetchone()[0]
    assert got == m


def test_hopping_window_nanosecond_input(ray_session):
    """timestamp[ns] inputs must produce the same windows as timestamp[us]
    (the raw int64 view is unit-dependent; the kernel normalizes)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.window import hopping_window
    ts = pd.to_datetime([3600, 3700, 7201], unit="s")
    t_ns = pa.table({"ts": pa.array(ts.astype("datetime64[ns]")),
                     "v": [1.0, 2.0, 3.0]})
    t_us = pa.table({"ts": pa.array(ts.astype("datetime64[us]")),
                     "v": [1.0, 2.0, 3.0]})

    def run(t):
        return (hopping_window(rd.from_arrow(t), "ts", 7200, 3600,
                               aggs={"n": (None, "count")})
                .to_pandas().sort_values("window_start")
                .reset_index(drop=True))

    a, b = run(t_ns), run(t_us)
    pd.testing.assert_frame_equal(a, b)
    assert a["n"].sum() == 6


def test_rolling_window_sum_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.window import rolling_window_sum

    rng = np.random.default_rng(4)
    rows = set()
    while len(rows) < 300:
        rows.add((int(rng.integers(0, 12)), int(rng.integers(0, 40))))
    rows = sorted(rows)
    keys = np.array([r[0] for r in rows])
    days = np.array([r[1] for r in rows])
    vals = rng.integers(1, 9, len(rows))
    t = pa.table({"k": keys, "d": days, "v": vals})
    with partition_hint(3):
        out = rolling_window_sum(rd.from_arrow(t).repartition(4),
                                 "k", "d", "v", window=7) \
            .to_pandas().set_index(["k", "d"]).rolling_sum
    for (k, d, v) in zip(keys, days, vals):
        exp = sum(int(vv) for kk, dd, vv in zip(keys, days, vals)
                  if kk == k and d - 6 <= dd <= d)
        assert out.loc[(k, d)] == exp


def test_rolling_window_low_t_never_crosses_key(ray_session):
    # t < window at the head of a key's range must not borrow from the
    # previous key (the composite-key spacing guarantee)
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.window import rolling_window_sum

    t = pa.table({"k": [1, 1, 2], "d": [3, 4, 0], "v": [5, 5, 7]})
    with partition_hint(1):
        out = rolling_window_sum(rd.from_arrow(t), "k", "d", "v",
                                 window=7).to_pandas()
    got = {(r.k, r.d): r.rolling_sum for r in out.itertuples()}
    assert got == {(1, 3): 5, (1, 4): 10, (2, 0): 7}


def test_gap_stats(ray_session):
    import pandas as pd
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.sessionize import gap_stats
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [t0, t0 + 5 * s, t0 + 5 * s,    # gaps 5s, 0s (tie)
               t0 + 9 * s, t0 + 2 * s,        # unsorted input: gap 7s
               t0]})                          # single event: no row
    for parts in (1, 4):
        with partition_hint(2):
            out = gap_stats(rd.from_pandas(df).repartition(parts)) \
                .to_pandas()
        got = {r.user_id: (r.n_gaps, r.min_gap_us, r.max_gap_us,
                           r.sum_gap_us) for r in out.itertuples()}
        assert got == {1: (2, 0, 5_000_000, 5_000_000),
                       2: (1, 7_000_000, 7_000_000, 7_000_000)}


def test_transition_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.sessionize import transition_counts
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_id": [10, 11, 12, 20, 21, 30],
        # u1: a->b->a ; u2 out of order in input: b then a by ts
        "ts": [t0, t0 + s, t0 + 2 * s, t0 + 5 * s, t0 + 4 * s, t0],
        "event_type": ["a", "b", "a", "b", "a", "a"]})
    for parts in (1, 4):
        with partition_hint(2):
            out = transition_counts(
                rd.from_pandas(df).repartition(parts)).to_pandas()
        got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
        # u2 sorted by ts: a(21) -> b(20); u3 single event contributes 0
        assert got == {("a", "b"): 2, ("b", "a"): 1}
