"""Consecutive-duplicate run collapse (sessionize.collapse_repeats)."""

import itertools

import pandas as pd
import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.sessionize import collapse_repeats


def _run(rows, parts=2):
    # rows: (user_id, ts_us, event_type, event_id)
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "event_id": pa.array([r[3] for r in rows], pa.int64())})
    with partition_hint(parts):
        out = collapse_repeats(rd.from_arrow(t)).to_pandas()
    return sorted((r.user_id, r.event_type, r.run_len,
                   int(pd.Timestamp(r.first_ts).value // 1000),
                   r.min_event_id) for r in out.itertuples())


def _brute(rows):
    out = []
    srt = sorted(rows, key=lambda r: (r[0], r[1], r[3]))
    for (u, v), grp in itertools.groupby(srt, key=lambda r: (r[0], r[2])):
        grp = list(grp)
        out.append((u, v, len(grp), min(r[1] for r in grp),
                    min(r[3] for r in grp)))
    return sorted(out)


def test_matches_brute_force():
    rows = [(1, 10, "a", 100), (1, 20, "a", 101), (1, 30, "b", 102),
            (1, 40, "a", 103), (2, 10, "a", 200), (2, 20, "a", 201),
            (2, 30, "a", 202), (3, 5, "z", 300)]
    got = _run(rows)
    assert got == _brute(rows)
    # user 1: a-run(2), b-run(1), a-run(1) — the second a-run is separate
    assert [(r[1], r[2]) for r in got if r[0] == 1] == \
        [("a", 1), ("a", 2), ("b", 1)]   # sorted tuples: run_len asc


def test_ties_and_min_aggregates():
    # same ts, ids decide order; min_event_id is an aggregate, not
    # "first row's id"
    rows = [(1, 10, "x", 5), (1, 10, "x", 3), (1, 10, "y", 7)]
    got = _run(rows)
    assert (1, "x", 2, 10, 3) in got and (1, "y", 1, 10, 7) in got


def test_runs_do_not_cross_users():
    rows = [(1, 10, "a", 1), (2, 11, "a", 2), (1, 12, "a", 3)]
    got = _run(rows)
    assert got == [(1, "a", 2, 10, 1), (2, "a", 1, 11, 2)]


def test_partition_invariance():
    rows = [(i % 5, j * 10, "t" + str((i + j) % 2 + 1), i * 100 + j)
            for i in range(10) for j in range(8)]
    assert _run(rows, parts=1) == _run(rows, parts=4) == _brute(rows)
