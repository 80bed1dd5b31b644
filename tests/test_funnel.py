"""Ordered funnel analysis (stages/funnel.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.funnel import funnel

US = 1_000_000


def _events(rows):
    """rows: (user, type, ts_seconds)."""
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us"))})


def _run(rows, parts=2, **kw):
    with partition_hint(parts):
        out = funnel(rd.from_arrow(_events(rows)), **kw).to_pandas()
    return {int(r.user_id): (int(r.stage), int(r.convert_us))
            for r in out.itertuples()}


def test_stages_and_conversion_time():
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full
        (2, "view", 10), (2, "click", 20),                       # stage 2
        (3, "view", 10),                                         # stage 1
        (4, "click", 10), (4, "purchase", 20),                   # no view
    ]
    got = _run(rows)
    assert got[1] == (3, 20 * US)
    assert got[2] == (2, -1)
    assert got[3] == (1, -1)
    assert got[4] == (0, -1)


def test_strict_ordering_required():
    # click BEFORE the first view doesn't count; purchase between view
    # and click doesn't count either
    rows = [(1, "click", 5), (1, "view", 10),
            (1, "purchase", 15), (1, "click", 20)]
    got = _run(rows)
    assert got[1] == (2, -1)        # view@10 -> click@20; no purchase after


def test_earliest_step_chaining():
    # t1 is the EARLIEST view; a later view doesn't reset the chain
    rows = [(1, "view", 10), (1, "view", 100),
            (1, "click", 50), (1, "purchase", 60)]
    assert _run(rows)[1] == (3, 50 * US)


def test_equal_timestamp_is_not_after():
    rows = [(1, "view", 10), (1, "click", 10)]
    assert _run(rows)[1] == (1, -1)


def test_non_step_users_excluded():
    rows = [(1, "view", 10), (2, "error", 10)]
    got = _run(rows)
    assert 2 not in got and got[1] == (1, -1)


def test_partition_invariance():
    rows = [(u, t, u * 100 + i * 7)
            for u in range(30)
            for i, t in enumerate(["view", "click", "purchase", "click"])
            if (u + i) % 3]

    def run(parts, blocks):
        ds = rd.from_arrow(_events(rows)).repartition(blocks)
        with partition_hint(parts):
            return sorted(map(tuple, funnel(ds).to_pandas().to_numpy()))

    assert run(1, 1) == run(4, 5)


def test_validation():
    with pytest.raises(ValueError):
        funnel(rd.from_arrow(_events([(1, "view", 1)])),
               steps=("a", "a"))
