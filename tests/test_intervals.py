"""Interval coverage / islands merge (stages/intervals.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.intervals import interval_coverage


def _t(rows):
    return pa.table({"key": pa.array([r[0] for r in rows], pa.int64()),
                     "s": pa.array([r[1] for r in rows], pa.int64()),
                     "e": pa.array([r[2] for r in rows], pa.int64())})


def _run(rows, parts=2):
    with partition_hint(parts):
        out = interval_coverage(rd.from_arrow(_t(rows))).to_pandas()
    return {int(r.key): (int(r.n_islands), int(r.covered))
            for r in out.itertuples()}


def test_overlap_touch_and_gap():
    rows = [(1, 0, 10), (1, 5, 20),      # overlap -> one island [0,20]
            (1, 20, 30),                 # touching -> still merged
            (1, 31, 40),                 # gap -> second island [31,40]
            (2, 0, 5)]
    got = _run(rows)
    assert got[1] == (2, 30 + 9)
    assert got[2] == (1, 5)


def test_contained_interval_and_running_max():
    # [0,100] contains [10,20]; [50,60] also inside; then gap
    rows = [(1, 0, 100), (1, 10, 20), (1, 50, 60), (1, 150, 160)]
    assert _run(rows)[1] == (2, 100 + 10)


def test_zero_length_and_duplicates():
    rows = [(1, 5, 5), (1, 5, 5), (1, 6, 6)]
    # [5,5] twice merges; 6 > 5 -> new island; both zero-length
    assert _run(rows)[1] == (2, 0)


def test_negative_interval_rejected():
    import ray.exceptions
    with pytest.raises(ray.exceptions.RayTaskError):
        _run([(1, 10, 5)])


def test_partition_invariance():
    rows = [((i * 7) % 5, (i * 13) % 50, (i * 13) % 50 + (i % 9))
            for i in range(120)]

    def run(parts, blocks):
        ds = rd.from_arrow(_t(rows)).repartition(blocks)
        with partition_hint(parts):
            return sorted(map(tuple,
                              interval_coverage(ds).to_pandas().to_numpy()))

    assert run(1, 1) == run(4, 6)


def test_matches_duckdb_islands(tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    rows = [((i * 3) % 4, (i * 11) % 40, (i * 11) % 40 + (i % 7) * 3)
            for i in range(60)]
    p = tmp_path / "iv.parquet"
    pq.write_table(_t(rows), p)
    orc = duckdb.sql(f"""
        WITH iv AS (SELECT * FROM read_parquet('{p}')),
        m AS (SELECT key, s, e,
                     CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                          THEN 1 ELSE 0 END AS ni
              FROM iv WINDOW w AS (PARTITION BY key ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING)),
        isl AS (SELECT key, s, e, sum(ni) OVER (PARTITION BY key
                       ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
                FROM m),
        per AS (SELECT key, island, max(e) - min(s) AS cov FROM isl
                GROUP BY key, island)
        SELECT key, count(*)::BIGINT, sum(cov)::BIGINT FROM per
        GROUP BY key""").fetchall()
    got = _run(rows)
    assert got == {k: (n, c) for k, n, c in orc}


def test_overlap_join(ray_session):
    """Cross-side overlap pairs vs brute force: boundary touch (a.e ==
    b.s) is NOT an overlap; same-side overlaps excluded; deep stacks
    (one interval overlapping many) fully enumerated."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.intervals import overlap_join
    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame({
        "key": rng.randint(0, 5, n),
        "s": rng.randint(0, 1000, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64)})
    df["e"] = df["s"] + rng.randint(1, 200, n)
    df["side"] = (df["id"] % 2).astype(np.int8)
    exp = set()
    for _, a in df[df.side == 0].iterrows():
        for _, b in df[df.side == 1].iterrows():
            if a.key == b.key and a.s < b.e and b.s < a.e:
                exp.add((a.id, b.id))
    for parts in (1, 4):
        with partition_hint(3):
            out = overlap_join(rd.from_pandas(df).repartition(parts),
                               "key", "s", "e", "side", "id").to_pandas()
        got = set(zip(out.id_a, out.id_b))
        assert got == exp and len(out) == len(got)
    # boundary: touching intervals don't pair
    t = pd.DataFrame({"key": [1, 1], "s": [0, 10], "e": [10, 20],
                      "id": [0, 1], "side": np.array([0, 1], np.int8)})
    with partition_hint(2):
        out = overlap_join(rd.from_pandas(t), "key", "s", "e",
                           "side", "id").to_pandas()
    assert len(out) == 0
