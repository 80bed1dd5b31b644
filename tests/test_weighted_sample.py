"""Deterministic weighted sampling (textstats.weighted_hash_sample)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.functions.sketch import md5_hash64
from pypdfium2_ray.stages.textstats import weighted_hash_sample


def _run(rows, k, parts=3):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "w": pa.array([r[1] for r in rows], pa.int64())})
    ds = rd.from_arrow(t).repartition(parts)
    out = weighted_hash_sample(ds, "doc_id", "w", k).to_pandas()
    return sorted(zip(out["doc_id"], out["w"]))


def _brute(rows, k):
    pri = {d: min(md5_hash64(f"{d}:{j}".encode()) for j in range(w))
           for d, w in rows}
    win = sorted(rows, key=lambda r: (pri[r[0]], r[0]))[:k]
    return sorted(win)


ROWS = [(i, 1 + i % 5) for i in range(200)]


def test_matches_brute_force_bottom_k():
    assert _run(ROWS, 25) == _brute(ROWS, 25)


def test_weight_one_equals_plain_bottom_k():
    rows = [(i, 1) for i in range(50)]
    assert _run(rows, 10) == _brute(rows, 10)


def test_higher_weight_raises_inclusion():
    # one heavy row among many light ones: its min over 64 draws is
    # almost surely small enough to enter a k=40-of-400 sample
    rows = [(i, 1) for i in range(400)] + [(999, 64)]
    got = _run(rows, 40)
    assert (999, 64) in got
    assert got == _brute(rows, 40)


def test_k_exceeds_population_and_partition_invariance():
    assert _run(ROWS[:7], 100) == sorted(ROWS[:7])
    assert _run(ROWS, 25, parts=1) == _run(ROWS, 25, parts=6)


def test_validation():
    # weight checks happen inside Ray tasks -> RayTaskError(ValueError)
    with pytest.raises(Exception, match="positive integer"):
        _run([(1, 0)], 1)          # zero weight
    with pytest.raises(Exception, match="MAX_SAMPLE_WEIGHT"):
        _run([(1, 65)], 1)         # above MAX_SAMPLE_WEIGHT
    with pytest.raises(ValueError):
        _run([(1, 1)], 0)          # bad k (raised eagerly on the driver)
