"""Value-window sorted-neighborhood blocking (stages/blocking.py)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.blocking import (fingerprint_window_pairs,
                                           value_window_pairs)
from pypdfium2_ray.stages.exchange import partition_hint


def _pairs(vals: dict[int, int], delta: int, width: int = 1000,
           parts=2, **kw) -> set[tuple[int, int, int]]:
    t = pa.table({"rid": pa.array(list(vals), pa.int64()),
                  "skey": pa.array(list(vals.values()), pa.int64())})
    with partition_hint(parts):
        out = value_window_pairs(rd.from_arrow(t), "rid", "skey", delta,
                                 bucket_width=width, **kw).to_pandas()
    if out.empty:
        return set()
    got = list(zip(out["id_a"], out["id_b"], out["fp_dist"]))
    assert len(got) == len(set(got)), "pair emitted more than once"
    return set(got)


def _brute(vals: dict[int, int], delta: int) -> set[tuple[int, int, int]]:
    return {(min(i, j), max(i, j), abs(vals[i] - vals[j]))
            for i, j in itertools.combinations(vals, 2)
            if abs(vals[i] - vals[j]) <= delta}


def test_window_boundary_is_inclusive():
    vals = {1: 0, 2: 100, 3: 101}
    assert _pairs(vals, delta=100) == {(1, 2, 100), (2, 3, 1)}


def test_cross_bucket_pairs_via_halo():
    # width 1000: 995 and 1005 live in different buckets, 10 apart
    vals = {1: 995, 2: 1005, 3: 1990, 4: 2005}
    assert _pairs(vals, delta=100) == _brute(vals, 100)


def test_equal_keys_all_pair():
    vals = {1: 50, 2: 50, 3: 50, 4: 999_999}
    assert _pairs(vals, delta=0) == {(1, 2, 0), (1, 3, 0), (2, 3, 0)}


def test_negative_keys_and_extremes():
    imin = np.iinfo(np.int64).min
    imax = np.iinfo(np.int64).max
    vals = {1: imin, 2: imin + 5, 3: -3, 4: 4, 5: imax - 2, 6: imax}
    assert _pairs(vals, delta=10, width=1 << 56) == _brute(vals, 10)


def test_matches_brute_force_random_and_partition_invariant():
    rng = np.random.RandomState(7)
    vals = {i: int(v) for i, v in
            enumerate(rng.randint(-5000, 5000, size=300))}
    want = _brute(vals, 37)
    assert _pairs(vals, 37, width=500, parts=1) == want
    assert _pairs(vals, 37, width=500, parts=5) == want
    assert _pairs(vals, 37, width=37, parts=3) == want  # W == delta edge


def test_truncation_is_loud(caplog):
    # kernel-level (the warning fires inside Ray workers in the full
    # pipeline, invisible to driver-side caplog)
    from pypdfium2_ray.stages.blocking import _window_kernel
    t = pa.table({"bucket": pa.array([0] * 20, pa.int64()),
                  "rid": pa.array(list(range(20)), pa.int64()),
                  "skey": pa.array([0] * 20, pa.int64()),
                  "native": pa.array([True] * 20)})
    with caplog.at_level("WARNING", logger="pypdfium2_ray.stages.blocking"):
        out = _window_kernel(5, 3)(t)
    assert any("value-window truncation" in r.message for r in caplog.records)
    # each native row pairs with at most its 3 nearest predecessors
    assert out.num_rows == sum(min(j, 3) for j in range(20))


def test_fingerprint_pairs_match_brute_force():
    from pypdfium2_ray.functions.sketch import simhash64, word_ngrams
    texts = {i: f"doc {i} " + " ".join(
        f"w{(i * 7 + k) % 23}" for k in range(30)) for i in range(120)}
    fp = {i: (simhash64(word_ngrams(t, 3)) ^ (1 << 63)) - (1 << 63)
          for i, t in texts.items()}
    delta = 1 << 58                      # wide window => non-empty pair set
    want = _brute(fp, delta)
    assert want, "fixture should produce at least one candidate pair"
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())})
    with partition_hint(2):
        out = fingerprint_window_pairs(
            rd.from_arrow(t), delta=delta, bucket_width=1 << 59).to_pandas()
    got = set(zip(out["id_a"], out["id_b"], out["fp_dist"]))
    assert got == want


def test_delta_bigger_than_bucket_rejected():
    t = pa.table({"rid": pa.array([1], pa.int64()),
                  "skey": pa.array([0], pa.int64())})
    with pytest.raises(ValueError, match="one-bucket halo"):
        value_window_pairs(rd.from_arrow(t), "rid", "skey",
                           delta=1000, bucket_width=10)
