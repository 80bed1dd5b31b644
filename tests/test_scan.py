"""Distributed prefix sum / sequence packing (stages/scan.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.scan import pack_offsets, ranged_prefix_sum


def test_prefix_sum_matches_cumsum(ray_session):
    rng = np.random.default_rng(2)
    keys = rng.permutation(200)          # arbitrary input order
    vals = rng.integers(0, 50, 200)
    t = pa.table({"k": keys, "v": vals, "tag": [f"t{k}" for k in keys]})
    with partition_hint(3):
        out = ranged_prefix_sum(rd.from_arrow(t).repartition(5), "k", "v") \
            .to_pandas().sort_values("k")
    by_key = dict(zip(keys, vals))
    expect = np.cumsum([by_key[k] for k in sorted(by_key)])
    expect = np.concatenate(([0], expect[:-1]))
    np.testing.assert_array_equal(out["cum_prev"].to_numpy(), expect)
    # payload rides along
    assert list(out["tag"]) == [f"t{k}" for k in sorted(by_key)]


def test_prefix_sum_partition_invariant_and_sparse_keys(ray_session):
    keys = [5, 1000000, 17, 42, -3]
    vals = [10, 1, 7, 0, 2]
    t = pa.table({"k": keys, "v": vals})

    def run(parts, hint):
        with partition_hint(hint):
            return ranged_prefix_sum(
                rd.from_arrow(t).repartition(parts), "k", "v") \
                .to_pandas().sort_values("k").cum_prev.tolist()

    assert run(1, 2) == run(4, 6) == [0, 2, 12, 19, 19]


def test_pack_offsets_examples(ray_session):
    # lengths 600,600,600 at key order -> starts 0,600,1200;
    # example_len 1024: doc0 spans ex0, doc1 spans ex0-1, doc2 ex1
    t = pa.table({"doc_id": [0, 1, 2], "n_chars": [600, 600, 600]})
    with partition_hint(2):
        out = pack_offsets(rd.from_arrow(t), example_len=1024) \
            .to_pandas().sort_values("doc_id")
    assert out.start_off.tolist() == [0, 600, 1200]
    assert out.first_example.tolist() == [0, 0, 1]
    assert out.last_example.tolist() == [0, 1, 1]


def test_prefix_sum_empty(ray_session):
    t = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    with partition_hint(2):
        out = ranged_prefix_sum(rd.from_arrow(t), "k", "v").to_pandas()
    assert len(out) == 0


def test_sampled_boundaries_exact_and_balanced(ray_session):
    """Zipf-skewed keys: sampled boundaries keep the prefix sum exact
    AND spread buckets where the linear min/max map collapses."""
    import numpy as np
    import ray.data as rd

    from pypdfium2_ray.stages.scan import (ranged_prefix_sum,
                                           sample_boundaries)
    rng = np.random.RandomState(5)
    # zipf body + one far outlier => linear span is dominated by the tail
    keys = np.unique(rng.zipf(1.3, 4000).astype(np.int64))
    keys = np.concatenate([keys, [10_000_000]])
    t = pa.table({"k": keys,
                  "v": np.ones(len(keys), np.int64)})
    ds = rd.from_arrow(t).repartition(4)

    cuts = sample_boundaries(ds, "k", n_buckets=8, modulus=4)
    got = ranged_prefix_sum(ds, "k", "v", out="r", boundaries=cuts) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert (got["r"].to_numpy() == np.arange(len(keys))).all()

    # balance: the linear map sends every non-outlier row to bucket 0
    lo, hi, n = int(keys.min()), int(keys.max()), 8
    linear = (keys - lo) * n // (hi - lo + 1)
    sampled = np.searchsorted(cuts, keys, side="right")
    assert np.bincount(linear, minlength=n).max() >= len(keys) - 1
    assert np.bincount(sampled, minlength=n).max() < len(keys) / 2


def test_sample_boundaries_deterministic(ray_session):
    import numpy as np
    import ray.data as rd

    from pypdfium2_ray.stages.scan import sample_boundaries
    t = pa.table({"k": np.arange(2000, dtype=np.int64)})
    a = sample_boundaries(rd.from_arrow(t), "k", 8, modulus=4)
    b = sample_boundaries(rd.from_arrow(t).repartition(7), "k", 8,
                          modulus=4)
    assert (a == b).all()


def test_sample_boundaries_cap(ray_session):
    import numpy as np
    import pytest
    import ray.data as rd

    from pypdfium2_ray.stages.scan import sample_boundaries
    t = pa.table({"k": np.arange(500, dtype=np.int64)})
    with pytest.raises(ValueError, match="max_sample"):
        sample_boundaries(rd.from_arrow(t), "k", 4, modulus=1,
                          max_sample=100)
