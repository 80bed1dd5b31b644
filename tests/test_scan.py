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
