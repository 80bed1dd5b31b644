"""Bucketed table digest (stages/digest): partition invariance, diff
localization, multiset (not set) sensitivity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _t(ids):
    return pa.table({"id": pa.array(ids, pa.int64()),
                     "v": pa.array([i % 7 for i in ids], pa.int64())})


def _digest(ds):
    from pypdfium2_ray.stages.digest import table_digest
    return table_digest(ds, ["id", "v"], n_buckets=16).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)


def test_partition_invariance(ray_session):
    import ray.data as rd
    t = _t(range(500))
    a = _digest(rd.from_arrow(t))
    b = _digest(rd.from_arrow(t).repartition(9))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 16 and a["n_rows"].sum() == 500


def test_diff_localizes_to_buckets(ray_session):
    import ray.data as rd
    from pypdfium2_ray.functions.sketch import md5_hash64
    base = list(range(500))
    a = _digest(rd.from_arrow(_t(base)))
    b = _digest(rd.from_arrow(_t(base[:-1] + [999])))   # one row differs
    neq = (a["n_rows"] != b["n_rows"]) | (a["xor_hash"] != b["xor_hash"])
    changed = set(a["bucket"][neq])
    want = {md5_hash64(b"499|2") % 16, md5_hash64(b"999|5") % 16}
    assert changed == want


def test_duplicate_rows_do_not_cancel(ray_session):
    """A row present an EVEN number of times on one side and absent on
    the other XORs to the same value — the per-bucket count is the
    guard that still catches it."""
    import ray.data as rd
    a = _digest(rd.from_arrow(_t([1, 2])))
    b = _digest(rd.from_arrow(_t([1, 2, 3, 3])))        # 3 twice: XOR-blind
    assert (a["xor_hash"] == b["xor_hash"]).all()       # the blind spot
    assert not a.equals(b)                              # counts differ
    assert (a["n_rows"].sum() + 2) == b["n_rows"].sum()


def test_single_block_zero_rows(ray_session):
    """A zero-row BLOCK still digests to the full 16 zero buckets (a
    fully empty DATASET loses its schema in Ray's zero-block plan — the
    documented engine-wide gotcha — so the contract is per-block)."""
    import ray.data as rd
    both = rd.from_arrow(_t([])).union(rd.from_arrow(_t([5])))
    d = _digest(both)
    assert len(d) == 16 and d["n_rows"].sum() == 1
