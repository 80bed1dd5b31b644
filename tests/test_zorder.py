"""Z-order layout keys (stages/zorder.py)."""

import numpy as np
import pyarrow as pa
import pytest

from pypdfium2_ray.stages.zorder import (
    add_zorder_key, sql_zorder_key, zorder_key)


def test_zorder_matches_naive_and_sql():
    import duckdb
    rng = np.random.RandomState(3)
    a = rng.randint(0, 1 << 16, 200).astype(np.int64)
    b = rng.randint(0, 1 << 16, 200).astype(np.int64)
    z = zorder_key(a, b)
    # naive per-bit reference
    want = np.zeros(200, np.int64)
    for i in range(16):
        want |= (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
    assert (z == want).all()
    con = duckdb.connect()
    con.register("t", pa.table({"a": a, "b": b}))
    got = con.execute(
        f"SELECT {sql_zorder_key('a', 'b')} FROM t").fetchnumpy()
    assert (next(iter(got.values())).astype(np.int64) == z).all()


def test_zorder_locality_beats_single_sort():
    """Sorting by z-key keeps BOTH dimensions locally clustered: mean
    adjacent |delta| in b is far smaller than under a sort by a alone."""
    rng = np.random.RandomState(7)
    a = rng.randint(0, 1 << 12, 5000).astype(np.int64)
    b = rng.randint(0, 1 << 12, 5000).astype(np.int64)
    z = zorder_key(a, b, bits=12)
    zo = np.argsort(z, kind="stable")
    ao = np.argsort(a, kind="stable")
    d_b_z = np.abs(np.diff(b[zo])).mean()
    d_b_a = np.abs(np.diff(b[ao])).mean()
    d_a_z = np.abs(np.diff(a[zo])).mean()
    assert d_b_z < d_b_a / 4          # b stays clustered under z
    assert d_a_z < np.abs(np.diff(a[rng.permutation(5000)])).mean() / 4


def test_add_zorder_key_stage(ray_session):
    import ray.data as rd
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64()),
                  "y": pa.array([4, 5, 6], pa.int64())})
    out = add_zorder_key(rd.from_arrow(t), "x", "y").to_pandas()
    want = zorder_key(np.array([1, 2, 3]), np.array([4, 5, 6]))
    assert out["zkey"].tolist() == want.tolist()


def test_zorder_bits_guard():
    with pytest.raises(ValueError):
        zorder_key(np.array([1]), np.array([1]), bits=32)
