"""The all-empty ``to_pandas`` column fix (stages/raypatch.py).

Ray 2.49 defect (VERDICT r4 "What's wrong #1"): ``Dataset.to_pandas()``
on an all-empty dataset returns a 0-column frame even when every block
is typed.  The guarded wrapper rebuilds the empty frame from the cached
schema; non-empty datasets take the stock path byte-for-byte.
"""

import pyarrow as pa
import pytest

from pypdfium2_ray.stages import raypatch


@pytest.fixture(autouse=True)
def _installed(ray_session):
    raypatch.install()


def test_all_empty_typed_block_keeps_columns(ray_session):
    import ray.data as rd
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    df = rd.from_arrow(schema.empty_table()).to_pandas()
    assert list(df.columns) == ["a", "b"]
    assert len(df) == 0
    assert str(df["a"].dtype) == "int64"


def test_all_empty_after_filter_keeps_columns(ray_session):
    """The realistic shape: a typed pipeline whose filter drops all rows."""
    import ray.data as rd
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64()),
                  "y": pa.array(["a", "b", "c"])})
    ds = rd.from_arrow(t).map_batches(
        lambda b: b.filter(pa.array([False] * len(b))),
        batch_format="pyarrow")
    df = ds.to_pandas()
    assert list(df.columns) == ["x", "y"]
    assert len(df) == 0


def test_non_empty_unchanged(ray_session):
    import ray.data as rd
    t = pa.table({"x": [1, 2, 3]})
    df = rd.from_arrow(t).to_pandas()
    assert list(df.columns) == ["x"]
    assert df["x"].tolist() == [1, 2, 3]


def test_install_idempotent(ray_session):
    from ray.data import Dataset
    before = Dataset.to_pandas
    raypatch.install()
    raypatch.install()
    assert Dataset.to_pandas is before
    assert getattr(Dataset.to_pandas, "_graft_empty_fix", False)
