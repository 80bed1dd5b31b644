"""JSONL shard sink/source (sources/jsonl)."""

import glob
import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.sources.jsonl import read_jsonl, write_jsonl_shards


def _table(n=37):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}é中\n\"quote\"\\slash"
                          for i in range(n)]),
        "score": pa.array([i / 7 for i in range(n)], pa.float64()),
        "keep": pa.array([i % 2 == 0 for i in range(n)])})


def _write(tmp, t, n_shards=4):
    return write_jsonl_shards(rd.from_arrow(t).repartition(3),
                              str(tmp), n_shards=n_shards)


def test_roundtrip_and_manifest(tmp_path):
    t = _table()
    man = _write(tmp_path / "a", t)
    assert man.num_rows == 4 and int(
        pa.compute.sum(man["n_records"]).as_py()) == t.num_rows
    back = read_jsonl(str(tmp_path / "a")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(orig[back.columns])


def test_shard_bytes_deterministic(tmp_path):
    t = _table(20)
    _write(tmp_path / "x", t)
    _write(tmp_path / "y", t)
    for px in sorted(glob.glob(str(tmp_path / "x" / "*.gz"))):
        py = str(tmp_path / "y" / os.path.basename(px))
        assert open(px, "rb").read() == open(py, "rb").read()
    # lines inside a shard are sorted by key (partitioning-invariant)
    first = sorted(glob.glob(str(tmp_path / "x" / "*.gz")))[0]
    import json
    ids = [json.loads(ln)["doc_id"] for ln in
           gzip.decompress(open(first, "rb").read()).splitlines()]
    assert ids == sorted(ids)


def test_binary_column_rejected(tmp_path):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "blob": pa.array([b"\x00"], pa.binary())})
    with pytest.raises(Exception, match="non-JSON-native"):
        _write(tmp_path / "b", t)


def test_schema_pin(tmp_path):
    t = _table(5)
    _write(tmp_path / "c", t, n_shards=2)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("score", pa.float64()), ("keep", pa.bool_())])
    back = read_jsonl(str(tmp_path / "c"), schema=schema)
    assert back.schema().base_schema == schema
