"""CSV shard sink/source (sources/csvfmt)."""

import glob
import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.sources.csvfmt import read_csv_shards, write_csv_shards

_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("score", pa.float64()), ("keep", pa.bool_())])


def _table(n=37):
    # CSV's hard cases: delimiters, quotes, CR/LF inside fields, unicode,
    # floats needing 17 significant digits
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f'doc {i}, "quoted"\r\nnewline é中' if i % 3
                          else "" for i in range(n)]),
        "score": pa.array([i / 7 for i in range(n)], pa.float64()),
        "keep": pa.array([i % 2 == 0 for i in range(n)])})


def _write(tmp, t, n_shards=4):
    return write_csv_shards(rd.from_arrow(t).repartition(3),
                            str(tmp), n_shards=n_shards)


def test_roundtrip_and_manifest(tmp_path):
    t = _table()
    man = _write(tmp_path / "a", t)
    assert man.num_rows == 4 and int(
        pa.compute.sum(man["n_records"]).as_py()) == t.num_rows
    back = read_csv_shards(str(tmp_path / "a"), schema=_SCHEMA) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(orig[back.columns])


def test_shard_bytes_deterministic_and_key_sorted(tmp_path):
    t = _table(20)
    _write(tmp_path / "x", t)
    _write(tmp_path / "y", t)
    for px in sorted(glob.glob(str(tmp_path / "x" / "*.gz"))):
        py = str(tmp_path / "y" / os.path.basename(px))
        assert open(px, "rb").read() == open(py, "rb").read()
    import io

    import pyarrow.csv as pcsv
    first = sorted(glob.glob(str(tmp_path / "x" / "*.gz")))[0]
    shard = pcsv.read_csv(io.BytesIO(
        gzip.decompress(open(first, "rb").read())))
    ids = shard["doc_id"].to_pylist()
    assert ids == sorted(ids)


def test_binary_column_rejected(tmp_path):
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "blob": pa.array([b"\x00"], pa.binary())})
    with pytest.raises(Exception, match="non-CSV-representable"):
        _write(tmp_path / "b", t)


def test_schema_pin_and_null_vs_empty(tmp_path):
    # an all-digit string column would infer as int without the pin;
    # nulls round-trip as nulls, "" as ""
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "tag": pa.array(["007", None, ""], pa.string())})
    _write(tmp_path / "c", t, n_shards=2)
    schema = pa.schema([("doc_id", pa.int64()), ("tag", pa.string())])
    back = read_csv_shards(str(tmp_path / "c"), schema=schema)
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.schema().base_schema == schema
    assert df["tag"][0] == "007" and df["tag"][1] is None \
        and df["tag"][2] == ""
