"""WARC container codec + Ray source/sink (sources/warc.py)."""

import gzip

import pyarrow as pa
import pytest

from pypdfium2_ray.sources.warc import (
    WarcFormatError, parse_warc, read_warc, warc_record, warcinfo_record,
    write_warc, write_warc_shards)

_ROWS = [
    ("http://example.org/a", 1_767_225_600_000_000, b"<html>a</html>"),
    # payload containing a WARC header lookalike and binary junk: framing
    # must be Content-Length-driven, never scan-driven
    ("http://example.org/b", 1_767_225_601_000_000,
     b"WARC/1.0\r\nContent-Length: 9999\r\n\r\n\x00\xff\x1f\x8b tail"),
    ("http://example.org/c", 1_767_312_000_000_000, b""),
]


def test_codec_round_trip_plain():
    blob = warcinfo_record("t.warc") + b"".join(
        warc_record(u, t, p) for u, t, p in _ROWS)
    assert list(parse_warc(blob)) == _ROWS


def test_codec_round_trip_gzip_members(tmp_path):
    path = str(tmp_path / "t.warc.gz")
    assert write_warc(iter(_ROWS), path) == len(_ROWS)
    data = open(path, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    assert list(parse_warc(data)) == _ROWS
    # deterministic bytes (mtime=0): a rewrite is byte-identical (same
    # basename — the warcinfo record embeds the filename)
    sub = tmp_path / "again"
    sub.mkdir()
    path2 = str(sub / "t.warc.gz")
    write_warc(iter(_ROWS), path2)
    assert open(path2, "rb").read() == data


def test_warcinfo_skipped_torn_loud():
    blob = b"".join(warc_record(u, t, p) for u, t, p in _ROWS)
    with pytest.raises(WarcFormatError):
        list(parse_warc(blob[:-10]))          # torn tail record
    with pytest.raises(WarcFormatError):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))  # not WARC
    # a half-gzip-member file fails inside gzip, also loud
    g = gzip.compress(blob, mtime=0)
    with pytest.raises(Exception):
        list(parse_warc(g[: len(g) // 2]))


def test_ray_sink_then_source_round_trip(ray_session, tmp_path):
    import ray.data as rd
    from pypdfium2_ray.sources.cc_from_documents import documents_to_cc
    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"body {i} words here" for i in range(40)]),
        "lang": pa.array(["en"] * 40),
        "source": pa.array(["web"] * 40),
    })
    cc = documents_to_cc(docs).select(["url", "warc_ts", "html"])
    out = str(tmp_path / "warc")
    manifest = write_warc_shards(rd.from_arrow(cc), out, n_shards=4)
    assert manifest.num_rows == 4
    assert sum(manifest["n_records"].to_pylist()) == 40
    back = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = cc.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(want["url"])
    assert [bytes(b) for b in back["html"]] == [bytes(b) for b in want["html"]]
    assert list(back["warc_ts"]) == list(want["warc_ts"])


def test_sink_bytes_partitioning_invariant(ray_session, tmp_path):
    """Shard files must be byte-identical no matter how the input is
    blocked (the resumability/auditing contract)."""
    import ray.data as rd
    from pypdfium2_ray.sources.cc_from_documents import documents_to_cc
    docs = pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(30)]),
        "lang": pa.array(["en"] * 30),
        "source": pa.array(["web"] * 30),
    })
    cc = documents_to_cc(docs).select(["url", "warc_ts", "html"])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc_shards(rd.from_arrow(cc), a, n_shards=3)
    write_warc_shards(
        rd.from_arrow(cc).repartition(7), b, n_shards=3)
    for i in range(3):
        fa = open(f"{a}/part-{i:05d}.warc.gz", "rb").read()
        fb = open(f"{b}/part-{i:05d}.warc.gz", "rb").read()
        assert fa == fb


def test_cli_ingest_warc_resumable(ray_session, tmp_path, capsys):
    """WARC dir -> parquet via the checkpoint manifest; second run skips
    finished shards; --extract streams straight to the extracted table."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from pypdfium2_ray.__main__ import main
    from pypdfium2_ray.sources.cc_from_documents import documents_to_cc
    docs = pa.table({
        "doc_id": pa.array(range(24), pa.int64()),
        "text": pa.array([f"ingest body {i} with several words" 
                          for i in range(24)]),
        "lang": pa.array(["en"] * 24),
        "source": pa.array(["web"] * 24),
    })
    cc = documents_to_cc(docs, errors=False).select(
        ["url", "warc_ts", "html"])
    warc_dir = str(tmp_path / "warc")
    write_warc_shards(rd.from_arrow(cc), warc_dir, n_shards=3)

    out = str(tmp_path / "pages")
    assert main(["ingest", warc_dir, "-o", out]) == 0
    assert "ran=3 skipped=0" in capsys.readouterr().out
    t = pads.dataset(out, format="parquet").to_table()
    assert t.num_rows == 24
    assert {"url", "warc_ts", "html"} <= set(t.column_names)
    # resume: nothing re-runs
    assert main(["ingest", warc_dir, "-o", out]) == 0
    assert "ran=0 skipped=3" in capsys.readouterr().out

    out2 = str(tmp_path / "extracted")
    assert main(["ingest", warc_dir, "-o", out2, "--extract"]) == 0
    t2 = pads.dataset(out2, format="parquet").to_table()
    assert t2.num_rows == 24
    assert set(t2["status"].to_pylist()) == {"ok"}
    assert t2["extracted_text"][0].as_py().startswith("# Page 1\n")
