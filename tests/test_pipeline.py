"""End-to-end Ray Data pipeline tests: the byte-identical invariant over the
fixture parquet, dedup, skew-split equivalence, determinism across batch
sizes / parallelism (SURVEY §7.4 'Determinism under parallelism')."""

import pyarrow.parquet as pq
import pytest

from pypdfium2_ray.pipelines.extract_text import extract_pipeline
from pypdfium2_ray.sources.fixtures import LINK_LINES, LOREM_LINES

BASE = "https://fixtures.test"


def _expected_text_fixture():
    p1 = "\r\n".join(LOREM_LINES)
    p2 = "\r\n".join(LINK_LINES)
    return f"# Page 1\n{p1}\n\n# Page 2\n{p2}\n"


@pytest.fixture(scope="module")
def extracted(ray_session, fixture_parquet):
    ds = extract_pipeline(path=fixture_parquet, dedup=True,
                          heavy_threshold=50_000)
    df = ds.to_pandas()
    return df.set_index("url", drop=False).sort_index()


def test_byte_identical_flagship(extracted):
    assert extracted.loc[f"{BASE}/text", "extracted_text"] == _expected_text_fixture()


def test_statuses(extracted):
    s = extracted["status"]
    assert s[f"{BASE}/text"] == "ok"
    assert s[f"{BASE}/encrypted"] == "password_error"
    assert s[f"{BASE}/malformed"] == "format_error"
    assert extracted.loc[f"{BASE}/encrypted", "err_code"] == 4
    assert extracted.loc[f"{BASE}/malformed", "err_code"] == 3


def test_counts_and_pages(extracted):
    row = extracted.loc[f"{BASE}/text"]
    assert row["n_pages"] == 2 and row["n_chars"] == 438 + 103
    pages = row["pages"]
    assert pages[0]["n_chars"] == 438
    assert len(pages[0]["rects"]) == 10
    assert pages[0]["rects"][0]["text"] == "Lorem ipsum dolor sit amet,"
    multi = extracted.loc[f"{BASE}/multipage"]
    assert [p["text"] for p in multi["pages"]] == ["Page\r\n1", "Page\r\n2", "Page\r\n3"]


def test_dedup_applied(extracted):
    # two /dup snapshots in -> one row out, latest warc_ts wins
    assert (extracted["url"] == f"{BASE}/dup").sum() == 1
    assert extracted.loc[f"{BASE}/dup", "extracted_text"] == "# Page 1\nversion two\n"


def test_toc_and_metadata_columns(extracted):
    toc = extracted.loc[f"{BASE}/toc", "toc"]
    assert [(e["level"], e["title"], e["page_index"]) for e in toc][:3] == \
        [(0, "One", 0), (1, "One A", 0), (1, "One B", 1)]
    meta = extracted.loc[f"{BASE}/metadata", "metadata"]
    assert meta["Producer"] == "LibreOffice 6.4" and meta["ModDate"] == ""
    warn = extracted.loc[f"{BASE}/toc-circular", "warnings"]
    assert "circular bookmark reference detected" in list(warn)


def test_heavy_routing_equivalence(ray_session, fixture_parquet):
    """Skew split must not change results: with/without split, identical rows."""
    a = extract_pipeline(path=fixture_parquet, skew_split=True,
                         heavy_threshold=50_000).to_pandas()
    b = extract_pipeline(path=fixture_parquet, skew_split=False).to_pandas()
    a = a.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = b.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    assert list(a["extracted_text"]) == list(b["extracted_text"])
    assert list(a["n_chars"]) == list(b["n_chars"])
    # the huge row really is above the threshold (routed heavy)
    assert a.loc[a["url"] == f"{BASE}/huge", "html_len"].iloc[0] >= 50_000


def test_ingest_partitioned_single_scan(ray_session, fixture_parquet,
                                        tmp_path):
    """The size-partitioned ingest pass: ONE scan of the source writes
    light/heavy hive partitions; extraction over them equals the direct
    two-branch split, and neither branch's plan re-reads the source (each
    reads only its own partition — no duplicate source scan)."""
    import ray.data as rd

    from pypdfium2_ray.stages.skew import (
        ingest_partitioned, split_extract_ingested)

    ingest_dir = str(tmp_path / "ingest")
    ingest_partitioned(rd.read_parquet(fixture_parquet), ingest_dir,
                       heavy_threshold=50_000)
    import os
    parts = sorted(os.listdir(ingest_dir))
    assert "size_class=heavy" in parts and "size_class=light" in parts

    out = split_extract_ingested(ingest_dir, heavy_kwargs=dict(num_cpus=1))
    a = out.to_pandas()
    # each branch read its own partition: the combined stats carry no scan
    # of the SOURCE file, and each partition dir is scanned exactly once
    stats = out.stats()
    assert os.path.basename(fixture_parquet) not in stats

    b = extract_pipeline(path=fixture_parquet, skew_split=True,
                         heavy_threshold=50_000).to_pandas()
    a = a.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = b.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    assert list(a["extracted_text"]) == list(b["extracted_text"])
    assert list(a["status"]) == list(b["status"])


def test_batchsize_invariance(ray_session, fixture_parquet):
    """Results independent of batch boundaries (no cross-row state in UDFs)."""
    a = extract_pipeline(path=fixture_parquet, skew_split=False,
                         light_kwargs=dict(batch_size=2, concurrency=2)).to_pandas()
    b = extract_pipeline(path=fixture_parquet, skew_split=False,
                         light_kwargs=dict(batch_size=64, concurrency=1)).to_pandas()
    a = a.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = b.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert list(a["extracted_text"]) == list(b["extracted_text"])


def test_write_parquet_roundtrip(ray_session, fixture_parquet, tmp_path):
    out = str(tmp_path / "extracted")
    extract_pipeline(path=fixture_parquet, skew_split=False, output_path=out)
    table = pq.read_table(out)
    assert table.num_rows == 16
    texts = dict(zip(table["url"].to_pylist(), table["extracted_text"].to_pylist()))
    assert texts[f"{BASE}/text"] == _expected_text_fixture()


def test_charboxes_opt_in(ray_session, fixture_parquet):
    ds = extract_pipeline(path=fixture_parquet, skew_split=False,
                          extract_opts=dict(include_charboxes=True,
                                            include_spans=True))
    df = ds.to_pandas().set_index("url")
    page0 = df.loc[f"{BASE}/text", "pages"][0]
    chars = page0["chars"]
    assert len(chars) == 438
    assert chars[0]["cp"] == ord("L")
    assert all(c["l"] <= c["r"] and c["b"] <= c["t"] for c in chars)
    crlf = [c for c in chars if c["generated"]]
    assert len(crlf) == 18  # 9 line breaks x 2 chars
    assert len(page0["spans"]) >= 10


def test_partitioned_output(ray_session, fixture_parquet, tmp_path):
    """Hive-partitioned parquet output (resumable layout per key value)."""
    import os
    out = str(tmp_path / "by_status")
    extract_pipeline(path=fixture_parquet, skew_split=False,
                     extract_opts=dict(include_pages=False,
                                       include_rects=False),
                     output_path=out, output_partition_cols=["status"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("status="))
    assert "status=ok" in dirs and "status=format_error" in dirs
    table = pq.read_table(out)
    assert table.num_rows == 16
