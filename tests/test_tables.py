"""HTML table extraction (stages/tables.py)."""

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.tables import extract_tables, parse_tables


def test_basic_grid():
    cells = parse_tables(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>")
    assert cells == [(0, 0, 0, True, "a"), (0, 0, 1, True, "b"),
                     (0, 1, 0, False, "1"), (0, 1, 1, False, "2")]


def test_two_tables_document_order():
    cells = parse_tables(
        "<p>x</p><table><tr><td>t0</td></tr></table>"
        "<div><table><tr><td>t1</td></tr></table></div>")
    assert cells == [(0, 0, 0, False, "t0"), (1, 0, 0, False, "t1")]


def test_nested_table_own_index_no_leak():
    cells = parse_tables(
        "<table><tr><td>outer "
        "<table><tr><td>inner</td></tr></table>"
        " tail</td></tr></table>")
    # the outer cell is flushed when the inner table opens; inner cells
    # never leak into it, and the tail after the inner table is dropped
    # with the already-flushed cell (documented recovery convention)
    assert (0, 0, 0, False, "outer") in cells
    assert (1, 0, 0, False, "inner") in cells


def test_unclosed_cells_and_implicit_row():
    # td without tr -> implicit row 0; unclosed td closed by next td;
    # unclosed table closed at EOF
    cells = parse_tables("<table><td>a<td>b")
    assert cells == [(0, 0, 0, False, "a"), (0, 0, 1, False, "b")]


def test_whitespace_collapse_and_markup_inside_cell():
    cells = parse_tables(
        "<table><tr><td>  hello\n\t<b>bold</b>  world </td></tr></table>")
    assert cells == [(0, 0, 0, False, "hello bold world")]


def test_text_outside_tables_ignored():
    assert parse_tables("<p>no tables here</p>") == []
    assert parse_tables("text <td>stray</td> more") == []


def test_entity_refs():
    cells = parse_tables("<table><tr><td>a &amp; b</td></tr></table>")
    assert cells == [(0, 0, 0, False, "a & b")]


def test_stage_skips_undecodable_payloads():
    from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
    html_ok = b"<table><tr><td>x</td></tr></table>"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "html": pa.array([html_ok, b"\x00bad", b"",
                          encrypt_payload(html_ok, "pw")], pa.binary())})
    out = extract_tables(rd.from_arrow(t)).to_pandas()
    assert set(out["doc_id"]) == {1}
    # with the right password the encrypted row parses too
    out2 = extract_tables(rd.from_arrow(t), password="pw").to_pandas()
    assert set(out2["doc_id"]) == {1, 4}
    assert list(out2.columns) == ["doc_id", "table_idx", "row_idx",
                                  "col_idx", "is_header", "cell"]


def test_wrap_table_page_shape():
    from pypdfium2_ray.sources.cc_from_documents import documents_to_cc
    docs = pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["hello world"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["srcX"], pa.string())})
    cc = documents_to_cc(docs, errors=False, wrap="table")
    cells = parse_tables(cc["html"][0].as_py().decode())
    assert (0, 1, 1, False, "5") in cells
    assert (0, 2, 1, False, "en") in cells
    assert (0, 3, 1, False, "srcX") in cells
    assert (0, 4, 1, False, "11") in cells      # length("hello world")
    assert len(cells) == 10
