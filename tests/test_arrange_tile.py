"""arrange / tile / imgtopdf / pageobjects CLI + tile_document semantics."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pypdfium2_ray.__main__ import main
from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.serialize import tile_document


def _doc(n_pages=5):
    html = "<pb>".join(f"<h2>H{i}</h2><p>page {i} text</p>"
                       f'<img src="im{i}.png" width="10" height="10">'
                       for i in range(n_pages)).encode()
    return parse_document(b"<html><body>" + html + b"</body></html>")


# ---------------------------------------------------------------------------
# tile_document (FPDF_ImportNPagesToOne analogue, cli/tile.py:76-83)

def test_tile_document_grouping_and_text_order():
    doc = _doc(5)
    tiled = tile_document(doc, cols=2, rows=2, width=400, height=400)
    assert len(tiled) == 2                      # ceil(5/4)
    assert tiled[0].get_size() == (400.0, 400.0)
    # tile order == reading order: sheet text is the concatenation
    assert "page 0 text" in tiled[0].get_textpage().text
    assert "page 3 text" in tiled[0].get_textpage().text
    assert "page 4 text" in tiled[1].get_textpage().text
    # TOC pages remap to sheets
    assert [e.page_index for e in tiled.toc] == [0, 0, 0, 0, 1]


def test_tile_document_object_geometry():
    doc = _doc(2)
    pw, ph = doc[0].width, doc[0].height
    tiled = tile_document(doc, cols=2, rows=1, width=200, height=100)
    cell_w, cell_h = 100.0, 100.0
    scale = min(cell_w / pw, cell_h / ph)
    o_src = [o for o in doc[1].objects if o.src == "im1.png"][0]
    o_tiled = [o for o in tiled[0].objects if o.src == "im1.png"][0]
    dx = cell_w + (cell_w - pw * scale) / 2
    dy = (cell_h - ph * scale) / 2
    l, b, r, t = o_src.bounds
    want = (l * scale + dx, b * scale + dy, r * scale + dx, t * scale + dy)
    assert o_tiled.bounds == pytest.approx(want)
    # second tile sits in the right half of the sheet
    assert o_tiled.bounds[0] >= 100.0


def test_tile_document_rejects_bad_input():
    with pytest.raises(ValueError):
        tile_document(_doc(1), cols=0, rows=1, width=100, height=100)
    bad = parse_document(b"\x00 not html")
    with pytest.raises(ValueError):
        tile_document(bad, cols=1, rows=1, width=100, height=100)


# ---------------------------------------------------------------------------
# CLI

def test_cli_tile(ray_session, fixture_parquet, tmp_path):
    out = str(tmp_path / "tiled")
    assert main(["tile", fixture_parquet, "-o", out, "-r", "1", "-c", "3",
                 "--width", "600", "--height", "300", "--unit", "pt"]) == 0
    t = pq.read_table(out)
    rows = {u: n for u, n in zip(t["url"].to_pylist(),
                                 t["n_pages"].to_pylist())}
    assert rows["https://fixtures.test/multipage"] == 1   # 3 pages -> 1 sheet
    mp = t.filter(pc.equal(t["url"], "https://fixtures.test/multipage"))
    doc = parse_document(mp["html"][0].as_py())
    # lines are separate on the sheet (CRLF framing); order preserved
    assert doc[0].get_textpage().text == "Page\r\n1\r\nPage\r\n2\r\nPage\r\n3"


def test_cli_arrange_merges_per_url(ray_session, fixture_parquet, tmp_path):
    out = str(tmp_path / "arranged")
    # same corpus twice: first input contributes page 1, second all pages
    assert main(["arrange", fixture_parquet, fixture_parquet,
                 "--pages", "1", "_", "-o", out]) == 0
    t = pq.read_table(out)
    row = t.filter(pc.equal(t["url"], "https://fixtures.test/multipage"))
    assert row["n_pages"][0].as_py() == 4      # 1 + 3
    doc = parse_document(row["html"][0].as_py())
    assert doc[0].get_textpage().text == doc[1].get_textpage().text


def test_cli_imgtopdf(ray_session, fixture_parquet, tmp_path):
    imgs = str(tmp_path / "imgs")
    assert main(["extract-images", fixture_parquet, "-o", imgs]) == 0
    out = str(tmp_path / "docs")
    assert main(["imgtopdf", imgs, "-o", out]) == 0
    t = pq.read_table(out)
    assert t.num_rows >= 1
    doc = parse_document(t["html"][0].as_py())
    assert len(doc) == t["n_images"][0].as_py()   # one page per image
    assert doc[0].objects and doc[0].objects[0].type == "image"


def test_cli_pageobjects(ray_session, fixture_parquet, capsys):
    assert main(["pageobjects", fixture_parquet, "--filter", "image"]) == 0
    out = capsys.readouterr().out
    assert "# https://fixtures.test/images" in out
    assert "image" in out and "Bounding Box:" in out
    assert "-> Total count:" in out
