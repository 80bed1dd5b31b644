"""page_as_xobject + bookmark view state (color / signed count) — the
round-4 verdict's two reference-API stragglers.

Reference parity targets:
- ``PdfDocument.page_as_xobject`` / ``PdfXObject`` / ``as_pageobject``
  (/root/reference/src/pypdfium2/_helpers/document.py:500-517, 635-662)
- ``PdfBookmark.get_count`` (signed) / ``get_color``
  (document.py:693-714)
"""

import pytest

from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.model import Document, toc_get_count
from pypdfium2_ray.docmodel.serialize import serialize_document


def _doc_with_pages():
    html = (b"<html><head><title>t</title></head><body>"
            b"<main><p>first page line</p><pb><p>second page line</p>"
            b"</main></body></html>")
    return parse_document(html)


# ---------------------------------------------------------------------------
# page_as_xobject

def test_page_as_xobject_capture_and_place():
    src = _doc_with_pages()
    dest = Document.new()
    xobj = src.page_as_xobject(0, dest)
    assert xobj in dest.xobjects          # _add_kid-style tracking
    assert xobj.parent is dest
    obj = xobj.as_pageobject()
    assert obj.type == "form"
    assert obj.bounds == src.pages[0].get_bbox()
    assert obj.form_page.lines == src.pages[0].lines


def test_xobject_pageobjects_share_resources():
    src = _doc_with_pages()
    dest = Document.new()
    xobj = src.page_as_xobject(1, dest)
    a, b = xobj.as_pageobject(), xobj.as_pageobject()
    assert a is not b                     # independent objects
    assert a.form_page is b.form_page     # shared resources


def test_xobject_is_a_deep_copy_snapshot():
    src = _doc_with_pages()
    dest = Document.new()
    xobj = src.page_as_xobject(0, dest)
    src.pages[0].lines.append("late edit")
    assert "late edit" not in xobj.page.lines


def test_xobject_close_semantics():
    src = _doc_with_pages()
    dest = Document.new()
    xobj = src.page_as_xobject(0, dest)
    obj = xobj.as_pageobject()
    xobj.close()
    # created pageobjects remain valid after close (reference contract)
    assert obj.form_page.lines == xobj.page.lines
    with pytest.raises(RuntimeError):
        xobj.as_pageobject()


def test_page_as_xobject_bad_index_raises():
    src = _doc_with_pages()
    with pytest.raises(ValueError, match="Failed to capture page"):
        src.page_as_xobject(99, Document.new())


# ---------------------------------------------------------------------------
# bookmark color + signed count

def _nav_doc():
    html = (b"<html><head><title>t</title></head><body>"
            b'<nav data-toc><ul>'
            b'<li data-page="0" data-color="#3366cc">One'
            b'<ul><li data-page="0">One.A</li>'
            b'<li data-page="1" data-closed="1">One.B'
            b'<ul><li data-page="1">One.B.i</li>'
            b'<li data-page="1">One.B.ii</li></ul>'
            b'</li></ul>'
            b'</li>'
            b'<li data-page="1">Two</li>'
            b'</ul></nav>'
            b"<main><p>body</p><pb><p>p2</p></main></body></html>")
    return parse_document(html)


def test_bookmark_color_parsed():
    doc = _nav_doc()
    by_title = {e.title: e for e in doc.toc}
    assert by_title["One"].get_color() == (0x33 / 255, 0x66 / 255,
                                           0xCC / 255)
    assert by_title["Two"].get_color() is None


def test_bookmark_color_invalid_is_none():
    html = (b"<html><body><nav data-toc><ul>"
            b'<li data-page="0" data-color="red">A</li>'
            b'<li data-page="0" data-color="#12345">B</li>'
            b"</ul></nav><main><p>x</p></main></body></html>")
    doc = parse_document(html)
    assert all(e.get_color() is None for e in doc.toc)


def test_signed_count_semantics():
    doc = _nav_doc()
    toc = doc.toc
    idx = {e.title: i for i, e in enumerate(toc)}
    # "One" is open: visible = One.A + One.B (One.B is CLOSED, so its
    # children are not visible) -> +2
    assert toc_get_count(toc, idx["One"]) == 2
    # "One.B" closed with 2 children -> -2 (magnitude = visible-if-open)
    assert toc[idx["One.B"]].closed
    assert toc_get_count(toc, idx["One.B"]) == -2
    # leaves -> 0 regardless of state
    assert toc_get_count(toc, idx["One.A"]) == 0
    assert toc_get_count(toc, idx["Two"]) == 0


def test_open_chain_counts_recursively():
    html = (b"<html><body><nav data-toc><ul>"
            b'<li data-page="0">R<ul>'
            b'<li data-page="0">C<ul>'
            b'<li data-page="0">G</li></ul></li>'
            b"</ul></li></ul></nav>"
            b"<main><p>x</p></main></body></html>")
    doc = parse_document(html)
    idx = {e.title: i for i, e in enumerate(doc.toc)}
    # all open: R sees C and (C open) G -> 2
    assert toc_get_count(doc.toc, idx["R"]) == 2
    assert toc_get_count(doc.toc, idx["C"]) == 1


def test_bookmark_state_round_trips():
    doc = _nav_doc()
    reparsed = parse_document(serialize_document(doc))
    assert [(e.title, e.closed, e.color) for e in reparsed.toc] == \
           [(e.title, e.closed, e.color) for e in doc.toc]


# ---------------------------------------------------------------------------
# trailer-ends introspection (FPDF_GetTrailerEnds analogue)

def test_trailer_ends_single_document():
    html = b"<html><body><main><p>x</p></main></body></html>"
    doc = parse_document(html)
    assert doc.get_trailer_ends() == [len(html)]


def test_trailer_ends_concatenated_snapshots():
    one = b"<html><body><main><p>a</p></main></body></html>"
    two = b"<html><body><main><p>b</p></main></body></HTML>"
    doc = parse_document(one + two)           # case-insensitive scan
    assert doc.get_trailer_ends() == [len(one), len(one) + len(two)]


def test_trailer_ends_absent_marker_and_new_doc():
    doc = parse_document(b"<html><body><main><p>x</p></main></body>")
    assert doc.get_trailer_ends() == []
    assert Document.new().get_trailer_ends() == []
