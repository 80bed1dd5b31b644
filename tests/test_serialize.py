"""Document save / re-serialization (S6): parse(serialize(doc)) must
reproduce the observable document state — the docmodel analogue of the
reference's save -> reopen round-trip (document.py:247-276)."""

import io

import pytest

from pypdfium2_ray.docmodel.htmldoc import extract_document_text, parse_document
from pypdfium2_ray.docmodel.serialize import save_document, serialize_document

RICH = (b"<html><head><title>T1</title>"
        b'<meta name="author" content="A &amp; B">'
        b'<meta name="keywords" content="k1,k2"></head><body>'
        b"<nav><a href='/'>junk nav</a></nav>"
        b"<main><h1>Chapter 1</h1><p>First paragraph with &lt;escapes&gt; "
        b"&amp; entities.</p><p>Second   paragraph.</p>"
        b"<pb><h2>Part two</h2><p>On page two.</p>"
        b'<a download="f.txt" href="data:text/plain;base64,aGVsbG8=">f</a>'
        b"</main><footer>junk</footer></body></html>")


def _observable(doc):
    return dict(
        text=extract_document_text(doc),
        toc=[(e.level, e.title, e.page_index, e.n_children) for e in doc.toc],
        metadata=doc.get_metadata_dict(),
        atts=[(a.name, a.mime, a.data) for a in doc.attachments],
        n_pages=len(doc),
        tagged=doc.is_tagged(),
        pagemode=doc.get_pagemode(),
    )


def test_roundtrip_rich_document():
    doc = parse_document(RICH)
    assert doc.ok and len(doc) == 2 and doc.toc and doc.attachments
    doc2 = parse_document(serialize_document(doc))
    assert doc2.ok
    a, b = _observable(doc), _observable(doc2)
    # attachment anchor text flowed into page text at the FIRST parse; the
    # serializer emits empty-text anchors, so text must still match exactly
    assert a == b
    # serialize is a fixed point: second round-trip is byte-identical
    assert serialize_document(doc2) == serialize_document(
        parse_document(serialize_document(doc2)))


def test_roundtrip_plain_and_empty_page():
    doc = parse_document(b"<html><body><p>only line</p></body></html>")
    doc2 = parse_document(serialize_document(doc))
    assert _observable(doc) == _observable(doc2)
    empty = parse_document(b"<html><body></body></html>")
    assert empty.ok and len(empty) == 1
    empty2 = parse_document(serialize_document(empty))
    assert _observable(empty) == _observable(empty2)


def test_roundtrip_heading_outline_becomes_explicit_nav():
    html = (b"<html><body><h1>A</h1><p>x</p><h2>B</h2><p>y</p>"
            b"<h2>C</h2><p>z</p></body></html>")
    doc = parse_document(html)
    assert [(e.level, e.n_children) for e in doc.toc] == [(0, 2), (1, 0), (1, 0)]
    doc2 = parse_document(serialize_document(doc))
    assert [(e.level, e.title, e.page_index, e.n_children) for e in doc.toc] \
        == [(e.level, e.title, e.page_index, e.n_children) for e in doc2.toc]


def test_save_document_password_and_stream(tmp_path):
    doc = parse_document(RICH)
    p = tmp_path / "doc.html"
    save_document(doc, str(p))
    assert parse_document(p.read_bytes()).ok

    buf = io.BytesIO()
    save_document(doc, buf, password="s3cret")
    enc = buf.getvalue()
    assert parse_document(enc).err_code != 0            # needs the password
    dec = parse_document(enc, password="s3cret")
    assert dec.ok
    assert extract_document_text(dec) == extract_document_text(doc)


def test_serialize_failed_document_raises():
    bad = parse_document(b"\x00\xffnot html")
    assert not bad.ok
    with pytest.raises(ValueError):
        serialize_document(bad)


def test_document_from_images():
    from pypdfium2_ray.docmodel.serialize import document_from_images
    html = document_from_images([
        dict(src="a.png", alt="first", width=32, height=16),
        dict(src="b.jpg"),
    ])
    doc = parse_document(html)
    assert doc.ok and len(doc) == 2
    objs = [o for p in doc.pages for o in p.objects if o.type == "image"]
    assert [(o.src, o.alt, o.width, o.height) for o in objs] == \
        [("a.png", "first", 32, 16), ("b.jpg", "", 0, 0)]
    assert [len([o for o in p.objects if o.type == "image"])
            for p in doc.pages] == [1, 1]


def test_rotation_const_maps():
    from pypdfium2_ray.docmodel.bitmap import (
        ROTATION_TO_CONST, ROTATION_TO_DEGREES)
    assert ROTATION_TO_CONST == {0: 0, 90: 1, 180: 2, 270: 3}
    assert all(ROTATION_TO_DEGREES[ROTATION_TO_CONST[d]] == d
               for d in (0, 90, 180, 270))


def test_roundtrip_outline_starting_below_h1():
    """An h2-before-any-h1 heading outline starts at level 1 — nesting-only
    nav markup cannot express that; the explicit data-level form must."""
    html = (b"<html><body><h2>B</h2><p>x</p><h1>A</h1><p>y</p>"
            b"<h3>C</h3><p>z</p></body></html>")
    doc = parse_document(html)
    assert [e.level for e in doc.toc] == [1, 0, 2]
    doc2 = parse_document(serialize_document(doc))
    assert [(e.level, e.title, e.page_index, e.n_children) for e in doc2.toc] \
        == [(e.level, e.title, e.page_index, e.n_children) for e in doc.toc]
    assert _observable(doc) == _observable(doc2)
