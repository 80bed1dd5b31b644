"""Page boxes + rotation + doc flags + CLI-parity helpers.

Mirrors the reference's box-fallback cases (page.py:95-185), the BUG(149)
rotation regression (tests/test_textpage.py:144-156: rotating a page must
NOT change bounded-extraction defaults), and the small scalar helpers."""

import pytest

from pypdfium2_ray.docmodel.bitmap import color_tohex
from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.layout import LayoutParams
from pypdfium2_ray.docmodel.model import (
    FORMTYPE_ACRO_FORM, FORMTYPE_NONE, PAGEMODE_USEATTACHMENTS,
    PAGEMODE_USENONE, PAGEMODE_USEOUTLINES, Attachment, Page)
from pypdfium2_ray.functions.units import from_pt, parse_page_range, to_pt

LAYOUT = LayoutParams()


def _page(lines=("hello world",)):
    return Page(index=0, lines=list(lines), layout=LAYOUT)


# ---------------------------------------------------------------------------
# boxes


def test_mediabox_default_is_layout_box():
    p = _page()
    assert p.get_mediabox() == (0.0, 0.0, LAYOUT.page_width,
                                LAYOUT.page_height)
    assert p.get_mediabox(fallback_ok=False) is None


def test_box_fallback_chain():
    p = _page()
    # crop falls back to media, bleed/trim/art fall back to crop
    assert p.get_cropbox() == p.get_mediabox()
    assert p.get_bleedbox() == p.get_mediabox()
    assert p.get_trimbox() == p.get_mediabox()
    assert p.get_artbox() == p.get_mediabox()
    assert p.get_cropbox(fallback_ok=False) is None

    p.set_mediabox(0, 0, 400, 500)
    assert p.get_cropbox() == (0, 0, 400, 500)

    p.set_cropbox(10, 20, 300, 400)
    assert p.get_cropbox() == (10, 20, 300, 400)
    assert p.get_bleedbox() == (10, 20, 300, 400)      # -> crop, not media
    assert p.get_trimbox() == (10, 20, 300, 400)
    assert p.get_artbox() == (10, 20, 300, 400)

    p.set_trimbox(50, 50, 100, 100)
    assert p.get_trimbox() == (50, 50, 100, 100)
    assert p.get_bleedbox() == (10, 20, 300, 400)      # unaffected sibling


def test_get_bbox_is_media_crop_intersection():
    p = _page()
    p.set_mediabox(0, 0, 400, 500)
    p.set_cropbox(50, -10, 500, 450)
    assert p.get_bbox() == (50, 0, 400, 450)


# ---------------------------------------------------------------------------
# rotation


def test_rotation_set_get_and_size_swap():
    p = _page()
    assert p.get_rotation() == 0
    w, h = p.get_size()
    p.set_rotation(90)
    assert p.get_rotation() == 90
    assert p.get_size() == (h, w)                      # displayed size swaps
    p.set_rotation(180)
    assert p.get_size() == (w, h)
    with pytest.raises(ValueError):
        p.set_rotation(45)


def test_bounded_defaults_unaffected_by_rotation():
    """BUG(149) regression (reference tests/test_textpage.py:144-156):
    defaults must use native page coordinates, so rotating the page does
    not truncate get_text_bounded()."""
    p = _page(["the quick brown fox", "jumps over the lazy dog"])
    tp0 = p.get_textpage()
    full = tp0.get_text_bounded()
    assert full == tp0.get_text_range()                # full text at default
    p.set_rotation(90)
    tp90 = p.get_textpage()
    assert tp90.get_text_bounded() == full


def test_cropbox_bounds_textpage_defaults():
    """A crop box narrower than the media box clips bounded defaults —
    the textpage bbox is media ∩ crop, not the layout size."""
    p = _page(["abcdefghij"])
    full = p.get_textpage().get_text_bounded()
    assert full == "abcdefghij"
    lay = p.layout
    # crop to the first 3 columns (char centers of cols 0-2)
    right = lay.char_x(3)
    p.set_cropbox(0, 0, right, lay.page_height)
    clipped = p.get_textpage().get_text_bounded()
    assert clipped == "abc"


# ---------------------------------------------------------------------------
# document flags / labels


def test_doc_flags_from_parser():
    plain = parse_document(b"<html><body><p>x</p></body></html>")
    assert plain.is_tagged() is False
    assert plain.get_formtype() == FORMTYPE_NONE
    assert plain.get_pagemode() == PAGEMODE_USENONE

    tagged = parse_document(b"<html><body><h1>T</h1><p>x</p></body></html>")
    assert tagged.is_tagged() is True
    assert tagged.get_pagemode() == PAGEMODE_USEOUTLINES

    form = parse_document(
        b"<html><body><p>x</p><form><input></form></body></html>")
    assert form.get_formtype() == FORMTYPE_ACRO_FORM

    att = parse_document(
        b'<html><body><p>x</p>'
        b'<a download="f.txt" href="data:text/plain;base64,aGk=">f</a>'
        b"</body></html>")
    assert att.get_pagemode() == PAGEMODE_USEATTACHMENTS


def test_page_labels_and_size():
    doc = parse_document(b"<html><body><p>x</p></body></html>")
    assert doc.get_page_label(0) == ""                 # no labels defined
    doc.page_labels = ["i"]
    assert doc.get_page_label(0) == "i"
    with pytest.raises(IndexError):
        doc.get_page_label(5)
    assert doc.get_page_size(0) == doc.pages[0].get_size()


# ---------------------------------------------------------------------------
# attachment params


def test_attachment_params():
    att = Attachment(name="f.txt", data=b"hi",
                     params={"CreationDate": "D:20240101000000"})
    assert att.has_key("Size") and att.has_key("CheckSum")
    assert att.get_str_value("Size") == "2"
    import hashlib
    assert att.get_str_value("CheckSum") == hashlib.md5(b"hi").hexdigest()
    assert att.get_str_value("CreationDate") == "D:20240101000000"
    assert att.get_str_value("ModDate") == ""
    assert not att.has_key("ModDate")
    assert Attachment(name="e").get_str_value("CheckSum") == ""


# ---------------------------------------------------------------------------
# scalar helpers


def test_parse_page_range():
    assert parse_page_range("1,3-5,7") == [0, 2, 3, 4, 6]
    assert parse_page_range("2", n_pages=3) == [1]
    assert parse_page_range("", n_pages=3) == [0, 1, 2]
    assert parse_page_range(" 1 , 2-2 ") == [0, 1]
    with pytest.raises(ValueError):
        parse_page_range("0")
    with pytest.raises(ValueError):
        parse_page_range("5-3")
    with pytest.raises(ValueError):
        parse_page_range("4", n_pages=3)
    with pytest.raises(ValueError):
        parse_page_range("")


def test_unit_conversion():
    assert to_pt(1, "in") == 72.0
    assert to_pt(25.4, "mm") == pytest.approx(72.0)
    assert to_pt(2.54, "cm") == pytest.approx(72.0)
    assert from_pt(to_pt(3.5, "mm"), "mm") == pytest.approx(3.5)
    with pytest.raises(ValueError):
        to_pt(1, "furlong")


def test_color_tohex():
    # reference internal/utils.py:9-24 layout: ARGB, or ABGR reversed
    assert color_tohex((0x11, 0x22, 0x33, 0x44)) == 0x44112233
    assert color_tohex((0x11, 0x22, 0x33, 0x44), rev_byteorder=True) == 0x44332211
    assert color_tohex((255, 255, 255, 255)) == 0xFFFFFFFF
    with pytest.raises(ValueError):
        color_tohex((256, 0, 0, 0))


def test_auto_bitmap_format():
    from pypdfium2_ray.docmodel.bitmap import auto_bitmap_format
    assert auto_bitmap_format() == "BGR"
    assert auto_bitmap_format(grayscale=True) == "GRAY"
    assert auto_bitmap_format((0, 0, 0, 128)) == "BGRA"           # translucent fill
    assert auto_bitmap_format(has_transparency=True) == "BGRA"
    assert auto_bitmap_format((1, 2, 3, 128), grayscale=True) == "BGRA"


def test_round_coords():
    from pypdfium2_ray.functions.units import round_coords
    assert round_coords((1.23456789, 2.0, 3.999999), 4) == (1.2346, 2.0, 4.0)
    assert round_coords((1.5,), 0) == (2.0,)


def test_document_new_and_new_page():
    """Reference tests/test_page.py test_rotation + new-document surface:
    PdfDocument.new() -> new_page(w, h) -> rotation cycle."""
    from pypdfium2_ray.docmodel.model import Document
    pdf = Document.new()
    assert pdf.ok and len(pdf) == 0
    page = pdf.new_page(500, 800)
    assert len(pdf) == 1 and pdf[0] is page
    assert page.get_size() == (500, 800) == pdf.get_page_size(0)
    assert page.get_mediabox() == (0, 0, 500, 800)
    for r in (90, 180, 270, 0):
        page.set_rotation(r)
        assert page.get_rotation() == r
    p2 = pdf.new_page(100, 100, index=0)
    assert pdf[0] is p2 and pdf[1] is page
    assert [p.index for p in pdf.pages] == [0, 1]
    pdf.del_page(0)
    assert len(pdf) == 1 and pdf[0] is page and page.index == 0
    # a new document serializes and round-trips like a parsed one
    from pypdfium2_ray.docmodel.htmldoc import parse_document
    from pypdfium2_ray.docmodel.serialize import serialize_document
    rt = parse_document(serialize_document(pdf))
    assert rt.ok and len(rt) == 1


def test_import_pages_between_documents():
    """document.py:446-467 import_pages: all / selection / at index."""
    from pypdfium2_ray.docmodel.htmldoc import extract_document_text
    src = parse_document(
        b"<html><body><p>one</p><pb><p>two</p><pb><p>three</p></body></html>")
    assert len(src) == 3
    from pypdfium2_ray.docmodel.model import Document
    dst = Document.new()
    dst.import_pages(src)
    assert len(dst) == 3
    assert extract_document_text(dst) == extract_document_text(src)
    dst2 = Document.new()
    dst2.new_page(100, 100)
    dst2.import_pages(src, pages=[2, 0], index=0)
    assert [p.lines for p in dst2.pages] == [["three"], ["one"], []]
    assert [p.index for p in dst2.pages] == [0, 1, 2]
    # deep copy: mutating the import does not touch the source
    dst2.pages[0].lines.append("mutated")
    assert src.pages[2].lines == ["three"]


def test_open_with_excessive_password():
    """Reference test_document.py:133: a password passed for an
    unencrypted document is ignored, not an error."""
    doc = parse_document(b"<html><body><p>x</p></body></html>",
                         password="not needed")
    assert doc.ok and len(doc) == 1


def test_identifier_changes_with_content():
    """Reference test_saving.py:111 analogue: the permanent identifier
    tracks content; the changing identifier also tracks metadata."""
    a = parse_document(b"<html><body><p>x</p></body></html>")
    b = parse_document(b"<html><body><p>y</p></body></html>")
    assert a.get_identifier() != b.get_identifier()
    c = parse_document(
        b"<html><head><title>T</title></head><body><p>x</p></body></html>")
    assert a.get_identifier(permanent=True) == c.get_identifier(permanent=True)
    assert a.get_identifier(permanent=False) != c.get_identifier(permanent=False)


def test_get_quad_points_rotated_tighter_than_bounds():
    """Reference parity (pageobjects.py:108-130): quads are the rect
    corners CCW from bottom-left; under a 45-degree rotation the quad is
    tighter than the axis-aligned bounding box of the same corners, and
    non-text/image objects refuse."""
    import math

    import pytest

    from pypdfium2_ray.docmodel.matrix import PdfMatrix
    from pypdfium2_ray.docmodel.model import PageObject

    obj = PageObject(type="image", level=1, bounds=(10.0, 20.0, 30.0, 40.0))
    q = obj.get_quad_points()
    assert q == ((10, 20), (30, 20), (30, 40), (10, 40))

    rot = PdfMatrix().rotate(45)
    qr = obj.get_quad_points(rot)
    for (x, y), (x0, y0) in zip(qr, q):
        ex, ey = rot.on_point(x0, y0)
        assert math.isclose(x, ex) and math.isclose(y, ey)
    # quad area (shoelace) is invariant under rotation; the AABB grows —
    # the quad is the tighter description of the rotated object
    xs, ys = [p[0] for p in qr], [p[1] for p in qr]
    area = 0.5 * abs(sum(xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
                         for i in range(4)))
    aabb = (max(xs) - min(xs)) * (max(ys) - min(ys))
    assert math.isclose(area, 20 * 20) and aabb > area

    with pytest.raises(RuntimeError, match="image and text"):
        PageObject(type="path", level=1,
                   bounds=(0, 0, 1, 1)).get_quad_points()


def test_round_list_preserves_container():
    """F8 parity (pypdfium2_cli/_parsers.py:64-65)."""
    from pypdfium2_ray.functions.units import round_list
    assert round_list((1.2345, 2.3456), 2) == (1.23, 2.35)
    assert isinstance(round_list((1.0,), 1), tuple)
    assert round_list([1.005, 7.0], 1) == [1.0, 7.0]
    assert isinstance(round_list([1.0], 1), list)
