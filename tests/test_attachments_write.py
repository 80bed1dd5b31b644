"""Attachment + image WRITE paths: the reference's create/mutate/save
round trips (tests/test_attachments.py, pageobjects set_bitmap/load_jpeg)
re-expressed over the docmodel: parse∘serialize must be a fixed point
with MUTATED attachments and replaced image content."""

import hashlib

import numpy as np
import pytest

from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.model import Attachment, PageObject
from pypdfium2_ray.docmodel.serialize import serialize_document


def _doc():
    return parse_document(
        b"<html><head><title>t</title></head><body><p>hello</p>"
        b'<a download="1.txt" href="data:text/plain;base64,dGVzdA=="></a>'
        b"</body></html>")


def test_attachment_mutation_lifecycle():
    """Mirrors reference tests/test_attachments.py:13-90: read params,
    set_str_value, set_data resets the params dict, new_attachment starts
    empty, del_attachment shifts left."""
    doc = _doc()
    assert doc.count_attachments() == 1
    att = doc.get_attachment(0)
    assert att.get_name() == "1.txt"
    assert att.get_data() == b"test"
    assert att.get_str_value("CheckSum") == hashlib.md5(b"test").hexdigest()
    assert att.get_str_value("Size") == "4"

    moddate = "D:20190115091400"
    att.set_str_value("ModDate", moddate)
    assert att.has_key("ModDate")
    assert att.get_str_value("ModDate") == moddate
    assert not att.has_key("asdf")
    assert att.get_str_value("asdf") == ""

    # set_data rebuilds the params dict: Size/CheckSum re-derive, dates drop
    att.set_data("pypdfium2 test".encode("utf-8"))
    assert att.get_data() == b"pypdfium2 test"
    assert att.get_str_value("ModDate") == ""
    assert att.get_str_value("Size") == str(len(b"pypdfium2 test"))
    assert att.get_str_value("CheckSum") == \
        hashlib.md5(b"pypdfium2 test").hexdigest()

    new = doc.new_attachment("Mona Lisa.jpg")
    assert doc.count_attachments() == 2
    assert new.get_name() == "Mona Lisa.jpg"
    with pytest.raises(ValueError, match="buffer length 0"):
        new.get_data()
    new.set_data(b"\xff\xd8jpegdata")
    assert new.get_data() == b"\xff\xd8jpegdata"

    doc.del_attachment(0)
    assert doc.count_attachments() == 1
    assert doc.get_attachment(0).get_name() == "Mona Lisa.jpg"


def test_attachment_roundtrip_with_mutations():
    """parse∘serialize fixed point with mutated attachments: data, name
    and explicitly-set params all survive a save/reopen."""
    doc = _doc()
    att = doc.get_attachment(0)
    att.set_data(b"changed contents")
    att.set_str_value("CreationDate", "D:20260820000000")
    att.set_str_value("ModDate", "D:20260821000000")
    extra = doc.new_attachment("extra.bin")
    extra.set_data(bytes(range(256)))   # binary-safe through base64
    extra.mime = "application/octet-stream"

    reopened = parse_document(serialize_document(doc))
    assert reopened.count_attachments() == 2
    a0, a1 = reopened.get_attachment(0), reopened.get_attachment(1)
    assert a0.get_name() == "1.txt"
    assert a0.get_data() == b"changed contents"
    assert a0.get_str_value("CreationDate") == "D:20260820000000"
    assert a0.get_str_value("ModDate") == "D:20260821000000"
    assert a0.get_str_value("Size") == str(len(b"changed contents"))
    assert a1.get_name() == "extra.bin"
    assert a1.get_data() == bytes(range(256))
    assert a1.mime == "application/octet-stream"

    # second round trip is byte-identical (true fixed point)
    once = serialize_document(reopened)
    assert serialize_document(parse_document(once)) == once


def test_attachment_params_survive_plain_roundtrip():
    """A parsed doc with NO explicit params serializes without the
    data-params attribute (fixed point unchanged for old corpora)."""
    doc = _doc()
    html = serialize_document(doc)
    assert b"data-params" not in html
    again = parse_document(html)
    assert again.get_attachment(0).params == {}


def test_set_bitmap_replaces_image_content():
    """set_bitmap analogue (pageobjects.py:417-430): pixels land in the
    object's data URI losslessly and survive a save/reopen."""
    from pypdfium2_ray.docmodel.bitmap import Bitmap
    from pypdfium2_ray.functions.png import decode_png

    doc = parse_document(
        b"<html><body><p>x</p>"
        b'<img src="http://example.com/old.png" alt="pic" '
        b'width="2" height="2"></body></html>')
    obj = next(o for o in doc.pages[0].objects if o.type == "image")

    bmp = Bitmap.new(4, 3, "BGR", fill=0)
    bmp.fill_rect(0, 0, 2, 3, (255, 0, 0))      # left half blue (BGR)
    obj.set_bitmap(bmp)
    assert obj.width == 4 and obj.height == 3
    assert obj.src.startswith("data:image/png;base64,")

    reopened = parse_document(serialize_document(doc))
    robj = next(o for o in reopened.pages[0].objects if o.type == "image")
    assert robj.alt == "pic" and (robj.width, robj.height) == (4, 3)
    import base64
    png = base64.b64decode(robj.src.split(",", 1)[1])
    px = decode_png(png)
    # PNG is RGB: the BGR (255,0,0) fill reads back as pure blue
    assert px.shape == (3, 4, 3)
    assert tuple(px[0, 0]) == (0, 0, 255)
    assert tuple(px[0, 3]) == (0, 0, 0)


def test_load_jpeg_from_bytes_stream_and_path(tmp_path):
    """load_jpeg analogue (pageobjects.py:360-412): bytes / stream / path
    sources; dims from the SOF header; non-JPEG refused loudly."""
    import base64
    import io

    from pypdfium2_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((5, 7, 3), np.uint8)
    img[:, :, 0] = 200
    data = encode_jpeg(img)

    doc = parse_document(b'<html><body><img src=""></body></html>')
    obj = next(o for o in doc.pages[0].objects if o.type == "image")

    obj.load_jpeg(data)
    assert (obj.width, obj.height) == (7, 5)
    assert obj.src.startswith("data:image/jpeg;base64,")

    obj.load_jpeg(io.BytesIO(data))
    assert (obj.width, obj.height) == (7, 5)

    p = tmp_path / "img.jpg"
    p.write_bytes(data)
    obj.load_jpeg(str(p))
    assert (obj.width, obj.height) == (7, 5)

    # round trip: the embedded stream decodes to the same pixels
    reopened = parse_document(serialize_document(doc))
    robj = next(o for o in reopened.pages[0].objects if o.type == "image")
    out = decode_jpeg(base64.b64decode(robj.src.split(",", 1)[1]))
    assert out.shape == (5, 7, 3)

    with pytest.raises(ValueError, match="Failed to load JPEG"):
        obj.load_jpeg(b"not a jpeg")


def test_write_methods_reject_text_objects():
    text_obj = PageObject(type="text", level=0, bounds=(0, 0, 1, 1))
    with pytest.raises(RuntimeError):
        text_obj.set_bitmap(None)
    with pytest.raises(RuntimeError):
        text_obj.load_jpeg(b"\xff\xd8")


def test_images_roundtrip_in_multipage_docs():
    """Per-page image object sets survive serialize∘parse (order kept,
    page assignment kept); bounds/level re-derive (documented)."""
    doc = parse_document(
        b"<html><body><p>a</p>"
        b'<img src="data:image/gif;base64,R0lGOD" width="3" height="4">'
        b"<pb><p>b</p>"
        b'<img src="s2" alt="two"><img src="s3">'
        b"</body></html>")
    reopened = parse_document(serialize_document(doc))
    assert len(reopened.pages) == 2
    imgs0 = [o for o in reopened.pages[0].objects if o.type == "image"]
    imgs1 = [o for o in reopened.pages[1].objects if o.type == "image"]
    assert [(o.src, o.alt, o.width, o.height) for o in imgs0] == \
        [("data:image/gif;base64,R0lGOD", "", 3, 4)]
    assert [(o.src, o.alt) for o in imgs1] == [("s2", "two"), ("s3", "")]
