"""Render tier: deterministic grid raster, PosConv round-trips, PNG
encoder, and the render pipeline (cli/render.py:401-524 analogue)."""

import struct
import zlib

import numpy as np
import pytest

from pypdfium2_ray.docmodel.bitmap import Bitmap, PosConv, render_page
from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.functions.png import encode_png

HTML = b"<html><body><p>Hello</p><p>World wide</p></body></html>"


@pytest.fixture(scope="module")
def page():
    return parse_document(HTML)[0]


def test_render_size_and_determinism(page):
    bmp = render_page(page, scale=0.5)
    assert (bmp.width, bmp.height) == (298, 421)     # ceil(595*0.5), ceil(842*0.5)
    assert bmp.format == "GRAY" and bmp.stride == bmp.width
    again = render_page(page, scale=0.5)
    assert np.array_equal(bmp.to_numpy(), again.to_numpy())
    # ink exists, and only near the two text lines
    img = bmp.to_numpy()[..., 0]
    ink_rows = np.nonzero((img != 255).any(axis=1))[0]
    assert len(ink_rows) > 0
    # line 0 top = 782 -> bitmap y = (842-782)*0.5 = 30
    assert 28 <= ink_rows.min() <= 34
    assert ink_rows.max() <= 50                       # both lines near top


def test_render_rotation(page):
    b0 = render_page(page, scale=0.25)
    b90 = render_page(page, scale=0.25, rotation=90)
    assert (b90.width, b90.height) == (b0.height, b0.width)
    assert np.array_equal(b90.to_numpy()[..., 0],
                          np.rot90(b0.to_numpy()[..., 0]))


def test_posconv_roundtrip():
    for rot in (0, 90, 180, 270):
        conv = PosConv(595, 842, 2.0, rot, crop=(10, 5, 20, 15))
        for (x, y) in [(100, 200), (57.6, 782), (0, 0)]:
            px, py = conv.to_bitmap(x, y)
            x2, y2 = conv.to_page(px, py)
            assert abs(x2 - x) < 1e-9 and abs(y2 - y) < 1e-9


def test_posconv_charbox_alignment(page):
    """A char's page-space box maps to the pixels render_page inked."""
    tp = page.get_textpage()
    l, b, r, t = tp.get_charbox(0)
    conv = PosConv(page.width, page.height, 1.0)
    x0, y0 = conv.to_bitmap(l, t)
    bmp = render_page(page, scale=1.0)
    img = bmp.to_numpy()[..., 0]
    assert img[int(y0) + 1, int(x0) + 1] != 255       # inked


def test_fill_rect():
    bmp = Bitmap(10, 10, "GRAY", np.full((10, 10, 1), 255, np.uint8))
    bmp.fill_rect(2, 3, 4, 5, 0)
    img = bmp.to_numpy()[..., 0]
    assert (img[3:8, 2:6] == 0).all()
    assert img[0, 0] == 255


def test_png_encoder_valid():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    png = encode_png(img)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (10, 10)
    # decode IDAT back and verify pixels survive the round trip
    idat_start = png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", png[png.index(b"IDAT") - 4:png.index(b"IDAT")])[0]
    raw = zlib.decompress(png[idat_start:idat_start + idat_len])
    rows = [raw[i * 11 + 1:(i + 1) * 11] for i in range(10)]  # strip filter byte
    assert np.array_equal(np.frombuffer(b"".join(rows), np.uint8).reshape(10, 10), img)
    assert encode_png(img) == png                     # deterministic


def test_render_pipeline(ray_session, fixture_parquet):
    import ray.data as rd
    from pypdfium2_ray.stages.render import render_pipeline
    ds = rd.read_parquet(fixture_parquet)
    df = render_pipeline(ds, scale=0.25).to_pandas()
    text_pages = df[df["url"] == "https://fixtures.test/text"]
    assert len(text_pages) == 2 and (text_pages["status"] == "ok").all()
    assert (text_pages["format"] == "png").all()
    assert all(d.startswith(b"\x89PNG") for d in text_pages["data"])
    bad = df[df["url"] == "https://fixtures.test/malformed"]
    assert list(bad["status"]) == ["format_error"]
    # deterministic across runs
    df2 = render_pipeline(rd.read_parquet(fixture_parquet), scale=0.25).to_pandas()
    a = df.sort_values(["url", "page_idx"]).reset_index(drop=True)
    b = df2.sort_values(["url", "page_idx"]).reset_index(drop=True)
    assert list(a["data"]) == list(b["data"])


# ---------------------------------------------------------------------------
# round-2 additions: color formats, inversion, maker callback, engines,
# unsupported-handler registry


def _demo_page():
    from pypdfium2_ray.docmodel.model import Page
    return Page(index=0, lines=["ab", "cd"])


def test_render_color_formats_and_rev_byteorder():
    import numpy as np
    from pypdfium2_ray.docmodel.bitmap import render_page
    gray = render_page(_demo_page())
    bgr = render_page(_demo_page(), grayscale=False)
    rgb = render_page(_demo_page(), grayscale=False, rev_byteorder=True)
    bgra = render_page(_demo_page(), grayscale=False, alpha=True)
    assert gray.format == "GRAY" and gray.mode == "L"
    assert bgr.format == "BGR" and bgr.mode == "BGR"
    assert rgb.format == "BGR" and rgb.mode == "RGB"
    assert bgra.format == "BGRA" and bgra.mode == "BGRA"
    # rev_byteorder stores the same pixels with R/B swapped
    assert (rgb.data[..., ::-1] == bgr.data).all()
    # alpha channel fully opaque
    assert (bgra.data[..., 3] == 255).all()
    assert (bgra.data[..., :3] == bgr.data).all()
    assert np.ascontiguousarray(bgr.data).shape[2] == 3


def test_render_invert_and_bitmap_invert():
    from pypdfium2_ray.docmodel.bitmap import Bitmap, render_page
    base = render_page(_demo_page())
    inv = render_page(_demo_page(), invert=True)
    assert (inv.data == 255 - base.data).all()
    bgra = render_page(_demo_page(), grayscale=False, alpha=True)
    inv2 = bgra.invert()
    assert (inv2.data[..., :3] == 255 - bgra.data[..., :3]).all()
    assert (inv2.data[..., 3] == 255).all()              # alpha preserved
    b = Bitmap.new(4, 3, "GRAY", fill=10)
    assert (b.invert().data == 245).all()


def test_render_bitmap_maker_callback():
    from pypdfium2_ray.docmodel.bitmap import Bitmap, render_page
    made = []

    def maker(w, h, fmt, rev):
        bmp = Bitmap.new(w, h, fmt, fill=0, rev_byteorder=rev)
        made.append(bmp)
        return bmp

    out = render_page(_demo_page(), rotation=90, bitmap_maker=maker)
    assert out is made[0]
    ref = render_page(_demo_page(), rotation=90)
    assert (out.data == ref.data).all()


def test_saver_engine_registry():
    import numpy as np
    from pypdfium2_ray.docmodel.bitmap import render_page
    from pypdfium2_ray.functions.pnm import decode_pnm
    from pypdfium2_ray.stages.render import ENGINES, register_engine
    bmp = render_page(_demo_page())
    assert set(ENGINES) >= {"png", "pnm", "raw"}
    pnm = ENGINES["pnm"](bmp)
    assert (decode_pnm(pnm) == bmp.data[..., 0]).all()
    assert ENGINES["raw"](bmp) == bmp.to_bytes()

    register_engine("null", lambda b: b"")
    try:
        assert ENGINES["null"](bmp) == b""
    finally:
        del ENGINES["null"]


def test_pnm_roundtrip_rgb():
    import numpy as np
    from pypdfium2_ray.functions.pnm import decode_pnm, encode_pnm
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_pnm(encode_pnm(img)) == img).all()


def test_unsupported_handler_registry():
    from pypdfium2_ray.docmodel.htmldoc import parse_document
    from pypdfium2_ray.docmodel.unsupported import (
        KIND_CIRCULAR_TOC, clear_unsupported_handlers,
        set_unsupported_handler)
    hits = []
    set_unsupported_handler(lambda k, d: hits.append((k, d)))
    try:
        html = (b'<html><body><nav data-toc><ul>'
                b'<li data-page="0" id="a">A<ul>'
                b'<li data-page="0" id="b" data-ref="#a">B loops to A</li>'
                b'</ul></li></ul></nav><p>x</p></body></html>')
        doc = parse_document(html)
        assert any("circular" in w for w in doc.warnings)
        assert any(k == KIND_CIRCULAR_TOC for k, _ in hits)
        # a failing handler must not fail the parse
        clear_unsupported_handlers()
        set_unsupported_handler(lambda k, d: 1 / 0)
        doc2 = parse_document(html)
        assert doc2.ok
    finally:
        clear_unsupported_handlers()


# ---------------------------------------------------------------------------
# review-pass regression tests


def test_render_respects_page_rotation_property():
    """A page with /Rotate set must render its content rotated, not a
    blank canvas (PosConv must use NATIVE dims, not the swapped view)."""
    import numpy as np
    from pypdfium2_ray.docmodel.bitmap import render_page
    base = render_page(_demo_page())
    p = _demo_page()
    p.set_rotation(90)
    rot = render_page(p)
    assert (rot.data != 255).sum() == (base.data != 255).sum() > 0
    assert (rot.data[..., 0] == np.rot90(base.data[..., 0], 1)).all()
    # page /Rotate composes with the render arg
    p2 = _demo_page()
    p2.set_rotation(90)
    both = render_page(p2, rotation=270)
    assert (both.data == base.data).all()


def test_encode_engines_handle_bgra():
    from pypdfium2_ray.docmodel.bitmap import render_page
    from pypdfium2_ray.functions.png import decode_png
    from pypdfium2_ray.functions.pnm import decode_pnm
    from pypdfium2_ray.stages.render import ENGINES
    bgra = render_page(_demo_page(), grayscale=False, alpha=True)
    png = ENGINES["png"](bgra)
    arr = decode_png(png)
    assert arr.shape == (bgra.height, bgra.width, 4)
    assert (arr[..., :3] == bgra.data[..., 2::-1]).all()   # BGR -> RGB swap
    assert (arr[..., 3] == 255).all()
    pnm = ENGINES["pnm"](bgra)
    assert decode_pnm(pnm).shape == (bgra.height, bgra.width, 3)


def test_render_tuple_fill_reversed_with_rev_byteorder():
    from pypdfium2_ray.docmodel.bitmap import render_page
    fill = (200, 100, 50)
    bgr = render_page(_demo_page(), grayscale=False, fill_color=fill)
    rgb = render_page(_demo_page(), grayscale=False, fill_color=fill,
                      rev_byteorder=True)
    # the whole buffer (background AND glyphs) must be channel-reversed
    assert (rgb.data[..., ::-1] == bgr.data).all()


def test_render_new_empty_page_and_crop():
    """Reference test_rendering.py render_new analogue: a fresh empty page
    renders as a blank canvas of its media box size; crop shrinks it."""
    from pypdfium2_ray.docmodel.model import Document
    from pypdfium2_ray.docmodel.bitmap import render_page
    pdf = Document.new()
    page = pdf.new_page(200, 100)
    bmp = render_page(page)
    assert (bmp.width, bmp.height) == (200, 100)
    assert (bmp.data == 255).all()                    # blank
    cropped = render_page(page, crop=(10, 5, 30, 15))  # l, b, r, t
    assert (cropped.width, cropped.height) == (160, 80)
