"""Bitmap + page rasterization (render tier, SURVEY §2.2 M21-M23).

The reference's ``PdfBitmap`` is a row-major byte buffer with
``width/height/stride/format/rev_byteorder`` and zero-copy numpy views
(``bitmap.py:49-67, 221-247``); ``page.render`` rasterizes via PDFium
(``page.py:354-494``). Here the "renderer" is a deterministic rasterization
of the docmodel's monospace layout grid: each non-whitespace char inks its
tight charbox with a codepoint-derived gray level, so output pixels are a
pure function of (page, scale, rotation, crop) — bit-reproducible across
machines and actor counts, and cheap enough for corpus-scale runs.

``PdfPosConv`` (bitmap.py:354-395) becomes :class:`PosConv`: page<->bitmap
coordinate mapping under the same render args.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from pypdfium2_ray.docmodel.model import Page

#: supported pixel formats -> channel count (consts.py:31-66 analogue)
FORMATS = {"GRAY": 1, "BGR": 3, "BGRA": 4}

#: degrees <-> raw rotation constants (the reference's RotationToConst /
#: RotationToDegrees, internal/consts.py:20-27; raw values are PDFium's
#: 0..3 quarter-turn encoding)
ROTATION_TO_CONST = {0: 0, 90: 1, 180: 2, 270: 3}
ROTATION_TO_DEGREES = {v: k for k, v in ROTATION_TO_CONST.items()}


def auto_bitmap_format(fill_color: tuple[int, int, int, int] = (255, 255, 255, 255),
                       grayscale: bool = False,
                       has_transparency: bool = False) -> str:
    """Pick the render bitmap format the way the reference does
    (``page.py:495-505`` ``_auto_bitmap_format``): a non-opaque fill or a
    transparent page needs the alpha channel (BGRA); otherwise grayscale
    wins if requested, else BGR (the BGRx variant has no analogue here —
    our buffers have no padding channel)."""
    if fill_color[3] < 255 or has_transparency:
        return "BGRA"
    if grayscale:
        return "GRAY"
    return "BGR"


def color_tohex(color: tuple[int, int, int, int], rev_byteorder: bool = False) -> int:
    """Pack an (r, g, b, a) 0-255 color into the 32-bit ARGB word the
    render API takes (reference ``internal/utils.py:9-24`` ``color_tohex``;
    with ``rev_byteorder`` the RGB channels are swapped to ABGR, matching
    the reference's FPDF_REVERSE_BYTE_ORDER interpretation)."""
    if not all(0 <= c <= 255 for c in color):
        raise ValueError("Color value exceeds boundaries.")
    r, g, b, a = color
    channels = (a, b, g, r) if rev_byteorder else (a, r, g, b)
    packed = 0
    for c in channels:
        packed = (packed << 8) | c
    return packed


@dataclass
class Bitmap:
    """Row-major pixel buffer; ``data`` is a numpy array of shape
    (height, stride_px, channels) viewed zero-copy (bitmap.py:221-247).

    ``rev_byteorder`` mirrors the reference's FPDF_REVERSE_BYTE_ORDER
    interpretation (bitmap.py:49-67): the color channels of a BGR(A)
    buffer are stored R..B instead of B..R — :attr:`mode` reports the
    effective channel order."""
    width: int
    height: int
    format: str
    data: np.ndarray          # uint8 (h, w, c)
    rev_byteorder: bool = False

    @property
    def stride(self) -> int:
        return self.width * FORMATS[self.format]

    @property
    def mode(self) -> str:
        """PIL-style mode string (reference ``bitmap.py`` get_info/mode):
        GRAY -> L; BGR/BGRA flip to RGB/RGBA under ``rev_byteorder``."""
        if self.format == "GRAY":
            return "L"
        base = {"BGR": ("BGR", "RGB"), "BGRA": ("BGRA", "RGBA")}[self.format]
        return base[1] if self.rev_byteorder else base[0]

    @classmethod
    def new(cls, width: int, height: int, format: str = "GRAY",
            fill: int | tuple = 255, rev_byteorder: bool = False) -> "Bitmap":
        """Allocate + fill (``PdfBitmap.new_native`` + ``fill_rect`` whole
        canvas, bitmap.py:79-117)."""
        c = FORMATS[format]
        buf = np.empty((height, width, c), dtype=np.uint8)
        buf[:] = fill
        return cls(width, height, format, buf, rev_byteorder)

    def to_numpy(self) -> np.ndarray:
        """Zero-copy view (bitmap.py:221-247)."""
        return self.data

    def to_bytes(self) -> bytes:
        return self.data.tobytes()

    def fill_rect(self, left: int, top: int, width: int, height: int,
                  value: int | tuple) -> None:
        """bitmap.py:151-167 ``fill_rect`` (top-left origin, like PDFium)."""
        self.data[top:top + height, left:left + width] = value

    def invert(self) -> "Bitmap":
        """Color-inverted copy (the reference render's inverted color
        scheme, ``page.py`` color_scheme post-processing analogue); the
        alpha channel, if any, is preserved."""
        out = self.data.copy()
        n_color = 1 if self.format == "GRAY" else 3
        out[..., :n_color] = 255 - out[..., :n_color]
        return Bitmap(self.width, self.height, self.format, out,
                      self.rev_byteorder)


class PosConv:
    """Page <-> bitmap coordinate translation for given render args
    (``PdfPosConv``, bitmap.py:354-395). Page origin bottom-left, bitmap
    origin top-left; rotation in {0, 90, 180, 270} (counter-clockwise page
    rotation, page.py:78-92 convention)."""

    def __init__(self, page_width: float, page_height: float, scale: float,
                 rotation: int = 0, crop: tuple = (0, 0, 0, 0)):
        assert rotation in (0, 90, 180, 270)
        self.pw, self.ph = page_width, page_height
        self.scale, self.rotation = scale, rotation
        self.crop = crop   # (left, bottom, right, top) in page units

    @property
    def size(self) -> tuple[int, int]:
        cl, cb, cr, ct = self.crop
        w = (self.pw - cl - cr) * self.scale
        h = (self.ph - cb - ct) * self.scale
        if self.rotation in (90, 270):
            w, h = h, w
        return max(1, math.ceil(w)), max(1, math.ceil(h))

    @property
    def _unrotated_size(self) -> tuple[float, float]:
        cl, cb, cr, ct = self.crop
        return (self.pw - cl - cr) * self.scale, (self.ph - cb - ct) * self.scale

    def to_bitmap(self, x: float, y: float) -> tuple[float, float]:
        """Page point -> bitmap (px, py), float pixels (top-left origin).
        Rotation follows ``np.rot90(img, rotation//90)``: 90 = ccw."""
        cl, cb, cr, ct = self.crop
        u = (x - cl) * self.scale
        v = (self.ph - ct - y) * self.scale      # flip to top-left origin
        w0, h0 = self._unrotated_size
        if self.rotation == 0:
            return u, v
        if self.rotation == 90:
            return v, w0 - u
        if self.rotation == 180:
            return w0 - u, h0 - v
        return h0 - v, u                          # 270

    def to_page(self, px: float, py: float) -> tuple[float, float]:
        """Bitmap pixel -> page point (inverse of :meth:`to_bitmap`)."""
        cl, cb, cr, ct = self.crop
        w0, h0 = self._unrotated_size
        if self.rotation == 0:
            u, v = px, py
        elif self.rotation == 90:
            u, v = w0 - py, px
        elif self.rotation == 180:
            u, v = w0 - px, h0 - py
        else:
            u, v = py, h0 - px
        x = u / self.scale + cl
        y = self.ph - ct - v / self.scale
        return x, y


def _ink_value(cp: int) -> int:
    """Deterministic gray level for a codepoint (0 = black ink on white)."""
    return (cp * 37) % 192


def _ink_color(cp: int) -> tuple[int, int, int]:
    """Deterministic (b, g, r) ink color for a codepoint — the color path's
    analogue of :func:`_ink_value` (same value in the green channel so a
    color render's luminance tracks the gray render)."""
    return ((cp * 83) % 192, (cp * 37) % 192, (cp * 59) % 192)


def render_page(page: Page, scale: float = 1.0, rotation: int = 0,
                crop: tuple = (0, 0, 0, 0), grayscale: bool = True,
                fill_color: int | tuple = 255, alpha: bool = False,
                rev_byteorder: bool = False, invert: bool = False,
                bitmap_maker=None) -> Bitmap:
    """Rasterize one page (page.render analogue, page.py:354-494).

    Each non-space char fills its tight charbox with its codepoint-derived
    gray value (GRAY) or color (BGR/BGRA); rotation rotates the finished
    raster (0/90/180/270). ``rev_byteorder`` stores color channels R..B
    (the FPDF_REVERSE_BYTE_ORDER render path); ``invert`` applies the
    inverted color scheme. ``bitmap_maker`` is the X1 buffer-strategy
    callback (reference page.py ``bitmap_maker=PdfBitmap.new_*``): called
    as ``maker(width, height, format, rev_byteorder)`` with the FINAL
    (post-rotation) dims, must return a :class:`Bitmap` whose buffer the
    rendered pixels are written into."""
    assert rotation in (0, 90, 180, 270)
    # the page's own /Rotate view property composes with the render arg
    # (PDFium renders the page pre-rotated; the arg adds on top)
    rotation = (rotation + getattr(page, "rotation", 0)) % 360
    # NATIVE (unrotated) page dims: charboxes live in native coordinates,
    # and Page.width/height swap under /Rotate — using them here would
    # flip the canvas out from under the glyph geometry and silently
    # render nothing
    l0, b0, r0, t0 = page.get_bbox()
    conv = PosConv(r0 - l0, t0 - b0, scale, 0, crop)
    w, h = conv.size
    fmt = "GRAY" if grayscale else ("BGRA" if alpha else "BGR")
    c = FORMATS[fmt]
    img = np.empty((h, w, c), dtype=np.uint8)
    if (not np.isscalar(fill_color) and rev_byteorder and fmt != "GRAY"):
        # a tuple fill is (b, g, r[, a]) like the ink colors — store its
        # color channels reversed too, or background and glyphs would
        # disagree on channel order within one buffer
        fc = tuple(fill_color)
        fill_color = tuple(reversed(fc[:3])) + fc[3:]
    img[:] = fill_color
    if fmt == "BGRA" and np.isscalar(fill_color):
        img[..., 3] = 255

    tp = page.get_textpage()
    for idx in range(tp.count_chars()):
        ch = tp.text[idx]
        if ch in ("\r", "\n", " "):
            continue
        l, b, r, t = tp.get_charbox(idx)
        x0, y0 = conv.to_bitmap(l, t)
        x1, y1 = conv.to_bitmap(r, b)
        xi0, yi0 = max(0, int(x0)), max(0, int(y0))
        xi1, yi1 = min(w, math.ceil(x1)), min(h, math.ceil(y1))
        if xi1 > xi0 and yi1 > yi0:
            if fmt == "GRAY":
                ink: int | tuple = _ink_value(ord(ch))
            else:
                col = _ink_color(ord(ch))
                if rev_byteorder:
                    col = col[::-1]
                ink = col if fmt == "BGR" else (*col, 255)
            img[yi0:yi1, xi0:xi1] = ink

    k = {0: 0, 90: 1, 180: 2, 270: 3}[rotation]
    if k:
        img = np.ascontiguousarray(np.rot90(img, k))
    if invert:
        n_color = 1 if fmt == "GRAY" else 3
        img[..., :n_color] = 255 - img[..., :n_color]
    fh, fw = img.shape[:2]
    if bitmap_maker is not None:
        bmp = bitmap_maker(fw, fh, fmt, rev_byteorder)
        bmp.data[:] = img
        return bmp
    return Bitmap(fw, fh, fmt, img, rev_byteorder and fmt != "GRAY")
