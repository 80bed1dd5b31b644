"""Minimal deterministic BMP decoder AND encoder (stdlib struct + numpy).

Second real pixel format next to :mod:`pypdfium2_ray.functions.png` —
the reference's ``get_data``/``get_bitmap`` path decodes any
PDFium-supported stream (``pageobjects.py:433-515``); uncompressed BMP is
a struct read over documented headers, so the resize/feature tier handles
mixed PNG+BMP corpora without image libraries.

Scope: BITMAPINFOHEADER family (header size >= 40), BI_RGB (uncompressed)
only, 24/32 bpp, bottom-up (positive height) and top-down (negative
height) row order, 4-byte-padded scanlines. Everything else raises
``ValueError`` (callers turn that into status rows).
"""

from __future__ import annotations

import struct

import numpy as np

#: BI_RGB — the only compression mode supported
_BI_RGB = 0


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> uint8 array (h, w, 3) RGB (24 bpp) or (h, w, 4) RGBA
    (32 bpp; BMP's 4th channel is alpha-or-reserved, passed through)."""
    if not data.startswith(b"BM") or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != _BI_RGB or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bad dimensions")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3                 # rows pad to 4 bytes
    if len(data) < pix_off + stride * h:
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(data, np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)
    if not top_down:                            # bottom-up storage
        px = px[::-1]
    # stored BGR(A) -> RGB(A)
    order = [2, 1, 0] if nch == 3 else [2, 1, 0, 3]
    return np.ascontiguousarray(px[:, :, order])


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 array (h, w)/(h, w, 1)/(h, w, 3) -> 24 bpp; (h, w, 4) ->
    32 bpp. Bottom-up BI_RGB, byte-deterministic."""
    if img.dtype != np.uint8:
        raise ValueError("uint8 only")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    h, w, nch = img.shape
    if nch not in (3, 4):
        raise ValueError(f"unsupported shape {img.shape}")
    bpp = nch * 8
    order = [2, 1, 0] if nch == 3 else [2, 1, 0, 3]
    bgr = img[::-1][:, :, order]                # bottom-up, RGB(A)->BGR(A)
    stride = (w * nch + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * nch] = bgr.reshape(h, w * nch)
    pix = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, _BI_RGB,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix
