"""Minimal deterministic PNG encoder AND decoder (stdlib zlib/struct only).

The saver-engine tier of the reference (``cli/render.py:242-369``) needs
PIL/cv2, absent from this container — but PNG itself is just zlib over
filtered scanlines, so the "PIL engine" role is filled by ~40 lines of
stdlib each way. Fixed compression level => byte-deterministic output.
The decoder is the real-image path behind the multimodal decode stage
(``pageobjects.py:433-515`` ``get_bitmap`` analogue for PNG payloads):
8-bit grayscale (colortype 0) and RGB (colortype 2), all five scanline
filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, compress_level: int = 6,
               pixel_format: str = "RGB") -> bytes:
    """uint8 array (h, w)/(h, w, 1) -> grayscale PNG; (h, w, 3) -> RGB
    (colortype 2); (h, w, 4) -> RGBA (colortype 6).

    ``pixel_format="BGR"``/``"BGRA"`` reverses the COLOR channels first
    (alpha stays last), so a BGR(A)-labeled render buffer
    (docmodel/bitmap.py FORMATS, the PDFium-native order) encodes with
    correct colors instead of swapped red/blue.
    """
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim == 2:
        colortype = 0
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        if pixel_format in ("BGR", "BGRA"):
            img = np.concatenate([img[:, :, 2::-1], img[:, :, 3:]], axis=2)
            img = np.ascontiguousarray(img)
        colortype = 2 if img.shape[2] == 3 else 6
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    if img.dtype != np.uint8:
        raise ValueError("uint8 only")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # filter byte 0 (None) per scanline
    flat = img.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[i].tobytes() for i in range(h))
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, compress_level))
            + _chunk(b"IEND", b""))


def _iter_chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i:i + 4])
        tag = data[i + 4:i + 8]
        yield tag, data[i + 8:i + 8 + length]
        i += 12 + length                      # len + tag + payload + crc


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int16 arrays (any shape); returns int16."""
    a = a.astype(np.int16, copy=False)
    b = b.astype(np.int16, copy=False)
    c = c.astype(np.int16, copy=False)
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) gray or (h, w, 3) RGB.

    Supports bit depth 8, colortypes 0/2/6 (gray/RGB/RGBA), no interlace —
    the full inverse of :func:`encode_png` plus all five PNG scanline
    filters (the encoder only emits filter 0, but foreign PNGs use the
    rest).
    """
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG")
    w = h = None
    channels = 0
    idat = []
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or colortype not in (0, 2, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} colortype={colortype}"
                    f" interlace={interlace})")
            channels = {0: 1, 2: 3, 6: 4}[colortype]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    img = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    # All filter math is explicit-modulo-256 (widen, mask, narrow) — PNG's
    # defined wraparound, with no reliance on numpy overflow behavior.
    # Sub is a per-lane cumulative sum (fully vectorized); Average/Paeth
    # have a true sequential dependency along x, so the loop runs per
    # PIXEL with all bpp lanes vectorized — O(w) python steps per
    # scanline, not O(w*bpp) per byte.
    for y in range(h):
        line = rows[y, 1:]
        f = filters[y]
        prev = img[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            img[y] = line
        elif f == 2:                                   # Up
            img[y] = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif f == 1:                                   # Sub: lane cumsum
            lanes = line.reshape(w, bpp)
            img[y] = (np.cumsum(lanes, axis=0, dtype=np.uint64) & 0xFF
                      ).astype(np.uint8).reshape(stride)
        elif f == 3:                                   # Average
            lanes = line.reshape(w, bpp).astype(np.uint16)
            pl = prev.reshape(w, bpp).astype(np.uint16)
            out_px = np.empty((w, bpp), np.uint8)
            left = np.zeros(bpp, np.uint16)
            for x in range(w):
                left = (lanes[x] + ((left + pl[x]) >> 1)) & 0xFF
                out_px[x] = left
            img[y] = out_px.reshape(stride)
        elif f == 4:                                   # Paeth
            lanes = line.reshape(w, bpp).astype(np.int16)
            pl = prev.reshape(w, bpp).astype(np.int16)
            out_px = np.empty((w, bpp), np.uint8)
            left = np.zeros(bpp, np.int16)
            ul = np.zeros(bpp, np.int16)
            for x in range(w):
                left = (lanes[x] + _paeth(left, pl[x], ul)) & 0xFF
                out_px[x] = left
                ul = pl[x]
            img[y] = out_px.reshape(stride)
        else:
            raise ValueError(f"bad filter {f}")
    out = img.reshape(h, w, channels)
    return out[:, :, 0] if channels == 1 else out
