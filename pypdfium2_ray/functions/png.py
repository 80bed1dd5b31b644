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


def _defilter(rows: np.ndarray, pw: int, ph: int, bpp: int) -> np.ndarray:
    """Invert the five PNG scanline filters over a (sub-)image of ``ph``
    rows x ``pw`` pixel groups of ``bpp`` filter bytes each. ``rows`` is
    the ``(ph, 1 + pw*bpp)`` filtered bytes; returns ``(ph, pw*bpp)``
    uint8.

    All filter math is explicit-modulo-256 (widen, mask, narrow) — PNG's
    defined wraparound, no reliance on numpy overflow behavior. Sub is a
    per-lane cumulative sum (fully vectorized); Average/Paeth have a true
    sequential dependency along x, so the loop runs per PIXEL GROUP with
    all bpp lanes vectorized — O(w) python steps per scanline, not
    O(w*bpp) per byte.
    """
    stride = pw * bpp
    filters = rows[:, 0]
    img = np.zeros((ph, stride), dtype=np.uint8)
    for y in range(ph):
        line = rows[y, 1:]
        f = filters[y]
        prev = img[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            img[y] = line
        elif f == 2:                                   # Up
            img[y] = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif f == 1:                                   # Sub: lane cumsum
            lanes = line.reshape(pw, bpp)
            img[y] = (np.cumsum(lanes, axis=0, dtype=np.uint64) & 0xFF
                      ).astype(np.uint8).reshape(stride)
        elif f == 3:                                   # Average
            lanes = line.reshape(pw, bpp).astype(np.uint16)
            pl = prev.reshape(pw, bpp).astype(np.uint16)
            out_px = np.empty((pw, bpp), np.uint8)
            left = np.zeros(bpp, np.uint16)
            for x in range(pw):
                left = (lanes[x] + ((left + pl[x]) >> 1)) & 0xFF
                out_px[x] = left
            img[y] = out_px.reshape(stride)
        elif f == 4:                                   # Paeth
            lanes = line.reshape(pw, bpp).astype(np.int16)
            pl = prev.reshape(pw, bpp).astype(np.int16)
            out_px = np.empty((pw, bpp), np.uint8)
            left = np.zeros(bpp, np.int16)
            ul = np.zeros(bpp, np.int16)
            for x in range(pw):
                left = (lanes[x] + _paeth(left, pl[x], ul)) & 0xFF
                out_px[x] = left
                ul = pl[x]
            img[y] = out_px.reshape(stride)
        else:
            raise ValueError(f"bad filter {f}")
    return img


#: Adam7 pass grid: (x offset, y offset, x step, y step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, (h, w, 4) RGBA.

    Supports bit depths 8 and 16 (16-bit samples are truncated to their
    high byte, PDFium-style 8-bit output), all byte-aligned colortypes —
    0 gray / 2 RGB / 3 palette (depth 8) / 4 gray+alpha / 6 RGBA — and
    Adam7 interlacing (each pass de-filtered as its own sub-image, then
    scattered on the pass grid). The full inverse of :func:`encode_png`
    plus everything 8/16-bit foreign PNGs use; only sub-byte depths
    (1/2/4) stay out of scope.
    """
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG")
    w = h = None
    channels = bps = interlace = 0
    colortype = -1
    idat = []
    plte = None
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if (depth not in (8, 16) or colortype not in (0, 2, 3, 4, 6)
                    or (colortype == 3 and depth != 8) or interlace > 1):
                raise ValueError(
                    f"unsupported PNG (depth={depth} colortype={colortype}"
                    f" interlace={interlace})")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
            bps = depth // 8
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    bpp = channels * bps
    if not interlace:
        if len(raw) != h * (w * bpp + 1):
            raise ValueError("scanline size mismatch")
        rows = np.frombuffer(raw, np.uint8).reshape(h, w * bpp + 1)
        img = _defilter(rows, w, h, bpp)
    else:                                       # Adam7: 7 scattered passes
        img = np.zeros((h, w * bpp), np.uint8)
        view = img.reshape(h, w, bpp)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if not pw or not ph:
                continue
            size = ph * (pw * bpp + 1)
            rows = np.frombuffer(raw[pos:pos + size], np.uint8) \
                .reshape(ph, pw * bpp + 1)
            pos += size
            sub = _defilter(rows, pw, ph, bpp).reshape(ph, pw, bpp)
            view[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ValueError("interlaced scanline size mismatch")
    if bps == 2:                                # 16-bit: keep the high byte
        img = img.reshape(h, w * channels, 2)[:, :, 0]
    out = img.reshape(h, w, channels)
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[np.minimum(out[:, :, 0], len(plte) - 1)]
    return out[:, :, 0] if channels == 1 else out
