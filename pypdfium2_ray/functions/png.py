"""Minimal deterministic PNG encoder (stdlib zlib/struct only).

The saver-engine tier of the reference (``cli/render.py:242-369``) needs
PIL/cv2, absent from this container — but PNG itself is just zlib over
filtered scanlines, so the "PIL engine" role is filled by ~40 lines of
stdlib. Fixed compression level => byte-deterministic output.

Supports 8-bit grayscale (colortype 0) and RGB (colortype 2).
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
    """uint8 array (h, w) or (h, w, 1) -> grayscale PNG; (h, w, 3) -> RGB.

    ``pixel_format="BGR"`` reverses the channel axis first, so a
    BGR-labeled render buffer (docmodel/bitmap.py FORMATS, the PDFium-native
    order) encodes with correct colors instead of swapped red/blue.
    """
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim == 2:
        colortype = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        if pixel_format == "BGR":
            img = np.ascontiguousarray(img[:, :, ::-1])
        colortype = 2
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
