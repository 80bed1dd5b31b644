"""Minimal PNM (PGM/PPM) encoder — the second saver engine.

The reference selects among saver engines per format/performance
(``cli/render.py`` PIL vs numpy+cv2 guidance); this container has neither
library, so the engine *hierarchy* is exercised with two stdlib engines:
PNG (``functions/png.py``, compressed) and PNM (this module, raw binary —
the fastest possible encode, the "numpy engine" role). Byte-deterministic.
"""

from __future__ import annotations

import numpy as np


def encode_pnm(img: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, 1) -> binary PGM (P5); (h, w, 3) -> PPM (P6);
    (h, w, 4) drops the alpha channel (PNM has no alpha — use the PNG
    engine for transparency-preserving output)."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    elif img.ndim == 3 and img.shape[2] == 4:
        img = img[:, :, :3]
    if img.dtype != np.uint8:
        raise ValueError("uint8 only")
    h, w = img.shape[:2]
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    header = b"%s\n%d %d\n255\n" % (magic, w, h)
    return header + np.ascontiguousarray(img).tobytes()


def decode_pnm(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_pnm` (P5/P6 binary, maxval 255)."""
    parts = data.split(b"\n", 3)
    if len(parts) < 4 or parts[0] not in (b"P5", b"P6") or parts[2] != b"255":
        raise ValueError("unsupported PNM")
    w, h = (int(x) for x in parts[1].split())
    c = 1 if parts[0] == b"P5" else 3
    arr = np.frombuffer(parts[3][:h * w * c], np.uint8)
    if arr.size != h * w * c:
        raise ValueError("truncated PNM")
    return arr.reshape(h, w) if c == 1 else arr.reshape(h, w, c)
