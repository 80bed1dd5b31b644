"""Vectorized LEB128 varint codec — the posting-list compression
primitive (the classic inverted-index gap encoding: sorted doc ids ->
first value + deltas -> 7-bit variable-length bytes; see e.g. Manning,
Raghavan & Schütze, "Introduction to Information Retrieval" ch. 5 —
public literature).

Both directions are loop-free over the VALUE axis:

- encode: widths by 9 vectorized threshold compares (1 byte per 7
  bits), then one scatter per byte position (10 kernel launches,
  continuation bits set where position < width-1);
- decode: terminator bytes are those with the high bit clear; value
  boundaries by cumsum, per-byte shifts from position-in-value, one
  ``np.add.reduceat`` accumulates each value's 7-bit limbs.

Values are unsigned 64-bit (posting ids/gaps are nonnegative by
construction); max width 10 bytes.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_widths(vals: np.ndarray) -> np.ndarray:
    """Encoded byte width per value (int64 array), vectorized."""
    v = vals.astype(np.uint64, copy=False)
    w = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        w += (v >= t)
    return w


def varint_encode(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """``(buffer, widths)`` — LEB128 bytes of ``vals`` concatenated, and
    the per-value widths (so callers can segment the buffer without
    re-scanning it)."""
    v = vals.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    w = varint_widths(v)
    starts = np.concatenate(([0], np.cumsum(w)[:-1]))
    out = np.zeros(int(w.sum()), dtype=np.uint8)
    for j in range(10):
        m = w > j
        if not m.any():
            break
        limb = ((v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)) \
            .astype(np.uint8)
        cont = np.where(j < w[m] - 1, 0x80, 0).astype(np.uint8)
        out[starts[m] + j] = limb | cont
    return out.tobytes(), w


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varint_encode` -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    term = (b & 0x80) == 0
    if not term[-1]:
        raise ValueError("truncated varint stream")
    # value index per byte: 0-based, increments AFTER each terminator
    vid = np.concatenate(([0], np.cumsum(term)[:-1]))
    starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
    pos = np.arange(len(b), dtype=np.int64) - starts[vid]
    if pos.max() >= 10:
        raise ValueError("varint wider than 10 bytes")
    limbs = (b & np.uint8(0x7F)).astype(np.uint64) \
        << (np.uint64(7) * pos.astype(np.uint64))
    return np.bitwise_or.reduceat(limbs, starts)
