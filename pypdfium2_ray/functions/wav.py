"""Minimal from-scratch RIFF/WAVE codec (stdlib struct + numpy only).

The audio leg of the multimodal tier (SURVEY §2.2 M15 widened): like
``functions/png.py`` / ``bmp.py`` / ``gif.py`` for images, this gives the
audio decode stage a REAL parser with zero external dependencies —
payloads stay opaque ``binary`` columns and the Ray-side plumbing
(schema, batch sizing, actor signature) is exercised end-to-end.

Supported: canonical RIFF/WAVE with PCM integer (format tag 1; 8/16/24/
32-bit) and IEEE float32 (tag 3) samples, any channel count, unknown
chunks skipped with the even-byte padding rule. Encoding writes the
canonical 44-byte-header layout.
"""

from __future__ import annotations

import struct

import numpy as np

#: dtype -> (format_tag, bits_per_sample) for encoding
_ENC = {
    np.dtype(np.uint8): (1, 8),
    np.dtype(np.int16): (1, 16),
    np.dtype(np.int32): (1, 32),
    np.dtype(np.float32): (3, 32),
}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize ``samples`` (``(n,)`` or ``(n, channels)``; uint8 /
    int16 / int32 / float32) as a canonical WAVE file."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype not in _ENC:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    tag, bits = _ENC[samples.dtype]
    channels = samples.shape[1]
    block_align = channels * bits // 8
    data = np.ascontiguousarray(samples).tobytes()
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_meta(payload: bytes) -> dict | None:
    """Chunk-walk the container; returns ``{format_tag, channels,
    sample_rate, bits_per_sample, n_samples, data_offset, data_size}``
    or ``None`` when the payload is not a well-formed WAVE file."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > len(payload):
            return None                      # truncated chunk
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, body)
        elif cid == b"data":
            data = (body, size)
        pos = body + size + (size & 1)       # even-byte padding rule
    if fmt is None or data is None:
        return None
    tag, channels, rate, _, _, bits = fmt
    if channels == 0 or bits == 0 or rate == 0:
        return None
    frame = channels * bits // 8
    # sub-byte depths (frame 0: e.g. 4-bit ADPCM) parse as a container
    # but are not PCM-frameable — decode_wav refuses them loudly
    return {"format_tag": tag, "channels": channels, "sample_rate": rate,
            "bits_per_sample": bits,
            "n_samples": data[1] // frame if frame else 0,
            "data_offset": data[0], "data_size": data[1]}


def decode_wav(payload: bytes):
    """Decode to ``(samples, meta)`` with ``samples`` shaped
    ``(n_samples, channels)`` — uint8 / int16 / int32 (24-bit widened)
    / float32 by source depth. ``None`` for unparseable payloads;
    raises ``ValueError`` for parseable-but-unsupported codecs (loud,
    like the image tier's unsupported-format row)."""
    meta = parse_wav_meta(payload)
    if meta is None:
        return None
    tag, bits = meta["format_tag"], meta["bits_per_sample"]
    off, size = meta["data_offset"], meta["data_size"]
    ch = meta["channels"]
    n = meta["n_samples"]
    raw = payload[off:off + (n * ch * bits // 8)]
    if tag == 1 and bits == 8:
        s = np.frombuffer(raw, np.uint8)
    elif tag == 1 and bits == 16:
        s = np.frombuffer(raw, "<i2")
    elif tag == 1 and bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        s = (b[:, 0].astype(np.int32)
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        s = (s << 8) >> 8                    # sign-extend 24 -> 32
    elif tag == 1 and bits == 32:
        s = np.frombuffer(raw, "<i4")
    elif tag == 3 and bits == 32:
        s = np.frombuffer(raw, "<f4")
    else:
        raise ValueError(
            f"unsupported WAVE codec: format_tag={tag} bits={bits}")
    return s.reshape(-1, ch), meta
