"""From-scratch GIF codec (stdlib only) — the third REAL pixel format.

The reference decodes any PDFium-supported stream via PDFium filters
(``/root/reference/src/pypdfium2/_helpers/pageobjects.py:433-515``); this
container has no image libraries, so the multimodal tier carries its own
decoders (PNG: ``functions/png``; BMP: ``functions/bmp``; GIF: here). GIF
is GIF87a/89a per the W3C spec: logical screen descriptor, color tables,
sub-blocked LZW image data with growing code width (<= 12 bits), optional
interlacing (a pure row permutation on decode).

LZW is inherently sequential (each code extends the previous string), so
the decoder is a per-code Python loop — O(codes), not O(pixels), since a
code can emit a many-pixel run. The encoder uses the
spec-sanctioned minimal-compression form: a clear code before every pixel
code, keeping the code width fixed at ``min_code_size + 1`` — simple,
valid everywhere, and fine for the resize round-trip (payload size is
bounded by ~1.5 bytes/pixel). Nearest-neighbor resize only gathers
existing pixels, so a resized GIF always fits its source palette.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace pass layout: (row offset, row step) per pass
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _color_table(data: bytes, pos: int, flags: int) -> tuple[np.ndarray | None, int]:
    if not flags & 0x80:
        return None, pos
    n = 2 << (flags & 0x07)
    table = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
    return table, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at *pos*; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        pos += n


def _lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dict as a list of byte strings; indices < clear are single bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    bitbuf = bitlen = 0
    prev: bytes | None = None
    for byte in payload:
        bitbuf |= byte << bitlen
        bitlen += 8
        while bitlen >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            bitlen -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):          # the KwKwK special case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
    return np.frombuffer(bytes(out[:n_pixels].ljust(n_pixels, b"\0")),
                         np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF as an ``(h, w, 3)`` uint8 RGB array."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags = struct.unpack("<HHB", data[6:11])
    gct, pos = _color_table(data, 13, flags)
    while pos < len(data):
        block = data[pos]
        if block == 0x21:                     # extension: label + sub-blocks
            _, pos = _sub_blocks(data, pos + 2)
        elif block == 0x2C:                   # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
            lct, pos = _color_table(data, pos + 10, iflags)
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError("GIF frame without color table")
            min_code_size = data[pos]
            payload, pos = _sub_blocks(data, pos + 1)
            idx = _lzw_decode(payload, min_code_size, w * h).reshape(h, w)
            if iflags & 0x40:                 # interlaced: row permutation
                rows = np.concatenate([np.arange(off, h, step)
                                       for off, step in _INTERLACE])
                de = np.empty_like(idx)
                de[rows] = idx
                idx = de
            return palette[np.minimum(idx, len(palette) - 1)]
        elif block == 0x3B:                   # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF has no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` RGB (or ``(h, w)`` grayscale) uint8 array as
    a GIF87a. Requires <= 256 distinct colors (true for any image resized
    from a decoded GIF — gather never invents colors)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[:, :, :3]
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.uint32)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    colors, idx = np.unique(packed, return_inverse=True)
    palette = np.stack([(colors >> 16) & 255, (colors >> 8) & 255,
                        colors & 255], axis=1).astype(np.uint8)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    bits = max(2, int(len(palette) - 1).bit_length())  # table size 2^bits
    table = np.zeros((1 << bits, 3), np.uint8)
    table[:len(palette)] = palette

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4 | (bits - 1),
                       0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)   # image descriptor
    mcs = bits
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    # minimal-compression stream: CLEAR before every pixel code => the
    # table never grows and the code width stays fixed (spec-valid)
    codes = np.empty(2 * idx.size + 2, np.uint32)
    codes[0::2][:idx.size + 1] = clear
    codes[1::2][:idx.size] = idx
    codes[-1] = end
    # vectorized bit packing: each code contributes `width` bits at offset
    # i*width; accumulate into a little-endian bit vector via np.packbits
    n_bits = codes.size * width
    bit_idx = (np.arange(codes.size, dtype=np.int64)[:, None] * width +
               np.arange(width, dtype=np.int64)[None, :])
    bit_val = (codes[:, None] >> np.arange(width, dtype=np.uint32)) & 1
    bitvec = np.zeros(-(-n_bits // 8) * 8, np.uint8)
    bitvec[bit_idx.ravel()] = bit_val.ravel().astype(np.uint8)
    payload = np.packbits(bitvec, bitorder="little").tobytes()

    out.append(mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)                              # sub-block terminator
    out.append(0x3B)                           # trailer
    return bytes(out)
