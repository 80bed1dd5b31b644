"""From-scratch baseline JPEG codec (stdlib + numpy) — the fourth REAL
pixel format of the multimodal tier.

The reference decodes DCT streams through PDFium's filters
(``/root/reference/src/pypdfium2/_helpers/pageobjects.py:433-515``, and
``load_jpeg`` on the write side, ``cli/imgtopdf.py:44-46``); this
container has no image libraries, so the tier carries its own codec
(PNG: ``functions/png``; BMP: ``functions/bmp``; GIF: ``functions/gif``;
JPEG/JFIF: here). Implemented from the public ITU-T T.81 spec:

- **Encoder**: baseline sequential, 8-bit, YCbCr (JFIF full-range
  BT.601) or grayscale, Annex-K quantization tables scaled by the
  libjpeg quality convention, Annex-K standard Huffman tables, optional
  2x2 chroma subsampling (4:2:0). Forward DCT is one ``einsum`` over all
  blocks; only the entropy coding is per-coefficient Python (inherently
  sequential bit output).
- **Decoder**: baseline sequential (SOF0) with arbitrary 1-2 sampling
  factors, multiple DQT/DHT segments, restart intervals, byte
  unstuffing. Entropy decoding is the per-symbol Python loop every JPEG
  decoder has; everything after it (dequant, inverse zigzag, IDCT,
  upsample, color convert) is vectorized over ALL blocks at once.
  Progressive (SOF2) and arithmetic-coded streams are REFUSED loudly —
  no silent wrong pixels.

Lossy by design: round-trip tests assert PSNR bounds and exact
metadata, not byte equality (quantization is the format's contract).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — public spec constants)

#: zigzag order: index i of the zigzag sequence -> position in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64).reshape(8, 8)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

#: Annex K standard Huffman specs: (bits-per-length[1..16], values)
_DC_LUMA = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
            tuple(range(12)))
_DC_CHROMA = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
              tuple(range(12)))
_AC_LUMA = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))
_AC_CHROMA = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA))

#: orthonormal DCT-II basis (row k applied to spatial axis)
_C = np.array([[np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])


class JpegFormatError(ValueError):
    """Not a decodable baseline JPEG — loud by design."""


# --------------------------------------------------------------------------
# Huffman code construction (shared)

def _build_codes(bits, values):
    """Canonical codes per T.81 C.2: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, values):
    """(length, code) -> symbol, for the bit-serial decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, coded value) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, plane, _C)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to multiples of 8 (edge replicate) and tile into (n, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    return blocks, hb, wb


def _encode_plane_blocks(blocks: np.ndarray, quant: np.ndarray,
                         dc_codes, ac_codes, writer: _BitWriter,
                         pred: int) -> int:
    """Entropy-code quantized blocks (already in encode order); returns
    the new DC predictor."""
    q = np.round(blocks / quant).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]
    for row in zz:
        dc = int(row[0])
        s, coded = _magnitude(dc - pred)
        pred = dc
        c, ln = dc_codes[s]
        writer.write(c, ln)
        if s:
            writer.write(coded, s)
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]         # ZRL
                writer.write(c, ln)
                run -= 16
            s, coded = _magnitude(v)
            c, ln = ac_codes[(run << 4) | s]
            writer.write(c, ln)
            writer.write(coded, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]             # EOB
            writer.write(c, ln)
    return pred


def _dht_segment(tclass: int, tid: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes for a (h, w) grayscale or (h, w, 3) RGB uint8
    array. ``subsample=True`` emits 4:2:0 (2x2 luma sampling);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (crash-isolation in real encoders; here also the fixture
    generator for the decoder's restart path). Both are also decoder
    fixtures for the general-MCU and RST paths."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("need (h,w) gray or (h,w,3) RGB")
    if gray and subsample:
        raise ValueError("subsampling needs color input")

    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    dc_l = _build_codes(*_DC_LUMA)
    ac_l = _build_codes(*_AC_LUMA)
    dc_c = _build_codes(*_DC_CHROMA)
    ac_c = _build_codes(*_AC_CHROMA)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsample:
            # pad to even then 2x2 box average
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
        planes = [y, cb, cr]

    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            b"\x01\x01\x00\x00\x01\x00\x01\x00\x00")          # APP0
    zz_l = ql.reshape(-1)[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + \
        bytes(int(v) for v in zz_l)
    if not gray:
        zz_c = qc.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + \
            bytes(int(v) for v in zz_c)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytearray(b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp]))
    samp_y = 0x22 if subsample else 0x11
    sof += bytes([1, samp_y if not gray else 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytearray(bytes([ncomp]))
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11]) + bytes([3, 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    writer = _BitWriter()
    mcu_done = 0
    rst_idx = 0

    def maybe_restart():
        """Flush-align and emit RSTn between restart intervals (markers
        bypass byte stuffing by design); DC predictors reset."""
        nonlocal mcu_done, rst_idx, preds
        mcu_done += 1
        if restart_interval and mcu_done % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
            rst_idx += 1
            preds = [0] * len(preds)

    if gray or not subsample:
        # one MCU per block per component, components interleaved per MCU
        comp_blocks = []
        hb = wb = 0
        for ci, plane in enumerate(planes):
            blocks, hb, wb = _to_blocks(plane - 128.0)
            comp_blocks.append(_fdct_blocks(blocks))
        preds = [0] * len(planes)
        quants = [ql] + [qc] * (len(planes) - 1)
        dcs = [dc_l] + [dc_c] * (len(planes) - 1)
        acs = [ac_l] + [ac_c] * (len(planes) - 1)
        for m in range(hb * wb):
            for ci in range(len(planes)):
                preds[ci] = _encode_plane_blocks(
                    comp_blocks[ci][m:m + 1], quants[ci], dcs[ci],
                    acs[ci], writer, preds[ci])
            maybe_restart()
    else:
        # 4:2:0: MCU = 4 luma blocks (2x2) + 1 Cb + 1 Cr
        yb, yhb, ywb = _to_blocks(planes[0] - 128.0)
        # luma block grid padded to EVEN block counts for 2x2 MCUs
        if yhb % 2 or ywb % 2:
            grid = yb.reshape(yhb, ywb, 8, 8)
            grid = np.pad(grid, ((0, yhb % 2), (0, ywb % 2), (0, 0), (0, 0)),
                          mode="edge")
            yhb, ywb = grid.shape[:2]
            yb = grid.reshape(-1, 8, 8)
        cbb, chb, cwb = _to_blocks(planes[1] - 128.0)
        crb, _, _ = _to_blocks(planes[2] - 128.0)
        yd = _fdct_blocks(yb).reshape(yhb, ywb, 8, 8)
        cbd = _fdct_blocks(cbb).reshape(chb, cwb, 8, 8)
        crd = _fdct_blocks(crb).reshape(chb, cwb, 8, 8)
        preds = [0, 0, 0]
        for my in range(yhb // 2):
            for mx in range(ywb // 2):
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_plane_blocks(
                            yd[2 * my + dy, 2 * mx + dx][None], ql,
                            dc_l, ac_l, writer, preds[0])
                preds[1] = _encode_plane_blocks(
                    cbd[my, mx][None], qc, dc_c, ac_c, writer, preds[1])
                preds[2] = _encode_plane_blocks(
                    crd[my, mx][None], qc, dc_c, ac_c, writer, preds[2])
                maybe_restart()
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        self.nbits = 0


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w) uint8 for grayscale streams, (h, w, 3) RGB otherwise.
    Baseline sequential only — SOF2/arithmetic/hierarchical raise
    :class:`JpegFormatError`, as do torn/corrupt streams."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:
        raise JpegFormatError(f"truncated or corrupt JPEG: {exc}") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise JpegFormatError(f"marker expected at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                     # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                           # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                     # DQT (possibly several)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    raise JpegFormatError("16-bit quant tables unsupported")
                t = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int64)
                quant[tq] = t[_UNZIGZAG].reshape(8, 8)
                p += 64
        elif marker == 0xC4:                   # DHT (possibly several)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = tuple(seg[p + 1:p + 17])
                nv = sum(bits)
                values = tuple(seg[p + 17:p + 17 + nv])
                table = _build_decode(bits, values)
                (ac_tables if tc else dc_tables)[th] = table
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegFormatError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(dict(id=cid, h=samp >> 4, v=samp & 0x0F, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) unsupported")
        elif marker == 0xDD:                   # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                   # SOS -> entropy data follows
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, pos, frame, sel, quant,
                                dc_tables, ac_tables, restart)
    raise JpegFormatError("no scan data")


def _decode_scan(data, pos, frame, sel, quant, dc_tables, ac_tables,
                 restart):
    # entropy segment: up to the next non-RST marker; unstuff 0xFF00
    chunks = []
    p = pos
    n = len(data)
    while p < n:
        b = data.find(b"\xff", p)
        if b < 0 or b + 1 >= n:
            chunks.append(data[p:])
            p = n
            break
        chunks.append(data[p:b])
        nxt = data[b + 1]
        if nxt == 0x00:
            chunks.append(b"\xff")
            p = b + 2
        elif 0xD0 <= nxt <= 0xD7:
            chunks.append(b"\xff" + bytes([nxt]))   # keep RST for reader
            p = b + 2
        else:
            break
    stream = b"".join(chunks)

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise JpegFormatError("sampling factors beyond 2 unsupported")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]                # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)

    reader = _BitReader(stream)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                if (reader.pos + 1 < len(reader.data)
                        and reader.data[reader.pos] == 0xFF
                        and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7):
                    reader.pos += 2
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                dct, act = sel[c["id"]]
                dc_t, ac_t = dc_tables[dct], ac_tables[act]
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        row = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, dc_t)
                        diff = _extend(reader.bits(s), s) if s else 0
                        preds[c["id"]] += diff
                        row[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise JpegFormatError("AC index overflow")
                            row[k] = _extend(reader.bits(s), s)
                            k += 1
                        bi = (my * c["v"] + dy) * c["bw"] + mx * c["h"] + dx
                        c["coef"][bi] = row
            mcu_count += 1

    # vectorized tail: dequant + unzigzag + IDCT all blocks per component
    planes = []
    for c in comps:
        q = quant[c["tq"]].reshape(-1)[ZIGZAG]      # zigzag-order quant
        blocks = (c["coef"] * q)[:, _UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
