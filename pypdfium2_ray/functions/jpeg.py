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
- **Decoder**: baseline sequential (SOF0/1) AND progressive (SOF2 —
  T.81 Annex G spectral selection + successive approximation, EOBn
  runs, interleaved/non-interleaved DC scans, AC refinement, restart
  intervals; semantics cross-checked against the public libjpeg
  jdphuff.c and verified on a real libjpeg-progressive file), with
  arbitrary 1-2 sampling factors, multiple DQT/DHT segments, byte
  unstuffing. Entropy decoding is the per-symbol Python loop every JPEG
  decoder has; everything after it (dequant, inverse zigzag, IDCT,
  upsample, color convert) is vectorized over ALL blocks at once.
  Arithmetic-coded / lossless / hierarchical streams are REFUSED
  loudly — no silent wrong pixels. ``encode_jpeg(progressive=True)``
  emits a successive-approximation SOF2 stream whose quantized
  coefficients are identical to the baseline encode, so
  baseline-vs-progressive decodes must be bit-identical (the tests'
  round-trip contract).

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


# --------------------------------------------------------------------------
# progressive (SOF2) scan emission — T.81 Annex G, cross-checked against
# the public libjpeg jcphuff.c semantics (encode_mcu_DC/AC_first/refine).
# Uses the Annex-K Huffman tables (EOB runs restricted to EOB0, which
# every table codes); the decoder handles general EOBn for wild streams.

def _sos_header(specs, ss: int, se: int, ah: int, al: int) -> bytes:
    """*specs*: list of (component id, DC table id, AC table id)."""
    sos = bytearray([len(specs)])
    for cid, dcid, acid in specs:
        sos += bytes([cid, (dcid << 4) | acid])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)


def _mcu_units(comps):
    """Data-unit order for a DC scan: interleaved MCU order over the
    padded grid (multi-component) or component raster (single)."""
    if len(comps) == 1:
        c = comps[0]
        return [[(c, r * c["bw"] + col)]
                for r in range(c["cbh"]) for col in range(c["cbw"])]
    mcuy = comps[0]["bh"] // comps[0]["v"]
    mcux = comps[0]["bw"] // comps[0]["h"]
    units = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for c in comps:
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        mcu.append((c, (my * c["v"] + dy) * c["bw"]
                                    + mx * c["h"] + dx))
            units.append(mcu)
    return units


class _ScanWriter(_BitWriter):
    """BitWriter with RSTn emission between restart intervals."""

    def __init__(self, restart: int):
        super().__init__()
        self.restart = restart
        self._done = 0
        self._rst = 0

    def unit_boundary(self) -> bool:
        """Call after each data unit; True if a restart was just emitted
        (callers reset predictors / EOB state)."""
        self._done += 1
        if self.restart and self._done % self.restart == 0:
            self.flush()
            self.out += bytes([0xFF, 0xD0 + (self._rst & 7)])
            self._rst += 1
            return True
        return False


def _enc_ac_first_block(w, zzrow, ss, se, al, ac_codes):
    band = zzrow[ss:se + 1]
    vals = np.sign(band) * (np.abs(band) >> al)   # point transform
    nz = np.flatnonzero(vals)
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for i in range(last):
        v = int(vals[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
        s, coded = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(coded, s)
        run = 0
    if last < len(band):
        c, ln = ac_codes[0x00]                    # EOB0 (run of 1)
        w.write(c, ln)


def _enc_ac_refine_block(w, zzrow, ss, se, al, ac_codes):
    """libjpeg encode_mcu_AC_refine: newly-nonzero coefficients (|v|>>Al
    == 1) carry a sign bit; history-nonzero ones buffer a correction bit
    that flushes with the next emitted symbol (ZRL / new coefficient /
    EOB), preserving the decoder's position-order bit reads."""
    band = zzrow[ss:se + 1]
    t = np.abs(band) >> al
    new_nz = np.flatnonzero(t == 1)
    last = int(new_nz[-1]) + 1 if len(new_nz) else 0
    run = 0
    br: list[int] = []
    for i in range(last):
        ti = int(t[i])
        if ti == 0:
            run += 1
            continue
        while run > 15:                           # can't fold into EOB
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if ti > 1:                                # history-nonzero
            br.append(ti & 1)
            continue
        c, ln = ac_codes[(run << 4) | 1]          # newly nonzero
        w.write(c, ln)
        w.write(1 if int(band[i]) > 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        run = 0
    tail = [int(t[i]) & 1 for i in range(last, len(band)) if t[i] > 1]
    if last < len(band) or br or tail:
        c, ln = ac_codes[0x00]                    # EOB0 + tail corrections
        w.write(c, ln)
        for b in br + tail:
            w.write(b, 1)


def _emit_progressive_scans(out, planes, gray, subsample, ql, qc,
                            dc_l, ac_l, dc_c, ac_c, restart):
    # quantized zigzag coefficient planes, identical to the baseline path
    comps = []
    if gray or not subsample:
        for ci, plane in enumerate(planes):
            blocks, hb, wb = _to_blocks(plane - 128.0)
            q = ql if ci == 0 else qc
            zz = np.round(_fdct_blocks(blocks) / q).astype(np.int64) \
                .reshape(-1, 64)[:, ZIGZAG]
            comps.append(dict(
                id=ci + 1, zz=zz, bw=wb, bh=hb, cbw=wb, cbh=hb, h=1, v=1,
                dc=dc_l if ci == 0 else dc_c, ac=ac_l if ci == 0 else ac_c,
                dcid=0 if ci == 0 else 1, acid=0 if ci == 0 else 1))
    else:
        yb, yhb, ywb = _to_blocks(planes[0] - 128.0)
        cbh_y, cbw_y = yhb, ywb                   # pre-padding luma dims
        if yhb % 2 or ywb % 2:
            grid = yb.reshape(yhb, ywb, 8, 8)
            grid = np.pad(grid, ((0, yhb % 2), (0, ywb % 2), (0, 0), (0, 0)),
                          mode="edge")
            yhb, ywb = grid.shape[:2]
            yb = grid.reshape(-1, 8, 8)
        zz_y = np.round(_fdct_blocks(yb) / ql).astype(np.int64) \
            .reshape(-1, 64)[:, ZIGZAG]
        comps.append(dict(id=1, zz=zz_y, bw=ywb, bh=yhb,
                          cbw=cbw_y, cbh=cbh_y, h=2, v=2,
                          dc=dc_l, ac=ac_l, dcid=0, acid=0))
        for cid, plane in ((2, planes[1]), (3, planes[2])):
            b, hb2, wb2 = _to_blocks(plane - 128.0)
            zz = np.round(_fdct_blocks(b) / qc).astype(np.int64) \
                .reshape(-1, 64)[:, ZIGZAG]
            comps.append(dict(id=cid, zz=zz, bw=wb2, bh=hb2,
                              cbw=wb2, cbh=hb2, h=1, v=1,
                              dc=dc_c, ac=ac_c, dcid=1, acid=1))

    units = _mcu_units(comps)

    # scan 1: DC first, Al=1 (interleaved)
    out += _sos_header([(c["id"], c["dcid"], 0) for c in comps], 0, 0, 0, 1)
    w = _ScanWriter(restart)
    preds = {c["id"]: 0 for c in comps}
    for mcu in units:
        for c, bi in mcu:
            dc = int(c["zz"][bi, 0]) >> 1         # arithmetic point shift
            s, coded = _magnitude(dc - preds[c["id"]])
            preds[c["id"]] = dc
            code, ln = c["dc"][s]
            w.write(code, ln)
            if s:
                w.write(coded, s)
        if w.unit_boundary():
            preds = {cid: 0 for cid in preds}
    w.flush()
    out += w.out

    # scan 2: DC refinement, Ah=1 -> Al=0 (raw bits, no Huffman)
    out += _sos_header([(c["id"], c["dcid"], 0) for c in comps], 0, 0, 1, 0)
    w = _ScanWriter(restart)
    for mcu in units:
        for c, bi in mcu:
            w.write(int(c["zz"][bi, 0]) & 1, 1)
        w.unit_boundary()
    w.flush()
    out += w.out

    # scans 3..: per component, AC 1-63 first at Al=1 then refine to Al=0
    for ah, al in ((0, 1), (1, 0)):
        for c in comps:
            out += _sos_header([(c["id"], 0, c["acid"])], 1, 63, ah, al)
            w = _ScanWriter(restart)
            for row in range(c["cbh"]):
                for col in range(c["cbw"]):
                    zzrow = c["zz"][row * c["bw"] + col]
                    if ah == 0:
                        _enc_ac_first_block(w, zzrow, 1, 63, al, c["ac"])
                    else:
                        _enc_ac_refine_block(w, zzrow, 1, 63, al, c["ac"])
                    w.unit_boundary()
            w.flush()
            out += w.out


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Baseline JFIF bytes for a (h, w) grayscale or (h, w, 3) RGB uint8
    array. ``subsample=True`` emits 4:2:0 (2x2 luma sampling);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (crash-isolation in real encoders; here also the fixture
    generator for the decoder's restart path). Both are also decoder
    fixtures for the general-MCU and RST paths.

    ``progressive=True`` emits SOF2 with a successive-approximation
    progression (DC first at Al=1 + DC refinement, then per-component
    AC 1-63 at Al=1 + AC refinement — T.81 Annex G), exercising every
    progressive decode path. The quantized coefficients are IDENTICAL to
    the baseline encoding of the same input, so baseline and progressive
    encodes of one image must decode to bit-identical pixels — the
    round-trip contract the tests pin."""
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
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = 1 if gray else 3
    sof = bytearray(b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp]))
    samp_y = 0x22 if subsample else 0x11
    sof += bytes([1, samp_y if not gray else 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _emit_progressive_scans(out, planes, gray, subsample, ql, qc,
                                dc_l, ac_l, dc_c, ac_c, restart_interval)
        out += b"\xff\xd9"                                    # EOI
        return bytes(out)
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
    Baseline sequential (SOF0/1) AND progressive (SOF2, spectral
    selection + successive approximation, T.81 Annex G) — arithmetic /
    lossless / hierarchical raise :class:`JpegFormatError`, as do
    torn/corrupt streams."""
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
    progressive = False
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
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegFormatError("only 8-bit precision supported")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(dict(id=cid, h=samp >> 4, v=samp & 0x0F, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02x}): "
                "only baseline (SOF0/1) and progressive (SOF2)")
        elif marker == 0xDD:                   # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                   # SOS -> entropy data follows
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            sel = {}
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
                scan_comps.append(cs)
            if not progressive:
                return _decode_scan(data, pos, frame, sel, quant,
                                    dc_tables, ac_tables, restart)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _alloc_coefs(frame)
            stream, pos = _entropy_stream(data, pos)
            _decode_prog_scan(stream, frame, scan_comps, sel,
                              ss, se, ahal >> 4, ahal & 0x0F,
                              dc_tables, ac_tables, restart)
    if progressive and frame is not None and "coef" in frame["comps"][0]:
        return _finish(frame, quant)
    raise JpegFormatError("no scan data")


def _alloc_coefs(frame) -> None:
    """Per-component coefficient planes (zigzag order), sized once at the
    first scan: MCU-padded grid (interleaved scans) with the component's
    OWN block dims alongside (T.81 A.1.1: non-interleaved scans cover
    ceil(dim * sampling/max_sampling / 8) blocks, not the padded grid)."""
    comps = frame["comps"]
    if "coef" in comps[0]:
        return
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise JpegFormatError("sampling factors beyond 2 unsupported")
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = mcux = -(-frame["w"] // (8 * hmax))
    frame["mcuy"] = mcuy = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        cw = -(-frame["w"] * c["h"] // hmax)   # ceil(w * Hi / Hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        c["cbw"] = -(-cw // 8)
        c["cbh"] = -(-ch // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)


def _entropy_stream(data, pos) -> tuple[bytes, int]:
    """Entropy segment starting at *pos*: up to the next non-RST marker,
    0xFF00 unstuffed, RSTn kept inline for the reader. Returns the stream
    and the offset of the next marker's 0xFF (or len(data))."""
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
            p = b
            break
    return b"".join(chunks), p


def _skip_rst(reader: _BitReader) -> None:
    """Byte-align and consume an RSTn marker if one is next."""
    reader.align()
    if (reader.pos + 1 < len(reader.data)
            and reader.data[reader.pos] == 0xFF
            and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7):
        reader.pos += 2


def _decode_scan(data, pos, frame, sel, quant, dc_tables, ac_tables,
                 restart):
    stream, _ = _entropy_stream(data, pos)
    _alloc_coefs(frame)
    comps = frame["comps"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]

    reader = _BitReader(stream)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                _skip_rst(reader)
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
    return _finish(frame, quant)


def _finish(frame, quant) -> np.ndarray:
    """Shared vectorized tail: dequant + unzigzag + IDCT all blocks per
    component, upsample, color-convert."""
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
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


# --------------------------------------------------------------------------
# progressive (SOF2) scan decoding — T.81 Annex G.2, cross-checked against
# the public libjpeg jdphuff.c semantics (decode_mcu_DC_first/refine,
# decode_mcu_AC_first/refine)

def _decode_prog_scan(stream, frame, scan_comps, sel, ss, se, ah, al,
                      dc_tables, ac_tables, restart):
    """One progressive scan into the frame's coefficient planes.

    DC scans (Ss=0, Se=0) may interleave all components (MCU order over
    the padded grid); AC scans (Ss>=1) are single-component by spec and
    walk the component's OWN block grid in raster order. First scans
    (Ah=0) entropy-decode values at precision Al; refinement scans
    (Ah=Al+1) add one bit of precision per coefficient."""
    comps = {c["id"]: c for c in frame["comps"]}
    reader = _BitReader(stream)
    if ss == 0:
        if se != 0:
            raise JpegFormatError(
                "progressive DC scan must have Se=0 (got "
                f"Ss={ss}, Se={se})")
        _prog_dc_scan(reader, frame, scan_comps, comps, sel, ah, al,
                      dc_tables, restart)
    else:
        if len(scan_comps) != 1:
            raise JpegFormatError(
                "progressive AC scans are single-component by spec")
        if not (1 <= ss <= se <= 63):
            raise JpegFormatError(f"bad spectral band {ss}..{se}")
        c = comps[scan_comps[0]]
        ac_t = ac_tables[sel[c["id"]][1]]
        _prog_ac_scan(reader, c, ss, se, ah, al, ac_t, restart)


def _prog_dc_scan(reader, frame, scan_comps, comps, sel, ah, al,
                  dc_tables, restart):
    preds = {cid: 0 for cid in scan_comps}
    if len(scan_comps) > 1:
        # interleaved: MCU order over the padded grid, like baseline
        units = []
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                mcu = []
                for cid in scan_comps:
                    c = comps[cid]
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            bi = (my * c["v"] + dy) * c["bw"] \
                                + mx * c["h"] + dx
                            mcu.append((c, bi))
                units.append(mcu)
    else:
        # non-interleaved: raster over the component's own blocks,
        # one data unit per "MCU" for restart accounting
        c = comps[scan_comps[0]]
        units = [[(c, row * c["bw"] + col)]
                 for row in range(c["cbh"]) for col in range(c["cbw"])]

    for i, mcu in enumerate(units):
        if restart and i and i % restart == 0:
            _skip_rst(reader)
            preds = {cid: 0 for cid in preds}
        for c, bi in mcu:
            if ah == 0:
                dc_t = dc_tables[sel[c["id"]][0]]
                s = _huff_decode(reader, dc_t)
                diff = _extend(reader.bits(s), s) if s else 0
                preds[c["id"]] += diff
                c["coef"][bi, 0] = preds[c["id"]] << al
            else:
                if reader.bit():
                    c["coef"][bi, 0] |= 1 << al


def _prog_ac_scan(reader, c, ss, se, ah, al, ac_t, restart):
    eobrun = 0
    blocks = ((row * c["bw"] + col)
              for row in range(c["cbh"]) for col in range(c["cbw"]))
    for i, bi in enumerate(blocks):
        if restart and i and i % restart == 0:
            _skip_rst(reader)
            eobrun = 0
        coef = c["coef"][bi]
        if ah == 0:
            eobrun = _ac_first_block(reader, coef, ss, se, al, ac_t, eobrun)
        else:
            eobrun = _ac_refine_block(reader, coef, ss, se, al, ac_t, eobrun)


def _ac_first_block(reader, coef, ss, se, al, ac_t, eobrun) -> int:
    if eobrun:
        return eobrun - 1           # whole band stays zero this block
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:             # ZRL
                k += 16
                continue
            eobrun = 1 << r         # EOBn: this block + (eobrun-1) more
            if r:
                eobrun += reader.bits(r)
            return eobrun - 1
        k += r
        if k > se:
            raise JpegFormatError("AC index overflow")
        coef[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, coef, ss, se, al, ac_t, eobrun) -> int:
    """T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: newly-nonzero
    coefficients arrive as +-1<<Al; every history-nonzero coefficient
    passed over (and the whole tail under an EOB run) receives one
    correction bit."""
    p1, m1 = 1 << al, -1 << al

    def correct(k_):
        if reader.bit() and not (coef[k_] & p1):
            coef[k_] += p1 if coef[k_] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break           # tail handled below under the EOB run
                # ZRL: skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise JpegFormatError(
                        "AC refinement magnitude must be 1")
                val = p1 if reader.bit() else m1
            # advance r zero-history positions (16 for ZRL), correcting
            # history-nonzero coefficients along the way
            while k <= se:
                if coef[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise JpegFormatError("AC refine overflow")
                coef[k] = val
            k += 1
    if eobrun:
        while k <= se:              # correction bits for the band tail
            if coef[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun
