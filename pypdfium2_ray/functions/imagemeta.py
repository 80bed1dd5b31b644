"""From-scratch image header parsers (stdlib struct only).

The reference's image-data path (``pageobjects.py:433-515`` ``get_data`` /
``get_bitmap``) decodes via PDFium filters; this container has no image
libraries, but the *metadata* tier (format sniff + dimensions) is just a
few struct unpacks over documented file headers — so that tier is real,
not stubbed: PNG (IHDR), GIF (logical screen descriptor), BMP
(BITMAPINFOHEADER), JPEG (SOF scan). Pixel decode beyond PNG stays gated
(see stages/multimodal.DecodeImage).
"""

from __future__ import annotations

import struct

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: JPEG SOF markers that carry dimensions (all frame types, including
#: progressive), excluding DHT/DAC/RST which reuse nearby codes
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_meta(data: bytes) -> tuple[str, int, int] | None:
    """``(format, width, height)`` sniffed from the payload header, or
    ``None`` if no known magic matches / the header is truncated."""
    if data.startswith(_PNG_MAGIC):
        return _png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _gif(data)
    if data.startswith(b"BM"):
        return _bmp(data)
    if data.startswith(b"\xff\xd8"):
        return _jpeg(data)
    return None


def _png(data: bytes):
    # 8-byte magic, 4-byte length, b"IHDR", then width/height big-endian
    if len(data) < 24 or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return ("png", w, h)


def _gif(data: bytes):
    if len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return ("gif", w, h)


def _bmp(data: bytes):
    if len(data) < 26:
        return None
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size >= 40:                       # BITMAPINFOHEADER family
        w, h = struct.unpack("<ii", data[18:26])
        return ("bmp", w, abs(h))            # negative height = top-down rows
    if hdr_size == 12 and len(data) >= 22:   # ancient BITMAPCOREHEADER
        w, h = struct.unpack("<HH", data[18:22])
        return ("bmp", w, h)
    return None


def _jpeg(data: bytes):
    # walk marker segments until a SOF frame header (dims at offset +5)
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None                      # desynced / corrupt stream
        marker = data[i + 1]
        if marker == 0xFF:                   # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2                           # standalone marker, no length
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return ("jpeg", w, h)
        i += 2 + seg_len
    return None
