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


#: PNG color types -> (channels, colorspace name)
_PNG_COLOR = {0: (1, "gray"), 2: (3, "rgb"), 3: (1, "palette"),
              4: (2, "gray-alpha"), 6: (4, "rgba")}


def parse_image_meta_full(data: bytes) -> dict | None:
    """Full header metadata: the reference's ``FPDF_IMAGEOBJ_METADATA``
    field set (``/root/reference/src/pypdfium2/_helpers/pageobjects.py``
    ``get_metadata``: width/height/dpi/bits_per_pixel/colorspace),
    recovered from the file headers instead of PDFium structs. Returns
    ``{format,width,height,bpp,colorspace,dpi_x,dpi_y}`` or ``None``;
    dpi is 0 when the payload carries no density (PDFium likewise reports
    0 for images without one)."""
    base = parse_image_meta(data)
    if base is None:
        return None
    fmt, w, h = base
    out = dict(format=fmt, width=w, height=h, bpp=0, colorspace="",
               dpi_x=0, dpi_y=0)
    if fmt == "png":
        depth, ctype = data[24], data[25]
        ch, cs = _PNG_COLOR.get(ctype, (0, ""))
        out.update(bpp=depth * ch, colorspace=cs)
        # chunk walk (never substring-search: compressed IDAT bytes can
        # contain any tag) — pHYs precedes IDAT per spec
        pos = 8
        while pos + 8 <= len(data):
            clen = struct.unpack(">I", data[pos:pos + 4])[0]
            ctype = data[pos + 4:pos + 8]
            if ctype in (b"IDAT", b"IEND"):
                break
            if ctype == b"pHYs" and pos + 17 <= len(data):
                ppux, ppuy, unit = struct.unpack(
                    ">IIB", data[pos + 8:pos + 17])
                if unit == 1:                   # pixels per metre
                    out.update(dpi_x=round(ppux * 0.0254),
                               dpi_y=round(ppuy * 0.0254))
                break
            pos += 12 + clen
    elif fmt == "bmp":
        if len(data) >= 46:
            bpp = struct.unpack("<H", data[28:30])[0]
            xppm, yppm = struct.unpack("<ii", data[38:46])
            out.update(bpp=bpp,
                       colorspace="palette" if bpp <= 8 else "rgb",
                       dpi_x=round(xppm * 0.0254) if xppm > 0 else 0,
                       dpi_y=round(yppm * 0.0254) if yppm > 0 else 0)
    elif fmt == "gif":
        out.update(bpp=(data[10] & 0x07) + 1, colorspace="palette")
    elif fmt == "jpeg":
        sof = _jpeg_sof(data)
        if sof is not None:
            precision, ncomp = sof
            cs = {1: "gray", 3: "ycbcr", 4: "cmyk"}.get(ncomp, "")
            out.update(bpp=precision * ncomp, colorspace=cs)
        # JFIF APP0 is pinned to the first marker segment by spec
        if data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00" \
                and len(data) >= 18:
            unit, dx, dy = struct.unpack(">BHH", data[13:18])
            if unit == 1:                       # dots per inch
                out.update(dpi_x=dx, dpi_y=dy)
            elif unit == 2:                     # dots per cm
                out.update(dpi_x=round(dx * 2.54), dpi_y=round(dy * 2.54))
    return out


def _jpeg_sof(data: bytes) -> tuple[int, int] | None:
    """(sample precision, component count) from the SOF segment."""
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 10 > n:
                return None
            return data[i + 4], data[i + 9]
        i += 2 + seg_len
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
