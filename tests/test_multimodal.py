"""Multimodal stage: real from-scratch header/pixel decode + md5 stub.

What IS real and tested here: the Arrow schemas, actor-pool execution,
batch flow, PNG/GIF/BMP/JPEG header parsing (functions/imagemeta), PNG
pixel decode round-trip (functions/png), and determinism of the fake
decode (PIL itself is absent from this container, so mode='pil' raises)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from pypdfium2_ray.functions.imagemeta import parse_image_meta
from pypdfium2_ray.functions.png import decode_png, encode_png
from pypdfium2_ray.stages.multimodal import (
    IMAGE_META_SCHEMA, DecodeImage, SampleFrames, decode_images)


@pytest.fixture(scope="module")
def payloads():
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "data": pa.array([b"\x89PNG fake one", b"JFIF fake two", b""],
                         pa.binary()),
    })


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _bmp(w, h):
    return (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + b"\x00" * 8)


def _jpeg(w, h):
    # SOI, APP0 stub, SOF0 with dims, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = (b"\xff\xc0" + struct.pack(">H", 8)
           + b"\x08" + struct.pack(">HH", h, w) + b"\x01")
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_parse_image_meta_formats():
    png = encode_png(np.zeros((7, 11), np.uint8))
    assert parse_image_meta(png) == ("png", 11, 7)
    assert parse_image_meta(_gif(321, 45)) == ("gif", 321, 45)
    assert parse_image_meta(_bmp(33, 44)) == ("bmp", 33, 44)
    assert parse_image_meta(_bmp(33, -44)) == ("bmp", 33, 44)  # top-down BMP
    assert parse_image_meta(_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert parse_image_meta(b"not an image") is None
    assert parse_image_meta(b"") is None
    assert parse_image_meta(b"\x89PNG\r\n\x1a\n\x00") is None  # truncated


def test_parse_image_meta_full_fields():
    """M14 full field set (the reference's FPDF_IMAGEOBJ_METADATA:
    bits_per_pixel / colorspace / dpi) recovered from real headers."""
    from pypdfium2_ray.functions.imagemeta import parse_image_meta_full

    gray = parse_image_meta_full(encode_png(np.zeros((7, 11), np.uint8)))
    assert (gray["bpp"], gray["colorspace"]) == (8, "gray")
    assert (gray["dpi_x"], gray["dpi_y"]) == (0, 0)     # no pHYs => 0
    rgb = parse_image_meta_full(
        encode_png(np.zeros((3, 4, 3), np.uint8)))
    assert (rgb["bpp"], rgb["colorspace"]) == (24, "rgb")

    # PNG with a pHYs chunk: 2835 px/m = 72 dpi (chunk-walked, never
    # substring-searched)
    png = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    phys = struct.pack(">I", 9) + b"pHYs" + struct.pack(">IIB", 2835, 5670, 1)
    phys += struct.pack(">I", zlib.crc32(phys[4:]))
    png[33:33] = phys                       # after the 25-byte IHDR chunk
    m = parse_image_meta_full(bytes(png))
    assert (m["dpi_x"], m["dpi_y"]) == (72, 144)

    # BMP pixels-per-metre fields
    from pypdfium2_ray.functions.bmp import encode_bmp
    bmp = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    bmp[28:30] = struct.pack("<H", 24)
    bmp[38:46] = struct.pack("<ii", 2835, 2835)
    m = parse_image_meta_full(bytes(bmp))
    assert (m["bpp"], m["colorspace"], m["dpi_x"]) == (24, "rgb", 72)

    # GIF: index depth from the screen-descriptor flags; palette space
    from pypdfium2_ray.functions.gif import encode_gif
    m = parse_image_meta_full(encode_gif(np.zeros((2, 2), np.uint8)))
    assert m["colorspace"] == "palette" and 1 <= m["bpp"] <= 8

    # JPEG: SOF precision x components; JFIF density in dpi units
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02"
            + struct.pack(">BHH", 1, 300, 600) + b"\x00\x00")
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + b"\x08" + struct.pack(">HH", 4, 6) + b"\x03" + b"\x00" * 2)
    m = parse_image_meta_full(b"\xff\xd8" + app0 + sof + b"\xff\xd9")
    assert (m["bpp"], m["colorspace"]) == (24, "ycbcr")
    assert (m["dpi_x"], m["dpi_y"]) == (300, 600)


def test_png_decode_roundtrip_gray_and_rgb():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()
    rgb = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()


def test_png_decode_all_filters():
    """Foreign encoders use filters 1-4; build scanlines by hand."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(5, 6), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

    raw = b""
    filters = [0, 1, 2, 3, 4]
    for y, f in enumerate(filters):
        line = img[y]
        prev = img[y - 1] if y else np.zeros(6, np.uint8)
        enc = np.zeros(6, np.uint8)
        for x in range(6):
            left = int(line[x - 1]) if x else 0
            up = int(prev[x])
            ul = int(prev[x - 1]) if x else 0
            v = int(line[x])
            if f == 0:
                enc[x] = v
            elif f == 1:
                enc[x] = (v - left) % 256
            elif f == 2:
                enc[x] = (v - up) % 256
            elif f == 3:
                enc[x] = (v - ((left + up) >> 1)) % 256
            else:
                enc[x] = (v - paeth(left, up, ul)) % 256
        raw += bytes([f]) + enc.tobytes()

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (decode_png(data) == img).all()


def test_png_decode_all_filters_rgb_warning_free():
    """Multi-channel (bpp=3) variant of the all-filters decode, run with
    warnings-as-errors: the wraparound arithmetic must be explicit modular
    math, not numpy overflow (which emits RuntimeWarning)."""
    import warnings

    rng = np.random.RandomState(7)
    h, w, c = 8, 5, 3
    img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)

    raw = b""
    for y in range(h):
        f = y % 5
        line = img[y].reshape(-1).astype(np.int16)
        prev = (img[y - 1] if y else np.zeros((w, c), np.uint8)
                ).reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(c, np.int16), line[:-c]])
        ul = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            enc = line - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = decode_png(data)
    assert (out == img).all()


def _make_png(ihdr_fields, raw, plte=None):
    from pypdfium2_ray.functions.png import _MAGIC, _chunk
    out = _MAGIC + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_png_decode_16bit_palette_grayalpha():
    """Foreign-PNG coverage: 16-bit samples (high-byte truncation,
    PDFium-style 8-bit output), palette (PLTE mapping), gray+alpha."""
    rng = np.random.default_rng(0)
    img16 = rng.integers(0, 65536, (9, 7), np.uint16)
    raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes()
                   for y in range(9))
    dec = decode_png(_make_png((7, 9, 16, 0, 0, 0, 0), raw))
    assert (dec == (img16 >> 8).astype(np.uint8)).all()

    # 16-bit RGB through the Up filter: filter bytes, not samples
    img16 = rng.integers(0, 65536, (5, 4, 3), np.uint16)
    be = img16.astype(">u2").view(np.uint8).reshape(5, 24)
    raw = b"".join(
        bytes([0 if y == 0 else 2]) +
        (be[y] if y == 0 else
         ((be[y].astype(np.int16) - be[y - 1]) % 256).astype(np.uint8)
         ).tobytes() for y in range(5))
    dec = decode_png(_make_png((4, 5, 16, 2, 0, 0, 0), raw))
    assert (dec == (img16 >> 8).astype(np.uint8)).all()

    pal = np.arange(24, dtype=np.uint8)
    idx = rng.integers(0, 8, (6, 5), np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    dec = decode_png(_make_png((5, 6, 8, 3, 0, 0, 0), raw, pal.tobytes()))
    assert (dec == pal.reshape(8, 3)[idx]).all()

    ga = rng.integers(0, 256, (4, 3, 2), np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    dec = decode_png(_make_png((3, 4, 8, 4, 0, 0, 0), raw))
    assert dec.shape == (4, 3, 2) and (dec == ga).all()


def test_png_decode_adam7_interlaced():
    """Adam7: each pass de-filtered as its own sub-image, scattered on the
    pass grid — decoded image equals the source at odd dims (11x13)."""
    from pypdfium2_ray.functions.png import _ADAM7
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (11, 13, 3), np.uint8)
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += b"".join(b"\x00" + sub[y].tobytes()
                        for y in range(sub.shape[0]))
    dec = decode_png(_make_png((13, 11, 8, 2, 0, 0, 1), raw))
    assert (dec == img).all()


def test_decode_image_headers_mode():
    png = encode_png(np.full((3, 4), 7, np.uint8))
    batch = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "data": pa.array([png, _gif(20, 10), b"junk"], pa.binary()),
    })
    out = DecodeImage(mode="headers", png_pixels=True)(batch)
    assert out.schema.equals(IMAGE_META_SCHEMA)
    assert out["status"].to_pylist() == ["ok", "ok", "unknown-format"]
    assert out["format"].to_pylist() == ["png", "gif", ""]
    assert out["width"].to_pylist() == [4, 20, 0]
    assert out["height"].to_pylist() == [3, 10, 0]
    feats = out["features"].to_pylist()
    assert feats[0] == pytest.approx([7 / 255.0, 0.0])   # mean, std
    assert feats[1] == [] and feats[2] == []


def test_decode_image_stub_schema_and_determinism(payloads):
    actor = DecodeImage(fake=True)
    out1 = actor(payloads)
    out2 = DecodeImage(fake=True)(payloads)
    assert out1.schema.equals(IMAGE_META_SCHEMA)
    assert out1.equals(out2)                              # deterministic fake
    assert out1["n_bytes"].to_pylist() == [13, 13, 0]
    feats = out1["features"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    assert all(0.0 <= v <= 1.0 for f in feats for v in f)


def test_decode_image_md5_twin():
    """The fake dims must equal the DuckDB md5_number_upper derivation —
    the invariant the decode_images oracle rests on (DuckDB 1.0 md5 is
    VARCHAR-only, so the oracle path always hashes UTF-8 text payloads)."""
    import duckdb
    texts = ["hello world", "", "Grüße, 世界"]
    batch = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "data": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
    })
    out = DecodeImage(fake=True)(batch)
    con = duckdb.connect()
    for i, t in enumerate(texts):
        upper = con.execute(
            "select md5_number_upper(?)", [t]).fetchone()[0]
        assert out["width"][i].as_py() == 64 + (upper & 255) % 192
        assert out["height"][i].as_py() == 64 + ((upper >> 8) & 255) % 192


def test_decode_image_pil_mode_gated():
    with pytest.raises(NotImplementedError):
        DecodeImage(mode="pil")


def test_decode_images_dataset(ray_session, payloads):
    import ray.data as rd
    ds = rd.from_arrow(payloads)
    out = decode_images(ds, mode="fake", batch_size=2).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"id", "status", "format", "width", "height",
                                "mode", "bpp", "colorspace", "dpi_x",
                                "dpi_y", "n_bytes", "features"}
    assert (out["width"] >= 64).all() and (out["width"] < 256).all()


def test_sample_frames(payloads):
    out = SampleFrames(every_n=1)(payloads)
    assert out.schema.names == ["id", "frame_idx", "frame"]
    # one 13-byte payload -> 1 frame; empty payload -> 1 frame
    assert out.num_rows >= 3


def test_resize_image_real_png():
    import numpy as np
    from pypdfium2_ray.functions.png import decode_png, encode_png
    from pypdfium2_ray.stages.multimodal import ResizeImage, _resize_nearest
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(10, 14), dtype=np.uint8)
    batch = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "data": pa.array([encode_png(img), b"not an image"], pa.binary()),
    })
    out = ResizeImage(scale=0.5)(batch)
    assert out["status"].to_pylist() == ["ok", "unsupported-format"]
    assert out["width"].to_pylist()[0] == 7
    assert out["height"].to_pylist()[0] == 5
    resized = decode_png(out["data"][0].as_py())
    assert resized.shape == (5, 7)
    assert (resized == _resize_nearest(img, 7, 5)).all()
    # explicit target dims win; upscale works too
    out2 = ResizeImage(width=28, height=3)(batch)
    assert decode_png(out2["data"][0].as_py()).shape == (3, 28)


def test_bmp_roundtrip_and_variants():
    """From-scratch BMP codec: encode->decode is identity for 24/32 bpp;
    top-down and padded-stride inputs decode correctly."""
    import struct as _struct

    from pypdfium2_ray.functions.bmp import decode_bmp, encode_bmp
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)   # stride pads
    assert (decode_bmp(encode_bmp(rgb)) == rgb).all()
    rgba = rng.randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(rgba)) == rgba).all()
    gray = rng.randint(0, 256, size=(3, 3), dtype=np.uint8)     # -> 24bpp
    assert (decode_bmp(encode_bmp(gray)) == np.repeat(gray[..., None], 3, 2)).all()

    # top-down variant: flip the height sign and the row order by hand
    enc = bytearray(encode_bmp(rgb))
    h = _struct.unpack("<i", enc[22:26])[0]
    enc[22:26] = _struct.pack("<i", -h)
    stride = (5 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(enc[54:]), np.uint8).reshape(h, stride)
    enc[54:] = rows[::-1].tobytes()
    assert (decode_bmp(bytes(enc)) == rgb).all()

    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)          # zero dims / bad header
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(rgb)[:60])          # truncated pixels


def test_resize_image_real_bmp():
    """Mixed-format resize: BMP decodes, resizes, re-encodes AS BMP."""
    from pypdfium2_ray.functions.bmp import decode_bmp, encode_bmp
    from pypdfium2_ray.stages.multimodal import (
        DecodeImage, ResizeImage, _resize_nearest)
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(10, 14, 3), dtype=np.uint8)
    batch = pa.table({
        "id": pa.array([1], pa.int64()),
        "data": pa.array([encode_bmp(img)], pa.binary()),
    })
    out = ResizeImage(scale=0.5)(batch)
    assert out["status"].to_pylist() == ["ok"]
    data = out["data"][0].as_py()
    assert data.startswith(b"BM")                 # format preserved
    resized = decode_bmp(data)
    assert resized.shape == (5, 7, 3)
    assert (resized == _resize_nearest(img, 7, 5)).all()
    # pixel features flow for BMP too now
    meta = DecodeImage(png_pixels=True)(batch)
    assert meta["format"].to_pylist() == ["bmp"]
    feats = meta["features"][0].as_py()
    assert len(feats) == 6 and all(0.0 <= v <= 1.0 for v in feats)


def test_gif_roundtrip_lzw_and_interlace():
    """From-scratch GIF codec: exact encode->decode round trip (LZW with
    per-pixel clear codes), grayscale/256-color palettes, and interlaced
    streams (row permutation) decoded correctly."""
    import struct

    from pypdfium2_ray.functions.gif import decode_gif, encode_gif
    from pypdfium2_ray.functions.imagemeta import parse_image_meta
    rng = np.random.RandomState(0)
    img = (rng.randint(0, 6, size=(37, 53)) * 40).astype(np.uint8)
    img = np.stack([img, img // 2, 255 - img], axis=2)
    enc = encode_gif(img)
    assert parse_image_meta(enc) == ("gif", 53, 37)
    assert (decode_gif(enc) == img).all()

    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)   # full palette
    dec = decode_gif(encode_gif(gray))
    assert (dec[:, :, 0] == gray).all() and (dec[:, :, 2] == gray).all()

    # interlaced: permute rows by the pass layout, set the interlace flag
    h = img.shape[0]
    rows = np.concatenate([np.arange(off, h, step)
                           for off, step in ((0, 8), (4, 8), (2, 4), (1, 2))])
    enc3 = bytearray(encode_gif(img[rows]))
    tsz = 2 << (enc3[10] & 7)
    desc = 13 + 3 * tsz
    assert enc3[desc] == 0x2C
    enc3[desc + 9] |= 0x40
    assert (decode_gif(bytes(enc3)) == img).all()


def test_resize_image_real_gif():
    """Mixed-format resize, third format: GIF decodes, resizes, re-encodes
    AS GIF (nearest-neighbor gathers pixels, so the palette never grows)."""
    from pypdfium2_ray.functions.gif import decode_gif, encode_gif
    from pypdfium2_ray.stages.multimodal import (
        DecodeImage, ResizeImage, _resize_nearest)
    rng = np.random.RandomState(12)
    img = (rng.randint(0, 4, size=(10, 14, 3)) * 60).astype(np.uint8)
    batch = pa.table({
        "id": pa.array([1], pa.int64()),
        "data": pa.array([encode_gif(img)], pa.binary()),
    })
    out = ResizeImage(scale=0.5)(batch)
    assert out["status"].to_pylist() == ["ok"]
    data = out["data"][0].as_py()
    assert data[:6] in (b"GIF87a", b"GIF89a")     # format preserved
    assert (decode_gif(data) == _resize_nearest(img, 7, 5)).all()
    meta = DecodeImage(png_pixels=True)(batch)
    assert meta["format"].to_pylist() == ["gif"]
    feats = meta["features"][0].as_py()
    assert len(feats) == 6 and all(0.0 <= v <= 1.0 for v in feats)


def test_resize_nearest_identity_and_channels():
    import numpy as np
    from pypdfium2_ray.stages.multimodal import _resize_nearest
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (_resize_nearest(img, 6, 4) == img).all()      # identity
    rgb = np.repeat(img[..., None], 3, axis=2)
    assert _resize_nearest(rgb, 3, 2).shape == (2, 3, 3)


def test_resample_audio_roundtrip(ray_session):
    """Decimate-by-k: the re-encoded container parses back to exactly
    s[::k] at rate//k; malformed payloads keep the status discipline."""
    import numpy as np
    import ray.data as rd

    from pypdfium2_ray.functions.wav import encode_wav
    from pypdfium2_ray.stages.multimodal import resample_audio
    s = ((np.arange(11, dtype=np.int64) * 3 - 5) % 100).astype(np.int16)
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "data": pa.array([encode_wav(s, 8000), b"not a wav"],
                                   pa.binary())})
    out = resample_audio(rd.from_arrow(t), factor=3).to_pandas() \
        .set_index("id")
    want = s[::3].astype(np.int64)
    assert out.loc[1, "status"] == "ok"
    assert out.loc[1, "n_samples"] == len(want) == 4
    assert out.loc[1, "sample_rate"] == 8000 // 3
    assert out.loc[1, "sum_sq"] == int((want * want).sum())
    assert out.loc[1, "peak"] == int(np.abs(want).max())
    assert out.loc[2, "status"] == "unknown-format"
