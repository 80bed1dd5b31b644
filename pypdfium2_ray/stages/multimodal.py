"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Three decode tiers (the reference's image-object surface,
``pageobjects.py:433-515`` ``get_data``/``get_bitmap``, re-expressed as
corpus stages):

- ``mode="headers"`` (default): REAL from-scratch header parsing
  (``functions/imagemeta``: PNG/GIF/BMP/JPEG dims via struct unpack) plus
  real PNG *pixel* decode (``functions/png.decode_png``) for the feature
  stub (mean/std per channel). No external libraries involved.
- ``mode="fake"``: deterministic md5-derived metadata — the dims/features
  are pure functions of the payload digest with an exact DuckDB twin
  (``md5_number_upper``), which is what lets the driver's
  ``decode_images`` query be oracle-checked.
- ``mode="pil"``: the real-library path, gated on import (PIL absent in
  this container -> ``NotImplementedError``), following the reference's
  lazy saver-engine import pattern (``cli/render.py:266-276``).

Batch-size guidance (SURVEY §4 memory row): binary payloads are large —
size ``batch_size`` so ``batch_size x avg_payload x concurrency`` fits the
worker heap (e.g. 2 MB images -> batch_size 16-64, not 1024).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pypdfium2_ray.functions.imagemeta import (
    parse_image_meta, parse_image_meta_full)

#: output schema of DecodeImage — the header fields mirror the reference's
#: FPDF_IMAGEOBJ_METADATA (pageobjects.py get_metadata: width/height/dpi/
#: bits_per_pixel/colorspace); dpi 0 = payload carries no density, as
#: PDFium reports
IMAGE_META_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("status", pa.string()),                # "ok" | "unknown-format"
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("mode", pa.string()),
    ("bpp", pa.int32()),                    # bits per pixel
    ("colorspace", pa.string()),
    ("dpi_x", pa.int32()),
    ("dpi_y", pa.int32()),
    ("n_bytes", pa.int64()),
    ("features", pa.list_(pa.float32())),
])


def _fake_meta(payload: bytes) -> tuple[int, int, str, list[float]]:
    """Deterministic fake decode with an exact SQL twin: dims from the
    first two MD5-digest bytes (``md5_number_upper & 255`` etc. in
    DuckDB), features from digest bytes 8..16."""
    d = hashlib.md5(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feats = (np.frombuffer(d[8:16], dtype=np.uint8).astype(np.float32) / 255.0)
    return width, height, "RGB", feats.tolist()


def _decode_pixels(payload: bytes, fmt: str) -> "np.ndarray | None":
    """Real pixel decode for the formats with from-scratch decoders
    (PNG: functions/png; uncompressed BMP: functions/bmp; GIF incl. LZW
    and interlace: functions/gif); None otherwise."""
    try:
        if fmt == "png":
            from pypdfium2_ray.functions.png import decode_png
            return decode_png(payload)
        if fmt == "bmp":
            from pypdfium2_ray.functions.bmp import decode_bmp
            return decode_bmp(payload)
        if fmt == "gif":
            from pypdfium2_ray.functions.gif import decode_gif
            return decode_gif(payload)
        if fmt == "jpeg":
            from pypdfium2_ray.functions.jpeg import decode_jpeg
            return decode_jpeg(payload)
    except Exception:
        return None
    return None


def _pixel_features(payload: bytes, fmt: str) -> list[float] | None:
    """Real pixel features (per-channel mean+std of the decoded image) for
    payloads with a real decoder."""
    img = _decode_pixels(payload, fmt)
    if img is None:
        return None
    arr = img.reshape(img.shape[0], img.shape[1], -1).astype(np.float32)
    mean = arr.mean(axis=(0, 1)) / 255.0
    std = arr.std(axis=(0, 1)) / 255.0
    return np.concatenate([mean, std]).tolist()


class DecodeImage:
    """Actor: ``(id:int64, data:binary)`` -> image metadata + features."""

    def __init__(self, mode: str = "headers", id_col: str = "id",
                 data_col: str = "data", fake: bool | None = None,
                 png_pixels: bool = False):
        if fake is not None:                   # back-compat flag
            mode = "fake" if fake else mode
        self.mode = mode
        self.id_col = id_col
        self.data_col = data_col
        self.png_pixels = png_pixels
        if mode == "pil":                      # once per actor (ST3 pattern)
            try:
                from PIL import Image
                self._pil = Image
            except ImportError:
                raise NotImplementedError(
                    "mode='pil' needs PIL, which is not in this container;"
                    " use mode='headers' (real from-scratch parsers) or"
                    " mode='fake' (deterministic md5 stub)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        rows = []
        for i, p in zip(ids, payloads):
            p = p or b""
            if self.mode == "fake":
                w, h, mode, feats = _fake_meta(p)
                rows.append(dict(id=i, status="ok", format="fake", width=w,
                                 height=h, mode=mode, bpp=24,
                                 colorspace="rgb", dpi_x=0, dpi_y=0,
                                 n_bytes=len(p), features=feats))
                continue
            if self.mode == "pil":            # pragma: no cover (no PIL here)
                import io
                try:
                    img = self._pil.open(io.BytesIO(p))
                    arr = np.asarray(img.convert("RGB"), dtype=np.float32)
                    feats = np.concatenate([
                        arr.mean(axis=(0, 1)) / 255.0,
                        arr.std(axis=(0, 1)) / 255.0]).tolist()
                    rows.append(dict(
                        id=i, status="ok",
                        format=(img.format or "").lower(),
                        width=img.width, height=img.height, mode=img.mode,
                        bpp=0, colorspace="", dpi_x=0, dpi_y=0,
                        n_bytes=len(p), features=feats))
                except Exception:
                    rows.append(dict(id=i, status="unknown-format",
                                     format="", width=0, height=0, mode="",
                                     bpp=0, colorspace="", dpi_x=0, dpi_y=0,
                                     n_bytes=len(p), features=[]))
                continue
            meta = parse_image_meta_full(p)
            if meta is None:
                rows.append(dict(id=i, status="unknown-format", format="",
                                 width=0, height=0, mode="", bpp=0,
                                 colorspace="", dpi_x=0, dpi_y=0,
                                 n_bytes=len(p), features=[]))
                continue
            feats = (_pixel_features(p, meta["format"]) if self.png_pixels
                     else []) or []
            rows.append(dict(id=i, status="ok", format=meta["format"],
                             width=meta["width"], height=meta["height"],
                             mode="RGB", bpp=meta["bpp"],
                             colorspace=meta["colorspace"],
                             dpi_x=meta["dpi_x"], dpi_y=meta["dpi_y"],
                             n_bytes=len(p), features=feats))
        return pa.Table.from_pylist(rows, schema=IMAGE_META_SCHEMA)


def _resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (index-map gather; any channel
    count)."""
    src_h, src_w = img.shape[:2]
    ys = np.minimum((np.arange(h) * src_h) // max(1, h), src_h - 1)
    xs = np.minimum((np.arange(w) * src_w) // max(1, w), src_w - 1)
    return img[ys[:, None], xs[None, :]]


class ResizeImage:
    """Actor: ``(id, data:binary)`` -> resized payload + new dims.

    REAL for PNG, uncompressed-BMP and GIF payloads (from-scratch decode
    -> vectorized nearest-neighbor -> re-encode in the SAME format, no
    image libraries; nearest-neighbor only gathers pixels, so a resized
    GIF always fits its source palette; JPEG re-encodes through the
    baseline codec at quality 85 — lossy like any JPEG resave); unknown
    formats pass through with ``status='unsupported-format'``.
    ``scale`` halves by default; explicit ``width``/``height`` win.
    """

    def __init__(self, scale: float = 0.5, width: int | None = None,
                 height: int | None = None, id_col: str = "id",
                 data_col: str = "data"):
        self.scale = scale
        self.width = width
        self.height = height
        self.id_col = id_col
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.functions.bmp import encode_bmp
        from pypdfium2_ray.functions.gif import encode_gif
        from pypdfium2_ray.functions.jpeg import encode_jpeg
        from pypdfium2_ray.functions.png import encode_png
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        rows = []
        for i, p in zip(ids, payloads):
            p = p or b""
            meta = parse_image_meta(p)
            if meta is None or meta[0] not in ("png", "bmp", "gif", "jpeg"):
                rows.append(dict(id=i, status="unsupported-format",
                                 width=0, height=0, data=p))
                continue
            fmt = meta[0]
            img = _decode_pixels(p, fmt)
            if img is None:
                rows.append(dict(id=i, status="decode-error",
                                 width=0, height=0, data=p))
                continue
            w = (self.width if self.width is not None
                 else max(1, int(img.shape[1] * self.scale)))
            h = (self.height if self.height is not None
                 else max(1, int(img.shape[0] * self.scale)))
            out = _resize_nearest(img, w, h)
            enc = {"png": encode_png, "bmp": encode_bmp,
                   "gif": encode_gif, "jpeg": encode_jpeg}[fmt](out)
            rows.append(dict(id=i, status="ok", width=w, height=h,
                             data=enc))
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("id", pa.int64()), ("status", pa.string()),
            ("width", pa.int32()), ("height", pa.int32()),
            ("data", pa.binary())]))


def resize_images(ds, scale: float = 0.5, width: int | None = None,
                  height: int | None = None, id_col: str = "id",
                  data_col: str = "data", batch_size: int = 64,
                  concurrency=(1, 8), **mb_kwargs):
    """Image-resize stage (same payload-aware batch sizing as decode)."""
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs=dict(scale=scale, width=width, height=height,
                                   id_col=id_col, data_col=data_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)


class SampleFrames:
    """Actor stub: ``(id, data:binary, n_frames:int32)`` video -> frame rows
    ``(id, frame_idx, frame:binary)``. Frame extraction is faked as byte
    slices; a real implementation would swap in pyav/cv2 here."""

    def __init__(self, every_n: int = 10, id_col: str = "id",
                 data_col: str = "data"):
        self.every_n = every_n
        self.id_col = id_col
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        out = {"id": [], "frame_idx": [], "frame": []}
        for i, p in zip(ids, payloads):
            p = p or b""
            n_frames = max(1, len(p) // 64)
            for f in range(0, n_frames, self.every_n):
                out["id"].append(i)
                out["frame_idx"].append(f)
                out["frame"].append(p[f * 64:(f + 1) * 64])
        return pa.table({"id": pa.array(out["id"], pa.int64()),
                         "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                         "frame": pa.array(out["frame"], pa.binary())})


def decode_images(ds, mode: str = "headers", id_col: str = "id",
                  data_col: str = "data", batch_size: int = 64,
                  concurrency=(1, 8), fake: bool | None = None,
                  png_pixels: bool = False, **mb_kwargs):
    """Image-decode stage with payload-aware batch sizing."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(mode=mode, id_col=id_col,
                                   data_col=data_col, fake=fake,
                                   png_pixels=png_pixels),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)


# ---------------------------------------------------------------------------
# audio tier (real from-scratch WAV codec — functions/wav.py)

#: output schema of DecodeAudio. Feature columns are integer-exact
#: (sum of squared samples / peak |sample|) so the end-to-end query is
#: hash-oracle-checkable; they are null for float32 payloads (no exact
#: integer representation) and for error rows.
AUDIO_META_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("status", pa.string()),        # ok | unknown-format | unsupported-codec
    ("sample_rate", pa.int32()),
    ("channels", pa.int32()),
    ("bits_per_sample", pa.int32()),
    ("n_samples", pa.int64()),
    ("duration_us", pa.int64()),    # floor(n_samples * 1e6 / rate)
    ("sum_sq", pa.int64()),
    ("peak", pa.int64()),
])


class DecodeAudio:
    """Actor-pool stage: ``(id, data:binary)`` -> one AUDIO_META_SCHEMA
    row per payload. Parse is per-payload (inherent — variable-length
    containers); the sample-level feature math is vectorized numpy over
    the decoded array. Same tier discipline as DecodeImage: malformed
    payloads become ``unknown-format`` rows, parseable-but-unsupported
    codecs ``unsupported-codec`` rows — never a thrown-away batch."""

    def __init__(self, id_col: str = "id", data_col: str = "data"):
        from pypdfium2_ray.functions import wav
        self.wav = wav
        self.id_col = id_col
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        rows = {name: [] for name in AUDIO_META_SCHEMA.names}
        for i, p in zip(ids, payloads):
            vals = dict.fromkeys(AUDIO_META_SCHEMA.names)
            vals["id"] = i
            try:
                decoded = self.wav.decode_wav(p or b"")
            except ValueError:
                decoded, vals["status"] = None, "unsupported-codec"
            else:
                vals["status"] = "ok" if decoded else "unknown-format"
            if decoded is not None:
                s, meta = decoded
                vals.update(
                    sample_rate=meta["sample_rate"],
                    channels=meta["channels"],
                    bits_per_sample=meta["bits_per_sample"],
                    n_samples=meta["n_samples"],
                    duration_us=meta["n_samples"] * 1_000_000
                    // meta["sample_rate"])
                if s.dtype != np.float32 and s.size:
                    s64 = s.astype(np.int64)
                    vals["sum_sq"] = int((s64 * s64).sum())
                    vals["peak"] = int(np.abs(s64).max())
                elif s.size == 0:
                    vals["sum_sq"] = 0
                    vals["peak"] = 0
            for name in rows:
                rows[name].append(vals[name])
        return pa.table(
            {n: pa.array(rows[n], AUDIO_META_SCHEMA.field(n).type)
             for n in AUDIO_META_SCHEMA.names})


def decode_audio(ds, id_col: str = "id", data_col: str = "data",
                 batch_size: int = 64, concurrency=(1, 8), **mb_kwargs):
    """Audio-decode stage (payload-aware batch sizing, warm actor pool)."""
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs=dict(id_col=id_col, data_col=data_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)


class ResampleAudio:
    """Actor-pool stage: decimate each WAV payload by an integer
    ``factor`` (keep every factor-th sample — the nearest-neighbor
    resample of the audio tier, the analogue of ResizeImage's NN
    gather), re-encode with the rate divided by the same factor, and
    emit the RE-PARSED container's features — so the output verifies
    the full decode → gather → encode → decode round trip, not just the
    arithmetic. Multi-channel payloads decimate along the frame axis.
    Failed parses follow the DecodeAudio status discipline."""

    def __init__(self, factor: int = 2, id_col: str = "id",
                 data_col: str = "data"):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        from pypdfium2_ray.functions import wav
        self.wav = wav
        self.factor = factor
        self.id_col = id_col
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        rows = {name: [] for name in AUDIO_META_SCHEMA.names}
        for i, p in zip(ids, payloads):
            vals = dict.fromkeys(AUDIO_META_SCHEMA.names)
            vals["id"] = i
            try:
                decoded = self.wav.decode_wav(p or b"")
            except ValueError:
                decoded, vals["status"] = None, "unsupported-codec"
            else:
                vals["status"] = "ok" if decoded else "unknown-format"
            if decoded is not None:
                s, meta = decoded
                out = np.ascontiguousarray(s[::self.factor])
                rate = max(1, meta["sample_rate"] // self.factor)
                rt, meta2 = self.wav.decode_wav(
                    self.wav.encode_wav(out, rate))
                vals.update(
                    sample_rate=meta2["sample_rate"],
                    channels=meta2["channels"],
                    bits_per_sample=meta2["bits_per_sample"],
                    n_samples=meta2["n_samples"],
                    duration_us=meta2["n_samples"] * 1_000_000
                    // meta2["sample_rate"])
                if rt.dtype != np.float32 and rt.size:
                    r64 = rt.astype(np.int64)
                    vals["sum_sq"] = int((r64 * r64).sum())
                    vals["peak"] = int(np.abs(r64).max())
                else:
                    vals["sum_sq"] = 0 if rt.size == 0 else vals["sum_sq"]
                    vals["peak"] = 0 if rt.size == 0 else vals["peak"]
            for name in rows:
                rows[name].append(vals[name])
        return pa.table(
            {name: pa.array(rows[name], AUDIO_META_SCHEMA.field(name).type)
             for name in AUDIO_META_SCHEMA.names})


def resample_audio(ds, factor: int = 2, id_col: str = "id",
                   data_col: str = "data", batch_size: int = 64,
                   concurrency=(1, 8), **mb_kwargs):
    """Audio-resample stage (same payload-aware sizing as decode)."""
    return ds.map_batches(
        ResampleAudio,
        fn_constructor_kwargs=dict(factor=factor, id_col=id_col,
                                   data_col=data_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)
