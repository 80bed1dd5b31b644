"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is real and tested; the *decoders* are STUBS — the image/audio
libraries (PIL, cv2, soundfile) are not in this container. Each actor
follows the reference's saver-engine pattern (lazy heavy imports in the
worker initializer, ``cli/render.py:266-276, 319-339``): ``__init__`` tries
the real import once per actor; without it, either a clearly-marked
``NotImplementedError`` (``fake=False``) or a deterministic fake derived
from the payload bytes (``fake=True``, default — keeps pipelines testable).

Batch-size guidance (SURVEY §4 memory row): binary payloads are large —
size ``batch_size`` so ``batch_size x avg_payload x concurrency`` fits the
worker heap (e.g. 2 MB images -> batch_size 16-64, not 1024).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: output schema of DecodeImage
IMAGE_META_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("mode", pa.string()),
    ("n_bytes", pa.int64()),
    ("features", pa.list_(pa.float32())),   # 8-dim feature stub
])


def _fake_meta(payload: bytes) -> tuple[int, int, str, list[float]]:
    """Deterministic fake decode: dims/features from the payload digest."""
    h = hashlib.blake2b(payload or b"", digest_size=16).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = (np.frombuffer(h[8:], dtype=np.uint8).astype(np.float32) / 255.0)
    return width, height, "RGB", feats.tolist()


class DecodeImage:
    """Actor: ``(id:int64, data:binary)`` -> image metadata + features.

    Real path requires PIL (absent here); ``fake=True`` produces the
    deterministic stub so schema/batching/actor plumbing is exercised.
    """

    def __init__(self, fake: bool = True, id_col: str = "id",
                 data_col: str = "data"):
        self.id_col = id_col
        self.data_col = data_col
        try:                                   # once per actor (ST3 pattern)
            from PIL import Image               # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None
        if self._pil is None and not fake:
            raise NotImplementedError(
                "real image decode needs PIL, which is not in this container;"
                " use fake=True for the deterministic stub")
        self.fake = fake or self._pil is None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        rows = []
        for i, p in zip(ids, payloads):
            if self.fake:
                w, h, mode, feats = _fake_meta(p or b"")
            else:                               # pragma: no cover (no PIL here)
                import io
                img = self._pil.open(io.BytesIO(p))
                w, h, mode = img.width, img.height, img.mode
                feats = [0.0] * 8
            rows.append(dict(id=i, width=w, height=h, mode=mode,
                             n_bytes=len(p or b""), features=feats))
        return pa.Table.from_pylist(rows, schema=IMAGE_META_SCHEMA)


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


def decode_images(ds, fake: bool = True, id_col: str = "id",
                  data_col: str = "data", batch_size: int = 64,
                  concurrency=(1, 8), **mb_kwargs):
    """Image-decode stage with payload-aware batch sizing."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(fake=fake, id_col=id_col, data_col=data_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)
