"""Multimodal stage plumbing: schemas, actor wiring, deterministic stubs.

The decoders are stubs (no PIL/cv2 in this container) — what IS real and
tested here: the Arrow schemas, actor-pool execution, batch flow, and
determinism of the fake decode."""

import pyarrow as pa
import pytest

from pypdfium2_ray.stages.multimodal import (
    IMAGE_META_SCHEMA, DecodeImage, SampleFrames, decode_images)


@pytest.fixture(scope="module")
def payloads():
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "data": pa.array([b"\x89PNG fake one", b"JFIF fake two", b""],
                         pa.binary()),
    })


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


def test_decode_images_dataset(ray_session, payloads):
    import ray.data as rd
    ds = rd.from_arrow(payloads)
    out = decode_images(ds, fake=True, batch_size=2).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"id", "width", "height", "mode", "n_bytes",
                                "features"}
    assert (out["width"] >= 64).all() and (out["width"] < 256).all()


def test_sample_frames(payloads):
    out = SampleFrames(every_n=1)(payloads)
    assert out.schema.names == ["id", "frame_idx", "frame"]
    # one 13-byte payload -> 1 frame; empty payload -> 1 frame
    assert out.num_rows >= 3
