"""From-scratch WAV codec (functions/wav.py) + DecodeAudio stage."""

import numpy as np
import pyarrow as pa
import pytest

from pypdfium2_ray.functions.wav import decode_wav, encode_wav, parse_wav_meta


@pytest.mark.parametrize("dtype,bits", [
    (np.uint8, 8), (np.int16, 16), (np.int32, 32), (np.float32, 32)])
def test_round_trip(dtype, bits):
    rng = np.random.default_rng(1)
    if dtype == np.float32:
        s = rng.standard_normal((37, 2)).astype(np.float32)
    else:
        info = np.iinfo(dtype)
        s = rng.integers(info.min, info.max, (37, 2)).astype(dtype)
    payload = encode_wav(s, 22050)
    out, meta = decode_wav(payload)
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 2
    assert meta["bits_per_sample"] == bits
    np.testing.assert_array_equal(out, s)


def test_24bit_decode_sign_extension():
    import struct
    vals = [0, 1, -1, 8388607, -8388608]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, meta = decode_wav(payload)
    assert meta["bits_per_sample"] == 24 and meta["n_samples"] == 5
    assert out[:, 0].tolist() == vals


def test_unknown_chunks_skipped_and_padding():
    import struct
    s = np.array([1, -2, 3], np.int16)
    base = encode_wav(s, 8000)
    # splice a 3-byte (odd) junk chunk before fmt: pad to even
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    spliced = base[:12] + junk + base[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    out, meta = decode_wav(spliced)
    np.testing.assert_array_equal(out[:, 0], s)


def test_malformed_and_unsupported():
    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFF\x00\x00\x00\x00AVI ") is None
    # truncated data chunk
    good = encode_wav(np.array([1, 2, 3], np.int16), 8000)
    assert parse_wav_meta(good[:-2]) is None
    # parseable but unsupported codec (ADPCM tag 2)
    import struct
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"abcd")
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="unsupported WAVE codec"):
        decode_wav(payload)


def test_decode_audio_stage(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.multimodal import decode_audio
    payloads = [encode_wav(np.array([100, -200], np.int16), 8000),
                b"not audio",
                encode_wav(np.zeros(0, np.int16), 16000)]
    ds = rd.from_arrow(pa.table({"id": [1, 2, 3],
                                 "data": pa.array(payloads, pa.binary())}))
    out = decode_audio(ds, concurrency=1).to_pandas().set_index("id")
    assert out.loc[1, "status"] == "ok"
    assert out.loc[1, "sum_sq"] == 100 * 100 + 200 * 200
    assert out.loc[1, "peak"] == 200
    assert out.loc[1, "duration_us"] == 2 * 1_000_000 // 8000
    assert out.loc[2, "status"] == "unknown-format"
    assert out.loc[3, "status"] == "ok" and out.loc[3, "n_samples"] == 0
