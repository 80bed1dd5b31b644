"""Perceptual image dedup (stages/imagedup.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.functions.bmp import encode_bmp
from pypdfium2_ray.functions.gif import encode_gif
from pypdfium2_ray.functions.png import encode_png
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.imagedup import dhash64, image_dup_pairs


def _grad(w=32, h=24, flip=False):
    """Left-to-right (or flipped) gradient image."""
    x = np.arange(w, dtype=np.uint8)
    if flip:
        x = x[::-1].copy()
    return np.tile(x, (h, 1))


def test_dhash_gradient_directions():
    assert dhash64(_grad()) == (1 << 64) - 1          # all increasing
    assert dhash64(_grad(flip=True)) == 0             # all decreasing
    assert dhash64(np.zeros((10, 10), np.uint8)) == 0  # flat


def test_dhash_scale_invariance():
    # NN-downsampled copies of the same picture hash identically when
    # the grid samples the same underlying gradient
    a, b = _grad(36, 16), _grad(18, 8)
    assert dhash64(a) == dhash64(b)


def test_dhash_channel_policy():
    g = _grad()
    rgb = np.stack([g, np.zeros_like(g), 255 - g], axis=-1)
    assert dhash64(rgb) == dhash64(g)                 # channel 0


def _bit_image(fp: int) -> np.ndarray:
    img = np.empty((16, 18), np.uint8)
    for j in range(8):
        c, vals = 32, [32]
        for k in range(8):
            c += 1 if (fp >> (j * 8 + k)) & 1 else -1
            vals.append(c)
        row = np.repeat(np.array(vals, np.uint8), 2)
        img[2 * j] = row
        img[2 * j + 1] = row
    return img


def test_bit_image_roundtrip():
    for fp in (0, (1 << 64) - 1, 0x0123456789ABCDEF, 1 << 63):
        assert dhash64(_bit_image(fp)) == fp


def test_cross_format_pairs_and_distance():
    # same pixels as PNG/BMP/GIF -> all three pairwise dup (hamming 0);
    # a 2-bit-flipped variant pairs at hamming 2; a far image does not
    base = 0x00FF00FF12345678
    near = base ^ 0b101                # hamming 2
    imgs = [encode_png(_bit_image(base)), encode_bmp(_bit_image(base)),
            encode_gif(_bit_image(base)), encode_png(_bit_image(near)),
            encode_png(_bit_image(base ^ ((1 << 40) - 1)))]
    t = pa.table({"id": pa.array(range(5), pa.int64()),
                  "data": pa.array(imgs, pa.binary())})
    with partition_hint(2):
        out = image_dup_pairs(rd.from_arrow(t), bands=4,
                              max_dist=3).to_pandas()
    got = {(a, b): h for a, b, h in map(tuple, out.to_numpy())}
    assert got[(0, 1)] == 0 and got[(0, 2)] == 0 and got[(1, 2)] == 0
    assert got[(0, 3)] == 2 and got[(1, 3)] == 2
    assert not any(4 in p for p in got)


def test_undecodable_payloads_skipped():
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "data": pa.array([encode_png(_bit_image(7)),
                                    b"not an image", b""], pa.binary())})
    with partition_hint(2):
        out = image_dup_pairs(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0        # lone decodable image pairs with nothing


def test_partition_invariance():
    imgs = [encode_png(_bit_image(i // 3)) for i in range(12)]
    t = pa.table({"id": pa.array(range(12), pa.int64()),
                  "data": pa.array(imgs, pa.binary())})

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            return sorted(map(tuple,
                              image_dup_pairs(ds).to_pandas().to_numpy()))

    assert run(1, 1) == run(3, 4)
