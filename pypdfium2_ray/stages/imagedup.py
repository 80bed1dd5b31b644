"""Perceptual image near-duplicate detection — dHash + pigeonhole banding.

Ties the from-scratch codec tier (``functions/png|bmp|gif|jpeg``) to the
dedup tier: every image payload is REALLY decoded (shared
``multimodal._decode_pixels``), downsampled with the REAL
nearest-neighbor resize, fingerprinted with the classic difference hash
(dHash: 9x8 grayscale grid, bit = right-neighbor-brighter, 64 bits
row-major), and near-duplicates found with EXACTLY the simhash
machinery — ``simhash_band_keys`` pigeonhole banding (hamming <=
bands-1 is guaranteed to share a band, so recall is exact by
construction at the default ``max_dist <= bands - 1``) and the shared
vectorized ``_bucket_pairs_partition`` hamming verify. The reference's
image surface is decode + bitmap traversal
(`/root/reference/src/pypdfium2/_helpers/pageobjects.py:433-515`); the
near-dup layer is the training-data add-on (screenshot / thumbnail /
re-encode dedup).

Scale shape is the simhash tier's: band rows carry ``(id:int64,
band:int32, band_key:int64, hi:int64, lo:int64)`` only — pixel data
never leaves its block; ONE (band, band_key) exchange; pair-distinct on
one more ids-only exchange.

Channel policy: grayscale uses the single channel; multi-channel images
use channel 0 (deterministic, documented — luma mixing would need a
rounding convention pinned to an oracle; channel 0 is lossless and
stable across the repo's codecs). Payloads that fail the image sniff or
the pixel decode emit no rows (the ``resize_images`` status convention;
a corpus auditor runs ``decode_images`` for the status rollup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pypdfium2_ray.functions.sketch import simhash_band_keys

#: dHash grid: 9 columns -> 8 horizontal-gradient bits per row, 8 rows
DHASH_W, DHASH_H = 8, 8


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of a decoded image array ((h, w) or
    (h, w, c) uint8): nearest-neighbor downsample to (DHASH_H, DHASH_W+1),
    bit (j*8+i) set iff px[j, i+1] > px[j, i]."""
    from pypdfium2_ray.stages.multimodal import _resize_nearest
    g = img if img.ndim == 2 else img[..., 0]
    small = _resize_nearest(g, DHASH_W + 1, DHASH_H)
    bits = small[:, 1:].astype(np.int16) > small[:, :-1].astype(np.int16)
    flat = bits.reshape(-1)
    return int(sum(1 << int(k) for k in np.flatnonzero(flat)))


class _DhashBands:
    """Actor: (id, data:binary) -> band rows, the _SimhashBands schema
    (shared pairing kernel downstream). Undecodable payloads emit
    nothing."""

    def __init__(self, id_col: str, data_col: str, bands: int):
        self.id_col = id_col
        self.data_col = data_col
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.functions.imagemeta import parse_image_meta
        from pypdfium2_ray.stages.multimodal import _decode_pixels
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.data_col].to_pylist()
        out_id, out_band, out_key, out_hi, out_lo = [], [], [], [], []
        for i, p in zip(ids, payloads):
            p = p or b""
            meta = parse_image_meta(p)
            if meta is None or meta[0] not in ("png", "bmp", "gif", "jpeg"):
                continue
            img = _decode_pixels(p, meta[0])
            if img is None:
                continue
            h = dhash64(img)
            for b, k in enumerate(simhash_band_keys(h, self.bands)):
                out_id.append(i)
                out_band.append(b)
                out_key.append(k)
                out_hi.append(h >> 1)
                out_lo.append(h & 1)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "band_key": pa.array(out_key, pa.int64()),
                         "simhash_hi": pa.array(out_hi, pa.int64()),
                         "simhash_lo": pa.array(out_lo, pa.int64())})


def image_dup_pairs(ds, id_col: str = "id", data_col: str = "data",
                    bands: int = 4, max_dist: int = 3,
                    max_bucket: int = 500,
                    num_partitions: int | None = None):
    """Perceptual near-dup pairs ``(id_a < id_b, hamming)`` with dHash
    hamming distance <= ``max_dist``. Recall is exact by construction
    when ``max_dist <= bands - 1`` (pigeonhole)."""
    from pypdfium2_ray.stages.dedup import (_bucket_pairs_partition,
                                            distinct_rows)
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.warm import warm_task
    band_rows = ds.map_batches(
        warm_task(_DhashBands, id_col=id_col, data_col=data_col,
                  bands=bands),
        batch_format="pyarrow")
    pairs = partition_map(
        band_rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "doc_id",
                                          max_bucket, with_hamming=True,
                                          max_dist=max_dist),
        num_partitions=num_partitions)
    return distinct_rows(pairs, ["id_a", "id_b"],
                         num_partitions=num_partitions)
