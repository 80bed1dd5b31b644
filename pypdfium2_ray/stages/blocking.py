"""Value-window self-join (sorted-neighborhood blocking) — all id pairs
whose 1-D sort key differs by at most ``delta``.

The record-linkage classic (Hernandez & Stolfo, "The merge/purge problem
for large databases", SIGMOD'95 — public paper) sorts the corpus by a
blocking key and pairs nearby rows. The distributed shape here is the
*value*-window variant (|key_a - key_b| <= delta rather than a rank
window), which shards exactly: rows hash-exchange on ``bucket =
floor(key / W)`` with ``W >= delta``, and every row whose key lies
within ``delta`` below a bucket boundary is REPLICATED into the next
bucket as a halo row. Any qualifying pair (x <= y, y - x <= delta) then
has both members present in the home bucket of ``y`` (x natively or as
halo, since x >= y - delta >= B - delta), and the kernel emits a pair
only when its higher-(key, id) member is native — each pair exactly
once, no post-exchange distinct needed.

This range-bucket + halo-replication exchange is the 1-D case of the
spatial-join / interval-overlap sharding family — a different shuffle
contract from the hash-equality exchanges everywhere else in the repo
(equal keys co-located) in that *nearby* keys are co-located, at the
cost of a delta/W replication fraction (default 1/256).

Everything rides on int64 keys: callers with unsigned-64 fingerprints
map them order-preserving into signed space first (flip the top bit —
:func:`fingerprint_window_pairs` does this, with an exact HUGEINT twin
on the SQL side). Differences never overflow: a kernel only subtracts
keys within one bucket+halo span (<= W + delta << 2^63).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

log = logging.getLogger(__name__)

#: default bucket width: 2^56 => 256 buckets over the int64 line, halo
#: fraction delta/W = 1/256 at the default delta 2^48
DEFAULT_BUCKET_WIDTH = 1 << 56


def _fan_out(id_col: str, val_col: str, delta: int, width: int):
    """Per-block map: (id, key) -> native row + (when within ``delta`` of
    the bucket's upper edge) one halo replica in the next bucket."""

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        key = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(key, width)
        rem = key - bucket * width                      # in [0, width)
        halo = rem >= width - delta
        return pa.table({
            "bucket": np.concatenate([bucket, bucket[halo] + 1]),
            "rid": np.concatenate([ids, ids[halo]]),
            "skey": np.concatenate([key, key[halo]]),
            "native": np.concatenate([np.ones(len(ids), bool),
                                      np.zeros(int(halo.sum()), bool)]),
        })

    return fn


def _window_kernel(delta: int, max_window: int):
    """One hash partition of (bucket, rid, skey, native) rows, complete
    per bucket: emit every pair within ``delta`` whose higher-(skey, id)
    member is native, as (id_a, id_b, fp_dist) with id_a < id_b by id."""

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "fp_dist": pa.array([], pa.int64())})
        if t.num_rows == 0 or "bucket" not in t.column_names:
            return empty
        df = pd.DataFrame({
            "bucket": t["bucket"].to_numpy(zero_copy_only=False),
            "rid": t["rid"].to_numpy(zero_copy_only=False),
            "skey": t["skey"].to_numpy(zero_copy_only=False),
            "native": t["native"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["bucket", "skey", "rid"], kind="mergesort")
        bk = df["bucket"].to_numpy()
        rid = df["rid"].to_numpy()
        skey = df["skey"].to_numpy()
        native = df["native"].to_numpy()
        bound = np.flatnonzero(np.diff(bk)) + 1
        starts = np.concatenate(([0], bound, [len(bk)]))
        out_a, out_b, out_d = [], [], []
        for r in range(len(starts) - 1):
            s, e = int(starts[r]), int(starts[r + 1])
            if e - s < 2:
                continue
            k = skey[s:e]
            # saturating lower bound: k - delta must not wrap below
            # int64 min (a fingerprint within delta of the bottom of the
            # line is rare but certain at 10^12 docs)
            imin = np.iinfo(np.int64).min
            tgt = np.where(k < imin + delta, imin, k - delta)
            lo = np.searchsorted(k, tgt, side="left")
            jn = np.flatnonzero(native[s:e])
            cnt = jn - lo[jn]
            over = cnt > max_window
            if over.any():
                # NO SILENT CAPS: dropped predecessors lose pairs — loud,
                # with sizing data (mirrors dedup._bucket_pairs_partition)
                log.warning(
                    "value-window truncation: %d row(s) have more than "
                    "max_window=%d in-window predecessors (largest=%d); "
                    "pairs beyond the nearest max_window are LOST — raise "
                    "max_window or shrink delta",
                    int(over.sum()), max_window, int(cnt.max()))
                cnt = np.minimum(cnt, max_window)
            keep = cnt > 0
            jn, cnt = jn[keep], cnt[keep]
            if not len(jn):
                continue
            total = int(cnt.sum())
            cum = np.concatenate(([0], np.cumsum(cnt)))
            jj = np.repeat(jn, cnt)
            # nearest-predecessor window: positions j-cnt[j] .. j-1
            ii = np.repeat(jn - cnt, cnt) + (np.arange(total)
                                             - np.repeat(cum[:-1], cnt))
            ia, ib = rid[s + ii], rid[s + jj]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
            out_d.append(k[jj] - k[ii])
        if not out_a:
            return empty
        return pa.table({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b),
                         "fp_dist": np.concatenate(out_d)})

    return fn


def value_window_pairs(ds, id_col: str, val_col: str, delta: int,
                       bucket_width: int = DEFAULT_BUCKET_WIDTH,
                       max_window: int = 100_000,
                       num_partitions: int | None = None):
    """Dataset[(id_a, id_b, fp_dist)] — every unordered id pair whose
    signed-int64 ``val_col`` values differ by at most ``delta``
    (id_a < id_b by id; fp_dist = |difference| exactly). ONE hash
    exchange on the range bucket; replication fraction delta/W."""
    if not 0 <= delta <= bucket_width:
        raise ValueError("need 0 <= delta <= bucket_width (one-bucket halo)")
    rows = ds.map_batches(_fan_out(id_col, val_col, delta, bucket_width),
                          batch_format="pyarrow")
    return partition_map(rows, ["bucket"], _window_kernel(delta, max_window),
                         num_partitions=num_partitions)


class _Fingerprints:
    """Actor: text -> 64-bit simhash, mapped order-preserving into signed
    int64 (top bit flipped: skey = unsigned_fp - 2^63) so the generic
    signed-space window op applies; the SQL twin performs the identical
    flip in HUGEINT."""

    def __init__(self, id_col: str, text_col: str, ngram_n: int):
        self.id_col = id_col
        self.text_col = text_col
        self.ngram_n = ngram_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.functions.sketch import simhash64, word_ngrams
        ids = pc.cast(batch[self.id_col], pa.int64()).to_pylist()
        texts = batch[self.text_col].to_pylist()
        skeys = np.fromiter(
            (simhash64(word_ngrams(t or "", self.ngram_n)) for t in texts),
            dtype=np.uint64, count=len(texts))
        skeys = (skeys ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({"rid": pa.array(ids, pa.int64()), "skey": skeys})


def fingerprint_window_pairs(ds, id_col: str = "doc_id",
                             text_col: str = "text", ngram_n: int = 3,
                             delta: int = 1 << 48,
                             bucket_width: int = DEFAULT_BUCKET_WIDTH,
                             num_partitions: int | None = None):
    """Sorted-neighborhood candidate pairs over the corpus simhash
    fingerprint: docs whose fingerprints land within ``delta`` of each
    other on the unsigned-64 line. The blocking-key front door of a
    merge/purge pass — downstream verification (exact Jaccard / Hamming)
    reuses the dedup family's verify joins."""
    from pypdfium2_ray.stages.warm import warm_task
    fps = ds.map_batches(
        warm_task(_Fingerprints, id_col=id_col, text_col=text_col,
                  ngram_n=ngram_n),
        batch_format="pyarrow")
    return value_window_pairs(fps, "rid", "skey", delta,
                              bucket_width=bucket_width,
                              num_partitions=num_partitions)
