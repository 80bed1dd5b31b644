"""Multimodal queries: binary payloads through decode stages.

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping; content unchanged). See
``pypdfium2_ray/queries/__init__.py`` for the layout.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.queries.common import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.extraction import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.textstats import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.dedup import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.similarity import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.relational import *  # noqa: F401,F403,E501

# ---------------------------------------------------------------------------
# multimodal: binary payload columns through actor-pool decode stages

def q_decode_images(sf_dir: str):
    """Deterministic md5-derived decode stub over binary payloads — the
    dims are pure functions of the payload digest with an exact DuckDB
    twin (md5_number_upper), so the stub path itself is oracle-checked."""
    from pypdfium2_ray.stages.multimodal import decode_images

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["doc_id"],
                         "data": pc.cast(t["text"], pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_payload, batch_format="pyarrow")
    out = decode_images(ds, mode="fake")
    return _cast_i64(out.select_columns(["id", "width", "height", "n_bytes"]),
                     ["width", "height"])


def q_image_meta(sf_dir: str):
    """REAL image decode end-to-end: synthesize a PNG per document (dims
    derived from the text — stdlib encoder, functions/png.py), then parse
    the header back with the from-scratch parser (functions/imagemeta),
    including the reference's metadata field set (bpp / colorspace — M14;
    the 8-bit gray engine PNGs carry no pHYs, so dpi stays 0 like
    PDFium's no-density report). The oracle recomputes every field from
    the text."""
    import numpy as np
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.text import token_count
    from pypdfium2_ray.stages.multimodal import decode_images

    def to_png(t: pa.Table) -> pa.Table:
        toks = token_count(t["text"]).to_pylist()
        payloads = []
        for txt, ntok in zip(t["text"].to_pylist(), toks):
            w = 1 + len(txt or "") % 64
            h = 1 + int(ntok) % 64
            payloads.append(encode_png(np.zeros((h, w), dtype=np.uint8)))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_png, batch_format="pyarrow")
    out = decode_images(ds, mode="headers")
    return _cast_i64(
        out.select_columns(["id", "status", "format", "width", "height",
                            "bpp", "colorspace", "dpi_x", "dpi_y"]),
        ["width", "height", "bpp", "dpi_x", "dpi_y"])


def _winnow_sql() -> str:
    from pypdfium2_ray.functions.sketch import sql_winnow_fingerprint
    return sql_winnow_fingerprint(k=8)


#: winnowing-fingerprint SQL twin (engine-exact, see sketch.py)
_WINNOW_SQL = _winnow_sql()


def _simhash_fp_sql() -> str:
    from pypdfium2_ray.functions.sketch import sql_simhash_fingerprints
    return sql_simhash_fingerprints(ngram_n=3)


#: per-doc simhash fingerprint SQL (engine-exact, see sketch.py)
_SIMHASH_FP_SQL = _simhash_fp_sql()

#: exact cosine near-dup pairs — shared by embedding_dups (broadcast tier)
#: and embedding_lsh_dups (bucketed tier at recall-1 config)
_EMB_DUPS_SQL = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE
                      * 100) AS BIGINT) AS sim_centi
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {DUP_TAU}"""

#: exact cosine top-k oracle — shared by ann_topk and full-probe ann_ivf_topk
_ANN_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id IN {ANN_QUERY_IDS}),
    s AS (SELECT q.qid, e.vec_id,
                 list_cosine_similarity(e.embedding, q.qe) AS sim
          FROM embeddings e, q WHERE e.vec_id <> q.qid)
    SELECT qid AS query_id, vec_id AS neighbor_id,
           CAST(round(sim::DOUBLE * 100) AS BIGINT) AS sim_centi
    FROM s
    QUALIFY row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, vec_id) <= {ANN_K}"""


#: image twins: doc_id % 40 == 1 shares its predecessor's pixels
IMG_TWIN_MOD = 40


def q_image_dups(sf_dir: str):
    """Perceptual image near-dup pairs (stages/imagedup.image_dup_pairs):
    REAL decode (three lossless from-scratch codecs cycled by doc_id%3 —
    a PNG twin of a BMP twin still collides, the re-encode-dedup story)
    -> REAL NN downsample -> dHash -> shared simhash pigeonhole banding
    + hamming verify, recall exact at max_dist<=bands-1. The planted
    image encodes md5_hash64(visual_id) bit-for-bit in its horizontal
    gradients (±1 steps from 32 at even columns; the 9x8 downsample
    lands exactly on them), so the pipeline's recovered fingerprint —
    and therefore every pair — is the md5_number_upper SQL expression."""
    import numpy as np
    from pypdfium2_ray.functions.bmp import encode_bmp
    from pypdfium2_ray.functions.gif import encode_gif
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.imagedup import image_dup_pairs

    def to_img(t: pa.Table) -> pa.Table:
        payloads = []
        for did in t["doc_id"].to_pylist():
            v = did - 1 if did % IMG_TWIN_MOD == 1 else did
            fp = md5_hash64(str(v).encode())
            img = np.empty((16, 18), np.uint8)
            for j in range(8):
                c, vals = 32, [32]
                for k in range(8):
                    c += 1 if (fp >> (j * 8 + k)) & 1 else -1
                    vals.append(c)
                row = np.repeat(np.array(vals, np.uint8), 2)
                img[2 * j] = row
                img[2 * j + 1] = row
            enc = (encode_png, encode_bmp, encode_gif)[did % 3]
            payloads.append(enc(img))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(to_img,
                                               batch_format="pyarrow")
    with _hint(sf_dir):
        return image_dup_pairs(ds, bands=4, max_dist=3)


def _image_dups_sql() -> str:
    return f"""
        WITH f AS (SELECT doc_id,
            md5_number_upper(CAST(doc_id - CASE WHEN doc_id % {IMG_TWIN_MOD}
                = 1 THEN 1 ELSE 0 END AS VARCHAR)) AS fp
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3"""


def q_image_resize(sf_dir: str):
    """REAL resize end-to-end over a MIXED-format corpus: doc_id mod 4
    picks PNG / uncompressed BMP / GIF / baseline JPEG (all four
    from-scratch codecs — GIF exercises LZW, JPEG the DCT entropy
    round-trip); resize to half (decode -> vectorized nearest-neighbor
    -> re-encode in the same format), then header-parse the RESIZED
    payload back; the oracle recomputes halved dims and the doc_id-mod
    format."""
    import numpy as np
    from pypdfium2_ray.functions.bmp import encode_bmp
    from pypdfium2_ray.functions.gif import encode_gif
    from pypdfium2_ray.functions.jpeg import encode_jpeg
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.text import token_count
    from pypdfium2_ray.stages.multimodal import decode_images, resize_images

    def to_img(t: pa.Table) -> pa.Table:
        toks = token_count(t["text"]).to_pylist()
        payloads = []
        for did, txt, ntok in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(), toks):
            w = 2 + len(txt or "") % 64
            h = 2 + int(ntok) % 64
            img = np.zeros((h, w), dtype=np.uint8)
            enc = (encode_png, encode_bmp, encode_gif,
                   encode_jpeg)[did % 4]
            payloads.append(enc(img))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_img, batch_format="pyarrow")
    resized = resize_images(ds, scale=0.5)
    out = decode_images(resized.select_columns(["id", "data"]),
                        mode="headers")
    return _cast_i64(
        out.select_columns(["id", "status", "format", "width", "height"]),
        ["width", "height"])


def q_value_outliers(sf_dir: str):
    """Robust per-type outliers (stages/agg.grouped_mad_outliers): rows
    with |v - median| > 3 x MAD in 1e-4 units — the skew-proof curation
    gate (a z-score gate's own threshold is dragged by the outliers it
    should catch; median/MAD are not). Doubled discrete medians keep the
    whole test in int64 (2 x dev2 > 3 x mad4 — cross-multiplied, no
    division), so doubles hash-match the row_number twin bit-for-bit.
    ONE exchange on event_type, two lexsorts per partition, zero
    per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mad_outliers
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_mad_outliers(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["event_type"], "value_e4", tiebreak="event_id")


def _value_outliers_sql() -> str:
    # med2 = v[(n-1)//2] + v[n//2] under (v, event_id): both picks via
    # row_number CASE sums (odd n -> same index counted twice); dev2 and
    # mad4 repeat the rule on |2v - med2|. 2*dev2 > 3*mad4 is the
    # cross-multiplied |v-med| > 3*MAD.
    return """
WITH s AS (SELECT event_type, event_id,
                  (round(value*10000))::BIGINT AS value_e4 FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY value_e4, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c FROM s),
m AS (SELECT event_type,
             sum(CASE WHEN rn - 1 = (c - 1) // 2 THEN value_e4 ELSE 0 END)
           + sum(CASE WHEN rn - 1 = c // 2 THEN value_e4 ELSE 0 END) AS med2
      FROM r GROUP BY event_type),
d AS (SELECT r.event_type, r.event_id, r.value_e4,
             abs(2 * r.value_e4 - m.med2)::BIGINT AS dev2
      FROM r JOIN m USING (event_type)),
d2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                    ORDER BY dev2, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type) AS c FROM d),
md AS (SELECT event_type,
              sum(CASE WHEN rn - 1 = (c - 1) // 2 THEN dev2 ELSE 0 END)
            + sum(CASE WHEN rn - 1 = c // 2 THEN dev2 ELSE 0 END) AS mad4
       FROM d2 GROUP BY event_type)
SELECT d.event_type, d.event_id, d.value_e4, d.dev2, md.mad4
FROM d JOIN md USING (event_type)
WHERE 2 * d.dev2 > 3 * md.mad4"""


def q_k_anon_events(sf_dir: str):
    """k-anonymity release gate (stages/privacy.k_anonymize): suppress
    every row whose quasi-identifier combination (event_type, UTC hour
    of day, value decade) isolates fewer than k=5 rows corpus-wide —
    Sweeney's re-identification floor as ONE hash exchange on the quasi
    keys + a whole-partition count-and-mask kernel (no census + semi-join
    round trip)."""
    import ray.data as rd
    from pypdfium2_ray.stages.privacy import k_anonymize
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])

    def quasi(t: pa.Table) -> pa.Table:
        import numpy as np
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) % 24
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)),
            pa.int64()).to_numpy(zero_copy_only=False)
        decade = v // 100_000  # 10-unit-wide value buckets in 1e-4 units
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "hour": pa.array(hour.astype(np.int64)),
                         "value_decade": pa.array(decade)})

    with _hint(sf_dir, "events"):
        return k_anonymize(ev.map_batches(quasi, batch_format="pyarrow"),
                           ["event_type", "hour", "value_decade"], k=5)


def _k_anon_events_sql() -> str:
    # epoch microseconds // 3.6e9 % 24 == UTC hour; value decade floors
    # the 1e-4-scaled value by 1e5. DuckDB // truncates toward zero but
    # both operands are nonnegative here (ts after 1970, value >= 0 in
    # the synthetic events table) so floor == truncate.
    return """
WITH q AS (SELECT event_id, event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hour,
                  (round(value*10000))::BIGINT // 100000 AS value_decade
           FROM events)
SELECT event_id, event_type, hour, value_decade FROM q
QUALIFY count(*) OVER (PARTITION BY event_type, hour, value_decade) >= 5"""




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
