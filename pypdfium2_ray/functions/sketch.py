"""Deterministic sketching primitives for near-duplicate detection.

Pure numpy/stdlib — no Ray. Used by the dedup stages (`stages/dedup.py`):
MinHash+LSH (shingle -> signature -> band buckets), SimHash (64-bit), and
exact n-gram Jaccard for candidate verification.

No reference analogue (pypdfium2 has no corpus-level ops); these are the
standard published constructions (Broder '97 minwise hashing; Charikar '02
simhash) required for training-data curation at crawl scale.

All hashing is seeded/keyed with fixed constants so signatures are identical
across machines, batch boundaries and actor counts.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_MERSENNE = (1 << 31) - 1  # universal-hash modulus; 31-bit so a*h+b fits in uint64

#: ASCII whitespace run — the engine's spec class (htmldoc._WS_RE / text.WS_RE),
#: NOT str.split(): Python's split is Unicode-aware and silently diverges from
#: the RE2/SQL `[ \t\r\n\f\v]` class the oracles use.
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_TOKEN_RE = re.compile(r"[^ \t\r\n\f\v]+")


def _hash64(data: bytes) -> int:
    """Stable 64-bit hash (blake2b keyed, 8-byte digest)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def md5_hash64(data: bytes) -> int:
    """64-bit hash with an exact SQL twin: first 8 MD5-digest bytes,
    little-endian == DuckDB ``md5_number_upper(s)`` (verified empirically on
    DuckDB 1.0). Used where the hash value itself must be reproducible in
    the oracle (simhash fingerprints)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def char_shingles(text: str, k: int = 5) -> set[bytes]:
    """Character k-shingles of a whitespace-normalized text (ASCII-ws
    collapse + strip, the same normalization as ``text.collapse_ws`` and its
    SQL twin)."""
    t = _WS_RE.sub(" ", text).strip(" ")
    if len(t) < k:
        return {t.encode("utf-8")} if t else set()
    return {t[i:i + k].encode("utf-8") for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[bytes]:
    """Word n-grams (token shingles; tokens = ASCII-non-ws runs, matching
    the SQL twin's ``[^ \\t\\r\\n\\f\\v]+``)."""
    toks = _TOKEN_RE.findall(text)
    if len(toks) < n:
        return {" ".join(toks).encode("utf-8")} if toks else set()
    return {" ".join(toks[i:i + n]).encode("utf-8") for i in range(len(toks) - n + 1)}


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameters of the universal-hash permutations, seeded."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingles: set[bytes], num_perm: int = 128,
                      seed: int = 1) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over a shingle set: vectorized
    min over ((a*h + b) mod p) for each permutation. Empty set -> all-max
    sentinel (never matches a non-empty set's bands)."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    hv = np.fromiter((_hash64(s) for s in shingles), dtype=np.uint64,
                     count=len(shingles))
    hv_mod = (hv % _MERSENNE).astype(np.uint64)        # 31-bit values
    # fully vectorized (n_shingles, num_perm) grid: a*h+b <= 2^62, no overflow
    grid = (hv_mod[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return grid.min(axis=0).astype(np.uint64)


def band_keys(signature: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band keys: hash each contiguous band of the signature to a 64-bit
    bucket id. len(signature) must be divisible by *bands*."""
    rows = len(signature) // bands
    assert rows * bands == len(signature)
    return [_hash64(i.to_bytes(2, "little") + signature[i * rows:(i + 1) * rows].tobytes())
            for i in range(bands)]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Signature-agreement estimate of Jaccard similarity."""
    return float(np.mean(sig_a == sig_b))


def jaccard(a: set, b: set) -> float:
    """Exact Jaccard over two sets."""
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def simhash64(features: set[bytes]) -> int:
    """64-bit SimHash: sign of the per-bit sum of feature hashes.

    Feature hash is :func:`md5_hash64` so the whole fingerprint has an
    exact DuckDB twin (``md5_number_upper`` + per-bit sign sums) — the
    simhash near-dup query is oracle-checkable end-to-end.
    """
    if not features:
        return 0
    hv = np.fromiter((md5_hash64(f) for f in features), dtype=np.uint64,
                     count=len(features))
    bits = (hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy<2 has no
    ``bitwise_count``): unpack to bits per 8-byte word and sum."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(x.astype(np.uint64).view(np.uint8).reshape(-1, 8),
                         axis=1)
    return bits.sum(axis=1).astype(np.int64)


def winnow_min_hash(text: str, k: int = 8) -> tuple[int | None, int]:
    """Rolling-window document fingerprint: ``(min-hash, n_distinct)`` over
    all character *k*-windows of the ws-collapsed text — the 1-of-n
    winnowing sketch (Schleimer et al. '03 reduced to a whole-document
    window). Hash is :func:`md5_hash64` ``>> 1`` so the value is int64-safe
    AND equals the SQL twin's ``min(md5_number_upper(w) >> 1)`` (>> is
    monotonic, so min commutes with it). Empty text -> ``(None, 0)``."""
    t = _WS_RE.sub(" ", text).strip(" ")
    if not t:
        return None, 0
    windows = {t} if len(t) < k else {t[i:i + k] for i in range(len(t) - k + 1)}
    return (min(md5_hash64(w.encode("utf-8")) for w in windows) >> 1,
            len(windows))


def sql_winnow_fingerprint(k: int = 8, table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`winnow_min_hash` per row of *table*:
    ``(id, winnow_min BIGINT, n_windows BIGINT)``."""
    return f"""
    WITH norm AS (
      SELECT {id_col} AS id,
             trim(regexp_replace({text_col}, '[ \\t\\r\\n\\f\\v]+', ' ', 'g'),
                  ' ') AS t
      FROM {table}),
    w AS (
      SELECT id, CASE
        WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
        WHEN length(t) < {k} THEN [t]
        ELSE list_distinct([substr(t, i, {k})
                            for i in range(1, length(t) - {k} + 2)])
      END AS ws FROM norm),
    u AS (SELECT id, unnest(ws) AS g FROM w),
    agg AS (SELECT id, min(md5_number_upper(g) >> 1) AS m,
                   count(DISTINCT g) AS n
            FROM u GROUP BY id)
    SELECT w.id, CAST(agg.m AS BIGINT) AS winnow_min,
           coalesce(agg.n, 0)::BIGINT AS n_windows
    FROM w LEFT JOIN agg ON w.id = agg.id"""


def sql_simhash_fingerprints(ngram_n: int = 3, table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB CTE body computing the EXACT :func:`simhash64` fingerprint per
    row of *table* — word ``ngram_n``-grams over ASCII-ws tokens, feature
    hash ``md5_number_upper`` (== :func:`md5_hash64`), per-bit sign sums.
    Returns a query selecting ``(id, fp UBIGINT)``.
    """
    # token list; n-grams (DuckDB list slicing is 1-based inclusive);
    # short texts collapse to one joined feature, empty to none — mirroring
    # word_ngrams() exactly
    return f"""
    WITH toks AS (
      SELECT {id_col} AS id,
             regexp_extract_all({text_col}, '[^ \\t\\r\\n\\f\\v]+') AS w
      FROM {table}
    ),
    grams AS (
      SELECT id, CASE
        WHEN len(w) = 0 THEN []
        WHEN len(w) < {ngram_n} THEN [array_to_string(w, ' ')]
        ELSE list_distinct([array_to_string(w[i:i+{ngram_n - 1}], ' ')
                            for i in range(1, len(w) - {ngram_n} + 2)])
      END AS gs FROM toks
    ),
    feat AS (
      SELECT id, md5_number_upper(unnest(gs)) AS hv FROM grams
    ),
    bits AS (
      SELECT id, b.bit,
             CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS s
      FROM feat, (SELECT unnest(range(64)) AS bit) b
    ),
    acc AS (SELECT id, bit, sum(s) AS tot FROM bits GROUP BY id, bit),
    fp0 AS (
      SELECT id,
             sum(CASE WHEN tot > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT
                 END)::UBIGINT AS fp
      FROM acc GROUP BY id
    )
    -- docs whose gram list is empty never reach feat; restore them as fp=0
    SELECT g.id, coalesce(fp0.fp, 0::UBIGINT) AS fp
    FROM grams g LEFT JOIN fp0 ON g.id = fp0.id"""


def simhash_band_keys(h: int, bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into *bands* equal bit-chunks (pigeonhole
    blocking: two hashes within hamming distance < bands share >= 1 band).

    The band id is packed at a fixed shift of 58 (not ``width*2``, which
    overflowed int64 for bands=2 and could collide band bits for wide
    chunks), so keys stay distinct across bands and int64-safe for any
    bands >= 2 (chunk width <= 32 < 58 bits). Keys are grouped together
    with the ``band`` column anyway; the packing is belt-and-braces.
    """
    assert 2 <= bands <= 32, "int64-safe packing needs 2 <= bands <= 32"
    width = 64 // bands
    mask = (1 << width) - 1
    return [(i << 58) | ((h >> (i * width)) & mask) for i in range(bands)]
