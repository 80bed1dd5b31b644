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

import numpy as np

_MERSENNE = (1 << 31) - 1  # universal-hash modulus; 31-bit so a*h+b fits in uint64


def _hash64(data: bytes) -> int:
    """Stable 64-bit hash (blake2b keyed, 8-byte digest)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def char_shingles(text: str, k: int = 5) -> set[bytes]:
    """Character k-shingles of a whitespace-normalized text."""
    t = " ".join(text.split())
    if len(t) < k:
        return {t.encode("utf-8")} if t else set()
    return {t[i:i + k].encode("utf-8") for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[bytes]:
    """Word n-grams (token shingles)."""
    toks = text.split()
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
    """64-bit SimHash: sign of the per-bit sum of feature hashes."""
    if not features:
        return 0
    hv = np.fromiter((_hash64(f) for f in features), dtype=np.uint64,
                     count=len(features))
    bits = (hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


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
