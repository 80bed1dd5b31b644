"""Vectorized Bloom filter over Arrow key columns.

The tier between "broadcast the exact key set" (fine to a few million
keys) and "ship everything through the exchange": a 10-bits-per-key
bitmap gives ~1% false positives at k=7 probes (standard Bloom sizing,
Bloom CACM'70), so a semi-join prefilter passes ~1% junk instead of the
whole corpus — and the downstream join kernel drops false positives
anyway, so correctness never depends on the filter.

All construction/probing is numpy over the whole column: one 64-bit hash
per value (pandas ``hash_array`` — deterministic, vectorized, any dtype),
a second hash derived by a vectorized splitmix64 finalizer, and k probe
positions by double hashing ``(h1 + i*h2) mod n_bits`` (Kirsch &
Mitzenmacher's standard trick). Build distributes as per-block partial
bitmaps OR-combined on the driver (bitmaps stream in; driver work is one
memcpy-OR per block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: default sizing: ~1% false positives
BITS_PER_KEY = 10
N_PROBES = 7


def _hash64(values) -> np.ndarray:
    from pandas.util import hash_array
    arr = values.to_numpy(zero_copy_only=False) if hasattr(
        values, "to_numpy") else np.asarray(values)
    return hash_array(arr, hash_key="pypdfium2rayblm0")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def sizing(n_keys: int, bits_per_key: int = BITS_PER_KEY) -> int:
    """Bitmap size in bits (multiple of 8, floor 1024)."""
    return max(1024, -(-n_keys * bits_per_key // 8) * 8)


def add(bits: np.ndarray, values, k: int = N_PROBES) -> None:
    """Set the probe bits for *values* in the packed uint8 bitmap
    (in place)."""
    n_bits = np.uint64(bits.size * 8)
    h1 = _hash64(values)
    h2 = _splitmix64(h1) | np.uint64(1)       # odd => full-period stride
    for i in range(k):
        g = (h1 + np.uint64(i) * h2) % n_bits
        np.bitwise_or.at(bits, (g >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (g & np.uint64(7))).astype(np.uint8))


def contains(bits: np.ndarray, values, k: int = N_PROBES) -> np.ndarray:
    """Boolean mask: True where ALL probe bits are set (i.e. possibly a
    member; false-positive rate ~ (1 - e^{-k/bpk})^k)."""
    n_bits = np.uint64(bits.size * 8)
    h1 = _hash64(values)
    h2 = _splitmix64(h1) | np.uint64(1)
    mask = np.ones(h1.size, bool)
    for i in range(k):
        g = (h1 + np.uint64(i) * h2) % n_bits
        byte = bits[(g >> np.uint64(3)).astype(np.int64)]
        mask &= (byte >> (g & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return mask


def build_from_dataset(ds, col: str, n_keys: int,
                       bits_per_key: int = BITS_PER_KEY,
                       k: int = N_PROBES,
                       cast_type: pa.DataType | None = None) -> np.ndarray:
    """Distributed build: each block emits its partial bitmap, the driver
    OR-combines them (one memcpy-OR per block — the bitmap, not the keys,
    is what crosses the cluster). ``cast_type``: cast keys before hashing
    — probe-side values MUST be cast to the same type (the hash is
    dtype-sensitive)."""
    import pyarrow.compute as pc
    n_bits = sizing(n_keys, bits_per_key)
    nbytes = n_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        if t.num_rows:
            col_arr = t[col].combine_chunks()
            if cast_type is not None:
                col_arr = pc.cast(col_arr, cast_type)
            add(bits, col_arr, k)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(nbytes, np.uint8)
    parts = ds.select_columns([col]).map_batches(
        partial, batch_size=None, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["bits"].to_pylist():
            out |= np.frombuffer(buf, np.uint8)
    return out
