"""Z-order (Morton) layout keys — multi-column data locality for the
write path.

At 100 TB the dominant read cost is what you can SKIP: parquet row-group
pruning works when values are clustered, but sorting by one column
destroys locality in every other. Interleaving the bits of two columns
(the classic Morton curve; public technique, e.g. the Bing-maps quadkey
write-up and every lakehouse OPTIMIZE ZORDER) gives range-locality in
BOTH — rows near in z-key are near in each dimension, so min/max
statistics prune on either predicate.

Shape: the key is one vectorized numpy pass per block (the standard
shift-mask bit-spread, no Python per row); clustering is then whatever
the sink already does (``sort`` for a global layout, or
``stages/shuffle`` with the z-key as the shard key). The bit spread is
plain integer arithmetic, so the key has an exact SQL twin
(:func:`sql_zorder_key` — generated OR-of-shifts terms).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: bits taken from each column (z-key fits int64: 2*BITS <= 62)
DEFAULT_BITS = 16


def _spread_bits(x: np.ndarray, bits: int) -> np.ndarray:
    """Insert a zero between consecutive bits of the low ``bits`` of x
    (vectorized shift-mask ladder; supports bits <= 32)."""
    x = x.astype(np.uint64) & np.uint64((1 << bits) - 1)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def zorder_key(a: np.ndarray, b: np.ndarray,
               bits: int = DEFAULT_BITS) -> np.ndarray:
    """int64 Morton key of ``(a, b)``: a's bit i lands at 2i, b's at
    2i+1. Inputs are masked to the low ``bits`` (callers bucket/clamp
    upstream — the key is a LAYOUT key, not an identity)."""
    if bits > 31:
        raise ValueError("bits must be <= 31 (2*bits+1 must fit int64)")
    za = _spread_bits(np.asarray(a), bits)
    zb = _spread_bits(np.asarray(b), bits)
    return (za | (zb << np.uint64(1))).astype(np.int64)


def add_zorder_key(ds, col_a: str, col_b: str, out: str = "zkey",
                   bits: int = DEFAULT_BITS):
    """Append the z-key column (one vectorized pass per block); feed the
    result to ``sort(out)`` / ``stages.shuffle.write_shuffled(key_col=out)``
    for the clustered layout."""
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        a = pc.cast(t[col_a], pa.int64()).to_numpy()
        b = pc.cast(t[col_b], pa.int64()).to_numpy()
        return t.append_column(out, pa.array(zorder_key(a, b, bits)))
    return ds.map_batches(f, batch_format="pyarrow")


def sql_zorder_key(col_a: str, col_b: str, bits: int = DEFAULT_BITS) -> str:
    """Exact DuckDB twin: OR of per-bit shifts (generated, 2*bits terms)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
