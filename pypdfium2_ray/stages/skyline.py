"""2-D Pareto skyline (maximal points under coordinate-wise dominance).

The multi-objective selection primitive of corpus curation — "keep the
docs no other doc beats on BOTH quality and length", "the users no one
exceeds on both activity and spend". A point ``p`` survives iff no ``q``
has ``q.x >= p.x AND q.y >= p.y`` with at least one strict; equal
duplicate points do not dominate each other (both survive).

Scale shape: the skyline operator is a *filter with a partial form* —
any globally maximal point is maximal within its own block, so
``skyline(union of per-block skylines) == skyline(all)``. That makes it
a two-level reduction with NO keyed exchange: one vectorized per-block
front (the exchange-free partial), then the same kernel once over the
coalesced survivors. 2-D fronts over real (positively correlated) data
are tiny — but the combine input is unbounded in the adversarial
anti-correlated case (every point maximal), so the single-block combine
is loudly documented rather than silently capped: if the partial fronts
exceed worker memory the data IS the skyline and no algorithm shrinks it.

Kernel: sort by x descending once; a point's dominators-on-x are a
prefix, so ``A = max(y over strictly larger x)`` is a shifted
per-x-group cumulative max (``np.maximum.reduceat`` on group starts +
``accumulate``), and symmetrically ``B = max(x over strictly larger
y)``. ``p`` survives iff ``A < p.y AND B < p.x`` — two lexsorts, zero
Python rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _front_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean survival mask of the 2-D max-max skyline."""
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)

    def best_other(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """per point: max(b) over rows with strictly larger a (-inf if
        none) — one lexsort + group-prefix cumulative max."""
        order = np.lexsort((-b, -a))                  # a desc, b desc
        a_s, b_s = a[order], b[order]
        new_grp = np.concatenate(([True], a_s[1:] != a_s[:-1]))
        starts = np.flatnonzero(new_grp)
        gid = np.cumsum(new_grp) - 1
        gmax = np.maximum.reduceat(b_s, starts)       # max b per a-group
        pref = np.concatenate(
            ([np.iinfo(np.int64).min],
             np.maximum.accumulate(gmax)[:-1]))       # strictly-larger a
        out = np.empty(n, np.int64)
        out[order] = pref[gid]
        return out

    A = best_other(x, y)                               # max y where x' > x
    B = best_other(y, x)                               # max x where y' > y
    return (A < y) & (B < x)


def skyline(ds, x_col: str, y_col: str):
    """Pareto-maximal rows of ``ds`` under (x_col, y_col) max-max
    dominance. Columns must be integer-valued (the curation metrics of
    this repo are pre-scaled int64 by convention; -inf sentinels use the
    int64 minimum). All payload columns ride through unchanged.
    """
    def front(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_front_mask(x, y)))

    partial = ds.map_batches(front, batch_format="pyarrow")
    # combine: same kernel over ALL partial survivors in one block — the
    # fronts' union is small on correlated data; unbounded only when the
    # data is its own skyline (documented above, never silently capped)
    return partial.repartition(1).map_batches(front, batch_size=None,
                                              batch_format="pyarrow")
