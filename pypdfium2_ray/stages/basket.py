"""Market-basket pair co-occurrence — "frequently bought together".

The itemset-mining primitive: for every unordered pair of DISTINCT items
sharing a basket (order, session, document), how many baskets contain
both — the support counts behind association rules and co-view/co-buy
recommenders (the pair tier of A-Priori; higher-order itemsets compose
by re-running over pair ids).

Scale shape: a basket's items must colocate (inherent — the pair is a
within-basket fact), so ONE hash exchange on the basket key moves
pre-distincted ``(basket, item)`` rows (never raw lineitems: per-block
pre-distinct first). The per-partition kernel is output-sensitive and
fully vectorized — lexsort by (basket, item), then diagonal pass ``d``
pairs row ``i`` with row ``i+d`` wherever both share a basket (one
boolean vector per pass; pass count = largest basket size, work =
number of pairs emitted, the ``intervals.overlap_join`` sweep idiom) —
followed by a per-partition pyarrow ``group_by`` pre-combine, so the
second (pair-key) exchange moves one row per (partition, pair). The
top-k is the partial-bound selection (k rows per block move, no global
sort). Sorted distinct items make ``item_a < item_b`` canonical for
free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import partition_map


def pair_support(ds, basket_col: str, item_col: str,
                 num_partitions: int | None = None):
    """Dataset of ``(item_a, item_b, n_baskets)`` — support of every
    distinct unordered item pair (``item_a < item_b``), one row per
    pair. Items are int64; duplicate items within a basket count once
    (set semantics, the A-Priori convention)."""
    cols = [basket_col, item_col]

    def pre_distinct(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols, use_threads=False).aggregate([])

    dedup = ds.map_batches(pre_distinct, batch_format="pyarrow")

    def pairs_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"item_a": pa.array([], pa.int64()),
                             "item_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u = t.group_by(cols, use_threads=False).aggregate([])
        b = u[basket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = u[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, b))
        b_s, i_s = b[order], it[order]
        a_parts, b_parts = [], []
        d = 1
        while d < len(b_s):
            same = b_s[d:] == b_s[:-d]
            if not same.any():
                break           # runs are contiguous: no basket spans d
            a_parts.append(i_s[:-d][same])
            b_parts.append(i_s[d:][same])
            d += 1
        if not a_parts:
            return pa.table({"item_a": pa.array([], pa.int64()),
                             "item_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        pairs = pa.table({"item_a": np.concatenate(a_parts),
                          "item_b": np.concatenate(b_parts)})
        g = pairs.group_by(["item_a", "item_b"],
                           use_threads=False).aggregate([([], "count_all")])
        return pa.table({"item_a": g["item_a"], "item_b": g["item_b"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    partials = partition_map(dedup, [basket_col], pairs_kernel,
                             num_partitions=num_partitions)
    return grouped_aggregate(partials, ["item_a", "item_b"],
                             {"n_baskets": ("n", "sum")},
                             num_partitions=num_partitions)
