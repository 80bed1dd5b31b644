"""Interval coverage — merge overlapping per-key intervals (the
gaps-and-islands problem) and report island count + covered time.

Sessionize (``stages/sessionize``) gaps POINT events by a fixed
threshold; this operator merges given INTERVALS ``[s, e]`` — watch-time
/ online-time / crawl-window coverage, where overlapping and touching
spans must count once. Semantics: sort a key's intervals by ``(s, e)``;
an interval starts a new island iff its ``s`` is strictly greater than
the running max of all previous ``e`` of that key (touching intervals
merge); island coverage = ``max(e) - min(s)`` per island, summed per
key. Equal-``(s, e)`` rows are interchangeable, so the result is
deterministic at any partitioning.

Distributed shape: project to ``(key:int64, s:int64, e:int64)``, ONE
hash exchange on key, whole-partition vectorized kernel — lexsort, the
per-key running max via pandas ``groupby().cummax()`` (Cython — no
per-key Python; the pure-numpy segmented-offset trick overflows int64
when segment_count x time_range exceeds 2^63, so the Cython path is the
safe one), island ids by cumsum, per-island/per-key reduce via
``reduceat``. All arithmetic int64 (µs), no float paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map


def _kernel(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"key": pa.array([], pa.int64()),
                         "n_islands": pa.array([], pa.int64()),
                         "covered": pa.array([], pa.int64())})
    k = t["key"].to_numpy(zero_copy_only=False)
    s = t["s"].to_numpy(zero_copy_only=False)
    e = t["e"].to_numpy(zero_copy_only=False)
    order = np.lexsort((e, s, k))
    k, s, e = k[order], s[order], e[order]
    # per-key running max of e (Cython groupby.cummax — int64-exact)
    seg_max = (pd.Series(e).groupby(pd.Series(k), sort=False)
               .cummax().to_numpy())
    new_key = np.ones(len(k), dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    new_island = new_key.copy()
    if len(k) > 1:
        new_island[1:] |= s[1:] > seg_max[:-1]
    isl_start = np.flatnonzero(new_island)
    # island coverage: max e inside the island minus the island's start
    isl_max = np.maximum.reduceat(seg_max, isl_start)
    cov = isl_max - s[isl_start]
    isl_key = k[isl_start]
    key_start = np.ones(len(isl_key), dtype=bool)
    key_start[1:] = isl_key[1:] != isl_key[:-1]
    kidx = np.flatnonzero(key_start)
    n_isl = np.diff(np.append(kidx, len(isl_key)))
    covered = np.add.reduceat(cov, kidx)
    return pa.table({"key": pa.array(isl_key[kidx], pa.int64()),
                     "n_islands": pa.array(n_isl, pa.int64()),
                     "covered": pa.array(covered, pa.int64())})


def interval_coverage(ds, key_col: str = "key", start_col: str = "s",
                      end_col: str = "e",
                      num_partitions: int | None = None):
    """Dataset[(key, n_islands, covered)] — overlap-merged interval
    coverage per key. Inputs with ``e < s`` are rejected loudly (a
    negative interval silently corrupts the running max)."""

    def project(t: pa.Table) -> pa.Table:
        s = pc.cast(t[start_col], pa.int64())
        e = pc.cast(t[end_col], pa.int64())
        if t.num_rows and pc.any(pc.less(e, s)).as_py():
            raise ValueError("interval_coverage: found e < s row(s)")
        return pa.table({"key": pc.cast(t[key_col], pa.int64()),
                         "s": s, "e": e})

    rows = ds.map_batches(project, batch_format="pyarrow")
    return partition_map(rows, ["key"], _kernel,
                         num_partitions=num_partitions)


def overlap_join(ds, key_col: str, start_col: str, end_col: str,
                 side_col: str, id_col: str,
                 num_partitions: int | None = None):
    """Cross-side interval OVERLAP join within each key group: pairs
    ``(id_a, id_b)`` where an A-side and a B-side interval of the same
    key satisfy ``a.start < b.end AND b.start < a.end`` — the
    temporal/session-overlap (and genomics) join primitive that range
    joins (point-in-interval) cannot express.

    ONE hash exchange on the key, then an output-sensitive vectorized
    sweep per partition: lexsort by (key, start); with starts monotone
    inside a key run, (i, i+d) overlap iff ``start[i+d] < end[i]``, so
    pass d compares the whole partition shifted by d (one vector op)
    and the loop stops at the first empty pass — monotone starts make
    validity at depth d+1 imply it at depth d, so no pairs are missed
    and the pass count equals the true maximum overlap depth (the
    output size per interval), never a silent cap. Sides are filtered
    after enumeration; ``side_col`` is 0/1 (A/B)."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if len(df) < 2:
            return empty
        key = df[key_col].to_numpy()
        s = df[start_col].to_numpy()
        e = df[end_col].to_numpy()
        side = df[side_col].to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((s, key))
        key, s, e, side, ids = (key[order], s[order], e[order],
                                side[order], ids[order])
        out_a, out_b = [], []
        d = 1
        while d < len(s):
            valid = (key[d:] == key[:-d]) & (s[d:] < e[:-d])
            if not valid.any():
                break
            i = np.flatnonzero(valid)
            j = i + d
            cross = side[i] != side[j]
            i, j = i[cross], j[cross]
            a_first = side[i] == 0
            out_a.append(np.where(a_first, ids[i], ids[j]))
            out_b.append(np.where(a_first, ids[j], ids[i]))
            d += 1
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64)})

    proj = ds.select_columns([key_col, start_col, end_col, side_col,
                              id_col])
    return partition_map(proj, [key_col], kernel, batch_format="pandas",
                         num_partitions=num_partitions)
