"""Triangle counting over the link graph — the third graph-tier op
(ranking: ``stages/pagerank`` / ``stages/hits``; connectivity:
``stages/components``; local clustering structure: here).

Per-node triangle participation counts are the building block of the
clustering coefficient (2T / d(d-1)) — a standard web-graph spam /
community signal the extraction tier's link graph feeds.

Algorithm: degree-ordered wedge generation + edge semi-join (Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW'11 — public paper). Every edge {a,b} is oriented from the
lower-(degree, id) endpoint to the higher one; wedges are generated only
at each node's *oriented* out-neighborhood, whose size is O(sqrt(m)) in
expectation REGARDLESS of raw degree skew — a hub of in-degree 10^6 but
low out-orientation generates no quadratic work (the "last reducer"
problem id-ordered wedges would hit on the synthetic hub graph). Each
triangle {a<b<c by (deg,id)} is generated exactly once, as the wedge
(b,c) centered at a, and confirmed by the oriented edge b->c.

Exchange budget (all rows are 2-3 int64s, no payload ever moves):
canonical-distinct (1) + degree sum (1) + two degree-attach repartition
joins (2) + wedge partition (1) + wedge-edge semi-join (1) + count sum
(1). Every kernel is a vectorized whole-partition numpy/pyarrow pass —
no per-group Python (the ``exchange.partition_map`` discipline).

Scale caps: node ids and degrees must fit 31/32 bits so the packed
``(lo << 32) | hi`` edge key and the ``(deg << 32) | id`` orientation
key stay exact int64 — checked loudly per block, never truncated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import lookup_join, partition_map

_ID_MAX = 1 << 31          # packing bound: lo*2^32 + hi must fit int64


def _check_ids(arr: np.ndarray):
    if len(arr) and (arr.min() < 0 or arr.max() >= _ID_MAX):
        raise ValueError(
            "triangle_counts packs (id, id) pairs into int64 keys: node "
            f"ids must be in [0, 2^31); got [{arr.min()}, {arr.max()}]. "
            "Remap ids (dense rank) upstream for wider key spaces.")


def _canon_block(src_col: str, dst_col: str):
    """Per-block canonicalization: undirected (u=min, v=max), self-loops
    dropped, block-local distinct (the pre-combine that keeps repeated
    boilerplate edges from multiplying exchange rows)."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64())
        d = pc.cast(t[dst_col], pa.int64())
        u = pc.min_element_wise(s, d)
        v = pc.max_element_wise(s, d)
        tb = pa.table({"u": u, "v": v}).filter(pc.not_equal(u, v))
        return tb.group_by(["u", "v"], use_threads=False).aggregate([])

    return fn


def _distinct_uv(t: pa.Table) -> pa.Table:
    return t.group_by(["u", "v"], use_threads=False).aggregate([])


def _orient_block(t: pa.Table) -> pa.Table:
    """(u, v, deg_u, deg_v) -> oriented (lo, hi, khi, ekey): lo is the
    smaller endpoint by (degree, id) lexicographic order, ``khi`` that
    order key for the hi endpoint (wedge pairs sort by it), ``ekey`` the
    packed edge key the semi-join matches on."""
    if t.num_rows == 0:
        return pa.table({"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64()),
                         "khi": pa.array([], pa.int64()),
                         "ekey": pa.array([], pa.int64())})
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    du = t["deg_u"].to_numpy(zero_copy_only=False)
    dv = t["deg_v"].to_numpy(zero_copy_only=False)
    _check_ids(u)
    _check_ids(v)
    ku = (du.astype(np.int64) << 32) | u
    kv = (dv.astype(np.int64) << 32) | v
    swap = ku > kv
    lo = np.where(swap, v, u)
    hi = np.where(swap, u, v)
    khi = np.where(swap, ku, kv)
    ekey = (lo << 32) | hi
    return pa.table({"lo": lo, "hi": hi, "khi": khi, "ekey": ekey})


def _wedge_kernel(t: pa.Table) -> pa.Table:
    """One hash partition of oriented edges, complete per ``lo``: emit
    every ordered out-neighbor pair (wedge) as (wkey=packed(v,w), u).
    Sorting by (lo, khi) makes v precede w exactly when the oriented
    edge v->w could exist, so each triangle is probed exactly once."""
    if t.num_rows == 0 or "lo" not in t.column_names:
        return pa.table({"wkey": pa.array([], pa.int64()),
                         "u": pa.array([], pa.int64())})
    df = pd.DataFrame({"lo": t["lo"].to_numpy(zero_copy_only=False),
                       "hi": t["hi"].to_numpy(zero_copy_only=False),
                       "khi": t["khi"].to_numpy(zero_copy_only=False)})
    df = df.sort_values(["lo", "khi"], kind="mergesort")
    lo = df["lo"].to_numpy()
    hi = df["hi"].to_numpy()
    bound = np.flatnonzero(np.diff(lo)) + 1
    starts = np.concatenate(([0], bound))
    lengths = np.diff(np.concatenate((starts, [len(lo)])))
    out_k, out_u = [], []
    for r in np.flatnonzero(lengths >= 2):
        s = int(starts[r])
        d = int(lengths[r])
        nb = hi[s:s + d]                       # sorted by khi ascending
        ii, jj = np.triu_indices(d, k=1)
        out_k.append((nb[ii] << 32) | nb[jj])
        out_u.append(np.full(len(ii), lo[s], np.int64))
    if not out_k:
        return pa.table({"wkey": pa.array([], pa.int64()),
                         "u": pa.array([], pa.int64())})
    return pa.table({"wkey": np.concatenate(out_k),
                     "u": np.concatenate(out_u)})


def _semi_join_kernel(t: pa.Table) -> pa.Table:
    """One hash partition of tagged (key, u) rows: keep wedge rows whose
    key also appears as an edge row; unpack to triangle (u, v, w)."""
    if t.num_rows == 0 or "key" not in t.column_names:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    key = t["key"].to_numpy(zero_copy_only=False)
    u = t["u"].to_numpy(zero_copy_only=False)
    is_edge = u < 0                                # edges tagged u = -1
    closed = np.isin(key[~is_edge], np.unique(key[is_edge]))
    k = key[~is_edge][closed]
    return pa.table({"a": u[~is_edge][closed],
                     "b": k >> 32,
                     "c": k & np.int64(0xFFFFFFFF)})


def _cocite_pairs_kernel(max_out: int):
    """One hash partition of (src, dst) rows, complete per src: emit
    every unordered distinct-dst pair as a packed (lo << 32) | hi key
    with a count-1 partial. Distinct dsts per src first (a page linking
    a target twice is one citation)."""

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"pkey": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty
        d = (t.group_by(["src", "dst"], use_threads=False).aggregate([])
             .sort_by([("src", "ascending"), ("dst", "ascending")]))
        src = d["src"].to_numpy(zero_copy_only=False)
        dst = d["dst"].to_numpy(zero_copy_only=False)
        _check_ids(dst)
        bound = np.flatnonzero(np.diff(src)) + 1
        starts = np.concatenate(([0], bound))
        lengths = np.diff(np.concatenate((starts, [len(src)])))
        n_trunc = int((lengths > max_out).sum())
        if n_trunc:
            import logging
            logging.getLogger(__name__).warning(
                "co-citation truncation: %d source(s) exceed max_out=%d "
                "(largest=%d); pairs involving dropped targets are LOST "
                "— raise max_out or pre-filter catalog pages",
                n_trunc, max_out, int(lengths.max()))
        keys = []
        for r in np.flatnonzero(lengths >= 2):
            s = int(starts[r])
            m = int(min(lengths[r], max_out))
            nb = dst[s:s + m]                    # sorted ascending
            ii, jj = np.triu_indices(m, k=1)
            keys.append((nb[ii] << 32) | nb[jj])
        if not keys:
            return empty
        k = np.concatenate(keys)
        return pa.table({"pkey": k,
                         "cnt": np.ones(len(k), np.int64)})

    return fn


def _cocite_count_kernel(min_count: int):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "n_common": pa.array([], pa.int64())})
        if t.num_rows == 0 or "pkey" not in t.column_names:
            return empty
        g = t.group_by("pkey", use_threads=False).aggregate([("cnt", "sum")])
        g = g.filter(pc.greater_equal(g["cnt_sum"], min_count))
        k = g["pkey"].to_numpy(zero_copy_only=False)
        return pa.table({"id_a": k >> 32,
                         "id_b": k & np.int64(0xFFFFFFFF),
                         "n_common": g["cnt_sum"]})

    return fn


def cocitation_counts(edges, src_col: str = "src", dst_col: str = "dst",
                      min_count: int = 2, max_out: int = 10_000,
                      num_partitions: int | None = None):
    """Dataset[(id_a, id_b, n_common)] — page pairs cited together by at
    least ``min_count`` distinct linking pages (id_a < id_b): the
    co-citation "related pages" signal (Dean & Henzinger, WWW'99 —
    public paper). Same wedge machinery as :func:`triangle_counts` minus
    the closing-edge probe: one src exchange generates distinct-target
    pairs (quadratic in out-degree, which crawl pages bound naturally —
    loud ``max_out`` cap for catalog-page outliers), one packed-key
    exchange sums counts."""
    canon = edges.map_batches(_canon_directed(src_col, dst_col),
                              batch_format="pyarrow")
    pairs = partition_map(canon, ["src"], _cocite_pairs_kernel(max_out),
                          num_partitions=num_partitions)
    return partition_map(pairs, ["pkey"], _cocite_count_kernel(min_count),
                         num_partitions=num_partitions)


def _canon_directed(src_col: str, dst_col: str):
    """Directed canonicalization for co-citation: keep direction, drop
    self-loops, block-local distinct pre-combine."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64())
        d = pc.cast(t[dst_col], pa.int64())
        tb = pa.table({"src": s, "dst": d}).filter(pc.not_equal(s, d))
        return tb.group_by(["src", "dst"], use_threads=False).aggregate([])

    return fn


def _und_deg(edges, src_col: str, dst_col: str,
             num_partitions: int | None):
    """Shared front half of the triangle family: canonical distinct
    undirected edges + per-node degrees (one exchange each)."""
    canon = edges.map_batches(_canon_block(src_col, dst_col),
                              batch_format="pyarrow")
    und = partition_map(canon, ["u"], _distinct_uv,
                        num_partitions=num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t["u"]}),
                                 pa.table({"node": t["v"]})])

    # MATERIALIZE the shared front half: Ray Data re-executes a lazy
    # subtree once PER CONSUMER, and downstream `und` feeds a join chain
    # while `deg` is consumed up to three times (two degree-attach joins
    # + the wedge-count projection) — without this the canon/degree
    # exchanges run ~5x per query (measured: clustering_parts 15s -> 5s
    # at sf0.1/32 CPUs). Both are ids-only tables (2-3 int64 columns),
    # object-store-resident and spillable at any scale.
    und = und.materialize()
    deg = grouped_aggregate(und.map_batches(explode, batch_format="pyarrow"),
                            ["node"], {"deg": (None, "count")},
                            num_partitions=num_partitions).materialize()
    return und, deg


def triangle_counts(edges, src_col: str = "src", dst_col: str = "dst",
                    num_partitions: int | None = None):
    """Dataset[(node:int64, n_triangles:int64)] — per-node triangle
    participation counts over the undirected simple graph induced by the
    (directed, possibly duplicated, possibly self-looping) edge rows.
    Nodes in no triangle emit no row."""
    und, deg = _und_deg(edges, src_col, dst_col, num_partitions)
    return _tri_counts(und, deg, num_partitions)


def _tri_counts(und, deg, num_partitions: int | None):
    j = lookup_join(und, {"u": pa.int64(), "v": pa.int64()},
                    deg, source_key="node", key_col="u",
                    payload_cols={"deg_u": pa.int64()},
                    source_payload={"deg_u": "deg"},
                    num_partitions=num_partitions)
    j = lookup_join(j, {"u": pa.int64(), "v": pa.int64(),
                        "deg_u": pa.int64()},
                    deg, source_key="node", key_col="v",
                    payload_cols={"deg_v": pa.int64()},
                    source_payload={"deg_v": "deg"},
                    num_partitions=num_partitions)

    # oriented feeds BOTH the wedge generator and the edge side of the
    # tagged union — materialize so the two degree-attach joins run once
    # (ids-only rows, same rationale as _und_deg)
    oriented = j.map_batches(_orient_block,
                             batch_format="pyarrow").materialize()
    wedges = partition_map(oriented, ["lo"], _wedge_kernel,
                           num_partitions=num_partitions)

    # tagged union: edge rows (key, u=-1) + wedge rows (key, u)
    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["ekey"],
                         "u": pa.array(np.full(t.num_rows, -1, np.int64))})

    def wedge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["wkey"], "u": t["u"]})

    tagged = (oriented.map_batches(edge_rows, batch_format="pyarrow")
              .union(wedges.map_batches(wedge_rows, batch_format="pyarrow")))
    tris = partition_map(tagged, ["key"], _semi_join_kernel,
                         num_partitions=num_partitions)

    def tri_nodes(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t["a"]}),
                                 pa.table({"node": t["b"]}),
                                 pa.table({"node": t["c"]})])

    return grouped_aggregate(
        tris.map_batches(tri_nodes, batch_format="pyarrow"),
        ["node"], {"n_triangles": (None, "count")},
        num_partitions=num_partitions)


def clustering_parts(edges, src_col: str = "src", dst_col: str = "dst",
                     num_partitions: int | None = None):
    """Exact local-clustering-coefficient PARTS per node:
    ``(node, n_triangles, n_wedges)`` for every node of undirected
    degree >= 2, where ``n_wedges = d*(d-1)/2`` — the coefficient
    ``n_triangles / n_wedges`` stays an exact rational for the consumer
    (a float division would hash-diverge), the web-graph spam /
    community-density signal the module docstring promises
    (clustering = 2T / d(d-1)).

    Shape: the shared :func:`_und_deg` front half, the
    :func:`_tri_counts` oriented-wedge machinery, then ONE left
    repartition join attaching triangle counts onto the wedge-bearing
    nodes (triangle-free nodes null-fill -> 0; degree-1 nodes have no
    wedges and emit nothing on both engines)."""
    import numpy as np

    und, deg = _und_deg(edges, src_col, dst_col, num_partitions)
    tris = _tri_counts(und, deg, num_partitions)

    def wedge_rows(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        d = d[keep]
        return pa.table({
            "node": t["node"].combine_chunks().filter(pa.array(keep)),
            "n_wedges": pa.array(d * (d - 1) // 2, pa.int64())})

    tgt = deg.map_batches(wedge_rows, batch_format="pyarrow")
    j = lookup_join(tgt, {"node": pa.int64(), "n_wedges": pa.int64()},
                    tris, source_key="node", key_col="node",
                    payload_cols={"n_triangles": pa.int64()},
                    how="left", num_partitions=num_partitions)

    def fill0(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "n_triangles": t["n_triangles"].combine_chunks()
            .fill_null(0),
            "n_wedges": t["n_wedges"]})

    return j.map_batches(fill0, batch_format="pyarrow")


def mutual_pairs(edges, src_col: str = "src", dst_col: str = "dst",
                 num_partitions: int | None = None):
    """Dataset[(id_a, id_b)] — unordered node pairs linked in BOTH
    directions (a→b and b→a) over the distinct self-loop-free edge set:
    reciprocal links, the strongest relatedness signal a raw link graph
    gives (nav bars, cross-references, mutual follows) and the classic
    reciprocity numerator. ``id_a < id_b``.

    ONE packed-key exchange: each directed edge becomes its unordered
    ``(lo << 32) | hi`` key plus a direction flag (block-local distinct
    pre-combine first), the per-partition kernel keeps keys where BOTH
    flag values appear (one pyarrow min/max group_by — no joins, no
    per-pair Python). Node ids must fit 31 bits (checked loudly by the
    shared pack guard)."""

    def pack(t: pa.Table) -> pa.Table:
        empty = pa.table({"pkey": pa.array([], pa.int64()),
                          "fwd": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        _check_ids(s)
        _check_ids(d)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        base = pa.table({"pkey": pa.array((lo << 32) | hi),
                         "fwd": pa.array((s < d).astype(np.int64))})
        return base.group_by(["pkey", "fwd"], use_threads=False) \
            .aggregate([])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if t.num_rows == 0 or "pkey" not in t.column_names:
            return empty
        g = t.group_by("pkey", use_threads=False) \
            .aggregate([("fwd", "min"), ("fwd", "max")])
        g = g.filter(pc.and_(pc.equal(g["fwd_min"], 0),
                             pc.equal(g["fwd_max"], 1)))
        k = g["pkey"].to_numpy(zero_copy_only=False)
        return pa.table({"id_a": k >> 32,
                         "id_b": k & np.int64(0xFFFFFFFF)})

    canon = edges.map_batches(_canon_directed(src_col, dst_col),
                              batch_format="pyarrow")
    packed = canon.map_batches(pack, batch_format="pyarrow")
    return partition_map(packed, ["pkey"], kernel,
                         num_partitions=num_partitions)
