"""Distributed connected components over a duplicate-pair edge list.

The near-dup generators (``stages/dedup.minhash_dup_pairs`` /
``simhash_dup_pairs`` / the ANN tiers) emit *pairs*; a curation pipeline
needs *clusters* — every doc labeled with its duplicate-component id so
one canonical representative per cluster can be kept.  Transitivity makes
this a connected-components problem on the (sparse) pair graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public paper),
which converges in O(log n) rounds even on path graphs, vs O(diameter)
for naive min-label propagation.  Each round is expressed Ray-Data-first:

- *large-star*: symmetrize edges (one cheap ``map_batches``), hash
  partition on the center node (``exchange.partition_map``), and one
  vectorized kernel per partition computes each group's min and emits
  ``(v, min)`` for the larger neighbors — ``np.minimum.reduceat`` over
  equal-key runs, zero per-group Python.
- *small-star*: orient edges (big, small), partition on the big end,
  emit ``(v, min)`` for the smaller neighbors plus the center.

Edges are ids-only ``(u:int64, v:int64)`` rows — text never enters any
exchange.  Equal edges always co-partition (they share ``u``), so each
kernel dedups its input for free; a per-round distinct pass doubles as
the convergence check (count + order-independent hash of the distinct
edge set).  Rounds materialize the (tiny, ids-only) edge table so the
convergence aggregate and the next round share one execution — the pair
graph is orders of magnitude smaller than the corpus, so this is NOT a
full-dataset materialization.

At the fixed point every edge is ``(member, root)`` with root = the
component's min id; the final assignment pass symmetrizes once more and
takes the per-node min so roots label themselves.

No reference analogue: pypdfium2 is single-document.  This layer is what
turns the pair generators into the FineWeb/C4-style "keep one per
near-dup cluster" operator (see ``__ray_entry__.q_neardup_clusters``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

#: mixing constants for the order-independent edge-set hash (splitmix64)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _edge_hash(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per edge (splitmix64 finalizer over the
    packed pair); summed mod 2^64 it is an order- and partition-invariant
    signature of a distinct edge set."""
    with np.errstate(over="ignore"):
        x = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) \
            + v.astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


def _sorted_dedup(u: np.ndarray, v: np.ndarray):
    """Lexsort by (u, v) and drop duplicate edges. Returns (u, v)."""
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if len(u):
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keep], v[keep]
    return u, v


def _group_min(u: np.ndarray, v: np.ndarray):
    """(starts, lengths, per-run min(v)) over equal-u runs of a sorted
    edge list — the vectorized group aggregate shared by both stars."""
    starts = np.flatnonzero(np.concatenate(
        ([True], u[1:] != u[:-1]))) if len(u) else np.zeros(0, np.int64)
    lengths = np.diff(np.append(starts, len(u)))
    gmin = np.minimum.reduceat(v, starts) if len(u) else v
    return starts, lengths, gmin


def _empty_edges() -> pa.Table:
    return pa.table({"u": pa.array([], pa.int64()),
                     "v": pa.array([], pa.int64())})


def _large_star_kernel(t: pa.Table) -> pa.Table:
    """Per-partition large-star: input is the symmetrized edge list hash
    partitioned on ``u`` (each node's full neighborhood in one call).
    Emits ``(v, m)`` for every neighbor v > u, m = min(N(u) ∪ {u})."""
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    u, v = _sorted_dedup(u, v)
    starts, lengths, gmin = _group_min(u, v)
    m = np.repeat(np.minimum(gmin, u[starts]), lengths)
    mask = v > u
    return pa.table({"u": v[mask], "v": m[mask]})


def _small_star_kernel(t: pa.Table) -> pa.Table:
    """Per-partition small-star: input is oriented (u > v) and hash
    partitioned on ``u``.  Emits ``(x, m)`` for x in N(u) \\ {m} plus
    ``(u, m)``, m = min(N(u)) (< u by orientation)."""
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    u, v = _sorted_dedup(u, v)
    starts, lengths, gmin = _group_min(u, v)
    m = np.repeat(gmin, lengths)
    mask = v != m
    return pa.table({
        "u": np.concatenate([v[mask], u[starts]]),
        "v": np.concatenate([m[mask], gmin]),
    })


def _distinct_sig_kernel(t: pa.Table) -> pa.Table:
    """Distinct edges within a partition (global: equal edges share u so
    they co-partition) + one signature row appended per partition
    (cnt, hash-sum) for the convergence check."""
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    u, v = _sorted_dedup(u, v)
    h = int(_edge_hash(u, v).sum(dtype=np.uint64)) if len(u) else 0
    return pa.table({
        "u": np.concatenate([u, [-1]]).astype(np.int64),
        "v": np.concatenate([v, [-1]]).astype(np.int64),
        "__m": np.concatenate([np.zeros(len(u), np.int8),
                               np.ones(1, np.int8)]),
        "__cnt": np.concatenate([np.zeros(len(u), np.int64), [len(u)]]),
        # stored as int64 bit pattern; summed driver-side mod 2^64
        "__sig": np.concatenate([np.zeros(len(u), np.int64),
                                 [np.int64(np.uint64(h).view(np.int64))]]),
    })


def _symmetrize(t: pa.Table) -> pa.Table:
    u, v = t["u"], t["v"]
    return pa.table({"u": pa.chunked_array([u, v]).combine_chunks(),
                     "v": pa.chunked_array([v, u]).combine_chunks()})


def _orient_big_small(t: pa.Table) -> pa.Table:
    return pa.table({"u": pc.max_element_wise(t["u"], t["v"]),
                     "v": pc.min_element_wise(t["u"], t["v"])})


def _assign_kernel(t: pa.Table) -> pa.Table:
    """Final pass over the converged (symmetrized) star edges: each
    node's component is min(N(u) ∪ {u}) — roots label themselves."""
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    u, v = _sorted_dedup(u, v)
    starts, _, gmin = _group_min(u, v)
    return pa.table({"u": u[starts], "v": np.minimum(gmin, u[starts])})


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                         out_id: str = "doc_id",
                         out_comp: str = "component",
                         num_partitions: int | None = None,
                         max_rounds: int = 30):
    """Label every node of the pair graph with its component min-id.

    ``pairs``: a Dataset with int64-castable columns *id_a*, *id_b* (the
    output shape of the near-dup pair generators; extra columns are
    dropped).  Returns a Dataset ``(out_id, out_comp)`` with one row per
    distinct node; ``out_comp`` is the smallest node id in the
    component.  Self-loops are ignored; the empty graph returns an empty
    (but correctly typed) dataset.

    Raises ``RuntimeError`` after *max_rounds* un-converged rounds (the
    paper bound is O(log^2 n) star rounds; 30 covers any real corpus) —
    loud, never a silent partial answer.
    """
    import ray.data as rd

    def to_edges(t: pa.Table) -> pa.Table:
        a = pc.cast(t[id_a], pa.int64())
        b = pc.cast(t[id_b], pa.int64())
        tbl = pa.table({"u": a, "v": b})
        return tbl.filter(pc.invert(pc.equal(a, b)))

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")

    prev_sig = None
    for _ in range(max_rounds):
        big = partition_map(
            edges.map_batches(_symmetrize, batch_format="pyarrow"),
            ["u"], _large_star_kernel, num_partitions=num_partitions)
        small = partition_map(
            big.map_batches(_orient_big_small, batch_format="pyarrow"),
            ["u"], _small_star_kernel, num_partitions=num_partitions)
        # distinct + signature in ONE exchange (equal edges co-partition
        # on u); materialized so the convergence aggregate and the next
        # round share the execution — ids-only rows, not corpus data.
        staged = partition_map(small, ["u"], _distinct_sig_kernel,
                               num_partitions=num_partitions).materialize()
        cnt = 0
        sig = 0
        for b in staged.select_columns(["__cnt", "__sig"]).iter_batches(
                batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                cnt += pc.sum(b["__cnt"]).as_py() or 0
                s = b["__sig"].to_numpy(zero_copy_only=False)
                sig = (sig + int(s.view(np.uint64).sum(
                    dtype=np.uint64))) % (1 << 64)
        if cnt == 0:
            return rd.from_arrow(pa.table(
                {out_id: pa.array([], pa.int64()),
                 out_comp: pa.array([], pa.int64())}))
        edges = staged.filter(
            expr="__m == 0").select_columns(["u", "v"])
        if (cnt, sig) == prev_sig:
            assign = partition_map(
                edges.map_batches(_symmetrize, batch_format="pyarrow"),
                ["u"], _assign_kernel, num_partitions=num_partitions)
            return assign.map_batches(
                lambda t: pa.table({out_id: t["u"], out_comp: t["v"]}),
                batch_format="pyarrow")
        prev_sig = (cnt, sig)
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"(last edge count {prev_sig[0]})")
