"""Canonical-chain resolution by pointer doubling (path compression).

``rel=canonical`` / redirect edges form a FUNCTIONAL graph (one out-edge
per node: ``f(u) = canonical(u)``, roots are self-loops). Resolving
every node to its final target naively follows chains step by step —
O(max chain length) sequential joins. Pointer doubling (the classic
PRAM path-compression / Wyllie's list-ranking step, the same trick
Spark-style connected components use for hooking) squares the function
each round: ``f_{k+1}(x) = f_k(f_k(x))``, so ``rounds`` exchanges
resolve chains up to length ``2^rounds`` — 30 rounds cover a
billion-long chain.

Every round is ONE ids-only repartition join (``exchange.lookup_join``
on int64 keys) followed by a materialize that severs the iteration
lineage (the components/BFS convention). Rows are ``(src:int64,
canon:int64)`` throughout — no payloads ever move.

Determinism contract (what makes the SQL twin exact): the result is
DEFINED as ``f^(2^rounds)`` plus an ``is_root`` flag
(``f(canon) == canon``), not as "the root" — on a cycle (canonical
loops exist in real crawls) ``f^(2^rounds)`` is a well-defined node of
the cycle and ``is_root`` is false, bit-identical to the unrolled
self-join twin at any partitioning. Callers wanting cycle canonization
should group the ``is_root=false`` residue by components downstream.

Totality: an edge may point OUTSIDE the known node set (a canonical
target that was never crawled). The input is completed with identity
rows for such targets first (one tagged exchange), so every join is
total and no row is ever dropped — the completion is part of the
contract and mirrored in the twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import lookup_join, partition_map


def _complete_identity(edges, num_partitions):
    """edges (src, dst) -> edges ∪ {(d, d) : d a dst never seen as src}.
    One tagged exchange on the node id."""

    def pad_src(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": pc.cast(t["src"], pa.int64()),
                         "dst": pc.cast(t["dst"], pa.int64()),
                         "__side": pa.array(np.zeros(n, np.int8))})

    def pad_dst(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": pc.cast(t["dst"], pa.int64()),
                         "dst": pa.nulls(n, pa.int64()),
                         "__side": pa.array(np.ones(n, np.int8))})

    tagged = edges.map_batches(pad_src, batch_format="pyarrow").union(
        edges.map_batches(pad_dst, batch_format="pyarrow"))

    def kernel(t: pa.Table) -> pa.Table:
        side = t["__side"]
        srcs = t.filter(pc.equal(side, 0))
        dsts = t.filter(pc.equal(side, 1))
        out_src = srcs["node"]
        out_dst = srcs["dst"]
        if dsts.num_rows:
            missing = pc.unique(dsts["node"].combine_chunks())
            if srcs.num_rows:
                idx = pc.index_in(missing,
                                  value_set=srcs["node"].combine_chunks())
                missing = missing.filter(pc.is_null(idx))
            out_src = pa.concat_arrays(
                [out_src.combine_chunks(), missing])
            out_dst = pa.concat_arrays(
                [out_dst.combine_chunks(), missing])
        return pa.table({"src": out_src, "canon": out_dst})

    return partition_map(tagged, ["node"], kernel,
                         num_partitions=num_partitions)


def resolve_canonical(edges, rounds: int = 4,
                      num_partitions: int | None = None):
    """edges: Dataset[(src:int64, dst:int64)], one out-edge per src
    (a functional graph; roots self-loop). Returns Dataset[(src, canon,
    is_root)] with ``canon = f^(2^rounds)(src)`` and ``is_root =
    (f(canon) == canon)`` — exact for every chain shorter than
    ``2^rounds``; cycle members resolve to a deterministic cycle node
    with ``is_root=false``."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    f = _complete_identity(edges, num_partitions).materialize()
    base = f                                  # f^1, the is_root probe
    cols = {"src": pa.int64(), "canon": pa.int64()}
    for _ in range(rounds):
        j = lookup_join(f, cols, f, source_key="src", key_col="canon",
                        payload_cols={"__next": pa.int64()},
                        source_payload={"__next": "canon"},
                        num_partitions=num_partitions)

        def squash(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["src"], "canon": t["__next"]})

        f = j.map_batches(squash, batch_format="pyarrow").materialize()

    probe = lookup_join(f, cols, base, source_key="src", key_col="canon",
                        payload_cols={"__fc": pa.int64()},
                        source_payload={"__fc": "canon"},
                        num_partitions=num_partitions)

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"], "canon": t["canon"],
            "is_root": pc.equal(t["__fc"], t["canon"])})

    return probe.map_batches(flag, batch_format="pyarrow")
