"""Multi-source BFS over the link graph — crawl depth from a seed list.

"How many clicks from the seed set is this page?" is the classic crawl
scheduling / frontier-prioritization signal (breadth-first crawl order,
seed-proximity quality tiers a la OPIC): every iterative distributed
BFS formulation is bulk-synchronous frontier expansion (Pregel-style,
Malewicz et al. SIGMOD'10 — public paper), which maps onto exactly the
exchange budget of ``stages/pagerank``: per hop, ONE repartition join
(frontier onto edge sources) and ONE grouped min — all rows are
``(node:int64, depth:int64)`` pairs, no payload ever moves.

Determinism: depth_k(node) = min hops from any seed, clipped at the
fixed hop count — a pure min-semilattice fixed point, bit-identical at
any partitioning and unrollable as exact integer SQL (one chained CTE
per hop, the pagerank/hits oracle discipline). The engine expands only
the *frontier* (rows discovered in the previous hop); expanding
already-settled rows could only re-derive larger-or-equal depths, so
the optimization is invisible in the result.

Each hop's distance table is materialized: ids-only rows (the
components-stage convention), which also severs the per-round lineage
so hop k+1 does not re-execute hop k's exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import lookup_join, partition_map


def _min_depth_kernel(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "node" not in t.column_names:
        return pa.table({"node": pa.array([], pa.int64()),
                         "depth": pa.array([], pa.int64())})
    g = t.group_by("node", use_threads=False).aggregate([("depth", "min")])
    return pa.table({"node": g["node"], "depth": g["depth_min"]})


def bfs_depths(edges, seeds, hops: int,
               src_col: str = "src", dst_col: str = "dst",
               seed_col: str = "node",
               num_partitions: int | None = None):
    """Dataset[(node:int64, depth:int64)] — minimum number of directed
    edge traversals from any seed, for every node reachable within
    ``hops``; unreachable nodes emit no row. Early-exits when a frontier
    empties (invisible: later hops could not change the fixed point)."""
    if hops < 0:
        raise ValueError("hops must be >= 0")

    def canon_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t[src_col], pa.int64()),
                         "dst": pc.cast(t[dst_col], pa.int64())})

    e = edges.map_batches(canon_edges, batch_format="pyarrow")

    def seed_rows(t: pa.Table) -> pa.Table:
        n = pc.cast(t[seed_col], pa.int64())
        return pa.table({"node": n,
                         "depth": pa.array(np.zeros(len(n), np.int64))})

    # seeds may repeat: settle them through the same min kernel
    dist = partition_map(seeds.map_batches(seed_rows, batch_format="pyarrow"),
                         ["node"], _min_depth_kernel,
                         num_partitions=num_partitions).materialize()
    frontier = dist

    for k in range(hops):
        if frontier.count() == 0:
            break
        reached = lookup_join(
            e, {"src": pa.int64(), "dst": pa.int64()},
            frontier, source_key="node", key_col="src",
            payload_cols={"depth": pa.int64()},
            num_partitions=num_partitions)

        def step(t: pa.Table, _k=k) -> pa.Table:
            return pa.table({"node": t["dst"],
                             "depth": pc.add(t["depth"], 1)})

        candidates = reached.map_batches(step, batch_format="pyarrow")
        dist = partition_map(dist.union(candidates), ["node"],
                             _min_depth_kernel,
                             num_partitions=num_partitions).materialize()
        frontier = dist.filter(expr=f"depth == {k + 1}")

    return dist
