"""Bounded-round synchronous label propagation over the link graph.

Label propagation (Raghavan, Albert & Kumara, "Near linear time
algorithm to detect community structures in large-scale networks",
Phys. Rev. E 2007 — public literature) is the cheap community detector
a crawl-curation pipeline runs beside PageRank/HITS/k-core: mirror
farms, template families and tightly-linked site clusters converge to
one label within a few rounds, giving a grouping key for per-community
caps ("at most N docs per link community") and mixture accounting.

Semantics (deterministic, partition-invariant, SQL-unrollable — the
``stages/bfs`` / ``stages/kcore`` bounded-round contract):

- the graph is undirected and SIMPLE: edges canonicalize to
  ``(lo, hi)``, self-loops drop, duplicates collapse (one distinct
  exchange), then expand to both directions;
- ``label(v, 0) = v``;
- each of ``rounds`` SYNCHRONOUS rounds sets ``label(v, r+1)`` to the
  most frequent label among v's neighbors' round-``r`` labels, ties
  broken by the SMALLEST label (the graph is simple, so "frequency"
  is the neighbor count per label).  Synchronous update + total-order
  tie-break makes every round a pure function of the previous one —
  bit-identical at any partitioning or block order, unlike the
  classical asynchronous sweep whose result depends on visit order;
- output: ``(node, community)`` for every node with >= 1 edge, the
  round-``rounds`` label.  Synchronous LPA can 2-cycle on bipartite
  regions instead of converging (known property of the parallel
  variant), so a FIXED round count is part of the operator contract
  rather than a truncation: both the engine and the SQL twin define
  the same R-round map.

Distributed costs: every exchanged row is 2 int64s.  Per round: ONE
repartition join fetching each edge's dst-side label (ids-only rows)
and ONE ``src`` exchange whose per-partition kernel does the
count/argmax entirely in vectorized pandas (Cython groupby ``size``
+ mergesort + ``drop_duplicates`` — no per-group Python).  Labels
materialize per round, severing the iteration lineage (the
``stages/components`` convention).  No broadcast, no driver reads.

No reference analogue (pypdfium2 is single-document); graph-tier
sibling of ``stages/pagerank`` / ``stages/kcore`` / ``stages/bfs``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from pypdfium2_ray.stages.exchange import lookup_join, partition_map
from pypdfium2_ray.stages.kcore import (
    _canon_block, _degrees, _distinct_expand)

I64 = pa.int64()


def _argmax_label_kernel(t: pa.Table) -> pa.Table:
    """Per-partition: (src, lbl) neighbor-label rows -> the modal label
    per src, ties to the smallest label.  groupby.size is the Cython
    path; the stable mergesort + drop_duplicates picks (max c, min lbl)
    without any per-group Python."""
    df = pd.DataFrame({"src": t["src"].to_numpy(zero_copy_only=False),
                       "lbl": t["lbl"].to_numpy(zero_copy_only=False)})
    g = df.groupby(["src", "lbl"], sort=False).size().reset_index(name="c")
    g = g.sort_values(["src", "c", "lbl"], ascending=[True, False, True],
                      kind="mergesort")
    g = g.drop_duplicates("src")
    return pa.table({"node": pa.array(g["src"].to_numpy(), I64),
                     "lbl": pa.array(g["lbl"].to_numpy(), I64)})


def label_propagation(edges, rounds: int,
                      src_col: str = "src", dst_col: str = "dst",
                      num_partitions: int | None = None):
    """Dataset[(node:int64, community:int64)] — see module docstring.

    ``edges``: any directed/undirected edge list (direction, duplicates
    and self-loops are normalized away).  ``rounds >= 0`` (0 = every
    node labels itself)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")

    simple = partition_map(
        edges.map_batches(_canon_block(src_col, dst_col),
                          batch_format="pyarrow"),
        ["lo", "hi"], _distinct_expand,
        num_partitions=num_partitions).materialize()

    # node set = every endpoint (one pre-combined exchange); initial
    # label is the node's own id
    labels = _degrees(simple, num_partitions).map_batches(
        lambda t: pa.table({"node": t["node"], "lbl": t["node"]}),
        batch_format="pyarrow").materialize()

    for _ in range(rounds):
        nbr = lookup_join(
            target=simple, target_cols={"src": I64, "dst": I64},
            source=labels, source_key="node", key_col="dst",
            payload_cols={"lbl": I64}, source_payload={"lbl": "lbl"},
            num_partitions=num_partitions)
        labels = partition_map(
            nbr.map_batches(lambda t: t.select(["src", "lbl"]),
                            batch_format="pyarrow"),
            ["src"], _argmax_label_kernel,
            num_partitions=num_partitions).materialize()

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "community": t["lbl"]}),
        batch_format="pyarrow")
