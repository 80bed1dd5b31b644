"""k-core decomposition by bounded-round peeling over the link graph.

The k-core (Seidman, "Network structure and minimum degree", Social
Networks 1983 — public literature; the distributed peeling formulation
is the standard BSP one, e.g. Montresor et al. "Distributed k-core
decomposition", PODC'11) is the crawl-graph spam/quality signal next to
PageRank and HITS: pages that survive repeated removal of weakly-linked
nodes sit in densely interconnected neighborhoods, link farms and
orphan clusters peel away.  A curation pipeline uses core membership as
a document-weighting or filtering feature.

Semantics (deterministic, partition-invariant, SQL-unrollable — the
``stages/bfs`` bounded-round contract):

- the graph is undirected and SIMPLE: edges canonicalize to
  ``(lo, hi)``, self-loops drop, duplicates collapse (one distinct
  exchange), then expand to both directions;
- ``rounds`` peel rounds: each round computes every surviving node's
  degree within the surviving subgraph and removes ALL nodes with
  ``deg < k`` simultaneously (the synchronous peel — removal order
  inside a round cannot matter, so the result is bit-identical at any
  partitioning);
- output: ``(node, deg)`` for every node with at least one edge in the
  subgraph induced by the round-``rounds`` survivor set, ``deg`` being
  its degree THERE.  With enough rounds this is exactly the k-core
  (the peel is monotone, so reaching a fixpoint ends it — the engine
  early-exits when a round removes nothing, which is invisible: later
  rounds could only re-derive the same set).  With fewer rounds it is
  the well-defined "R-round peel", and the SQL twin unrolls the same R.

Distributed costs: every exchanged row is ids+one-int64.  Per round:
ONE degree exchange (per-block pre-combined count partials) and TWO
repartition semi-joins (edges filtered on src-side and dst-side
survival); the survivor table materializes per round, severing the
iteration lineage (the components convention).  No payload, no
broadcast, no driver reads beyond the early-exit counters.

No reference analogue (pypdfium2 is single-document); graph-tier
sibling of ``stages/pagerank`` / ``stages/hits`` / ``stages/bfs``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import lookup_join, partition_map

I64 = pa.int64()


def _canon_block(src_col: str, dst_col: str):
    """Per-block canonicalize + local distinct: (lo, hi), loops dropped."""
    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], I64)
        d = pc.cast(t[dst_col], I64)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        out = pa.table({"lo": lo, "hi": hi}).filter(pc.not_equal(lo, hi))
        return out.group_by(["lo", "hi"], use_threads=False).aggregate([])
    return fn


def _distinct_expand(t: pa.Table) -> pa.Table:
    """Per-partition: global distinct on (lo, hi) — equal rows are
    co-partitioned by the exchange — then emit both directions."""
    g = t.group_by(["lo", "hi"], use_threads=False).aggregate([])
    return pa.table({
        "src": pa.concat_arrays([g["lo"].combine_chunks(),
                                 g["hi"].combine_chunks()]),
        "dst": pa.concat_arrays([g["hi"].combine_chunks(),
                                 g["lo"].combine_chunks()])})


def _degrees(edges, num_partitions):
    """(node, deg) over the current edge set — per-block partial counts,
    ONE exchange. Each undirected edge appears in both directions, so
    counting rows per ``src`` IS the undirected degree."""
    return grouped_aggregate(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"]}),
            batch_format="pyarrow"),
        keys=["node"], specs={"deg": (None, "count")},
        num_partitions=num_partitions)


def _filter_edges(edges, surv, side: str, num_partitions):
    """Keep edges whose ``side`` endpoint survives (inner repartition
    join; the joined deg payload is dropped immediately)."""
    j = lookup_join(
        target=edges, target_cols={"src": I64, "dst": I64},
        source=surv, source_key="node", key_col=side,
        payload_cols={"__d": I64}, source_payload={"__d": "deg"},
        num_partitions=num_partitions)
    return j.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow")


def kcore(edges, k: int, rounds: int,
          src_col: str = "src", dst_col: str = "dst",
          num_partitions: int | None = None):
    """Dataset[(node:int64, deg:int64)] — see module docstring.

    ``edges``: any directed/undirected edge list (direction, duplicates
    and self-loops are normalized away).  ``k >= 1``; ``rounds >= 0``
    (0 = degrees over the simple graph, no peeling filter applied to
    membership but the output still requires >=1 incident edge)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 0:
        raise ValueError("rounds must be >= 0")

    simple = partition_map(
        edges.map_batches(_canon_block(src_col, dst_col),
                          batch_format="pyarrow"),
        ["lo", "hi"], _distinct_expand,
        num_partitions=num_partitions).materialize()

    live = simple
    for _ in range(rounds):
        deg = _degrees(live, num_partitions)
        surv = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["deg"], k)),
            batch_format="pyarrow").materialize()
        n_before = deg.count()
        n_after = surv.count()
        if n_after == 0:
            # every node peeled: the k-core is empty, later rounds are
            # no-ops — return the empty table with the right schema
            import ray.data as rd
            return rd.from_arrow(pa.table({"node": pa.array([], I64),
                                           "deg": pa.array([], I64)}))
        live = _filter_edges(
            _filter_edges(live, surv, "src", num_partitions),
            surv, "dst", num_partitions).materialize()
        if n_after == n_before:
            break                               # fixpoint: true k-core

    return _degrees(live, num_partitions)
