"""Distributed PageRank over a link-graph edge list — the canonical
web-scale iterative operator (Brin & Page, "The Anatomy of a Large-Scale
Hypertextual Web Search Engine", WWW'98; the MapReduce formulation is the
textbook Dean & Ghemawat archetype).

A crawl-curation pipeline ranks pages by link authority to weight or
filter training documents; this stage computes a fixed-iteration,
damping-factor PageRank as pure Ray Data primitives:

- **Pre-pass (once)**: out-degree per source (``grouped_aggregate`` —
  per-block partial count, one hash exchange), then ONE
  ``exchange.lookup_join`` attaches ``outdeg`` onto every edge.  The
  degree-annotated edge table is static across iterations and is the only
  per-edge payload ever shuffled (ids + one int64).
- **Per iteration (two exchanges, the textbook minimum for a general
  graph)**: ``lookup_join`` attaches the current rank onto edges keyed by
  ``src``; a cheap vectorized map emits ``(node=dst, v=rank//outdeg)``;
  zero-contribution rows for every node are unioned in (so sinks with no
  in-links keep a row — rows of 0 are free in the sum); one
  ``grouped_aggregate`` sums per node and a final vectorized map applies
  the damping update.  The rank state table (``node:int64, rank:int64``)
  is materialized per round — it IS the algorithm's state, linear in the
  node count and orders of magnitude smaller than the corpus (ids only).

**Integer-scaled determinism** (the repo-wide oracle-parity discipline,
see ``stages/components.py`` / ``kmeans``): ranks are int64 fixed-point
(``init`` per node, default 1e9); each update is

``rank' = ((100 - damping_pct) * init) // 100
          + damping_pct * SUM(rank // outdeg over in-edges) // 100``

— all floor divisions on non-negative int64, so results are bit-identical
at any partitioning/parallelism AND expressible as exact DuckDB integer
SQL (the driver oracle unrolls the iterations as chained CTEs; see
``__ray_entry__.oracle_sql()['pagerank']``).  With no dangling nodes the
total mass is conserved at ``~N*init`` (standard per-node teleport term);
dangling nodes lose their mass to the teleport term — documented, same
convention both sides.

No reference analogue (pypdfium2 is single-document); this is the graph
member of the curation-op family next to connected components.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import lookup_join

I64 = pa.int64()


def _zero_rows(nodes):
    """(node, v=0) row per node — unioned into every iteration's sum so
    nodes with no in-links keep a rank row."""
    return nodes.map_batches(
        lambda t: pa.table({"node": pc.cast(t["node"], I64),
                            "v": pa.array([0] * t.num_rows, I64)}),
        batch_format="pyarrow")


def pagerank(edges, nodes, iters: int = 5, damping_pct: int = 85,
             init: int = 10**9, num_partitions: int | None = None):
    """Fixed-point PageRank.

    ``edges``: Dataset[(src:int64, dst:int64)] (parallel edges allowed —
    they contribute twice, same as the SQL oracle).  ``nodes``:
    Dataset[(node:int64,)] — every node that must appear in the output
    (sources, sinks and isolates alike).  Returns
    Dataset[(node:int64, rank:int64)] after ``iters`` damped updates.
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    base = ((100 - damping_pct) * init) // 100

    # --- static pre-pass: degree-annotated edges (one exchange + one join)
    outdeg = grouped_aggregate(
        edges.map_batches(
            lambda t: pa.table({"node": pc.cast(t["src"], I64)}),
            batch_format="pyarrow"),
        keys=["node"], specs={"outdeg": (None, "count")},
        num_partitions=num_partitions)
    edges_w = lookup_join(
        target=edges, target_cols={"src": I64, "dst": I64},
        source=outdeg, source_key="node", key_col="src",
        payload_cols={"outdeg": I64},
        num_partitions=num_partitions).materialize()

    zeros = _zero_rows(nodes).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({"node": pc.cast(t["node"], I64),
                            "rank": pa.array([init] * t.num_rows, I64)}),
        batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["dst"],
            "v": pc.divide(t["rank"], t["outdeg"])})   # int64 floor: >=0

    def damp(t: pa.Table) -> pa.Table:
        upd = pc.add(base, pc.divide(pc.multiply(t["v_sum"],
                                                 damping_pct), 100))
        return pa.table({"node": t["node"], "rank": pc.cast(upd, I64)})

    for _ in range(iters):
        joined = lookup_join(
            target=edges_w,
            target_cols={"src": I64, "dst": I64, "outdeg": I64},
            source=ranks, source_key="node", key_col="src",
            payload_cols={"rank": I64},
            num_partitions=num_partitions)
        contribs = joined.map_batches(contrib, batch_format="pyarrow") \
                         .union(zeros)
        sums = grouped_aggregate(contribs, keys=["node"],
                                 specs={"v_sum": ("v", "sum")},
                                 num_partitions=num_partitions)
        ranks = sums.map_batches(damp, batch_format="pyarrow").materialize()

    return ranks


def personalized_pagerank(edges, nodes, seeds, iters: int = 5,
                          damping_pct: int = 85, init: int = 10**9,
                          num_partitions: int | None = None):
    """Seed-personalized PageRank — the TrustRank shape (Gyongyi,
    Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank",
    VLDB'04 — public paper): the teleport term lands ONLY on a trusted
    seed set, so authority flows outward from seeds and link farms with
    no seed-side in-paths stay near zero.  The spam/quality weighting a
    crawl-curation pipeline applies before sampling training documents.

    Update rule (integer fixed-point, the :func:`pagerank` oracle
    discipline — every operation is floor division on non-negative
    int64, bit-identical at any partitioning, unrollable as exact SQL)::

        rank'(v) = b(v) + damping_pct * SUM(rank // outdeg over in-edges) // 100
        b(v)     = ((100 - damping_pct) * init) // 100  if v is a seed else 0
        rank_0(v) = init if v is a seed else 0

    Distributed costs match :func:`pagerank` exactly — the static seed
    base term rides the per-node zero rows and folds into the SAME
    grouped exchange as the contribution sum (a ``max`` aggregate next
    to the ``sum``: contribution rows carry b=0, so the max IS the
    static base), keeping the textbook two exchanges per iteration with
    no extra per-iteration join against the seed table.

    ``seeds``: Dataset[(node:int64,)] — a subset of ``nodes`` (rows not
    in ``nodes`` still receive rank but emit no zero row; keep seeds
    within the node set).  Returns Dataset[(node, rank)] for every node
    in ``nodes`` (non-seeds unreachable from seeds hold rank 0).
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    base = ((100 - damping_pct) * init) // 100

    outdeg = grouped_aggregate(
        edges.map_batches(
            lambda t: pa.table({"node": pc.cast(t["src"], I64)}),
            batch_format="pyarrow"),
        keys=["node"], specs={"outdeg": (None, "count")},
        num_partitions=num_partitions)
    edges_w = lookup_join(
        target=edges, target_cols={"src": I64, "dst": I64},
        source=outdeg, source_key="node", key_col="src",
        payload_cols={"outdeg": I64},
        num_partitions=num_partitions).materialize()

    def node_rows(b_val):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({"node": pc.cast(t["node"], I64),
                             "v": pa.array([0] * n, I64),
                             "b": pa.array([b_val] * n, I64)})
        return fn

    # static per-node rows: (v=0, b=0) for every node plus (v=0, b=base)
    # for seeds — the max over b inside the sum exchange recovers b(v)
    statics = nodes.map_batches(node_rows(0), batch_format="pyarrow") \
        .union(seeds.map_batches(node_rows(base), batch_format="pyarrow")) \
        .materialize()

    ranks = seeds.map_batches(
        lambda t: pa.table({"node": pc.cast(t["node"], I64),
                            "rank": pa.array([init] * t.num_rows, I64)}),
        batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t["dst"],
                         "v": pc.divide(t["rank"], t["outdeg"]),
                         "b": pa.array([0] * n, I64)})

    def damp(t: pa.Table) -> pa.Table:
        upd = pc.add(t["b_max"],
                     pc.divide(pc.multiply(t["v_sum"], damping_pct), 100))
        return pa.table({"node": t["node"], "rank": pc.cast(upd, I64)})

    for _ in range(iters):
        joined = lookup_join(
            target=edges_w,
            target_cols={"src": I64, "dst": I64, "outdeg": I64},
            source=ranks, source_key="node", key_col="src",
            payload_cols={"rank": I64},
            num_partitions=num_partitions)
        contribs = joined.map_batches(contrib, batch_format="pyarrow") \
                         .union(statics)
        sums = grouped_aggregate(
            contribs, keys=["node"],
            specs={"v_sum": ("v", "sum"), "b_max": ("b", "max")},
            num_partitions=num_partitions)
        ranks = sums.map_batches(damp, batch_format="pyarrow").materialize()

    return ranks
