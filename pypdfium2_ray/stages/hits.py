"""Distributed HITS (hubs & authorities) over a link-graph edge list —
the query-independent companion of :mod:`stages.pagerank` (Kleinberg,
"Authoritative Sources in a Hyperlinked Environment", JACM 1999).

A crawl-curation pipeline wants BOTH link signals: PageRank's global
authority and HITS' hub/authority split (directory-style pages that link
out to many good documents vs the documents they endorse). Same execution
shape as PageRank — ids-only state, the textbook two-exchange half-steps:

- **auth half-step**: ``lookup_join`` attaches the current hub score onto
  edges keyed by ``src``; per-``dst`` exact int64 sum via ONE
  ``grouped_aggregate`` exchange (zero rows unioned in so sinks/isolates
  keep a row).
- **hub half-step**: symmetric — auth joined by ``dst``, summed per
  ``src``.

**Integer-scaled determinism** (repo oracle-parity discipline): the
classical L2 normalization is replaced by an integer rescale

``scale = max(1, max(raw) // init);  score = raw // scale``

— floor divisions on non-negative int64 only, so the trajectory is
bit-identical at any partitioning AND expressible as exact DuckDB integer
SQL (the driver oracle unrolls the half-steps as chained CTEs with a
``greatest(max(raw) // init, 1)`` scalar subquery; see
``__ray_entry__.oracle_sql()['hits']``). Rescaling by the max keeps every
score in ``[0, ~init]``; a sum only touches ``in_deg * init`` before the
rescale, so with the default ``init = 10**6`` the arithmetic is overflow-
safe to ``~9e12`` in-links per node — beyond any real page at web scale.

The per-half-step global max is a driver-side scalar over the (tiny,
node-count-sized) sum table — the same "small reduce per iteration" shape
as k-means' centroid update, not a data-scale materialization.

No reference analogue (pypdfium2 is single-document); graph-tier
curation op next to pagerank / connected components.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import lookup_join
from pypdfium2_ray.stages.pagerank import _zero_rows

I64 = pa.int64()


def _half_step(edges_ds, state, from_key: str, to_key: str, zeros,
               init: int, num_partitions):
    """One HITS half-step: sum the ``from_key`` endpoint's score onto the
    ``to_key`` endpoint, then integer-rescale so the max lands at ~init.
    Returns the new (node, val) state, materialized (it is the iteration
    state, linear in node count)."""
    joined = lookup_join(
        target=edges_ds, target_cols={"src": I64, "dst": I64},
        source=state, source_key="node", key_col=from_key,
        payload_cols={"val": I64}, num_partitions=num_partitions)
    contribs = joined.map_batches(
        lambda t: pa.table({"node": t[to_key], "v": t["val"]}),
        batch_format="pyarrow").union(zeros)
    sums = grouped_aggregate(contribs, keys=["node"],
                             specs={"v_sum": ("v", "sum")},
                             num_partitions=num_partitions).materialize()
    vmax = sums.max("v_sum")                    # tiny ids-only table
    scale = max(1, int(vmax) // init)

    def rescale(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "val": pc.divide(t["v_sum"], scale)})

    # LAZY on top of the materialized sums: the rescaled state is
    # consumed exactly once (the next half-step's join, or the final
    # combine), so materializing it again would only add a pipeline
    # launch per half-step — the lineage is already severed at `sums`.
    return sums.map_batches(rescale, batch_format="pyarrow")


def hits(edges, nodes, iters: int = 4, init: int = 10**6,
         num_partitions: int | None = None):
    """Fixed-point HITS.

    ``edges``: Dataset[(src:int64, dst:int64)] (parallel edges allowed —
    they contribute twice, same as the SQL oracle). ``nodes``:
    Dataset[(node:int64,)] — every node that must appear in the output.
    Returns Dataset[(node:int64, auth:int64, hub:int64)] after ``iters``
    full (auth-then-hub) iterations from ``hub = init`` everywhere.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    zeros = _zero_rows(nodes).materialize()
    hubs = nodes.map_batches(
        lambda t: pa.table({"node": pc.cast(t["node"], I64),
                            "val": pa.array([init] * t.num_rows, I64)}),
        batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = _half_step(edges, hubs, "src", "dst", zeros, init,
                          num_partitions)
        hubs = _half_step(edges, auth, "dst", "src", zeros, init,
                          num_partitions)
    out = lookup_join(
        target=auth.map_batches(
            lambda t: pa.table({"node": t["node"], "auth": t["val"]}),
            batch_format="pyarrow"),
        target_cols={"node": I64, "auth": I64},
        source=hubs, source_key="node", key_col="node",
        payload_cols={"val": I64}, num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "auth": t["auth"],
                            "hub": t["val"]}),
        batch_format="pyarrow")
