"""Deterministic graph walks — the DeepWalk/node2vec walk-corpus
generator (Perozzi et al. KDD'14; Grover & Leskovec KDD'16 — public
papers) with the randomness replaced by a hash choice, the repo's
standing determinism discipline (hash_sample, mixture_sample):

    next edge index at step s of walk w from node u
        = md5_64(f"{w}|{s}|{u}") % outdeg(u)

so the walk corpus is run/shard/cluster-invariant AND exactly
reproducible in SQL (``md5_number_upper`` over the same string).
Graph-embedding pipelines want exactly this: re-running the corpus job
must regenerate identical training sequences.

Distributed shape: one preparation exchange ranks each node's out-edges
(sort by dst; rank r, outdeg d carried on every edge row, packed key
``(src << 32) | r``), then per step TWO ids-only repartition joins —
frontier -> outdeg (computes the choice; sinks drop out of the inner
join, ending their walks) and chosen-key -> edge (resolves the next
node). All rows are 2-3 int64s; per-step frontiers are materialized
(the components/bfs convention). Duplicate edges are walked as a
multigraph — duplicated (src,dst) rows double that target's pick
probability on both sides identically (equal-dst rows are
interchangeable, so rank-tie order cannot matter).

The per-row md5 in the choice is inherent to the contract (one digest
per walk-step), the hash_sample cost class — NOT a vectorization miss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import lookup_join, partition_map

_ID_MAX = 1 << 31      # (src << 32) | r packing bound, as stages/triangles


def _rank_edges_kernel(t: pa.Table) -> pa.Table:
    """One hash partition of (src, dst) rows, complete per src: emit
    (ekey, dst) indexed edge rows plus per-src outdeg via the run."""
    if t.num_rows == 0 or "src" not in t.column_names:
        return pa.table({"ekey": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "src": pa.array([], pa.int64()),
                         "outdeg": pa.array([], pa.int64()),
                         "first": pa.array([], pa.int8())})
    df = pd.DataFrame({"src": t["src"].to_numpy(zero_copy_only=False),
                       "dst": t["dst"].to_numpy(zero_copy_only=False)})
    df = df.sort_values(["src", "dst"], kind="mergesort")
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    if len(src) and (src.min() < 0 or src.max() >= _ID_MAX
                     or dst.min() < 0):
        raise ValueError("graph_walks packs (src << 32) | rank into int64:"
                         " node ids must be in [0, 2^31)")
    bound = np.flatnonzero(np.diff(src)) + 1
    starts = np.concatenate(([0], bound))
    lengths = np.diff(np.concatenate((starts, [len(src)])))
    r = np.arange(len(src), dtype=np.int64) - np.repeat(starts, lengths)
    outdeg = np.repeat(lengths.astype(np.int64), lengths)
    return pa.table({"ekey": (src << 32) | r, "dst": dst,
                     "src": src, "outdeg": outdeg,
                     "first": (r == 0).astype(np.int8)})


def _choice_fn(step: int):
    """Frontier rows (walk_id, node, outdeg) -> packed chosen-edge key."""

    def fn(t: pa.Table) -> pa.Table:
        from pypdfium2_ray.functions.sketch import md5_hash64
        if t.num_rows == 0:
            return pa.table({"walk_id": pa.array([], pa.int64()),
                             "ekey": pa.array([], pa.int64())})
        wid = t["walk_id"].to_numpy(zero_copy_only=False)
        node = t["node"].to_numpy(zero_copy_only=False)
        deg = t["outdeg"].to_numpy(zero_copy_only=False)
        # int(d) is load-bearing: md5_hash64 returns a full-range uint64
        # python int, and `bigint % np.int64` silently coerces BOTH to
        # float64 (losing the low bits of the hash); pure-python modulo
        # is exact
        idx = np.fromiter(
            (md5_hash64(f"{w}|{step}|{u}".encode()) % int(d)
             for w, u, d in zip(wid, node, deg)),
            dtype=np.int64, count=len(wid))
        return pa.table({"walk_id": pa.array(wid, pa.int64()),
                         "ekey": (node << 32) | idx})

    return fn


def graph_walks(edges, nodes, walks_per_node: int, length: int,
                src_col: str = "src", dst_col: str = "dst",
                node_col: str = "node",
                num_partitions: int | None = None):
    """Dataset[(walk_id, pos, node)] — ``walks_per_node`` hash-driven
    walks of up to ``length`` steps from every node (walk_id = node *
    walks_per_node + t). Walks reaching a sink stop early; every walk
    emits at least its pos-0 row."""
    if walks_per_node < 1 or length < 0:
        raise ValueError("need walks_per_node >= 1 and length >= 0")
    T = walks_per_node

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t[src_col], pa.int64()),
                         "dst": pc.cast(t[dst_col], pa.int64())})

    indexed = partition_map(edges.map_batches(canon, batch_format="pyarrow"),
                            ["src"], _rank_edges_kernel,
                            num_partitions=num_partitions).materialize()
    degs = indexed.filter(expr="first == 1") \
                  .select_columns(["src", "outdeg"])
    edge_rows = indexed.select_columns(["ekey", "dst"])

    def seed_rows(t: pa.Table) -> pa.Table:
        n = pc.cast(t[node_col], pa.int64()).to_numpy(zero_copy_only=False)
        if len(n) and (n.min() < 0 or n.max() >= _ID_MAX):
            raise ValueError("graph_walks node ids must be in [0, 2^31)")
        wid = (np.repeat(n, T) * T
               + np.tile(np.arange(T, dtype=np.int64), len(n)))
        return pa.table({"walk_id": pa.array(wid, pa.int64()),
                         "pos": pa.array(np.zeros(len(wid), np.int64)),
                         "node": pa.array(np.repeat(n, T), pa.int64())})

    frontier = nodes.map_batches(seed_rows,
                                 batch_format="pyarrow").materialize()
    out = frontier

    for s in range(length):
        cur = frontier.select_columns(["walk_id", "node"])
        with_deg = lookup_join(
            cur, {"walk_id": pa.int64(), "node": pa.int64()},
            degs, source_key="src", key_col="node",
            payload_cols={"outdeg": pa.int64()},
            num_partitions=num_partitions)
        chosen = with_deg.map_batches(_choice_fn(s), batch_format="pyarrow")
        nxt = lookup_join(
            chosen, {"walk_id": pa.int64(), "ekey": pa.int64()},
            edge_rows, source_key="ekey", key_col="ekey",
            payload_cols={"dst": pa.int64()},
            num_partitions=num_partitions)

        def step_rows(t: pa.Table, _p=s + 1) -> pa.Table:
            return pa.table({
                "walk_id": t["walk_id"],
                "pos": pa.array(np.full(t.num_rows, _p, np.int64)),
                "node": t["dst"]})

        frontier = nxt.map_batches(step_rows,
                                   batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        out = out.union(frontier)

    return out
