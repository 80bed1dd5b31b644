"""BSP (Pregel-style) actor-pool engine for iterative graph fixed points.

Four algorithms run on it: HITS (:func:`hits_bsp`), PageRank /
TrustRank (:func:`pagerank_bsp`), multi-source BFS (:func:`bfs_bsp`)
and deterministic walks (:func:`walks_bsp`) — each bit-identical to its
exchange-tier twin in ``stages/{hits,pagerank,bfs,walks}.py`` (pinned
by tests), so every unrolled SQL oracle is untouched.

Why this exists: the graph tier's iterative queries run 2 hash
exchanges per half-step in the pure Ray Data formulation
(``stages/hits.py`` et al.). The exchanges are the
right primitive for one-shot data-parallel transforms, but a fixed-point
loop pays the full operator-launch + shuffle floor EVERY hop while its
per-hop state is only (node, score) rows — measured at sf0.1/32 CPUs,
~1.2 s of machinery per half-step around microseconds of integer math.
This is the case the design brief's custom-operator ladder resolves to
"(b) an actor-pool stage holding the needed state": partition the graph
ONCE into worker actors, then iterate with direct actor-to-actor shard
transfers (Valiant's BSP model / Malewicz et al., "Pregel", SIGMOD 2010
— public methods).

Shape:

- **Scatter** (once): the edge Dataset is materialized; a plain Ray task
  per block splits it into P hash shards per direction
  (``num_returns=P`` — a shard travels object-store-direct to exactly
  one worker, blocks never touch the driver). Workers hold their edges
  as concatenated numpy columns for the whole run: src-hashed edges
  serve the auth half-step, dst-hashed edges the hub half-step (the
  standard 2x edge memory of by-direction graph partitioning — the
  partitioning assumption this operator relies on: edges/P and nodes/P
  must fit a worker's heap).
- **Superstep**: each worker maps its LOCAL node scores onto its edges
  (sorted-array ``searchsorted`` — vectorized, no Python rows), partial-
  sums contributions by destination (int64 ``np.add.at`` — exact,
  order-free), and emits P destination-hashed shards (``num_returns=P``
  again). Each worker then sums the shards addressed to it over its
  local node list (missing nodes keep 0 — the ``_zero_rows`` semantics)
  and reports its local max; the driver reduces P maxes to the global
  integer rescale ``scale = max(1, max(raw) // init)`` and the next
  superstep applies it lazily. All arithmetic is the same int64
  trajectory as ``stages/hits.hits`` — bit-identical results (pinned by
  tests), so the unrolled SQL oracle is untouched.
- **Gather**: workers return their (node, score...) Arrow tables as
  object refs; ``ray.data.from_arrow_refs`` re-enters Ray Data without
  driver materialization.

Per-superstep cost is one round of P x P object transfers of node-scale
partials — no operator graphs, no aggregator leases, no re-shuffle of
the edge table (the win that matters at 10^12 edges: the pure-Dataset
formulation re-ships every edge byte through an exchange per half-step;
here edge bytes move exactly once at scatter).

No reference analogue (pypdfium2 is single-document); the reference's mp
worker pool keeping PDFium state warm across pages (cli/render.py) is
the same reuse idea one level up.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

I64 = pa.int64()

#: multiplicative hash for node -> worker sharding (Knuth). Correctness
#: never depends on the hash (results are partitioning-invariant); it
#: only balances load for non-dense id spaces.
_H = np.int64(-1640531527)   # 2654435761 as int64 (golden-ratio hash)


def _shard_of(ids: np.ndarray, P: int) -> np.ndarray:
    return ((ids * _H) >> np.int64(33)).astype(np.int64) % P


def _split_by_shard(t: pa.Table, key: str, P: int) -> list[pa.Table]:
    ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    s = _shard_of(ids, P)
    order = np.argsort(s, kind="stable")
    bounds = np.searchsorted(s[order], np.arange(P + 1))
    tt = t.take(pa.array(order))
    return [tt.slice(bounds[j], bounds[j + 1] - bounds[j])
            for j in range(P)]


def _scatter_task(P: int, key: str, cols: list[str]):
    import ray

    @ray.remote(num_returns=P)
    def scatter(block: pa.Table):
        # Ray 2.49 quirk: zero-row blocks SKIP upstream map UDFs, so an
        # empty block can arrive with the pre-map schema — treat any
        # empty/column-less block as contributing nothing
        if block.num_rows == 0 or any(c not in block.column_names
                                      for c in cols):
            return [None] * P if P > 1 else None
        block = block.select(cols)
        shards = _split_by_shard(block, key, P)
        return shards if P > 1 else shards[0]

    return scatter


class _GraphWorker:
    """One BSP worker: holds this shard's edges (both directions) and the
    scores of its node shard across all supersteps."""

    def __init__(self, wid: int, P: int):
        self.wid, self.P = wid, P
        self._esrc: list[pa.Table] = []
        self._edst: list[pa.Table] = []
        self.nodes = np.zeros(0, np.int64)     # sorted local node ids
        self.vals: dict[str, np.ndarray] = {}  # per-state-name scores

    # -- scatter ----------------------------------------------------------
    def add_edges(self, by: str, *shards) -> int:
        buf = self._esrc if by == "src" else self._edst
        buf.extend(s for s in shards if s is not None and s.num_rows)
        return sum(s.num_rows for s in shards if s is not None)

    def add_nodes(self, *shards) -> int:
        parts = [s["node"].to_numpy(zero_copy_only=False).astype(np.int64)
                 for s in shards if s is not None and s.num_rows]
        cur = np.concatenate([self.nodes] + parts) if parts else self.nodes
        self.nodes = np.unique(cur)            # sorted + deduped
        return len(self.nodes)

    def seal(self) -> int:
        """Concatenate edge shards into flat numpy columns once."""
        def flat(bufs, a, b):
            if not bufs:
                return (np.zeros(0, np.int64), np.zeros(0, np.int64))
            t = pa.concat_tables(bufs)
            return (t[a].to_numpy(zero_copy_only=False).astype(np.int64),
                    t[b].to_numpy(zero_copy_only=False).astype(np.int64))
        # auth step reads hub[src] and sums into dst; hub step reads
        # auth[dst] and sums into src
        self.src_from, self.src_to = flat(self._esrc, "src", "dst")
        self.dst_from, self.dst_to = flat(self._edst, "dst", "src")
        self._esrc = self._edst = []
        return len(self.src_from) + len(self.dst_from)

    def init_state(self, name: str, init: int) -> None:
        self.vals[name] = np.full(len(self.nodes), init, np.int64)

    # -- superstep --------------------------------------------------------
    def emit(self, state: str, by: str, scale: int):
        """Apply the pending rescale to *state*, then emit P destination-
        hashed partial-sum shards (returned via num_returns=P)."""
        if scale > 1:
            self.vals[state] //= scale
        frm, to = ((self.src_from, self.src_to) if by == "src"
                   else (self.dst_from, self.dst_to))
        idx = np.searchsorted(self.nodes, frm)
        # every edge endpoint hashed here is in this worker's node set by
        # construction (same hash); loud guard for malformed input
        if len(idx):
            if not len(self.nodes):
                raise ValueError("edges reference an empty node set")
            clip = np.minimum(idx, len(self.nodes) - 1)
            if (self.nodes[clip] != frm).any():
                raise ValueError("edge endpoint outside node set")
            idx = clip
        v = self.vals[state][idx] if len(idx) else np.zeros(0, np.int64)
        s = _shard_of(to, self.P)
        order = np.argsort(s, kind="stable")
        to_s, v_s = to[order], v[order]
        bounds = np.searchsorted(s[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            dst = to_s[bounds[j]:bounds[j + 1]]
            val = v_s[bounds[j]:bounds[j + 1]]
            if len(dst):
                # pre-combine within the shard (exact int64, order-free)
                uniq, inv = np.unique(dst, return_inverse=True)
                acc = np.zeros(len(uniq), np.int64)
                np.add.at(acc, inv, val)
                out.append((uniq, acc))
            else:
                out.append(None)
        return out if self.P > 1 else out[0]

    def combine(self, state: str, *shards) -> int:
        """Sum incoming partials over the local node list; store as the
        new *state*; return the local max (for the global rescale)."""
        acc = np.zeros(len(self.nodes), np.int64)
        for sh in shards:
            if sh is None:
                continue
            uniq, val = sh
            pos = np.searchsorted(self.nodes, uniq)
            if len(pos):
                clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
                if not len(self.nodes) or (self.nodes[clip] != uniq).any():
                    raise ValueError("contribution to unknown node")
                # uniq is deduped per shard, so fancy += is collision-free
                acc[clip] += val
        self.vals[state] = acc
        return int(acc.max(initial=0))

    def finish(self, state: str, scale: int) -> None:
        if scale > 1:
            self.vals[state] //= scale

    def gather(self, names: list[str]) -> pa.Table:
        cols = {"node": pa.array(self.nodes, I64)}
        for n in names:
            cols[n] = pa.array(self.vals[n], I64)
        return pa.table(cols)


def _block_refs(ds):
    """Materialized Dataset -> list of Arrow block ObjectRefs (blocks
    never touch the driver)."""
    import ray
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def _default_workers() -> int:
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(16, cpus // 2))


def hits_bsp(edges, nodes, iters: int = 4, init: int = 10**6,
             num_workers: int | None = None):
    """HITS on the BSP engine — same int64 trajectory as
    :func:`stages.hits.hits` (bit-equality pinned in tests/test_hits.py),
    at one actor round per half-step instead of two hash exchanges.

    ``edges``: Dataset[(src:int64, dst:int64)]; ``nodes``:
    Dataset[(node:int64,)]. Returns Dataset[(node, auth, hub)].
    """
    import ray
    import ray.data as rd

    if iters < 1:
        raise ValueError("iters must be >= 1")
    P = num_workers or _default_workers()
    Worker = ray.remote(_GraphWorker)
    workers = [Worker.remote(i, P) for i in range(P)]

    # -- scatter (edge bytes move exactly once) ---------------------------
    edges_m = edges.materialize()
    nodes_m = nodes.materialize()
    pend = []
    for by, key in (("src", "src"), ("dst", "dst")):
        scat = _scatter_task(P, key, ["src", "dst"])
        for ref in _block_refs(edges_m):
            shards = scat.remote(ref)
            if P == 1:
                shards = [shards]
            pend.extend(workers[j].add_edges.remote(by, shards[j])
                        for j in range(P))
    nscat = _scatter_task(P, "node", ["node"])
    for ref in _block_refs(nodes_m):
        shards = nscat.remote(ref)
        if P == 1:
            shards = [shards]
        pend.extend(workers[j].add_nodes.remote(shards[j])
                    for j in range(P))
    ray.get(pend)
    ray.get([w.seal.remote() for w in workers])
    ray.get([w.init_state.remote("hub", init) for w in workers])

    # -- supersteps -------------------------------------------------------
    def half_step(src_state: str, dst_state: str, by: str,
                  pending_scale: int) -> int:
        opts = {"num_returns": P} if P > 1 else {}
        emitted = [w.emit.options(**opts).remote(src_state, by,
                                                 pending_scale)
                   for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        maxes = ray.get([
            workers[j].combine.remote(dst_state,
                                      *[emitted[i][j] for i in range(P)])
            for j in range(P)])
        return max(1, max(maxes) // init)

    hub_scale = 1
    auth_scale = 1
    for _ in range(iters):
        auth_scale = half_step("hub", "auth", "src", hub_scale)
        hub_scale = half_step("auth", "hub", "dst", auth_scale)
    ray.get([w.finish.remote("hub", hub_scale) for w in workers])

    # -- gather -----------------------------------------------------------
    tables = [w.gather.remote(["auth", "hub"]) for w in workers]
    # the gather results must EXIST before the actors die: ray.kill
    # fails still-queued tasks, and from_arrow_refs is consumed lazily
    ray.wait(tables, num_returns=len(tables))
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out


class _RankWorker(_GraphWorker):
    """PageRank/TrustRank worker: src-hashed edges only (contributions
    always flow src -> dst), out-degrees computed LOCALLY at seal (every
    edge with src = n lives on n's worker by construction — the degree
    pre-pass costs zero exchanges here), per-node static teleport base.
    """

    def seal_rank(self) -> int:
        n_edges = self.seal()
        # local out-degree per local node (src-hashed edges only)
        self.outdeg = np.zeros(len(self.nodes), np.int64)
        if len(self.src_from):
            idx = np.searchsorted(self.nodes, self.src_from)
            clip = np.minimum(idx, max(len(self.nodes) - 1, 0))
            if not len(self.nodes) or (self.nodes[clip] != self.src_from).any():
                raise ValueError("edge src outside node set")
            np.add.at(self.outdeg, clip, 1)
        return n_edges

    def init_rank(self, init: int, base: int, uniform: bool,
                  *seed_shards) -> None:
        """``uniform`` -> plain PageRank (rank0 = init and teleport base
        everywhere); else TrustRank (init/base only on the seed nodes —
        rows must be within the node set). Seed shards ride varargs so
        Ray resolves the ObjectRefs (refs nested in a list would arrive
        unresolved)."""
        n = len(self.nodes)
        if uniform:
            self.rank = np.full(n, init, np.int64)
            self.base = np.full(n, base, np.int64)
            return
        self.rank = np.zeros(n, np.int64)
        self.base = np.zeros(n, np.int64)
        for sh in seed_shards:
            if sh is None or not sh.num_rows:
                continue
            ids = sh["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.nodes, ids)
            clip = np.minimum(pos, max(n - 1, 0))
            if not n or (self.nodes[clip] != ids).any():
                raise ValueError("seed outside node set")
            self.rank[clip] = init
            self.base[clip] = base

    def rank_emit(self):
        """v = rank[src] // outdeg[src] per local edge, partial-summed by
        dst, emitted as P dst-hashed shards."""
        frm, to = self.src_from, self.src_to
        idx = (np.searchsorted(self.nodes, frm) if len(frm)
               else np.zeros(0, np.int64))
        v = (self.rank[idx] // self.outdeg[idx] if len(idx)
             else np.zeros(0, np.int64))
        s = _shard_of(to, self.P)
        order = np.argsort(s, kind="stable")
        to_s, v_s = to[order], v[order]
        bounds = np.searchsorted(s[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            dst = to_s[bounds[j]:bounds[j + 1]]
            val = v_s[bounds[j]:bounds[j + 1]]
            if len(dst):
                uniq, inv = np.unique(dst, return_inverse=True)
                acc = np.zeros(len(uniq), np.int64)
                np.add.at(acc, inv, val)
                out.append((uniq, acc))
            else:
                out.append(None)
        return out if self.P > 1 else out[0]

    def rank_combine(self, damping_pct: int, *shards) -> None:
        acc = np.zeros(len(self.nodes), np.int64)
        for sh in shards:
            if sh is None:
                continue
            uniq, val = sh
            pos = np.searchsorted(self.nodes, uniq)
            clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
            if not len(self.nodes) or (self.nodes[clip] != uniq).any():
                raise ValueError("contribution to unknown node")
            acc[clip] += val
        self.rank = self.base + (acc * damping_pct) // 100

    def rank_gather(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, I64),
                         "rank": pa.array(self.rank, I64)})


def pagerank_bsp(edges, nodes, seeds=None, iters: int = 5,
                 damping_pct: int = 85, init: int = 10**9,
                 num_workers: int | None = None):
    """PageRank (``seeds=None``) / TrustRank-personalized PageRank on
    the BSP engine — the exact integer trajectory of
    :func:`stages.pagerank.pagerank` / ``personalized_pagerank``
    (bit-equality pinned in tests), at one actor round per iteration
    instead of two hash exchanges::

        rank'(v) = b(v) + damping_pct * SUM(rank // outdeg) // 100

    Unlike the exchange formulation there is no degree-attach join at
    all: src-hashed edges mean each worker derives its out-degrees
    locally at seal. ``seeds`` (TrustRank) must lie within ``nodes``
    (loud guard; the exchange-tier ``personalized_pagerank`` remains for
    out-of-node seed sets). Returns Dataset[(node, rank)].
    """
    import ray
    import ray.data as rd

    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = ((100 - damping_pct) * init) // 100
    P = num_workers or _default_workers()
    Worker = ray.remote(_RankWorker)
    workers = [Worker.remote(i, P) for i in range(P)]

    edges_m = edges.materialize()
    nodes_m = nodes.materialize()
    pend = []
    scat = _scatter_task(P, "src", ["src", "dst"])
    for ref in _block_refs(edges_m):
        shards = scat.remote(ref)
        if P == 1:
            shards = [shards]
        pend.extend(workers[j].add_edges.remote("src", shards[j])
                    for j in range(P))
    nscat = _scatter_task(P, "node", ["node"])
    for ref in _block_refs(nodes_m):
        shards = nscat.remote(ref)
        if P == 1:
            shards = [shards]
        pend.extend(workers[j].add_nodes.remote(shards[j])
                    for j in range(P))
    ray.get(pend)
    ray.get([w.seal_rank.remote() for w in workers])

    if seeds is None:
        ray.get([w.init_rank.remote(init, base, True) for w in workers])
    else:
        seed_shards = [[] for _ in range(P)]
        for ref in _block_refs(seeds.materialize()):
            shards = nscat.remote(ref)
            if P == 1:
                shards = [shards]
            for j in range(P):
                seed_shards[j].append(shards[j])
        ray.get([w.init_rank.remote(init, base, False, *seed_shards[j])
                 for j, w in enumerate(workers)])

    opts = {"num_returns": P} if P > 1 else {}
    for _ in range(iters):
        emitted = [w.rank_emit.options(**opts).remote() for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        ray.get([
            workers[j].rank_combine.remote(
                damping_pct, *[emitted[i][j] for i in range(P)])
            for j in range(P)])

    tables = [w.rank_gather.remote() for w in workers]
    ray.wait(tables, num_returns=len(tables))   # see hits_bsp gather note
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out


class _BfsWorker(_GraphWorker):
    """Multi-source BFS worker: node universe = local edge endpoints +
    scattered seed rows; depth = -1 until settled (min-semilattice, so
    settling on first touch IS the min)."""

    def seal_bfs(self) -> int:
        n_edges = self.seal()
        self.nodes = np.unique(np.concatenate(
            [self.nodes, self.src_from, self.dst_from]))
        self.depth = np.full(len(self.nodes), -1, np.int64)
        return n_edges

    def init_seeds(self, *seed_shards) -> None:
        for sh in seed_shards:
            if sh is None or not sh.num_rows:
                continue
            ids = sh["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.nodes, ids)
            clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
            if not len(self.nodes) or (self.nodes[clip] != ids).any():
                raise ValueError("seed outside node set")
            self.depth[clip] = 0

    def bfs_emit(self, k: int):
        """Neighbors of the local depth-k frontier, as P dst-hashed
        shards of unique candidate ids (depth k+1 is implied)."""
        if len(self.src_from):
            idx = np.searchsorted(self.nodes, self.src_from)
            on_frontier = self.depth[idx] == k
            to = self.src_to[on_frontier]
        else:
            to = np.zeros(0, np.int64)
        s = _shard_of(to, self.P)
        order = np.argsort(s, kind="stable")
        to_s = to[order]
        bounds = np.searchsorted(s[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            dst = np.unique(to_s[bounds[j]:bounds[j + 1]])
            out.append(dst if len(dst) else None)
        return out if self.P > 1 else out[0]

    def bfs_combine(self, k: int, *shards) -> int:
        """Settle unseen candidates at depth k+1; return how many were
        newly settled (the driver's convergence signal)."""
        newly = 0
        for sh in shards:
            if sh is None or not len(sh):
                continue
            pos = np.searchsorted(self.nodes, sh)
            clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
            if not len(self.nodes) or (self.nodes[clip] != sh).any():
                raise ValueError("candidate outside node set")
            fresh = clip[self.depth[clip] == -1]
            self.depth[fresh] = k + 1
            newly += len(fresh)
        return newly

    def bfs_gather(self) -> pa.Table:
        keep = self.depth >= 0
        return pa.table({"node": pa.array(self.nodes[keep], I64),
                         "depth": pa.array(self.depth[keep], I64)})


def bfs_bsp(edges, seeds, hops: int, src_col: str = "src",
            dst_col: str = "dst", seed_col: str = "node",
            num_workers: int | None = None):
    """Multi-source BFS on the BSP engine — identical fixed point to
    :func:`stages.bfs.bfs_depths` (min directed hops from any seed,
    clipped at ``hops``; unreachable nodes emit no row), at one actor
    round per hop with driver-side convergence (sum of newly-settled
    counts) instead of a join + grouped-min exchange pair per hop."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    if hops < 0:
        raise ValueError("hops must be >= 0")
    P = num_workers or _default_workers()
    Worker = ray.remote(_BfsWorker)
    workers = [Worker.remote(i, P) for i in range(P)]

    def canon_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t[src_col], pa.int64()),
                         "dst": pc.cast(t[dst_col], pa.int64())})

    def canon_seeds(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t[seed_col], pa.int64())})

    edges_m = edges.map_batches(canon_edges,
                                batch_format="pyarrow").materialize()
    seeds_m = seeds.map_batches(canon_seeds,
                                batch_format="pyarrow").materialize()
    pend = []
    for by, key in (("src", "src"), ("dst", "dst")):
        scat = _scatter_task(P, key, ["src", "dst"])
        for ref in _block_refs(edges_m):
            shards = scat.remote(ref)
            if P == 1:
                shards = [shards]
            pend.extend(workers[j].add_edges.remote(by, shards[j])
                        for j in range(P))
    nscat = _scatter_task(P, "node", ["node"])
    seed_shards = [[] for _ in range(P)]
    for ref in _block_refs(seeds_m):
        shards = nscat.remote(ref)
        if P == 1:
            shards = [shards]
        for j in range(P):
            seed_shards[j].append(shards[j])
            pend.append(workers[j].add_nodes.remote(shards[j]))
    ray.get(pend)
    ray.get([w.seal_bfs.remote() for w in workers])
    ray.get([w.init_seeds.remote(*seed_shards[j])
             for j, w in enumerate(workers)])

    opts = {"num_returns": P} if P > 1 else {}
    for k in range(hops):
        emitted = [w.bfs_emit.options(**opts).remote(k) for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        newly = ray.get([
            workers[j].bfs_combine.remote(
                k, *[emitted[i][j] for i in range(P)])
            for j in range(P)])
        if sum(newly) == 0:
            break

    tables = [w.bfs_gather.remote() for w in workers]
    ray.wait(tables, num_returns=len(tables))   # see hits_bsp gather note
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out


class _WalkWorker(_GraphWorker):
    """Deterministic-walk worker (stages/walks semantics): holds its
    src-hashed out-edges sorted by (src, dst) — rank r within a node's
    run IS the edge index the md5 choice selects — plus the walk rows it
    has recorded. Frontier rows live on the owner of their current node,
    whose out-edges are local by construction."""

    def seal_walks(self) -> int:
        n = self.seal()
        order = np.lexsort((self.src_to, self.src_from))
        self.esrc = self.src_from[order]
        self.edst = self.src_to[order]
        self._out_wid: list[np.ndarray] = []
        self._out_pos: list[np.ndarray] = []
        self._out_node: list[np.ndarray] = []
        self._wid = np.zeros(0, np.int64)
        self._node = np.zeros(0, np.int64)
        return n

    def _record(self, wid, pos: int, node) -> None:
        self._out_wid.append(wid)
        self._out_pos.append(np.full(len(wid), pos, np.int64))
        self._out_node.append(node)

    def walk_seed(self, walks_per_node: int, *node_shards) -> int:
        ids = [sh["node"].to_numpy(zero_copy_only=False).astype(np.int64)
               for sh in node_shards if sh is not None and sh.num_rows]
        n = np.unique(np.concatenate(ids)) if ids else np.zeros(0, np.int64)
        T = walks_per_node
        wid = (np.repeat(n, T) * T
               + np.tile(np.arange(T, dtype=np.int64), len(n)))
        self._wid, self._node = wid, np.repeat(n, T)
        self._record(self._wid, 0, self._node)
        return len(wid)

    def walk_step(self, s: int):
        """Advance the local frontier one step: md5-choose the next edge
        per walk (sinks drop), emit (walk_id, next) shards by the next
        node's hash."""
        from pypdfium2_ray.functions.sketch import md5_hash64
        wid, node = self._wid, self._node
        start = np.searchsorted(self.esrc, node, side="left")
        end = np.searchsorted(self.esrc, node, side="right")
        deg = end - start
        alive = deg > 0
        wid, node, start, deg = (wid[alive], node[alive], start[alive],
                                 deg[alive])
        if len(wid):
            choice = np.fromiter(
                (md5_hash64(f"{w}|{s}|{u}".encode()) % int(d)
                 for w, u, d in zip(wid, node, deg)),
                dtype=np.int64, count=len(wid))
            nxt = self.edst[start + choice]
        else:
            nxt = np.zeros(0, np.int64)
        sh = _shard_of(nxt, self.P)
        order = np.argsort(sh, kind="stable")
        wid_s, nxt_s = wid[order], nxt[order]
        bounds = np.searchsorted(sh[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            a, b = bounds[j], bounds[j + 1]
            out.append((wid_s[a:b], nxt_s[a:b]) if b > a else None)
        return out if self.P > 1 else out[0]

    def walk_receive(self, pos: int, *shards) -> int:
        wids, nodes = [], []
        for sh in shards:
            if sh is None:
                continue
            wids.append(sh[0])
            nodes.append(sh[1])
        self._wid = (np.concatenate(wids) if wids
                     else np.zeros(0, np.int64))
        self._node = (np.concatenate(nodes) if nodes
                      else np.zeros(0, np.int64))
        if len(self._wid):
            self._record(self._wid, pos, self._node)
        return len(self._wid)

    def walk_gather(self) -> pa.Table:
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, np.int64))
        return pa.table({"walk_id": pa.array(cat(self._out_wid), I64),
                         "pos": pa.array(cat(self._out_pos), I64),
                         "node": pa.array(cat(self._out_node), I64)})


def walks_bsp(edges, nodes, walks_per_node: int, length: int,
              src_col: str = "src", dst_col: str = "dst",
              node_col: str = "node", num_workers: int | None = None):
    """Deterministic graph walks on the BSP engine — identical walk
    corpus to :func:`stages.walks.graph_walks` (the md5 hash-choice
    contract; pinned in tests), at one actor round per step instead of
    two repartition joins. The per-walk-step md5 stays inherent to the
    contract (hash_sample cost class)."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    if walks_per_node < 1 or length < 0:
        raise ValueError("need walks_per_node >= 1 and length >= 0")
    P = num_workers or _default_workers()
    Worker = ray.remote(_WalkWorker)
    workers = [Worker.remote(i, P) for i in range(P)]

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t[src_col], pa.int64()),
                         "dst": pc.cast(t[dst_col], pa.int64())})

    def canon_nodes(t: pa.Table) -> pa.Table:
        n = pc.cast(t[node_col], pa.int64())
        return pa.table({"node": n})

    edges_m = edges.map_batches(canon, batch_format="pyarrow").materialize()
    nodes_m = nodes.map_batches(canon_nodes,
                                batch_format="pyarrow").materialize()
    pend = []
    scat = _scatter_task(P, "src", ["src", "dst"])
    for ref in _block_refs(edges_m):
        shards = scat.remote(ref)
        if P == 1:
            shards = [shards]
        pend.extend(workers[j].add_edges.remote("src", shards[j])
                    for j in range(P))
    nscat = _scatter_task(P, "node", ["node"])
    node_shards = [[] for _ in range(P)]
    for ref in _block_refs(nodes_m):
        shards = nscat.remote(ref)
        if P == 1:
            shards = [shards]
        for j in range(P):
            node_shards[j].append(shards[j])
    ray.get(pend)
    ray.get([w.seal_walks.remote() for w in workers])
    ray.get([w.walk_seed.remote(walks_per_node, *node_shards[j])
             for j, w in enumerate(workers)])

    opts = {"num_returns": P} if P > 1 else {}
    for s in range(length):
        emitted = [w.walk_step.options(**opts).remote(s) for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        alive = ray.get([
            workers[j].walk_receive.remote(
                s + 1, *[emitted[i][j] for i in range(P)])
            for j in range(P)])
        if sum(alive) == 0:
            break

    tables = [w.walk_gather.remote() for w in workers]
    ray.wait(tables, num_returns=len(tables))   # see hits_bsp gather note
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out


def _canon_expand(src_col: str, dst_col: str):
    """Per-block canonicalize to the undirected SIMPLE graph and emit
    BOTH directions: (lo, hi) + (hi, lo), self-loops dropped, block-
    local distinct. Global distinct happens at the worker: every copy of
    a directed pair (u, v) hashes to worker hash(u), which dedups at
    seal — the same multiset the exchange-tier distinct produces."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64())
        d = pc.cast(t[dst_col], pa.int64())
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        g = pa.table({"lo": lo, "hi": hi}).filter(pc.not_equal(lo, hi))
        g = g.group_by(["lo", "hi"], use_threads=False).aggregate([])
        return pa.table({
            "src": pa.concat_arrays([g["lo"].combine_chunks(),
                                     g["hi"].combine_chunks()]),
            "dst": pa.concat_arrays([g["hi"].combine_chunks(),
                                     g["lo"].combine_chunks()])})
    return fn


class _UndirectedWorker(_GraphWorker):
    """Shared base for kcore / label propagation: src-hashed directed
    pairs of the expanded simple graph, globally deduped at seal (all
    copies of (u, v) are local by construction)."""

    def seal_simple(self) -> int:
        self.seal()
        u, v = self.src_from, self.src_to
        if len(u):
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            keep = np.ones(len(u), bool)
            keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v = u[keep], v[keep]
        self.eu, self.ev = u, v
        self.nodes = np.unique(u)             # every node has >= 1 edge
        self.edge_upos = (np.searchsorted(self.nodes, u)
                          if len(u) else np.zeros(0, np.int64))
        self.deg = np.bincount(self.edge_upos,
                               minlength=len(self.nodes)).astype(np.int64)
        return len(u)

    def _shard_pairs(self, dst: np.ndarray, val: np.ndarray):
        """(dst, val) rows pre-combined per (dst, val)=count? No — the
        callers pre-combine differently; this shards raw aligned arrays
        by hash(dst)."""
        s = _shard_of(dst, self.P)
        order = np.argsort(s, kind="stable")
        d_s, v_s = dst[order], val[order]
        bounds = np.searchsorted(s[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            a, b = bounds[j], bounds[j + 1]
            out.append((d_s[a:b], v_s[a:b]) if b > a else None)
        return out if self.P > 1 else out[0]


class _KcoreWorker(_UndirectedWorker):
    """Montresor-style decrement peeling: deg[] always equals each alive
    node's degree within the alive-induced subgraph (the invariant that
    makes one decrement round == the exchange tier's full recompute)."""

    def init_kcore(self) -> None:
        self.alive = np.ones(len(self.nodes), bool)

    def mark(self, k: int) -> int:
        """Kill every alive node with deg < k (synchronous); remember
        them for the emit phase; return how many died here."""
        newly = self.alive & (self.deg < k)
        self.alive[newly] = False
        self._newly = newly
        return int(newly.sum())

    def peel_emit(self):
        """Decrements along the just-killed nodes' edges, sharded by the
        neighbor's worker (pre-combined per neighbor)."""
        mask = self._newly[self.edge_upos] if len(self.eu) \
            else np.zeros(0, bool)
        targets = self.ev[mask]
        if len(targets):
            uniq, cnt = np.unique(targets, return_counts=True)
        else:
            uniq = cnt = np.zeros(0, np.int64)
        return self._shard_pairs(uniq, cnt.astype(np.int64))

    def peel_apply(self, *shards) -> None:
        for sh in shards:
            if sh is None:
                continue
            dst, cnt = sh
            pos = np.searchsorted(self.nodes, dst)
            clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
            if not len(self.nodes) or (self.nodes[clip] != dst).any():
                raise ValueError("decrement for unknown node")
            ok = self.alive[clip]               # dead receivers ignore
            np.subtract.at(self.deg, clip[ok], cnt[ok])

    def kcore_gather(self) -> pa.Table:
        keep = self.alive & (self.deg >= 1)
        return pa.table({"node": pa.array(self.nodes[keep], I64),
                         "deg": pa.array(self.deg[keep], I64)})


class _LpaWorker(_UndirectedWorker):
    """Synchronous label propagation: each round every node takes its
    neighbors' modal label, ties to the SMALLEST label — the exchange
    tier's exact count/argmax contract."""

    def init_lpa(self) -> None:
        self.lbl = self.nodes.copy()

    def lpa_emit(self):
        """(neighbor, my-label) pairs pre-combined per (neighbor, label)
        and sharded by the neighbor's worker."""
        if len(self.eu):
            lab = self.lbl[self.edge_upos]
            # combine per (dst, label): lexsort + run-length counts
            order = np.lexsort((lab, self.ev))
            d_s, l_s = self.ev[order], lab[order]
            new = np.ones(len(d_s), bool)
            new[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(d_s)))
            d_u, l_u = d_s[starts], l_s[starts]
        else:
            d_u = l_u = cnt = np.zeros(0, np.int64)
        s = _shard_of(d_u, self.P)
        order = np.argsort(s, kind="stable")
        d_o, l_o, c_o = d_u[order], l_u[order], cnt[order]
        bounds = np.searchsorted(s[order], np.arange(self.P + 1))
        out = []
        for j in range(self.P):
            a, b = bounds[j], bounds[j + 1]
            out.append((d_o[a:b], l_o[a:b], c_o[a:b].astype(np.int64))
                       if b > a else None)
        return out if self.P > 1 else out[0]

    def lpa_combine(self, *shards) -> None:
        ns, ls, cs = [], [], []
        for sh in shards:
            if sh is None:
                continue
            ns.append(sh[0]); ls.append(sh[1]); cs.append(sh[2])
        if not ns:
            return
        n = np.concatenate(ns); l = np.concatenate(ls)
        c = np.concatenate(cs)
        # sum partial counts per (node, label)
        order = np.lexsort((l, n))
        n, l, c = n[order], l[order], c[order]
        new = np.ones(len(n), bool)
        new[1:] = (n[1:] != n[:-1]) | (l[1:] != l[:-1])
        grp = np.cumsum(new) - 1
        tot = np.zeros(grp[-1] + 1, np.int64)
        np.add.at(tot, grp, c)
        n_u, l_u = n[new], l[new]
        # modal label per node, ties to smallest label: sort by
        # (node, -count, label) and take the first per node
        order2 = np.lexsort((l_u, -tot, n_u))
        n_o, l_o = n_u[order2], l_u[order2]
        first = np.ones(len(n_o), bool)
        first[1:] = n_o[1:] != n_o[:-1]
        pos = np.searchsorted(self.nodes, n_o[first])
        clip = np.minimum(pos, max(len(self.nodes) - 1, 0))
        if not len(self.nodes) or (self.nodes[clip] != n_o[first]).any():
            raise ValueError("label for unknown node")
        self.lbl[clip] = l_o[first]

    def lpa_gather(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, I64),
                         "lbl": pa.array(self.lbl, I64)})


def _scatter_simple(workers, edges, src_col, dst_col, P):
    import ray
    expand = _canon_expand(src_col, dst_col)
    edges_m = edges.map_batches(expand,
                                batch_format="pyarrow").materialize()
    pend = []
    scat = _scatter_task(P, "src", ["src", "dst"])
    for ref in _block_refs(edges_m):
        shards = scat.remote(ref)
        if P == 1:
            shards = [shards]
        pend.extend(workers[j].add_edges.remote("src", shards[j])
                    for j in range(P))
    ray.get(pend)
    ray.get([w.seal_simple.remote() for w in workers])


def kcore_bsp(edges, k: int, rounds: int, src_col: str = "src",
              dst_col: str = "dst", num_workers: int | None = None):
    """k-core peeling on the BSP engine — identical bounded-round
    semantics to :func:`stages.kcore.kcore` (synchronous peel, output =
    survivor degrees in the final induced subgraph; pinned in tests).
    One mark/emit/apply actor round per peel round via Montresor-style
    degree decrements (PODC'11) instead of a degree exchange plus two
    semi-joins; the decrement invariant (deg[] == degree within the
    alive-induced subgraph) makes each round bit-equal to the exchange
    tier's full recompute."""
    import ray
    import ray.data as rd

    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    P = num_workers or _default_workers()
    Worker = ray.remote(_KcoreWorker)
    workers = [Worker.remote(i, P) for i in range(P)]
    _scatter_simple(workers, edges, src_col, dst_col, P)
    ray.get([w.init_kcore.remote() for w in workers])

    opts = {"num_returns": P} if P > 1 else {}
    for _ in range(rounds):
        newly = ray.get([w.mark.remote(k) for w in workers])
        if sum(newly) == 0:
            break
        emitted = [w.peel_emit.options(**opts).remote() for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        ray.get([workers[j].peel_apply.remote(
            *[emitted[i][j] for i in range(P)]) for j in range(P)])

    tables = [w.kcore_gather.remote() for w in workers]
    ray.wait(tables, num_returns=len(tables))   # see hits_bsp gather note
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out


def label_propagation_bsp(edges, rounds: int, src_col: str = "src",
                          dst_col: str = "dst",
                          num_workers: int | None = None):
    """Synchronous label propagation on the BSP engine — identical
    bounded-round map to :func:`stages.labelprop.label_propagation`
    (modal neighbor label, ties to the smallest; pinned in tests), at
    one emit/combine actor round per round instead of a label-fetch
    join plus an argmax exchange."""
    import ray
    import ray.data as rd

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    P = num_workers or _default_workers()
    Worker = ray.remote(_LpaWorker)
    workers = [Worker.remote(i, P) for i in range(P)]
    _scatter_simple(workers, edges, src_col, dst_col, P)
    ray.get([w.init_lpa.remote() for w in workers])

    opts = {"num_returns": P} if P > 1 else {}
    for _ in range(rounds):
        emitted = [w.lpa_emit.options(**opts).remote() for w in workers]
        if P == 1:
            emitted = [[e] for e in emitted]
        ray.get([workers[j].lpa_combine.remote(
            *[emitted[i][j] for i in range(P)]) for j in range(P)])

    tables = [w.lpa_gather.remote() for w in workers]
    ray.wait(tables, num_returns=len(tables))   # see hits_bsp gather note
    out = rd.from_arrow_refs(tables)
    for w in workers:
        ray.kill(w)
    return out
