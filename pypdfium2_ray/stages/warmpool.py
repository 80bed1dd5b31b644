"""Warm aggregator-actor reuse across hash exchanges.

Every keyed exchange (``exchange.partition_map`` / ``lookup_join`` and any
other hash-shuffle op) pays an aggregator-actor spawn on this Ray 2.49:
``HashShufflingOperatorBase._do_shutdown`` unconditionally ``ray.kill``-s
its ``AggregatorPool`` (hash_shuffle.py:842 — ``shutdown(force=True)``),
so even within one Ray session every exchange re-forks worker processes
and re-imports ray.data inside them. Measured floor (BASELINE.md round-3
addendum 2): first exchange ~2.5 s cold, later ones 0.7–1.2 s warm — and
the iterative graph tier (hits / pagerank / triangles / local_clustering)
stacks 7+ exchanges per query, so the floor IS the query cost at bench
scale.

This module removes the per-exchange spawn by **leasing aggregator actors
from a session-level cache**:

- :class:`_ReusableAggregator` is a drop-in for Ray's
  ``HashShuffleAggregator`` (same ``submit`` / ``finalize`` contract,
  body mirrors ray/data/_internal/execution/operators/hash_shuffle.py:1370-1409)
  plus a ``reset()`` that swaps in the next exchange's aggregation state.
- ``AggregatorPool.start`` is patched to lease compatible actors (same
  remote-args key: num_cpus / memory / max_concurrency /
  scheduling_strategy) and ``reset`` them **synchronously** — resets are
  ``ray.get``-ed before ``start`` returns, so no shuffle ``submit`` can
  race a reset on the threaded actor. A dead cached actor fails its
  reset and is replaced by a fresh spawn (the cache is best-effort, never
  load-bearing for correctness).
- ``HashShufflingOperatorBase._do_shutdown`` is patched to **stash** the
  pool's actors back into the cache — but only on a *clean* completion
  (all partitions finalized, no active shuffle or finalize tasks). An
  aborted exchange may still have in-flight ``submit`` RPCs from worker
  tasks that would pollute the next lease's state, so its actors are
  killed exactly as stock Ray does.

Safety rails:

- the cache is keyed by the cluster's unique session name (job ids are
  per-cluster sequential, so a shutdown/init cycle reuses '01000000') —
  a new cluster silently drops stale handles instead of calling into a
  dead one, and a lease whose submit still fails falls back to a fresh
  spawn;
- cached-idle actors keep their logical num_cpus / memory reservations
  (that is what makes the next lease instant), so the cache is bounded:
  at most ``_MAX_CACHED`` actors and at most 25% of cluster CPUs of
  idle reservation — beyond that, overflow actors are killed like stock
  Ray. On the 4-CPU test fixture this caps idle reservation at 1 CPU,
  so map stages can never be starved by the cache;
- ``GRAFT_NO_WARMPOOL=1`` disables the patch entirely (stock behavior).

Multi-node note: leases keep each actor's original ``scheduling_strategy``
("SPREAD") placement — an actor leased on node A stays on node A, which
is exactly as good as a fresh SPREAD spawn. The cache grows with query
concurrency, not with data size.

No reference analogue: pypdfium2's mp pool (cli/render.py:401-524) keeps
workers warm across pages for the same reason this keeps aggregators warm
across exchanges.
"""

from __future__ import annotations

import logging
import os
import threading

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
#: args-key -> list of idle ActorHandles (leased out on use)
_CACHE: dict[tuple, list] = {}
#: job id the cache belongs to; a new Ray session invalidates all handles
_JOB_ID: str | None = None
#: total logical CPUs reserved by cached-idle actors
_CACHED_CPUS: float = 0.0
_MAX_CACHED = 64
_INSTALLED = False

#: observability counters (tests + bench diagnostics)
STATS = {"spawned": 0, "leased": 0, "stashed": 0, "killed": 0,
         "reset_failed": 0}


def enabled() -> bool:
    return os.environ.get("GRAFT_NO_WARMPOOL", "") != "1"


#: Ray minor versions whose hash_shuffle internals this module mirrors.
#: Anything else must pass the structural probe below or we fall back to
#: stock behavior — a silent patch of drifted internals would corrupt
#: exchanges, which is strictly worse than losing the warm floor.
_PINNED_RAY = ("2.49",)


def _ray_compatible() -> bool:
    """True when it is safe to install the monkeypatch on this Ray.

    A pinned version is trusted outright. An unpinned one is accepted
    only if every internal we patch or call still has the exact shape we
    mirrored from hash_shuffle.py (method presence + signatures +
    aggregator contract); any drift -> False, and ``install()`` keeps
    stock behavior with a visible warning.
    """
    import inspect

    import ray

    def _meth_params(cls, name):
        sig = inspect.signature(getattr(cls, name))
        return tuple(p for p in sig.parameters
                     if p not in ("self", "_ray_trace_ctx"))

    ver = getattr(ray, "__version__", "")
    if any(ver == p or ver.startswith(p + ".") for p in _PINNED_RAY):
        return True
    try:
        from ray.data._internal.execution.operators import hash_shuffle as _hs
        probes = (
            # methods we REPLACE: signatures must match our replacements
            tuple(inspect.signature(_hs.AggregatorPool.start).parameters)
            == ("self",),
            tuple(inspect.signature(_hs.AggregatorPool.shutdown).parameters)
            == ("self", "force"),
            tuple(inspect.signature(
                _hs.HashShufflingOperatorBase._do_shutdown).parameters)
            == ("self", "force"),
            # internals our replacements CALL
            callable(getattr(_hs.AggregatorPool, "_check_cluster_resources",
                             None)),
            callable(getattr(_hs.AggregatorPool, "start_health_monitoring",
                             None)),
            callable(getattr(_hs.HashShufflingOperatorBase, "_is_finalized",
                             None)),
            callable(getattr(_hs.HashShufflingOperatorBase,
                             "_get_active_shuffling_tasks", None)),
            # the aggregator contract _ReusableAggregator mirrors
            # (HashShuffleAggregator is a ray.remote ActorClass: no
            # ``self``, and Ray appends ``_ray_trace_ctx``)
            _meth_params(_hs.HashShuffleAggregator, "submit")
            == ("input_seq_id", "partition_id", "partition_shard"),
            _meth_params(_hs.HashShuffleAggregator, "finalize")
            == ("partition_id",),
        )
        return all(probes)
    except Exception:
        return False


def _cpu_budget() -> float:
    """Idle-reservation ceiling for the cache. On SMALL clusters the
    budget is ZERO (stock kill-on-shutdown behavior): cached-idle actors
    hold logical CPUs that Ray Data's admission control cannot see, and
    on a 4-CPU test cluster ~1 reserved CPU plus a multi-exchange plan's
    own live pools was observed to wedge the whole node (monitor log:
    "{'CPU': 1.0}: 2+ pending tasks/actors", 0.18 CPUs available, 57
    alive aggregators). At >=16 CPUs an eighth of the cluster buys the
    graph-tier exchange reuse with a wide margin left for 1-CPU map
    tasks."""
    if _BUDGET_OVERRIDE is not None:
        return _BUDGET_OVERRIDE
    import ray
    try:
        cpus = float(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4.0
    return cpus / 8.0 if cpus >= 16 else 0.0


#: tests only: force a budget despite the small fixture cluster
_BUDGET_OVERRIDE: float | None = None


def _args_key(args: dict) -> tuple:
    return (
        float(args.get("num_cpus", 1) or 0),
        int(args.get("memory", 0) or 0),
        int(args.get("max_concurrency", 1) or 1),
        str(args.get("scheduling_strategy", "")),
    )


def _current_session() -> str | None:
    """Cluster identity for cache invalidation. Job ids are NOT enough:
    they are sequential PER CLUSTER, so after a ray.shutdown/init cycle
    the new cluster's first job is also '01000000' and stale handles
    would pass a job-id guard (observed: the in-process CLI shuts the
    shared test session down, and the next auto-init produced the same
    job id — leasing the dead actors failed at submit). The node session
    name is unique per cluster; job id is the fallback."""
    import ray
    try:
        import ray._private.worker as _w
        name = getattr(_w._global_node, "session_name", None)
        if name:
            return name
    except Exception:
        pass
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return None


def _lease(key: tuple):
    """Pop one idle actor for *key*, or None. Purges the cache if the Ray
    session changed (stale handles are dropped, not killed — the old
    cluster is gone)."""
    global _JOB_ID, _CACHED_CPUS
    job = _current_session()
    with _LOCK:
        if job != _JOB_ID:
            _CACHE.clear()
            _CACHED_CPUS = 0.0
            _JOB_ID = job
        pool = _CACHE.get(key)
        if pool:
            actor = pool.pop()
            _CACHED_CPUS -= key[0]
            STATS["leased"] += 1
            return actor
    return None


def _stash(key: tuple, actors: list) -> None:
    """Return *actors* to the cache, killing overflow beyond the CPU /
    count budgets (stock-Ray behavior for the overflow)."""
    global _CACHED_CPUS
    import ray
    job = _current_session()
    with _LOCK:
        if job != _JOB_ID:
            return  # session changed under us; handles already stale
        n_cached = sum(len(v) for v in _CACHE.values())
        budget = _cpu_budget()
        for actor in actors:
            if n_cached < _MAX_CACHED and _CACHED_CPUS + key[0] <= budget:
                _CACHE.setdefault(key, []).append(actor)
                _CACHED_CPUS += key[0]
                n_cached += 1
                STATS["stashed"] += 1
            else:
                try:
                    ray.kill(actor)
                except Exception:
                    pass
                STATS["killed"] += 1


def drain() -> int:
    """Kill every cached actor (tests / explicit cleanup). Returns the
    number drained."""
    global _CACHED_CPUS
    import ray
    n = 0
    with _LOCK:
        for pool in _CACHE.values():
            for actor in pool:
                try:
                    ray.kill(actor)
                except Exception:
                    pass
                n += 1
        _CACHE.clear()
        _CACHED_CPUS = 0.0
    return n


class _ReusableAggregator:
    """Drop-in for Ray's ``HashShuffleAggregator``
    (hash_shuffle.py:1370-1409 on this Ray 2.49) with a ``reset()`` that
    re-arms the actor for the next exchange. ``submit``/``finalize``
    mirror the stock contract exactly (threaded actor => every touch of
    ``_agg`` is under the lock)."""

    def __init__(self, aggregator_id, target_partition_ids, agg_factory):
        self._lock = threading.Lock()
        self._agg = agg_factory(aggregator_id, target_partition_ids)

    def reset(self, aggregator_id, target_partition_ids, agg_factory):
        with self._lock:
            self._agg = agg_factory(aggregator_id, target_partition_ids)
        return True

    def submit(self, input_seq_id, partition_id, partition_shard):
        with self._lock:
            self._agg.accept(input_seq_id, partition_id, partition_shard)

    def finalize(self, partition_id):
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema
        with self._lock:
            exec_stats_builder = BlockExecStats.builder()
            block = self._agg.finalize(partition_id)
            exec_stats = exec_stats_builder.build()
            self._agg.clear(partition_id)
        yield block
        yield BlockMetadataWithSchema.from_block(block, stats=exec_stats)


_REMOTE_CLS = None


def _remote_cls():
    global _REMOTE_CLS
    if _REMOTE_CLS is None:
        import ray
        _REMOTE_CLS = ray.remote(_ReusableAggregator)
    return _REMOTE_CLS


def _patched_pool_start(self):
    """AggregatorPool.start with cache leasing (stock: hash_shuffle.py
    :1166-1182). Resets are synchronous so no submit can race them."""
    import ray
    self._check_cluster_resources()
    args = dict(self._aggregator_ray_remote_args)
    key = _args_key(args)
    cls = _remote_cls()
    pending = []  # (slot, aggregator_id, target_ids, reset_ref)
    for aggregator_id in range(self._num_aggregators):
        target_ids = self._aggregator_partition_map[aggregator_id]
        assert len(target_ids) > 0
        actor = _lease(key)
        if actor is not None:
            try:
                # .remote() itself raises on a dead / prior-cluster handle
                pending.append((aggregator_id, target_ids,
                                actor.reset.remote(
                                    aggregator_id, target_ids,
                                    self._aggregation_factory_ref)))
            except Exception:
                # a synchronously-failing reset may still leave an ALIVE
                # actor holding its logical CPU/memory reservation —
                # kill it (best-effort; dead handles just no-op)
                STATS["reset_failed"] += 1
                try:
                    ray.kill(actor)
                except Exception:
                    pass
                actor = None
        if actor is None:
            actor = cls.options(**args).remote(
                aggregator_id, target_ids, self._aggregation_factory_ref)
            STATS["spawned"] += 1
        self._aggregators.append(actor)
    for slot, target_ids, ref in pending:
        try:
            ray.get(ref, timeout=60)
        except Exception:
            STATS["reset_failed"] += 1
            try:
                ray.kill(self._aggregators[slot])
            except Exception:
                pass
            self._aggregators[slot] = cls.options(**args).remote(
                slot, target_ids, self._aggregation_factory_ref)
            STATS["spawned"] += 1
    self._graft_args_key = key
    self.start_health_monitoring()


def _patched_pool_shutdown(self, force: bool):
    """AggregatorPool.shutdown with a stash path (stock: hash_shuffle.py
    :1307-1315). ``force=False`` + a recorded clean flag => actors return
    to the cache; any other path kills them like stock Ray (note stock
    only kills on force — but its ONLY caller always passes force=True,
    so killing here preserves observed stock behavior)."""
    import ray
    if not force and getattr(self, "_graft_clean", False):
        _stash(getattr(self, "_graft_args_key", _args_key(
            self._aggregator_ray_remote_args)), list(self._aggregators))
    else:
        for actor in self._aggregators:
            try:
                ray.kill(actor)
            except Exception:
                pass
            STATS["killed"] += 1
    self._aggregators.clear()


def _patched_do_shutdown(self, force: bool = False) -> None:
    """HashShufflingOperatorBase._do_shutdown (stock: hash_shuffle.py
    :841-848) deciding clean-vs-dirty: only a fully-finalized exchange
    with zero active shuffle/finalize tasks may donate its actors —
    an aborted one can still have in-flight submits that would pollute
    the next lease."""
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    pool = self._aggregator_pool
    clean = (enabled()
             and self._is_finalized()
             and not self._get_active_shuffling_tasks()
             and not self._finalizing_tasks)
    pool._graft_clean = clean
    pool.shutdown(force=not clean)
    # NOTE: mirrors the stock tail — release actors BEFORE cancelling
    # pending tasks in the base implementation.
    _hs.PhysicalOperator._do_shutdown(self, force)
    self._shuffling_tasks.clear()
    self._finalizing_tasks.clear()


def install() -> None:
    """Monkeypatch Ray's hash-shuffle aggregator lifecycle for actor
    reuse. Idempotent; no-op under ``GRAFT_NO_WARMPOOL=1``."""
    global _INSTALLED
    if _INSTALLED or not enabled():
        return
    if not _ray_compatible():
        import ray
        logger.warning(
            "warmpool: Ray %s does not match the pinned hash_shuffle "
            "internals (%s.x) and failed the structural probe — keeping "
            "stock aggregator lifecycle (exchanges pay the cold-spawn "
            "floor). Set GRAFT_NO_WARMPOOL=1 to silence.",
            getattr(ray, "__version__", "?"), "/".join(_PINNED_RAY))
        _INSTALLED = True  # don't re-probe/re-warn on every exchange
        return
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    _hs.AggregatorPool.start = _patched_pool_start
    _hs.AggregatorPool.shutdown = _patched_pool_shutdown
    _hs.HashShufflingOperatorBase._do_shutdown = _patched_do_shutdown
    _INSTALLED = True
    logger.debug("warmpool installed: hash-shuffle aggregators are reused")
