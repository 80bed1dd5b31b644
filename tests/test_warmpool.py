"""Warm aggregator reuse: second exchange leases the first's actors.

The graph tier stacks 7+ hash exchanges per query; stock Ray 2.49 kills
the aggregator pool after every one (hash_shuffle._do_shutdown ->
shutdown(force=True)), so each exchange re-pays actor spawn. warmpool
leases them from a session cache instead — these tests pin the lease
path, the correctness of reused actors, and the cache bounds.

The cache budget is ZERO on clusters under 16 CPUs (cached-idle actors
hold logical CPUs Ray Data's admission control cannot see — observed to
wedge the 4-CPU fixture), so these tests force a small budget through
``warmpool._BUDGET_OVERRIDE`` and drain afterwards."""

import numpy as np
import pandas as pd
import pytest

from pypdfium2_ray.stages import warmpool
from pypdfium2_ray.stages.exchange import partition_hint, partition_map


@pytest.fixture()
def warm_budget():
    """Force a 1-CPU cache budget for the duration of one test."""
    warmpool.drain()
    warmpool._BUDGET_OVERRIDE = 1.0
    yield
    warmpool._BUDGET_OVERRIDE = None
    warmpool.drain()


def _table(seed, n=400, keys=23):
    rng = np.random.RandomState(seed)
    return pa.table({
        "k": pa.array(rng.randint(0, keys, size=n), pa.int64()),
        "v": pa.array(rng.randint(0, 1000, size=n), pa.int64()),
    })


import pyarrow as pa  # noqa: E402


def _run_groupmax(t: pa.Table) -> pd.DataFrame:
    import ray.data as rd

    def kernel(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"], use_threads=False).aggregate([("v", "max")])
        return g.rename_columns(["k", "v_max"])

    with partition_hint(4):
        out = partition_map(rd.from_arrow(t), ["k"], kernel)
    return (out.to_pandas().sort_values("k").reset_index(drop=True))


def _expected(t: pa.Table) -> pd.DataFrame:
    return (t.to_pandas().groupby("k")["v"].max().reset_index()
            .rename(columns={"v": "v_max"})
            .sort_values("k").reset_index(drop=True))


def test_second_exchange_leases_warm_actors(ray_session, warm_budget):
    """Back-to-back exchanges with identical remote args: the second
    leases the first's actors (zero fresh spawns) and both are correct."""
    base = dict(warmpool.STATS)
    t1, t2 = _table(3), _table(5)

    out1 = _run_groupmax(t1)
    spawned_cold = warmpool.STATS["spawned"] - base["spawned"]
    assert spawned_cold > 0, "first exchange must spawn actors"
    stashed = warmpool.STATS["stashed"] - base["stashed"]
    assert stashed > 0, "clean completion stashes actors under the budget"

    mid = dict(warmpool.STATS)
    out2 = _run_groupmax(t2)
    assert warmpool.STATS["leased"] - mid["leased"] > 0
    assert warmpool.STATS["spawned"] - mid["spawned"] <= \
        max(0, spawned_cold - stashed), "warm exchange re-spawns at most " \
        "the uncached remainder"
    assert warmpool.STATS["reset_failed"] == mid["reset_failed"]

    pd.testing.assert_frame_equal(out1, _expected(t1), check_dtype=False)
    pd.testing.assert_frame_equal(out2, _expected(t2), check_dtype=False)


def test_reused_actor_state_is_isolated(ray_session, warm_budget):
    """A leased actor must not leak the previous exchange's rows: run the
    SAME kernel over disjoint key ranges and check exact counts."""
    import ray.data as rd
    a = pa.table({"k": pa.array([1] * 50, pa.int64()),
                  "v": pa.array(range(50), pa.int64())})
    b = pa.table({"k": pa.array([2] * 70, pa.int64()),
                  "v": pa.array(range(70), pa.int64())})

    def count_kernel(t: pa.Table) -> pa.Table:
        g = t.group_by(["k"], use_threads=False).aggregate([("v", "count")])
        return g.rename_columns(["k", "n"])

    with partition_hint(4):
        ra = partition_map(rd.from_arrow(a), ["k"], count_kernel).to_pandas()
    with partition_hint(4):
        rb = partition_map(rd.from_arrow(b), ["k"], count_kernel).to_pandas()
    assert ra.set_index("k")["n"].to_dict() == {1: 50}
    assert rb.set_index("k")["n"].to_dict() == {2: 70}, \
        "reused actor leaked prior-exchange state"


def test_small_cluster_budget_is_zero(ray_session):
    """On the 4-CPU fixture the budget is 0: nothing is cached, stock
    kill-on-shutdown behavior (the anti-wedge rail)."""
    warmpool.drain()
    assert warmpool._cpu_budget() == 0.0
    base = dict(warmpool.STATS)
    _run_groupmax(_table(9))
    assert warmpool.STATS["stashed"] == base["stashed"]
    assert not warmpool._CACHE
    assert warmpool._CACHED_CPUS == 0.0


def test_cache_cpu_budget_bounded(ray_session, warm_budget):
    """Idle cached reservation stays within the forced 1-CPU budget."""
    _run_groupmax(_table(9))
    assert warmpool._CACHED_CPUS <= 1.0 + 1e-9


def test_drain_empties_cache(ray_session, warm_budget):
    _run_groupmax(_table(11))
    assert warmpool.drain() >= 0
    assert warmpool._CACHED_CPUS == 0.0
    assert not warmpool._CACHE
    # and the engine still works after a drain
    out = _run_groupmax(_table(13))
    pd.testing.assert_frame_equal(out, _expected(_table(13)),
                                  check_dtype=False)


def test_version_gate_pinned_ray_is_compatible():
    """The sandbox Ray is the pinned 2.49 -> compatible outright."""
    import ray
    assert ray.__version__.startswith("2.49")
    assert warmpool._ray_compatible()


def test_version_gate_structural_probe_passes_on_pinned(monkeypatch):
    """Force the version past the pin: the structural probe must still
    accept THIS Ray (the internals are exactly the mirrored ones), so an
    upgrade that keeps the hash_shuffle shape keeps the warm floor."""
    monkeypatch.setattr(warmpool, "_PINNED_RAY", ("0.0",))
    assert warmpool._ray_compatible()


def test_version_gate_falls_back_to_stock_on_drift(monkeypatch, caplog):
    """Simulated drift (unpinned version + a patched-method signature
    change): install() must keep stock behavior and warn, not patch."""
    import logging

    from ray.data._internal.execution.operators import hash_shuffle as _hs

    monkeypatch.setattr(warmpool, "_PINNED_RAY", ("0.0",))
    # drift the signature of a method we replace
    monkeypatch.setattr(_hs.AggregatorPool, "start",
                        lambda self, extra_arg: None)
    assert not warmpool._ray_compatible()

    monkeypatch.setattr(warmpool, "_INSTALLED", False)
    before = (_hs.AggregatorPool.shutdown,
              _hs.HashShufflingOperatorBase._do_shutdown)
    with caplog.at_level(logging.WARNING, logger=warmpool.logger.name):
        warmpool.install()
    assert (_hs.AggregatorPool.shutdown,
            _hs.HashShufflingOperatorBase._do_shutdown) == before, \
        "install() patched stock methods despite incompatible Ray"
    assert any("stock aggregator lifecycle" in r.message for r in
               caplog.records)
    # flag is latched so the warning fires once, not per exchange
    assert warmpool._INSTALLED
