"""Pointer-doubling canonical resolution (stages/canonical.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.canonical import resolve_canonical
from pypdfium2_ray.stages.exchange import partition_hint


def _edges(pairs):
    return pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                     "dst": pa.array([b for _, b in pairs], pa.int64())})


def _run(pairs, rounds=4, parts=2):
    with partition_hint(parts):
        out = resolve_canonical(rd.from_arrow(_edges(pairs)),
                                rounds=rounds).to_pandas()
    return {int(r.src): (int(r.canon), bool(r.is_root))
            for r in out.itertuples()}


def test_chain_resolves_to_root():
    # 5 -> 4 -> 3 -> 2 -> 1 -> 1 (root)
    got = _run([(i, i - 1) for i in range(2, 6)] + [(1, 1)])
    assert got == {5: (1, True), 4: (1, True), 3: (1, True),
                   2: (1, True), 1: (1, True)}


def test_rounds_bound_chains_of_2_pow_r():
    chain = [(i, i - 1) for i in range(1, 9)] + [(0, 0)]  # length 8
    got = _run(chain, rounds=3)                           # f^8: enough
    assert all(c == 0 and r for c, r in got.values())
    partial = _run(chain, rounds=2)                       # f^4: node 8 stops at 4
    assert partial[8] == (4, False)
    assert partial[4] == (0, True)


def test_two_cycle_deterministic_non_root():
    got = _run([(10, 11), (11, 10), (1, 1)], rounds=3)
    # f^8 on a 2-cycle is the identity (even power), is_root false
    assert got[10] == (10, False)
    assert got[11] == (11, False)
    assert got[1] == (1, True)


def test_identity_completion_for_external_targets():
    # 7 -> 99 where 99 has no out-edge: completed as a root
    got = _run([(7, 99)])
    assert got[7] == (99, True)
    assert got[99] == (99, True)


def test_partition_invariance():
    pairs = ([(i, i - 1) for i in range(1, 40) if i % 7] +
             [(i, i) for i in range(0, 40, 7)])

    def run(parts, blocks):
        ds = rd.from_arrow(_edges(pairs)).repartition(blocks)
        with partition_hint(parts):
            out = resolve_canonical(ds, rounds=4).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(3, 5)


def test_rounds_validation():
    with pytest.raises(ValueError):
        resolve_canonical(rd.from_arrow(_edges([(1, 1)])), rounds=-1)
