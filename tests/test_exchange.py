"""Exchange layer: hash partition_map, lookup_join, partition sizing.

These are the primitives every billions-of-groups finalize and
large-x-large join in the engine rides on — tested directly, not just
through the dedup pipelines."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pypdfium2_ray.stages.exchange import (
    lookup_join, partition_hint, partition_map, partitions_for_bytes)


def _table(n=500, keys=29):
    rng = np.random.RandomState(7)
    return pa.table({
        "k": pa.array(rng.randint(0, keys, size=n), pa.int64()),
        "v": pa.array(rng.randint(0, 1000, size=n), pa.int64()),
    })


def test_partition_map_keys_complete_and_vectorized(ray_session):
    """Every key's rows arrive complete in exactly one kernel call."""
    import ray.data as rd
    t = _table()
    seen_per_call = []

    def kernel(b: pa.Table) -> pa.Table:
        # per-partition max per key — only correct if keys are complete
        g = b.group_by(["k"], use_threads=False).aggregate([("v", "max")])
        seen_per_call.append(set(b["k"].to_pylist()))
        return g.rename_columns(["k", "v_max"])

    out = partition_map(rd.from_arrow(t).repartition(7), ["k"], kernel,
                        num_partitions=5).to_pandas()
    expected = (t.to_pandas().groupby("k")["v"].max()
                 .reset_index().rename(columns={"v": "v_max"}))
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        expected.sort_values("k").reset_index(drop=True),
        check_dtype=False)


def test_partition_map_respects_hint(ray_session):
    import ray.data as rd
    t = _table(100, keys=5)
    with partition_hint(3):
        ds = partition_map(rd.from_arrow(t), ["k"], lambda b: b)
    # 3 partitions -> at most 3 non-empty output blocks, all rows preserved
    assert ds.count() == 100


def test_lookup_join_matches_pandas_merge(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(11)
    target = pa.table({
        "id": pa.array(rng.randint(0, 60, size=300), pa.int64()),
        "x": pa.array(rng.randint(0, 9, size=300), pa.int64()),
    })
    # unique-key source with a payload, some ids absent -> inner semantics
    src_ids = np.arange(0, 50, dtype=np.int64)
    source = pa.table({
        "sid": pa.array(src_ids),
        "payload": pa.array([f"p{i}" for i in src_ids]),
    })
    out = lookup_join(
        rd.from_arrow(target).repartition(5),
        {"id": pa.int64(), "x": pa.int64()},
        rd.from_arrow(source), source_key="sid", key_col="id",
        payload_cols={"payload": pa.string()},
        num_partitions=4).to_pandas()
    expected = target.to_pandas().merge(
        source.to_pandas().rename(columns={"sid": "id"}), on="id")
    sort = lambda d: d.sort_values(["id", "x", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(sort(out), sort(expected), check_dtype=False)


def test_lookup_join_list_payload_and_empty_target(ray_session):
    """list<float> payloads (pyarrow Table.join rejects these) and a
    fully-empty target must both work."""
    import ray.data as rd
    source = pa.table({
        "sid": pa.array([1, 2, 3], pa.int64()),
        "vec": pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                        pa.list_(pa.float32())),
    })
    target = pa.table({"id": pa.array([2, 3, 9], pa.int64())})
    out = lookup_join(rd.from_arrow(target), {"id": pa.int64()},
                      rd.from_arrow(source), source_key="sid", key_col="id",
                      payload_cols={"vec": pa.list_(pa.float32())},
                      num_partitions=3).to_pandas()
    got = {int(r["id"]): list(r["vec"]) for _, r in out.iterrows()}
    assert got == {2: [3.0, 4.0], 3: [5.0, 6.0]}

    empty = pa.table({"id": pa.array([], pa.int64())})
    out2 = lookup_join(rd.from_arrow(empty), {"id": pa.int64()},
                       rd.from_arrow(source), source_key="sid", key_col="id",
                       payload_cols={"vec": pa.list_(pa.float32())},
                       num_partitions=3).to_pandas()
    assert len(out2) == 0


def test_lookup_join_distinct_fusion(ray_session):
    import ray.data as rd
    target = pa.table({
        "id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "b": pa.array([10, 10, 11, 20, 20], pa.int64()),
    })
    source = pa.table({"sid": pa.array([1, 2], pa.int64()),
                       "p": ["a", "b"]})
    out = lookup_join(rd.from_arrow(target).repartition(3),
                      {"id": pa.int64(), "b": pa.int64()},
                      rd.from_arrow(source), source_key="sid", key_col="id",
                      payload_cols={"p": pa.string()},
                      distinct_target_on=["id", "b"],
                      num_partitions=2).to_pandas()
    rows = sorted(map(tuple, out[["id", "b", "p"]].to_numpy()))
    assert rows == [(1, 10, "a"), (1, 11, "a"), (2, 20, "b")]


def test_partitions_for_bytes():
    assert partitions_for_bytes(0) == 2       # floor: byte-sized input,
    assert partitions_for_bytes(10 << 20) == 2  # byte-sized exchange
    assert partitions_for_bytes(640 << 20) == 10             # 64 MB each
    assert partitions_for_bytes(1 << 50) == 200              # sandbox cap
    assert partitions_for_bytes(1 << 50, cap=5000) == 5000   # raisable


def test_aggregator_cap_is_enforced(ray_session):
    """The cap must be SET on the chain context (Ray's default is 64, so a
    max() against it would be a no-op and 64 aggregator actors would spawn
    per exchange)."""
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import _enable_hash, default_aggregators
    ds = rd.from_items([{"k": 1}])
    assert ds.context.max_hash_shuffle_aggregators == 64       # Ray default
    n = _enable_hash(ds, 32)
    assert n == 32
    assert ds.context.max_hash_shuffle_aggregators == \
        min(32, default_aggregators()) < 64
    # a later stage asking for fewer partitions must not lower the cap
    _enable_hash(ds, 2)
    assert ds.context.max_hash_shuffle_aggregators == \
        min(32, default_aggregators())


def test_bloom_no_false_negatives_and_fp_rate():
    import numpy as np
    import pyarrow as pa

    from pypdfium2_ray.functions import bloom
    rng = np.random.default_rng(0)
    members = pa.array(rng.choice(10**9, 100_000, replace=False))
    bits = np.zeros(bloom.sizing(100_000) // 8, np.uint8)
    bloom.add(bits, members)
    assert bloom.contains(bits, members).all()           # never a miss
    probes = pa.array(rng.integers(2 * 10**9, 3 * 10**9, 100_000))
    fp = bloom.contains(bits, probes).mean()
    assert fp < 0.03, fp                                 # ~1% at 10 bits/key
    # string keys hash consistently too
    svals = pa.array([f"u{i}" for i in range(1000)])
    sbits = np.zeros(bloom.sizing(1000) // 8, np.uint8)
    bloom.add(sbits, svals)
    assert bloom.contains(sbits, svals).all()
    assert bloom.contains(
        sbits, pa.array([f"x{i}" for i in range(1000)])).mean() < 0.05


def test_bloom_distributed_build_matches_local(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.functions import bloom
    keys = np.arange(10_000, dtype=np.int64) * 7
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
    dist = bloom.build_from_dataset(ds, "k", keys.size,
                                    cast_type=pa.int64())
    local = np.zeros_like(dist)
    bloom.add(local, pa.array(keys))
    assert (dist == local).all()                         # OR of partials


def test_lookup_join_bloom_prefilter_tier(ray_session):
    """Above the exact-broadcast ceiling the prefilter degrades to the
    Bloom tier (loud log) — join output must be IDENTICAL to the
    unfiltered join (false positives die in the kernel)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import lookup_join
    rng = np.random.default_rng(1)
    target = pa.table({"k": pa.array(rng.choice(5000, 300, replace=False),
                                     pa.int64())})
    source = pa.table({"sk": pa.array(np.arange(5000), pa.int64()),
                       "payload": pa.array([f"p{i}" for i in range(5000)])})
    kwargs = dict(
        target_cols={"k": pa.int64()}, source=rd.from_arrow(source),
        source_key="sk", key_col="k",
        payload_cols={"payload": pa.string()}, num_partitions=4)
    plain = lookup_join(rd.from_arrow(target), **kwargs).to_pandas()
    bloomed = lookup_join(rd.from_arrow(target), **kwargs,
                          prefilter_keys=10).to_pandas()   # 300 > 10 => bloom
    a = plain.sort_values("k").reset_index(drop=True)
    b = bloomed.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 300


def test_lookup_join_left_outer(ray_session):
    """how='left' keeps unmatched target rows with null payload; matched
    rows identical to the inner result."""
    import ray.data as rd
    target = pa.table({"id": pa.array([1, 2, 3, 4, 2], pa.int64())})
    source = pa.table({"sid": pa.array([2, 4], pa.int64()),
                       "payload": ["p2", "p4"]})
    out = lookup_join(
        rd.from_arrow(target).repartition(3), {"id": pa.int64()},
        rd.from_arrow(source), source_key="sid", key_col="id",
        payload_cols={"payload": pa.string()},
        num_partitions=3, how="left").to_pandas()
    got = sorted(zip(out["id"], out["payload"].fillna("<null>")))
    assert got == [(1, "<null>"), (2, "p2"), (2, "p2"), (3, "<null>"),
                   (4, "p4")]
    with pytest.raises(ValueError):
        lookup_join(rd.from_arrow(target), {"id": pa.int64()},
                    rd.from_arrow(source), source_key="sid", key_col="id",
                    payload_cols={"payload": pa.string()}, how="full")


# ---------------------------------------------------------------------------
# big-candidate guards in lookup_join's prefilter path (round-5: the
# 10x drill's OOM/2GB-offset findings hardened into the engine)

def test_predistinct_tier_equals_fused(ray_session, monkeypatch):
    """Above _PREDISTINCT_ROWS the pair-distinct runs as its own
    exchange; results must equal the fused path row-for-row."""
    import numpy as np

    from pypdfium2_ray.stages import exchange as ex

    rng = np.random.RandomState(5)
    n_pairs, n_src = 600, 40
    pairs = pa.table({
        "id_a": pa.array(rng.randint(0, n_src, n_pairs), pa.int64()),
        "id_b": pa.array(rng.randint(0, n_src, n_pairs), pa.int64())})
    src = pa.table({
        "doc_id": pa.array(np.arange(n_src), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(n_src)])})

    def run():
        import ray.data as rd
        j = ex.lookup_join(
            rd.from_arrow(pairs), {"id_a": pa.int64(), "id_b": pa.int64()},
            rd.from_arrow(src), source_key="doc_id", key_col="id_a",
            payload_cols={"text": pa.string()},
            distinct_target_on=["id_a", "id_b"], prefilter_keys=10_000)
        return j.to_pandas().sort_values(["id_a", "id_b"]) \
                .reset_index(drop=True)

    fused = run()                                   # below the ceiling
    monkeypatch.setattr(ex, "_PREDISTINCT_ROWS", 10)
    dedicated = run()                               # dedicated tier
    assert dedicated.equals(fused)
    # distinct applied: no duplicate (id_a, id_b) rows
    assert not dedicated.duplicated(["id_a", "id_b"]).any()


def test_candidate_volume_raises_partitions(ray_session, monkeypatch):
    """The join exchange must scale with the candidate volume even when
    the ambient hint is tiny (the 2-partition OOM shape)."""
    import numpy as np

    from pypdfium2_ray.stages import exchange as ex

    seen = {}
    orig = ex.partition_map

    def spy(ds, keys, kernel, num_partitions=None, **kw):
        seen["n"] = num_partitions
        return orig(ds, keys, kernel, num_partitions=num_partitions, **kw)

    monkeypatch.setattr(ex, "partition_map", spy)
    # pretend each candidate carries a huge payload so even this small
    # table crosses a partition boundary
    monkeypatch.setattr(ex, "_EST_PAYLOAD_BYTES", 64 << 20)

    import ray.data as rd
    pairs = pa.table({"id_a": pa.array(np.arange(40), pa.int64()),
                      "id_b": pa.array(np.arange(40) + 1, pa.int64())})
    src = pa.table({"doc_id": pa.array(np.arange(50), pa.int64()),
                    "text": pa.array(["x"] * 50)})
    with ex.partition_hint(2):
        ex.lookup_join(
            rd.from_arrow(pairs), {"id_a": pa.int64(), "id_b": pa.int64()},
            rd.from_arrow(src), source_key="doc_id", key_col="id_a",
            payload_cols={"text": pa.string()},
            prefilter_keys=10_000).to_pandas()
    assert seen["n"] is not None and seen["n"] >= 40, seen
