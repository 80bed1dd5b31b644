"""Deterministic shuffle export (stages/shuffle.py)."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pypdfium2_ray.functions.sketch import md5_hash64
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.shuffle import deterministic_shuffle, write_shuffled


def _table(n=60):
    return pa.table({"doc_id": list(range(n)),
                     "payload": [f"p{i}" for i in range(n)]})


def test_shuffle_matches_direct_hash_order(ray_session):
    t = _table()
    with partition_hint(2):
        out = deterministic_shuffle(rd.from_arrow(t), n_shards=4) \
            .to_pandas()
    assert len(out) == 60
    for s, grp in out.groupby("shard"):
        ids = [i for i in range(60) if md5_hash64(str(i).encode()) % 4 == s]
        exp = sorted(ids, key=lambda i: (md5_hash64(str(i).encode()) >> 1,
                                         i))
        got = grp.sort_values("pos")
        assert list(got.doc_id) == exp
        assert list(got.pos) == list(range(len(exp)))
        # payload rides along
        assert list(got.payload) == [f"p{i}" for i in exp]


def test_shuffle_partition_invariant(ray_session):
    t = _table()

    def run(parts, hint):
        with partition_hint(hint):
            return deterministic_shuffle(
                rd.from_arrow(t).repartition(parts), n_shards=4) \
                .to_pandas().sort_values(["shard", "pos"]) \
                .reset_index(drop=True)

    a = run(2, 2)
    b = run(7, 3)
    assert a.equals(b)


def test_write_shuffled_hive_layout(ray_session, tmp_path):
    out_dir = str(tmp_path / "shuf")
    with partition_hint(2):
        write_shuffled(rd.from_arrow(_table(40)), out_dir, n_shards=4)
    t = pq.read_table(out_dir)
    assert t.num_rows == 40
    assert sorted(t.column("shard").unique().to_pylist()) == \
        sorted({md5_hash64(str(i).encode()) % 4 for i in range(40)})


def _brute_ring(ids, n_buckets, k):
    exp = set()
    for b in range(n_buckets):
        ring = sorted(
            (i for i in ids if md5_hash64(str(i).encode()) % n_buckets == b),
            key=lambda i: (md5_hash64(str(i).encode()) >> 1, i))
        c = len(ring)
        for p, a in enumerate(ring):
            for j in range(1, k + 1):
                if j < c:
                    exp.add((a, ring[(p + j) % c]))
    return exp


def test_ring_negative_pairs(ray_session):
    from pypdfium2_ray.stages.shuffle import ring_negative_pairs
    t = _table()
    for parts, hint in ((1, 2), (7, 3)):
        with partition_hint(hint):
            out = ring_negative_pairs(rd.from_arrow(t).repartition(parts),
                                      n_buckets=4, k=2).to_pandas()
        got = set(zip(out.anchor, out.negative))
        assert got == _brute_ring(range(60), 4, 2)
        assert len(got) == len(out)            # no duplicate pairs
        assert (out.anchor != out.negative).all()


def test_ring_negative_pairs_singleton_and_tiny_buckets(ray_session):
    from pypdfium2_ray.stages.shuffle import ring_negative_pairs
    # 2 rows, many buckets: most buckets singleton (emit nothing), a
    # 2-bucket emits only j=1 in each direction
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64())})
    with partition_hint(2):
        out = ring_negative_pairs(rd.from_arrow(t), n_buckets=1,
                                  k=3).to_pandas()
    got = set(zip(out.anchor, out.negative))
    assert got == {(0, 1), (1, 0)} and len(out) == 2
