"""Corpus-level dedup stages: exact (url), MinHash+LSH, SimHash — with
planted near-duplicates so candidate generation + verification are checked
end-to-end through the Ray pipelines."""

import pandas as pd
import pyarrow as pa
import pytest

BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest where nobody ever goes at night " * 3)
NEAR = BASE.replace("lazy dog", "lazy cat")           # high-jaccard near-dup
FAR = ("completely different content about ray data pipelines and arrow "
       "batches flowing through actor pools with backpressure " * 3)


@pytest.fixture(scope="module")
def corpus():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [BASE, NEAR, FAR, BASE, "tiny"],
    })


def test_minhash_dup_pairs(ray_session, corpus):
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = rd.from_arrow(corpus)
    out = minhash_dup_pairs(ds, threshold=0.6).to_pandas()
    pairs = {(a, b): i / u for a, b, i, u in
             zip(out["id_a"], out["id_b"], out["n_inter"], out["n_union"])}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0        # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.6        # near dup
    assert (2, 4) in pairs
    assert all(a < b for (a, b) in pairs)                  # canonical order
    assert not any(3 in p or 5 in p for p in pairs)        # no false pairs


def test_minhash_determinism_across_batch_sizes(ray_session, corpus):
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs

    def run(parallelism):
        ds = rd.from_arrow(corpus).repartition(parallelism)
        df = minhash_dup_pairs(ds, threshold=0.6).to_pandas()
        return sorted(map(tuple, df[["id_a", "id_b"]].to_numpy()))

    assert run(1) == run(4)


def test_simhash_dup_pairs(ray_session, corpus):
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import simhash_dup_pairs
    ds = rd.from_arrow(corpus)
    out = simhash_dup_pairs(ds, max_dist=6).to_pandas()
    pairs = {(a, b): h for a, b, h in
             zip(out["id_a"], out["id_b"], out["hamming"])}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0          # identical text
    assert not any((3 in p and 1 in p) for p in pairs)     # FAR not near BASE


def test_dedup_by_url_keeps_latest(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import dedup_by_url
    t = pa.table({
        "url": ["a", "a", "b"],
        "warc_ts": pa.array([1000, 2000, 500], pa.timestamp("us")),
        "payload": ["old", "new", "only"],
    })
    out = dedup_by_url(rd.from_arrow(t), keep="latest").to_pandas()
    got = dict(zip(out["url"], out["payload"]))
    assert got == {"a": "new", "b": "only"}
    out2 = dedup_by_url(rd.from_arrow(t), keep="earliest").to_pandas()
    assert dict(zip(out2["url"], out2["payload"])) == {"a": "old", "b": "only"}


def test_dedup_by_url_pre_combine_equivalence(ray_session):
    """Partial per-block dedup must not change the result (associativity),
    regardless of how snapshots are spread across blocks."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import dedup_by_url
    rng = np.random.RandomState(5)
    n = 400
    urls = [f"u{rng.randint(0, 50)}" for _ in range(n)]
    ts = rng.permutation(n).astype("datetime64[us]")
    t = pa.table({"url": urls,
                  "warc_ts": pa.array(ts.astype("int64"), pa.timestamp("us")),
                  "v": list(range(n))})
    expected = (t.to_pandas().sort_values("warc_ts")
                 .drop_duplicates("url", keep="last")
                 .sort_values("url").reset_index(drop=True))
    for parts in (1, 7):
        for pre in (True, False):
            got = dedup_by_url(rd.from_arrow(t).repartition(parts),
                               pre_combine=pre).to_pandas() \
                .sort_values("url").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["url", "warc_ts", "v"]], expected[["url", "warc_ts", "v"]])


def test_duplicate_ids_produce_no_self_pairs(ray_session):
    """A corpus carrying the same doc_id twice must not emit (id, id)
    degenerate pairs from the bucket kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.dedup import simhash_dup_pairs
    t = pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": [BASE, BASE, BASE],
    })
    out = simhash_dup_pairs(rd.from_arrow(t), max_dist=6).to_pandas()
    # identical texts: exactly the (1, 2) pair — and NOT (1, 1)
    assert sorted(map(tuple, out[["id_a", "id_b"]].to_numpy())) == [(1, 2)]
    assert (out["hamming"] == 0).all()


def test_prefix_dup_owner(ray_session):
    import ray.data as rd

    from pypdfium2_ray.stages.dedup import prefix_dup_owner
    from pypdfium2_ray.stages.exchange import partition_hint
    texts = {10: "aaaa bbbb cccc", 3: "aaaa bbbb cccc TAIL DIFFERS",
             7: "aaaa bbbb cccc other tail", 5: "unique doc",
             2: "another unique", 9: "aaaa bbbb cccc"}
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()))})
    for parts in (1, 4):
        with partition_hint(3):
            out = prefix_dup_owner(rd.from_arrow(t).repartition(parts),
                                   prefix_len=14).to_pandas()
        got = dict(zip(out.doc_id, out.dup_of))
        # prefix-14 cluster {10,3,7,9} -> owner 3; singletons -> -1
        assert got == {10: 3, 3: 3, 7: 3, 9: 3, 5: -1, 2: -1}
