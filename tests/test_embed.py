"""Feature-hashing embeddings (stages/embed): determinism across block
layouts, long/wide agreement, integer cosine threshold exactness
(boundary inclusive), overflow guard, zero-vector handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.embed import (
    hash_embed, hash_embed_long, int_cosine_dup_pairs)

DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
    "text": ["the cat sat on the mat",
             "the cat sat on the mat today",   # near-dup of 1
             "completely different words entirely unrelated",
             ""],                              # empty -> zero vector
})


def _wide(ds_blocks=1):
    ds = rd.from_arrow(DOCS)
    if ds_blocks > 1:
        ds = ds.repartition(ds_blocks)
    out = hash_embed(ds, dim=64).to_pandas().sort_values("doc_id")
    return {int(r.doc_id): np.array(r.embedding) for r in out.itertuples()}


def test_hash_embed_layout_invariant(ray_session):
    a, b = _wide(1), _wide(4)
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k] == b[k]).all()
    assert (a[4] == 0).all()                     # empty text -> zero vector
    # signed counts: the repeated "the" contributes magnitude 2 somewhere
    assert np.abs(a[1]).sum() == 6               # 6 tokens, all counted


def test_hash_embed_long_matches_wide(ray_session):
    wide = _wide()
    long = hash_embed_long(rd.from_arrow(DOCS), dim=64).to_pandas()
    assert (long["val"] != 0).all()
    for k, vec in wide.items():
        sub = long[long["doc_id"] == k]
        got = np.zeros(64, np.int64)
        got[sub["bucket"].to_numpy()] = sub["val"].to_numpy()
        assert (got == vec).all()


def _emb_ds(vecs):
    ids = pa.array(sorted(vecs), pa.int64())
    flat = pa.array(np.concatenate([np.asarray(vecs[k], np.int64)
                                    for k in sorted(vecs)]), pa.int64())
    t = pa.table({"doc_id": ids,
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      flat, len(next(iter(vecs.values()))))})
    return rd.from_arrow(t), t


def test_int_cosine_boundary_inclusive(ray_session):
    """cos(a,b) == tau exactly must be KEPT (>= semantics, exact integer
    cross-multiply — a float comparison could go either way here)."""
    vecs = {1: [1, 0], 2: [4, 3], 3: [0, 5]}     # cos(1,2) = 4/5 exactly
    ds, tbl = _emb_ds(vecs)
    out = int_cosine_dup_pairs(ds, tbl, 4, 5).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(map(tuple, out[["id_a", "id_b"]].to_numpy())) == [(1, 2)]
    assert out.loc[0, ["dot", "na2", "nb2"]].tolist() == [4, 1, 25]
    # one ulp tighter threshold excludes it
    out2 = int_cosine_dup_pairs(ds, tbl, 81, 100).to_pandas()
    assert len(out2) == 0


def test_int_cosine_zero_vectors_never_pair(ray_session):
    vecs = {1: [0, 0], 2: [0, 0], 3: [1, 1]}
    ds, tbl = _emb_ds(vecs)
    assert int_cosine_dup_pairs(ds, tbl, 1, 2).to_pandas().empty


def test_int_cosine_overflow_guard(ray_session):
    big = int(np.sqrt((1 << 62) // 25)) + 10
    vecs = {1: [big, 0], 2: [0, 1]}
    ds, tbl = _emb_ds(vecs)
    with pytest.raises(ValueError, match="overflow guard"):
        int_cosine_dup_pairs(ds, tbl, 4, 5)


def test_near_dup_pair_found_from_text(ray_session):
    ds = rd.from_arrow(DOCS)
    emb = hash_embed(ds, dim=64).materialize()
    corpus = emb.take_batch(10, batch_format="pyarrow")
    out = int_cosine_dup_pairs(emb, corpus, 4, 5).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in pairs                       # the planted near-dup
    assert not any(3 in p or 4 in p for p in pairs)
