"""BM25 top-k (stages/bm25): fixed-point replica exactness, ranking
sanity, tie-breaks and partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.bm25 import bm25_topk

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana"),
    (2, "apple cherry cherry cherry date"),
    (3, "date elderberry fig"),
    (4, "apple apple apple apple apple apple apple apple"),
    (5, ""),
    (6, "cherry"),
]


def _ref_bm25(docs, terms, k, k1=1200, b=750):
    n = len(docs)
    dls = {d: len([w for w in t.split(" ") if w]) for d, t in docs}
    total = sum(dls.values())
    avgdl_milli = total * 1000 // n
    tf = {}
    for d, t in docs:
        for w in t.split(" "):
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {w: len([1 for (d2, w2) in tf if w2 == w]) for w in terms}
    scores = {}
    for (d, w), f in tf.items():
        idf = int(np.floor(np.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
                           * 1e6))
        dlr = dls[d] * 1_000_000 // avgdl_milli
        inner = (1000 - b) + b * dlr // 1000
        denom = f * 1000 + k1 * inner // 1000
        tfc = f * (k1 + 1000) * 1000 // denom
        scores[d] = scores.get(d, 0) + idf * tfc // 1000
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def _run(docs, terms, k, n_parts=2):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs])})).repartition(n_parts)
    out = bm25_topk(ds, terms, k=k).to_pandas()
    return list(zip(out["doc_id"].tolist(), out["score_micro"].tolist()))


def test_bm25_matches_replica(ray_session):
    got = _run(DOCS, ["apple", "cherry"], k=5)
    assert got == _ref_bm25(DOCS, {"apple", "cherry"}, 5)


def test_bm25_rare_term_outranks(ray_session):
    # "fig" appears in one doc only -> that doc tops a fig query
    got = _run(DOCS, ["fig"], k=3)
    assert got[0][0] == 3 and len(got) == 1


def test_bm25_partition_invariant(ray_session):
    a = _run(DOCS, ["apple", "banana", "cherry"], k=7, n_parts=1)
    b = _run(DOCS, ["apple", "banana", "cherry"], k=7, n_parts=5)
    assert a == b


def test_bm25_empty_corpus_raises(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    with pytest.raises(ValueError):
        bm25_topk(ds, ["x"], k=3)
