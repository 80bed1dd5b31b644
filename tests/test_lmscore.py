"""Unigram LM scoring (stages/lmscore): fixed-point replica exactness,
OOV smoothing, empty docs, vocabulary tie-breaks."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.lmscore import lm_score, unigram_vocab

DOCS = [(0, "a a a b b c"), (1, "a rare"), (2, ""), (3, "b c c zz zz zz")]


def _ds(docs, parts=2):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs])})).repartition(parts)


def _ref(docs, vocab_size):
    toks = {d: [w for w in t.split(" ") if w] for d, t in docs}
    total = sum(len(v) for v in toks.values())
    counts: dict[str, int] = {}
    for v in toks.values():
        for w in v:
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:vocab_size]
    lp = {w: int(np.floor(np.log(c / total) * 1e6)) for w, c in vocab}
    oov = int(np.floor(np.log(0.5 / total) * 1e6))
    return {d: (len(v), sum(lp.get(w, oov) for w in v))
            for d, v in toks.items()}


def test_lm_score_matches_replica_with_oov(ray_session):
    # counts: a4 b3 c3 zz3 rare1; vocab_size 3 -> {a, b, c} (ties broken
    # by term asc, so zz loses); zz and rare score via the OOV path
    out = lm_score(_ds(DOCS), vocab_size=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _ref(DOCS, 3)
    for _, r in out.iterrows():
        assert (r["n_tokens"], r["logp_micro"]) == ref[r["doc_id"]]
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "logp_micro"] == 0


def test_unigram_vocab_tiebreak(ray_session):
    v = unigram_vocab(_ds(DOCS), 3).to_pandas()
    assert v["term"].tolist() == ["a", "b", "c"]   # b,c beat zz: ties asc
    assert v["c"].tolist() == [4, 3, 3]


def test_lm_score_partition_invariant(ray_session):
    a = lm_score(_ds(DOCS, parts=1), vocab_size=4).to_pandas() \
        .sort_values("doc_id")["logp_micro"].tolist()
    b = lm_score(_ds(DOCS, parts=4), vocab_size=4).to_pandas() \
        .sort_values("doc_id")["logp_micro"].tolist()
    assert a == b


def test_lm_score_empty_corpus_raises(ray_session):
    with pytest.raises(ValueError):
        lm_score(_ds([(0, "")]), vocab_size=3)
