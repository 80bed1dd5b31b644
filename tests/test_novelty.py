"""Per-doc n-gram novelty (stages/novelty.gram_novelty)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.functions.sketch import md5_hash64, word_ngrams
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.novelty import gram_novelty


def _run(docs, k=2, parts=2, **kw):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs])})
    with partition_hint(parts):
        out = gram_novelty(rd.from_arrow(t), k=k, **kw).to_pandas()
    return {r.doc_id: (r.n_grams, r.n_novel) for r in out.itertuples()}


def _brute(docs, k=2):
    grams = {d: {md5_hash64(g) >> 3 for g in word_ngrams(t, k)}
             for d, t in docs.items()}
    first = {}
    for d in sorted(grams):
        for g in grams[d]:
            first.setdefault(g, d)
    return {d: (len(gs), sum(first[g] == d for g in gs))
            for d, gs in grams.items() if gs}


def test_matches_brute_force():
    docs = {1: "a b c d e", 2: "c d e f g", 3: "a b c d e",
            4: "x y", 5: "", 6: "a b q c d"}
    got = _run(docs)
    assert got == _brute(docs)
    # doc 3 is a verbatim copy of doc 1: zero novel grams
    assert got[3] == (4, 0)
    # doc 1 is first: everything novel
    assert got[1] == (4, 4)
    # empty doc emits nothing
    assert 5 not in got


def test_first_occurrence_goes_to_min_doc_id():
    docs = {10: "p q r", 7: "p q r", 9: "p q r"}
    got = _run(docs)
    assert got[7] == (2, 2) and got[9] == (2, 0) and got[10] == (2, 0)


def test_short_text_single_gram():
    # fewer tokens than k -> the whole text is one gram
    docs = {1: "solo", 2: "solo", 3: "other"}
    got = _run(docs, k=3)
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 1)}


def test_partition_invariance_and_validation():
    docs = {i: f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 5} tail{i % 3}"
            for i in range(30)}
    assert _run(docs, parts=1) == _run(docs, parts=5)
    with pytest.raises(ValueError):
        _run(docs, k=0)
