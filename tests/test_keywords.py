"""Per-doc tf/df keyword extraction (stages/keywords.doc_keywords)."""

import collections
import re

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.keywords import doc_keywords


def _run(docs, k=2, parts=2):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs])})
    with partition_hint(parts):
        out = doc_keywords(rd.from_arrow(t), k=k).to_pandas()
    return sorted(map(tuple, out.itertuples(index=False)))


def _brute(docs, k=2):
    tf = {d: collections.Counter(re.findall(r"[^ \t\r\n\f\v]+", t))
          for d, t in docs.items()}
    df = collections.Counter(w for c in tf.values() for w in c)
    out = []
    for d, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1] / df[kv[0]],
                                                   kv[0]))[:k]
        out.extend((d, w, n, df[w]) for w, n in ranked)
    return sorted(out)


DOCS = {1: "apple apple banana common common common",
        2: "banana cherry common common",
        3: "cherry cherry cherry apple common",
        4: ""}


def test_matches_brute_force():
    assert _run(DOCS) == _brute(DOCS)


def test_rare_term_beats_frequent_common_term():
    # doc 1: apple tf=2 df=2 -> 1.0; common tf=3 df=3 -> 1.0; banana
    # tf=1 df=2 -> 0.5. tie 1.0 breaks lexicographically: apple, common
    got = [(w, tf, df) for d, w, tf, df in _run(DOCS, k=2) if d == 1]
    assert got == [("apple", 2, 2), ("common", 3, 3)]


def test_k_larger_than_vocab_and_empty_doc():
    got = _run(DOCS, k=10)
    assert got == _brute(DOCS, k=10)
    assert not [r for r in got if r[0] == 4]  # empty doc emits nothing


def test_partition_invariance_and_validation():
    docs = {i: " ".join(f"w{(i * j) % 7}" for j in range(1, 9))
            for i in range(24)}
    assert _run(docs, parts=1) == _run(docs, parts=5)
    assert _run(docs, parts=1) == _brute(docs)
    with pytest.raises(ValueError):
        _run(DOCS, k=0)
