"""Any-alignment duplicated-span detection (stages/dupspans.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.dupspans import dup_gram_census, dup_spans
from pypdfium2_ray.stages.exchange import partition_hint


def _spans(docs, window=3, min_count=2, parts=2, **kw):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs])})
    with partition_hint(parts):
        out = dup_spans(rd.from_arrow(t), window=window,
                        min_count=min_count, **kw).to_pandas()
    return sorted(zip(out["doc_id"], out["s_tok"], out["e_tok"],
                      out["n_windows"])) if len(out) else []


def test_cross_doc_any_alignment():
    # the shared run "p q r s" sits at offset 0 in doc 1 and offset 2
    # in doc 2 — the fixed-window span_dedup would miss the misaligned
    # copy; sliding grams catch it at both offsets
    docs = {1: "p q r s x1 y1 z1 w1", 2: "a2 b2 p q r s c2 d2"}
    got = _spans(docs, window=3)
    # doc1 windows 0..1 hit -> span [0,4); doc2 windows 2..3 -> [2,6)
    assert got == [(1, 0, 4, 2), (2, 2, 6, 2)]


def test_within_doc_repetition_counts():
    docs = {7: "u v w x0 x1 x2 u v w"}
    assert _spans(docs, window=3) == [(7, 0, 3, 1), (7, 6, 9, 1)]


def test_touching_islands_merge_and_gaps_split():
    # two duplicated trigrams overlapping in doc 3 merge to one span;
    # a distant third duplicated trigram stays separate
    docs = {3: "a b c d gap1 gap2 gap3 e f g",
            4: "a b c d zz1 zz2 zz3 e f g"}
    got = _spans(docs, window=3)
    assert got == [(3, 0, 4, 2), (3, 7, 10, 1),
                   (4, 0, 4, 2), (4, 7, 10, 1)]


def test_min_count_threshold():
    docs = {1: "m n o t1", 2: "m n o t2", 3: "m n o t3"}
    assert len(_spans(docs, window=3, min_count=3)) == 3
    assert len(_spans(docs, window=3, min_count=4)) == 0


def test_short_and_empty_docs_skip():
    docs = {1: "a b", 2: "", 3: "x y z q r s", 4: "x y z q r s"}
    got = _spans(docs, window=3)
    assert got == [(3, 0, 6, 4), (4, 0, 6, 4)]


def test_census_counts_occurrences():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["k l m k l m", "k l m"])})
    with partition_hint(2):
        out = dup_gram_census(rd.from_arrow(t), window=3,
                              min_count=3).to_pandas()
    # "k l m" occurs 3x (twice in doc 1 incl. none across the seam —
    # windows are contiguous: 'm k l'/'l m k' occur once each only)
    assert len(out) == 1 and out["n_occ"][0] == 3


def test_partition_invariance_and_whitespace():
    docs = {i: ("dup run here " if i % 2 else "dup  run\there ")
               + f"tail{i} t{i}" for i in range(20)}
    a = _spans(docs, parts=1)
    b = _spans(docs, parts=6)
    assert a == b and a


def test_validation_and_broadcast_cap():
    docs = {1: "a b c", 2: "a b c"}
    with pytest.raises(ValueError):
        _spans(docs, window=0)
    with pytest.raises(ValueError):
        _spans(docs, min_count=1)
    with pytest.raises(ValueError):
        _spans(docs, window=3, max_broadcast=0)
