"""Positional phrase search (stages/invindex.positional_postings +
phrase_match)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.invindex import (explode_doc_token_positions,
                                           phrase_match,
                                           positional_postings)


def _matches(docs, phrase, parts=2):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs], pa.string())})
    with partition_hint(parts):
        p = positional_postings(rd.from_arrow(t))
        out = phrase_match(p, phrase).to_pandas()
    return sorted(zip(out["doc_id"], out["pos"])) if len(out) else []


def test_positions_skip_empty_tokens():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["  a  b\t\nc "], pa.string())})
    out = explode_doc_token_positions(t).to_pandas()
    assert list(out["term"]) == ["a", "b", "c"]
    assert list(out["pos"]) == [0, 1, 2]


def test_basic_and_overlapping_matches():
    docs = {1: "x big cat big cat y", 2: "big cat", 3: "cat big"}
    assert _matches(docs, ["big", "cat"]) == [(1, 1), (1, 3), (2, 0)]


def test_repeated_phrase_terms():
    # "go go go" matches twice (overlapping) in "go go go go"
    docs = {5: "go go go go", 6: "go stop go go"}
    assert _matches(docs, ["go", "go", "go"]) == [(5, 0), (5, 1)]


def test_single_term_phrase_and_misses():
    docs = {1: "a b a", 2: "c"}
    assert _matches(docs, ["a"]) == [(1, 0), (1, 2)]
    assert _matches(docs, ["z"]) == []
    # partial overlap is not a match
    assert _matches(docs, ["a", "c"]) == []


def test_cross_doc_no_bleed():
    # last token of doc 1 + first of doc 2 must not form a match
    docs = {1: "end big", 2: "order start"}
    assert _matches(docs, ["big", "order"]) == []


def test_partition_invariance():
    docs = {i: ("u v w " * (i % 4 + 1)).strip() for i in range(30)}
    a = _matches(docs, ["v", "w", "u"], parts=1)
    b = _matches(docs, ["v", "w", "u"], parts=5)
    assert a == b and a


def test_validation():
    docs = {1: "a"}
    with pytest.raises(ValueError):
        _matches(docs, [])
    with pytest.raises(ValueError):
        _matches(docs, ["a", ""])
