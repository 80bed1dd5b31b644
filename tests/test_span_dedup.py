"""Duplicate-span removal (stages/dedup.span_dedup)."""

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.dedup import span_dedup
from pypdfium2_ray.stages.exchange import partition_hint


def _run(t: pa.Table, k: int):
    with partition_hint(2):
        out = span_dedup(rd.from_arrow(t), span_tokens=k).to_pandas()
    return {r.doc_id: (r.text, r.n_spans) for r in out.itertuples()}


def test_keep_first_and_reassembly_order():
    t = pa.table({"doc_id": [1, 2], "text": ["a b c d e f", "a b c x y z"]})
    got = _run(t, 3)
    assert got == {1: ("a b c d e f", 2), 2: ("x y z", 1)}


def test_whitespace_normalization_and_empty_doc():
    # doc 3's only span ws-normalizes to doc 2's -> doc 3 fully removed;
    # empty doc emits no row (no tokens)
    t = pa.table({"doc_id": [2, 3, 4],
                  "text": ["x y z", "  x  y\tz  ", ""]})
    got = _run(t, 3)
    assert got == {2: ("x y z", 1)}


def test_ragged_tail_span_dedups():
    # k=2 chunks: doc1 = "p q"|"r s"|"t", doc2 = "u v"|"w s"|"t";
    # the ragged tail "t" dedups to doc1's occurrence
    t = pa.table({"doc_id": [1, 2], "text": ["p q r s t", "u v w s t"]})
    got = _run(t, 2)
    assert got == {1: ("p q r s t", 3), 2: ("u v w s", 2)}


def test_first_occurrence_is_global_min_doc_then_idx():
    # span "z z" appears at idx 1 of doc 5 and idx 0 of doc 9:
    # keeper is (5, 1) by (doc_id, span_idx) order
    t = pa.table({"doc_id": [5, 9], "text": ["a a z z", "z z b b"]})
    got = _run(t, 2)
    assert got == {5: ("a a z z", 2), 9: ("b b", 1)}
