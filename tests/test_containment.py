"""Asymmetric containment self-join (stages/ppjoin.containment_pairs)."""

import itertools

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.functions.sketch import word_ngrams
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.ppjoin import containment_pairs


def _pairs(docs, tau=0.8, k=2, parts=2, **kw):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs])})
    with partition_hint(parts):
        out = containment_pairs(rd.from_arrow(t), tau=tau, shingle_k=k,
                                shingle_kind="word", **kw).to_pandas()
    return sorted(zip(out["id_in"], out["id_out"],
                      out["n_inter"], out["n_inner"])) if len(out) else []


def _brute(docs, tau, k):
    sh = {d: word_ngrams(t, k) for d, t in docs.items()}
    out = []
    for a, b in itertools.permutations(docs, 2):
        inner = len(sh[a])
        inter = len(sh[a] & sh[b])
        if inner and inter / inner >= tau:
            out.append((a, b, inter, inner))
    return sorted(out)


def test_short_doc_inside_long_one():
    # doc 1 verbatim inside doc 2: containment 1.0 one way only, and
    # the symmetric Jaccard is far below tau — the MinHash blind spot
    docs = {1: "alpha beta gamma delta",
            2: "x1 x2 alpha beta gamma delta y1 y2 y3 y4 y5 y6"}
    got = _pairs(docs, tau=0.8)
    assert (1, 2, 3, 3) in got
    assert not any(a == 2 for a, _, _, _ in got)


def test_matches_brute_force_at_multiple_taus():
    docs = {1: "a b c d e", 2: "a b c d e f g h", 3: "a b c q r",
            4: "q r s", 5: "a b c d e", 6: "zz"}
    for tau in (0.5, 0.7, 0.8, 1.0):
        assert _pairs(docs, tau=tau) == _brute(docs, tau, 2)


def test_both_directions_for_identical_docs():
    docs = {10: "m n o p", 20: "m n o p"}
    got = _pairs(docs, tau=1.0)
    assert got == [(10, 20, 3, 3), (20, 10, 3, 3)]


def test_empty_docs_never_pair():
    docs = {1: "", 2: "a b c", 3: "   "}
    assert _pairs(docs, tau=0.5) == []


def test_partition_invariance():
    docs = {i: " ".join(f"w{j % 7}" for j in range(i % 9 + 2))
            for i in range(40)}
    a = _pairs(docs, parts=1)
    b = _pairs(docs, parts=6)
    assert a == b and a


def test_truncation_is_loud(caplog):
    # end-to-end: capped buckets lose pairs (Ray workers don't feed
    # caplog, so the log assertion runs on the kernel directly)
    import logging

    import pandas as pd

    from pypdfium2_ray.stages.ppjoin import _contain_pairs_partition
    docs = {i: "same words here" for i in range(8)}
    got = _pairs(docs, tau=1.0, max_bucket=3)
    assert len(got) < len(_brute(docs, 1.0, 2))
    df = pd.DataFrame({"tok_key": [5] * 8, "doc_id": range(8),
                       "size": [1] * 8, "role": [0, 0, 0, 0, 1, 1, 1, 1]})
    with caplog.at_level(logging.WARNING):
        _contain_pairs_partition(df, 1.0, max_bucket=3)
    assert any("truncation" in r.message for r in caplog.records)


def test_validation():
    with pytest.raises(ValueError):
        _pairs({1: "a b"}, tau=0.0)
