"""Exact set-similarity join via prefix filtering (stages/ppjoin.py)."""

import itertools
import math

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.functions.sketch import word_ngrams
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.ppjoin import (_prefix_len, ppjoin_dup_pairs)


def _corpus(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _brute(texts, tau, k=2, kind="word"):
    """Reference all-pairs exact Jaccard with the 0/0-is-dup convention."""
    assert kind == "word"
    sets = [word_ngrams(t or "", k) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union == 0 or inter / union >= tau:
            out.add((a, b, inter, union))
    return out


def _run(texts, tau, parts=2, **kw):
    with partition_hint(parts):
        out = ppjoin_dup_pairs(rd.from_arrow(_corpus(texts)), tau=tau,
                               shingle_k=2, **kw).to_pandas()
    return set(map(tuple, out.to_numpy()))


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(seed, n=12):
    return " ".join(WORDS[(seed * 7 + i * 3) % len(WORDS)]
                    for i in range(n))


def test_matches_brute_force():
    texts = [_doc(s) for s in range(8)]
    texts += [texts[0], texts[3],                      # exact dups
              texts[1] + " extra", "x y " + texts[2]]  # near dups
    for tau in (0.3, 0.6, 0.9, 1.0):
        assert _run(texts, tau) == _brute(texts, tau), tau


def test_empty_sets_pair_under_zero_zero_convention():
    texts = ["", "", _doc(1), ""]
    got = _run(texts, 0.8)
    assert {(a, b) for a, b, *_ in got} == {(0, 1), (0, 3), (1, 3)}
    assert all(i == 0 and u == 0 for _, _, i, u in got)


def test_boundary_jaccard_exact_threshold():
    # sets {a b, b c, c d} vs {a b, b c, c e}: inter 2, union 4 = 0.5
    ta, tb = "a b c d", "a b c e"
    assert (0, 1, 2, 4) in _run([ta, tb], 0.5)
    assert _run([ta, tb], 0.51) == set()


def test_freq_order_equivalence():
    texts = [_doc(s) for s in range(10)] + [_doc(2), _doc(5) + " tail"]
    base = _run(texts, 0.6)
    assert _run(texts, 0.6, freq_order_top=16) == base
    assert _run(texts, 0.6, freq_order_top=3) == base


def test_partition_and_layout_invariance():
    texts = [_doc(s % 6) for s in range(24)]
    t = _corpus(texts)

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            out = ppjoin_dup_pairs(ds, tau=0.7, shingle_k=2).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(4, 5)


def test_prefix_len_safe_rounding():
    # exact-integer tau*sz: ceil must not round UP past the true value
    assert _prefix_len(4, 0.5) == 3          # 4 - 2 + 1
    assert _prefix_len(10, 0.3) == 8         # 10 - 3 + 1
    assert _prefix_len(5, 1.0) == 1          # identical sets only
    for sz in range(1, 50):
        for tau in (0.3, 0.5, 2 / 3, 0.75, 0.9, 1.0):
            p = _prefix_len(sz, tau)
            assert 1 <= p <= sz
            # never shorter than the exact-math prefix
            assert p >= sz - math.ceil(tau * sz) + 1


def test_truncation_is_loud(caplog):
    import logging
    texts = [_doc(1)] * 6      # one bucket of 6 identical docs
    with caplog.at_level(logging.WARNING):
        got = _run(texts, 0.9, max_bucket=3)
    # pairs among the first 3 bucket members survive; the rest are lost
    assert len({(a, b) for a, b, *_ in got}) < 15


def test_tau_validation():
    with pytest.raises(ValueError):
        _run(["a b c"], 0.0)
