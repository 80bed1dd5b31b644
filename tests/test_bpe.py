"""BPE merge-pair counting (stages/bpe.merge_pair_counts)."""

import collections
import re

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.bpe import merge_pair_counts
from pypdfium2_ray.stages.exchange import partition_hint


def _run(texts, k=100, parts=2):
    t = pa.table({"text": pa.array(texts, pa.string())})
    with partition_hint(parts):
        out = merge_pair_counts(rd.from_arrow(t), k=k).to_pandas()
    if "pair" not in out.columns:
        return []   # zero-row pipelines lose their schema in the Ray
                    # hash shuffle — an empty frame, not an error
    return list(zip(out["pair"], out["cnt"]))


def _brute(texts, k=100):
    cnt = collections.Counter()
    for t in texts:
        for w in re.findall(r"[^ \t\r\n\f\v]+", t):
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    return sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_matches_brute_force():
    texts = ["the cat sat on the mat", "the thematic math theme",
             "aaa bb c", "", "  spaced   out  "]
    assert _run(texts) == _brute(texts)


def test_overlapping_pairs_count_per_occurrence():
    # "aaaa" has three overlapping "aa" pairs, twice -> 6
    got = dict(_run(["aaaa aaaa"]))
    assert got["aa"] == 6


def test_weighting_by_word_frequency():
    # "ab" occurs 3x as a word -> pair "ab" count 3
    assert _run(["ab ab ab"], k=1) == [("ab", 3)]


def test_topk_tie_break_is_lexicographic():
    # ba and ab both count 2; with k=1 the lexicographically smaller wins
    out = _run(["ab ab ba ba"], k=1)
    assert out == [("ab", 2)]


def test_single_char_words_and_partition_invariance():
    texts = ["x y z", "xy yz zx " * 5, "deterministic determinism"]
    assert _run(texts, parts=1) == _run(texts, parts=4)
    assert dict(_run(["a b c"])) == {}  # no pairs at all
    with pytest.raises(ValueError):
        _run(["ab"], k=0)
