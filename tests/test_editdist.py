"""FastSS edit-distance dedup (stages/editdist)."""

import random

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from pypdfium2_ray.stages.editdist import (
    _codepoint_matrix, _variant_hashes, editdist_dup_pairs,
    levenshtein_pairs)
from pypdfium2_ray.stages.exchange import partition_hint


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(dp[j] + 1, nd[-1] + 1, dp[j - 1] + (ca != cb)))
        dp = nd
    return dp[-1]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcé", max_size=6),
                          st.text(alphabet="abcé", max_size=6)),
                max_size=20))
def test_levenshtein_pairs_matches_dp(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    assert list(levenshtein_pairs(a, b)) == [_lev(x, y) for x, y in pairs]


def _dhashes(s: str, width: int = 8) -> set:
    lens = np.array([len(s)], np.int64)
    _, h = _variant_hashes(_codepoint_matrix([s], lens, width), lens)
    return set(h.tolist())


def test_deletion_neighborhood_recall():
    # the FastSS theorem: d(x,y) <= 1 => shared variant hash
    rng = random.Random(11)
    strs = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 5)))
            for _ in range(120)]
    for a in strs:
        for b in strs:
            if _lev(a, b) <= 1:
                assert _dhashes(a) & _dhashes(b), (a, b)


def test_variant_hashes_batch_equals_singleton():
    # padding/masking in the batched prefix/suffix pass must not leak
    strs = ["", "a", "ab", "ba", "abc", "abcd", "aabb", "zzzz"]
    lens = np.array([len(s) for s in strs], np.int64)
    rows, hashes = _variant_hashes(_codepoint_matrix(strs, lens, 8), lens)
    per: dict[int, set] = {}
    for r, h in zip(rows, hashes):
        per.setdefault(int(r), set()).add(int(h))
    for i, s in enumerate(strs):
        assert per[i] == _dhashes(s)


def test_editdist_dup_pairs_end_to_end():
    texts = {1: "spark data engine", 2: "spark data enginX",   # sub -> d1
             3: "spark data engin", 4: "shark data engine",    # del, sub
             5: "totally different!", 6: "spark data engine"}  # dup -> d0
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()))})
    with partition_hint(3):
        out = editdist_dup_pairs(rd.from_arrow(t), prefix_len=20,
                                 max_dist=1).to_pandas()
    got = {(r.id_a, r.id_b): r.dist for r in out.itertuples()}
    exp = {}
    for a in texts:
        for b in texts:
            if a < b and _lev(texts[a][:20], texts[b][:20]) <= 1:
                exp[(a, b)] = _lev(texts[a][:20], texts[b][:20])
    assert got == exp
    assert got[(1, 6)] == 0 and got[(1, 2)] == 1 and (1, 5) not in got


def test_depth2_neighborhood_recall_and_formula():
    """k=2: the three-segment combine equals brute variant hashing, and
    d(x,y) <= 2 implies a shared depth-2 variant hash."""
    import numpy as np

    from pypdfium2_ray.stages.editdist import _LMIX, _P

    def brute_hashes(s):
        variants = {s}
        for i in range(len(s)):
            variants.add(s[:i] + s[i + 1:])
            for j in range(i + 1, len(s)):
                variants.add(s[:i] + s[i + 1:j] + s[j + 1:])
        out = set()
        for v in variants:
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for ch in v:
                    h = np.uint64(h * _P) + np.uint64(ord(ch) + 1)
                out.add(int(np.uint64(h + _LMIX * np.uint64(len(v)))))
        return out

    def d2(s, width=8):
        lens = np.array([len(s)], np.int64)
        _, h = _variant_hashes(_codepoint_matrix([s], lens, width),
                               lens, k=2)
        return set(h.tolist())

    rng = random.Random(9)
    strs = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
            for _ in range(60)]
    for s in strs[:25]:
        assert d2(s) == brute_hashes(s), s
    for a in strs:
        for b in strs:
            if _lev(a, b) <= 2:
                assert d2(a) & d2(b), (a, b)


def test_editdist2_end_to_end(ray_session):
    texts = {1: "spark data engine", 2: "spXrk data engXne",  # 2 subs
             3: "spark data",                                 # too far
             4: "spark dat engine"}                           # 1 del
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()))})
    with partition_hint(2):
        out = editdist_dup_pairs(rd.from_arrow(t), prefix_len=20,
                                 max_dist=2).to_pandas()
    got = {(r.id_a, r.id_b): r.dist for r in out.itertuples()}
    exp = {}
    for a in texts:
        for b in texts:
            d = _lev(texts[a][:20], texts[b][:20])
            if a < b and d <= 2:
                exp[(a, b)] = d
    assert got == exp and got[(1, 2)] == 2 and got[(1, 4)] == 1
    assert (1, 3) not in got
