"""Varint codec + compressed posting sizes (functions/varint,
invindex.compressed_posting_sizes)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from pypdfium2_ray.functions.varint import (
    varint_decode, varint_encode, varint_widths)
from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.invindex import compressed_posting_sizes


def test_known_encodings():
    buf, w = varint_encode(np.array([0, 1, 127, 128, 300, 2 ** 14],
                                    np.uint64))
    assert list(w) == [1, 1, 1, 2, 2, 3]
    assert buf[:3] == b"\x00\x01\x7f"
    assert buf[3:5] == b"\x80\x01"          # 128 = LEB128 80 01
    assert buf[5:7] == b"\xac\x02"          # 300 = AC 02 (LEB128 example)
    assert list(varint_decode(buf)) == [0, 1, 127, 128, 300, 2 ** 14]


def test_width_boundaries_and_max():
    vals = [0, 2 ** 7 - 1, 2 ** 7, 2 ** 14 - 1, 2 ** 14, 2 ** 63 - 1,
            2 ** 64 - 1]
    w = varint_widths(np.array(vals, np.uint64))
    assert list(w) == [1, 1, 2, 2, 3, 9, 10]
    buf, _ = varint_encode(np.array(vals, np.uint64))
    assert list(varint_decode(buf)) == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2 ** 64 - 1),
                max_size=50))
def test_roundtrip_property(vals):
    arr = np.array(vals, np.uint64)
    buf, w = varint_encode(arr)
    assert len(buf) == int(w.sum())
    assert list(varint_decode(buf)) == vals


def test_decode_rejects_truncation():
    buf, _ = varint_encode(np.array([300], np.uint64))
    with pytest.raises(ValueError):
        varint_decode(buf[:1])


def _brute_sizes(docs):
    import collections
    import re
    posts = collections.defaultdict(set)
    for d, t in docs.items():
        for w in re.findall(r"[^ \t\r\n\f\v]+", t):
            posts[w].add(d)
    out = {}
    for term, ids in posts.items():
        ids = sorted(ids)
        gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        out[term] = (len(ids),
                     int(varint_widths(np.array(gaps, np.uint64)).sum()))
    return out


def test_posting_sizes_match_brute_force():
    docs = {0: "a b c a", 1: "b c d", 130: "a d", 40000: "a"}
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in docs])})
    with partition_hint(3):
        out = compressed_posting_sizes(rd.from_arrow(t)).to_pandas()
    got = {r.term: (r.df, r.n_bytes) for r in out.itertuples()}
    assert got == _brute_sizes(docs)
    # 'a' ids 0,130,40000 -> gaps 0,130,39870 -> widths 1,2,3
    assert got["a"] == (3, 6)
