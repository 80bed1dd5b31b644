"""chunk_tokens (stages/chunk) and token_entropy (stages/textstats):
hand-checked semantics, layout invariance, DuckDB twin parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.chunk import chunk_tokens, sql_chunk_tokens
from pypdfium2_ray.stages.textstats import token_entropy

DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3], pa.int64()),
    "text": ["a b c d e",          # 5 tokens
             "  x \t y  ",         # messy whitespace, 2 tokens
             ""],                  # empty -> no chunks, entropy 0
})


def test_chunk_semantics(ray_session):
    out = chunk_tokens(rd.from_arrow(DOCS), window=3, step=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    got = list(map(tuple, out[["doc_id", "chunk_idx", "chunk_text",
                               "n_tokens"]].to_numpy()))
    assert got == [(1, 0, "a b c", 3), (1, 1, "c d e", 3), (1, 2, "e", 1),
                   (2, 0, "x y", 2)]


def test_chunk_no_overlap_default(ray_session):
    out = chunk_tokens(rd.from_arrow(DOCS), window=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    d1 = out[out.doc_id == 1]["chunk_text"].tolist()
    assert d1 == ["a b", "c d", "e"]


def test_chunk_layout_invariant(ray_session):
    ds1 = rd.from_arrow(DOCS)
    ds4 = rd.from_arrow(DOCS).repartition(3)
    a = chunk_tokens(ds1, window=3, step=2).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = chunk_tokens(ds4, window=3, step=2).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_chunk_sql_twin(ray_session):
    import duckdb
    con = duckdb.connect()
    con.register("documents", DOCS)
    want = con.execute(sql_chunk_tokens(3, 2)).fetchdf() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = chunk_tokens(rd.from_arrow(DOCS), window=3, step=2).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert got.equals(want)


def test_chunk_validation(ray_session):
    with pytest.raises(ValueError):
        chunk_tokens(rd.from_arrow(DOCS), window=4, step=5)
    with pytest.raises(ValueError):
        chunk_tokens(rd.from_arrow(DOCS), window=0)


def test_entropy_hand_checked(ray_session):
    """'a b a' -> N=3, counts {a:2, b:1}: S = 2*floor(ln(1.5)*1e6)
    + 1*floor(ln(3)*1e6); entropy = S // 3. Uniform doc -> ln(n) each."""
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b a", "p q r s", ""]})
    out = token_entropy(rd.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()
    s1 = 2 * int(np.floor(np.log(3 / 2) * 1e6)) \
        + int(np.floor(np.log(3 / 1) * 1e6))
    assert out.loc[1, "entropy_micro"] == s1 // 3
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "entropy_micro"] == int(np.floor(np.log(4.0) * 1e6))
    assert out.loc[3, ["n_tokens", "entropy_micro"]].tolist() == [0, 0]
    # repetitive text scores strictly below diverse text of equal length
    assert out.loc[1, "entropy_micro"] < out.loc[2, "entropy_micro"]


def test_entropy_layout_invariant(ray_session):
    docs = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                     "text": [f"w{i % 3} w{i % 5} w{i % 7} tail" * (i % 4)
                              for i in range(20)]})
    a = token_entropy(rd.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = token_entropy(rd.from_arrow(docs).repartition(5)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
