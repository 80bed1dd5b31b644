"""Content-defined chunking (stages/cdc.py — windowed gear hash)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.cdc import _CdcChunks, cdc_chunk_rows, shared_chunks
from pypdfium2_ray.stages.exchange import partition_hint


def _chunker(window=16, mask_bits=6):
    return _CdcChunks("doc_id", "text", window, mask_bits)


def _ref_chunks(text, window=16, mask_bits=6):
    """Independent scalar reimplementation: python-int rolling window."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    if not text:
        return []
    if len(text) < window:
        return [text]
    g = [md5_hash64(str(ord(c)).encode()) >> 16 for c in text]
    out, start = [], 0
    for p in range(window, len(text) + 1):       # 1-based end position
        h = sum(g[p - 1 - j] * (1 << j) for j in range(window)) % (1 << 64)
        if h % (1 << mask_bits) == 0:
            out.append(text[start:p])
            start = p
    if start < len(text):
        out.append(text[start:])
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 8,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "short",
    "",
    "Mixed UNICODE: naïve café — ¡señor! " * 6,
    "".join(chr(65 + (i * 7) % 26) for i in range(500)),
]


def test_chunks_reassemble_to_text():
    ck = _chunker()
    for t in TEXTS:
        assert "".join(ck.chunks_of(t)) == t


def test_matches_scalar_reference():
    ck = _chunker()
    for t in TEXTS:
        assert ck.chunks_of(t) == _ref_chunks(t)


def test_boundary_shift_realignment():
    # insert a char near the front: chunking realigns after ~one window,
    # so most chunks are shared — the CDC property fixed-size lacks
    ck = _chunker()
    base = "".join(hashlib.md5(str(i).encode()).hexdigest()
                   for i in range(60))
    edited = "X" + base
    a, b = set(ck.chunks_of(base)), set(ck.chunks_of(edited))
    assert len(a) > 10
    assert len(a & b) >= len(a) - 3


def test_short_doc_is_single_chunk():
    ck = _chunker()
    assert ck.chunks_of("tiny") == ["tiny"]
    assert ck.chunks_of("") == []


def test_shared_chunks_rollup_and_layout_invariance():
    docs = [(i, TEXTS[0]) for i in range(4)] + [(9, TEXTS[5]), (10, "")]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            out = shared_chunks(ds).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    a = run(1, 1)
    assert a == run(3, 4)
    ck = _chunker()
    n_chunks = len(ck.chunks_of(TEXTS[0]))
    # every chunk of the repeated doc occurs in all 4 copies
    per_chunk = {}
    for c in ck.chunks_of(TEXTS[0]):
        per_chunk[c] = per_chunk.get(c, 0) + 1
    for md5h, n_occ, n_docs in a:
        if n_docs == 4:
            assert n_occ % 4 == 0
    assert sum(1 for _, _, d in a if d == 4) == len(per_chunk)


def test_chunk_rows_schema_and_counts():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([TEXTS[0], None], pa.string())})
    out = cdc_chunk_rows(rd.from_arrow(t)).to_pandas()
    ck = _chunker()
    assert list(out.columns) == ["doc_id", "chunk_md5"]
    assert (out["doc_id"] == 1).all()
    assert len(out) == len(ck.chunks_of(TEXTS[0]))
    assert (out["chunk_md5"].str.len() == 32).all()


def test_duckdb_twin_on_tiny_corpus(tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    rows = [(i, TEXTS[i % len(TEXTS)] + f" tail{i % 3}") for i in range(18)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    p = tmp_path / "docs.parquet"
    pq.write_table(t, p)
    with partition_hint(2):
        mine = shared_chunks(rd.from_arrow(t)).to_pandas()
    mine = sorted(map(tuple, mine.to_numpy()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{p}')")
    import __ray_entry__ as E
    orc = con.execute(E.oracle_sql()["shared_chunks"]).fetchall()
    assert mine == sorted((h, int(a), int(b)) for h, a, b in orc)


def _tpl(t, **kw):
    from pypdfium2_ray.stages.cdc import template_chunks
    with partition_hint(kw.pop("parts", 2)):
        out = template_chunks(rd.from_arrow(t), **kw).to_pandas()
    return sorted(map(tuple, out.to_numpy()))


def test_template_chunks_semantics():
    # host A: 5 docs, 4 share TEXTS[0]'s chunks (80% >= 20%), one odd doc;
    # host B: 3 distinct docs -> no chunk clears min_docs=2.
    rows = ([(i, TEXTS[0], "a.com") for i in range(4)]
            + [(4, TEXTS[5], "a.com")]
            + [(10 + i, TEXTS[5] + f"@{i}" * 40, "b.com") for i in range(3)])
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([r[2] for r in rows], pa.string())})
    out = _tpl(t)
    from pypdfium2_ray.stages.cdc import DEFAULT_WINDOW, DEFAULT_MASK_BITS
    ck = _CdcChunks("doc_id", "text", DEFAULT_WINDOW, DEFAULT_MASK_BITS)
    tpl_md5s = {hashlib.md5(c.encode()).hexdigest()
                for c in ck.chunks_of(TEXTS[0])}
    assert {r[0] for r in out} == {"a.com"}
    assert {r[1] for r in out} == tpl_md5s
    for src, md5h, n_docs, src_docs in out:
        assert (n_docs, src_docs) == (4, 5)


def test_template_chunks_threshold_boundary():
    # 1/5 threshold: 1 of 5 docs fails min_docs=2; 2 of 10 passes exactly;
    # 2 of 11 fails (2*5 < 11).
    def corpus(n_total, n_dup):
        rows = [(i, TEXTS[0], "h") for i in range(n_dup)]
        rows += [(100 + i, TEXTS[5] + f"#{i}" * 30, "h")
                 for i in range(n_total - n_dup)]
        return pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string()),
             "source": pa.array([r[2] for r in rows], pa.string())})

    assert _tpl(corpus(5, 1)) == []            # min_docs=2 gate
    assert len(_tpl(corpus(10, 2))) > 0        # 2*5 >= 10: boundary in
    assert _tpl(corpus(11, 2)) == []           # 2*5 < 11: boundary out


def test_template_chunks_layout_invariance():
    rows = [(i, TEXTS[i % 3] + TEXTS[0], f"s{i % 2}") for i in range(12)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([r[2] for r in rows], pa.string())})

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        from pypdfium2_ray.stages.cdc import template_chunks
        with partition_hint(parts):
            out = template_chunks(ds).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(3, 5)


def test_cdc_carry_col_replication():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([TEXTS[0], TEXTS[4]], pa.string()),
                  "source": pa.array(["x.org", "y.org"], pa.string())})
    out = cdc_chunk_rows(rd.from_arrow(t), carry_col="source").to_pandas()
    assert list(out.columns) == ["doc_id", "chunk_md5", "source"]
    assert set(out[out.doc_id == 1]["source"]) == {"x.org"}
    assert set(out[out.doc_id == 2]["source"]) == {"y.org"}
