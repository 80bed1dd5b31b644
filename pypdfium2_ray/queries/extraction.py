"""Flagship extraction queries (reference semantics; SURVEY §3.1).

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping; content unchanged). See
``pypdfium2_ray/queries/__init__.py`` for the layout.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.queries.common import *  # noqa: F401,F403,E501

# ---------------------------------------------------------------------------
# flagship extraction (reference semantics; SURVEY §3.1)

def _extract(sf_dir: str, strategy: str = "range",
             skew_split: bool | str = "blocks"):
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir)
    # wide page so the synthesized documents' long text lines never
    # overflow the page bbox (the bounded strategy clips at the bbox,
    # textpage.py:52-85 — with the default 595pt page a >74-char line
    # would be truncated)
    layout = LayoutParams(page_width=1e9)
    # skew_split="blocks" = the scale shape: ONE ReadParquet scan,
    # byte-bounded dynamic block splitting isolates oversized blobs
    # (pipelines/extract_text.py:52-58). q_split_extract keeps the
    # explicit two-pool variant under its own query id.
    out = extract_pipeline(
        ds=ds, skew_split=skew_split,
        extract_opts=dict(strategy=strategy, include_pages=False,
                          include_rects=False, layout=layout))
    out = out.select_columns(["url", "lang", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])


def q_extract_text(sf_dir: str):
    return _extract(sf_dir, "range")


def q_split_extract(sf_dir: str):
    """The explicit two-pool skew split (light/heavy on html_len,
    stages/skew.split_extract) — same per-url contract as the flagship,
    kept as its own query for coverage of the two-pool routing path.
    Reads the upstream once per branch by construction, so the flagship
    itself uses the single-scan "blocks" shape instead."""
    return _extract(sf_dir, "range", skew_split=True)


def q_extract_bounded(sf_dir: str):
    """Bounded-rect strategy over the full page bbox — must equal the range
    strategy byte-for-byte (the reference's own invariant,
    tests/test_textpage.py:26-29)."""
    ds = _extract(sf_dir, "bounded")
    return ds.select_columns(["url", "extracted_text"])


def q_density_extract(sf_dir: str):
    """The DOM-heuristic content policy over the WILD-crawl corpus shape:
    the same documents synthesized WITHOUT <main> (boilerplate as
    link-dense divs plus a positive-scoring plain banner div,
    cc_from_documents wrap='divs') extracted with
    content_policy='density' — the link-density segment scorer must
    recover byte-identical text to the semantic corpus, so the flagship
    extraction SQL is its oracle. The semantic policy on this corpus
    provably differs (boilerplate leaks; tested in test_htmldoc.py)."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir, wrap="divs")
    with _hint(sf_dir):
        out = extract_pipeline(
            ds=ds, skew_split="blocks",
            extract_opts=dict(include_pages=False, include_rects=False,
                              content_policy="density",
                              layout=LayoutParams(page_width=1e9)))
    out = out.select_columns(["url", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])


def q_tile_extract(sf_dir: str):
    """Distributed document re-assembly end-to-end: parse each ok crawl
    page, impose BOTH its pages onto one 2x1 sheet
    (docmodel.serialize.tile_document — the FPDF_ImportNPagesToOne
    analogue), SERIALIZE the result, re-parse the serialized bytes and
    extract — exercising tile + save + reopen in one streaming stage.
    The oracle composes the single-sheet text from the synthesis: tile
    order == reading order, so the sheet is page1's lines then page2's,
    CRLF-joined under one '# Page 1' frame."""
    from pypdfium2_ray.docmodel.htmldoc import (
        extract_document_text, parse_document)
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.docmodel.serialize import (
        serialize_document, tile_document)
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    layout = LayoutParams(page_width=1e9)

    def f(t: pa.Table) -> pa.Table:
        urls, n_pages, texts = [], [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            doc = parse_document(html or b"", layout=layout)
            if not doc.ok:
                continue
            tiled = tile_document(doc, cols=2, rows=1,
                                  width=1190, height=842)
            back = parse_document(serialize_document(tiled), layout=layout)
            urls.append(url)
            n_pages.append(len(back))
            texts.append(extract_document_text(back, "range"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "n_pages": pa.array(n_pages, pa.int64()),
                         "extracted_text": pa.array(texts, pa.string())})

    return read_cc_from_documents(sf_dir).map_batches(
        f, batch_format="pyarrow")


def _warc_corpus(sf_dir: str) -> str:
    """The cc corpus materialized ONCE per sf_dir as WARC shards (Common
    Crawl's container format, sources/warc): built by the distributed
    sink into a temp dir, atomically renamed — idempotent and crash-safe,
    keyed by the documents footer row count so sf dirs never collide."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_warc_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.sources.warc import write_warc_shards
    build = out + ".build"
    import shutil
    shutil.rmtree(build, ignore_errors=True)
    ds = read_cc_from_documents(sf_dir).select_columns(
        ["url", "warc_ts", "html"])
    write_warc_shards(ds, build, n_shards=max(4, rows // 2000))
    os.replace(build, out)
    return out


def q_warc_extract(sf_dir: str):
    """The flagship extraction fed from native WARC shards instead of
    Parquet (sources/warc.read_warc): same per-url byte-identical output,
    so the Parquet-path extraction SQL is its oracle — proving the
    container codec + source are lossless end-to-end at driver-gate
    scale."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.warc import read_warc
    with _hint(sf_dir):
        ds = read_warc(_warc_corpus(sf_dir))
        out = extract_pipeline(
            ds=ds, skew_split="blocks",
            extract_opts=dict(include_pages=False, include_rects=False,
                              layout=LayoutParams(page_width=1e9)))
    out = out.select_columns(["url", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
