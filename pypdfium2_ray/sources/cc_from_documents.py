"""Derive a Common-Crawl-style ``cc_pages`` table from the driver's
``documents`` table (``doc_id:int64, text, lang, source, n_chars``).

The driver's star schema carries no ``html:binary`` payload, so the flagship
pipeline's input (BASELINE.json ``input_hint`` schema) is synthesized
deterministically: each document becomes one HTML page whose body is the
document text in a single ``<p>``. All transforms are vectorized Arrow
string kernels — the construction is pure and oracle-invertible: after the
docmodel's whitespace collapse, the extracted page text equals
``trim(regexp_replace(text, ws, ' '))`` of the source text, so the whole
extraction pipeline has an ANSI-SQL oracle.

``url = doc://{source}/{doc_id}``; ``warc_ts = 2026-01-01 + doc_id sec``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BASE_EPOCH_S = 1_767_225_600  # 2026-01-01T00:00:00Z

_PRE = "<html><head><title>"
_MID = "</title></head><body><p>"
_POST = "</p></body></html>"


def documents_to_cc(batch: pa.Table) -> pa.Table:
    """Vectorized ``documents`` row -> ``cc_pages`` row."""
    doc_id_str = pc.cast(batch["doc_id"], pa.string())
    url = pc.binary_join_element_wise(
        "doc://", batch["source"], "/", doc_id_str, "")
    title = pc.binary_join_element_wise("doc ", doc_id_str, "")
    html = pc.cast(pc.binary_join_element_wise(
        _PRE, title, _MID, batch["text"], _POST, ""), pa.binary())
    ts = pc.cast(pc.multiply(
        pc.add(pc.cast(batch["doc_id"], pa.int64()), _BASE_EPOCH_S),
        1_000_000), pa.timestamp("us"))
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": batch["text"],
        "lang": batch["lang"],
        "doc_id": batch["doc_id"],
    })


def read_cc_from_documents(sf_dir: str):
    """``read_parquet(documents)`` (column-pruned) -> streaming cc_pages."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(documents_to_cc, batch_format="pyarrow")


def sql_extracted_text(text_col: str = "text") -> str:
    """The DuckDB oracle for the flagship ``extracted_text`` of a
    one-paragraph synthesized page: ``"# Page 1\\n" + collapsed + "\\n"``
    (cli/extract_text.py:30-45 framing; htmldoc whitespace collapse)."""
    collapsed = (f"trim(regexp_replace({text_col}, "
                 "'[ \\t\\r\\n\\f\\v]+', ' ', 'g'), ' ')")
    return f"'# Page 1' || chr(10) || {collapsed} || chr(10)"
