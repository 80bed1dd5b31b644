"""Distributed inverted-index build: ``(term, postings, df)`` over a
document corpus — the retrieval-side artifact a training-data pipeline
needs for contamination checks, term-based filtering and corpus search.

Shape: vectorized token explode carrying the doc id (offsets arithmetic,
no Python per row) -> per-block DISTINCT (doc, term) pre-combine (drops
within-block duplicate occurrences from the wire) -> ONE hash exchange on
``term`` -> per-partition kernel: sort by (term, doc), distinct, and a
single pyarrow ``group_by(term).aggregate([("doc","list")])`` — postings
lists are built by the vectorized list aggregation, sorted by doc id,
with zero per-term Python even at vocabulary scale.

The posting VALUES are doc ids only (ids-only exchange discipline:
payloads stay home); a positional/TF index would carry (doc, tf) pairs
through the same path.

No reference analogue (single-document engine); standard IR construction
(the "index inversion" MapReduce archetype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE
from pypdfium2_ray.stages.exchange import partition_map


def explode_doc_tokens(t: pa.Table, doc_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """One (doc_id, term) row per whitespace token occurrence (empty
    tokens dropped). Same split class as ``freq.explode_tokens`` /
    its SQL twin."""
    toks = pc.split_pattern_regex(t[text_col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    docs = pc.take(t[doc_col],
                   pa.array(np.repeat(np.arange(len(la), dtype=np.int64),
                                      np.diff(la.offsets.to_numpy()))))
    keep = pc.not_equal(flat, "")
    return pa.table({"doc_id": pc.cast(docs.filter(keep) if isinstance(
        docs, pa.ChunkedArray) else docs.filter(keep), pa.int64()),
        "term": flat.filter(keep)})


def build_inverted_index(ds, doc_col: str = "doc_id",
                         text_col: str = "text",
                         num_partitions: int | None = None):
    """Dataset of ``(term, postings: list<int64> sorted asc, df: int64)``.

    Postings hold DISTINCT doc ids. One hash exchange on ``term``; the
    list aggregation preserves the partition kernel's (term, doc) sort,
    so postings come out doc-id-ordered deterministically.
    """
    def explode(t: pa.Table) -> pa.Table:
        pairs = explode_doc_tokens(t, doc_col, text_col)
        return pairs.group_by(["doc_id", "term"],
                              use_threads=False).aggregate([])

    pairs = ds.select_columns([doc_col, text_col]).map_batches(
        explode, batch_size=None, batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        t = t.group_by(["term", "doc_id"], use_threads=False).aggregate([])
        t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        g = t.group_by(["term"], use_threads=False).aggregate(
            [("doc_id", "list"), ("doc_id", "count")])
        return pa.table({"term": g["term"],
                         "postings": g["doc_id_list"],
                         "df": pc.cast(g["doc_id_count"], pa.int64())})

    return partition_map(pairs, ["term"], kernel,
                         num_partitions=num_partitions)
