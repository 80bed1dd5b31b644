"""Per-document n-gram novelty scoring (first-occurrence attribution).

A growing training corpus wants to know, per document, how much of it
is NEW: the fraction of its distinct word n-grams whose globally first
occurrence (smallest ``doc_id`` — in an append-only crawl the id order
IS arrival order) is this document.  Low novelty means the doc is
mostly re-treading grams the corpus already has — the document-level
complement of the pairwise dedup tiers (``stages/dedup``,
``stages/dupspans``): instead of asking "which pairs overlap", it
charges every duplicated gram to exactly one canonical owner and
scores each doc by what it contributed first.  (Quality-filter
lineage: the "fraction of duplicated n-grams" family of signals in
Rae et al., "Scaling Language Models: ... Gopher", arXiv 2021 —
public literature.)

Semantics: grams are distinct word ``k``-grams per doc, hashed with
``md5_hash64 >> 3`` (the ids-only exchange discipline; the SQL twin
groups by the same ``md5_number_upper(g) >> 3``, so rare collisions
are REPLICATED, not divergent).  ``n_grams`` = the doc's distinct gram
count, ``n_novel`` = how many of those grams have ``min(doc_id) ==
doc_id`` over the whole corpus.  Docs with no tokens emit nothing.
Integer outputs only — ratios are one division away and floats would
put IEEE noise in the oracle gate.

Distributed shape: per-block gram rows ``(gram_h:int64, doc_id:int64)``
(already doc-distinct), ONE exchange on ``gram_h`` whose kernel does
min-doc attribution AND collapses to per-doc partial counts (rows out
<= docs × partitions), then ONE tiny pre-combined sum exchange on
``doc_id``.  No broadcast, no driver reads, nothing wider than 3
int64s ever moves.

No reference analogue (pypdfium2 is single-document); text-curation
sibling of ``stages/textstats`` / ``stages/dupspans``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pypdfium2_ray.functions.sketch import (
    char_shingles, md5_hash64, word_ngrams)
from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import partition_map

I64 = pa.int64()


class _GramRows:
    """Actor: text -> per-doc-distinct hashed gram rows. Hash values
    memoized per worker (grams repeat heavily across docs)."""

    def __init__(self, id_col: str, text_col: str, k: int,
                 shingle_kind: str = "word"):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.shingle_fn = (char_shingles if shingle_kind == "char"
                           else word_ngrams)
        self._memo: dict[bytes, int] = {}

    def _h(self, g: bytes) -> int:
        v = self._memo.get(g)
        if v is None:
            v = md5_hash64(g) >> 3
            self._memo[g] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_g, out_d = [], []
        for i, t in zip(ids, texts):
            hs = {self._h(g) for g in self.shingle_fn(t or "", self.k)}
            out_g.extend(hs)
            out_d.extend([i] * len(hs))
        return pa.table({"gram_h": pa.array(out_g, I64),
                         "doc_id": pa.array(out_d, I64)})


def _attribute_kernel(t: pa.Table) -> pa.Table:
    """Per gram_h partition: first_doc = min doc per gram run, then
    collapse to per-doc partials (n_grams, n_novel). One lexsort, run
    detection, one Cython groupby — no per-group Python."""
    g = t["gram_h"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    if len(g) == 0:
        return pa.table({"doc_id": pa.array([], I64),
                         "n_grams": pa.array([], I64),
                         "n_novel": pa.array([], I64)})
    order = np.lexsort((d, g))
    g, d = g[order], d[order]
    new_run = np.empty(len(g), dtype=bool)
    new_run[0] = True
    new_run[1:] = g[1:] != g[:-1]
    # doc at each run start is the run's min doc (sorted within run)
    run_id = np.cumsum(new_run) - 1
    first_doc = d[new_run][run_id]
    novel = (d == first_doc).astype(np.int64)
    part = pd.DataFrame({"doc_id": d, "novel": novel}).groupby(
        "doc_id", sort=False).agg(
        n_grams=("novel", "size"), n_novel=("novel", "sum")).reset_index()
    return pa.table({"doc_id": pa.array(part["doc_id"].to_numpy(), I64),
                     "n_grams": pa.array(part["n_grams"].to_numpy(), I64),
                     "n_novel": pa.array(part["n_novel"].to_numpy(), I64)})


def gram_novelty(ds, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3, shingle_kind: str = "word",
                 num_partitions: int | None = None):
    """Dataset[(doc_id, n_grams, n_novel)] — see module docstring."""
    from pypdfium2_ray.stages.warm import warm_task
    if k < 1:
        raise ValueError("k must be >= 1")
    rows = ds.map_batches(
        warm_task(_GramRows, id_col=id_col, text_col=text_col, k=k,
                  shingle_kind=shingle_kind),
        batch_format="pyarrow")
    partials = partition_map(rows, ["gram_h"], _attribute_kernel,
                             num_partitions=num_partitions)
    return grouped_aggregate(
        partials, keys=["doc_id"],
        specs={"n_grams": ("n_grams", "sum"),
               "n_novel": ("n_novel", "sum")},
        num_partitions=num_partitions)
