"""Distributed BM25 top-k retrieval — corpus search with the standard
probabilistic ranking function (Robertson & Zaragoza, "The Probabilistic
Relevance Framework: BM25 and Beyond", FnTIR 2009; the Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))``, always positive).

A curation pipeline searches the corpus to audit coverage, pull
contamination candidates, or build retrieval training sets.  The key
structural fact making this CHEAP on Ray Data: a document's text lives in
ONE row of ONE block, so tf (term frequency), dl (document length) and
the per-document score-sum over query terms are all **block-local** — no
exchange ever carries per-document rows.  The full plan:

1. **Scalar pre-pass** (streaming): per-block ``(n_docs, total_tokens)``
   partials; one tiny row per block is combined driver-side into ``N``
   and ``avgdl`` (the same B-partials pattern as ``stages/scan``).
2. **Candidate pass** (streaming, vectorized): explode tokens (offsets
   arithmetic), filter to the broadcast query-term set *before* anything
   else, pyarrow ``group_by(doc, term).count`` per block -> candidate
   rows ``(doc_id, term, tf, dl)``.  Materialized: it is the (small)
   candidate set — docs containing >=1 query term x |Q| — not the corpus.
3. **df aggregate**: ``grouped_aggregate`` on term -> |Q| rows to the
   driver; idf per term computed once.
4. **Score pass**: fixed-point BM25 per candidate row (vectorized,
   idf via ``index_in`` against the broadcast term vector), then the
   per-doc sum as ONE ids-only exchange over the candidate rows
   (``grouped_aggregate`` — exact at any block layout; per-block
   partials shrink the wire first).
5. **Top-k**: ``stages/topk.topk`` — per-block partial top-k, k x blocks
   rows move, no global sort.

**Fixed-point determinism** (repo oracle-parity discipline): all score
arithmetic is non-negative int64 floor division, bit-identical at any
partitioning AND in DuckDB SQL.  The one transcendental — idf — is
``floor(ln(...) * 1e6)`` computed on identical float64 inputs; numpy and
DuckDB both call the platform libm, verified bit-exact over 100k points
(and a 1-ulp divergence would need the product to land within 1e-10 of an
integer).  Milli-scaled pipeline:

- ``avgdl_milli = total_tokens * 1000 // N``
- ``dlr_milli   = dl * 1000000 // avgdl_milli``            (dl/avgdl)
- ``inner_milli = (1000 - b_milli) + b_milli * dlr_milli // 1000``
- ``denom_milli = tf * 1000 + k1_milli * inner_milli // 1000``
- ``tfc_milli   = tf * (k1_milli + 1000) * 1000 // denom_milli``
- ``score_micro = idf_micro * tfc_milli // 1000``; doc score = sum.

No reference analogue (single-document engine); the retrieval-side
companion of ``stages/invindex``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE, token_count
from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.topk import topk

I64 = pa.int64()


def corpus_scalars(ds, text_col: str = "text") -> tuple[int, int]:
    """(N docs, total whitespace tokens) via per-block partials combined
    driver-side — one tiny (2 ints) row per block ever leaves a worker."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([t.num_rows], I64),
            "tok": pa.array([pc.sum(token_count(t[text_col])).as_py() or 0],
                            I64)})
    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (sum(r["n"] for r in parts), sum(r["tok"] for r in parts))


def _candidates(t: pa.Table, terms: list[str], doc_col: str,
                text_col: str) -> pa.Table:
    """Block-local (doc_id, term, tf, dl) for docs containing >=1 query
    term — explode via ListArray offsets, filter FIRST, one pyarrow
    group_by per block."""
    toks = pc.split_pattern_regex(t[text_col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    reps = np.diff(la.offsets.to_numpy())
    idx = pa.array(np.repeat(np.arange(len(la), dtype=np.int64), reps))
    keep = pc.is_in(flat, value_set=pa.array(terms))
    kept_idx = pc.filter(idx, keep)
    docs = pc.take(pc.cast(t[doc_col], I64), kept_idx)
    dl = pc.take(token_count(t[text_col]), kept_idx)
    g = pa.table({"doc_id": docs, "term": pc.filter(flat, keep),
                  "dl": dl}).group_by(
        ["doc_id", "term", "dl"], use_threads=False).aggregate([([], "count_all")])
    return pa.table({"doc_id": g["doc_id"], "term": g["term"],
                     "tf": pc.cast(g["count_all"], I64), "dl": g["dl"]})


def bm25_topk(ds, terms: list[str], k: int = 10,
              doc_col: str = "doc_id", text_col: str = "text",
              k1_milli: int = 1200, b_milli: int = 750,
              num_partitions: int | None = None):
    """Top-``k`` documents by summed fixed-point BM25 over ``terms``.

    Returns Dataset[(doc_id:int64, score_micro:int64)], ties broken by
    doc_id ascending (matching the SQL oracle's ORDER BY).
    """
    n_docs, total_tok = corpus_scalars(ds, text_col)
    if n_docs == 0 or total_tok == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl_milli = total_tok * 1000 // n_docs

    cands = ds.map_batches(
        lambda t: _candidates(t, terms, doc_col, text_col),
        batch_format="pyarrow").materialize()

    df_rows = grouped_aggregate(
        cands.select_columns(["term"]), keys=["term"],
        specs={"df": (None, "count")},
        num_partitions=num_partitions).take_all()
    term_list = sorted(idx_t["term"] for idx_t in df_rows)
    term_arr = pa.array(term_list)
    df_of = {r["term"]: r["df"] for r in df_rows}
    idf_arr = np.array([int(np.floor(np.log(
        1.0 + (n_docs - df_of[t] + 0.5) / (df_of[t] + 0.5)) * 1e6))
        for t in term_list], dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False)
        dl = t["dl"].to_numpy(zero_copy_only=False)
        codes = pc.index_in(t["term"], value_set=term_arr) \
                  .to_numpy(zero_copy_only=False)
        idf = idf_arr[codes]
        dlr = dl * 1_000_000 // avgdl_milli
        inner = (1000 - b_milli) + b_milli * dlr // 1000
        denom = tf * 1000 + k1_milli * inner // 1000
        tfc = tf * (k1_milli + 1000) * 1000 // denom
        return pa.table({"doc_id": t["doc_id"],
                         "score_micro": pa.array(idf * tfc // 1000, I64)})

    # per-doc sum over query terms: an ids-only exchange over the (small)
    # candidate rows — exact at ANY block layout (a doc's <=|Q| rows need
    # not share a batch), with per-block partials shrinking the wire
    scored = grouped_aggregate(
        cands.map_batches(score, batch_format="pyarrow"),
        keys=["doc_id"], specs={"score_micro": ("score_micro", "sum")},
        num_partitions=num_partitions)
    return topk(scored, ["score_micro", "doc_id"], k,
                descending=[True, False])
