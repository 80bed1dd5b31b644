"""Corpus language-model quality scoring — the CCNet-style signal
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data", LREC 2020 uses a KenLM perplexity; the from-scratch
analogue here is a unigram LM estimated ON the corpus itself), used to
rank/bucket documents by how "ordinary" their token distribution is.

Plan (two streaming passes + one tiny exchange):

1. **Vocabulary pass**: token explode (offsets arithmetic) -> per-block
   partial counts -> ONE term exchange (``grouped_aggregate``) -> global
   top-``vocab_size`` terms by (count desc, term asc) via the partial
   top-k stage — the only rows that ever move are (term, count) pairs.
   Corpus totals (N docs, T tokens) ride the same scan via
   ``bm25.corpus_scalars``.
2. **Score pass**: one ``map_batches`` over the corpus with the vocab
   broadcast through the object store (``ray.put`` once, zero-copy
   ``ray.get`` per task — NOT re-shipped per batch): per block, explode,
   ``index_in`` against the vocab, gather per-token log-probs, and a
   cumsum-difference segment sum per document (empty docs get exact 0 —
   ``np.add.reduceat`` mis-handles empty segments, the cumsum form
   doesn't). A document's tokens live in its one row, so per-doc sums
   are block-complete; no exchange.

**Fixed-point determinism**: per-token log-prob is
``floor(ln(count/T) * 1e6)`` (out-of-vocabulary tokens:
``floor(ln(0.5/T) * 1e6)``) — identical float64 inputs on both sides,
then int64 sums; the DuckDB oracle reproduces the scores bit-exactly
(same discipline as ``stages/bm25``).

No reference analogue (single-document engine); the quality-model member
of the curation family next to the heuristic gate
(``textstats.quality_filter``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE
from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.bm25 import corpus_scalars
from pypdfium2_ray.stages.topk import topk

I64 = pa.int64()


def unigram_vocab(ds, vocab_size: int, text_col: str = "text",
                  num_partitions: int | None = None):
    """Top-``vocab_size`` (term, count) rows by (count desc, term asc)."""
    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], WS_RE)
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = la.flatten()
        return pa.table({"term": flat.filter(pc.not_equal(flat, ""))})

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        keys=["term"], specs={"c": (None, "count")},
        num_partitions=num_partitions)
    return topk(counts, ["c", "term"], vocab_size, descending=[True, False])


def lm_score(ds, vocab_size: int = 50, doc_col: str = "doc_id",
             text_col: str = "text", num_partitions: int | None = None):
    """Dataset[(doc_id, n_tokens, logp_micro)] — int64 fixed-point sum of
    per-token unigram log-probs (micro-scaled), OOV smoothed at 0.5/T."""
    import ray
    n_docs, total_tok = corpus_scalars(ds, text_col)
    if total_tok == 0:
        raise ValueError("lm_score: empty corpus")
    vocab = unigram_vocab(ds, vocab_size, text_col, num_partitions) \
        .take_all()
    terms = pa.array([r["term"] for r in vocab], pa.string())
    logp = np.array([int(np.floor(np.log(r["c"] / total_tok) * 1e6))
                     for r in vocab], dtype=np.int64)
    oov = int(np.floor(np.log(0.5 / total_tok) * 1e6))
    vocab_ref = ray.put((terms, logp))

    def score(t: pa.Table) -> pa.Table:
        vterms, vlogp = ray.get(vocab_ref)
        toks = pc.split_pattern_regex(t[text_col], WS_RE)
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = la.flatten()
        keep = pc.not_equal(flat, "")
        # per-row boundaries over the KEPT tokens: cumulative kept counts
        kept_np = keep.to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy()
        kept_cum = np.concatenate(
            [[0], np.cumsum(kept_np.astype(np.int64))])
        starts, ends = kept_cum[offs[:-1]], kept_cum[offs[1:]]
        codes = pc.fill_null(
            pc.index_in(flat.filter(keep), value_set=vterms),
            -1).to_numpy(zero_copy_only=False)
        tok_lp = np.where(codes < 0, oov,
                          vlogp[np.where(codes < 0, 0, codes)])
        cum = np.concatenate([[0], np.cumsum(tok_lp)])
        return pa.table({
            "doc_id": pc.cast(t[doc_col], I64),
            "n_tokens": pa.array(ends - starts, I64),
            "logp_micro": pa.array(cum[ends] - cum[starts], I64)})

    return ds.map_batches(score, batch_format="pyarrow")
