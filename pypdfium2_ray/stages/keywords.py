"""Per-document keyword extraction by tf/df rank (the tf-idf family).

Keyword extraction — "the k terms most characteristic of each doc" —
is the per-document counterpart of BM25 retrieval: a training-data
pipeline uses it for topic tagging, mixture accounting and cluster
labeling (Salton & Buckley, "Term-weighting approaches in automatic
text retrieval", IP&M 1988 — public literature).

Scoring is the RATIONAL form ``tf / df``: within one document the
classical ``tf · log(N/df)`` and ``tf / df`` need not order terms
identically, so this operator is defined (engine AND oracle) as
tf/df-rank — chosen because the score is one IEEE-double division of
two int64s, which DuckDB reproduces bit-for-bit, whereas any
``log``-weighted variant puts libm in the oracle gate (the
containment-verify convention).  Ties break by term, so each doc's
top-``k`` set is unique.

Distributed shape, three pre-combined/ids+small-strings exchanges:

1. per-block vectorized tf — Arrow regex split / flatten / C++
   group-count on ``(doc_id, word)``; a document is one row in one
   block, so block-local tf counts are already FINAL (no tf exchange);
2. df — every ``(doc, word)`` row counts once per word: ONE
   pre-combined count exchange (vocab-sized after combine);
3. df joined back onto the tf rows: ONE word-keyed repartition join
   (``stages/exchange.lookup_join``);
4. per-doc top-k: ``stages/topk.grouped_topk`` on ``doc_id`` — local
   partial bound then ONE doc exchange, vectorized sort + Cython
   ``groupby.head``.

No reference analogue (pypdfium2 is single-document); retrieval-tier
sibling of ``stages/bm25`` / ``stages/invindex``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.exchange import lookup_join
from pypdfium2_ray.stages.topk import grouped_topk

I64 = pa.int64()
_WS = r"[ \t\r\n\f\v]+"


def _tf_block(id_col: str, text_col: str):
    """Per-block FINAL (doc_id, word, tf): regex split -> repeat ids by
    list length -> drop empty boundary strings -> C++ group count."""
    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        lists = pc.split_pattern_regex(texts, _WS)
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            pc.cast(t[id_col], I64).to_numpy(zero_copy_only=False), n)
        flat = pc.list_flatten(lists)
        tbl = pa.table({"doc_id": pa.array(ids, I64), "word": flat})
        tbl = tbl.filter(pc.not_equal(tbl["word"], ""))
        g = tbl.group_by(["doc_id", "word"],
                         use_threads=False).aggregate([("word", "count")])
        return pa.table({"doc_id": g["doc_id"], "word": g["word"],
                         "tf": pc.cast(g["word_count"], I64)})
    return fn


def doc_keywords(ds, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3, num_partitions: int | None = None):
    """Dataset[(doc_id, word, tf, df)] — each doc's top-``k`` terms by
    (tf/df DESC, word ASC); see module docstring."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tf = ds.map_batches(_tf_block(id_col, text_col),
                        batch_format="pyarrow")
    df = grouped_aggregate(
        tf.map_batches(lambda t: t.select(["word"]),
                       batch_format="pyarrow"),
        keys=["word"], specs={"df": (None, "count")},
        num_partitions=num_partitions)
    joined = lookup_join(
        target=tf,
        target_cols={"doc_id": I64, "word": pa.string(), "tf": I64},
        source=df, source_key="word", key_col="word",
        payload_cols={"df": I64}, source_payload={"df": "df"},
        num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(t["tf"], pa.float64()),
                      pc.cast(t["df"], pa.float64()))
        return t.append_column("__score", s)

    top = grouped_topk(
        joined.map_batches(score, batch_format="pyarrow"),
        keys=["doc_id"], order_cols=["__score", "word"], k=k,
        descending=[True, False], num_partitions=num_partitions)
    return top.map_batches(lambda t: t.drop_columns(["__score"]),
                           batch_format="pyarrow")
