"""Vocabulary build with cumulative coverage — the tokenizer-prep pass.

Training a tokenizer (BPE/unigram) starts from a corpus token census
ranked by frequency, with the cumulative-coverage curve deciding the
vocab size cut ("top 32k tokens cover 97.1% of occurrences"). This
stage produces exactly that table: ``(rank, token, cnt, cum_cnt,
total_cnt)`` with rank ordered by ``(cnt DESC, token ASC)`` — a total
order, so ranks and cumulative sums are deterministic — and coverage as
EXACT integer pairs (``cum_cnt / total_cnt``), never a float.

Distributed shape: per-block ``Counter`` pre-combine (one row per
distinct token per block), ONE token exchange summing partials, then a
``min_count`` cut. The cut output is a heavy-hitter set (<=
total_occurrences / min_count rows — the strip_repeated bound), so the
ordered scan (rank + running sum, inherently sequential) legally runs
on ONE partition; ``max_vocab_scan`` is the loud ceiling. The
grand-total denominator sums the SAME census partials (nothing rescans
the corpus), counting every occurrence INCLUDING below-cut tokens.

Tokens are the repo-standard ASCII-non-ws runs (``functions.text``
convention, SQL twin ``regexp_extract_all(text, '[^ \\t\\r\\n\\f\\v]+')``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

_TOKEN_PAT = r"[^ \t\r\n\f\v]+"


def token_census(ds, text_col: str = "text",
                 num_partitions: int | None = None):
    """Dataset[(token, cnt)] — exact global token counts, one pre-combined
    exchange."""
    import re
    tok_re = re.compile(_TOKEN_PAT)

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            if x:
                c.update(tok_re.findall(x))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, pa.string()),
                         "cnt": pa.array([c[k] for k in toks], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = t.group_by(["token"], use_threads=False).aggregate(
            [("cnt", "sum")])
        return pa.table({"token": g["token"],
                         "cnt": pc.cast(g["cnt_sum"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, ["token"], final,
                         num_partitions=num_partitions)


def vocab_coverage(ds, text_col: str = "text", min_count: int = 2,
                   max_vocab_scan: int = 10_000_000,
                   num_partitions: int | None = None):
    """Dataset[(rank, token, cnt, cum_cnt, total_cnt)] — frequency-ranked
    vocabulary with exact integer cumulative coverage. See module
    docstring for the one-partition ordered-scan justification."""
    census = token_census(ds, text_col=text_col,
                          num_partitions=num_partitions).materialize()

    def block_total(t: pa.Table) -> pa.Table:
        v = pc.sum(t["cnt"]).as_py() if t.num_rows else 0
        return pa.table({"t": pa.array([v or 0], pa.int64())})

    # iter_batches may coalesce the 1-row-per-block partials into one
    # batch — sum every row, not row 0
    total = sum((pc.sum(b["t"]).as_py() or 0) for b in census.map_batches(
        block_total, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow") if b.num_rows)

    kept = census.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
        batch_format="pyarrow")
    n_kept = kept.count()
    if n_kept > max_vocab_scan:
        raise ValueError(
            f"vocab after min_count={min_count} has {n_kept} tokens > "
            f"max_vocab_scan={max_vocab_scan}: raise min_count (the "
            "ordered coverage scan is single-partition by design)")

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rank": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "cum_cnt": pa.array([], pa.int64()),
                             "total_cnt": pa.array([], pa.int64())})
        df = t.select(["token", "cnt"]).to_pandas()
        df = df.sort_values(["cnt", "token"], ascending=[False, True],
                            kind="mergesort", ignore_index=True)
        cnt = df["cnt"].to_numpy()
        return pa.table({
            "rank": pa.array(np.arange(1, len(cnt) + 1), pa.int64()),
            "token": pa.array(df["token"].to_numpy(), pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "cum_cnt": pa.array(np.cumsum(cnt), pa.int64()),
            "total_cnt": pa.array(np.full(len(cnt), total), pa.int64())})

    return kept.repartition(1).map_batches(scan, batch_size=None,
                                           batch_format="pyarrow")


def oov_counts(ds, vocab_k: int = 20, text_col: str = "text",
               id_col: str = "doc_id",
               num_partitions: int | None = None):
    """Per-doc out-of-vocabulary accounting ``(doc_id, n_tokens,
    n_oov)`` against the corpus's own top-``vocab_k`` token vocabulary
    (count DESC, token ASC ranks) — the tokenizer-sizing signal next to
    :func:`vocab_coverage`'s global curve: how much of EACH document a
    k-token vocabulary fails to cover.

    Two phases: the exact census (ONE token exchange, pre-combined),
    then the top-k selected with the partial-bound selector and
    broadcast once (``ray.put`` — k tokens, a few KB at any corpus
    size); the per-doc count is a pure block map (a doc is
    row-contained): vectorized explode + ``is_in`` + one pyarrow
    group_by. Zero-token docs emit nothing, matching the twin's
    tok-join semantics."""
    import ray

    from pypdfium2_ray.stages.topk import topk
    census = token_census(ds, text_col=text_col,
                          num_partitions=num_partitions)
    top = topk(census, ["cnt", "token"], vocab_k,
               descending=[True, False])
    vocab = pa.concat_tables(
        list(top.iter_batches(batch_format="pyarrow", batch_size=None)))
    vocab_ref = ray.put(vocab["token"].combine_chunks())

    from pypdfium2_ray.stages.invindex import explode_doc_tokens

    def per_doc(t: pa.Table) -> pa.Table:
        import ray as _ray
        vset = _ray.get(vocab_ref)
        pairs = explode_doc_tokens(t, id_col, text_col)
        oov = pc.cast(pc.invert(pc.is_in(pairs["term"],
                                         value_set=vset)), pa.int64())
        g = pa.table({"doc_id": pairs["doc_id"], "oov": oov}) \
            .group_by(["doc_id"], use_threads=False) \
            .aggregate([("oov", "sum"), ("oov", "count")])
        return pa.table({"doc_id": g["doc_id"],
                         "n_tokens": pc.cast(g["oov_count"], pa.int64()),
                         "n_oov": pc.cast(g["oov_sum"], pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        per_doc, batch_size=None, batch_format="pyarrow")
