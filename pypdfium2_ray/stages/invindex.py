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


def explode_doc_token_positions(t: pa.Table, doc_col: str = "doc_id",
                                text_col: str = "text") -> pa.Table:
    """One ``(doc_id, term, pos)`` row per token occurrence, ``pos``
    being the token's 0-based index within the doc's EMPTY-FILTERED
    token sequence (matching the SQL twins' ``list_filter`` indexing —
    doubled/leading whitespace does not create phantom positions).
    Fully vectorized: offsets arithmetic + one run-rebuild over the
    keep mask, no Python per row."""
    import numpy as np
    toks = pc.split_pattern_regex(t[text_col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    offs = la.offsets.to_numpy()
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(len(la), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_kept = doc_idx[keep]
    # position within the filtered per-doc run: global arange minus the
    # first kept index of each doc's run (docs arrive flat-ordered)
    if len(doc_kept):
        starts = np.flatnonzero(np.diff(doc_kept, prepend=doc_kept[0] - 1))
        run_lens = np.diff(np.append(starts, len(doc_kept)))
        pos = np.arange(len(doc_kept), dtype=np.int64) - np.repeat(
            starts, run_lens)
    else:
        pos = np.zeros(0, np.int64)
    docs = pc.take(pc.cast(t[doc_col], pa.int64()), pa.array(doc_kept))
    return pa.table({"doc_id": docs.combine_chunks() if isinstance(
        docs, pa.ChunkedArray) else docs,
        "term": flat.filter(pa.array(keep)),
        "pos": pa.array(pos, pa.int64())})


def positional_postings(ds, doc_col: str = "doc_id",
                        text_col: str = "text",
                        num_partitions: int | None = None):
    """The positional-index artifact: ``(term, doc_id, pos)`` rows
    hash-partitioned BY TERM (one exchange) — a doc's postings for two
    different terms live in different partitions, exactly the layout a
    serialized inverted index has.  :func:`phrase_match` consumes this
    (or any postings table of unknown partitioning)."""
    rows = ds.select_columns([doc_col, text_col]).map_batches(
        lambda t: explode_doc_token_positions(t, doc_col, text_col),
        batch_size=None, batch_format="pyarrow")
    return partition_map(rows, ["term"], lambda t: t,
                         num_partitions=num_partitions)


def phrase_match(postings, phrase: list[str],
                 num_partitions: int | None = None):
    """Exact phrase query answered FROM POSTINGS ALONE — the
    index-side positional intersection (the classic IR phrase-query
    join; Manning/Raghavan/Schutze IIR ch.2 is the public textbook
    form): token ``j`` of the phrase must occur at ``pos = start + j``.

    Shape: per block, postings rows filter to the phrase's terms (the
    tiny term set is a plain captured constant — only matching rows
    leave the block) and emit ``(doc_id, adj = pos - j, j)`` per phrase
    slot ``j`` the term fills (repeated phrase terms emit one row per
    slot); ONE exchange on ``(doc_id, adj)``; the per-partition kernel
    is a single vectorized group-count — a group holds ``len(phrase)``
    rows iff every slot matched, because ``(doc_id, adj, j)`` rows are
    unique by construction (a doc position holds exactly one term).

    Returns ``(doc_id, pos)`` match-start rows.  Phrase terms must be
    non-empty (the tokenizer never emits empty terms)."""
    import numpy as np
    k = len(phrase)
    if k == 0 or any(not w for w in phrase):
        raise ValueError("phrase must be non-empty words")
    slots: dict[str, list[int]] = {}
    for j, w in enumerate(phrase):
        slots.setdefault(w, []).append(j)
    terms = list(slots)

    def emit(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["term"], value_set=pa.array(terms))
        t = t.filter(m)
        docs = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = pc.cast(t["pos"], pa.int64()).to_numpy(zero_copy_only=False)
        out_d, out_a, out_j = [], [], []
        for term, js in slots.items():
            sel = pc.equal(t["term"], term).to_numpy(zero_copy_only=False)
            for j in js:
                out_d.append(docs[sel])
                out_a.append(pos[sel] - j)
                out_j.append(np.full(int(sel.sum()), j, np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, np.int64))
        return pa.table({"doc_id": pa.array(cat(out_d), pa.int64()),
                         "adj": pa.array(cat(out_a), pa.int64()),
                         "j": pa.array(cat(out_j), pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id", "adj"],
                       use_threads=False).aggregate([("j", "count")])
        g = g.filter(pc.and_(pc.equal(g["j_count"], k),
                             pc.greater_equal(g["adj"], 0)))
        return pa.table({"doc_id": g["doc_id"], "pos": g["adj"]})

    rows = postings.map_batches(emit, batch_format="pyarrow")
    return partition_map(rows, ["doc_id", "adj"], kernel,
                         num_partitions=num_partitions)


def boolean_search(ds, all_of: list[str], none_of: list[str] = (),
                   doc_col: str = "doc_id", text_col: str = "text"):
    """Dataset of ``(doc_id,)`` — docs containing EVERY term in
    ``all_of`` and NO term in ``none_of`` (conjunctive boolean
    retrieval with negation, the other classic IR query next to
    :func:`phrase_match`).

    Because a document is row-contained, this needs NO exchange at
    all: each block tokenizes, filters to the query terms (``pc.is_in``
    against the tiny term list), distincts (doc, term) and counts
    positive/negative hits per doc with pyarrow ``group_by`` — a pure
    streaming map, embarrassingly parallel at any corpus size."""
    if not all_of:
        raise ValueError("all_of must name at least one term "
                         "(pure-negation scans the whole corpus)")
    pos = pa.array(sorted(set(all_of)), pa.string())
    qset = pa.array(sorted(set(all_of) | set(none_of)), pa.string())
    n_pos = len(pos)

    def match(t: pa.Table) -> pa.Table:
        pairs = explode_doc_tokens(t, doc_col, text_col)
        pairs = pairs.filter(pc.is_in(pairs["term"], value_set=qset))
        pairs = pairs.group_by(["doc_id", "term"],
                               use_threads=False).aggregate([])
        is_pos = pc.cast(pc.is_in(pairs["term"], value_set=pos),
                         pa.int64())
        g = pa.table({"doc_id": pairs["doc_id"], "is_pos": is_pos}) \
            .group_by(["doc_id"], use_threads=False) \
            .aggregate([("is_pos", "sum"), ("is_pos", "count")])
        keep = pc.and_(pc.equal(g["is_pos_sum"], n_pos),
                       pc.equal(g["is_pos_count"], n_pos))
        return g.filter(keep).select(["doc_id"])

    return ds.select_columns([doc_col, text_col]).map_batches(
        match, batch_size=None, batch_format="pyarrow")


def compressed_posting_sizes(ds, doc_col: str = "doc_id",
                             text_col: str = "text",
                             num_partitions: int | None = None):
    """Dataset of ``(term, df, n_bytes)`` — the LEB128 gap-compressed
    size of each term's posting list (the IR-textbook index-compression
    accounting: sorted distinct doc ids -> first id + deltas -> varint
    bytes, ``functions/varint``).

    The kernel ENCODES for real, vectorized across the whole partition:
    gaps for every term's postings are computed in one lexsorted pass
    (run-start rows keep their absolute id, the rest take the delta),
    ONE ``varint_encode`` call over the concatenated gap array produces
    the actual buffer, and per-term byte counts are a bincount over the
    returned widths — the buffer length is asserted against the width
    sum, so the reported sizes are the bytes a shard writer would emit,
    not an analytic estimate. The SQL twin computes the same widths via
    the lag-gap + threshold-CASE formula (identical for all values
    < 2^56, far above any doc id here). Same ONE term exchange as
    :func:`build_inverted_index`."""
    import pandas as pd

    from pypdfium2_ray.functions.varint import varint_encode

    def explode(t: pa.Table) -> pa.Table:
        pairs = explode_doc_tokens(t, doc_col, text_col)
        return pairs.group_by(["doc_id", "term"],
                              use_threads=False).aggregate([])

    pairs = ds.select_columns([doc_col, text_col]).map_batches(
        explode, batch_size=None, batch_format="pyarrow")

    def kernel(t: pa.Table) -> pa.Table:
        t = t.group_by(["term", "doc_id"], use_threads=False).aggregate([])
        t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        if t.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(t["term"].to_pandas(), sort=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        first = np.empty(len(doc), dtype=bool)
        first[0] = True
        first[1:] = codes[1:] != codes[:-1]
        gaps = np.where(first, doc, doc - np.roll(doc, 1))
        buf, widths = varint_encode(gaps.astype(np.uint64))
        assert len(buf) == int(widths.sum())     # real bytes, not a model
        df_counts = np.bincount(codes)
        n_bytes = np.bincount(codes, weights=widths).astype(np.int64)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "df": pa.array(df_counts, pa.int64()),
                         "n_bytes": pa.array(n_bytes, pa.int64())})

    return partition_map(pairs, ["term"], kernel,
                         num_partitions=num_partitions)
