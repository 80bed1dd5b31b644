"""Any-alignment duplicated-span detection — the ExactSubstr shape.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL'22 — public paper) deduplicate verbatim substrings of >= N tokens
ANYWHERE in the corpus via a suffix array.  The distributable
reformulation here detects the same spans through sliding windows: a
duplicated substring of >= ``window`` tokens is exactly a RUN of
duplicated ``window``-token sliding grams, so (1) census every sliding
gram, (2) keep grams occurring >= ``min_count`` times corpus-wide
(within-doc repetition counts — self-plagiarized boilerplate is
duplication too, matching the suffix-array semantics), (3) merge each
doc's hit windows into maximal spans.  Unlike ``stages/dedup.span_dedup``
(FIXED non-overlapping windows — alignment-sensitive), the sliding grams
catch duplicates at ANY offset.

Distributed shape (the ``strip_repeated_lines`` heavy-hitter discipline):

- census: per-block pre-combined ``(gram_md5, cnt)`` partials, ONE
  exchange — the only exchange in the operator;
- the duplicated-gram set is bounded (|set| <= total_gram_occurrences /
  min_count) and broadcasts ONCE via ``ray.put`` (plasma-local reads);
  ``max_broadcast`` is the loud ceiling — beyond it, fall back to the
  lookup_join-on-gram + doc-keyed-exchange shape (raise ``min_count``
  first: a set that big usually means the window is too short for the
  corpus's token diversity);
- the span pass is then a pure per-block map: docs never span blocks, so
  hit-window interval merging is block-local; doc text never crosses the
  wire.

The input lineage executes twice (census + span pass) — feed a
materialized/checkpointed table, as with strip_boilerplate.

Token positions index the EMPTY-FILTERED whitespace token sequence (the
``invindex.explode_doc_token_positions`` / SQL ``list_filter``
convention); spans are ``[s_tok, e_tok)`` half-open token intervals,
merged when overlapping OR touching.  Gram identity is the md5 hex of
the space-joined window (``boilerplate._md5_per_line`` — md5 once per
DISTINCT gram via dictionary encode), reproducible in SQL as
``md5(a[i] || ' ' || ... )``.

No reference analogue (single-document engine); dedup-family sibling of
span_dedup / minhash / ppjoin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE
from pypdfium2_ray.stages.boilerplate import _md5_per_line
from pypdfium2_ray.stages.exchange import partition_map

I64 = pa.int64()


def _gram_rows(t: pa.Table, id_col: str, text_col: str, window: int):
    """Vectorized sliding-gram build for one block: returns
    ``(doc_ids: np.int64[n_win], pos: np.int64[n_win], gram: pa.Array)``
    — one row per ``window``-token sliding window of every doc.  The
    only loops are numpy kernels; overlapping windows are built by one
    2-D index gather + uniform-offset ListArray + ``binary_join``."""
    t = t.filter(pc.is_valid(t[text_col]))
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             pa.array([], pa.string()))
    if t.num_rows == 0:
        return empty
    toks = pc.split_pattern_regex(t[text_col], WS_RE)
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    lens = np.diff(la.offsets.to_numpy())
    doc_idx = np.repeat(np.arange(len(la), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_k = flat.filter(pa.array(keep))
    doc_kept = doc_idx[keep]
    if len(doc_kept) == 0:
        return empty
    starts = np.flatnonzero(np.diff(doc_kept, prepend=doc_kept[0] - 1))
    run_lens = np.diff(np.append(starts, len(doc_kept)))
    n_win = np.maximum(run_lens - window + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return empty
    cum = np.zeros(len(n_win), np.int64)
    np.cumsum(n_win[:-1], out=cum[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, n_win)
    win_start = np.repeat(starts, n_win) + pos
    gather = (win_start[:, None] + np.arange(window)).reshape(-1)
    gath = flat_k.take(pa.array(gather))
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(total + 1, dtype=np.int64) * window, pa.int32()),
        gath)
    gram = pc.binary_join(lists, " ")
    ids = pc.cast(t[id_col], I64).to_numpy(zero_copy_only=False)
    doc_ids = ids[doc_kept[starts]].repeat(n_win)
    return doc_ids, pos, gram


def dup_gram_census(ds, id_col: str = "doc_id", text_col: str = "text",
                    window: int = 5, min_count: int = 2,
                    num_partitions: int | None = None):
    """Corpus-global duplicated-gram census: Dataset[(gram_md5,
    n_occ)] for every sliding ``window``-token gram occurring >=
    ``min_count`` times (occurrences, not distinct docs).  Per-block
    pre-combined count partials, ONE exchange."""

    def partial(t: pa.Table) -> pa.Table:
        _ids, _pos, gram = _gram_rows(t, id_col, text_col, window)
        g = (pa.table({"gram_md5": _md5_per_line(gram)})
             .group_by(["gram_md5"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"gram_md5": g["gram_md5"],
                         "cnt": pc.cast(g["count_all"], I64)})

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["gram_md5"],
                       use_threads=False).aggregate([("cnt", "sum")])
        n = pc.cast(g["cnt_sum"], I64)
        out = pa.table({"gram_md5": g["gram_md5"], "n_occ": n})
        return out.filter(pc.greater_equal(n, min_count))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, ["gram_md5"], final,
                         num_partitions=num_partitions)


def dup_spans(ds, id_col: str = "doc_id", text_col: str = "text",
              window: int = 5, min_count: int = 2,
              max_broadcast: int = 5_000_000,
              num_partitions: int | None = None):
    """Maximal duplicated spans per doc: Dataset[(doc_id, s_tok, e_tok,
    n_windows)] — every maximal run of sliding ``window``-token grams
    each occurring >= ``min_count`` times corpus-wide, merged over
    overlap/touch; ``n_windows`` = hit windows inside the span.  See
    module docstring for semantics and the distributed shape."""
    import ray
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    dup = dup_gram_census(ds, id_col=id_col, text_col=text_col,
                          window=window, min_count=min_count,
                          num_partitions=num_partitions).materialize()
    n_dup = dup.count()
    if n_dup > max_broadcast:
        raise ValueError(
            f"duplicated-gram set has {n_dup} entries > max_broadcast="
            f"{max_broadcast}: raise min_count/window, or use the "
            "lookup_join-on-gram + doc-keyed-exchange fallback shape")
    md5s = pa.concat_arrays([
        b["gram_md5"].combine_chunks()
        for b in dup.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows] or [pa.array([], pa.string())])
    dup_ref = ray.put(md5s)

    def spans(t: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)                 # plasma-local, zero-copy
        out_schema = {"doc_id": pa.array([], I64),
                      "s_tok": pa.array([], I64),
                      "e_tok": pa.array([], I64),
                      "n_windows": pa.array([], I64)}
        ids, pos, gram = _gram_rows(t, id_col, text_col, window)
        if len(ids) == 0 or len(dset) == 0:
            return pa.table(out_schema)
        hit = pc.is_in(_md5_per_line(gram),
                       value_set=dset).to_numpy(zero_copy_only=False)
        ids, pos = ids[hit], pos[hit]
        if len(ids) == 0:
            return pa.table(out_schema)
        order = np.lexsort((pos, ids))          # windows unique per (doc,pos)
        ids, s = ids[order], pos[order]
        e = s + window
        # per-doc interval merge (the stages/intervals island idiom):
        # e is monotone within a doc here (uniform window), so the
        # running max IS e and a new island starts when s > prev e
        new_doc = np.ones(len(ids), dtype=bool)
        new_doc[1:] = ids[1:] != ids[:-1]
        new_isl = new_doc.copy()
        if len(ids) > 1:
            new_isl[1:] |= s[1:] > e[:-1]
        isl_start = np.flatnonzero(new_isl)
        isl_len = np.diff(np.append(isl_start, len(ids)))
        isl_end = isl_start + isl_len - 1
        return pa.table({
            "doc_id": pa.array(ids[isl_start], I64),
            "s_tok": pa.array(s[isl_start], I64),
            "e_tok": pa.array(e[isl_end], I64),
            "n_windows": pa.array(isl_len.astype(np.int64), I64)})

    return ds.map_batches(spans, batch_format="pyarrow")
