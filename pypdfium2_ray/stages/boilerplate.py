"""Per-source boilerplate LINE stripping — the rewrite tier of the
template family.

``stages/cdc.template_chunks`` *detects* per-source boilerplate;
this stage *removes* it and reassembles clean text: any line occurring
in at least ``frac_num/frac_den`` of a source's documents (and at least
``min_docs`` of them) is dropped from every document of that source and
the survivors rejoined in order — the nav-bar / footer / cookie-banner
scrub a crawl cleaner runs between extraction and dedup (CCNet, Wenzek
et al. LREC 2020 deduplicate repeated paragraphs per shard; here the
unit is the line, the scope the source host, and the result is
deterministic and SQL-twinnable).

Reference anchor: the reference's extracted text is line-framed
(`/root/reference/src/pypdfium2/_helpers/textpage.py` get_text_range) —
this stage consumes exactly that framing downstream of extraction.

Distributed shape — two passes, each paying ONE hash exchange on
*group_col*:

1. **census**: per-block line explode (vectorized ``split_pattern``),
   md5 once per DISTINCT line via dictionary encode, pre-combined to
   distinct ``(group, line_md5, n_docs)`` partials with the sentinel-row
   denominator trick shared with the CDC template rollup
   (``cdc._tpl_partial`` / ``_tpl_final`` — a document lives in exactly
   one block, so distinct-doc partials sum exactly); one group-keyed
   exchange finalizes the per-source template-line set.
2. **rewrite**: full doc rows and the (small) template-line set are
   null-padded to one schema, tagged, unioned and exchanged ONCE on
   *group_col*; the per-partition kernel splits lines, tests membership
   against the local ``group\\x00md5`` key set (one vectorized
   ``is_in``), and rebuilds each doc with offset arithmetic +
   ``binary_join`` — no per-doc Python.

Costs at 10^12 rows: the text payload crosses the wire once (pass 2);
pass 1 moves only pre-combined id/md5/count rows. The input LINEAGE
executes twice (census + rewrite read the same upstream) — feed a
materialized/checkpointed table, not an expensive unmaterialized
pipeline, or the upstream cost doubles.

Partitioning assumption (same contract as ``template_chunks``): one
source's documents fit one partition. Salt a pathological mega-host
upstream — the template set is keyed by source only, so replicating its
rows per salt preserves correctness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.cdc import _tpl_final, _tpl_partial
from pypdfium2_ray.stages.exchange import partition_map

#: line present in >= 1/5 of the source's docs => boilerplate
DEFAULT_FRAC = (1, 5)


def _md5_per_line(flat: pa.Array) -> pa.Array:
    """md5 hex per element, computed once per DISTINCT value via
    dictionary encode (the hash_sample discipline: per-value md5 is
    inherent to the hash; the Python loop runs over distinct lines
    only, not occurrences)."""
    if len(flat) == 0:
        return pa.array([], pa.string())
    d = flat.dictionary_encode()
    md5s = pa.array(
        [hashlib.md5(v.encode()).hexdigest()
         for v in d.dictionary.to_pylist()], pa.string())
    return pc.take(md5s, d.indices)


def _explode_lines(t: pa.Table, text_col: str):
    """(flat line Array, per-line doc index int64, per-doc line counts)
    for a block of non-null-text docs. split_pattern('') == [''] — an
    empty doc is one empty line, matching DuckDB string_split."""
    texts = t[text_col].combine_chunks()
    lines = pc.split_pattern(texts, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lens = pc.list_value_length(lines).to_numpy().astype(np.int64)
    flat = pc.list_flatten(lines)
    idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    return flat, idx, lens


def line_rows(ds, id_col: str = "doc_id", text_col: str = "text",
              group_col: str = "source"):
    """Dataset[(doc_id, line_md5, group)] — one row per line occurrence.
    Pure per-block map, zero exchanges; null-text docs are skipped."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "line_md5": pa.array([], pa.string()),
                             group_col: pa.array([], pa.string())})
        flat, idx, _ = _explode_lines(t, text_col)
        take = pa.array(idx)
        return pa.table({
            "doc_id": pc.take(pc.cast(t[id_col], pa.int64())
                              .combine_chunks(), take),
            "line_md5": _md5_per_line(flat),
            group_col: pc.take(pc.cast(t[group_col], pa.string())
                               .combine_chunks(), take)})

    return ds.map_batches(fn, batch_format="pyarrow")


def template_lines(ds, id_col: str = "doc_id", text_col: str = "text",
                   group_col: str = "source",
                   frac_num: int = DEFAULT_FRAC[0],
                   frac_den: int = DEFAULT_FRAC[1], min_docs: int = 2,
                   num_partitions: int | None = None):
    """Per-source template-line set: Dataset[(group, line_md5, n_docs,
    src_docs)] where ``n_docs * frac_den >= src_docs * frac_num`` and
    ``n_docs >= min_docs`` (exact integers; the denominator counts the
    source's non-null-text docs via sentinel rows on the SAME exchange)."""
    rows = line_rows(ds, id_col=id_col, text_col=text_col,
                     group_col=group_col)
    partials = rows.map_batches(_tpl_partial(group_col, "line_md5"),
                                batch_format="pyarrow")
    return partition_map(partials, [group_col],
                         _tpl_final(group_col, frac_num, frac_den,
                                    min_docs, "line_md5"),
                         num_partitions=num_partitions)


def repeated_lines(ds, id_col: str = "doc_id", text_col: str = "text",
                   min_count: int = 10,
                   num_partitions: int | None = None):
    """Corpus-GLOBAL repeated-line census: Dataset[(line_md5, n_docs)]
    for every line present in >= ``min_count`` distinct documents —
    the CCNet-style repeated-paragraph detector with no per-source
    scoping. Per-block pre-combine to distinct (line_md5, docs)
    partials, ONE line_md5 exchange. Output size is bounded by
    ``total_line_occurrences / min_count`` (a heavy-hitter set), which
    is what makes the broadcast rewrite tier
    (:func:`strip_repeated_lines`) legal."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        if t.num_rows == 0:
            return pa.table({"line_md5": pa.array([], pa.string()),
                             "docs": pa.array([], pa.int64())})
        flat, idx, _ = _explode_lines(t, text_col)
        lt = pa.table({"line_md5": _md5_per_line(flat),
                       "doc": pa.array(idx)})
        dd = (lt.group_by(["line_md5", "doc"], use_threads=False)
              .aggregate([])
              .group_by(["line_md5"], use_threads=False)
              .aggregate([([], "count_all")]))
        return pa.table({"line_md5": dd["line_md5"],
                         "docs": pc.cast(dd["count_all"], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"line_md5": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        g = t.group_by(["line_md5"],
                       use_threads=False).aggregate([("docs", "sum")])
        n = pc.cast(g["docs_sum"], pa.int64())
        out = pa.table({"line_md5": g["line_md5"], "n_docs": n})
        return out.filter(pc.greater_equal(n, min_count))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, ["line_md5"], final,
                         num_partitions=num_partitions)


def strip_repeated_lines(ds, id_col: str = "doc_id",
                         text_col: str = "text", min_count: int = 10,
                         max_broadcast: int = 5_000_000,
                         num_partitions: int | None = None):
    """Corpus-global repeated-line scrub: every line occurring in >=
    ``min_count`` distinct docs ANYWHERE is removed from every doc and
    the text reassembled — Dataset[(doc_id, clean_text, n_dropped)].

    Distributed shape differs from the per-source
    :func:`strip_boilerplate` on purpose: with no group key, the
    template set cannot co-partition with the docs, but it IS a
    heavy-hitter set (|set| <= total_line_occurrences / min_count), so
    it is broadcast ONCE (``ray.put``, plasma-local reads) and the
    rewrite is a pure per-block map — the text payload NEVER crosses the
    wire; the only exchange in the whole operator is the census's
    pre-combined md5 rows. ``max_broadcast`` is the loud ceiling: a set
    beyond it means ``min_count`` is too low for the corpus (the
    strip_boilerplate exchange shape is the fallback).

    The input lineage executes twice (census + rewrite) — feed a
    materialized/checkpointed table, as with strip_boilerplate."""
    import ray
    tpl = repeated_lines(ds, id_col=id_col, text_col=text_col,
                         min_count=min_count,
                         num_partitions=num_partitions).materialize()
    n_tpl = tpl.count()
    if n_tpl > max_broadcast:
        raise ValueError(
            f"repeated-line set has {n_tpl} entries > max_broadcast="
            f"{max_broadcast}: raise min_count or use the per-source "
            "strip_boilerplate exchange shape")
    md5s = pa.concat_arrays([
        b["line_md5"].combine_chunks()
        for b in tpl.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows] or [pa.array([], pa.string())])
    tpl_ref = ray.put(md5s)

    def rewrite(t: pa.Table) -> pa.Table:
        tset = ray.get(tpl_ref)                  # plasma-local, zero-copy
        t = t.filter(pc.is_valid(t[text_col]))
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "n_dropped": pa.array([], pa.int64())})
        flat, idx, lens = _explode_lines(t, text_col)
        if len(tset) and len(flat):
            keep = np.logical_not(
                pc.is_in(_md5_per_line(flat), value_set=tset)
                .to_numpy(zero_copy_only=False))
        else:
            keep = np.ones(len(flat), dtype=bool)
        kept = (np.bincount(idx[keep], minlength=n).astype(np.int64)
                if len(idx) else np.zeros(n, np.int64))
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(kept, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(pa.array(keep)))
        return pa.table({
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "clean_text": pc.binary_join(lists, "\n"),
            "n_dropped": pa.array(lens - kept, pa.int64())})

    return ds.map_batches(rewrite, batch_format="pyarrow")


def strip_boilerplate(ds, id_col: str = "doc_id", text_col: str = "text",
                      group_col: str = "source",
                      frac_num: int = DEFAULT_FRAC[0],
                      frac_den: int = DEFAULT_FRAC[1], min_docs: int = 2,
                      num_partitions: int | None = None):
    """Dataset[(doc_id, clean_text, n_dropped)] — every non-null-text doc,
    its per-source template lines removed and the rest rejoined with
    ``\\n`` in original order (a doc that was ALL boilerplate comes back
    as ``''``, never disappears). ``n_dropped`` counts removed lines.

    NOTE ``ds`` is consumed twice (census + rewrite) — see the module
    docstring's lineage warning."""
    tpl = template_lines(ds, id_col=id_col, text_col=text_col,
                         group_col=group_col, frac_num=frac_num,
                         frac_den=frac_den, min_docs=min_docs,
                         num_partitions=num_partitions)

    def pad_docs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        n = t.num_rows
        return pa.table({
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "__text": pc.cast(t[text_col], pa.string()),
            group_col: pc.cast(t[group_col], pa.string()),
            "line_md5": pa.nulls(n, pa.string()),
            "__side": pa.array(np.zeros(n, np.int8))})

    def pad_tpl(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": pa.nulls(n, pa.int64()),
            "__text": pa.nulls(n, pa.string()),
            group_col: pc.cast(t[group_col], pa.string()),
            "line_md5": pc.cast(t["line_md5"], pa.string()),
            "__side": pa.array(np.ones(n, np.int8))})

    tagged = ds.map_batches(pad_docs, batch_format="pyarrow").union(
        tpl.map_batches(pad_tpl, batch_format="pyarrow"))

    def kernel(t: pa.Table) -> pa.Table:
        side = t["__side"]
        docs = t.filter(pc.equal(side, 0))
        tplp = t.filter(pc.equal(side, 1))
        if docs.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "n_dropped": pa.array([], pa.int64())})
        flat, idx, lens = _explode_lines(docs, "__text")
        n = docs.num_rows
        if tplp.num_rows and len(flat):
            # last arg is the separator: group + "\x00" + md5
            key = pc.binary_join_element_wise(
                pc.take(docs[group_col].combine_chunks(), pa.array(idx)),
                _md5_per_line(flat), "\x00")
            tkey = pc.binary_join_element_wise(
                tplp[group_col].combine_chunks(),
                tplp["line_md5"].combine_chunks(), "\x00")
            keep = np.logical_not(
                pc.is_in(key, value_set=tkey)
                .to_numpy(zero_copy_only=False))
        else:
            keep = np.ones(len(flat), dtype=bool)
        kept = (np.bincount(idx[keep], minlength=n).astype(np.int64)
                if len(idx) else np.zeros(n, np.int64))
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(kept, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(pa.array(keep)))
        return pa.table({
            "doc_id": docs["doc_id"],
            "clean_text": pc.binary_join(lists, "\n"),
            "n_dropped": pa.array(lens - kept, pa.int64())})

    return partition_map(tagged, [group_col], kernel,
                         num_partitions=num_partitions)
