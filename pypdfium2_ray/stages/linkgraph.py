"""Hyperlink extraction — the web-graph edge producer (anchor scan over
raw crawl payloads), feeding the graph tier (``stages/pagerank``,
``stages/components``).

A crawl pipeline extracts out-links for frontier scheduling, link-graph
ranking and anchor-text signals.  This stage scans the RAW html payload
(nav/footer included — a link graph wants every edge, unlike the
boilerplate-stripped text tier) with one compiled regex per document:
per-document Python is the honest cost class here, identical to the
parser stage itself, and runs inside the same streaming ``map_batches``
over zero-copy Arrow batches with no exchange (output rows are
``(doc_id, href, anchor)`` only).

**Deterministic skip set**: payload gating reuses
``docmodel.htmldoc.decode_payload`` — the exact sniff/decrypt gate of
``parse_document`` (encryption envelope, null-byte, strict UTF-8) — so
the rows this stage skips are bit-identically the rows the parser types
as errors, and a SQL oracle over the synthesis predicates is exact.

The anchor pattern is RE2-compatible (no backtracking constructs):
``<a\\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>`` — href attribute double-
quoted, PLAIN-TEXT anchors only (an anchor with nested markup does not
match; documented scope, identical on both the engine and the DuckDB
``regexp_extract_all`` sides).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

#: shared with the SQL twin (DuckDB regexp_extract_all, same RE2 source)
LINK_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
_LINK_RE = re.compile(LINK_RE)


def extract_links(ds, doc_col: str = "doc_id", html_col: str = "html",
                  password: str | None = None):
    """Dataset[(doc_id:int64, href:string, anchor:string)] — one row per
    anchor occurrence, document order preserved within a doc. Rows whose
    payload fails the parser's decode gate emit nothing (the parser
    types them as error rows; counters live in the extraction tier)."""
    from pypdfium2_ray.docmodel.htmldoc import decode_payload

    def scan(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        hrefs: list[str] = []
        anchors: list[str] = []
        did = pc.cast(t[doc_col], pa.int64()).to_pylist()
        for i, payload in zip(did, t[html_col].to_pylist()):
            if payload is None:
                continue
            text, _err = decode_payload(bytes(payload), password)
            if text is None:
                continue
            for m in _LINK_RE.finditer(text):
                ids.append(i)
                hrefs.append(m.group(1))
                anchors.append(m.group(2))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "href": pa.array(hrefs, pa.string()),
                         "anchor": pa.array(anchors, pa.string())})

    return ds.map_batches(scan, batch_format="pyarrow")


def links_to_edges(links, n_nodes: int, href_prefix: str = "/page/"):
    """Parse intra-site page links into graph edges: hrefs of the form
    ``{href_prefix}{int}`` with a target id < ``n_nodes`` become
    ``(src, dst)`` rows; everything else (offsite/nav chrome links,
    dangling targets) is dropped — vectorized extract + filter, no
    Python per row."""
    pat = "^" + re.escape(href_prefix) + r"(?P<page>[0-9]+)$"

    def to_edges(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["href"], pat)
        ok = pc.is_valid(ex)
        dst = pc.cast(pc.struct_field(ex, "page"), pa.int64())
        keep = pc.and_(ok, pc.less(dst, n_nodes))
        keep = pc.fill_null(keep, False)
        return pa.table({"src": pc.cast(t["doc_id"], pa.int64()).filter(keep),
                         "dst": dst.filter(keep)})

    return links.map_batches(to_edges, batch_format="pyarrow")


def anchor_text_index(links, href_col: str = "href",
                      anchor_col: str = "anchor",
                      num_partitions: int | None = None):
    """Anchor-text aggregation per TARGET — the web-graph signal a search
    indexer attaches to the page being linked TO: for every href,
    ``n_refs`` (total in-links), ``n_anchors`` (distinct anchor texts)
    and ``anchors`` (the distinct texts, sorted, '|'-joined — an ordered
    deterministic rendering, ``string_agg(... ORDER BY)`` on the SQL
    side).

    Shape: per-block pre-combine collapses to distinct ``(href, anchor,
    partial count)`` rows BEFORE the one href exchange (hot chrome links
    like '/' shrink by the block duplication factor); the per-partition
    kernel is fully vectorized — run-length merges via ``reduceat`` and
    the per-target join via ``ListArray`` + ``pc.binary_join`` (no
    per-group Python, same discipline as the inverted-index builder).
    """
    import numpy as np

    from pypdfium2_ray.stages.exchange import partition_map

    def pre(t: pa.Table) -> pa.Table:
        g = pa.table({href_col: t[href_col], anchor_col: t[anchor_col]}) \
            .group_by([href_col, anchor_col]).aggregate([([], "count_all")])
        return g.rename_columns([href_col, anchor_col, "cnt"])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({href_col: pa.array([], pa.string()),
                             "n_refs": pa.array([], pa.int64()),
                             "n_anchors": pa.array([], pa.int64()),
                             "anchors": pa.array([], pa.string())})
        t = t.sort_by([(href_col, "ascending"), (anchor_col, "ascending")])
        href = np.asarray(t[href_col].to_numpy(zero_copy_only=False))
        anch = np.asarray(t[anchor_col].to_numpy(zero_copy_only=False))
        cnt = t["cnt"].to_numpy()
        # level 1: merge partial counts of equal (href, anchor) pairs
        new_pair = np.ones(len(href), dtype=bool)
        new_pair[1:] = (href[1:] != href[:-1]) | (anch[1:] != anch[:-1])
        ps = np.flatnonzero(new_pair)
        pair_cnt = np.add.reduceat(cnt, ps)
        href_d, anch_d = href[ps], anch[ps]
        # level 2: per-href runs over the deduped pairs
        new_href = np.ones(len(ps), dtype=bool)
        new_href[1:] = href_d[1:] != href_d[:-1]
        hs = np.flatnonzero(new_href)
        n_anchors = np.diff(np.append(hs, len(ps)))
        n_refs = np.add.reduceat(pair_cnt, hs)
        offsets = pa.array(np.append(hs, len(ps)).astype(np.int32))
        anchors_list = pa.ListArray.from_arrays(
            offsets, pa.array(anch_d.tolist(), pa.string()))
        return pa.table({
            href_col: pa.array(href_d[hs].tolist(), pa.string()),
            "n_refs": pa.array(n_refs, pa.int64()),
            "n_anchors": pa.array(n_anchors, pa.int64()),
            "anchors": pc.binary_join(anchors_list, "|"),
        })

    combined = links.map_batches(pre, batch_format="pyarrow")
    return partition_map(combined, [href_col], kernel,
                         num_partitions=num_partitions)
