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
