"""HTML ``<table>`` extraction — DOM tables to relational cell rows.

The north rule's extraction tier includes DOM-heuristic structured
content; the reference's analogue is structured pageobject traversal
(`/root/reference/src/pypdfium2/_helpers/pageobjects.py` — typed object
iteration with per-object geometry). Here the structure is the HTML
table grid: every page yields ``(doc_id, table_idx, row_idx, col_idx,
is_header, cell)`` rows — the shape a training-data pipeline feeds to
table-QA / table-to-text corpora builders.

Pure per-block map, ZERO exchanges: each document parses independently
in a warm-state task (one parser class per worker process). The payload
gate is the shared :func:`docmodel.htmldoc.decode_payload`, so
malformed / encrypted rows are skipped by EXACTLY the same predicate as
the flagship extraction and the link scanners (a page that cannot be
parsed produces no cells — the SQL twins exclude the same deterministic
error slice).

Grid semantics (deterministic, documented rather than clever):

- tables are numbered in document order of their ``<table>`` open tags
  (nested tables get their own index; their text does NOT leak into the
  enclosing cell);
- rows by ``<tr>`` in table order; a cell before any ``<tr>`` opens an
  implicit row 0;
- cells by ``<td>``/``<th>`` position within their row (``is_header`` =
  ``<th>``); rowspan/colspan attributes are NOT expanded (grid position
  is source order, the lossless base representation);
- an unclosed cell/row/table is closed implicitly at the next sibling
  open or at document end (the HTMLParser-recovery convention the main
  docmodel parser also follows);
- cell text is ASCII-whitespace-collapsed and trimmed, the same
  normalization as the textpage line framing.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


class _TableState:
    __slots__ = ("tidx", "row", "col", "in_cell", "is_header", "buf")

    def __init__(self, tidx: int):
        self.tidx = tidx
        self.row = -1
        self.col = -1
        self.in_cell = False
        self.is_header = False
        self.buf: list[str] = []


class _TableCells(HTMLParser):
    """SAX walk collecting cell rows; one instance per document parse."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack: list[_TableState] = []
        self.next_tidx = 0
        self.cells: list[tuple[int, int, int, bool, str]] = []

    def _flush_cell(self):
        st = self.stack[-1]
        if not st.in_cell:
            return
        text = _WS_RE.sub(" ", "".join(st.buf)).strip(" ")
        self.cells.append((st.tidx, st.row, st.col, st.is_header, text))
        st.in_cell = False
        st.buf = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            if self.stack:
                self._flush_cell()
            st = _TableState(self.next_tidx)
            self.next_tidx += 1
            self.stack.append(st)
            return
        if not self.stack:
            return
        st = self.stack[-1]
        if tag == "tr":
            self._flush_cell()
            st.row += 1
            st.col = -1
        elif tag in ("td", "th"):
            self._flush_cell()
            if st.row < 0:
                st.row = 0          # implicit row for a tr-less cell
            st.col += 1
            st.in_cell = True
            st.is_header = tag == "th"

    def handle_endtag(self, tag):
        if not self.stack:
            return
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag == "table":
            self._flush_cell()
            self.stack.pop()

    def handle_data(self, data):
        if self.stack and self.stack[-1].in_cell:
            self.stack[-1].buf.append(data)

    def finish(self):
        while self.stack:
            self._flush_cell()
            self.stack.pop()
        return self.cells


def parse_tables(text: str) -> list[tuple[int, int, int, bool, str]]:
    """All table cells of one HTML document:
    ``[(table_idx, row_idx, col_idx, is_header, cell), ...]``."""
    p = _TableCells()
    p.feed(text)
    p.close()
    return p.finish()


class _ExtractTables:
    """Actor: cc_pages batch -> cell rows. Skips rows whose payload fails
    the shared decode gate (same predicate as the flagship parse)."""

    def __init__(self, id_col: str, html_col: str,
                 password: str | None = None):
        self.id_col = id_col
        self.html_col = html_col
        self.password = password

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.htmldoc import decode_payload
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.html_col].to_pylist()
        out = {"doc_id": [], "table_idx": [], "row_idx": [],
               "col_idx": [], "is_header": [], "cell": []}
        for did, data in zip(ids, payloads):
            text, err = decode_payload(data or b"", self.password)
            if err:
                continue
            for tidx, r, c, hdr, cell in parse_tables(text):
                out["doc_id"].append(did)
                out["table_idx"].append(tidx)
                out["row_idx"].append(r)
                out["col_idx"].append(c)
                out["is_header"].append(hdr)
                out["cell"].append(cell)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "table_idx": pa.array(out["table_idx"], pa.int64()),
            "row_idx": pa.array(out["row_idx"], pa.int64()),
            "col_idx": pa.array(out["col_idx"], pa.int64()),
            "is_header": pa.array(out["is_header"], pa.bool_()),
            "cell": pa.array(out["cell"], pa.string())})


def extract_tables(ds, id_col: str = "doc_id", html_col: str = "html",
                   password: str | None = None):
    """Dataset[(doc_id, table_idx, row_idx, col_idx, is_header, cell)] —
    one row per table cell, document-deterministic order within a doc.
    Pure per-block map, zero exchanges."""
    from pypdfium2_ray.stages.warm import warm_task
    return ds.map_batches(
        warm_task(_ExtractTables, id_col=id_col, html_col=html_col,
                  password=password),
        batch_format="pyarrow")
