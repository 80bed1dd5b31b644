"""Deterministic synthetic layout model.

The reference gets char/line geometry from PDFium's layout of a real PDF.
For HTML payloads there is no intrinsic geometry, so the engine defines a
fixed monospace grid (the docmodel spec). Everything downstream —
charboxes (``textpage.py:196-221`` analogue), rects (``textpage.py:224-238``),
bounded-rect queries (``textpage.py:52-85``), index-at-pos
(``textpage.py:174-193``) — is a pure function of this grid, so results are
byte/bit-reproducible across machines, batch boundaries and actor counts.

Grid (PDF canvas units, 1/72 in, origin bottom-left as in the reference,
``matrix.py:13-39``):

- page size 595 x 842 (A4, like the reference's ``tests/resources/text.pdf``)
- left margin 57.6; first line's top edge at y=782
- line height 15 (the full line cell = the "rect" height)
- char advance 7.2 (12pt monospace)
- tight charbox: the line cell inset by 2 vertically
  (``get_charbox(loose=False)``); loose charbox: the full line cell
  (``get_charbox(loose=True)`` — "entire font bounds")
- generated line-break chars (CR, LF — PDFium outputs CRLF line breaks,
  ``textpage.py:24-26``) get zero-width boxes at the line end
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LayoutParams:
    page_width: float = 595.0
    page_height: float = 842.0
    margin_left: float = 57.6
    first_line_top: float = 782.0
    line_height: float = 15.0
    char_width: float = 7.2
    tight_inset: float = 2.0
    #: auto-pagination: max text lines per page when the document has no
    #: explicit page breaks (skew guard: one 100 MB blob still yields
    #: bounded-size pages)
    max_lines_per_page: int = 48

    def line_top(self, line_idx: int) -> float:
        return self.first_line_top - line_idx * self.line_height

    def line_bottom(self, line_idx: int) -> float:
        return self.line_top(line_idx) - self.line_height

    def char_x(self, col: int) -> float:
        return self.margin_left + col * self.char_width


DEFAULT_LAYOUT = LayoutParams()
