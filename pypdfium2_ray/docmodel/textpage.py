"""TextPage — the char-array view of one page's text.

Reimplements the observable semantics of the reference's ``PdfTextPage``
(``/root/reference/src/pypdfium2/_helpers/textpage.py``) as pure functions of
``(lines, LayoutParams)``:

- ``text`` / ``get_text_range``  -> ``textpage.py:104-146`` (CRLF line breaks
  per ``textpage.py:24-26``; count=-1 = all remaining)
- ``get_text_bounded``           -> ``textpage.py:52-85`` (None defaults to the
  page bbox, cached there at ``textpage.py:48-50``; here the bbox is a pure
  attribute)
- ``count_chars``                -> ``textpage.py:149-157``
- ``get_charbox(loose)``         -> ``textpage.py:196-221``
- ``count_rects`` / ``get_rect`` -> ``textpage.py:160-171, 224-238``; the
  reference's hidden call-order state ("count_rects() must be called before
  get_rect()", ``textpage.py:229``) is deliberately removed: rects are a pure
  function of the char array, and ``get_rect(i)`` always indexes the full
  rect list.
- ``get_index``                  -> ``textpage.py:174-193``
- ``search_all``                 -> ``textpage.py:255-334``; the stateful
  ``PdfTextSearcher`` cursor becomes "return every occurrence" (a pure
  function); ``PdfTextSearcher`` is still provided as a thin cursor over that
  list for API parity.

Char-index space vs text-index space: the reference documents that PDFium may
insert/exclude chars (``textpage.py:88-101, 129-139``). In this model the two
views coincide by construction (generated CRLF chars ARE part of the char
array, as in PDFium's common case), but the API keeps both accessors so the
contract is explicit.
"""

from __future__ import annotations

import re
from functools import cached_property

from pypdfium2_ray.docmodel.layout import DEFAULT_LAYOUT, LayoutParams

_CRLF = "\r\n"


class TextPage:
    """Immutable text view of one page: ``lines`` are the visual text lines
    in reading order (no embedded newlines), geometry per ``LayoutParams``."""

    def __init__(self, lines: list[str], layout: LayoutParams = DEFAULT_LAYOUT,
                 page_width: float | None = None, page_height: float | None = None,
                 bbox: tuple[float, float, float, float] | None = None):
        assert all("\n" not in ln and "\r" not in ln for ln in lines)
        self.lines = lines
        self.layout = layout
        self.width = layout.page_width if page_width is None else page_width
        self.height = layout.page_height if page_height is None else page_height
        #: page bbox (l, b, r, t) in native coords — the default boundary of
        #: bounded extraction; (0, 0, w, h) unless the owning Page passes
        #: its media∩crop box (page.py:176-185)
        self._bbox = bbox

    # ---- text ------------------------------------------------------------

    @cached_property
    def text(self) -> str:
        """Full page text in reading order, CRLF line breaks (textpage.py:24-26)."""
        return _CRLF.join(self.lines)

    def count_chars(self) -> int:
        """Number of chars in the page's char array, incl. generated CRLF
        chars (textpage.py:149-157)."""
        return len(self.text)

    def get_text_range(self, index: int = 0, count: int = -1) -> str:
        """Text slice by char range (textpage.py:104-146). count=-1 = all
        remaining. In this model char-index space == text-index space."""
        if count == -1:
            count = self.count_chars() - index
        if count <= 0 or index >= self.count_chars():
            return ""
        return self.text[index:index + count]

    # ---- char metadata ----------------------------------------------------

    @cached_property
    def _char_lines(self) -> list[tuple[int, int, bool]]:
        """Per char: (line_idx, col, generated). Generated = CR/LF chars."""
        out: list[tuple[int, int, bool]] = []
        for li, ln in enumerate(self.lines):
            for col in range(len(ln)):
                out.append((li, col, False))
            if li < len(self.lines) - 1:
                end = len(ln)
                out.append((li, end, True))   # \r
                out.append((li, end, True))   # \n
        return out

    @cached_property
    def _line_starts(self) -> list[int]:
        """Char index of the first char of each line."""
        starts, pos = [], 0
        for ln in self.lines:
            starts.append(pos)
            pos += len(ln) + 2
        return starts

    def is_generated(self, index: int) -> bool:
        """True if the char at *index* is a generated line-break char (CR/LF).
        These have no real glyph; the PDFium analogue is a char with a
        degenerate box excluded from bounded queries."""
        return self._char_lines[index][2]

    def get_charbox(self, index: int, loose: bool = False) -> tuple[float, float, float, float]:
        """(l, b, r, t) box of one char (textpage.py:196-221). ``loose`` is
        the full line cell ("entire font bounds"); tight is inset vertically.
        Generated CRLF chars get a zero-width box at the line end."""
        li, col, generated = self._char_lines[index]
        lay = self.layout
        t, b = lay.line_top(li), lay.line_bottom(li)
        x = lay.char_x(col)
        if generated:
            return (x, b, x, t)
        if loose:
            return (x, b, x + lay.char_width, t)
        return (x, b + lay.tight_inset, x + lay.char_width, t - lay.tight_inset)

    # ---- rects (line fragments) -------------------------------------------

    @cached_property
    def rects(self) -> list[tuple[float, float, float, float]]:
        """One rect per non-empty line: the full line cell spanning the
        line's chars (textpage.py:224-238 analogue, derived purely — no
        count_rects() call-order precondition)."""
        out = []
        lay = self.layout
        for li, ln in enumerate(self.lines):
            if not ln:
                continue
            out.append((lay.char_x(0), lay.line_bottom(li),
                        lay.char_x(len(ln)), lay.line_top(li)))
        return out

    @cached_property
    def _rect_char_ranges(self) -> list[tuple[int, int]]:
        """(start_char, end_char) half-open char range of each rect."""
        out = []
        for li, ln in enumerate(self.lines):
            if not ln:
                continue
            s = self._line_starts[li]
            out.append((s, s + len(ln)))
        return out

    def count_rects(self, index: int = 0, count: int = -1) -> int:
        """Number of rects intersecting the char range (textpage.py:160-171).
        A rect counts if any of its (non-generated) chars is in range."""
        if count == -1:
            count = self.count_chars() - index
        lo, hi = index, index + count
        return sum(1 for (s, e) in self._rect_char_ranges if s < hi and e > lo)

    def get_rect(self, index: int) -> tuple[float, float, float, float]:
        """Rect at *index* into the page's full rect list (textpage.py:224-238;
        pure — no prior count_rects() needed, unlike textpage.py:229)."""
        return self.rects[index]

    def rect_text(self, index: int) -> str:
        """Text content of one rect (== its line's text)."""
        s, e = self._rect_char_ranges[index]
        return self.text[s:e]

    # ---- bounded-rect extraction ------------------------------------------

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        """Page bbox (l, b, r, t) — the default boundary of
        ``get_text_bounded`` (textpage.py:48-50, page.py:176-185)."""
        if self._bbox is not None:
            return self._bbox
        return (0.0, 0.0, self.width, self.height)

    def get_text_bounded(self, left=None, bottom=None, right=None, top=None) -> str:
        """Chars whose tight-box center lies in the rect, in index order;
        CRLF inserted between included chars on different lines
        (textpage.py:52-85). With default (page-bbox) boundaries this equals
        ``get_text_range()`` — asserted by the reference's
        ``tests/test_textpage.py:26-29``."""
        l = self.bbox[0] if left is None else left
        b = self.bbox[1] if bottom is None else bottom
        r = self.bbox[2] if right is None else right
        t = self.bbox[3] if top is None else top

        lay = self.layout
        parts: list[str] = []
        prev_line = None
        for li, ln in enumerate(self.lines):
            lt, lb = lay.line_top(li), lay.line_bottom(li)
            cy = (lb + lay.tight_inset + lt - lay.tight_inset) / 2.0
            if not (b <= cy <= t):
                continue
            # vectorizable column window: cols with center in [l, r]
            # center_x(col) = margin + col*w + w/2
            if not ln:
                continue
            lo_col = (l - lay.margin_left - lay.char_width / 2.0) / lay.char_width
            hi_col = (r - lay.margin_left - lay.char_width / 2.0) / lay.char_width
            c0 = max(0, _ceil(lo_col))
            c1 = min(len(ln) - 1, _floor(hi_col))
            if c0 > c1:
                continue
            if prev_line is not None and li != prev_line:
                parts.append(_CRLF)
            parts.append(ln[c0:c1 + 1])
            prev_line = li
        return "".join(parts)

    # ---- index at position -------------------------------------------------

    def get_index(self, x: float, y: float, x_tol: float, y_tol: float) -> int | None:
        """Char index at/near point (textpage.py:174-193): exact tight-box hit
        first, else nearest char whose tolerance-expanded tight box contains
        the point; None if no char qualifies. Generated CRLF chars are never
        returned."""
        best = None
        best_d = None
        for idx, (li, col, generated) in enumerate(self._char_lines):
            if generated:
                continue
            l, b, r, t = self.get_charbox(idx, loose=False)
            if l <= x <= r and b <= y <= t:
                return idx
            if (l - x_tol) <= x <= (r + x_tol) and (b - y_tol) <= y <= (t + y_tol):
                cx, cy = (l + r) / 2.0, (b + t) / 2.0
                d = (cx - x) ** 2 + (cy - y) ** 2
                if best_d is None or d < best_d:
                    best, best_d = idx, d
        return best

    # ---- search -------------------------------------------------------------

    def search_all(self, needle: str, index: int = 0, match_case: bool = False,
                   match_whole_word: bool = False, consecutive: bool = False) -> list[tuple[int, int]]:
        """All occurrences of *needle* from char *index* on, as
        (start_index, count) pairs — the pure form of the reference's
        stateful searcher (textpage.py:255-334). Flags:

        - match_case: exact case (default case-insensitive, FPDF_MATCHCASE)
        - match_whole_word: both neighbours must be non-word chars
          (FPDF_MATCHWHOLEWORD)
        - consecutive: overlapping matches allowed — advance by 1 instead of
          by match length (FPDF_CONSECUTIVE)
        """
        if len(needle) == 0:
            raise ValueError("Text length must be greater than 0.")
        hay = self.text
        if not match_case:
            hay, needle = hay.casefold(), needle.casefold()
        out: list[tuple[int, int]] = []
        pos = index
        n = len(needle)
        while True:
            hit = hay.find(needle, pos)
            if hit == -1:
                break
            ok = True
            if match_whole_word:
                before = hay[hit - 1] if hit > 0 else " "
                after = hay[hit + n] if hit + n < len(hay) else " "
                ok = not _is_word_char(before) and not _is_word_char(after)
            if ok:
                out.append((hit, n))
            pos = hit + 1 if (consecutive or not ok) else hit + n
        return out

    def search(self, needle: str, index: int = 0, match_case: bool = False,
               match_whole_word: bool = False, consecutive: bool = False) -> "TextSearcher":
        """API-parity cursor over :meth:`search_all` (textpage.py:286-292)."""
        return TextSearcher(self.search_all(
            needle, index=index, match_case=match_case,
            match_whole_word=match_whole_word, consecutive=consecutive))


class TextSearcher:
    """Cursor with get_next()/get_prev() over a precomputed occurrence list
    (reference ``PdfTextSearcher``, textpage.py:295-334). Pure state: an
    integer position into an immutable list."""

    def __init__(self, occurrences: list[tuple[int, int]]):
        self._occs = occurrences
        self._pos = -1  # index of last returned occurrence

    def get_next(self):
        if self._pos + 1 >= len(self._occs):
            return None
        self._pos += 1
        return self._occs[self._pos]

    def get_prev(self):
        # reference semantics: the occurrence BEFORE the last valid one
        if self._pos - 1 < 0:
            return None
        self._pos -= 1
        return self._occs[self._pos]


_WORD_RE = re.compile(r"\w")


def _is_word_char(ch: str) -> bool:
    return bool(_WORD_RE.match(ch))


def _ceil(v: float) -> int:
    iv = int(v)
    return iv if iv >= v else iv + 1


def _floor(v: float) -> int:
    iv = int(v)
    return iv if iv <= v else iv - 1
