"""From-scratch HTML -> Document parser (main-content extraction).

This is the engine's analogue of PDFium's document load + page/text layout:
``PdfDocument(bytes)`` -> ``FPDF_LoadMemDocument64`` (document.py:572-574)
becomes ``parse_document(html_bytes)`` over a Common-Crawl-style row's
``html:binary`` payload. Built on stdlib ``html.parser`` only (no lxml/bs4 in
this environment); all semantics below are the docmodel spec — deterministic,
so extracted text is byte-reproducible (the per-url invariant).

Extraction spec:

- **Decode**: payload must be valid UTF-8 and NUL-free, else the row fails
  with ``ERR_FORMAT`` (the analogue of PDFium's data-format load error,
  document.py:581-585). Empty payload -> ``ERR_FORMAT``.
- **Encryption convention** (stand-in for PDF password protection,
  document.py:567-568 / tests/test_opener.py:100-124): a payload starting
  with ``<!--ENCRYPTED:<salt>:<digest>-->`` requires ``password`` with
  ``digest == sha256(salt+password)[:16]``; wrong/missing password ->
  ``ERR_PASSWORD``. The remainder is XOR-stream-encrypted with
  ``sha256(salt|password|key)`` repeated. See :func:`encrypt_payload`.
- **Boilerplate strip**: ``script style nav header footer aside noscript
  template iframe svg form button select option object embed head`` subtrees
  contribute no text (``<head>`` still yields metadata; ``<nav data-toc>``
  still yields the outline). Elements with ``hidden`` or
  ``style="display:none"`` are skipped.
- **Main-content restriction**: if the document contains ``<main>`` (else
  ``<article>``) elements, only text inside them is kept — the DOM-heuristic
  boilerplate strip of the north_rule.
- **Lines**: block-level elements and ``<br>`` delimit lines; whitespace runs
  collapse to a single space; lines are stripped; empty lines are dropped.
  Line breaks in page text are CRLF (textpage.py:24-26).
- **Pages**: explicit ``<pb>`` elements break pages; without any, text flows
  at ``LayoutParams.max_lines_per_page`` lines/page. A well-formed document
  with no text has exactly one empty page (like ``tests/resources/empty.pdf``).
- **Spans**: per-line runs of uniform style; h1..h6 -> font size
  {24,18,16,14,13,12} + weight 700, b/strong -> weight 700, i/em -> italic,
  code/pre/kbd/samp/tt -> Courier (the ``PdfTextObj``/``PdfFont`` analogue,
  pageobjects.py:164-309).
- **TOC**: an explicit ``<nav data-toc>`` nested-list outline (items:
  ``<li data-page="N" id=... data-ref="#id">``) takes precedence; else the
  h1..h6 heading outline. Flattening is pre-order with a seen-set cycle guard
  and a max-depth cap + warnings (document.py:537-557).
- **Metadata**: ``<title>`` -> Title; ``<meta name=... content=...>`` for
  author/subject/keywords/creator/producer/creation-date/mod-date
  (the 8 fixed keys, document.py:321).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from pypdfium2_ray.docmodel.errors import ERR_FORMAT, ERR_PASSWORD
from pypdfium2_ray.docmodel.layout import DEFAULT_LAYOUT, LayoutParams
from pypdfium2_ray.docmodel.model import (
    Attachment, Document, FormField, Page, PageObject, Span, TocEntry,
)

# ---------------------------------------------------------------------------
# encryption convention

_ENC_RE = re.compile(rb"^<!--ENCRYPTED:([0-9a-f]{8}):([0-9a-f]{16})-->")


def _enc_digest(salt: str, password: str) -> str:
    return hashlib.sha256((salt + password).encode()).hexdigest()[:16]


def _enc_keystream(salt: str, password: str, n: int) -> bytes:
    key = hashlib.sha256(f"{salt}|{password}|key".encode()).digest()
    reps = n // len(key) + 1
    return (key * reps)[:n]


def _xor_bytes(data: bytes, keystream: bytes) -> bytes:
    """Vectorized XOR (numpy) — the per-byte genexpr is O(n) interpreter
    work, untenable when a deterministic fraction of a crawl corpus is
    encrypted."""
    import numpy as np
    a = np.frombuffer(data, np.uint8)
    b = np.frombuffer(keystream, np.uint8)
    return (a ^ b).tobytes()


def encrypt_payload(html: bytes, password: str, salt: str = "0f0f0f0f") -> bytes:
    """Produce an 'encrypted' payload per the docmodel convention."""
    header = f"<!--ENCRYPTED:{salt}:{_enc_digest(salt, password)}-->".encode()
    return header + _xor_bytes(html, _enc_keystream(salt, password, len(html)))


def _parse_data_uri(href: str) -> tuple[str, bytes]:
    """``data:[<mime>][;base64],<payload>`` -> (mime, bytes); ('' , b'') on
    anything unparsable (attachment data stays by-reference)."""
    import base64
    from urllib.parse import unquote_to_bytes
    if not href.startswith("data:"):
        return "", b""
    head, _, payload = href[5:].partition(",")
    if _ == "":
        return "", b""
    is_b64 = head.endswith(";base64")
    mime = head[:-7] if is_b64 else head
    try:
        data = base64.b64decode(payload, validate=True) if is_b64 \
            else unquote_to_bytes(payload)
    except Exception:
        return mime, b""
    return mime, data


# ---------------------------------------------------------------------------
# styles

@dataclass(frozen=True)
class _Style:
    font_size: float = 12.0
    font_family: str = "Helvetica"
    weight: int = 400
    italic: bool = False


_HEADING_SIZE = {"h1": 24.0, "h2": 18.0, "h3": 16.0, "h4": 14.0, "h5": 13.0, "h6": 12.0}

_SKIP_TAGS = frozenset(
    "script style nav header footer aside noscript template iframe svg form "
    "button select option object embed head".split())

_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr blockquote pre section "
    "article main hr dl dt dd figure figcaption address details summary "
    "center body html".split())

_VOID_TAGS = frozenset("br hr img meta link input pb area base col source track wbr".split())

_MONO_TAGS = frozenset("code pre kbd samp tt".split())
_BOLD_TAGS = frozenset("b strong".split())
_ITALIC_TAGS = frozenset("i em".split())

_META_NAME_TO_KEY = {
    "author": "Author", "subject": "Subject", "keywords": "Keywords",
    "creator": "Creator", "producer": "Producer",
    "creation-date": "CreationDate", "mod-date": "ModDate",
    "dcterms.created": "CreationDate", "dcterms.modified": "ModDate",
}

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_WS_SET = frozenset(" \t\r\n\f\v")


# ---------------------------------------------------------------------------
# outline (TOC) nodes

@dataclass
class _NavNode:
    title: str = ""
    page: int = 0
    node_id: str | None = None
    ref: str | None = None
    #: explicit level override (``<li data-level="N">``): lets a FLAT nav
    #: list express any pre-order level sequence — li nesting can only
    #: encode outlines whose first entry is level 0 and whose levels jump
    #: by at most +1, which a heading outline (h2 before any h1) violates.
    #: The serializer (docmodel/serialize) emits this for exact round-trips.
    level_attr: int | None = None
    #: collapsed initial state (``data-closed``) — signs get_count()
    closed: bool = False
    #: raw ``data-color`` attribute ("#rrggbb"); validated at flatten
    color_attr: str | None = None
    children: list["_NavNode"] = field(default_factory=list)


def _parse_bookmark_color(raw: str | None):
    """``#rrggbb`` -> float RGB triple in [0, 1]; None on anything else
    (the FPDFBookmark_GetColor not-ok path, document.py:703-714)."""
    if not raw or len(raw) != 7 or not raw.startswith("#"):
        return None
    try:
        return tuple(int(raw[i:i + 2], 16) / 255.0 for i in (1, 3, 5))
    except ValueError:
        return None


def _flatten_outline(roots: list[_NavNode], max_depth: int,
                     warnings: list[str]) -> list[TocEntry]:
    """Pre-order flatten with seen-set cycle guard and depth cap — the
    observable semantics of ``PdfDocument.get_toc`` (document.py:520-559:
    circular-reference set :543-550, depth cap + warning :553-557)."""
    by_id: dict[str, _NavNode] = {}

    def index(n: _NavNode):
        if n.node_id:
            by_id[n.node_id] = n
        for c in n.children:
            index(c)

    for r in roots:
        index(r)

    out: list[TocEntry] = []
    seen: set[int] = set()

    def walk(n: _NavNode, level: int):
        from pypdfium2_ray.docmodel.unsupported import (
            KIND_CIRCULAR_TOC, KIND_TOC_DEPTH, notify_unsupported)
        if id(n) in seen:
            warnings.append("circular bookmark reference detected")
            notify_unsupported(KIND_CIRCULAR_TOC, n.title or "")
            return
        seen.add(id(n))
        if level >= max_depth:
            warnings.append(f"maximum recursion depth {max_depth} reached")
            notify_unsupported(KIND_TOC_DEPTH, str(max_depth))
            return
        target = n
        if n.ref:
            ref_id = n.ref.lstrip("#")
            target = by_id.get(ref_id, n)
        n_children = 1 if (n.ref and target is not n) else len(target.children)
        out.append(TocEntry(
            level=n.level_attr if n.level_attr is not None else level,
            title=n.title, page_index=n.page, n_children=n_children,
            closed=n.closed, color=_parse_bookmark_color(n.color_attr)))
        if n.ref and target is not n:
            walk(target, level + 1)
            return
        for c in target.children:
            walk(c, level + 1)

    for r in roots:
        walk(r, 0)

    # explicit data-level entries carry no structural children; recompute
    # their n_children from the level sequence (immediate children = the
    # following level+1 entries before the next <=level entry — the same
    # rule as the heading outline)
    if any(getattr(r, "level_attr", None) is not None for r in roots):
        for i, e in enumerate(out):
            n = 0
            for j in range(i + 1, len(out)):
                if out[j].level <= e.level:
                    break
                if out[j].level == e.level + 1:
                    n += 1
            if n:
                e.n_children = n
    return out


# ---------------------------------------------------------------------------
# the parser

@dataclass
class _LineItem:
    kind: str                   # "line" | "break"
    text: str = ""
    spans: list[tuple[int, int, _Style]] = field(default_factory=list)
    in_main: bool = False
    heading_level: int | None = None
    dom_level: int = 0
    objects: list[PageObject] = field(default_factory=list)
    #: top-level container id (0 = bare body) — density-policy grouping
    segment: int = 0
    #: non-whitespace chars of this line that sit inside <a> anchors
    link_chars: int = 0


#: top-level containers that delimit density segments (nav/header/footer/
#: aside are already stripped wholesale as _SKIP_TAGS; main/article drive
#: the semantic policy)
_SEG_TAGS = frozenset("div section table ul ol".split())


class _HtmlToDoc(HTMLParser):

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.items: list[_LineItem] = []
        self.metadata: dict[str, str] = {}
        self.meta_tags: dict[str, str] = {}
        self.attachments: list[Attachment] = []
        self.warnings: list[str] = []
        self.has_main = False
        self.has_article = False
        self.explicit_break = False
        self.nav_roots: list[_NavNode] = []

        self._tag_stack: list[str] = []
        self.saw_form = False           # a <form> was present (stripped)
        # form-field collection (M25): the form SUBTREE is stripped from
        # the text flow, but its widgets are recorded for the formenv
        self.form_fields: list[dict] = []
        self._form_skip = False         # current skip subtree is a form
        self._ta: dict | None = None    # open <textarea> field
        self._sel: dict | None = None   # open <select> field
        self._sel_opts: list[tuple[str, bool]] = []
        self._opt: dict | None = None   # open <option> label capture
        self._skip_depth = 0            # >0: inside a stripped subtree
        self._head_depth = 0            # >0: inside <head> (metadata only)
        self._main_depth = 0
        self._article_depth = 0
        # density-policy segmentation state
        self._segment = 0               # last opened top-level container id
        self._seg_depth = 0             # >0: inside some _SEG_TAGS subtree
        self._a_depth = 0               # >0: inside an anchor
        self._link_pending = 0          # non-ws anchor chars of this line
        self._style_stack: list[_Style] = [_Style()]
        self._frags: list[tuple[str, _Style]] = []   # current line fragments
        self._pending_objects: list[PageObject] = []
        self._in_title = False
        self._title_parts: list[str] = []
        # nav-toc parsing
        self._nav_depth = 0
        self._nav_stack: list[_NavNode] = []
        self._nav_current: _NavNode | None = None

    # ---- helpers

    def _cur_style(self) -> _Style:
        return self._style_stack[-1]

    # ---- form-field collection (inside the stripped <form> subtree)

    def _form_field_start(self, tag: str, attrd: dict):
        pos = len(self.items)           # stream position -> page mapping
        name = attrd.get("name") or ""
        if tag == "input":
            typ = (attrd.get("type") or "text").lower()
            if typ == "hidden":
                return                  # no visible widget, no field
            if typ in ("checkbox", "radio"):
                value = (attrd.get("value") or "on")                     if "checked" in attrd else ""
            else:
                value = attrd.get("value") or ""
            self.form_fields.append(dict(name=name, type=typ, value=value,
                                         item_pos=pos))
        elif tag == "textarea":
            f = dict(name=name, type="textarea", value="", item_pos=pos)
            self.form_fields.append(f)
            self._ta = f
        elif tag == "select":
            f = dict(name=name, type="select", value="", item_pos=pos)
            self.form_fields.append(f)
            self._sel = f
            self._sel_opts = []
        elif tag == "option" and self._sel is not None:
            self._close_option()        # HTML allows omitted </option>
            self._opt = dict(label="", selected="selected" in attrd)
        elif tag == "button":
            self.form_fields.append(dict(name=name, type="button",
                                         value=attrd.get("value") or "",
                                         item_pos=pos))

    def _close_option(self):
        if self._opt is not None and self._sel is not None:
            self._sel_opts.append(
                (_WS_RE.sub(" ", self._opt["label"]).strip(),
                 self._opt["selected"]))
        self._opt = None

    def _form_field_end(self, tag: str):
        if tag == "textarea" and self._ta is not None:
            self._ta["value"] = _WS_RE.sub(" ", self._ta["value"]).strip()
            self._ta = None
        elif tag == "option":
            self._close_option()
        elif tag == "select" and self._sel is not None:
            self._close_option()
            chosen = next((lbl for lbl, sel in self._sel_opts if sel),
                          self._sel_opts[0][0] if self._sel_opts else "")
            self._sel["value"] = chosen
            self._sel = None
            self._sel_opts = []

    def _flush_line(self, heading: int | None = None):
        """Collapse whitespace across the pending fragments into one line;
        derive per-style spans from the collapsed char/style arrays.

        Fast path: when every fragment shares one style (the overwhelmingly
        common case), collapse with one ``_WS_RE.split`` per line (the SAME
        whitespace class as the slow path — str.split() would differ on
        Unicode whitespace like NBSP) and emit a single span. The per-char
        loop only runs for genuinely mixed-style lines (profiled: it was
        ~90% of total parse time before this split)."""
        if not self._frags and not self._pending_objects:
            self._link_pending = 0
            return
        frags = self._frags
        objects = self._pending_objects
        self._frags = []
        self._pending_objects = []
        link_chars = self._link_pending
        self._link_pending = 0
        segment = self._segment if self._seg_depth > 0 else 0

        single = True
        st0 = frags[0][1] if frags else None
        for _t, st in frags:
            if st is not st0 and st != st0:
                single = False
                break
        if single:
            raw = frags[0][0] if len(frags) == 1 else \
                "".join([t for t, _s in frags])
            # sub+strip changes nothing unless the line has a non-space
            # ws char, a double space, or a boundary space — C substring
            # scans are ~20x cheaper than the regex sub, and crawl text
            # fragments are usually already collapsed (measured ~100%)
            if ("  " in raw or "\t" in raw or "\n" in raw or "\r" in raw
                    or "\f" in raw or "\v" in raw
                    or raw[:1] == " " or raw[-1:] == " "):
                # one C-level sub+strip == " ".join(non-empty
                # _WS_RE.split): the pattern matches RUNS, so sub leaves
                # single spaces and strip(" ") removes the boundary ones
                text = _WS_RE.sub(" ", raw).strip(" ")
            else:
                text = raw
            if not text and not objects:
                return
            spans = [(0, len(text), st0)] if text else []
            self.items.append(_LineItem(
                kind="line", text=text, spans=spans,
                in_main=(self._main_depth > 0 or self._article_depth > 0),
                heading_level=heading, dom_level=len(self._tag_stack),
                objects=objects, segment=segment, link_chars=link_chars))
            return

        chars: list[str] = []
        styles: list[_Style] = []
        for txt, st in frags:
            for ch in txt:
                chars.append(ch)
                styles.append(st)
        # collapse whitespace runs -> single space; strip ends
        out_c: list[str] = []
        out_s: list[_Style] = []
        in_ws = True  # leading ws dropped
        for ch, st in zip(chars, styles):
            if ch in _WS_SET:
                if not in_ws:
                    out_c.append(" ")
                    out_s.append(st)
                in_ws = True
            else:
                out_c.append(ch)
                out_s.append(st)
                in_ws = False
        while out_c and out_c[-1] == " ":
            out_c.pop(); out_s.pop()
        text = "".join(out_c)
        if not text and not objects:
            return
        spans: list[tuple[int, int, _Style]] = []
        i = 0
        while i < len(out_s):
            j = i
            while j < len(out_s) and (out_s[j] is out_s[i] or out_s[j] == out_s[i]):
                j += 1
            spans.append((i, j, out_s[i]))
            i = j
        self.items.append(_LineItem(
            kind="line", text=text, spans=spans,
            in_main=(self._main_depth > 0 or self._article_depth > 0),
            heading_level=heading, dom_level=len(self._tag_stack),
            objects=objects, segment=segment, link_chars=link_chars))

    # ---- HTMLParser hooks

    def handle_starttag(self, tag, attrs):
        attrd = dict(attrs)
        is_void = tag in _VOID_TAGS

        if self._nav_depth > 0:
            self._nav_handle_start(tag, attrd, is_void)
            return

        if tag == "meta":
            # captured here (even inside the stripped <head>) so no second
            # parser pass is needed for metadata (document.py:308-337 keys)
            key = _META_NAME_TO_KEY.get((attrd.get("name") or "").lower())
            if key and attrd.get("content") is not None:
                self.meta_tags.setdefault(key, attrd["content"])
            return

        hidden = "hidden" in attrd or \
            ("display:none" in (attrd.get("style") or "").replace(" ", ""))

        if tag == "nav" and "data-toc" in attrd and self._skip_depth == 0:
            self._flush_line()
            self._nav_depth = 1
            return

        if tag == "title":
            # captured even inside the (stripped) <head> — it feeds metadata
            self._in_title = True
            return

        if self._skip_depth > 0:
            if self._form_skip:
                self._form_field_start(tag, attrd)
            if not is_void:
                self._skip_depth += 1
            return

        if tag in _SKIP_TAGS or hidden:
            if tag == "form":
                # the form SUBTREE stays out of the text flow, but its
                # widgets are collected for the formenv (init_forms /
                # page.flatten — document.py:159-228, page.py:328-346);
                # presence feeds get_formtype (document.py:222-228)
                self.saw_form = True
                self._form_skip = True
            if not is_void:
                self._skip_depth = 1
            return

        if tag == "a" and "download" in attrd:
            # embedded-file analogue (PdfAttachment, attachment.py:21-150):
            # <a download[=name] href="data:...">; anchor text still flows
            href = attrd.get("href") or ""
            mime, data = _parse_data_uri(href)
            name = attrd.get("download") or ""
            if not name:
                name = (href.rsplit("/", 1)[-1] or "attachment") \
                    if not href.startswith("data:") else "attachment"
            is_data = href.startswith("data:")
            if is_data and not data:
                # decode failure: keep the raw href so the payload stays
                # recoverable, and record a warning (error-rows discipline)
                self.warnings.append(f"attachment data decode failed: {name}")
                from pypdfium2_ray.docmodel.unsupported import (
                    KIND_ATTACHMENT_DECODE, notify_unsupported)
                notify_unsupported(KIND_ATTACHMENT_DECODE, name)
            params: dict[str, str] = {}
            raw_params = attrd.get("data-params")
            if raw_params:
                # serialize.py emits explicitly-set attachment params
                # (dates etc.) as a JSON data-params attribute; anything
                # unparsable is dropped silently (derived Size/CheckSum
                # re-compute from the data either way)
                import json
                try:
                    loaded = json.loads(raw_params)
                    if isinstance(loaded, dict):
                        params = {str(k): str(v) for k, v in loaded.items()}
                except Exception:
                    pass
            self.attachments.append(Attachment(
                name=name, data=data, mime=mime,
                src="" if (is_data and data) else href, params=params))
            # falls through: <a> otherwise behaves as a normal inline tag

        if tag == "pb":
            self._flush_line()
            self.explicit_break = True
            self.items.append(_LineItem(
                kind="break",
                segment=self._segment if self._seg_depth > 0 else 0))
            return
        if tag == "br":
            self._flush_line()
            return
        if tag == "img":
            try:
                w = int(attrd.get("width") or 0)
                h = int(attrd.get("height") or 0)
            except ValueError:
                w = h = 0
            self._pending_objects.append(PageObject(
                type="image", level=len(self._tag_stack), bounds=(0, 0, 0, 0),
                width=w, height=h, alt=attrd.get("alt") or "",
                src=attrd.get("src") or ""))
            return
        if is_void:
            return

        if tag in _BLOCK_TAGS:
            self._flush_line()

        st = self._cur_style()
        if tag in _HEADING_SIZE:
            st = _Style(_HEADING_SIZE[tag], st.font_family, 700, st.italic)
        elif tag in _BOLD_TAGS:
            st = _Style(st.font_size, st.font_family, 700, st.italic)
        elif tag in _ITALIC_TAGS:
            st = _Style(st.font_size, st.font_family, st.weight, True)
        elif tag in _MONO_TAGS:
            st = _Style(st.font_size, "Courier", st.weight, st.italic)
        self._style_stack.append(st)
        self._tag_stack.append(tag)

        if tag == "main":
            self.has_main = True
            self._main_depth += 1
        elif tag == "article":
            self.has_article = True
            self._article_depth += 1
        elif tag in _SEG_TAGS:
            if self._seg_depth == 0:
                self._segment += 1
            self._seg_depth += 1
        elif tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _VOID_TAGS:
            self.handle_starttag(tag, attrs)
        elif self._nav_depth == 0 and self._skip_depth == 0:
            # a self-closed non-void element contributes no content;
            # block tags still delimit the current line
            if tag in _BLOCK_TAGS:
                self._flush_line()

    def handle_endtag(self, tag):
        if self._nav_depth > 0:
            self._nav_handle_end(tag)
            return
        if tag == "title":
            self._in_title = False
            self.metadata.setdefault(
                "Title", _WS_RE.sub(" ", "".join(self._title_parts)).strip())
            return
        if self._skip_depth > 0:
            if self._form_skip:
                self._form_field_end(tag)
            if tag not in _VOID_TAGS:
                self._skip_depth -= 1
                if self._skip_depth == 0:
                    self._form_skip = False
                    self._ta = self._sel = self._opt = None
                    self._sel_opts = []
            return
        if tag in _VOID_TAGS:
            return
        if tag not in self._tag_stack:
            return
        # pop until the matching tag (tolerate misnesting)
        while self._tag_stack:
            top = self._tag_stack.pop()
            self._style_stack.pop()
            if top in _BLOCK_TAGS:
                self._flush_line(heading=_heading_no(top) if top == tag and top in _HEADING_SIZE else None)
            if top == "main":
                self._main_depth -= 1
            elif top == "article":
                self._article_depth -= 1
            elif top in _SEG_TAGS:
                # after the flush above: the container's own trailing line
                # still attributes to it
                self._seg_depth -= 1
            elif top == "a" and self._a_depth:
                self._a_depth -= 1
            if top == tag:
                break

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
            return
        if self._nav_depth > 0:
            if self._nav_current is not None:
                self._nav_current.title += data
            return
        if self._skip_depth > 0:
            if self._ta is not None:
                self._ta["value"] += data
            elif self._opt is not None:
                self._opt["label"] += data
            return
        if data:
            # heading text gets the heading style; record on flush
            self._frags.append((data, self._cur_style()))
            if self._a_depth:
                # per-char only on anchor text (boilerplate anchors are
                # short); non-ws counting is collapse-invariant
                self._link_pending += sum(
                    ch not in _WS_SET for ch in data)

    def handle_comment(self, data):
        pass

    # metadata from <meta> inside (skipped) head: html.parser still calls
    # handle_starttag for void tags before skip bookkeeping suppresses them —
    # we intercept here instead.
    def handle_decl(self, decl):
        pass

    # ---- nav-toc subtree

    def _nav_handle_start(self, tag, attrd, is_void):
        if tag == "li":
            node = _NavNode(node_id=attrd.get("id"), ref=attrd.get("data-ref"))
            try:
                node.page = int(attrd.get("data-page") or 0)
            except ValueError:
                node.page = 0
            if attrd.get("data-level") is not None:
                try:
                    node.level_attr = max(0, int(attrd["data-level"]))
                except ValueError:
                    pass
            # bookmark view state (document.py:693-714 analogues): a bare
            # or truthy data-closed collapses (html.parser reports a bare
            # attribute as value None, so presence is the in-test);
            # data-color carries #rrggbb
            node.closed = ("data-closed" in attrd
                           and attrd["data-closed"] != "0")
            node.color_attr = attrd.get("data-color")
            if self._nav_stack:
                self._nav_stack[-1].children.append(node)
            else:
                self.nav_roots.append(node)
            self._nav_stack.append(node)
            self._nav_current = node
        elif not is_void:
            self._nav_depth += 1

    def _nav_handle_end(self, tag):
        if tag == "li":
            if self._nav_stack:
                self._nav_stack.pop()
            self._nav_current = self._nav_stack[-1] if self._nav_stack else None
        elif tag == "nav":
            self._nav_depth -= 1
            if self._nav_depth == 0:
                self._nav_stack = []
                self._nav_current = None
        elif tag not in _VOID_TAGS:
            self._nav_depth -= 1


def _heading_no(tag: str) -> int | None:
    return int(tag[1]) if tag in _HEADING_SIZE else None


# ---------------------------------------------------------------------------
# public API

#: fast-lane tokenizer switch (tests force the stdlib path to crosscheck)
FAST_FEED_ENABLED = True

#: one token at '<': end tag | comment | declaration | start tag. The
#: grammar is a STRICT SUBSET of html.parser's tolerant one — anything it
#: doesn't match makes _fast_feed bail and the document re-parses on the
#: stdlib tokenizer, so acceptance implies byte-identical handler calls.
#: Quoted attr values may contain '>' but not '<' (stdlib allows both;
#: '<' falls to the bail lane). Unquoted values exclude '/' so the
#: self-close slash is never consumed by a value (see the glue check).
_FAST_TOKEN_RE = re.compile(r"""
    <(?:
        /\s*(?P<endname>[a-zA-Z][-a-zA-Z0-9]*)\s*>
      | (?P<comment>!--.*?-->)
      | (?P<decl>![^>\[]*>)
      | (?P<name>[a-zA-Z][-a-zA-Z0-9]*)
        (?P<attrs>(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*
                    (?:\s*=\s*(?:"[^"<]*"|'[^'<]*'|[^\s>/'"=<`]+))?)*)
        \s*(?P<selfclose>/?)>
    )""", re.X | re.S)

_FAST_ATTR_RE = re.compile(
    r"\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<]*)\"|'([^'<]*)'|([^\s>/'\"=<`]+)))?")

#: html.parser's own CDATA terminator pattern per raw-text element
_FAST_CDATA_END = {t: re.compile(r"</\s*%s\s*>" % t, re.I)
                   for t in ("script", "style")}


def _fast_feed(parser, text: str) -> bool:
    """Tokenize ``text`` with one compiled regex and drive the SAME
    handler methods html.parser would — the hot-path replacement for
    ``HTMLParser.feed`` (the stdlib tokenizer is ~70% of flagship UDF
    time: per-character ``goahead`` bookkeeping, ``updatepos`` line/col
    tracking the docmodel never reads).

    Returns False ("bail") on ANY construct outside the strict grammar —
    entities/charrefs anywhere (conversion semantics stay stdlib-only),
    processing instructions, CDATA blocks, unterminated constructs, bare
    ``<``, exotic tag/attr spellings, an unquoted attr value adjacent to
    a self-close slash (stdlib glues the slash into the value) — and the
    caller re-parses the whole document with the stdlib tokenizer.
    Handler-visible differences on the ACCEPTED subset: none (data may
    arrive in different fragment boundaries, which every handler treats
    as concatenation); script/style contents are delivered raw up to the
    stdlib's own ``</\\s*tag\\s*>`` terminator."""
    if not FAST_FEED_ENABLED or "&" in text:
        return False
    pos, n = 0, len(text)
    find = text.find
    token = _FAST_TOKEN_RE.match
    handle_data = parser.handle_data
    handle_starttag = parser.handle_starttag
    handle_endtag = parser.handle_endtag
    # group indices: 1 endname, 2 comment, 3 decl, 4 name, 5 attrs, 6 /
    while True:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                handle_data(text[pos:])
            return True
        if lt > pos:
            handle_data(text[pos:lt])
        m = token(text, lt)
        if m is None:
            return False
        g = m.group
        name = g(4)
        pos = m.end()
        if name is not None:
            tag = name.lower()
            attrs_src = g(5)
            attrs = [(a[0].lower(), a[1] or a[2] or a[3] or
                      (None if "=" not in src else ""))
                     for a, src in _iter_attrs(attrs_src)] \
                if attrs_src else []
            if g(6):
                # stdlib glues the slash into a preceding unquoted value
                if attrs_src and attrs_src[-1] not in "\"'" \
                        and "=" in attrs_src.rsplit(None, 1)[-1]:
                    return False
                parser.handle_startendtag(tag, attrs)
                continue
            handle_starttag(tag, attrs)
            if tag in _FAST_CDATA_END:         # stdlib CDATA mode
                endm = _FAST_CDATA_END[tag].search(text, pos)
                if endm is None:
                    return False
                if endm.start() > pos:
                    handle_data(text[pos:endm.start()])
                handle_endtag(tag)
                pos = endm.end()
            continue
        endname = g(1)
        if endname is not None:
            handle_endtag(endname.lower())
        # comments and declarations: handle_comment/handle_decl are
        # documented no-ops in _HtmlToDoc; skipping the calls is invisible


def _iter_attrs(attrs_src: str):
    """(match groups, raw source) per attribute — raw source
    distinguishes ``disabled`` (None value) from ``disabled=""``."""
    for m in _FAST_ATTR_RE.finditer(attrs_src):
        yield m.groups(), m.group(0)


def decode_payload(data: bytes,
                   password: str | None = None) -> tuple[str | None, int]:
    """The :func:`parse_document` sniff/decrypt gate alone: ``(text, 0)``
    on success, ``(None, err_code)`` on the deterministic refusals
    (empty / encryption envelope without the right password / null byte /
    invalid UTF-8). Shared by the full parser and the light scanners
    (link extraction) so every consumer skips EXACTLY the same rows."""
    if not data:
        return None, ERR_FORMAT

    m = _ENC_RE.match(data)
    if m:
        salt = m.group(1).decode()
        digest = m.group(2).decode()
        if password is None or _enc_digest(salt, password) != digest:
            return None, ERR_PASSWORD
        body = data[m.end():]
        data = _xor_bytes(body, _enc_keystream(salt, password, len(body)))

    if b"\x00" in data:
        return None, ERR_FORMAT
    try:
        return data.decode("utf-8", errors="strict"), 0
    except UnicodeDecodeError:
        return None, ERR_FORMAT


def _density_select(items: list[_LineItem]) -> list[_LineItem]:
    """Boilerpipe/Readability-style main-content pick for pages with NO
    semantic ``<main>``/``<article>``: score each top-level container
    segment by its non-whitespace chars minus TWICE its anchor-text chars
    (a link-dense navigation/footer block scores negative: its every char
    is counted once as content and twice as link), keep the single
    best-scoring segment's lines and page breaks. Deterministic — ties
    break to the earliest segment; if no segment scores positive the page
    is kept whole (a page of links is still a page)."""
    scores: dict[int, int] = {}
    for it in items:
        if it.kind != "line":
            continue
        c = len(it.text) - it.text.count(" ")     # text is collapsed
        scores[it.segment] = (scores.get(it.segment, 0)
                              + c - 2 * it.link_chars)
    if not scores:
        return items
    best, best_score = min(scores), scores[min(scores)]
    for seg in sorted(scores):
        if scores[seg] > best_score:
            best, best_score = seg, scores[seg]
    if best_score <= 0:
        return items
    return [it for it in items if it.segment == best]


def parse_document(data: bytes, password: str | None = None,
                   layout: LayoutParams = DEFAULT_LAYOUT,
                   max_toc_depth: int = 15,
                   content_policy: str = "semantic") -> Document:
    """Parse one document payload into a :class:`Document` (never raises on
    bad input — failures become ``err_code``/``status``; document.py:564-587
    inverted per the error-rows discipline).

    ``content_policy`` governs main-content extraction when the page has
    no semantic ``<main>``/``<article>`` (which always wins when present):
    ``"semantic"`` keeps the whole body (minus the stripped boilerplate
    tags); ``"density"`` additionally applies :func:`_density_select`'s
    link-density heuristic over top-level containers — the DOM-heuristic
    tier for wild crawl pages."""

    text, err = decode_payload(data, password)
    if text is None:
        return Document(err_code=err)

    # trailer-ends introspection (FPDF_GetTrailerEnds analogue — the raw
    # PDFium API reports the in-file byte offset where each incremental
    # update's trailer ends; the HTML analogue is the byte offset just
    # past each document end marker `</html>`, one per concatenated
    # snapshot). Computed over the RAW bytes, case-insensitive.
    trailer_ends: list[int] = []
    if isinstance(data, (bytes, bytearray, memoryview)):
        raw = bytes(data).lower()
        pos = raw.find(b"</html>")
        while pos != -1:
            trailer_ends.append(pos + len(b"</html>"))
            pos = raw.find(b"</html>", pos + 1)

    parser = _HtmlToDoc()
    try:
        if not _fast_feed(parser, text):
            # bail: anything outside the fast lane's strict grammar is
            # re-parsed from scratch by the reference stdlib tokenizer
            parser = _HtmlToDoc()
            parser.feed(text)
        parser.close()
    except Exception:
        return Document(err_code=ERR_FORMAT)
    # anything buffered at EOF is a final line
    parser._flush_line()

    metadata = dict(parser.meta_tags)
    metadata.update(parser.metadata)

    # main-content restriction (semantic markup always wins)
    items = parser.items
    if parser.has_main or parser.has_article:
        items = [it for it in items if it.kind == "break" or it.in_main]
    elif content_policy == "density":
        items = _density_select(items)

    # pagination
    pages_items: list[list[_LineItem]] = [[]]
    if parser.explicit_break:
        for it in items:
            if it.kind == "break":
                pages_items.append([])
            else:
                pages_items[-1].append(it)
    else:
        lines_seen = 0
        for it in items:
            if it.kind != "line":
                continue
            if lines_seen and lines_seen % layout.max_lines_per_page == 0:
                pages_items.append([])
            pages_items[-1].append(it)
            lines_seen += 1

    warnings = list(parser.warnings)
    pages: list[Page] = []
    heading_entries: list[TocEntry] = []
    pos_of: dict[int, tuple[int, int]] = {}   # id(item) -> (page, line)
    for pi, page_lines in enumerate(pages_items):
        lines: list[str] = []
        spans: list[Span] = []
        objects: list[PageObject] = []
        for it in page_lines:
            li = len(lines)
            pos_of[id(it)] = (pi, li)
            lines.append(it.text)
            t, b = layout.line_top(li), layout.line_bottom(li)
            for (s, e, st) in it.spans:
                spans.append(Span(text=it.text[s:e], line_idx=li,
                                  font_size=st.font_size, font_family=st.font_family,
                                  weight=st.weight, italic=st.italic))
                objects.append(PageObject(
                    type="text", level=it.dom_level,
                    bounds=(layout.char_x(s), b, layout.char_x(e), t)))
            for obj in it.objects:
                obj.bounds = (layout.margin_left, b,
                              layout.margin_left + max(obj.width, 1) * 1.0, t)
                objects.append(obj)
            if it.heading_level is not None and it.text:
                heading_entries.append(TocEntry(
                    level=it.heading_level - 1, title=it.text, page_index=pi))
        pages.append(Page(index=pi, lines=lines, spans=spans, objects=objects,
                          layout=layout))

    # heading-outline child counts: entry i's immediate children are the
    # level+1 entries before the next entry with level <= level(i)
    for i, e in enumerate(heading_entries):
        n = 0
        for j in range(i + 1, len(heading_entries)):
            lj = heading_entries[j].level
            if lj <= e.level:
                break
            if lj == e.level + 1:
                n += 1
        e.n_children = n

    # TOC: explicit nav outline wins over the heading outline
    if parser.nav_roots:
        toc = _flatten_outline(parser.nav_roots, max_toc_depth, warnings)
    else:
        toc = heading_entries

    # doc-level flags (document.py:222-244): tagged = semantic structure
    # present (headings or an explicit outline); pagemode mirrors the PDF
    # catalog convention (outlines > attachments > none); formtype records
    # stripped-form presence
    from pypdfium2_ray.docmodel.model import (
        FORMTYPE_ACRO_FORM, FORMTYPE_NONE, PAGEMODE_USEATTACHMENTS,
        PAGEMODE_USENONE, PAGEMODE_USEOUTLINES)
    if toc:
        pagemode = PAGEMODE_USEOUTLINES
    elif parser.attachments:
        pagemode = PAGEMODE_USEATTACHMENTS
    else:
        pagemode = PAGEMODE_USENONE
    # map each recorded field to the page/line of the nearest following
    # text line (its widget position); fields after the last line land at
    # the end of the last page
    form_fields: list[FormField] = []
    for f in parser.form_fields:
        page_idx = len(pages) - 1
        line_idx = len(pages[-1].lines) if pages else 0
        for it in parser.items[f["item_pos"]:]:
            if it.kind == "line" and id(it) in pos_of:
                page_idx, line_idx = pos_of[id(it)]
                break
        form_fields.append(FormField(name=f["name"], type=f["type"],
                                     value=f["value"], page_idx=page_idx,
                                     line_idx=line_idx))

    doc = Document(pages=pages, toc=toc, attachments=parser.attachments,
                   metadata=metadata, warnings=warnings,
                   tagged=bool(toc) or bool(heading_entries),
                   formtype=FORMTYPE_ACRO_FORM if parser.saw_form
                            else FORMTYPE_NONE,
                   form_fields=form_fields,
                   pagemode=pagemode,
                   trailer_ends=trailer_ends)
    return doc


def extract_document_text(doc: Document, strategy: str = "range") -> str:
    """Document-level framed text — byte-compatible with the reference CLI
    (``cli/extract_text.py:26-45``): per page ``"# Page {i+1}\\n" + text``
    joined by a blank line, trailing newline (each ``print`` adds one LF;
    page-internal line breaks stay CRLF). The byte-identical invariant
    column."""
    if not doc.ok:
        return ""
    parts = []
    for i, page in enumerate(doc.pages):
        tp = page.get_textpage()
        text = tp.get_text_bounded() if strategy == "bounded" else tp.get_text_range()
        parts.append(f"# Page {i+1}\n" + text)
    return "\n\n".join(parts) + "\n"
