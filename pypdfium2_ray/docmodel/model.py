"""Document / Page / Span / TOC model.

The reference's handle tree (``PdfDocument -> PdfPage -> PdfTextPage /
PdfObject``, ``internal/bases.py:105-186``) becomes a tree of immutable plain
values: no finalizers, no ownership bookkeeping — a Document is data that can
be turned into one Arrow row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pypdfium2_ray.docmodel.errors import ERR_SUCCESS, STATUS_OK, err_to_status
from pypdfium2_ray.docmodel.layout import DEFAULT_LAYOUT, LayoutParams
from pypdfium2_ray.docmodel.textpage import TextPage

#: The 8 fixed metadata keys (document.py:321)
METADATA_KEYS = ("Title", "Author", "Subject", "Keywords", "Creator",
                 "Producer", "CreationDate", "ModDate")


@dataclass
class Span:
    """A text run with uniform style — the analogue of ``PdfTextObj`` +
    its ``PdfFont`` attributes (pageobjects.py:164-309): for HTML, heading
    level -> font size, b/strong -> weight 700, code/pre -> monospace."""
    text: str
    line_idx: int
    font_size: float = 12.0
    font_family: str = "Helvetica"
    weight: int = 400
    italic: bool = False
    embedded: bool = False


@dataclass
class PageObject:
    """Typed page object (pageobjects.py:24-62): type in
    {"text", "image"}; level = nesting depth (page.py:274-325 max_depth
    analogue — for HTML, DOM depth of the source element)."""
    type: str
    level: int
    bounds: tuple[float, float, float, float]
    # image-only metadata (pageobjects.py:337-367 analogue)
    width: int = 0
    height: int = 0
    alt: str = ""
    src: str = ""


@dataclass
class Attachment:
    """Embedded file (PdfAttachment analogue, attachment.py:21-150: name +
    raw bytes + params). For HTML the source is an ``<a download>`` element;
    a ``data:`` URI href yields the decoded bytes, any other href is
    recorded by reference with empty data."""
    name: str
    data: bytes = b""
    mime: str = ""
    src: str = ""


@dataclass
class TocEntry:
    """Flattened pre-order TOC node (document.py:520-559 ``get_toc``).
    ``n_children`` mirrors ``PdfBookmark.get_count()`` magnitude
    (document.py:686-699: immediate child count; HTML outlines are always
    'open', so the reference's sign bit is always +)."""
    level: int
    title: str
    page_index: int
    n_children: int = 0


@dataclass
class Page:
    """One page: text lines in reading order + derived views."""
    index: int
    lines: list[str]
    spans: list[Span] = field(default_factory=list)
    objects: list[PageObject] = field(default_factory=list)
    layout: LayoutParams = DEFAULT_LAYOUT

    @property
    def width(self) -> float:
        return self.layout.page_width

    @property
    def height(self) -> float:
        return self.layout.page_height

    def get_textpage(self) -> TextPage:
        """Analogue of ``page.get_textpage()`` (page.py:191-201) — here a
        cheap pure construction (state ST5's cached bbox is a plain
        attribute)."""
        return TextPage(self.lines, self.layout)

    def get_size(self) -> tuple[float, float]:
        """(width, height) — document.py:490-497 ``get_page_size``."""
        return (self.width, self.height)


@dataclass
class Document:
    """One parsed document. ``status != "ok"`` rows carry no pages — failed
    docs are rows, not exceptions (document.py:583-585 inverted)."""
    pages: list[Page] = field(default_factory=list)
    toc: list[TocEntry] = field(default_factory=list)
    attachments: list[Attachment] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)
    err_code: int = ERR_SUCCESS
    version: int = 1

    @property
    def status(self) -> str:
        return err_to_status(self.err_code)

    @property
    def ok(self) -> bool:
        return self.status == STATUS_OK

    def __len__(self) -> int:
        """Page count (document.py:123-124)."""
        return len(self.pages)

    def __getitem__(self, i: int) -> Page:
        """Indexed page access (document.py:126-134)."""
        return self.pages[i]

    def get_metadata_value(self, key: str) -> str:
        """document.py:308-319 — unset keys yield ''."""
        if key not in METADATA_KEYS:
            raise ValueError(f"Invalid metadata key: {key!r}")
        return self.metadata.get(key, "")

    def get_metadata_dict(self, skip_empty: bool = False) -> dict[str, str]:
        """document.py:324-337."""
        d = {k: self.metadata.get(k, "") for k in METADATA_KEYS}
        if skip_empty:
            d = {k: v for k, v in d.items() if v}
        return d

    def count_attachments(self) -> int:
        """document.py:340-345 ``count_attachments``."""
        return len(self.attachments)

    def get_attachment(self, index: int) -> Attachment:
        """document.py:348-356 ``get_attachment``."""
        return self.attachments[index]

    def get_toc(self, max_depth: int = 15) -> list[TocEntry]:
        """Pre-order TOC capped at max_depth (document.py:520-559). Cycle
        suppression happens at parse time (htmldoc._flatten_outline); the
        depth cap is re-applied here for API parity."""
        return [e for e in self.toc if e.level < max_depth]

    def get_version(self) -> int:
        """document.py:240-249 analogue (HTML: always 1 unless declared)."""
        return self.version

    def get_identifier(self, permanent: bool = True) -> bytes:
        """document.py:278-292 analogue: permanent id = stable content hash;
        changing id = hash incl. metadata."""
        import hashlib
        h = hashlib.sha256()
        for p in self.pages:
            for ln in p.lines:
                h.update(ln.encode("utf-8", "surrogatepass"))
                h.update(b"\n")
        if not permanent:
            for k in METADATA_KEYS:
                h.update(self.metadata.get(k, "").encode("utf-8", "surrogatepass"))
        return h.digest()[:16]
