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

#: MediaBox fallback when a page defines no box at all and carries no
#: layout — ANSI A, the reference's ``get_mediabox`` default
#: (page.py:103-115).
FALLBACK_MEDIABOX = (0.0, 0.0, 612.0, 792.0)

#: form types (document.py:222-228; raw FORMTYPE_* constants)
FORMTYPE_NONE, FORMTYPE_ACRO_FORM, FORMTYPE_XFA_FULL, FORMTYPE_XFA_FOREGROUND = \
    0, 1, 2, 3
FORMTYPE_TO_STR = {FORMTYPE_NONE: "none", FORMTYPE_ACRO_FORM: "acro_form",
                   FORMTYPE_XFA_FULL: "xfa_full",
                   FORMTYPE_XFA_FOREGROUND: "xfa_foreground"}
#: flatten targets / status codes (page.py:328-346 FLAT_*/FLATTEN_*;
#: public PDFium values)
FLAT_NORMALDISPLAY, FLAT_PRINT = 0, 1
FLATTEN_FAIL, FLATTEN_SUCCESS, FLATTEN_NOTHINGTODO = 0, 1, 2

#: page modes (document.py:231-236; raw PAGEMODE_* constants)
(PAGEMODE_UNKNOWN, PAGEMODE_USENONE, PAGEMODE_USEOUTLINES, PAGEMODE_USETHUMBS,
 PAGEMODE_FULLSCREEN, PAGEMODE_USEOC, PAGEMODE_USEATTACHMENTS) = range(-1, 6)
PAGEMODE_TO_STR = {PAGEMODE_UNKNOWN: "unknown", PAGEMODE_USENONE: "use_none",
                   PAGEMODE_USEOUTLINES: "use_outlines",
                   PAGEMODE_USETHUMBS: "use_thumbs",
                   PAGEMODE_FULLSCREEN: "fullscreen",
                   PAGEMODE_USEOC: "use_oc",
                   PAGEMODE_USEATTACHMENTS: "use_attachments"}

#: names of the five page boxes and their fallback parent
#: (media <- crop <- {bleed, trim, art}; page.py:95-185)
_BOX_FALLBACK = {"crop": "media", "bleed": "crop", "trim": "crop",
                 "art": "crop"}


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
    {"text", "image", "form"}; level = nesting depth (page.py:274-325
    max_depth analogue — for HTML, DOM depth of the source element)."""
    type: str
    level: int
    bounds: tuple[float, float, float, float]
    # image-only metadata (pageobjects.py:337-367 analogue)
    width: int = 0
    height: int = 0
    alt: str = ""
    src: str = ""
    #: form objects only (XObject.as_pageobject): the captured page,
    #: SHARED between all pageobjects of one XObject (document.py:653-662
    #: shared-resources contract). Never serialized — form content is a
    #: placement-time resource, like a PDF form XObject stream.
    form_page: "Page | None" = None

    def get_quad_points(self, matrix=None):
        """Corner positions counter-clockwise from the origin corner —
        bottom-left, bottom-right, top-right, top-left — the reference's
        ``get_quad_points`` (pageobjects.py:108-130
        ``FPDFPageObj_GetRotatedBounds``): for a transformed object the
        quad is TIGHTER than the axis-aligned ``bounds`` rectangle
        (rotation by a non-multiple of 90°, shear). Like PDFium, only
        text and image objects support it. ``matrix``: an optional
        ``PdfMatrix`` transform to apply (our HTML objects are stored
        axis-aligned, so the identity quad is the rect's corners)."""
        if self.type not in ("text", "image"):
            raise RuntimeError(
                "Quad points only supported for image and text objects.")
        left, bottom, right, top = self.bounds
        corners = ((left, bottom), (right, bottom),
                   (right, top), (left, top))
        if matrix is None:
            return corners
        return tuple(matrix.on_point(x, y) for x, y in corners)

    def set_bitmap(self, bitmap) -> None:
        """In-place image replacement — the ``PdfImage.set_bitmap``
        analogue (pageobjects.py:417-430 ``FPDFImageObj_SetBitmap``).
        PDFium flate-compresses the pixel data; the docmodel losslessly
        PNG-encodes it (``functions/png.encode_png`` — zlib inside, the
        same codec family) into the object's ``data:`` URI, so a
        serialize -> parse round trip decodes to the same pixels. The
        reference's ``pages`` cache-invalidation parameter has no
        analogue (no live page handles)."""
        if self.type != "image":
            raise RuntimeError(
                "set_bitmap() only supported for image objects.")
        import base64

        from pypdfium2_ray.functions.png import encode_png
        png = encode_png(bitmap.to_numpy(), pixel_format=bitmap.mode)
        self.src = ("data:image/png;base64,"
                    + base64.b64encode(png).decode("ascii"))
        self.width, self.height = bitmap.width, bitmap.height

    def load_jpeg(self, source, pages=None, inline: bool = False,
                  autoclose: bool = True) -> None:
        """Load a JPEG stream as the image object's content — the
        ``PdfImage.load_jpeg`` analogue (pageobjects.py:360-412
        ``FPDFImageObj_LoadJpegFile[Inline]``). *source* may be raw
        bytes, a readable binary stream, or a filesystem path. The
        docmodel always copies the bytes into the object (the reference's
        ``inline=True`` mode); ``pages`` / ``inline`` are accepted for
        signature parity, ``autoclose`` closes a stream source. Width /
        height update from the JPEG SOF header; progressive (SOF2)
        streams embed fine — only pixel DECODE refuses them
        (functions/jpeg.py)."""
        if self.type != "image":
            raise RuntimeError(
                "load_jpeg() only supported for image objects.")
        import base64
        if isinstance(source, (bytes, bytearray, memoryview)):
            data = bytes(source)
        elif hasattr(source, "read"):
            data = source.read()
            if autoclose:
                source.close()
        else:
            with open(source, "rb") as f:
                data = f.read()
        from pypdfium2_ray.functions.imagemeta import _jpeg
        info = _jpeg(data) if data[:2] == b"\xff\xd8" else None
        if info is None:
            raise ValueError("Failed to load JPEG into image object.")
        _fmt, self.width, self.height = info
        self.src = ("data:image/jpeg;base64,"
                    + base64.b64encode(data).decode("ascii"))


@dataclass
class Attachment:
    """Embedded file (PdfAttachment analogue, attachment.py:21-150: name +
    raw bytes + params). For HTML the source is an ``<a download>`` element;
    a ``data:`` URI href yields the decoded bytes, any other href is
    recorded by reference with empty data.

    ``params`` mirrors the reference's attachment params dictionary
    (attachment.py:96-145 ``has_key``/``get_str_value``): the PDF-spec
    embedded-file keys Size / CreationDate / ModDate / CheckSum (CheckSum
    is the hex MD5 of the data, per PDF 1.7 §7.11.4)."""
    name: str
    data: bytes = b""
    mime: str = ""
    src: str = ""
    params: dict[str, str] = field(default_factory=dict)

    def standard_params(self) -> dict[str, str]:
        """Size/CheckSum derived from the data; dates from ``params``."""
        import hashlib
        out = dict(self.params)
        out.setdefault("Size", str(len(self.data)))
        out.setdefault("CheckSum",
                       hashlib.md5(self.data).hexdigest() if self.data else "")
        return out

    def has_key(self, key: str) -> bool:
        """attachment.py:96-104."""
        return key in self.standard_params()

    def get_str_value(self, key: str) -> str:
        """attachment.py:115-131 — '' for keys absent from the params dict
        (the reference returns '' for non-string values and raises only on
        API failure, which has no analogue here)."""
        return self.standard_params().get(key, "")

    def get_name(self) -> str:
        """attachment.py:45-54 ``get_name``."""
        return self.name

    def get_data(self) -> bytes:
        """attachment.py:57-78 ``get_data`` — raises on an empty buffer
        exactly like the reference ("buffer length 0"): a new attachment
        must receive :meth:`set_data` before its data can be read."""
        if not self.data:
            raise ValueError(
                "Failed to extract attachment (buffer length 0).")
        return self.data

    def set_data(self, data: bytes) -> None:
        """attachment.py:81-93 ``set_data`` (FPDFAttachment_SetFile).
        PDFium rebuilds the embedded-file params dict around the new
        stream: Size/CheckSum re-derive and previously-set date params
        are dropped (reference tests/test_attachments.py — ``ModDate``
        reads '' after ``set_data``). A by-reference ``src`` is cleared:
        the attachment now embeds its bytes."""
        self.data = bytes(data)
        self.src = ""
        self.params = {}   # Size/CheckSum re-derive in standard_params

    def set_str_value(self, key: str, value: str) -> None:
        """attachment.py:134-145 ``set_str_value`` (SetStringValue)."""
        self.params[str(key)] = str(value)


@dataclass
class TocEntry:
    """Flattened pre-order TOC node (document.py:520-559 ``get_toc``).
    ``n_children`` mirrors ``PdfBookmark.get_count()`` magnitude
    (document.py:686-699: immediate child count; HTML outlines default to
    'open', so the reference's sign bit is + unless ``closed``).

    ``closed`` / ``color`` carry the reference's bookmark view state
    (document.py:693-714): ``closed`` is the collapsed initial state that
    signs ``get_count()`` (parsed from ``<li data-closed>``), ``color``
    the optional RGB triple as floats in [0, 1] (``data-color="#rrggbb"``
    — None when absent/invalid, like ``FPDFBookmark_GetColor``'s failure
    path)."""
    level: int
    title: str
    page_index: int
    n_children: int = 0
    closed: bool = False
    color: "tuple[float, float, float] | None" = None

    def get_color(self):
        """document.py:703-714 ``PdfBookmark.get_color`` — the RGB float
        triple, or None if the bookmark does not define a valid color."""
        return self.color


def toc_get_count(toc: "list[TocEntry]", i: int) -> int:
    """Signed bookmark count over a flattened TOC — the semantics of
    ``PdfBookmark.get_count`` (document.py:693-701): magnitude is the
    number of descendant bookmarks that would be VISIBLE if entry *i*
    were open (immediate children, plus recursively the children of each
    OPEN child), sign is + for an open entry and - for a closed one,
    and 0 for a leaf. Computed from the pre-order ``level`` sequence the
    flattener guarantees."""
    def visible(j: int) -> int:
        total = 0
        lvl = toc[j].level
        k = j + 1
        while k < len(toc) and toc[k].level > lvl:
            if toc[k].level == lvl + 1:
                total += 1
                if not toc[k].closed:
                    total += visible(k)
            k += 1
        return total

    n = visible(i)
    return -n if (toc[i].closed and n) else n


@dataclass
class FormField:
    """One interactive form widget — the HTML analogue of a PDF AcroForm
    field (the reference exposes forms through the formenv lifecycle,
    document.py:159-228; PDFium's field model is widget annotations with
    a value and a page position). ``value`` is the VISIBLE appearance a
    flatten would bake into the page (text/textarea content, the selected
    option label, a checked box's on-value); invisible widgets (hidden
    inputs, unchecked boxes, empty fields) carry ``value == ""``."""
    name: str
    type: str                    # "text" | "textarea" | "select" | ...
    value: str
    page_idx: int = 0
    line_idx: int = 0


@dataclass
class FormEnv:
    """Form-fill environment (PdfFormEnv analogue, document.py:159-207):
    created by ``Document.init_forms``, holds the live field set that
    ``Page.flatten`` consumes; ``config`` is an opaque caller object (the
    FPDF_FORMFILLINFO analogue — unused by the engine, carried for
    interface parity)."""
    fields: list[FormField] = field(default_factory=list)
    config: object = None


@dataclass
class Page:
    """One page: text lines in reading order + derived views.

    Geometry surface (reference ``page.py:78-185``): the five page boxes
    with the PDF fallback chain (media <- crop <- {bleed, trim, art}),
    ``get_bbox`` = media ∩ crop, and clockwise page rotation in
    {0, 90, 180, 270}. Rotation is a *view* property exactly as in PDFium:
    reported width/height swap at 90/270, rendering rotates the raster,
    but charboxes/rects and ``get_text_bounded`` defaults stay in native
    page coordinates (the reference's BUG(149) regression,
    tests/test_textpage.py:144-156 — rotating must NOT truncate bounded
    extraction defaults)."""
    index: int
    lines: list[str]
    spans: list[Span] = field(default_factory=list)
    objects: list[PageObject] = field(default_factory=list)
    layout: LayoutParams = DEFAULT_LAYOUT
    rotation: int = 0
    #: set by Document.init_forms (page.formenv in the reference); None
    #: until forms are initialized
    formenv: "FormEnv | None" = None
    #: explicitly-set boxes by name ("media", "crop", "bleed", "trim",
    #: "art"); unset boxes resolve through the fallback chain
    boxes: dict[str, tuple] = field(default_factory=dict)

    # ---- rotation (page.py:78-92) -----------------------------------------

    def get_rotation(self) -> int:
        return self.rotation

    def set_rotation(self, rotation: int) -> None:
        if rotation not in (0, 90, 180, 270):
            raise ValueError(f"Invalid rotation {rotation}")
        self.rotation = rotation

    # ---- the five boxes (page.py:95-185) ----------------------------------

    def _default_mediabox(self) -> tuple[float, float, float, float]:
        """The page's intrinsic (layout-derived) box; ANSI A only for a
        page with no layout — our pages always carry a layout, which plays
        the role of a PDF with /MediaBox defined."""
        if self.layout is not None:
            return (0.0, 0.0, self.layout.page_width, self.layout.page_height)
        return FALLBACK_MEDIABOX

    def get_mediabox(self, fallback_ok: bool = True):
        box = self.boxes.get("media")
        if box is not None:
            return box
        return self._default_mediabox() if fallback_ok else None

    def set_mediabox(self, l, b, r, t) -> None:
        self.boxes["media"] = (float(l), float(b), float(r), float(t))

    def _get_box(self, name: str, fallback_ok: bool):
        box = self.boxes.get(name)
        if box is not None:
            return box
        if not fallback_ok:
            return None
        parent = _BOX_FALLBACK[name]
        if parent == "media":
            return self.get_mediabox(fallback_ok=True)
        return self._get_box(parent, fallback_ok=True)

    def get_cropbox(self, fallback_ok: bool = True):
        return self._get_box("crop", fallback_ok)

    def set_cropbox(self, l, b, r, t) -> None:
        self.boxes["crop"] = (float(l), float(b), float(r), float(t))

    def get_bleedbox(self, fallback_ok: bool = True):
        return self._get_box("bleed", fallback_ok)

    def set_bleedbox(self, l, b, r, t) -> None:
        self.boxes["bleed"] = (float(l), float(b), float(r), float(t))

    def get_trimbox(self, fallback_ok: bool = True):
        return self._get_box("trim", fallback_ok)

    def set_trimbox(self, l, b, r, t) -> None:
        self.boxes["trim"] = (float(l), float(b), float(r), float(t))

    def get_artbox(self, fallback_ok: bool = True):
        return self._get_box("art", fallback_ok)

    def set_artbox(self, l, b, r, t) -> None:
        self.boxes["art"] = (float(l), float(b), float(r), float(t))

    def get_bbox(self) -> tuple[float, float, float, float]:
        """Media ∩ crop intersection (page.py:176-185
        ``FPDF_GetPageBoundingBox``), in native (unrotated) coordinates."""
        ml, mb, mr, mt = self.get_mediabox()
        cl, cb, cr, ct = self.get_cropbox()
        return (max(ml, cl), max(mb, cb), min(mr, cr), min(mt, ct))

    # ---- size (rotation-aware, page.py:40-72) ------------------------------

    @property
    def width(self) -> float:
        """Horizontal size as displayed — swaps with height at 90/270
        (``FPDF_GetPageWidthF`` accounts for /Rotate)."""
        l, b, r, t = self.get_bbox()
        return (t - b) if self.rotation in (90, 270) else (r - l)

    @property
    def height(self) -> float:
        l, b, r, t = self.get_bbox()
        return (r - l) if self.rotation in (90, 270) else (t - b)

    def get_textpage(self) -> TextPage:
        """Analogue of ``page.get_textpage()`` (page.py:191-201) — here a
        cheap pure construction (state ST5's cached bbox is a plain
        attribute). The textpage bbox is the NATIVE page bbox, not the
        rotation-swapped size (BUG(149) semantics)."""
        return TextPage(self.lines, self.layout, bbox=self.get_bbox())

    def get_size(self) -> tuple[float, float]:
        """(width, height) — document.py:490-497 ``get_page_size``."""
        return (self.width, self.height)

    def flatten(self, flag: int = FLAT_NORMALDISPLAY) -> int:
        """Flatten this page's form fields into its static content — the
        reference's ``page.flatten()`` (page.py:328-346
        ``FPDFPage_Flatten``): each visible field's appearance (its
        ``value``) is baked into the page text at the field's recorded
        position, and the fields are consumed from the formenv. Requires
        a prior ``Document.init_forms()`` exactly like PDFium (raises
        otherwise); like the reference warns, flattening mutates the page
        — rebuild textpages/derived views afterwards. ``flag`` is
        FLAT_NORMALDISPLAY / FLAT_PRINT (both bake the same text here).
        Returns FLATTEN_SUCCESS or FLATTEN_NOTHINGTODO."""
        if self.formenv is None:
            raise RuntimeError(
                "page.flatten() requires prior pdf.init_forms(), before "
                "page retrieval.")
        mine = [f for f in self.formenv.fields if f.page_idx == self.index]
        visible = [f for f in mine if f.value]
        # insert back-to-front (descending line, and descending document
        # order within a line) so indices stay valid AND same-line fields
        # come out in document order
        for _, f in sorted(enumerate(visible),
                           key=lambda t: (t[1].line_idx, t[0]),
                           reverse=True):
            self.lines.insert(min(f.line_idx, len(self.lines)), f.value)
        for f in mine:
            self.formenv.fields.remove(f)
        return FLATTEN_SUCCESS if visible else FLATTEN_NOTHINGTODO


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
    #: structure-tagged flag (document.py:239-244 ``is_tagged``): True when
    #: the source carries semantic structure (HTML: headings/outline)
    tagged: bool = False
    #: FORMTYPE_* (document.py:222-228); forms are out of scope (SURVEY
    #: M25) so parsers only distinguish none vs acro_form presence
    formtype: int = FORMTYPE_NONE
    #: PAGEMODE_* (document.py:231-236)
    pagemode: int = PAGEMODE_USENONE
    #: explicit page labels by index (document.py:476-487); missing ->
    #: '' exactly like a PDF without /PageLabels
    page_labels: list[str] = field(default_factory=list)
    #: interactive form widgets parsed from the source (<input>/<textarea>/
    #: <select>; hidden widgets excluded) — consumed through the formenv
    form_fields: list[FormField] = field(default_factory=list)
    #: live form env (document.py:159-207); None until init_forms()
    formenv: "FormEnv | None" = None
    #: XObjects captured into this document's resources
    #: (page_as_xobject; the reference's _add_kid tracking)
    xobjects: list = field(default_factory=list)
    #: byte offsets just past each document end marker in the raw
    #: payload (FPDF_GetTrailerEnds analogue, bindings.py:486-489 — one
    #: entry per incremental update/concatenated snapshot)
    trailer_ends: list[int] = field(default_factory=list)

    @classmethod
    def new(cls) -> "Document":
        """Fresh empty document (``PdfDocument.new()``,
        document.py:587-595)."""
        return cls()

    def new_page(self, width: float, height: float,
                 index: int | None = None) -> Page:
        """Append (or insert at *index*) a new empty page of the given
        size (``PdfDocument.new_page``, document.py:420-443): the size is
        recorded as an explicit media box, so ``get_size``/boxes behave
        exactly like a parsed page."""
        page = Page(index=len(self.pages) if index is None else index,
                    lines=[])
        page.set_mediabox(0, 0, width, height)
        if index is None:
            self.pages.append(page)
        else:
            self.pages.insert(index, page)
            for i, p in enumerate(self.pages):
                p.index = i
        return page

    def del_page(self, index: int) -> None:
        """Remove a page (``PdfDocument.del_page``, document.py:404-412)."""
        del self.pages[index]
        for i, p in enumerate(self.pages):
            p.index = i

    def import_pages(self, src: "Document",
                     pages: list[int] | None = None,
                     index: int | None = None) -> None:
        """Copy pages from *src* (``PdfDocument.import_pages``,
        document.py:446-467): all pages by default, else the given
        0-based indices, inserted at *index* (default: append). Pages are
        deep-copied — the immutable-value docmodel has no cross-document
        handle ownership to manage."""
        import copy
        sel = list(range(len(src.pages))) if pages is None else pages
        new_pages = [copy.deepcopy(src.pages[i]) for i in sel]
        at = len(self.pages) if index is None else index
        self.pages[at:at] = new_pages
        for i, p in enumerate(self.pages):
            p.index = i

    def page_as_xobject(self, index: int, dest_doc: "Document") -> "XObject":
        """Capture page *index* as an XObject attached to *dest_doc*'s
        resources (``PdfDocument.page_as_xobject``, document.py:500-517
        ``FPDF_NewXObjectFromPage``): the captured content is a deep copy
        (like PDFium, later edits to the source page don't retroactively
        change the XObject), registered on the destination the way the
        reference ``_add_kid``-tracks it. Raises on a bad index exactly
        where PDFium returns a null handle."""
        import copy
        if not 0 <= index < len(self.pages):
            raise ValueError(
                f"Failed to capture page at index {index} as XObject.")
        xobject = XObject(page=copy.deepcopy(self.pages[index]),
                          doc=dest_doc)
        dest_doc.xobjects.append(xobject)
        return xobject

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

    def new_attachment(self, name: str) -> Attachment:
        """document.py:359-374 ``new_attachment`` (FPDFDoc_AddAttachment):
        a new, EMPTY attachment — ``get_data`` raises until
        :meth:`Attachment.set_data` is called. The docmodel appends (the
        reference notes PDFium may insert at an arbitrary index)."""
        att = Attachment(name=name)
        self.attachments.append(att)
        return att

    def del_attachment(self, index: int) -> None:
        """document.py:377-388 ``del_attachment``
        (FPDFDoc_DeleteAttachment): unlink at *index*; following
        attachments shift one slot left. Handles from
        :meth:`get_attachment` for that index must not be used after."""
        del self.attachments[index]

    def get_toc(self, max_depth: int = 15) -> list[TocEntry]:
        """Pre-order TOC capped at max_depth (document.py:520-559). Cycle
        suppression happens at parse time (htmldoc._flatten_outline); the
        depth cap is re-applied here for API parity."""
        return [e for e in self.toc if e.level < max_depth]

    def get_version(self) -> int:
        """document.py:240-249 analogue (HTML: always 1 unless declared)."""
        return self.version

    def is_tagged(self) -> bool:
        """document.py:239-244."""
        return self.tagged

    def get_formtype(self) -> int:
        """document.py:222-228 (FORMTYPE_*; see FORMTYPE_TO_STR)."""
        return self.formtype

    def init_forms(self, config=None) -> bool:
        """Initialize the form env if the document has forms — the
        reference's ``init_forms`` (document.py:159-207): no-op returning
        False when the document has no forms or the env already exists;
        otherwise creates the env, attaches it to every page (the
        reference's "call before getting page handles" ordering — here
        pages exist already, so attach is explicit), and returns True."""
        if self.formtype == FORMTYPE_NONE or self.formenv is not None:
            return False
        self.formenv = FormEnv(fields=list(self.form_fields), config=config)
        for p in self.pages:
            p.formenv = self.formenv
        return True

    def close_forms(self) -> bool:
        """Close the formenv, if initialized (document.py:208-219)."""
        if self.formenv is None:
            return False
        self.formenv = None
        for p in self.pages:
            p.formenv = None
        return True

    def get_pagemode(self) -> int:
        """document.py:231-236 (PAGEMODE_*; see PAGEMODE_TO_STR)."""
        return self.pagemode

    def get_page_label(self, index: int) -> str:
        """document.py:476-487: the page's display label, '' when the
        document defines no label for it (PDFium returns an empty string
        for PDFs without /PageLabels)."""
        if not 0 <= index < len(self.pages):
            raise IndexError(f"page index {index} out of range")
        if index < len(self.page_labels):
            return self.page_labels[index]
        return ""

    def get_page_size(self, index: int) -> tuple[float, float]:
        """document.py:470-485 ``get_page_size`` by index."""
        return self.pages[index].get_size()

    def get_trailer_ends(self) -> list[int]:
        """Low-level trailer introspection — the ``FPDF_GetTrailerEnds``
        analogue (raw bindings.py:486-489; no helpers-layer wrapper in
        the reference either): the byte offset just past each document
        end marker (``</html>``) in the raw payload, one per
        concatenated/incrementally-updated snapshot. Empty for documents
        built in memory or payloads with no end marker (PDFium likewise
        reports 0 entries when the scan fails)."""
        return list(self.trailer_ends)

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


class XObject:
    """A page captured into a destination document's resources — the
    ``PdfXObject`` analogue (document.py:635-662): created by
    :meth:`Document.page_as_xobject` (``FPDF_NewXObjectFromPage``,
    document.py:500-517), turned into placeable pageobjects with
    :meth:`as_pageobject` (``FPDF_NewFormObjectFromXObject``).

    Every pageobject created from the same XObject SHARES the captured
    page (the reference's shared-resources contract) and remains valid
    after :meth:`close` — the form objects hold their own reference,
    exactly like PDFium's form objects outliving the FPDF_XOBJECT
    handle."""

    def __init__(self, page: Page, doc: "Document"):
        self.page = page
        self.doc = doc
        self._closed = False

    @property
    def parent(self) -> "Document":
        """The owning document (the reference's AutoCloseable hook,
        document.py:649-651)."""
        return self.doc

    def close(self) -> None:
        """``FPDF_CloseXObject`` — idempotent; already-created
        pageobjects stay valid."""
        self._closed = True

    def as_pageobject(self) -> PageObject:
        """An independent ``type="form"`` pageobject wrapping the
        captured page (document.py:653-662): bounds are the captured
        page's bbox; repeated calls return DISTINCT objects sharing the
        same resources (``form_page`` is the same Page instance)."""
        if self._closed:
            raise RuntimeError("XObject is closed")
        obj = PageObject(type="form", level=0,
                         bounds=self.page.get_bbox())
        obj.form_page = self.page
        return obj
