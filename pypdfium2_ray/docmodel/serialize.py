"""Document -> canonical HTML bytes (the save path).

The reference's ``PdfDocument.save`` (document.py:247-276
``FPDF_SaveAsCopy``/``SaveWithVersion``) re-serializes the in-memory
document; the docmodel analogue emits canonical HTML that
:func:`pypdfium2_ray.docmodel.htmldoc.parse_document` parses back to the
same observable state: extracted text (byte-identical, all pages), page
boundaries (explicit ``<pb>``), TOC (explicit ``<nav data-toc>``
outline), the 8 metadata keys, and attachments (``data:`` URIs).

What does NOT round-trip (documented, like a PDF save dropping
incremental-update history): span styling (lines re-parse with default
style), formtype (forms were stripped at parse), and the original page
boxes/rotation (view properties, not content).
"""

from __future__ import annotations

import base64
from html import escape

from pypdfium2_ray.docmodel.model import METADATA_KEYS, Document, TocEntry

#: metadata key -> <meta name=...> (inverse of htmldoc._META_NAME_TO_KEY)
_KEY_TO_META_NAME = {
    "Author": "author", "Subject": "subject", "Keywords": "keywords",
    "Creator": "creator", "Producer": "producer",
    "CreationDate": "creation-date", "ModDate": "mod-date",
}


def _toc_nav(entries: list[TocEntry]) -> str:
    """Flat pre-order entries -> ``<nav data-toc>`` with EXPLICIT
    ``data-level`` per item. Nesting-only markup cannot express every
    level sequence the flattener can produce (an h2-before-any-h1 heading
    outline starts at level 1); explicit levels round-trip all of them —
    the parser recomputes structural ``n_children`` from the sequence."""
    if not entries:
        return ""
    parts = ["<nav data-toc><ul>"]
    for e in entries:
        extra = ""
        if e.closed:
            extra += ' data-closed="1"'
        if e.color is not None:
            # floats quantize to the 8-bit hex channel they were parsed
            # from — exact round-trip for any color that originated as
            # #rrggbb (the only way the parser produces one)
            extra += (' data-color="#'
                      + "".join(f"{round(c * 255):02x}" for c in e.color)
                      + '"')
        parts.append(f'<li data-page="{e.page_index}" '
                     f'data-level="{e.level}"{extra}>{escape(e.title)}</li>')
    parts.append("</ul></nav>")
    return "".join(parts)


def serialize_document(doc: Document) -> bytes:
    """Canonical HTML for *doc* (see module docstring for the contract)."""
    if not doc.ok:
        raise ValueError(f"cannot serialize a failed document "
                         f"(status={doc.status!r})")
    head = ["<html><head>"]
    title = doc.metadata.get("Title", "")
    head.append(f"<title>{escape(title)}</title>")
    for key in METADATA_KEYS:
        if key == "Title":
            continue
        val = doc.metadata.get(key, "")
        if val:
            head.append(f'<meta name="{_KEY_TO_META_NAME[key]}" '
                        f'content="{escape(val, quote=True)}">')
    head.append("</head><body>")

    body = [_toc_nav(doc.toc)]
    for i, page in enumerate(doc.pages):
        if i:
            body.append("<pb>")
        for line in page.lines:
            body.append(f"<p>{escape(line)}</p>")
        # image objects round-trip as trailing <img> elements: the object
        # SET (src/alt/width/height per page, in order) is preserved;
        # bounds / DOM level / position within the text flow re-derive at
        # parse (view properties — see the module docstring)
        for obj in page.objects:
            if obj.type != "image":
                continue
            attrs = [f'src="{escape(obj.src, quote=True)}"']
            if obj.alt:
                attrs.append(f'alt="{escape(obj.alt, quote=True)}"')
            # dims are integral view properties (PageObject.width/height
            # are ``int`` like the HTML width/height attributes they come
            # from, model.py:76-77), so int() is a no-op and an omitted
            # zero parses back to the 0 default — exact round-trip
            if obj.width:
                attrs.append(f'width="{int(obj.width)}"')
            if obj.height:
                attrs.append(f'height="{int(obj.height)}"')
            body.append(f'<img {" ".join(attrs)}>')
    for att in doc.attachments:
        if att.data:
            payload = base64.b64encode(att.data).decode("ascii")
            href = f"data:{att.mime};base64,{payload}"
        else:
            href = att.src
        # explicitly-set params (dates etc.) ride a JSON data-params
        # attribute; the derived Size/CheckSum stay derived (re-computed
        # from the data on both sides of the round trip)
        extra = ""
        if att.params:
            import json
            extra = (' data-params="'
                     + escape(json.dumps(att.params, sort_keys=True),
                              quote=True) + '"')
        # empty anchor text: the attachment records without touching the
        # text flow (htmldoc: anchor text flows into lines)
        body.append(f'<a download="{escape(att.name, quote=True)}" '
                    f'href="{escape(href, quote=True)}"{extra}></a>')
    tail = "</body></html>"
    return ("".join(head) + "".join(body) + tail).encode("utf-8")


def document_from_images(images, one_per_page: bool = True) -> bytes:
    """Build a new document from images — the reference's images->PDF
    builder surface (``PdfDocument.new()`` + one image page each; SURVEY
    S10). *images*: iterables of dicts with ``src`` and optional
    ``alt``/``width``/``height``. Parsing the result yields one page per
    image (``one_per_page``) carrying the image's :class:`PageObject`
    metadata (M14)."""
    parts = ["<html><head><title></title></head><body>"]
    for i, im in enumerate(images):
        if i and one_per_page:
            parts.append("<pb>")
        attrs = [f'src="{escape(im.get("src", ""), quote=True)}"']
        if im.get("alt"):
            attrs.append(f'alt="{escape(im["alt"], quote=True)}"')
        for dim in ("width", "height"):
            if im.get(dim):
                attrs.append(f'{dim}="{int(im[dim])}"')
        parts.append(f'<img {" ".join(attrs)}>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def save_document(doc: Document, dest, password: str | None = None) -> None:
    """Write the serialized document to a path or binary stream
    (``PdfDocument.save`` surface, document.py:247-276); with *password*
    the payload is wrapped in the docmodel encryption convention."""
    data = serialize_document(doc)
    if password is not None:
        from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
        data = encrypt_payload(data, password)
    if hasattr(dest, "write"):
        dest.write(data)
    else:
        with open(dest, "wb") as f:
            f.write(data)


def tile_document(doc: Document, cols: int, rows: int,
                  width: float, height: float) -> Document:
    """N-up imposition — the ``FPDF_ImportNPagesToOne`` analogue behind
    the reference's ``tile`` command (cli/tile.py:76-83): every
    ``cols*rows`` consecutive source pages compose one output sheet of
    ``width``x``height`` pt, tiles filled row-major from the TOP-left
    (PDFium's order), each source page uniformly scaled to fit its cell
    and centered in it.

    Exact under imposition: page grouping, text reading order (tile order
    == reading order), span styling (``line_idx`` re-offset), TOC
    (``page_index`` remapped to sheets) and :class:`PageObject` GEOMETRY —
    bounds are mapped through each tile's fit matrix (scale+translate, so
    axis-aligned stays axis-aligned). Fidelity boundary (module
    docstring): re-PARSING a serialized sheet re-derives line geometry
    from the sheet layout — HTML docmodel text is flow-based, exactly as
    a PDF save drops unreferenced layout state.
    """
    import copy
    import math
    if cols < 1 or rows < 1:
        raise ValueError("cols and rows must be >= 1")
    if not doc.ok:
        raise ValueError(f"cannot tile a failed document "
                         f"(status={doc.status!r})")
    from pypdfium2_ray.docmodel.model import Page
    n_per = cols * rows
    cell_w, cell_h = width / cols, height / rows
    out = Document(
        toc=[copy.copy(e) for e in doc.toc],
        attachments=list(doc.attachments),
        metadata=dict(doc.metadata),
        warnings=list(doc.warnings),
        version=doc.version, tagged=doc.tagged,
        pagemode=doc.pagemode)
    for e in out.toc:
        if e.page_index >= 0:
            e.page_index //= n_per
    n_sheets = max(1, math.ceil(len(doc.pages) / n_per))
    for s in range(n_sheets):
        sheet = Page(index=s, lines=[])
        sheet.set_mediabox(0, 0, width, height)
        for k, src in enumerate(doc.pages[s * n_per:(s + 1) * n_per]):
            r, c = divmod(k, cols)
            pw, ph = src.width, src.height
            scale = min(cell_w / pw, cell_h / ph) if pw and ph else 1.0
            dx = c * cell_w + (cell_w - pw * scale) / 2
            # tiles fill from the TOP row; page coords are bottom-up
            dy = height - (r + 1) * cell_h + (cell_h - ph * scale) / 2
            off = len(sheet.lines)
            sheet.lines.extend(src.lines)
            for sp in src.spans:
                sp2 = copy.copy(sp)
                sp2.line_idx += off
                sheet.spans.append(sp2)
            for ob in src.objects:
                ob2 = copy.copy(ob)
                l, b, rr, t = ob.bounds
                ob2.bounds = (l * scale + dx, b * scale + dy,
                              rr * scale + dx, t * scale + dy)
                sheet.objects.append(ob2)
        out.pages.append(sheet)
    return out
