"""The flagship extraction stage.

``ExtractText`` is the engine's ``map_batches`` actor class — the Ray-native
form of the reference's per-process worker state (mp pool initializer
re-opening the document + holding saver state, ``cli/render.py:372-395``;
library init-once, ``_library_scope.py:13-29``): parser tables/config are
built once per actor in ``__init__``, each ``__call__`` processes one Arrow
batch of ``(url, html, ...)`` rows and returns one Arrow batch of extracted
rows. Per-row failures become ``(status, err_code)`` values, never exceptions
(document.py:583-585 / extract_images.py:87-88 inverted — error rows, not
errors).

Usage::

    ds.map_batches(ExtractText, batch_format="pyarrow",
                   batch_size=64, concurrency=(2, 8))
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.docmodel.errors import ERR_UNKNOWN
from pypdfium2_ray.docmodel.htmldoc import extract_document_text, parse_document
from pypdfium2_ray.docmodel.layout import DEFAULT_LAYOUT, LayoutParams
from pypdfium2_ray.docmodel.model import METADATA_KEYS

_RECT_T = pa.struct([("l", pa.float32()), ("b", pa.float32()),
                     ("r", pa.float32()), ("t", pa.float32()),
                     ("text", pa.string())])
_CHAR_T = pa.struct([("cp", pa.int32()), ("l", pa.float32()), ("b", pa.float32()),
                     ("r", pa.float32()), ("t", pa.float32()),
                     ("generated", pa.bool_())])
_SPAN_T = pa.struct([("text", pa.string()), ("line_idx", pa.int32()),
                     ("font_size", pa.float32()), ("font_family", pa.string()),
                     ("weight", pa.int32()), ("italic", pa.bool_())])
_OBJ_T = pa.struct([("type", pa.string()), ("level", pa.int32()),
                    ("l", pa.float32()), ("b", pa.float32()),
                    ("r", pa.float32()), ("t", pa.float32()),
                    ("width", pa.int32()), ("height", pa.int32()),
                    ("alt", pa.string()), ("src", pa.string())])
_PAGE_T = pa.struct([
    ("page_idx", pa.int32()),
    ("width", pa.float32()), ("height", pa.float32()),
    ("n_chars", pa.int32()),
    ("text", pa.string()),
    ("rects", pa.list_(_RECT_T)),
    ("chars", pa.list_(_CHAR_T)),
    ("spans", pa.list_(_SPAN_T)),
    ("objects", pa.list_(_OBJ_T)),
])
_TOC_T = pa.struct([("level", pa.int32()), ("title", pa.string()),
                    ("page_index", pa.int32()), ("n_children", pa.int32())])
_ATT_T = pa.struct([("name", pa.string()), ("mime", pa.string()),
                    ("n_bytes", pa.int64()), ("data", pa.binary()),
                    ("src", pa.string())])
_META_T = pa.struct([(k, pa.string()) for k in METADATA_KEYS])

#: Output schema of the flagship stage (FIXTURES.md §2 `cc_extracted`).
EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("status", pa.string()),
    ("err_code", pa.int32()),
    ("n_pages", pa.int32()),
    ("n_chars", pa.int32()),
    ("html_len", pa.int64()),
    ("extracted_text", pa.string()),
    ("pages", pa.list_(_PAGE_T)),
    ("toc", pa.list_(_TOC_T)),
    ("attachments", pa.list_(_ATT_T)),
    ("metadata", _META_T),
    ("warnings", pa.list_(pa.string())),
    # doc-level flags (document.py:222-244): tagged structure, FORMTYPE_*,
    # PAGEMODE_* — scalar columns per SURVEY M17
    ("is_tagged", pa.bool_()),
    ("formtype", pa.int32()),
    ("pagemode", pa.int32()),
])


def add_html_len(batch: pa.Table) -> pa.Table:
    """Cheap vectorized size column for skew routing (pc kernel, zero-copy)."""
    if "html_len" in batch.column_names:
        return batch
    return batch.append_column("html_len", pc.binary_length(batch["html"]).cast(pa.int64()))


class ExtractText:
    """Stateful extract stage: parse ``html`` bytes -> extracted columns.

    Parameters mirror the reference's per-call options surface:

    - ``strategy``: "range" | "bounded" (cli/extract_text.py:35-41)
    - ``password``: document password (document.py:567-568)
    - ``include_pages`` / ``include_rects`` / ``include_charboxes`` /
      ``include_spans``: opt-in detail columns — charboxes are very wide
      (~10^3 structs/page), so they default off (SURVEY §7.4)
    - ``max_toc_depth``: document.py:524 default 15
    """

    def __init__(self, strategy: str = "range", password: str | None = None,
                 include_pages: bool = True, include_rects: bool = True,
                 include_charboxes: bool = False, include_spans: bool = False,
                 include_objects: bool = False, include_attachments: bool = True,
                 flatten_forms: bool = False, content_policy: str = "semantic",
                 max_toc_depth: int = 15, layout: LayoutParams = DEFAULT_LAYOUT):
        self.strategy = strategy
        self.password = password
        #: "semantic" | "density" — DOM-heuristic main-content pick for
        #: pages without <main>/<article> (htmldoc._density_select)
        self.content_policy = content_policy
        self.include_pages = include_pages
        self.include_rects = include_rects
        self.include_charboxes = include_charboxes
        self.include_spans = include_spans
        self.include_objects = include_objects
        self.include_attachments = include_attachments
        #: bake form-field values into page text before extraction (the
        #: reference's init_forms + page.flatten flow, document.py:159-207
        #: + page.py:328-346)
        self.flatten_forms = flatten_forms
        self.max_toc_depth = max_toc_depth
        self.layout = layout

    # one row
    def _extract_one(self, url, warc_ts, lang, html: bytes) -> dict:
        try:
            doc = parse_document(html, password=self.password,
                                 layout=self.layout,
                                 max_toc_depth=self.max_toc_depth,
                                 content_policy=self.content_policy)
        except Exception as exc:  # defensive: parser must not kill the block
            return dict(url=url, warc_ts=warc_ts, lang=lang,
                        status="unknown_error", err_code=ERR_UNKNOWN,
                        n_pages=0, n_chars=0, html_len=len(html or b""),
                        extracted_text="", pages=[], toc=[], attachments=[],
                        metadata={k: "" for k in METADATA_KEYS},
                        warnings=[f"exception: {type(exc).__name__}"],
                        is_tagged=False, formtype=0, pagemode=0)

        if self.flatten_forms and doc.ok and doc.init_forms():
            for p in doc.pages:
                p.flatten()

        pages_out = []
        n_chars_total = 0
        if doc.ok:
            for p in doc.pages:
                tp = p.get_textpage()
                n_chars = tp.count_chars()
                n_chars_total += n_chars
                entry = dict(page_idx=p.index, width=p.width, height=p.height,
                             n_chars=n_chars, text=tp.text, rects=[],
                             chars=[], spans=[], objects=[])
                if self.include_rects:
                    entry["rects"] = [
                        dict(l=r[0], b=r[1], r=r[2], t=r[3], text=tp.rect_text(i))
                        for i, r in enumerate(tp.rects)]
                if self.include_charboxes:
                    entry["chars"] = [
                        dict(cp=ord(tp.text[i]),
                             l=box[0], b=box[1], r=box[2], t=box[3],
                             generated=tp.is_generated(i))
                        for i, box in ((i, tp.get_charbox(i))
                                       for i in range(n_chars))]
                if self.include_spans:
                    entry["spans"] = [
                        dict(text=s.text, line_idx=s.line_idx,
                             font_size=s.font_size, font_family=s.font_family,
                             weight=s.weight, italic=s.italic)
                        for s in p.spans]
                if self.include_objects:
                    # typed pageobject inventory (page.get_objects analogue,
                    # page.py:274-325; image metadata pageobjects.py:337-367)
                    entry["objects"] = [
                        dict(type=o.type, level=o.level,
                             l=o.bounds[0], b=o.bounds[1],
                             r=o.bounds[2], t=o.bounds[3],
                             width=o.width, height=o.height,
                             alt=o.alt, src=o.src)
                        for o in p.objects]
                pages_out.append(entry)

        return dict(
            url=url, warc_ts=warc_ts, lang=lang,
            status=doc.status, err_code=doc.err_code,
            n_pages=len(doc), n_chars=n_chars_total,
            html_len=len(html or b""),
            extracted_text=extract_document_text(doc, self.strategy),
            pages=pages_out if self.include_pages else [],
            toc=[dict(level=e.level, title=e.title, page_index=e.page_index,
                      n_children=e.n_children)
                 for e in doc.get_toc(self.max_toc_depth)],
            attachments=[dict(name=a.name, mime=a.mime, n_bytes=len(a.data),
                              data=a.data, src=a.src)
                         for a in doc.attachments]
                        if self.include_attachments else [],
            metadata=doc.get_metadata_dict(),
            warnings=list(doc.warnings),
            is_tagged=doc.is_tagged(), formtype=doc.get_formtype(),
            pagemode=doc.get_pagemode(),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        ts = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names else [None] * len(urls)
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)
        rows = [self._extract_one(u, t, lg, h)
                for u, t, lg, h in zip(urls, ts, langs, htmls)]
        return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)


def make_extract_fn(**opts):
    """A picklable batch fn holding a per-process warm :class:`ExtractText`
    (the Ray-task analogue of the reference's mp-pool initializer state,
    cli/render.py:372-383; benchmarked ~2x an autoscaling actor pool here).
    Thin wrapper over the shared :func:`pypdfium2_ray.stages.warm.warm_task`
    cache. Prefer this unless the stage needs heavyweight per-actor state —
    then use the ExtractText class directly with ``concurrency=``.
    """
    from pypdfium2_ray.stages.warm import warm_task
    fn = warm_task(ExtractText, **opts)
    fn.__name__ = "extract_fn"
    return fn


def extract_toc(ds, doc_col: str = "doc_id", html_col: str = "html",
                password: str | None = None, max_depth: int = 15):
    """Dataset[(doc_id, level, title, page_index, n_children)] — one row
    per outline entry per document, pre-order (the batch form of the
    reference's ``get_toc`` traversal, document.py:520-559 /
    toc CLI). Error-typed payloads (decode/format/password) parse to an
    empty outline and emit nothing — the error-rows discipline, so a
    corrupted shard shrinks this index instead of poisoning it. Pure
    streaming per-block map, ZERO exchanges; the per-doc Python loop is
    inherent to parse-bound extraction (same shape as
    linkgraph.extract_links)."""
    from pypdfium2_ray.docmodel.htmldoc import parse_document

    def scan(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        levels: list[int] = []
        titles: list[str] = []
        pages: list[int] = []
        kids: list[int] = []
        did = pc.cast(t[doc_col], pa.int64()).to_pylist()
        for i, payload in zip(did, t[html_col].to_pylist()):
            if payload is None:
                continue
            doc = parse_document(bytes(payload), password)
            for e in doc.get_toc(max_depth):
                ids.append(i)
                levels.append(e.level)
                titles.append(e.title)
                pages.append(e.page_index)
                kids.append(e.n_children)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "level": pa.array(levels, pa.int64()),
                         "title": pa.array(titles, pa.string()),
                         "page_index": pa.array(pages, pa.int64()),
                         "n_children": pa.array(kids, pa.int64())})

    return ds.map_batches(scan, batch_format="pyarrow")
