"""Render stage — the Ray Data shape of ``pypdfium2 render``
(cli/render.py:401-524, SURVEY §3.2: the reference's only parallel
pipeline).

The reference's mp pool re-opens the doc per worker and saves one image
file per page; here each task parses the doc, rasterizes every page
(:func:`pypdfium2_ray.docmodel.bitmap.render_page` — deterministic grid
raster), encodes PNG (stdlib engine, ``functions/png.py``) and emits one
ROW per page: ``(url, page_idx, width, height, format, data)``. Parquet
rows instead of a million small files; per-row failures are status rows.

Rendering is CPU-heavy with large binary outputs: keep ``batch_size``
small (bitmaps are ~w*h bytes each — SURVEY §4 memory row).
"""

from __future__ import annotations

import pyarrow as pa

from pypdfium2_ray.docmodel.bitmap import render_page
from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.layout import DEFAULT_LAYOUT, LayoutParams
from pypdfium2_ray.functions.png import encode_png
from pypdfium2_ray.functions.pnm import encode_pnm

RENDERED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("page_idx", pa.int32()),
    ("status", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("format", pa.string()),     # an ENGINES key
    ("data", pa.binary()),
])

#: saver-engine registry (X2 — the reference's engine hierarchy,
#: cli/render.py engine selection): name -> Bitmap -> payload bytes.
#: Register custom engines with :func:`register_engine`.
ENGINES = {
    "png": lambda bmp: encode_png(bmp.to_numpy(), pixel_format=bmp.mode),
    "pnm": lambda bmp: encode_pnm(bmp.to_numpy()),
    "raw": lambda bmp: bmp.to_bytes(),
}


def register_engine(name: str, fn) -> None:
    """Add/override a saver engine (``fn(bitmap) -> bytes``)."""
    ENGINES[name] = fn


class RenderPages:
    """Batch fn/actor: cc_pages rows -> one rendered row per page."""

    def __init__(self, scale: float = 1.0, rotation: int = 0,
                 encoder: str = "png", password: str | None = None,
                 layout: LayoutParams = DEFAULT_LAYOUT,
                 pages: str | None = None):
        self.scale = scale
        self.rotation = rotation
        self.encoder = encoder
        self.password = password
        self.layout = layout
        # CLI-style page selection ("1,3-5", 1-based; functions/units);
        # indices beyond a document's page count are skipped per doc
        # (corpus rows have varying page counts — an error would poison
        # whole batches for a per-doc condition)
        if pages:
            from pypdfium2_ray.functions.units import parse_page_range
            self.page_set: set[int] | None = set(parse_page_range(pages))
        else:
            self.page_set = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            doc = parse_document(html, password=self.password,
                                 layout=self.layout)
            if not doc.ok:
                rows.append(dict(url=url, page_idx=-1, status=doc.status,
                                 width=0, height=0, format="", data=b""))
                continue
            for page in doc.pages:
                if self.page_set is not None and page.index not in self.page_set:
                    continue
                bmp = render_page(page, scale=self.scale,
                                  rotation=self.rotation)
                data = ENGINES[self.encoder](bmp)
                rows.append(dict(url=url, page_idx=page.index, status="ok",
                                 width=bmp.width, height=bmp.height,
                                 format=self.encoder, data=data))
        return pa.Table.from_pylist(rows, schema=RENDERED_SCHEMA)


def render_pipeline(ds, scale: float = 1.0, rotation: int = 0,
                    encoder: str = "png", batch_size: int = 16,
                    concurrency=(1, 8), pages: str | None = None,
                    **mb_kwargs):
    """cc_pages Dataset -> rendered page rows (actor pool: render carries
    real per-call state cost, and small batches bound bitmap memory)."""
    return ds.map_batches(
        RenderPages,
        fn_constructor_kwargs=dict(scale=scale, rotation=rotation,
                                   encoder=encoder, pages=pages),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **mb_kwargs)
