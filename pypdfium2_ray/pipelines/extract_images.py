"""Image-object inventory pipeline — the Ray Data shape of
``pypdfium2 extract-images`` (cli/extract_images.py:55-89, SURVEY §3.3).

The reference loops pages, filters IMAGE objects (``page.get_objects(
filter=[FPDF_PAGEOBJ_IMAGE])``, :68-75) and writes one file per image with
per-image error isolation (:87-88). Here: the extract actor emits the typed
object inventory per page, a vectorized explode turns it into one ROW per
image (``url, page_idx, img_idx, width, height, alt, src``) — parquet rows,
not millions of small files — and per-row failures are status rows by
construction.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from pypdfium2_ray.stages.extract import ExtractText


def _explode_images(batch: pa.Table) -> pa.Table:
    """pages.objects -> one row per image object (index-stable numbering,
    mirrors the reference's ``{stem}_{page}_{img}`` naming, :78-79)."""
    out = {"url": [], "page_idx": [], "img_idx": [], "width": [],
           "height": [], "alt": [], "src": []}
    urls = batch["url"].to_pylist()
    pages_col = batch["pages"].to_pylist()
    for url, pages in zip(urls, pages_col):
        for page in pages or []:
            img_idx = 0
            for obj in page["objects"] or []:
                if obj["type"] != "image":
                    continue
                out["url"].append(url)
                out["page_idx"].append(page["page_idx"])
                out["img_idx"].append(img_idx)
                out["width"].append(obj["width"])
                out["height"].append(obj["height"])
                out["alt"].append(obj["alt"])
                out["src"].append(obj["src"])
                img_idx += 1
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "page_idx": pa.array(out["page_idx"], pa.int32()),
        "img_idx": pa.array(out["img_idx"], pa.int32()),
        "width": pa.array(out["width"], pa.int32()),
        "height": pa.array(out["height"], pa.int32()),
        "alt": pa.array(out["alt"], pa.string()),
        "src": pa.array(out["src"], pa.string()),
    })


def extract_images_pipeline(ds, extract_opts: dict[str, Any] | None = None,
                            batch_size: int = 256, concurrency=(1, 8)):
    """cc_pages Dataset -> one row per image object."""
    opts = dict(include_pages=True, include_rects=False,
                include_objects=True) | (extract_opts or {})
    extracted = ds.map_batches(ExtractText, fn_constructor_kwargs=opts,
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=concurrency)
    return extracted.map_batches(_explode_images, batch_format="pyarrow")
