"""pypdfium2_ray — a Ray-Data-native document / main-content extraction engine.

A from-scratch reimplementation of the query & data-processing capabilities of
``pypdfium2-team/pypdfium2`` (reference snapshot at ``/root/reference``),
re-expressed as Ray Data pipelines over Common-Crawl-style Parquet tables
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Two layers (mirroring the reference's raw/helpers split,
``/root/reference/src/pypdfium2/__init__.py:4-7``):

- :mod:`pypdfium2_ray.docmodel` — pure Python, no Ray: the document model
  (parse bytes -> Document -> Page -> TextPage with chars/charboxes/rects/
  spans, reading-order text, TOC, metadata). Deterministic and unit-testable.
- :mod:`pypdfium2_ray.stages` / :mod:`pypdfium2_ray.pipelines` — thin Ray Data
  stages: stateful ``map_batches`` actor pools over zero-copy Arrow batches,
  skew-aware routing, exact dedup, per-partition checkpointing.

Nothing in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"

from pypdfium2_ray.docmodel.errors import ERR_SUCCESS, ERR_UNKNOWN, ERR_FILE, ERR_FORMAT, ERR_PASSWORD, ERR_SECURITY, ERR_PAGE  # noqa: F401
