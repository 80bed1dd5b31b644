"""Flagship pipeline: Common-Crawl-style Parquet -> extracted-text table.

The Ray Data shape of ``pypdfium2 extract-text`` (cli/extract_text.py:26-45,
traced in SURVEY §3.1), generalized from one file to a table of documents:

    read_parquet (column-pruned)
      -> [dedup_by_url]                  # the one shuffle (optional)
      -> ExtractText actor pool          # light/heavy split when enabled
      -> write_parquet | return Dataset

Never calls ``ray.init``; fully lazy/streaming — the caller consumes.
"""

from __future__ import annotations

from typing import Any

from pypdfium2_ray.stages.dedup import dedup_by_url
from pypdfium2_ray.stages.extract import ExtractText, add_html_len
from pypdfium2_ray.stages.skew import DEFAULT_HEAVY_THRESHOLD, split_extract

#: input columns the flagship pipeline actually needs — prune at the read
CC_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_cc_pages(path: str | list[str], columns: list[str] | None = None):
    """Column-pruned Parquet read of a cc_pages table."""
    import ray.data as rd
    return rd.read_parquet(path, columns=columns or CC_COLUMNS)


def extract_pipeline(ds=None, path: str | list[str] | None = None,
                     dedup: bool = False, keep: str = "latest",
                     skew_split: bool = True,
                     heavy_threshold: int = DEFAULT_HEAVY_THRESHOLD,
                     extract_opts: dict[str, Any] | None = None,
                     light_kwargs: dict[str, Any] | None = None,
                     heavy_kwargs: dict[str, Any] | None = None,
                     output_path: str | None = None,
                     output_partition_cols: list[str] | None = None,
                     mode: str = "tasks"):
    """Build (and optionally write) the flagship extraction Dataset.

    Returns the Dataset; if ``output_path`` is given, writes partitioned
    Parquet there (a directory of part files — resumable layout) and returns
    None. ``mode``: "tasks" (warm per-worker extractor, default) or
    "actors" (explicit pools) — see :func:`split_extract`.

    ``skew_split``:

    - ``"blocks"`` — single stage, ``batch_size=None``: Ray Data's
      byte-bounded dynamic block splitting means an oversized html blob
      lands in its own small-row-count block -> its own task, so stragglers
      are isolated WITHOUT scanning the input twice. Preferred; tune
      ``DataContext.target_max_block_size`` for html-heavy inputs.
    - ``True`` — explicit two-pool split on ``html_len`` (the upstream scan
      runs once per branch; use when heavy docs also need different
      resources, e.g. ``num_cpus=2``).
    - ``False`` — single stage with a fixed ``batch_size``.

    At 100x scale, avoid the per-branch re-scan entirely: run
    ``stages.skew.ingest_partitioned`` once (single streaming pass writing
    ``size_class=`` hive partitions) and extract with
    ``stages.skew.split_extract_ingested`` — each byte is read once.
    """
    if ds is None:
        assert path is not None, "need ds or path"
        ds = read_cc_pages(path)
    if dedup:
        ds = dedup_by_url(ds, keep=keep)
    if skew_split == "blocks":
        from pypdfium2_ray.stages.extract import make_extract_fn
        kwargs = dict(light_kwargs or {})
        kwargs.pop("concurrency", None)
        kwargs.pop("batch_size", None)
        out = ds.map_batches(add_html_len, batch_format="pyarrow").map_batches(
            make_extract_fn(**(extract_opts or {})),
            batch_format="pyarrow", batch_size=None, **kwargs)
    elif skew_split:
        out = split_extract(ds, heavy_threshold=heavy_threshold,
                            light_kwargs=light_kwargs, heavy_kwargs=heavy_kwargs,
                            extract_opts=extract_opts, mode=mode)
    else:
        from pypdfium2_ray.stages.extract import make_extract_fn
        if mode == "tasks":
            kwargs = dict(batch_size=256) | (light_kwargs or {})
            kwargs.pop("concurrency", None)
            out = ds.map_batches(add_html_len, batch_format="pyarrow").map_batches(
                make_extract_fn(**(extract_opts or {})),
                batch_format="pyarrow", **kwargs)
        else:
            kwargs = dict(batch_size=256, concurrency=(1, 8)) | (light_kwargs or {})
            out = ds.map_batches(add_html_len, batch_format="pyarrow").map_batches(
                ExtractText, fn_constructor_kwargs=extract_opts or {},
                batch_format="pyarrow", **kwargs)
    if output_path is not None:
        if output_partition_cols:
            # hive-partitioned layout (e.g. by lang or status): one
            # directory per key value — resumable/skippable at read time
            out.write_parquet(output_path, partition_cols=output_partition_cols)
        else:
            out.write_parquet(output_path)
        return None
    return out
