"""Size-based skew routing (north_rule requirement).

The reference has no skew answer — its mp pool assigns pages blindly
(``cli/render.py:521-524``), so one giant page stalls a worker. Crawl blob
sizes are heavy-tailed; here oversized ``html`` payloads are routed to a
dedicated heavy-doc actor pool with a small batch size while the bulk flows
through a wide light pool (SURVEY §4 "Skew / stragglers").

Two compounding mechanisms:

1. Ray Data blocks are *byte*-bounded (``DataContext.target_max_block_size``),
   so with ``batch_size=None`` heavy rows already land in small-row batches.
2. ``split_extract`` adds an explicit two-pool split: ``filter(html_len < thr)``
   -> light pool, ``filter(>= thr)`` -> heavy pool (fewer actors, batch_size
   a few rows, more cpus each), then ``union``.

Scale note: ``split_extract``'s two filter branches each re-evaluate their
upstream lineage — a double scan of the (cheap, column-pruned) read. At
100 TB run :func:`ingest_partitioned` first: ONE streaming pass that
writes hive-partitioned Parquet (``size_class=light|heavy`` directories),
then :func:`split_extract_ingested` points each pool at its own partition
— every input byte is read exactly once, and the partitioned layout is
also the resume unit (``pypdfium2_ray.state.checkpoint``).
"""

from __future__ import annotations

from typing import Any

import pyarrow.compute as pc

from pypdfium2_ray.stages.extract import ExtractText, add_html_len

#: default routing threshold: 256 KiB of html
DEFAULT_HEAVY_THRESHOLD = 256 * 1024


def split_extract(ds, heavy_threshold: int = DEFAULT_HEAVY_THRESHOLD,
                  light_kwargs: dict[str, Any] | None = None,
                  heavy_kwargs: dict[str, Any] | None = None,
                  extract_opts: dict[str, Any] | None = None,
                  mode: str = "tasks"):
    """Route rows by ``html_len`` to a light and a heavy extract stage and
    union the results. ``*_kwargs`` go to ``map_batches`` (batch_size,
    num_cpus, concurrency); ``extract_opts`` to the ExtractText constructor.

    ``mode="tasks"`` (default): stateless tasks with a per-worker-process
    warm extractor (elastic scheduling, no pool ramp — benchmarked ~2x an
    autoscaling actor pool here). ``mode="actors"``: explicit actor pools,
    for when the stage holds heavyweight state.
    """
    from pypdfium2_ray.stages.extract import make_extract_fn
    extract_opts = extract_opts or {}
    if mode == "tasks":
        light_kwargs = dict(batch_size=256) | (light_kwargs or {})
        heavy_kwargs = dict(batch_size=4, num_cpus=2) | (heavy_kwargs or {})
        light_kwargs.pop("concurrency", None)
        heavy_kwargs.pop("concurrency", None)
        light_cls = heavy_cls = make_extract_fn(**extract_opts)
        ctor = {}
    else:
        light_kwargs = dict(batch_size=256, concurrency=(1, 8)) | (light_kwargs or {})
        heavy_kwargs = dict(batch_size=4, concurrency=(1, 2)) | (heavy_kwargs or {})
        light_cls = heavy_cls = ExtractText
        ctor = dict(fn_constructor_kwargs=extract_opts)

    ds = ds.map_batches(add_html_len, batch_format="pyarrow")
    light = ds.map_batches(
        lambda t: t.filter(pc.less(t["html_len"], heavy_threshold)),
        batch_format="pyarrow")
    heavy = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["html_len"], heavy_threshold)),
        batch_format="pyarrow")

    light_out = light.map_batches(light_cls, batch_format="pyarrow",
                                  **ctor, **light_kwargs)
    heavy_out = heavy.map_batches(heavy_cls, batch_format="pyarrow",
                                  **ctor, **heavy_kwargs)
    return light_out.union(heavy_out)


def ingest_partitioned(ds, out_dir: str,
                       heavy_threshold: int = DEFAULT_HEAVY_THRESHOLD):
    """ONE streaming pass over *ds* writing hive-partitioned Parquet:
    ``out_dir/size_class=light/`` and ``size_class=heavy/`` by
    ``html_len`` vs *heavy_threshold*. This is the single-scan ingest the
    module docstring promises — the extraction pools then each read their
    own partition (:func:`split_extract_ingested`) instead of re-scanning
    the source per filter branch. Returns ``out_dir``.
    """
    import pyarrow as pa

    def classify(t):
        cls = pc.if_else(pc.less(t["html_len"], heavy_threshold),
                         pa.scalar("light"), pa.scalar("heavy"))
        return t.append_column("size_class", cls)

    ds = ds.map_batches(add_html_len, batch_format="pyarrow")
    ds = ds.map_batches(classify, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["size_class"])
    return out_dir


def split_extract_ingested(ingest_dir: str,
                           light_kwargs: dict[str, Any] | None = None,
                           heavy_kwargs: dict[str, Any] | None = None,
                           extract_opts: dict[str, Any] | None = None,
                           mode: str = "tasks"):
    """Extraction over an :func:`ingest_partitioned` directory: the light
    and heavy pools each read ONLY their own hive partition (single-scan
    lineage per byte — no duplicate source read in either branch's plan).
    Same pool shaping as :func:`split_extract`.
    """
    import os

    import ray.data as rd

    from pypdfium2_ray.stages.extract import ExtractText, make_extract_fn
    extract_opts = extract_opts or {}
    if mode == "tasks":
        light_kwargs = dict(batch_size=256) | (light_kwargs or {})
        heavy_kwargs = dict(batch_size=4, num_cpus=2) | (heavy_kwargs or {})
        light_kwargs.pop("concurrency", None)
        heavy_kwargs.pop("concurrency", None)
        light_cls = heavy_cls = make_extract_fn(**extract_opts)
        ctor = {}
    else:
        light_kwargs = dict(batch_size=256, concurrency=(1, 8)) | (light_kwargs or {})
        heavy_kwargs = dict(batch_size=4, concurrency=(1, 2)) | (heavy_kwargs or {})
        light_cls = heavy_cls = ExtractText
        ctor = dict(fn_constructor_kwargs=extract_opts)

    outs = []
    for part, cls, kwargs in (("light", light_cls, light_kwargs),
                              ("heavy", heavy_cls, heavy_kwargs)):
        path = os.path.join(ingest_dir, f"size_class={part}")
        if not os.path.isdir(path):            # a corpus can lack heavies
            continue
        part_ds = rd.read_parquet(path)
        outs.append(part_ds.map_batches(cls, batch_format="pyarrow",
                                        **ctor, **kwargs))
    if not outs:
        raise FileNotFoundError(f"no size_class partitions under {ingest_dir}")
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
