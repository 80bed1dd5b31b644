"""CLI — the engine's analogue of the ``pypdfium2`` command
(``src/pypdfium2_cli/__main__.py:25-108``, subcommand registry X5).

Subcommands operate on Common-Crawl-style parquet instead of single PDFs:

    python -m pypdfium2_ray extract-text  IN.parquet -o OUT_DIR [--strategy bounded]
    python -m pypdfium2_ray extract-images IN.parquet -o OUT_DIR
    python -m pypdfium2_ray render        IN.parquet -o OUT_DIR [--scale S] [--rotation R]
    python -m pypdfium2_ray toc           IN.parquet            # prints outlines
    python -m pypdfium2_ray pdfinfo      IN.parquet             # prints doc info
    python -m pypdfium2_ray fixtures     -o cc_pages.parquet [--synthetic N]

The CLI owns its Ray session (guarded init, ``ray.shutdown`` on exit) —
library code and ``__ray_entry__`` never init Ray.
"""

from __future__ import annotations

import argparse
import sys


class _RaySession:
    """Guarded Ray handle: ``shutdown()`` only tears down a session THIS
    command created. When a session already exists (tests invoking
    ``main()`` in-process, a long-lived driver), the CLI must not kill
    it — shutting a shared session down orphans every live actor handle
    (the warmpool cache, other pipelines' lineage) and the next auto-init
    silently starts a fresh cluster."""

    def __init__(self, ray, owns: bool):
        self._ray = ray
        self._owns = owns

    def shutdown(self):
        if self._owns:
            self._ray.shutdown()


def _init_ray() -> _RaySession:
    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return _RaySession(ray, owns)


def _read(path: str):
    import ray.data as rd
    return rd.read_parquet(path)


def cmd_extract_text(args) -> int:
    ray = _init_ray()
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    opts = dict(strategy=args.strategy, password=args.password)
    if args.checkpoint:
        # resumable mode: one manifest record + output dir per input shard;
        # rerunning after a failure skips finished shards (state/checkpoint)
        import os
        from pypdfium2_ray.state import run_checkpointed, shard_inputs
        if os.path.isdir(args.input):
            shards = shard_inputs(args.input)
        else:
            shards = [(os.path.splitext(os.path.basename(args.input))[0],
                       args.input)]
        summary = run_checkpointed(
            shards,
            lambda p: extract_pipeline(path=p, dedup=args.dedup,
                                       skew_split="blocks", extract_opts=opts),
            args.output)
        print(f"ran={len(summary['ran'])} skipped={len(summary['skipped'])} "
              f"done={summary['total_done']}")
    else:
        extract_pipeline(path=args.input, dedup=args.dedup,
                         skew_split="blocks", extract_opts=opts,
                         output_path=args.output)
    ray.shutdown()
    return 0


def cmd_extract_images(args) -> int:
    ray = _init_ray()
    from pypdfium2_ray.pipelines.extract_images import extract_images_pipeline
    extract_images_pipeline(_read(args.input)).write_parquet(args.output)
    ray.shutdown()
    return 0


def cmd_render(args) -> int:
    ray = _init_ray()
    from pypdfium2_ray.stages.render import render_pipeline
    render_pipeline(_read(args.input), scale=args.scale,
                    rotation=args.rotation,
                    pages=args.pages).write_parquet(args.output)
    ray.shutdown()
    return 0


def cmd_toc(args) -> int:
    """Print outlines like ``pypdfium2 toc`` (cli/toc.py:61-86 format:
    indent by level, ``[{count:+}|*] title -> page``; HTML outlines are
    always 'open' so the count sign is always +)."""
    ray = _init_ray()
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    ds = extract_pipeline(path=args.input, skew_split=False,
                          extract_opts=dict(include_pages=False,
                                            include_rects=False))
    for row in ds.select_columns(["url", "toc"]).sort("url").iter_rows():
        print(f"# {row['url']}")
        for e in row["toc"] or []:
            count_str = f"+{e['n_children']}" if e["n_children"] else "*"
            print("    " * e["level"]
                  + f"[{count_str}] {e['title']} -> {e['page_index'] + 1}")
    ray.shutdown()
    return 0


def cmd_pdfinfo(args) -> int:
    """Doc info like ``pypdfium2 pdfinfo`` (cli/info.py): page count,
    metadata, page sizes."""
    ray = _init_ray()
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    ds = extract_pipeline(path=args.input, skew_split=False,
                          extract_opts=dict(include_rects=False))
    cols = ["url", "status", "n_pages", "n_chars", "metadata", "pages",
            "is_tagged", "formtype", "pagemode"]
    from pypdfium2_ray.docmodel.model import FORMTYPE_TO_STR, PAGEMODE_TO_STR
    for row in ds.select_columns(cols).sort("url").iter_rows():
        print(f"# {row['url']}  status={row['status']}  "
              f"pages={row['n_pages']}  chars={row['n_chars']}")
        print(f"    tagged={row['is_tagged']}  "
              f"formtype={FORMTYPE_TO_STR.get(row['formtype'], '?')}  "
              f"pagemode={PAGEMODE_TO_STR.get(row['pagemode'], '?')}")
        for k, v in (row["metadata"] or {}).items():
            if v:
                print(f"    {k}: {v}")
        for p in (row["pages"] or [])[:10]:
            print(f"    page {p['page_idx'] + 1}: "
                  f"{p['width']:.0f} x {p['height']:.0f}, {p['n_chars']} chars")
    ray.shutdown()
    return 0


def cmd_attachments(args) -> int:
    """List attachments like ``pypdfium2 attachments list``
    (cli/attachments.py:57-59: ``[i+1] name``), or extract to parquet rows
    with -o."""
    ray = _init_ray()
    from pypdfium2_ray.pipelines.extract_attachments import (
        extract_attachments_pipeline)
    out = extract_attachments_pipeline(_read(args.input))
    if args.output:
        out.write_parquet(args.output)
    else:
        for row in out.select_columns(["url", "att_idx", "name"]) \
                      .sort(["url", "att_idx"]).iter_rows():
            if row["att_idx"] == 0:
                print(f"# {row['url']}")
            print(f"[{row['att_idx'] + 1}] {row['name']}")
    ray.shutdown()
    return 0


def cmd_fonts(args) -> int:
    """List per-document fonts like ``pypdfium2 fonts`` (cli/fonts.py:
    one line per distinct font with usage counts; the reference dedups by
    raw address, we dedup by resolved identity). Face names resolve
    through the sysfont handler chain (docmodel/sysfont — the
    sysfontinfo.py analogue), so an installed handler rewrites them."""
    ray = _init_ray()
    import pyarrow as pa

    def fonts_of(batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.htmldoc import parse_document
        from pypdfium2_ray.docmodel.sysfont import resolve_face
        out = {"url": [], "face": [], "size": [], "weight": [],
               "italic": [], "n_spans": []}
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            try:
                doc = parse_document(html or b"")
            except Exception:
                continue
            counts: dict[tuple, int] = {}
            for page in doc.pages:
                for sp in page.spans:
                    key = (resolve_face(sp.font_family, sp.weight,
                                        sp.italic),
                           sp.font_size, sp.weight, sp.italic)
                    counts[key] = counts.get(key, 0) + 1
            for (face, size, weight, italic), n in sorted(counts.items()):
                out["url"].append(url)
                out["face"].append(face)
                out["size"].append(size)
                out["weight"].append(weight)
                out["italic"].append(italic)
                out["n_spans"].append(n)
        return pa.table({"url": pa.array(out["url"], pa.string()),
                         "face": pa.array(out["face"], pa.string()),
                         "size": pa.array(out["size"], pa.float64()),
                         "weight": pa.array(out["weight"], pa.int32()),
                         "italic": pa.array(out["italic"], pa.bool_()),
                         "n_spans": pa.array(out["n_spans"], pa.int64())})

    ds = _read(args.input).map_batches(fonts_of, batch_format="pyarrow")
    for row in ds.sort(["url", "face", "size"]).iter_rows():
        style = f"w{row['weight']}" + (" italic" if row["italic"] else "")
        print(f"{row['url']}  {row['face']}  {row['size']:.0f}pt {style}  "
              f"x{row['n_spans']}")
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Corpus dedup over a parquet table with (id, text) columns."""
    _init_ray()
    ds = _read(args.input)
    if args.method == "exact":
        from pypdfium2_ray.stages.dedup import distinct_rows
        out = distinct_rows(ds, [args.text_col])
    elif args.method == "span":
        from pypdfium2_ray.stages.dedup import span_dedup
        out = span_dedup(ds, id_col=args.id_col, text_col=args.text_col,
                         span_tokens=args.span_tokens)
    else:  # minhash: pairs -> components -> keep min id per cluster
        from pypdfium2_ray.stages.components import connected_components
        from pypdfium2_ray.stages.dedup import minhash_dup_pairs
        from pypdfium2_ray.stages.join import key_filter_join
        pairs = minhash_dup_pairs(
            ds, id_col=args.id_col, text_col=args.text_col,
            threshold=args.threshold).select_columns(["id_a", "id_b"])
        cc = connected_components(pairs).materialize()
        losers = cc.filter(expr="doc_id != component") \
            .select_columns(["doc_id"])
        out = key_filter_join(ds, losers, args.id_col,
                              right_key="doc_id", mode="anti")
    out.write_parquet(args.output)
    print(args.output)
    return 0


def cmd_decontam(args) -> int:
    """Benchmark decontamination: drop corpus rows that leak a held-out
    set (one prompt per line in ``--heldout``), at the chosen tier —
    ``hash`` (exact text match via MD5 fingerprints), ``substring``
    (verbatim phrase containment), ``ngram`` (word n-gram overlap, the
    GPT-3 appendix-C discipline)."""
    _init_ray()
    with open(args.heldout, encoding="utf-8") as f:
        prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
    if not prompts:
        raise SystemExit("decontam: held-out file is empty")
    ds = _read(args.input)
    if args.method == "hash":
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        from pypdfium2_ray.functions.text import fingerprint_md5
        bad = pa.array(sorted({hashlib.md5(p.encode()).hexdigest()
                               for p in prompts}))

        def keep(t: "pa.Table") -> "pa.Table":
            fp = fingerprint_md5(t[args.text_col])
            return t.filter(pc.invert(pc.is_in(fp, value_set=bad)))

        out = ds.map_batches(keep, batch_format="pyarrow")
    elif args.method == "substring":
        from pypdfium2_ray.stages.join import key_filter_join
        from pypdfium2_ray.stages.textstats import substring_scan
        hits = substring_scan(ds, prompts, doc_col=args.id_col,
                              text_col=args.text_col) \
            .select_columns([args.id_col])
        out = key_filter_join(ds, hits, args.id_col, mode="anti")
    else:  # ngram
        from pypdfium2_ray.stages.textstats import ngram_decontaminate
        out = ngram_decontaminate(ds, prompts, n=args.ngram,
                                  doc_col=args.id_col,
                                  text_col=args.text_col)
    out.write_parquet(args.output)
    print(args.output)
    return 0


def cmd_shuffle(args) -> int:
    """Deterministic hash-shuffled export (shard= hive directories)."""
    _init_ray()
    from pypdfium2_ray.stages.shuffle import write_shuffled
    write_shuffled(_read(args.input), args.output, key_col=args.id_col,
                   n_shards=args.shards)
    print(args.output)
    return 0


def cmd_arrange(args) -> int:
    """Merge selected pages across input corpora, PER URL — the
    distributed form of ``pypdfium2 arrange`` (cli/arrange.py:33-48:
    sequential ``import_pages`` of each input's selected pages into a new
    document, saved): inputs align positionally with ``--pages`` specs
    ('_' placeholder = all pages) and ``--passwords``; for every url the
    inputs' documents contribute their selected pages in input order.
    One url exchange; document assembly is per-group by nature."""
    _init_ray()
    import pyarrow as pa

    from pypdfium2_ray.stages.exchange import partition_map

    pages = list(args.pages or [])
    pages += ["_"] * (len(args.inputs) - len(pages))
    pwds = list(args.passwords or [])
    pwds += ["_"] * (len(args.inputs) - len(pwds))

    def tag(i):
        def f(t: pa.Table) -> pa.Table:
            return t.select(["url", "html"]).append_column(
                "__src", pa.array([i] * t.num_rows, pa.int32()))
        return f

    import ray.data as rd
    tagged = [rd.read_parquet(p, columns=["url", "html"])
              .map_batches(tag(i), batch_format="pyarrow")
              for i, p in enumerate(args.inputs)]
    ds = tagged[0]
    for t in tagged[1:]:
        ds = ds.union(t)

    def assemble(t: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.htmldoc import parse_document
        from pypdfium2_ray.docmodel.model import Document
        from pypdfium2_ray.docmodel.serialize import serialize_document
        from pypdfium2_ray.functions.units import parse_page_range
        t = t.sort_by([("url", "ascending"), ("__src", "ascending")])
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        srcs = t["__src"].to_pylist()
        out = {"url": [], "html": [], "n_pages": [], "status": []}
        i, n = 0, len(urls)
        while i < n:
            j = i
            dest = Document.new()
            status = "ok"
            while j < n and urls[j] == urls[i]:
                src_i = srcs[j]
                pw = None if pwds[src_i] == "_" else pwds[src_i]
                doc = parse_document(htmls[j] or b"", password=pw)
                if not doc.ok:
                    status = doc.status
                    j += 1
                    continue
                spec = pages[src_i]
                sel = (None if spec == "_"
                       else parse_page_range(spec, len(doc)))
                dest.import_pages(doc, pages=sel)
                j += 1
            out["url"].append(urls[i])
            out["html"].append(serialize_document(dest)
                               if dest.pages else b"")
            out["n_pages"].append(len(dest))
            out["status"].append(status)
            i = j
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "html": pa.array(out["html"], pa.binary()),
            "n_pages": pa.array(out["n_pages"], pa.int32()),
            "status": pa.array(out["status"], pa.string())})

    partition_map(ds, ["url"], assemble).write_parquet(args.output)
    print(args.output)
    return 0


def cmd_tile(args) -> int:
    """N-up imposition over a corpus — ``pypdfium2 tile``
    (cli/tile.py:76-83 ``FPDF_ImportNPagesToOne``) as one streaming
    map_batches: parse -> :func:`docmodel.serialize.tile_document` ->
    re-serialize, target sheet size in pt/mm/cm/in like the reference."""
    _init_ray()
    import pyarrow as pa

    from pypdfium2_ray.functions.units import to_pt
    w = to_pt(args.width, args.unit)
    h = to_pt(args.height, args.unit)
    cols, rows = args.cols, args.rows

    def tile_batch(t: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.htmldoc import parse_document
        from pypdfium2_ray.docmodel.serialize import (
            serialize_document, tile_document)
        out = {"url": [], "html": [], "n_pages": [], "status": []}
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            doc = parse_document(html or b"")
            if doc.ok:
                tiled = tile_document(doc, cols, rows, w, h)
                payload, np_, st = (serialize_document(tiled),
                                    len(tiled), "ok")
            else:
                payload, np_, st = b"", 0, doc.status
            out["url"].append(url)
            out["html"].append(payload)
            out["n_pages"].append(np_)
            out["status"].append(st)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "html": pa.array(out["html"], pa.binary()),
            "n_pages": pa.array(out["n_pages"], pa.int32()),
            "status": pa.array(out["status"], pa.string())})

    _read(args.input).map_batches(
        tile_batch, batch_format="pyarrow").write_parquet(args.output)
    print(args.output)
    return 0


def cmd_imgtopdf(args) -> int:
    """Images -> documents, one document per group key — ``pypdfium2
    imgtopdf`` (cli/imgtopdf.py:30-64: one image page each) over the
    ``extract-images`` row table: group rows by ``--group-col`` (default
    url), build each group's document with
    :func:`docmodel.serialize.document_from_images` (pages ordered by
    (page_idx, img_idx)). One exchange on the group key."""
    _init_ray()
    import pyarrow as pa

    from pypdfium2_ray.stages.exchange import partition_map
    key = args.group_col

    def build(t: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.serialize import document_from_images
        t = t.sort_by([(key, "ascending"), ("page_idx", "ascending"),
                       ("img_idx", "ascending")])
        keys = t[key].to_pylist()
        rows = t.to_pylist()
        out = {"key": [], "html": [], "n_images": []}
        i, n = 0, len(keys)
        while i < n:
            j = i
            imgs = []
            while j < n and keys[j] == keys[i]:
                imgs.append(rows[j])
                j += 1
            out["key"].append(keys[i])
            out["html"].append(document_from_images(imgs))
            out["n_images"].append(j - i)
            i = j
        return pa.table({
            key: pa.array(out["key"], pa.string()),
            "html": pa.array(out["html"], pa.binary()),
            "n_images": pa.array(out["n_images"], pa.int32())})

    partition_map(_read(args.input), [key], build).write_parquet(args.output)
    print(args.output)
    return 0


def cmd_pageobjects(args) -> int:
    """Print the typed pageobject inventory — ``pypdfium2 pageobjects``
    (cli/pageobjects.py:90-123 format: per-page header, per-object type
    line indented by level, Bounding Box / Quad Points under --info pos,
    image metadata under --info imginfo, repr'd text under --info
    text)."""
    ray = _init_ray()
    from pypdfium2_ray.functions.units import round_list
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    show = set(args.info)
    ds = extract_pipeline(path=args.input, skew_split=False,
                          extract_opts=dict(include_pages=True,
                                            include_rects=False,
                                            include_objects=True))
    total = 0
    for row in ds.select_columns(["url", "pages"]).sort("url").iter_rows():
        print(f"# {row['url']}")
        for p in row["pages"] or []:
            objs = [o for o in p["objects"] or []
                    if not args.filter or o["type"] in args.filter]
            if not objs:
                continue
            print(f"# Page {p['page_idx'] + 1}")
            for o in objs:
                pad0 = "    " * o["level"]
                pad1 = pad0 + "    "
                print(pad0 + o["type"])
                if "pos" in show:
                    bounds = round_list(
                        [o["l"], o["b"], o["r"], o["t"]], args.n_digits)
                    print(pad1 + f"Bounding Box: {bounds}")
                if "imginfo" in show and o["type"] == "image":
                    print(pad1 + f"width: {o['width']}")
                    print(pad1 + f"height: {o['height']}")
                    if o["alt"]:
                        print(pad1 + f"alt: {o['alt']}")
                    if o["src"]:
                        print(pad1 + f"src: {o['src']}")
            print(f"-> Count: {len(objs)}\n")
            total += len(objs)
    if total:
        print(f"-> Total count: {total}")
    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    """First-mile ingest: a directory of WARC shards -> cc_pages parquet,
    resumable per shard (state/checkpoint manifest + lineage; rerunning
    after a crash skips finished shards). Optionally runs extraction in
    the same pass (--extract), so crawl containers stream straight to the
    extracted table without an intermediate copy."""
    _init_ray()
    from pypdfium2_ray.sources.warc import read_warc
    from pypdfium2_ray.state import run_checkpointed, shard_inputs

    shards = shard_inputs(args.input, pattern=".warc.gz",
                          group_size=args.group_size)
    shards += [s for s in shard_inputs(args.input, pattern=".warc",
                                       group_size=args.group_size)
               if not str(s[1]).endswith(".warc.gz")]
    if not shards:
        raise SystemExit(f"ingest: no .warc/.warc.gz files in {args.input}")

    if args.extract:
        from pypdfium2_ray.docmodel.layout import LayoutParams
        from pypdfium2_ray.pipelines.extract_text import extract_pipeline

        def pipeline(path):
            return extract_pipeline(
                ds=read_warc(path), skew_split="blocks",
                extract_opts=dict(include_pages=False, include_rects=False,
                                  content_policy=args.content_policy,
                                  layout=LayoutParams(page_width=1e9)))
    else:
        def pipeline(path):
            return read_warc(path)

    # non-extract output has no status column; _count_errors treats a
    # missing column as zero errors
    summary = run_checkpointed(shards, pipeline, args.output)
    print(f"ran={len(summary['ran'])} skipped={len(summary['skipped'])} "
          f"done={summary['total_done']}")
    return 0


def cmd_curate(args) -> int:
    """The end-to-end training-data journey as one command: crawl parquet
    -> flagship extraction (density content policy for wild pages) ->
    quality gate -> exact content dedup (keep-first per fingerprint) ->
    deterministic hash-sharded export. Each stage is the already-tested
    primitive; this subcommand is the composition a user of the
    reference would actually run against a crawl dump."""
    _init_ray()
    import pyarrow as pa
    import pyarrow.compute as pc

    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.functions.text import fingerprint_md5
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.stages.dedup import dedup_by_url
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.shuffle import write_shuffled
    from pypdfium2_ray.stages.textstats import quality_filter

    ds = extract_pipeline(
        path=args.input, dedup=args.url_dedup, skew_split="blocks",
        extract_opts=dict(include_pages=False, include_rects=False,
                          content_policy=args.content_policy,
                          layout=LayoutParams(page_width=1e9)))
    ok = ds.filter(expr="status == 'ok'") \
           .select_columns(["url", "warc_ts", "lang", "n_chars",
                            "extracted_text"])
    gated = quality_filter(ok, col="extracted_text",
                           min_tokens=args.min_tokens)

    def fp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "fingerprint", fingerprint_md5(t["extracted_text"]))

    def keep_first(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        t = t.sort_by([("fingerprint", "ascending"), ("url", "ascending")])
        fps = t["fingerprint"].to_numpy(zero_copy_only=False)
        import numpy as np
        first = np.ones(len(fps), dtype=bool)
        first[1:] = fps[1:] != fps[:-1]
        return t.filter(pa.array(first))

    deduped = partition_map(
        gated.map_batches(fp, batch_format="pyarrow"),
        ["fingerprint"], keep_first)
    write_shuffled(deduped, args.output, key_col="url",
                   n_shards=args.shards)
    print(args.output)
    return 0


def cmd_fixtures(args) -> int:
    from pypdfium2_ray.sources.fixtures import write_cc_parquet
    write_cc_parquet(args.output, n_synthetic=args.synthetic)
    print(args.output)
    return 0


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pypdfium2_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, output=True):
        sp.add_argument("input", help="input cc_pages parquet (file or dir)")
        if output:
            sp.add_argument("-o", "--output", required=True,
                            help="output parquet directory")

    sp = sub.add_parser("extract-text", help="flagship text extraction")
    common(sp)
    sp.add_argument("--strategy", choices=["range", "bounded"], default="range")
    sp.add_argument("--password", default=None)
    sp.add_argument("--dedup", action="store_true", help="url dedup first")
    sp.add_argument("--checkpoint", action="store_true",
                    help="resumable per-shard run with lineage manifest")
    sp.set_defaults(fn=cmd_extract_text)

    sp = sub.add_parser("extract-images", help="one row per image object")
    common(sp)
    sp.set_defaults(fn=cmd_extract_images)

    sp = sub.add_parser("render", help="rasterize pages to PNG rows")
    common(sp)
    sp.add_argument("--scale", type=float, default=1.0)
    sp.add_argument("--rotation", type=int, default=0,
                    choices=[0, 90, 180, 270])
    sp.add_argument("--pages", default=None,
                    help="1-based page selection, e.g. '1,3-5'")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("attachments", help="list or extract embedded files")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", default=None,
                    help="write rows to parquet instead of listing")
    sp.set_defaults(fn=cmd_attachments)

    sp = sub.add_parser("toc", help="print outlines")
    common(sp, output=False)
    sp.set_defaults(fn=cmd_toc)

    sp = sub.add_parser("pdfinfo", help="print document info")
    common(sp, output=False)
    sp.set_defaults(fn=cmd_pdfinfo)

    sp = sub.add_parser("fonts", help="list per-document fonts")
    common(sp, output=False)
    sp.set_defaults(fn=cmd_fonts)

    sp = sub.add_parser("dedup", help="corpus dedup (exact/span/minhash)")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--method", choices=["exact", "span", "minhash"],
                    default="exact")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--span-tokens", type=int, default=10)
    sp.add_argument("--threshold", type=float, default=0.7)
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser("decontam",
                        help="drop rows leaking a held-out set "
                             "(hash/substring/ngram tiers)")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--heldout", required=True,
                    help="text file, one held-out prompt per line")
    sp.add_argument("--method", choices=("hash", "substring", "ngram"),
                    default="ngram")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--ngram", type=int, default=3,
                    help="n-gram size for --method ngram")
    sp.set_defaults(fn=cmd_decontam)

    sp = sub.add_parser("shuffle",
                        help="deterministic hash-shuffled export")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--shards", type=int, default=16)
    sp.set_defaults(fn=cmd_shuffle)

    sp = sub.add_parser("arrange",
                        help="merge selected pages across corpora per url")
    sp.add_argument("inputs", nargs="+",
                    help="sequence of cc_pages parquet inputs")
    sp.add_argument("--pages", nargs="+", default=[],
                    help="page spec per input, '_' = all (e.g. '1,3-5')")
    sp.add_argument("--passwords", nargs="+", default=[],
                    help="password per input, '_' = none")
    sp.add_argument("-o", "--output", required=True)
    sp.set_defaults(fn=cmd_arrange)

    sp = sub.add_parser("tile", help="N-up page imposition")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--rows", "-r", type=int, required=True)
    sp.add_argument("--cols", "-c", type=int, required=True)
    sp.add_argument("--width", type=float, required=True)
    sp.add_argument("--height", type=float, required=True)
    sp.add_argument("--unit", "-u", default="mm",
                    choices=["pt", "mm", "cm", "in"])
    sp.set_defaults(fn=cmd_tile)

    sp = sub.add_parser("imgtopdf",
                        help="build documents from extract-images rows")
    sp.add_argument("input", help="extract-images parquet (file or dir)")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--group-col", default="url")
    sp.set_defaults(fn=cmd_imgtopdf)

    sp = sub.add_parser("pageobjects", help="print pageobject inventory")
    common(sp, output=False)
    sp.add_argument("--filter", nargs="+", default=None,
                    choices=["text", "image"])
    sp.add_argument("--info", nargs="+", default=["pos", "imginfo", "text"],
                    choices=["pos", "imginfo", "text"])
    sp.add_argument("--n-digits", type=int, default=4)
    sp.set_defaults(fn=cmd_pageobjects)

    sp = sub.add_parser("ingest",
                        help="WARC dir -> parquet (resumable per shard)")
    sp.add_argument("input", help="directory of .warc/.warc.gz shards")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--extract", action="store_true",
                    help="run extraction in the same pass")
    sp.add_argument("--content-policy", default="semantic",
                    choices=["semantic", "density"])
    sp.add_argument("--group-size", type=int, default=1,
                    help="WARC files per checkpoint shard")
    sp.set_defaults(fn=cmd_ingest)

    sp = sub.add_parser("curate",
                        help="extract -> quality gate -> dedup -> "
                             "shuffled shards, end to end")
    sp.add_argument("input")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--content-policy", default="density",
                    choices=["semantic", "density"])
    sp.add_argument("--min-tokens", type=int, default=10)
    sp.add_argument("--url-dedup", action="store_true")
    sp.add_argument("--shards", type=int, default=16)
    sp.set_defaults(fn=cmd_curate)

    sp = sub.add_parser("fixtures", help="write the fixture corpus")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--synthetic", type=int, default=0)
    sp.set_defaults(fn=cmd_fixtures)

    return p


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
