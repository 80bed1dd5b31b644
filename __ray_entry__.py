"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data curation ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column names,
same rounding). Ray is initialised by the driver BEFORE this module is
imported — nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

SF0001 = "/root/testdata/sf0.001"

#: literal search term for the corpus-search query (textpage.py:255-292 analogue)
SEARCH_TERM = "data"
#: cosine near-dup threshold (probed: no pair within 1e-4 of it at sf<=0.1)
DUP_TAU = 0.45
#: ANN query ids
ANN_QUERY_IDS = (0, 1, 2)
ANN_K = 10


# ---------------------------------------------------------------------------
# helpers

def _docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                           columns=columns)


def _hint(sf_dir: str, table: str = "documents"):
    """Size the query's hash-exchange partitions from its input bytes
    (exchange.partitions_for_bytes) — at test/bench scale this keeps
    exchanges small (the per-partition fixed cost dominates tiny inputs);
    at 100 TB the same rule yields ~64 MB partitions."""
    import os
    from pypdfium2_ray.stages.exchange import partition_hint, partitions_for_bytes
    try:
        sz = os.path.getsize(f"{sf_dir.rstrip('/')}/{table}.parquet")
    except OSError:
        sz = 0
    return partition_hint(partitions_for_bytes(sz))


def _cast_i64(ds, cols: list[str]):
    """Cast int32-ish columns to int64 so schemas match DuckDB's BIGINT."""
    def f(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.cast(t[c], pa.int64()))
        return t
    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# flagship extraction (reference semantics; SURVEY §3.1)

def _extract(sf_dir: str, strategy: str = "range"):
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir)
    # wide page so the synthesized documents' long text lines never
    # overflow the page bbox (the bounded strategy clips at the bbox,
    # textpage.py:52-85 — with the default 595pt page a >74-char line
    # would be truncated)
    layout = LayoutParams(page_width=1e9)
    out = extract_pipeline(
        ds=ds, skew_split=True,
        extract_opts=dict(strategy=strategy, include_pages=False,
                          include_rects=False, layout=layout))
    out = out.select_columns(["url", "lang", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])


def q_extract_text(sf_dir: str):
    return _extract(sf_dir, "range")


def q_extract_bounded(sf_dir: str):
    """Bounded-rect strategy over the full page bbox — must equal the range
    strategy byte-for-byte (the reference's own invariant,
    tests/test_textpage.py:26-29)."""
    ds = _extract(sf_dir, "bounded")
    return ds.select_columns(["url", "extracted_text"])


def q_density_extract(sf_dir: str):
    """The DOM-heuristic content policy over the WILD-crawl corpus shape:
    the same documents synthesized WITHOUT <main> (boilerplate as
    link-dense divs plus a positive-scoring plain banner div,
    cc_from_documents wrap='divs') extracted with
    content_policy='density' — the link-density segment scorer must
    recover byte-identical text to the semantic corpus, so the flagship
    extraction SQL is its oracle. The semantic policy on this corpus
    provably differs (boilerplate leaks; tested in test_htmldoc.py)."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir, wrap="divs")
    with _hint(sf_dir):
        out = extract_pipeline(
            ds=ds, skew_split="blocks",
            extract_opts=dict(include_pages=False, include_rects=False,
                              content_policy="density",
                              layout=LayoutParams(page_width=1e9)))
    out = out.select_columns(["url", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])


def q_tile_extract(sf_dir: str):
    """Distributed document re-assembly end-to-end: parse each ok crawl
    page, impose BOTH its pages onto one 2x1 sheet
    (docmodel.serialize.tile_document — the FPDF_ImportNPagesToOne
    analogue), SERIALIZE the result, re-parse the serialized bytes and
    extract — exercising tile + save + reopen in one streaming stage.
    The oracle composes the single-sheet text from the synthesis: tile
    order == reading order, so the sheet is page1's lines then page2's,
    CRLF-joined under one '# Page 1' frame."""
    from pypdfium2_ray.docmodel.htmldoc import (
        extract_document_text, parse_document)
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.docmodel.serialize import (
        serialize_document, tile_document)
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    layout = LayoutParams(page_width=1e9)

    def f(t: pa.Table) -> pa.Table:
        urls, n_pages, texts = [], [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            doc = parse_document(html or b"", layout=layout)
            if not doc.ok:
                continue
            tiled = tile_document(doc, cols=2, rows=1,
                                  width=1190, height=842)
            back = parse_document(serialize_document(tiled), layout=layout)
            urls.append(url)
            n_pages.append(len(back))
            texts.append(extract_document_text(back, "range"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "n_pages": pa.array(n_pages, pa.int64()),
                         "extracted_text": pa.array(texts, pa.string())})

    return read_cc_from_documents(sf_dir).map_batches(
        f, batch_format="pyarrow")


def _warc_corpus(sf_dir: str) -> str:
    """The cc corpus materialized ONCE per sf_dir as WARC shards (Common
    Crawl's container format, sources/warc): built by the distributed
    sink into a temp dir, atomically renamed — idempotent and crash-safe,
    keyed by the documents footer row count so sf dirs never collide."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_warc_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.sources.warc import write_warc_shards
    build = out + ".build"
    import shutil
    shutil.rmtree(build, ignore_errors=True)
    ds = read_cc_from_documents(sf_dir).select_columns(
        ["url", "warc_ts", "html"])
    write_warc_shards(ds, build, n_shards=max(4, rows // 2000))
    os.replace(build, out)
    return out


def q_warc_extract(sf_dir: str):
    """The flagship extraction fed from native WARC shards instead of
    Parquet (sources/warc.read_warc): same per-url byte-identical output,
    so the Parquet-path extraction SQL is its oracle — proving the
    container codec + source are lossless end-to-end at driver-gate
    scale."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.warc import read_warc
    with _hint(sf_dir):
        ds = read_warc(_warc_corpus(sf_dir))
        out = extract_pipeline(
            ds=ds, skew_split="blocks",
            extract_opts=dict(include_pages=False, include_rects=False,
                              layout=LayoutParams(page_width=1e9)))
    out = out.select_columns(["url", "status", "err_code",
                              "n_pages", "n_chars", "extracted_text"])
    return _cast_i64(out, ["err_code", "n_pages", "n_chars"])


# ---------------------------------------------------------------------------
# text analysis (functions/text.py; oracle-paired)

def q_doc_flags(sf_dir: str):
    """Doc-level flags through the flagship extraction (SURVEY M17:
    is_tagged / formtype / pagemode as scalar columns). The synthesized
    corpus gives every doc a heading outline and no forms, so the oracle
    is the constant row the parser must reproduce."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir)
    out = extract_pipeline(
        ds=ds, skew_split=True,
        extract_opts=dict(include_pages=False, include_rects=False,
                          layout=LayoutParams(page_width=1e9)))
    out = out.select_columns(["url", "is_tagged", "formtype", "pagemode"])
    return _cast_i64(out, ["formtype", "pagemode"])


def q_meta_extract(sf_dir: str):
    """Document metadata dict through the flagship extraction (SURVEY
    M16: the 8-key Title/Author/... mapping as a struct column): Title
    parsed from <title> on ok rows, all keys '' on error rows — the
    oracle composes the expected values from the synthesis predicates."""
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    ds = read_cc_from_documents(sf_dir)
    out = extract_pipeline(
        ds=ds, skew_split=True,
        extract_opts=dict(include_pages=False, include_rects=False,
                          layout=LayoutParams(page_width=1e9)))

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["url"],
                         "title": pc.struct_field(t["metadata"], "Title"),
                         "author": pc.struct_field(t["metadata"], "Author")})

    return out.map_batches(pick, batch_format="pyarrow")


def _meta_extract_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import sql_is_bad, sql_is_enc
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    return f"""
        SELECT 'doc://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN {ok} THEN 'doc ' || CAST(doc_id AS VARCHAR)
                    ELSE '' END AS title,
               '' AS author
        FROM documents"""


def q_token_stats(sf_dir: str):
    from pypdfium2_ray.stages.textstats import add_quality_columns
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_quality_columns, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_chars_text", "n_tokens",
                              "n_punct", "n_stopwords"])


def q_lang_id(sf_dir: str):
    from pypdfium2_ray.stages.textstats import add_lang_pred
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_lang_pred, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang_pred"])


def q_lang_confusion(sf_dir: str):
    """Declared-vs-predicted language confusion matrix — the
    model-eval accounting table for the lang_id heuristic: counts per
    (lang, lang_pred) pair. Vectorized lang_pred per block + the
    single-block enum-rollup combine (pair cardinality is fixed at any
    corpus size)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import add_lang_pred
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["lang", "text"])
    ds = ds.map_batches(add_lang_pred, batch_format="pyarrow") \
        .select_columns(["lang", "lang_pred"])
    return grouped_aggregate(ds, ["lang", "lang_pred"],
                             {"n_docs": (None, "count")},
                             combine="single_block")


def q_fingerprint(sf_dir: str):
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


def q_term_search(sf_dir: str):
    from pypdfium2_ray.stages.textstats import add_term_count
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(partial(add_term_count, term=SEARCH_TERM),
                        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_matches"])


def q_term_search_word(sf_dir: str):
    """Whole-word search flag (FPDF_MATCHWHOLEWORD analogue,
    textpage.py:268-271): both neighbours must be non-word chars."""
    def f(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            t["text"], r"\b" + SEARCH_TERM + r"\b"), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_word_matches": n})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_extract_status_rollup(sf_dir: str):
    """Run-metrics rollup over the extraction output (SURVEY §2.5 A-new:
    docs + chars by status/err_code — the lineage counters as a query)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = _extract(sf_dir).select_columns(["status", "err_code", "n_chars"])
    with _hint(sf_dir):
        out = grouped_aggregate(ds, ["status", "err_code"], {
            "n_docs": (None, "count"),
            "sum_chars": ("n_chars", "sum"),
        }, combine="single_block")   # status codes: fixed enum
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("sum_chars"),
                               "sum_chars", pc.cast(t["sum_chars"], pa.int64())),
        batch_format="pyarrow")


def q_bpe_tokens(sf_dir: str):
    """BPE-ish subword token count (functions.text.bpe_token_count) —
    approximate LLM token counting per document."""
    from pypdfium2_ray.functions.text import bpe_token_count

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "n_bpe_tokens": bpe_token_count(t["text"])})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_sessions(sf_dir: str):
    """Gap-based sessionization (stages/sessionize): per-event session ids
    with a 30-minute inactivity gap."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import sessionize
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    with _hint(sf_dir, "events"):
        return sessionize(ds, key="user_id", ts_col="ts", gap_s=1800)


def _jsonl_corpus(sf_dir: str) -> str:
    """The (doc_id, text, lang, source) corpus materialized ONCE per
    sf_dir as gzip JSONL shards (sources/jsonl distributed sink into a
    temp dir + atomic rename — idempotent, crash-safe, keyed by the
    documents footer row count like _warc_corpus)."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_jsonl_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    import ray.data as rd
    from pypdfium2_ray.sources.jsonl import write_jsonl_shards
    tmp = out + ".build"
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    with _hint(sf_dir):
        write_jsonl_shards(ds, tmp, n_shards=8, key_col="doc_id")
    os.replace(tmp, out)
    return out


def q_curate_corpus(sf_dir: str):
    """The composed curation pipeline — quality gate -> exact dedup
    (keep min id) -> deterministic 1-in-3 hash sample — as ONE
    streaming chain: the vectorized Gopher/C4 filter and the md5
    fingerprint are per-block maps, the dedup keep-one is the
    pipeline's ONLY exchange, the sample is a pure filter on the
    survivor ids. No driver materialization anywhere; this is the
    shape a user runs end-to-end at corpus scale, and the oracle is
    the same composition of the per-stage twins (nested CTEs), proving
    the stages compose without semantic drift."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import (
        add_fingerprint, hash_sample, quality_filter)
    ds = _docs(sf_dir, ["doc_id", "text"])
    kept = quality_filter(ds, min_tokens=50, max_tokens=100_000,
                          min_mean_token_chars=3.0,
                          max_mean_token_chars=9.0,
                          min_stopword_frac=0.01, emit_counters=True)
    fp = kept.map_batches(add_fingerprint, batch_format="pyarrow") \
             .select_columns(["doc_id", "n_tokens", "fingerprint"])
    with _hint(sf_dir):
        uniq = grouped_aggregate(fp, ["fingerprint"], {
            "doc_id": ("doc_id", "min"),
            "n_tokens": ("n_tokens", "min"),   # equal texts, equal counts
            "n_dups": (None, "count")})
    uniq = uniq.map_batches(
        lambda t: t.drop_columns(["fingerprint"]), batch_format="pyarrow")
    return _cast_i64(hash_sample(uniq, "doc_id", modulus=3, keep=1),
                     ["n_tokens", "n_dups"])


def _curate_corpus_sql() -> str:
    """The same three stages as nested CTEs: the quality twin's WHERE,
    md5(text) keep-min-id dedup, md5_number_upper id sample."""
    return f"""
WITH q AS (SELECT doc_id, text, {_QF_TOKS} AS n_tokens
           FROM documents WHERE {_QF_WHERE}),
d AS (SELECT md5(text) AS fp, min(doc_id) AS doc_id,
             min(n_tokens)::BIGINT AS n_tokens,
             count(*)::BIGINT AS n_dups
      FROM q GROUP BY fp)
SELECT doc_id, n_tokens, n_dups FROM d
WHERE md5_number_upper(doc_id::VARCHAR) % 3 = 1"""


def q_jsonl_tokens(sf_dir: str):
    """Token/quality counters computed from native gzip JSONL shards
    (sources/jsonl.read_jsonl: one shard file per read task, per-file
    inflate + Arrow C++ JSON parse — rows never pass through Python
    objects) instead of Parquet. The Parquet-path token_stats SQL is
    the oracle, proving the JSONL sink+source round-trips the corpus
    losslessly (escapes, unicode, ints) at driver-gate scale."""
    from pypdfium2_ray.stages.textstats import add_quality_columns
    with _hint(sf_dir):
        ds = read_jsonl_docs(_jsonl_corpus(sf_dir))
        ds = ds.map_batches(add_quality_columns, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_chars_text", "n_tokens",
                              "n_punct", "n_stopwords"])


def read_jsonl_docs(path: str):
    import pyarrow as _pa

    from pypdfium2_ray.sources.jsonl import read_jsonl
    return read_jsonl(path, schema=_pa.schema(
        [("doc_id", _pa.int64()), ("text", _pa.string()),
         ("lang", _pa.string()), ("source", _pa.string())]))


def _csv_corpus(sf_dir: str) -> str:
    """The corpus as gzip CSV shards, materialized once per sf_dir
    (sources/csvfmt sink; same idempotent temp-then-rename cache
    discipline as _jsonl_corpus)."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_csv_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    import ray.data as rd
    from pypdfium2_ray.sources.csvfmt import write_csv_shards
    tmp = out + ".build"
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    with _hint(sf_dir):
        write_csv_shards(ds, tmp, n_shards=8, key_col="doc_id")
    os.replace(tmp, out)
    return out


def q_csv_tokens(sf_dir: str):
    """Token/quality counters computed from native gzip CSV shards
    (sources/csvfmt.read_csv_shards: one shard per read task, per-file
    inflate + Arrow C++ CSV parse, schema-pinned types). The
    Parquet-path token_stats SQL is the oracle, proving the CSV
    sink+source round-trips the corpus losslessly (RFC-4180 quoting:
    embedded commas/quotes/newlines) at driver-gate scale."""
    import pyarrow as _pa

    from pypdfium2_ray.sources.csvfmt import read_csv_shards
    from pypdfium2_ray.stages.textstats import add_quality_columns
    schema = _pa.schema([("doc_id", _pa.int64()), ("text", _pa.string()),
                         ("lang", _pa.string()), ("source", _pa.string())])
    with _hint(sf_dir):
        ds = read_csv_shards(_csv_corpus(sf_dir), schema=schema)
        ds = ds.map_batches(add_quality_columns, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_chars_text", "n_tokens",
                              "n_punct", "n_stopwords"])


def q_collapse_repeats(sf_dir: str):
    """Consecutive-duplicate run collapse (sessionize.collapse_repeats —
    gaps-and-islands): per user, runs of equal event_type in (ts,
    event_id) order collapse to (user, type, run_len, first_ts,
    min_event_id) — the retry-storm / double-fire compaction pass. ONE
    user exchange + one whole-partition vectorized kernel (mask,
    cumsum, Cython groupby agg)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import collapse_repeats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return collapse_repeats(ds)


def _collapse_repeats_sql() -> str:
    """The gaps-and-islands statement of the same runs: lag boundary
    marks, running sum for run ids, min/count aggregates per run."""
    return """
WITH o AS (
  SELECT user_id, event_id, event_type, ts,
         lag(event_type) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (
  SELECT *, CASE WHEN pv IS NULL OR pv <> event_type THEN 1 ELSE 0 END
         AS st FROM o),
r AS (
  SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM m)
SELECT user_id, min(event_type) AS event_type,
       count(*)::BIGINT AS run_len, min(ts) AS first_ts,
       min(event_id)::BIGINT AS min_event_id
FROM r GROUP BY user_id, run"""


def q_text_slice(sf_dir: str):
    """get_text_range analogue (textpage.py:104-146): chars [10, 60)."""
    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "slice_text": pc.utf8_slice_codeunits(t["text"], 10, 60)})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_quality_filter(sf_dir: str):
    """Gopher/C4-style heuristic quality gate as one vectorized streaming
    filter (stages/textstats.quality_filter): token-count + mean-token-
    length bounds + english-stopword floor. Emits the surviving doc ids
    with their counters."""
    from pypdfium2_ray.stages.textstats import quality_filter
    ds = _docs(sf_dir, ["doc_id", "text"])
    kept = quality_filter(ds, min_tokens=50, max_tokens=100_000,
                          min_mean_token_chars=3.0, max_mean_token_chars=9.0,
                          min_stopword_frac=0.01, emit_counters=True)
    return kept.select_columns(["doc_id", "n_tokens"])


def q_hash_sample(sf_dir: str):
    """Deterministic 1-in-10 hash sample by doc_id (stable train/val-split
    membership — identical across runs, shard layouts and cluster sizes;
    md5 twin in SQL)."""
    from pypdfium2_ray.stages.textstats import hash_sample
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return hash_sample(ds, "doc_id", modulus=10, keep=3)


def q_pii_redact(sf_dir: str):
    """PII scrubbing (functions/text.redact_pii): typed placeholder
    substitution for emails/phones/IPv4 in documented order, counts per
    kind — one vectorized RE2 pass per pattern, zero shuffle. The corpus
    is synthetic (no real PII), so the query plants deterministic PII
    per row (SQL-composable from doc_id) and the oracle plants + redacts
    identically."""
    from pypdfium2_ray.functions.text import pii_counts, redact_pii

    def f(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        txt = pc.binary_join_element_wise(
            t["text"], " contact doc", did, "@example.com or +1 555-12",
            did, " ip 10.0.0.1", "")
        cols = {"doc_id": t["doc_id"], "clean": redact_pii(txt)}
        cols.update(pii_counts(txt))
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def q_repetition_stats(sf_dir: str):
    """Repetition quality signals (functions/text.repetition_counts):
    per-doc total vs distinct token counts — the Gopher duplicate-
    fraction family as integer-exact counters, one vectorized split +
    Cython pair-dedup, no shuffle."""
    from pypdfium2_ray.functions.text import repetition_counts

    def f(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"]}
        cols.update(repetition_counts(t["text"]))
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def q_median_length_gate(sf_dir: str):
    """Per-group threshold gate (the FineWeb-style 'keep above the
    group's quantile' shape): compute each language's EXACT median char
    count (stages/agg.grouped_median — one tiny keys+col exchange),
    broadcast the 5-row threshold table back (ray.put), and filter the
    corpus with one vectorized lookup — the sketch tier
    (grouped_quantile_sketch) swaps in when exactness can yield to
    scale. Oracle: the same median as a window function."""
    import ray

    from pypdfium2_ray.stages.agg import grouped_median
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    with _hint(sf_dir):
        med = grouped_median(ds, ["lang"], "n_chars", out="med")
    thr = {r["lang"]: r["med"] for r in med.to_pandas().to_dict("records")}
    thr_ref = ray.put(thr)

    def gate(t: pa.Table) -> pa.Table:
        import numpy as np
        m = ray.get(thr_ref)
        langs = t["lang"].to_pylist()
        lim = np.array([m.get(lg, float("inf")) for lg in langs])
        keep = pc.greater_equal(pc.cast(t["n_chars"], pa.float64()),
                                pa.array(lim))
        return t.filter(keep)

    out = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        gate, batch_format="pyarrow")
    return _cast_i64(out, ["n_chars"])


def q_decontaminate(sf_dir: str):
    """Held-out-split decontamination: ANTI join the corpus against the
    deterministic hash sample (the held-out ids) via
    stages/join.key_filter_join — the blocklist primitive every curation
    pipeline needs (drop denylisted hosts / benchmark ids / already-done
    work). The exchange tier is exercised here so the driver gate covers
    the any-scale path; the oracle expresses the same membership as
    NOT IN."""
    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.textstats import hash_sample
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    held = hash_sample(_docs(sf_dir, ["doc_id"]), "doc_id",
                       modulus=10, keep=3)
    with _hint(sf_dir):
        return key_filter_join(ds, held, "doc_id", mode="anti",
                               tier="exchange")


#: crawl_schedule: per-domain fetches allowed per tick
CRAWL_BUDGET = 5


def q_crawl_schedule(sf_dir: str):
    """Politeness scheduling over the crawl frontier (the crawler-side
    op next to robots_gate/crawl_frontier): each url gets a fetch tick
    = rank-within-its-domain // budget, ranked by the deterministic
    md5 priority — at most CRAWL_BUDGET fetches per domain per tick,
    reproducible across runs. ONE host exchange via topk.grouped_rank
    (vectorized window rank), then a pure map for the tick."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.topk import grouped_rank

    def keyed(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["url"], r"^doc://(?P<host>[^/]+)/")
        pri = [md5_hash64(u.encode()) >> 1 for u in t["url"].to_pylist()]
        return pa.table({"url": t["url"],
                         "host": pc.struct_field(ex, "host"),
                         "pri": pa.array(pri, pa.int64())})

    ds = read_cc_from_documents(sf_dir).map_batches(
        keyed, batch_format="pyarrow")
    with _hint(sf_dir):
        ranked = grouped_rank(ds, ["host"], ["pri", "url"], out="rank")

    def tick(t: pa.Table) -> pa.Table:
        r = pc.cast(t["rank"], pa.int64())
        tk = pc.divide(pc.subtract(r, 1), CRAWL_BUDGET)
        return pa.table({"url": t["url"], "host": t["host"],
                         "tick": pc.cast(tk, pa.int64())})

    return ranked.map_batches(tick, batch_format="pyarrow")


def _crawl_schedule_sql() -> str:
    return f"""
WITH u AS (SELECT 'doc://' || source || '/' || doc_id AS url,
                  source AS host FROM documents),
r AS (SELECT url, host,
             row_number() OVER (PARTITION BY host
                 ORDER BY md5_number_upper(url) >> 1, url) AS rn
      FROM u)
SELECT url, host, ((rn - 1) // {CRAWL_BUDGET})::BIGINT AS tick FROM r"""


def q_domain_stats(sf_dir: str):
    """Per-domain rollup over the cc corpus urls (crawl curation: docs and
    chars by host, host extracted with a vectorized regex)."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def host(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["url"], r"^doc://(?P<host>[^/]+)/")
        return pa.table({"host": pc.struct_field(ex, "host"),
                         "n_chars": pc.cast(
                             pc.utf8_length(t["text"]), pa.int64())})

    ds = read_cc_from_documents(sf_dir).map_batches(
        host, batch_format="pyarrow")
    with _hint(sf_dir):
        out = grouped_aggregate(ds, ["host"], {
            "n_docs": (None, "count"),
            "sum_chars": ("n_chars", "sum")})
    return _cast_i64(out, ["sum_chars"])


def q_inverted_index(sf_dir: str):
    """Inverted-index build (stages/invindex): (term, sorted distinct-doc
    postings, df) via vectorized explode + pre-combined pair distinct +
    ONE term exchange + pyarrow list aggregation. The driver-facing
    result summarizes each posting list with exact scalars (df, sum/min/
    max of doc ids — list columns don't survive the driver's hash
    compare); the LIST contents themselves are asserted exactly in
    tests/test_invindex.py."""
    from pypdfium2_ray.stages.invindex import build_inverted_index
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        idx = build_inverted_index(ds)

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np
        la = t["postings"].combine_chunks()
        offs = la.offsets.to_numpy()
        vals = la.values.to_numpy()
        parent = np.repeat(np.arange(t.num_rows), np.diff(offs))
        s = np.bincount(parent, vals.astype(np.float64),
                        minlength=t.num_rows).astype(np.int64)
        # postings are sorted asc => min/max are the segment ends
        return pa.table({"term": t["term"], "df": t["df"],
                         "sum_doc_ids": pa.array(s),
                         "min_doc": pa.array(vals[offs[:-1]]),
                         "max_doc": pa.array(vals[offs[1:] - 1])})

    return idx.map_batches(summarize, batch_format="pyarrow")


def q_top_docs_per_domain(sf_dir: str):
    """Per-domain cap (stages/topk.grouped_topk): keep each host's top-3
    docs by char count — the curation primitive that bounds any one
    domain's contribution to a training set (per-block partial top-k,
    ONE exchange on host, same vectorized kernel finalizes)."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.topk import grouped_topk

    def host(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["url"], r"^doc://(?P<host>[^/]+)/")
        return pa.table({"host": pc.struct_field(ex, "host"),
                         "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": pc.cast(
                             pc.utf8_length(t["text"]), pa.int64())})

    ds = read_cc_from_documents(sf_dir).map_batches(
        host, batch_format="pyarrow")
    with _hint(sf_dir):
        return grouped_topk(ds, ["host"], ["n_chars", "doc_id"], k=3,
                            descending=[True, False])


def q_doc_stats(sf_dir: str):
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = _docs(sf_dir, ["lang", "n_chars"])
    with _hint(sf_dir):
        out = grouped_aggregate(ds, ["lang"], {
            "n_docs": (None, "count"),
            "sum_chars": ("n_chars", "sum"),
            "max_chars": ("n_chars", "max")},
            combine="single_block")   # languages: fixed enum
    return _cast_i64(out, ["sum_chars", "max_chars"])


# ---------------------------------------------------------------------------
# dedup family

def q_robots_gate(sf_dir: str):
    """Crawl-politeness gate (functions/robots, RFC 9309 longest-match
    semantics incl. the Allow override): per-host robots.txt rules parsed
    once, broadcast, one streaming filter pass over the corpus urls. The
    deterministic robots map exercises Disallow-all, prefix + longer-
    Allow override, anchored wildcard, and absent-robots hosts; each rule
    translates to an exact SQL predicate."""
    from pypdfium2_ray.functions.robots import robots_gate
    # src0: blocked entirely; src1: ids starting '1' blocked unless
    # starting '12'; src2: ids ending in 7 blocked (anchored wildcard);
    # every other host has no robots -> allowed
    robots = {
        "src0": "User-agent: *\nDisallow: /\n",
        "src1": "User-agent: *\nDisallow: /1\nAllow: /12\n",
        "src2": "User-agent: *\nDisallow: /*7$\n",
    }
    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        lambda t: pa.table({
            "url": pc.binary_join_element_wise(
                "doc://", t["source"], "/",
                pc.cast(t["doc_id"], pa.string()), ""),
            "doc_id": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    return robots_gate(ds, robots)


def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) layout key over events (stages/zorder): bit
    interleave of (user_id, ts-seconds) — the write-layout key that keeps
    BOTH dimensions prunable (locality property tested in
    tests/test_zorder.py); one vectorized pass, exact generated-SQL
    twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.zorder import add_zorder_key
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        secs = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "a": pc.cast(t["user_id"], pa.int64()),
                         "b": secs})

    out = add_zorder_key(ds.map_batches(prep, batch_format="pyarrow"),
                         "a", "b")
    return out.select_columns(["event_id", "zkey"])


#: Count-Min query config — shared with the oracle generator
CM_WIDTH, CM_DEPTH = 2048, 4
CM_QUERY_TOKENS = ("data", "the", "spark", "absent-token-xyz")


def q_cm_counts(sf_dir: str):
    """Count-Min point-count estimates (stages/freq.count_min_sketch):
    per-block distinct pre-combine, ONE (d, cell) exchange with exact
    integer cell sums, estimates = min over depth rows. The cell hash is
    the md5_number_upper twin, so the ESTIMATES (including collision
    over-counts and the absent token) are SQL-expressible exactly."""
    from pypdfium2_ray.stages.freq import (
        cm_estimate, count_min_sketch, explode_tokens)
    toks = _docs(sf_dir, ["text"]).map_batches(
        explode_tokens, batch_format="pyarrow")
    with _hint(sf_dir):
        sketch = count_min_sketch(toks, "token",
                                  width=CM_WIDTH, depth=CM_DEPTH)
    # the sketch is the bounded <= depth*width-row summary: the ONE
    # legitimate driver collect
    rows = pa.concat_tables(list(sketch.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    return cm_estimate(rows, list(CM_QUERY_TOKENS),
                       width=CM_WIDTH, depth=CM_DEPTH)


def _cm_counts_sql() -> str:
    vals = ", ".join(f"('{v}')" for v in CM_QUERY_TOKENS)
    ds = ", ".join(f"({d})" for d in range(CM_DEPTH))
    return f"""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(text,
                        '[ \t\r\n\f\v]+')) AS t
          FROM documents),
        cnt AS (SELECT t, count(*)::BIGINT AS c FROM tok
                WHERE t <> '' GROUP BY t),
        q(v) AS (VALUES {vals}),
        d(d) AS (VALUES {ds}),
        cells AS (
          SELECT q.v, d.d,
                 COALESCE(SUM(CASE WHEN
                     md5_number_upper(d.d || ':' || cnt.t) % {CM_WIDTH}
                     = md5_number_upper(d.d || ':' || q.v) % {CM_WIDTH}
                   THEN cnt.c END), 0) AS sd
          FROM q CROSS JOIN d LEFT JOIN cnt ON TRUE
          GROUP BY q.v, d.d)
        SELECT v AS value, min(sd)::BIGINT AS est FROM cells GROUP BY v"""


#: join-size-estimation config — shared with the oracle generator.
#: width sizes the over-estimate: E[excess] <= N_A*N_B/width, so a planner
#: wanting ~eps relative error on join size J provisions width ~ N_A*N_B/
#: (eps*J). 8192 keeps the sf0.01 orders|x|customer estimate within ~20%.
JS_WIDTH, JS_DEPTH = 8192, 4


def q_join_size_est(sf_dir: str):
    """Count-Min join-cardinality estimate (stages/freq.cm_join_size):
    |orders JOIN customer ON custkey| WITHOUT running the join — the
    AGMS/CM inner-product planner statistic for sizing a shuffle before
    paying for it. Distinct-key pre-combine per block, ONE bounded
    (d, cell) exchange; nothing input-sized moves. The cell hash is the
    md5_number_upper twin, so the estimate (collision over-counts
    included) is SQL-exact."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import cm_join_size
    orders = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                             columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir.rstrip('/')}/customer.parquet",
                           columns=["c_custkey"])
    with _hint(sf_dir, "orders"):
        return cm_join_size(orders, "o_custkey", cust, "c_custkey",
                            width=JS_WIDTH, depth=JS_DEPTH)


def _join_size_est_sql() -> str:
    ds = ", ".join(f"({d})" for d in range(JS_DEPTH))
    return f"""
        WITH ca AS (SELECT o_custkey AS k, count(*)::BIGINT AS c
                    FROM orders GROUP BY 1),
        cb AS (SELECT c_custkey AS k, count(*)::BIGINT AS c
               FROM customer GROUP BY 1),
        d(d) AS (VALUES {ds}),
        ga AS (SELECT d.d,
                      md5_number_upper(d.d || ':' || ca.k) % {JS_WIDTH}
                        AS cell, SUM(ca.c) AS c
               FROM d CROSS JOIN ca GROUP BY 1, 2),
        gb AS (SELECT d.d,
                      md5_number_upper(d.d || ':' || cb.k) % {JS_WIDTH}
                        AS cell, SUM(cb.c) AS c
               FROM d CROSS JOIN cb GROUP BY 1, 2),
        ip AS (SELECT ga.d, SUM(ga.c * gb.c) AS ip
               FROM ga JOIN gb ON ga.d = gb.d AND ga.cell = gb.cell
               GROUP BY 1)
        SELECT min(ip)::BIGINT AS est FROM ip"""


def q_join_size_exact(sf_dir: str):
    """Exact join cardinality without materializing the join
    (stages/freq.exact_join_size): sum_k cntA[k]*cntB[k] — per-key counts
    pre-combined per block, ONE key-width exchange, per-partition
    product-sum. Ground truth for q_join_size_est at a fraction of the
    join's payload exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import exact_join_size
    li = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                             columns=["o_orderkey"])
    with _hint(sf_dir, "lineitem"):
        return exact_join_size(li, "l_orderkey", orders, "o_orderkey")


def q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 LEFT-join order-count distribution without a join:
    one fact exchange + footer arithmetic for the zero-order row
    (pipelines/relational.cust_order_dist)."""
    from pypdfium2_ray.pipelines.relational import cust_order_dist
    with _hint(sf_dir, "orders"):
        return cust_order_dist(sf_dir)


def q_order_priority_semi(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join census
    (pipelines/relational.order_priority_semi): keys-only exchange-tier
    semi join, enum-small priority rollup."""
    from pypdfium2_ray.pipelines.relational import order_priority_semi
    with _hint(sf_dir, "lineitem"):
        return order_priority_semi(sf_dir)


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 max-revenue supplier over a ship-date quarter
    (pipelines/relational.top_supplier): one windowed fact exchange,
    distributed max over the bounded per-supplier aggregate, pushdown
    name fetch of just the winners."""
    from pypdfium2_ray.pipelines.relational import top_supplier
    with _hint(sf_dir, "lineitem"):
        return top_supplier(sf_dir)


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 correlated-aggregate join
    (pipelines/relational.small_qty_revenue): per-part averages joined
    back onto the part-keyed fact via lookup_join, integer cross-
    multiplied 0.2x-average predicate, two-level global sum."""
    from pypdfium2_ray.pipelines.relational import small_qty_revenue
    with _hint(sf_dir, "lineitem"):
        return small_qty_revenue(sf_dir)


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 anti-join report
    (pipelines/relational.idle_rich_customers): two-scalar positive-
    balance average, integer cross-multiplied threshold, exchange-tier
    NOT IN, enum-small nation rollup."""
    from pypdfium2_ray.pipelines.relational import idle_rich_customers
    with _hint(sf_dir, "customer"):
        return idle_rich_customers(sf_dir)


def q_key_skew(sf_dir: str):
    """Shuffle-planner skew histogram over events.user_id
    (stages/freq.key_skew): per-key counts in one keys-only exchange,
    log2 buckets, single-block rollup."""
    from pypdfium2_ray.stages.freq import key_skew
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id"])
    with _hint(sf_dir, "events"):
        return key_skew(ds, "user_id")


def q_nation_flow(sf_dir: str):
    """TPC-H Q7-shaped cross-border trade matrix
    (pipelines/relational.nation_flow): four keyed exchanges (supplier /
    orders / customer repartition joins + per-customer pre-combine),
    single-block final rollup, 25-row name lut applied last."""
    from pypdfium2_ray.pipelines.relational import nation_flow
    with _hint(sf_dir, "lineitem"):
        return nation_flow(sf_dir)


def q_mkt_share(sf_dir: str):
    """TPC-H Q8-shaped market share as integer numerator/denominator
    (pipelines/relational.mkt_share): exchange-tier part-type semi join,
    conditional aggregate in one pass, five keyed exchanges."""
    from pypdfium2_ray.pipelines.relational import mkt_share
    with _hint(sf_dir, "lineitem"):
        return mkt_share(sf_dir)


def q_part_supplier_census(sf_dir: str):
    """TPC-H Q16-shaped exact COUNT(DISTINCT supplier) per part
    (brand, type, size) (pipelines/relational.part_supplier_census):
    distinctness resolved by exchanges (pair-dedup, part repartition
    join, attr+supp dedup), enum-small single-block final."""
    from pypdfium2_ray.pipelines.relational import part_supplier_census
    with _hint(sf_dir, "lineitem"):
        return part_supplier_census(sf_dir)


def q_blame_supplier(sf_dir: str):
    """TPC-H Q21-shaped 'who shipped last' blame report
    (pipelines/relational.blame_supplier): one orderkey exchange +
    whole-partition vectorized verdict kernel, pre-combined per-supplier
    count."""
    from pypdfium2_ray.pipelines.relational import blame_supplier
    with _hint(sf_dir, "lineitem"):
        return blame_supplier(sf_dir)


def q_user_running_total(sf_dir: str):
    """Per-row running total — SUM(value_e4) OVER (PARTITION BY user
    ORDER BY ts, event_id) emitting EVERY event row
    (stages/sessionize.running_total): one key exchange, one global
    cumsum minus run-boundary offsets, no per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_total
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return running_total(
            ev.map_batches(prescale, batch_format="pyarrow"))


def q_event_islands(sf_dir: str):
    """Gaps-and-islands: each user's stream collapsed into maximal runs
    of equal event_type (stages/sessionize.event_islands): one key
    exchange, boundary mask + np reduceat kernel, epoch-us int64
    interval endpoints. SQL twin is the row_number-difference trick."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_islands
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return event_islands(ev)


def q_monthly_delta(sf_dir: str):
    """Period-over-period trend table per event_type at DAY grain
    (stages/agg.periodic_delta — the testdata spans one month, so day
    grain is what exercises real LAG deltas): ZERO keyed exchanges —
    (type x period) is time-bounded so the census is single-block, and
    the LAG runs on that block; first period carries the sentinel
    (COALESCE twin)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import periodic_delta
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return periodic_delta(
            ev.map_batches(prescale, batch_format="pyarrow"),
            "event_type", "ts", "value_e4", grain="day")


def q_value_centered(sf_dir: str):
    """Group-mean-centered values, all rows out — AVG() OVER
    (PARTITION BY user) as the integer pair (n_key, dev_n = v*n - sum)
    so both engines hash identically
    (stages/sessionize.group_centered): one key exchange, two Cython
    transforms, no sort."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import group_centered
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return group_centered(
            ev.map_batches(prescale, batch_format="pyarrow"))


def q_important_parts(sf_dir: str):
    """TPC-H Q11-shaped HAVING-vs-global-share report
    (pipelines/relational.important_parts): one pre-combined per-part
    exchange, aggregate materialized once for the global fold + the
    constant-folded share filter (s*d > t <=> s > t//d)."""
    from pypdfium2_ray.pipelines.relational import important_parts
    with _hint(sf_dir, "lineitem"):
        return important_parts(sf_dir)


def q_event_lag(sf_dir: str):
    """All-rows LAG emit (stages/sessionize.event_lag): every event
    with its user's previous event id, inter-arrival us, and value
    delta; sentinels for the first event. One key exchange, one shift
    + boundary mask."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_lag
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return event_lag(ev.map_batches(prescale, batch_format="pyarrow"))


def q_running_distinct(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user, all rows out
    (stages/sessionize.running_distinct): window count-distinct —
    unsupported as a native SQL window — via first-occurrence flags +
    per-key cumsum; twin is SUM(is_first) OVER. One key exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_distinct
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return running_distinct(ev)


def q_first_touch(sf_dir: str):
    """First-touch attribution for purchases
    (stages/sessionize.first_touch_attribution): sessionize (30-min
    gap) + FIRST_VALUE-of-session + conversion filter FUSED into one
    exchange + one kernel — three SQL window layers on the twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import first_touch_attribution
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return first_touch_attribution(ev, target="purchase")


def q_time_to_convert(sf_dir: str):
    """Forward-looking LEAD-to-event window
    (stages/sessionize.time_to_convert): every event annotated with us
    until its user's NEXT purchase strictly after it (-1 sentinel) —
    one exchange, one searchsorted against target-row positions; the
    twin is MIN(CASE..) OVER a 1-FOLLOWING..UNBOUNDED future frame."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_to_convert
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return time_to_convert(ev, target="purchase")


def q_user_trend(sf_dir: str):
    """Exact per-user OLS spend trend (stages/agg.grouped_ols_trend):
    slope of value_e4 vs 1-based event sequence index as the EXACT
    integer rational (slope_num, slope_den) — bit-exact vs the
    ROW_NUMBER + integer-sum SQL twin where a float slope would
    hash-diverge on summation order. One exchange, lexsort + reduceat."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_ols_trend
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_ols_trend(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "ts", "event_id", "value_e4")


def q_user_gini(sf_dir: str):
    """Exact per-user Gini spend concentration (stages/agg.grouped_gini):
    the sorted-rank Gini formula as the EXACT integer rational
    (gini_num, gini_den) over value_e4 — tie-order-invariant, so
    bit-exact vs the ROW_NUMBER SQL twin. One exchange, lexsort +
    reduceat, zero per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_gini
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_gini(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "value_e4")


def q_densify_days(sf_dir: str):
    """Calendar densification (stages/sessionize.densify_days): one row
    per user per day between first and last activity, zero-filled —
    the only row-EXPANDING window op (generate_series + LEFT JOIN twin).
    Per-block (user, day) partials, one exchange, arange+scatter kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import densify_days
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return densify_days(ev)


def q_bounce_rate(sf_dir: str):
    """Per-entry-label bounce report (stages/sessionize.bounce_rate):
    sessionize + FIRST-of-session + two aggregation levels fused into
    ONE keyed exchange with per-partition label partials and a
    single-block enum fold. Exact integer counts (rate left to the
    consumer)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import bounce_rate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return bounce_rate(ev)


def q_benford_digits(sf_dir: str):
    """Benford leading-digit profile per event type
    (stages/agg.leading_digit_counts): vectorized log-bounded //10
    digit reduction (no strings, no libm log), block partials +
    single-block enum combine — ZERO keyed exchanges. Non-positive
    values are dropped on BOTH sides (Benford convention: zero has no
    leading significant digit)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import leading_digit_counts
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        keep = pc.greater(v, 0)
        return pa.table({"event_type": pc.filter(t["event_type"], keep),
                         "value_e4": pc.filter(v, keep)})

    return leading_digit_counts(
        ev.map_batches(prescale, batch_format="pyarrow"),
        ["event_type"], "value_e4")


def q_ks_distance(sf_dir: str):
    """Exact two-sample KS distance, view vs purchase values
    (stages/agg.ks_two_sample): distinct-value ECDF support via one
    hash combine, global cumulative counts via two range prefix scans
    (no global sort), per-block pre-max + tiny fold — ONE row, the
    exact integer rational (d_num, d_den) plus both sample sizes."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import ks_two_sample
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return ks_two_sample(
            ev.map_batches(prescale, batch_format="pyarrow"),
            "value_e4", "event_type", "view", "purchase")


def q_mutual_links(sf_dir: str):
    """Reciprocal link pairs (stages/triangles.mutual_pairs): unordered
    node pairs linked in BOTH directions over the distinct synthetic
    edge set — one packed-key exchange, per-partition min/max flag
    group_by, no joins."""
    from pypdfium2_ray.stages.triangles import mutual_pairs
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        return mutual_pairs(edges)


def _mutual_links_sql() -> str:
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node
                       FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)
          FROM nodes),
        de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
                            WHERE src <> dst)
        SELECT a.src AS id_a, a.dst AS id_b
        FROM de a JOIN de b ON a.src = b.dst AND a.dst = b.src
        WHERE a.src < a.dst"""


def q_kwic_first(sf_dir: str):
    """Keyword-in-context concordance for 'merge'
    (stages/textstats.kwic_first): first occurrence per doc, 1-based
    position + 24 chars of context each side — ZERO exchanges, one
    vectorized find_substring + two byte-buffer slice gathers."""
    from pypdfium2_ray.stages.textstats import kwic_first
    ds = _docs(sf_dir, ["doc_id", "text"])
    return kwic_first(ds, "merge", ctx=24)


def q_value_cume(sf_dir: str):
    """Exact CUME_DIST rational per event (stages/topk.grouped_cume):
    peer-inclusive RANGE-frame count over value_e4 within the user,
    all rows out — one exchange, lexsort + run-end boundary masks."""
    import ray.data as rd
    from pypdfium2_ray.stages.topk import grouped_cume
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_cume(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"], "value_e4", "event_id")


def q_weighted_median(sf_dir: str):
    """Exact quantity-weighted lower median price per return flag
    (stages/agg.weighted_median): per-block (flag, price-cents) weight
    partials + ONE single-block combine (enum keys x bounded price
    domain) running the cumsum first-crossing rule — ZERO keyed
    exchanges, bit-exact vs the window-cumsum twin."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import weighted_median
    li = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])

    def prescale(t: pa.Table) -> pa.Table:
        p = pc.cast(pc.round(pc.multiply(
            pc.cast(t["l_extendedprice"], pa.float64()), 100.0)),
            pa.int64())
        w = pc.cast(pc.round(pc.cast(t["l_quantity"], pa.float64())),
                    pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "price_c": p, "qty": w})

    return weighted_median(
        li.map_batches(prescale, batch_format="pyarrow"),
        ["l_returnflag"], "price_c", "qty")


#: event_type -> bit index, alphabetical (the twin's CASE mirrors it)
TYPE_BITS = {"click": 0, "error": 1, "purchase": 2, "signup": 3,
             "view": 4}


def q_user_type_bitmask(sf_dir: str):
    """Per-user event-type bitmask + popcount
    (stages/agg.grouped_type_bitmask): OR of distinct powers of two ==
    SUM(DISTINCT bit), so the twin needs no BIT_OR; block pre-distinct
    (user, bit) pairs, ONE exchange, unknown labels rejected loudly."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_type_bitmask
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        return grouped_type_bitmask(ev, ["user_id"], "event_type",
                                    TYPE_BITS)


def q_burst_count(sf_dir: str):
    """Temporal self-join count (stages/sessionize.burst_count): every
    event annotated with how many of its user's later events fall
    within 1 hour — the banded self-join collapsed to a count. One
    exchange, composite-axis searchsorted kernel, no per-key loop."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import burst_count
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    with _hint(sf_dir, "events"):
        return burst_count(ev, window_s=3600.0)


def q_trailing_sum(sf_dir: str):
    """Event-granularity trailing 1h value sum
    (stages/sessionize.trailing_sum): peer-inclusive RANGE-frame sum
    per event — composite-axis searchsorted lower bound + run-end
    cumsum difference, one exchange, no per-key loop."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import trailing_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return trailing_sum(
            ev.map_batches(prescale, batch_format="pyarrow"),
            window_s=3600.0)


def q_active_streak(sf_dir: str):
    """Longest consecutive-active-day streak per user
    (stages/sessionize.active_streak): distinct (user, day) block
    partials, one exchange, integer gaps-and-islands kernel; the twin
    is the day - ROW_NUMBER() grouping trick."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import active_streak
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return active_streak(ev)


def q_state_duration(sf_dir: str):
    """Time-in-state per (user, event_type)
    (stages/sessionize.state_duration): each event's state holds until
    the user's next event (LEAD twin); last events hold nothing. One
    exchange, shift + boundary mask + Cython groupby-sum."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import state_duration
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return state_duration(ev)


def q_time_profile(sf_dir: str):
    """Weekly seasonality profile: event count + value sum per
    (day-of-week, hour-of-day) cell (stages/agg.grouped_aggregate,
    single-block combine over the fixed 168-cell grid — ZERO keyed
    exchanges). dow/hod come from integer epoch arithmetic on BOTH
    sides (no engine EXTRACT conventions): dow 0 = Monday."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "value"])

    def _mod(x, m):  # pc.mod is absent in this pyarrow; x >= 0 here
        return pc.subtract(x, pc.multiply(pc.divide(x, m), m))

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        dow = _mod(pc.add(pc.divide(us, 86_400_000_000), 3), 7)
        hod = _mod(pc.divide(us, 3_600_000_000), 24)
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"dow": dow, "hod": hod, "v": v})

    out = grouped_aggregate(
        ev.map_batches(widen, batch_format="pyarrow"),
        ["dow", "hod"],
        {"n_events": (None, "count"), "sum_value_e4": ("v", "sum")},
        combine="single_block")
    return _cast_i64(out, ["dow", "hod"])


def q_rfm_scores(sf_dir: str):
    """RFM segmentation — the classic marketing recency / frequency /
    monetary quintiles per user, EXACT: per-user aggregates (one
    pre-combined exchange), then THREE global range-prefix scans
    (stages/scan.ranged_prefix_sum — exclusive rank under the
    (metric, user_id) total order, no global sort), quintile =
    rank0 * 5 // n_users on both engines (the explicit NTILE formula —
    engine NTILE fill conventions never enter). Metrics are packed
    (metric << 31) | user_id composite keys, overflow-guarded."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "us": us, "v": v})

    with _hint(sf_dir, "events"):
        agg = grouped_aggregate(
            ev.map_batches(widen, batch_format="pyarrow"),
            ["user_id"],
            {"freq": (None, "count"), "mon_e4": ("v", "sum"),
             "max_us": ("us", "max")}).materialize()
    anchor_day = agg.max("max_us") // 86_400_000_000
    nu = agg.count()

    def metrics(t: pa.Table) -> pa.Table:
        rec = pc.subtract(anchor_day,
                          pc.divide(t["max_us"], 86_400_000_000))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "rec_days": rec, "freq": t["freq"],
                         "mon_e4": t["mon_e4"]})

    ds = agg.map_batches(metrics, batch_format="pyarrow")
    for metric in ("rec_days", "freq", "mon_e4"):
        def pack(t: pa.Table, _m=metric) -> pa.Table:
            m = pc.cast(t[_m], pa.int64())
            u = pc.cast(t["user_id"], pa.int64())
            if t.num_rows and (pc.max(m).as_py() >= 2 ** 32
                               or pc.min(m).as_py() < 0
                               or pc.max(u).as_py() >= 2 ** 31):
                raise ValueError(
                    f"rfm composite key would overflow on {_m} — "
                    "bucket the metric (e.g. coarser units) first")
            cols = {n: t[n] for n in t.column_names
                    if n not in ("ckey", "one")}
            cols["ckey"] = pc.add(pc.shift_left(m, 31), u)
            cols["one"] = pa.array(np.ones(t.num_rows, np.int64))
            return pa.table(cols)

        with _hint(sf_dir, "events"):
            ds = ranged_prefix_sum(
                ds.map_batches(pack, batch_format="pyarrow"),
                "ckey", "one", out=f"rank0_{metric}")

    def quintiles(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in ("user_id", "rec_days", "freq",
                                  "mon_e4")}
        for metric, q in (("rec_days", "r_q"), ("freq", "f_q"),
                          ("mon_e4", "m_q")):
            cols[q] = pc.divide(
                pc.multiply(t[f"rank0_{metric}"], 5), nu)
        return pa.table(cols)

    return ds.map_batches(quintiles, batch_format="pyarrow")


def q_spike_days(sf_dir: str):
    """Traffic-spike detector: per day, event count, the CALENDAR
    7-day-trailing baseline (RANGE frame — gap days shrink it, unlike a
    ROWS frame that would silently span gaps), and an exact integer
    spike flag (n*7 > 2*baseline). Day cardinality is bounded by the
    corpus time span, so: block partials + single-block combine + one
    searchsorted window pass — ZERO keyed exchanges."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"day": pc.divide(us, 86_400_000_000)})

    daily = grouped_aggregate(
        ev.map_batches(widen, batch_format="pyarrow"),
        ["day"], {"n_events": (None, "count")}, combine="single_block")

    def window(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        cs = np.concatenate(([0], np.cumsum(n)))
        lo = np.searchsorted(d, d - 7, side="left")
        hi = np.searchsorted(d, d, side="left")   # strictly-before rows
        trail7 = cs[hi] - cs[lo]
        spike = ((trail7 > 0) & (n * 7 > 2 * trail7)).astype(np.int64)
        return pa.table({"day": d, "n_events": n, "trail7": trail7,
                         "is_spike": spike})

    return daily.map_batches(window, batch_size=None,
                             batch_format="pyarrow")


def q_source_share(sf_dir: str):
    """Ratio-to-report per source: doc count + char volume per source
    alongside the corpus totals on every row (the SUM() OVER () shape)
    — share = n/tot stays an exact rational. Enum source cardinality ->
    block partials + single-block combine + one totals pass, ZERO
    keyed exchanges."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = _docs(sf_dir, ["source", "n_chars"])
    per = grouped_aggregate(
        ds, ["source"],
        {"n_docs": (None, "count"), "sum_chars": ("n_chars", "sum")},
        combine="single_block")

    def totals(t: pa.Table) -> pa.Table:
        td = pc.sum(t["n_docs"]).as_py() or 0
        tc = pc.sum(t["sum_chars"]).as_py() or 0
        n = t.num_rows
        return pa.table({"source": t["source"],
                         "n_docs": pc.cast(t["n_docs"], pa.int64()),
                         "sum_chars": pc.cast(t["sum_chars"],
                                              pa.int64()),
                         "tot_docs": pa.array([td] * n, pa.int64()),
                         "tot_chars": pa.array([tc] * n, pa.int64())})

    return per.map_batches(totals, batch_size=None,
                           batch_format="pyarrow")


def q_peak_day(sf_dir: str):
    """Per-user busiest day (two-level aggregate + argmax): each
    user's top activity day with its count and the user's total —
    ties break to the EARLIEST day on both engines. Per-block
    (user, day) count partials, ONE user exchange, lexsort with
    negated counts + segment-first gather — no per-user Python."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.divide(us, 86_400_000_000)}) \
            .group_by(["user_id", "day"], use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "day", "n"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "top_day": pd.Series(dtype="int64"),
                "n_top": pd.Series(dtype="int64"),
                "n_total": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "day"], sort=False,
                       as_index=False)["n"].sum()
        k = g["user_id"].to_numpy()
        d = g["day"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        order = np.lexsort((d, -n, k))
        k, d, n = k[order], d[order], n[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        runs = np.diff(np.append(starts, len(k)))
        return pd.DataFrame({
            "user_id": k[starts].astype("int64"),
            "top_day": d[starts],
            "n_top": n[starts],
            "n_total": np.add.reduceat(n, starts).astype("int64")})

    partials = ev.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_systematic_sample(sf_dir: str):
    """Deterministic systematic sample: every 100th event under the
    GLOBAL (ts, event_id) total order — the stratified-in-time audit
    draw (hash_sample is its content-keyed cousin). Exact global rank
    via stages/scan.ranged_prefix_sum over a packed
    (rebased-us << 21 | event_id) key (min-ts rebase from the parquet
    footer, no scan; loud width guards), then a modulo filter — no
    global sort."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    min_us = min(
        meta.metadata.row_group(i).column(ts_idx).statistics.min
        for i in range(meta.metadata.num_row_groups)).timestamp() \
        * 1_000_000
    min_us = int(min_us)
    ev = rd.read_parquet(path, columns=["event_id", "ts"])

    def composite(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        rel = pc.subtract(us, min_us)
        e = pc.cast(t["event_id"], pa.int64())
        if t.num_rows and (pc.max(rel).as_py() >= 2 ** 42
                           or pc.min(rel).as_py() < 0
                           or pc.max(e).as_py() >= 2 ** 21):
            raise ValueError("systematic-sample composite key would "
                             "overflow — re-derive the shift widths")
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"event_id": e, "one": one,
                         "ckey": pc.add(pc.shift_left(rel, 21), e)})

    with _hint(sf_dir, "events"):
        ranked = ranged_prefix_sum(
            ev.map_batches(composite, batch_format="pyarrow"),
            "ckey", "one", out="rank0")

    def pick(t: pa.Table) -> pa.Table:
        r = t["rank0"].to_numpy(zero_copy_only=False)
        keep = pa.array(r % 100 == 0)
        return pa.table({"event_id": pc.filter(t["event_id"], keep),
                         "rank0": pc.filter(t["rank0"], keep)})

    return ranked.map_batches(pick, batch_format="pyarrow")


def q_adoption_lag(sf_dir: str):
    """Onboarding latency: per (user, event_type), microseconds from
    the user's FIRST event to their first event of that type — the
    two-level min (feature-adoption funnel; the first-touch row is lag
    0). Per-block (user, type) min partials, ONE user exchange, kernel
    re-min + per-user transform-min subtract."""
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"], "us": us}) \
            .group_by(["user_id", "event_type"], use_threads=False) \
            .aggregate([("us", "min")]) \
            .rename_columns(["user_id", "event_type", "mt"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "lag_us": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["mt"].min()
        m0 = g.groupby("user_id", sort=False)["mt"].transform("min")
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_type": g["event_type"],
            "lag_us": (g["mt"] - m0).astype("int64")})

    partials = ev.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_session_pairs(sf_dir: str):
    """Within-session event-type co-occurrence (market-basket over
    sessions): sessionize (30-min gap) makes the baskets, then
    stages/basket.pair_support counts distinct unordered type pairs
    per session — composition of two one-exchange stages plus the
    pair-count exchange. Types map to TYPE_BITS indices on both
    engines; baskets pack (user << 16 | session), guarded."""
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    from pypdfium2_ray.stages.sessionize import sessionize
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    with _hint(sf_dir, "events"):
        sess = sessionize(ev, gap_s=1800.0)

    names = pa.array(sorted(TYPE_BITS, key=TYPE_BITS.get))

    def widen(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        s = pc.cast(t["session_id"], pa.int64())
        if t.num_rows and (pc.max(s).as_py() >= 2 ** 16
                           or pc.max(u).as_py() >= 2 ** 46):
            raise ValueError("session basket key would overflow — "
                             "re-derive the shift widths")
        item = pc.index_in(t["event_type"], value_set=names)
        if t.num_rows and item.null_count:
            raise ValueError("unmapped event_type — extend TYPE_BITS")
        return pa.table({"basket": pc.add(pc.shift_left(u, 16), s),
                         "item": pc.cast(item, pa.int64())})

    with _hint(sf_dir, "events"):
        return pair_support(sess.map_batches(widen,
                                             batch_format="pyarrow"),
                            "basket", "item")


def q_type_jaccard(sf_dir: str):
    """Audience overlap between event types: for every type pair, the
    EXACT Jaccard numerator/denominator over user sets (n_inter,
    n_union) — computed from the per-user type BITMASK (one exchange,
    stages/agg.grouped_type_bitmask), then a single-block census of the
    32 possible masks and a driver-free pair fold: intersection(a,b) =
    sum of mask counts with both bits set. No pair self-join ever
    materializes user pairs."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_type_bitmask
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        masks = grouped_type_bitmask(ev, ["user_id"], "event_type",
                                     TYPE_BITS)

    def census(t: pa.Table) -> pa.Table:
        return pa.table({"type_mask": t["type_mask"]}) \
            .group_by(["type_mask"], use_threads=False) \
            .aggregate([([], "count_all")])

    names = sorted(TYPE_BITS, key=TYPE_BITS.get)

    def pairs(t: pa.Table) -> pa.Table:
        m = t["type_mask"].to_numpy(zero_copy_only=False)
        c = t["count_all"].to_numpy(zero_copy_only=False)
        ta, tb, ni, nu = [], [], [], []
        for a in range(len(names)):
            for b_ in range(a + 1, len(names)):
                both = int(c[(m >> a & 1).astype(bool)
                             & (m >> b_ & 1).astype(bool)].sum())
                either = int(c[((m >> a & 1) | (m >> b_ & 1))
                               .astype(bool)].sum())
                na, nb = names[a], names[b_]
                lo, hi = min(na, nb), max(na, nb)
                ta.append(lo)
                tb.append(hi)
                ni.append(both)
                nu.append(either)
        return pa.table({"type_a": pa.array(ta), "type_b": pa.array(tb),
                         "n_inter": pa.array(ni, pa.int64()),
                         "n_union": pa.array(nu, pa.int64())})

    return masks.map_batches(census, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(lambda t: t.group_by(["type_mask"],
                                          use_threads=False)
                     .aggregate([("count_all", "sum")])
                     .rename_columns(["type_mask", "count_all"]),
                     batch_size=None, batch_format="pyarrow") \
        .map_batches(pairs, batch_size=None, batch_format="pyarrow")


def q_early_ltv(sf_dir: str):
    """First-week LTV per user: value accumulated within 7 days of the
    user's FIRST event, the event count in that window, and the
    lifetime total — the cohort-quality signal every acquisition
    report wants. ONE exchange; kernel is a per-user transform-min +
    one masked Cython groupby-sum (no sort needed — min and sums are
    order-free)."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def widen(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "us": us, "v": v})

    week_us = 7 * 86_400_000_000

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "week1_value_e4": pd.Series(dtype="int64"),
                "week1_events": pd.Series(dtype="int64"),
                "total_value_e4": pd.Series(dtype="int64")})
        m0 = df.groupby("user_id", sort=False)["us"].transform("min")
        early = (df["us"].to_numpy() - m0.to_numpy()) < week_us
        g = pd.DataFrame({
            "user_id": df["user_id"],
            "w1v": np.where(early, df["v"].to_numpy(), 0),
            "w1n": early.astype(np.int64),
            "tv": df["v"].to_numpy()})
        out = g.groupby("user_id", sort=False, as_index=False).sum()
        out.columns = ["user_id", "week1_value_e4", "week1_events",
                       "total_value_e4"]
        return out.astype("int64")

    partials = ev.map_batches(widen, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_max_gap_at(sf_dir: str):
    """Largest silence per user WITH provenance: the maximum
    inter-event gap, plus the event ids bounding it (earliest such gap
    on ties) — gap_stats tells you HOW quiet, this tells you WHEN, the
    data-hole debugging view. ONE exchange; lexsort + diff + a
    segment-argmax with first-occurrence tie-break (cummax boundary
    trick), no per-user Python. Single-event users emit nothing."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def kernel(df):
        import pandas as pd
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "max_gap_us": pd.Series(dtype="int64"),
            "gap_start_id": pd.Series(dtype="int64"),
            "gap_end_id": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb = k[order], us[order], tb[order]
        gap_ok = np.concatenate([[False], k[1:] == k[:-1]])
        gaps = np.where(gap_ok,
                        us - np.concatenate([[0], us[:-1]]), -1)
        if not gap_ok.any():
            return empty
        # segment argmax with earliest-gap tie-break: sort rows by
        # (key, -gap, tb) and take each key's first gap row
        gi = np.flatnonzero(gap_ok)
        gk, gg = k[gi], gaps[gi]
        # tie-break on gi (= (ts, event_id) position), matching the
        # twin's ORDER BY gap DESC, ts, event_id
        o2 = np.lexsort((gi, -gg, gk))
        gk, gg, gi2 = gk[o2], gg[o2], gi[o2]
        firsts = np.flatnonzero(
            np.concatenate([[True], gk[1:] != gk[:-1]]))
        sel = gi2[firsts]
        return pd.DataFrame({
            "user_id": gk[firsts].astype("int64"),
            "max_gap_us": gg[firsts].astype("int64"),
            "gap_start_id": tb[sel - 1].astype("int64"),
            "gap_end_id": tb[sel].astype("int64")})

    with _hint(sf_dir, "events"):
        return partition_map(ev, ["user_id"], kernel,
                             batch_format="pandas")


def q_ship_delay(sf_dir: str):
    """Fulfilment-latency report (pipelines/relational.ship_delay):
    per priority count/sum/min/max of ship-day minus order-day across
    lineitems — one repartition join + vectorized day diff +
    single-block enum combine."""
    from pypdfium2_ray.pipelines.relational import ship_delay
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(ship_delay(sf_dir), ["n_items"])


def q_first_session_size(sf_dir: str):
    """Novelty-effect report (stages/sessionize.first_session_size):
    per user, first-session size + session count + lifetime events —
    one exchange, run-length reads off the session geometry."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import first_session_size
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    with _hint(sf_dir, "events"):
        return first_session_size(ev)


def q_concurrency_curve(sf_dir: str):
    """Global session-concurrency sweep line: at every distinct session
    boundary timestamp, how many sessions opened, closed, and remain
    open — the capacity-planning curve, computed WITHOUT a global sort:
    sessionize kernel emits per-partition boundary partials, one
    t-keyed combine to distinct timestamps, then two range prefix
    scans (starts<=t, ends<=t) and n_open = their difference. The
    interval sibling of ks_distance's two-ECDF machinery."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    gap_us = 1800 * 1_000_000

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"t_us": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64"),
                                 "e": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us = k[order], us[order]
        new_sess = np.concatenate([[True], k[1:] != k[:-1]]) \
            | np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(k)) - 1
        b = pd.DataFrame({
            "t_us": np.concatenate([us[starts], us[ends]]),
            "s": np.concatenate([np.ones(len(starts), np.int64),
                                 np.zeros(len(ends), np.int64)]),
            "e": np.concatenate([np.zeros(len(starts), np.int64),
                                 np.ones(len(ends), np.int64)])})
        return b.groupby("t_us", sort=False, as_index=False).sum()

    with _hint(sf_dir, "events"):
        bounds = partition_map(ev, ["user_id"], kernel,
                               batch_format="pandas")
        per_t = grouped_aggregate(bounds, ["t_us"],
                                  {"n_start": ("s", "sum"),
                                   "n_end": ("e", "sum")})
        cum = ranged_prefix_sum(per_t, "t_us", "n_start",
                                out="cs_prev")
        cum = ranged_prefix_sum(cum, "t_us", "n_end", out="ce_prev")

    def finish(t: pa.Table) -> pa.Table:
        cs = pc.add(t["cs_prev"], pc.cast(t["n_start"], pa.int64()))
        ce = pc.add(t["ce_prev"], pc.cast(t["n_end"], pa.int64()))
        return pa.table({"t_us": pc.cast(t["t_us"], pa.int64()),
                         "n_start": pc.cast(t["n_start"], pa.int64()),
                         "n_end": pc.cast(t["n_end"], pa.int64()),
                         "n_open": pc.subtract(cs, ce)})

    return cum.map_batches(finish, batch_format="pyarrow")


def q_embedding_norms(sf_dir: str):
    """Exact per-label embedding energy: vector count + the int64 sum
    of squared fixed-point components (round(x*1000)²) per label — the
    norm-distribution health check for an embedding corpus, exact on
    both engines (a float norm would hash-diverge; DuckDB twins it
    with list_transform/list_sum lambdas). Per-block numpy
    offsets+reduceat over the Arrow list buffer, single-block enum
    combine — ZERO keyed exchanges."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["label", "embedding"])

    def widen(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        # HALF-AWAY-FROM-ZERO, matching SQL round(): np.rint rounds
        # half-to-even and arbitrary float32 components DO land on
        # exact halves (unlike the 2-decimal money columns elsewhere)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        sq = q * q
        cs = np.concatenate(([0], np.cumsum(sq)))
        per_row = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table({"label": pc.cast(t["label"], pa.int64()),
                         "ss": pa.array(per_row)})

    return grouped_aggregate(
        ds.map_batches(widen, batch_format="pyarrow"),
        ["label"], {"n_vecs": (None, "count"), "sum_sq_e6": ("ss", "sum")},
        combine="single_block")


def q_norm_hist(sf_dir: str):
    """Embedding energy spectrum: vector count per integer bucket of
    the fixed-point squared norm (sum_sq_e6 // 10^6) — the norm
    distribution that catches un-normalized slices and dead vectors
    before they skew cosine tiers (embedding_norms is the per-label
    sum; this is the shape). ZERO keyed exchanges: the
    q_embedding_norms offsets+reduceat kernel per block, one integer
    floor-div bucket, single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        sq = q * q
        cs = np.concatenate(([0], np.cumsum(sq)))
        per_row = cs[offs[1:]] - cs[offs[:-1]]
        bucket = per_row // 1_000_000
        g = pd.DataFrame({"norm_bucket": bucket}) \
            .groupby("norm_bucket", as_index=False).size() \
            .rename(columns={"size": "__n"})
        return pa.Table.from_pandas(g.astype({"__n": "int64"}),
                                    preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["norm_bucket"], {"n_vecs": ("__n", "sum")},
        combine="single_block")


def q_transition_probs(sf_dir: str):
    """Markov transition table WITH denominators: every adjacent
    (prev, next) pair count plus the prev-state row total, so
    P(next|prev) = n / n_prev stays an exact rational —
    transition_counts' one exchange + a row-total pass inside the same
    single final block (the pair space is enum-sized)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import transition_counts
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    with _hint(sf_dir, "events"):
        counts = transition_counts(ds)

    def add_totals(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        df["n_prev"] = df.groupby("prev_type")["n"].transform("sum")
        return pa.Table.from_pandas(
            df.astype({"n": "int64", "n_prev": "int64"}),
            preserve_index=False)

    return counts.map_batches(add_totals, batch_size=None,
                              batch_format="pyarrow")


def q_island_lengths(sf_dir: str):
    """Run-length spectrum of the event streams: how many runs of each
    length exist per event type (retry-storm / spam signature view) —
    stages/sessionize.event_islands' runs rolled up to a
    (type, run_len) histogram; one islands exchange + a single-block
    combine (the spectrum is small: lengths are bounded by the longest
    per-user run)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.sessionize import event_islands
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        isl = event_islands(ev)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "run_len": pc.cast(t["n_events"], pa.int64())})

    return grouped_aggregate(
        isl.map_batches(project, batch_format="pyarrow"),
        ["event_type", "run_len"], {"n_runs": (None, "count")},
        combine="single_block")


def q_taste_shift(sf_dir: str):
    """Preference drift: each user's modal event type in the corpus'
    first half vs second half (split at the global midpoint day from
    the parquet footer — no scan), ties to the alphabetically first
    type; users active in only one half emit nothing. ONE exchange;
    kernel is two Cython groupbys + a negated-count lexsort argmax per
    (user, half) + an index-aligned merge."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    stats = [meta.metadata.row_group(i).column(ts_idx).statistics
             for i in range(meta.metadata.num_row_groups)]
    day = 86_400_000_000
    lo = min(int(s.min.timestamp() * 1_000_000) for s in stats) // day
    hi = max(int(s.max.timestamp() * 1_000_000) for s in stats) // day
    mid = (lo + hi + 1) // 2
    ev = rd.read_parquet(path, columns=["user_id", "ts", "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "top_first": pd.Series(dtype="object"),
                "top_second": pd.Series(dtype="object")})
        d = df["ts"].to_numpy().astype("datetime64[us]") \
            .view("int64") // day
        g = pd.DataFrame({"user_id": df["user_id"],
                          "half": (d >= mid).astype(np.int64),
                          "event_type": df["event_type"]}) \
            .groupby(["user_id", "half", "event_type"], sort=False,
                     as_index=False).size()
        k = g["user_id"].to_numpy()
        h = g["half"].to_numpy()
        lab = g["event_type"].to_numpy()
        n = g["size"].to_numpy().astype(np.int64)
        order = np.lexsort((lab, -n, h, k))
        k, h, lab = k[order], h[order], lab[order]
        firsts = np.flatnonzero(np.concatenate(
            [[True], (k[1:] != k[:-1]) | (h[1:] != h[:-1])]))
        tk, th, tl = k[firsts], h[firsts], lab[firsts]
        a = pd.DataFrame({"user_id": tk[th == 0],
                          "top_first": tl[th == 0]})
        b = pd.DataFrame({"user_id": tk[th == 1],
                          "top_second": tl[th == 1]})
        out = a.merge(b, on="user_id", how="inner")
        return out.astype({"user_id": "int64"})

    with _hint(sf_dir, "events"):
        return partition_map(ev, ["user_id"], kernel,
                             batch_format="pandas")


def q_momentum_score(sf_dir: str):
    """Runs-test flavor per user: among consecutive pairs of value
    DELTAS in (ts, event_id) order, how many agree in sign (momentum)
    vs flip (mean-reversion); zero deltas void the pair (sign product
    0). Exact integer counts — the sequential-dependence smell test a
    float autocorrelation could not hash-gate. ONE exchange; kernel is
    one lexsort + two shifts + sign-product masks + a Cython
    groupby-sum."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "v": v})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_agree": pd.Series(dtype="int64"),
                "n_flip": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        v = df["v"].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, v = k[order], v[order]
        same = k[1:] == k[:-1]
        ds_ = np.sign(v[1:] - v[:-1])
        # consecutive delta pairs within a key: both diffs intra-key
        pair_ok = same[1:] & same[:-1]
        prod = ds_[1:] * ds_[:-1]
        g = pd.DataFrame({
            "user_id": k[2:][pair_ok],
            "n_agree": (prod[pair_ok] > 0).astype(np.int64),
            "n_flip": (prod[pair_ok] < 0).astype(np.int64)})
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_agree": pd.Series(dtype="int64"),
                "n_flip": pd.Series(dtype="int64")})
        out = g.groupby("user_id", sort=False, as_index=False).sum()
        return out.astype("int64")

    partials = ev.map_batches(prescale, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return partition_map(partials, ["user_id"], kernel,
                             batch_format="pandas")


def q_session_handoff(sf_dir: str):
    """Cross-session transition matrix
    (stages/sessionize.session_handoff): for consecutive sessions of
    one user, count (last type of session i, first type of session
    i+1) — the re-engagement flow table. ONE exchange; session
    geometry read off run-length arrays, single-block enum-sized
    combine."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import session_handoff
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return session_handoff(ev)


def q_new_vs_returning(sf_dir: str):
    """Daily new-vs-returning actives
    (stages/sessionize.new_vs_returning): per day, distinct active
    users split into first-ever-day vs seen-before — the DAU growth
    strip. Per-block distinct (user, day) pre-combine, ONE exchange,
    single-block day combine (day cardinality grows with time range,
    not corpus)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import new_vs_returning
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return new_vs_returning(ev)


def q_last_touch(sf_dir: str):
    """Last-touch attribution for purchases
    (stages/sessionize.last_touch_attribution): each conversion
    annotated with the label of the event immediately before it in the
    SAME session ('(direct)' when the conversion opens the session) —
    the final-nudge mirror of first_touch. ONE exchange; shared session
    geometry + one gated label shift."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import last_touch_attribution
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return last_touch_attribution(ev, target="purchase")


def q_purchase_gaps(sf_dir: str):
    """Repeat-purchase cadence (stages/sessionize.gap_stats over the
    purchase-filtered stream): per user, count/min/max/sum of the
    microsecond gaps between CONSECUTIVE PURCHASES — the
    reorder-interval feature behind replenishment and churn models
    (user_gap_stats measures all-event cadence; this measures the
    wallet). Vectorized pre-exchange filter, then ONE user exchange;
    single-purchase users emit nothing on both engines."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        return t.filter(m).select(["user_id", "ts"])

    with _hint(sf_dir, "events"):
        return gap_stats(ds.map_batches(keep, batch_format="pyarrow"))


def q_customer_order_gaps(sf_dir: str):
    """Order-cadence stats per customer
    (stages/sessionize.gap_stats reused on the ORDERS table): gaps
    between consecutive order dates in integer microseconds — the
    relational sibling of the event-stream cadence ops, showing the
    window kernels are table-agnostic. ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    with _hint(sf_dir, "orders"):
        return gap_stats(ds, key_col="o_custkey", ts_col="o_orderdate")


def q_length_histogram(sf_dir: str):
    """Power-of-two document-length spectrum: per bit-length bucket
    (floor(log2 n_chars)), document count and min/max length — the
    corpus-shape fingerprint that catches truncation spikes and
    boilerplate walls before training. ZERO keyed exchanges: per-block
    Cython groupby partial over an exact integer bucket (np.frexp
    exponent — exact for int64 < 2^53, no float log), single-block
    enum-sized combine; the twin is length(bin(n))-1."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        n = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        n = n[n >= 1]
        bucket = (np.frexp(n.astype(np.float64))[1] - 1).astype(np.int64)
        g = pd.DataFrame({"bucket": bucket, "n": n.astype(np.int64)}) \
            .groupby("bucket", as_index=False)["n"] \
            .agg(__n="count", __min="min", __max="max")
        return pa.Table.from_pandas(g.astype({"__n": "int64"}),
                                    preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"n_docs": ("__n", "sum"),
                     "min_chars": ("__min", "min"),
                     "max_chars": ("__max", "max")},
        combine="single_block")


def q_dim_stats(sf_dir: str):
    """Per-dimension embedding profile: for each of the 64 vector
    dimensions, count / min / max / sum of the fixed-point
    (round(x*1000), half-away-from-zero) components across the corpus —
    the per-axis health check that catches dead dims, clipped dims and
    scale drift before training. Per-block kernel reshapes the Arrow
    list buffer to (n, dim) when offsets are uniform (pure column-wise
    numpy reductions) and falls back to a dim-indexed Cython groupby
    otherwise; ZERO keyed exchanges — the partial is 64 rows/block,
    combined in one enum-sized block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        # HALF-AWAY-FROM-ZERO to match SQL round() (np.rint is
        # half-to-even; see q_embedding_norms)
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        lens = np.diff(offs)
        if len(lens) and (lens == lens[0]).all():
            m = q.reshape(len(lens), int(lens[0]))
            dim = np.arange(int(lens[0]), dtype=np.int64)
            out = pd.DataFrame({"dim": dim,
                                "__n": np.full(len(dim), len(lens),
                                               dtype=np.int64),
                                "__min": m.min(axis=0),
                                "__max": m.max(axis=0),
                                "__sum": m.sum(axis=0)})
        else:  # ragged lists: per-element dim index + Cython groupby
            dimidx = np.arange(len(q), dtype=np.int64) \
                - np.repeat(offs[:-1], lens)
            g = pd.DataFrame({"dim": dimidx, "q": q}) \
                .groupby("dim", as_index=False)["q"] \
                .agg(__n="count", __min="min", __max="max", __sum="sum")
            out = g.astype({"__n": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"], {"n": ("__n", "sum"), "min_e3": ("__min", "min"),
                  "max_e3": ("__max", "max"), "sum_e3": ("__sum", "sum")},
        combine="single_block")


def q_dim_gram(sf_dir: str):
    """Exact embedding Gram matrix (upper triangle): for every
    dimension pair i <= j, the int64 sum of fixed-point component
    products over the corpus — the covariance/PCA-prep statistic
    (whitening, dead-direction detection) computed without ever
    moving a vector. Per-block kernel is ONE integer matmul
    (Q^T @ Q over the reshaped Arrow list buffer); the partial is a
    fixed d*(d+1)/2 = 2080-row table per block, combined in one
    enum-sized single block — ZERO keyed exchanges. int64 holds
    |q|<=5000 corpora to ~3e11 rows; shard + widen beyond (documented,
    not silent). The SQL twin is the generate_subscripts self-join."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if not len(lens):
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int64())})
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("dim_gram requires fixed-dim vectors")
        x = vals.astype(np.float64) * 1000.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)) \
            .astype(np.int64).reshape(len(lens), d)
        g = q.T @ q                       # exact int64 matmul
        iu, ju = np.triu_indices(d)
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "__s": pa.array(g[iu, ju])})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], {"sum_prod_e6": ("__s", "sum")},
        combine="single_block")


def q_brand_price_quartiles(sf_dir: str):
    """Exact per-brand DISCRETE retail-price quartiles
    (agg.grouped_order_stats reused verbatim on the PART table): the
    actual element at index q*(n-1)//4 under the (price, partkey)
    total order — pricing-ladder shape per brand, zero new kernel
    code (the order-stats kernel is table-agnostic). ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_order_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                         columns=["p_brand", "p_retailprice",
                                  "p_partkey"])
    with _hint(sf_dir, "part"):
        return grouped_order_stats(ds, ["p_brand"], "p_retailprice",
                                   tiebreak="p_partkey")


#: bracket_revenue's (brand, size range, quantity range) disjunction —
#: brand-disjoint, so a line matches at most one bracket
BRACKETS = (("Brand#1", 1, 15, 1, 15),
            ("Brand#2", 10, 30, 10, 25),
            ("Brand#3", 25, 50, 20, 35))


def q_bracket_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive bracket revenue: per (brand, size
    range, quantity range) bracket, item count and exact revenue
    sum(price_e2 * (100 - disc_e2)) over the lineitem x part join —
    the multi-predicate OR filter that defeats naive pushdown. ONE
    keyed exchange: quantity pre-filter (qty <= the max bracket bound)
    prunes the fact side BEFORE the repartition join onto part (part
    scales with data — never broadcast); the bracket test is one
    vectorized mask per bracket and the rollup is a single-block
    3-row combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join

    qmax = max(b[4] for b in BRACKETS)
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def rev_rows(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = qty <= qmax
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        d = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        return pa.table({
            "l_partkey": t["l_partkey"].combine_chunks()
            .filter(pa.array(keep)),
            "qty": pa.array(np.rint(qty[keep]).astype(np.int64)),
            "rev": pa.array(rev, pa.int64())})

    part = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    j = lookup_join(
        line.map_batches(rev_rows, batch_format="pyarrow"),
        {"l_partkey": pa.int64(), "qty": pa.int64(), "rev": pa.int64()},
        part, source_key="p_partkey", key_col="l_partkey",
        payload_cols={"p_brand": pa.string(), "p_size": pa.int32()})

    def brackets(t: pa.Table) -> pa.Table:
        import numpy as np
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        bid = np.zeros(len(brand), np.int64)
        for n, (b, s0, s1, q0, q1) in enumerate(BRACKETS, start=1):
            m = (brand == b) & (size >= s0) & (size <= s1) \
                & (qty >= q0) & (qty <= q1)
            bid[m] = n           # brand-disjoint: at most one match
        keep = bid > 0
        return pa.table({"bracket": pa.array(bid[keep]),
                         "rev": pa.array(rev[keep])})

    return grouped_aggregate(
        j.map_batches(brackets, batch_format="pyarrow"),
        ["bracket"], {"n_items": (None, "count"),
                      "revenue_e4": ("rev", "sum")},
        combine="single_block")


def q_type_corr_parts(sf_dir: str):
    """Exact Pearson-correlation NUMERATORS between event types: for
    every type pair i <= j, the int64 sum over users of (user's total
    i-value_e4) x (user's total j-value_e4) — "do users who spend on i
    also spend on j", the feature-correlation matrix of the per-user
    type-spend vectors (the tabular sibling of dim_gram; consumers
    divide by the per-type moments for the full r). Absent types
    contribute zero products, so partitions only emit pairs of
    locally-present types and the combine stays exact.

    ONE user exchange; the kernel is one Cython (user, type) groupby
    then ONE integer matmul (M^T @ M over the pivoted partition
    matrix), emitting enum-sized pair partials folded in a single
    block. The twin is the dense user x type pivot self-join."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"], "v": v})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"type_i": pd.Series(dtype="object"),
                                 "type_j": pd.Series(dtype="object"),
                                 "__s": pd.Series(dtype="int64")})
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["v"].sum()
        types = np.sort(g["event_type"].unique())
        tidx = pd.Index(types)
        m = np.zeros((g["user_id"].nunique(), len(types)), np.int64)
        uid = pd.factorize(g["user_id"].to_numpy())[0]
        m[uid, tidx.get_indexer(g["event_type"].to_numpy())] = \
            g["v"].to_numpy()
        gram = m.T @ m                   # exact int64 matmul
        iu, ju = np.triu_indices(len(types))
        return pd.DataFrame({"type_i": types[iu], "type_j": types[ju],
                             "__s": gram[iu, ju]})

    partials = ev.map_batches(prescale, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        per_part = partition_map(partials, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(per_part, ["type_i", "type_j"],
                             {"sum_xy_e8": ("__s", "sum")},
                             combine="single_block")


def q_running_peak(sf_dir: str):
    """Per-row high-watermark with record flags
    (stages/sessionize.running_peak): every event annotated with its
    user's running MAX value_e4 and whether it set a STRICT new peak —
    record-breaking detection, MAX OVER (ROWS UNBOUNDED PRECEDING)
    all-rows-out. ONE exchange; Cython groupby cummax (max has no
    run-offset decomposition like cumsum, but the transform is still
    per-partition vectorized)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import running_peak
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return running_peak(ev.map_batches(prescale,
                                           batch_format="pyarrow"))


def q_priority_median(sf_dir: str):
    """Exact median order value per priority
    (agg.grouped_median reused verbatim on the ORDERS table — the
    non-associative aggregate is table-agnostic too). Scale e3 so the
    even-group middle-two average (a half-cent, 3 decimals on 2-decimal
    money) lands on an exact integer and no rounding mode enters the
    hash gate. ONE exchange."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.agg import grouped_median
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    with _hint(sf_dir, "orders"):
        out = grouped_median(ds, ["o_orderpriority"], "o_totalprice",
                             out="median_price_e3")
    return _cast_i64(_scale_cols(out, {"median_price_e3": 1_000}), [])


def q_touches_to_convert(sf_dir: str):
    """Acquisition path length (stages/sessionize.touches_before_first):
    per converting user, events strictly before the FIRST purchase in
    (ts, event_id) order — funnel depth (time_to_convert measures the
    clock, this the effort). ONE exchange; lexsort + minimum.reduceat
    over target positions."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import touches_before_first
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return touches_before_first(ev, target="purchase")


def q_order_size_hist(sf_dir: str):
    """Order-size spectrum (the Q13 construction on the FACT side):
    how many orders have exactly k lineitems — the two-level aggregate
    whose first level is keyed on orderkey (per-block partial counts
    pre-combine, ONE exchange) and whose census level is single-block
    (k is bounded by order width, not corpus size)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_orderkey"])
    per_order = grouped_aggregate(line, ["l_orderkey"],
                                  {"n_lines": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_lines": t["n_lines"]})

    return grouped_aggregate(
        per_order.map_batches(census_rows, batch_format="pyarrow"),
        ["n_lines"], {"n_orders": (None, "count")},
        combine="single_block")


def q_discount_profile(sf_dir: str):
    """Discount-band revenue profile: per discount percent (0-10),
    item count, exact quantity sum and exact e4 revenue — the Q6
    what-if grid (which band carries the margin). ZERO keyed
    exchanges: integer bucket + Cython per-block partials over an
    11-row enum, single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_quantity", "l_extendedprice",
                                    "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        d = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        q = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        return pa.table({"disc_pct": pa.array(d),
                         "qty": pa.array(q),
                         "rev": pa.array(p * (100 - d))})

    return grouped_aggregate(
        line.map_batches(prep, batch_format="pyarrow"),
        ["disc_pct"], {"n_items": (None, "count"),
                       "sum_qty": ("qty", "sum"),
                       "revenue_e4": ("rev", "sum")},
        combine="single_block")


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 predicate-scan aggregate
    (pipelines/relational.forecast_revenue): per-block integer partials,
    one coalesce, ZERO keyed exchanges (pinned); 4 of 11 lineitem
    columns read."""
    from pypdfium2_ray.pipelines.relational import forecast_revenue
    with _hint(sf_dir, "lineitem"):
        return forecast_revenue(sf_dir)


def q_dense_topk(sf_dir: str):
    """Top-k WITH TIES per event_type — every event whose whole-dollar
    value is among the type's 3 highest distinct values, with its dense
    rank (stages/topk.grouped_dense_topk): per-block k-distinct-values
    partial + ONE exchange of the survivors; co-leaders all survive
    (leaderboard semantics row_number top-k cannot express)."""
    import ray.data as rd
    from pypdfium2_ray.stages.topk import grouped_dense_topk
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        # HALF-AWAY-FROM-ZERO to match DuckDB round(): whole-unit (e0)
        # rounding of 4-decimal values CAN land on exact halves (x.5000),
        # where pc.round's default half-to-even diverges (2.5 -> 2 vs 3)
        import numpy as np
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value_e0": pa.array(v, pa.int64())})

    with _hint(sf_dir, "events"):
        return grouped_dense_topk(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"], "value_e0", k=3)


def q_dedup_exact(sf_dir: str):
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow") \
           .select_columns(["doc_id", "fingerprint"])
    with _hint(sf_dir):
        return grouped_aggregate(ds, ["fingerprint"], {
            "keep_doc_id": ("doc_id", "min"),
            "n_dups": (None, "count")})


def q_extract_toc(sf_dir: str):
    """Per-document heading outline as rows
    (stages/extract.extract_toc — the batch form of the reference's
    get_toc traversal / toc CLI, document.py:520-559): (doc_id, level,
    title, page_index, n_children) in pre-order over the synthesized
    two-page corpus; error-injected payloads parse to an empty outline
    and emit nothing on both engines. ZERO exchanges, pure streaming
    map; the twin reconstructs the deterministic h1/h2 outline from the
    synthesis predicates."""
    from pypdfium2_ray.sources.cc_from_documents import \
        read_cc_from_documents
    from pypdfium2_ray.stages.extract import extract_toc
    with _hint(sf_dir):
        return extract_toc(read_cc_from_documents(sf_dir))


def _extract_toc_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (sql_is_bad,
                                                         sql_is_enc)
    return f"""
        WITH ok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
                    FROM documents
                    WHERE NOT {sql_is_bad()} AND NOT {sql_is_enc()})
        SELECT doc_id, CAST(0 AS BIGINT) AS level,
               'Doc ' || doc_id AS title,
               CAST(0 AS BIGINT) AS page_index,
               CAST(1 AS BIGINT) AS n_children
        FROM ok
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT), 'Appendix ' || doc_id,
               CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        FROM ok"""


def q_token_length_hist(sf_dir: str):
    """Vocabulary-shape spectrum: corpus-wide token count per token
    LENGTH — the tokenizer-budget fingerprint (length mass predicts
    BPE fertility; a drift toward very long tokens flags concatenation
    bugs or non-language spill). ZERO keyed exchanges and zero Python
    per row: pc.split_pattern -> flatten -> pc.utf8_length per block
    (all Arrow C++), one np.bincount, single-block enum combine.
    Empty tokens (doubled separators) are excluded on both engines."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        lens = pc.utf8_length(toks.flatten()).to_numpy(
            zero_copy_only=False)
        lens = lens[lens > 0]
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table({"token_len": pa.array(nz.astype(np.int64)),
                         "__n": pa.array(counts[nz].astype(np.int64))})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token_len"], {"n_tokens": ("__n", "sum")},
        combine="single_block")


def q_gap_hist(sf_dir: str):
    """Corpus-wide inter-arrival spectrum: count of per-user
    consecutive-event gaps per HOUR bucket — the cadence distribution
    behind session-gap threshold tuning (where does the 30-min cut sit
    relative to the mass?). ONE user exchange (gaps need the key's
    events colocated); the kernel emits per-partition PARTIAL bucket
    counts (lexsort + diff + boundary mask + bincount), folded in a
    single block — bucket cardinality grows with the time range, not
    the corpus."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    hour_us = 3_600_000_000
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"gap_hours": pd.Series(dtype="int64"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((us, k))
        k, us = k[order], us[order]
        same = k[1:] == k[:-1]
        bucket = (np.diff(us)[same] // hour_us)
        counts = np.bincount(bucket)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"gap_hours": nz.astype("int64"),
                             "__n": counts[nz].astype("int64")})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["gap_hours"],
                             {"n_gaps": ("__n", "sum")},
                             combine="single_block")


def q_ab_split_metrics(sf_dir: str):
    """A/B experiment readout on a deterministic hash split: users are
    assigned to arm md5(user_id) % 2 (stable across runs, cluster
    sizes and shard layouts — the hash_sample discipline, so a user
    can never switch arms between reruns), then per (arm, event_type)
    the exact event count and e4 value sum — the experimentation
    primitive every growth pipeline needs BEFORE any stats test. ZERO
    keyed exchanges: arm assignment + enum-cell Cython partials per
    block, single-block combine. The per-value md5 loop is inherent to
    the hash (hash_sample note); arms hash the user id, not the row."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        uids = t["user_id"].to_pylist()
        # memoize within the block: ids repeat ~events-per-user times
        cache: dict = {}
        arm = np.fromiter(
            (cache.setdefault(u, md5_hash64(str(u).encode()) % 2)
             for u in uids), np.int64, len(uids))
        v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                    * 10_000.0).astype(np.int64)
        g = pd.DataFrame({
            "arm": arm,
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "__n": np.ones(len(v), np.int64), "__v": v}) \
            .groupby(["arm", "event_type"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["arm", "event_type"],
        {"n_events": ("__n", "sum"), "sum_value_e4": ("__v", "sum")},
        combine="single_block")


def q_order_status_matrix(sf_dir: str):
    """Order lifecycle cross-tab: per (status, priority) cell, order
    count and exact e2 total-price sum — the ops dashboard's backlog
    grid (which priorities are stuck in which status). ZERO keyed
    exchanges: the cell space is enum x enum, so per-block Cython
    partials fold in one block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        g = pd.DataFrame({
            "o_orderstatus": t["o_orderstatus"].to_numpy(
                zero_copy_only=False),
            "o_orderpriority": t["o_orderpriority"].to_numpy(
                zero_copy_only=False),
            "__n": np.ones(len(cents), np.int64), "__s": cents}) \
            .groupby(["o_orderstatus", "o_orderpriority"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("__n", "sum"), "total_price_e2": ("__s", "sum")},
        combine="single_block")


def q_bookend_types(sf_dir: str):
    """Lifetime bookend matrix: per (first type ever, last type ever)
    pair, how many users — the entry-vs-exit view at account
    granularity (session_handoff is the per-boundary view; this is one
    cell per user lifetime). ONE user exchange; the kernel reads both
    bookends off the (user, ts, event_id) lexsort run geometry and
    folds an enum^2 census per partition, combined in a single
    block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"first_type": pd.Series(dtype="object"),
                                 "last_type": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, lab = k[order], lab[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.append(starts[1:], len(k)) - 1
        g = pd.DataFrame({"first_type": lab[starts],
                          "last_type": lab[ends]})
        out = g.groupby(["first_type", "last_type"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["first_type", "last_type"],
                             {"n_users": ("__n", "sum")},
                             combine="single_block")


def q_type_dow_profile(sf_dir: str):
    """Type x day-of-week activity grid with exact value mass — which
    behaviors are weekday vs weekend (time_profile is the dow x hour
    grid; this adds the TYPE dimension and keeps the value sums). ZERO
    keyed exchanges: enum x 7 cells, per-block Cython partials,
    single-block combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 3) % 7
        v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                    * 10_000.0).astype(np.int64)
        g = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "dow": dow.astype(np.int64),
            "__n": np.ones(len(v), np.int64), "__v": v}) \
            .groupby(["event_type", "dow"], sort=False,
                     as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "dow"],
        {"n_events": ("__n", "sum"), "sum_value_e4": ("__v", "sum")},
        combine="single_block")


def q_brand_return_rate(sf_dir: str):
    """Return-rate report by brand: per p_brand, item count, returned
    item count (l_returnflag = 'R') and the exact e4 revenue on each
    side — the merchandising quality table (which brands come back).
    TWO keyed exchanges, the promo_revenue shape with the conditional
    on the FACT side: per-partkey partials carry (n, n_ret, rev,
    rev_ret) so the exchange moves four ints per (block, partkey), then
    one repartition join onto part (a scaling dimension — never
    broadcast) and a single-block brand combine."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_partkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = (np.rint(p * 100.0).astype(np.int64)
               * (100 - np.rint(d * 100.0).astype(np.int64)))
        ret = (t["l_returnflag"].to_numpy(zero_copy_only=False)
               == "R").astype(np.int64)
        g = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "__n": np.ones(len(rev), np.int64), "__r": ret,
            "__rev": rev, "__rrev": rev * ret}) \
            .groupby("l_partkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = grouped_aggregate(
        line.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"], {"__n": ("__n", "sum"), "__r": ("__r", "sum"),
                        "__rev": ("__rev", "sum"),
                        "__rrev": ("__rrev", "sum")})
    part = rd.read_parquet(f"{sf_dir.rstrip('/')}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    j = lookup_join(
        per_part, {"l_partkey": pa.int64(), "__n": pa.int64(),
                   "__r": pa.int64(), "__rev": pa.int64(),
                   "__rrev": pa.int64()},
        part, source_key="p_partkey", key_col="l_partkey",
        payload_cols={"p_brand": pa.string()})
    return grouped_aggregate(
        j, ["p_brand"],
        {"n_items": ("__n", "sum"), "n_returned": ("__r", "sum"),
         "revenue_e4": ("__rev", "sum"),
         "returned_revenue_e4": ("__rrev", "sum")},
        combine="single_block")


def q_user_activity_hist(sf_dir: str):
    """User-activity distribution: how many users produced exactly k
    events — the engagement-depth histogram behind bot cuts and cohort
    weighting (the Q13 two-level construction on the EVENTS table).
    Per-block per-user partial counts pre-combine, ONE exchange, then
    a single-block k census (k bounded by per-user activity, not
    corpus size)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id"])
    per_user = grouped_aggregate(ev, ["user_id"],
                                 {"n_events": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_events": t["n_events"]})

    return grouped_aggregate(
        per_user.map_batches(census_rows, batch_format="pyarrow"),
        ["n_events"], {"n_users": (None, "count")},
        combine="single_block")


def q_idle_users(sf_dir: str):
    """Churn-risk recency list: every user with their last active day
    and idle_days relative to the CORPUS max day — the dormancy
    ranking feeding re-engagement campaigns. The global max day comes
    from PARQUET FOOTER STATS (no extra scan — the taste_shift trick);
    the per-user max rides ONE pre-combined exchange and the subtract
    is a transform pass."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    meta = pq.ParquetFile(path)
    ts_idx = meta.schema_arrow.get_field_index("ts")
    stats = [meta.metadata.row_group(i).column(ts_idx).statistics
             for i in range(meta.metadata.num_row_groups)]
    day = 86_400_000_000
    mx = max(int(s.max.timestamp() * 1_000_000) for s in stats) // day
    ev = rd.read_parquet(path, columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.divide(us, day)})

    with _hint(sf_dir, "events"):
        lasts = grouped_aggregate(
            ev.map_batches(to_day, batch_format="pyarrow"),
            ["user_id"], {"last_day": ("day", "max")})

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "idle_days", pc.subtract(pa.scalar(mx, pa.int64()),
                                     t["last_day"]))

    return lasts.map_batches(finish, batch_format="pyarrow")


def q_type_trigrams(sf_dir: str):
    """Third-order sequence census: every adjacent (t1, t2, t3)
    event-type TRIPLE across all user streams in (ts, event_id) order —
    the next-action-model context table one order above
    transition_counts (the pair space is |labels|^2; this is
    |labels|^3, still enum-sized at any corpus scale). ONE user
    exchange; the kernel is one lexsort + two shifted masks + a single
    Cython groupby over the triple — partials fold in one block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"t1": pd.Series(dtype="object"),
                                 "t2": pd.Series(dtype="object"),
                                 "t3": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        tb = df["event_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        order = np.lexsort((tb, us, k))
        k, lab = k[order], lab[order]
        same = k[1:] == k[:-1]
        ok = same[1:] & same[:-1]
        g = pd.DataFrame({"t1": lab[:-2][ok], "t2": lab[1:-1][ok],
                          "t3": lab[2:][ok]})
        out = g.groupby(["t1", "t2", "t3"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["t1", "t2", "t3"],
                             {"n": ("__n", "sum")},
                             combine="single_block")


def q_type_cadence(sf_dir: str):
    """Per-TYPE cadence report: over every user's same-type consecutive
    event gaps, the per-type count/min/max/sum in integer microseconds —
    "how often do users view vs purchase vs error", the enum-level
    rollup of the per-user gap family (user_gap_stats is per user over
    all types; purchase_gaps is one type per user; this is every type
    across users). ONE user exchange; the kernel lexsorts (user, type,
    ts), masks (user, type) run boundaries, and folds gaps per type
    with one Cython groupby — partials are enum-sized, combined in a
    single block."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "__n": pd.Series(dtype="int64"),
                                 "__min": pd.Series(dtype="int64"),
                                 "__max": pd.Series(dtype="int64"),
                                 "__sum": pd.Series(dtype="int64")})
        k = df["user_id"].to_numpy()
        lab = df["event_type"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((us, lab, k))
        k, lab, us = k[order], lab[order], us[order]
        same = (k[1:] == k[:-1]) & (lab[1:] == lab[:-1])
        g = pd.DataFrame({"event_type": lab[1:][same],
                          "gap": np.diff(us)[same]})
        agg = g.groupby("event_type", sort=False, as_index=False)["gap"] \
            .agg(__n="count", __min="min", __max="max", __sum="sum")
        return agg.astype({c: "int64" for c in
                           ("__n", "__min", "__max", "__sum")})

    with _hint(sf_dir, "events"):
        partials = partition_map(ev, ["user_id"], kernel,
                                 batch_format="pandas")
    return grouped_aggregate(partials, ["event_type"],
                             {"n_gaps": ("__n", "sum"),
                              "min_gap_us": ("__min", "min"),
                              "max_gap_us": ("__max", "max"),
                              "sum_gap_us": ("__sum", "sum")},
                             combine="single_block")


def q_entry_conversion(sf_dir: str):
    """Per-entry-label conversion report
    (stages/sessionize.entry_conversion): sessions vs
    purchase-containing sessions per session ENTRY label — "which
    landing flows convert", the conversion sibling of bounce_rate
    (same fused ONE-exchange shape; the rate is the consumer's
    division of two exact ints)."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import entry_conversion
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return entry_conversion(ev, target="purchase")


def q_source_top_tokens(sf_dir: str, k: int = 5):
    """Per-source top-k tokens by exact count (ties broken
    alphabetically) — the per-slice vocabulary skim that catches
    boilerplate and template drift one source at a time (heavy_bigrams
    is the global view). ONE exchange, keyed on SOURCE only: per-block
    (source, token) pre-combine (Arrow split/flatten + one Cython
    groupby — the shuffle moves census rows, not text), then the
    per-partition kernel folds counts and takes head(k) per source in
    one vectorized sort."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        rep = np.repeat(src, np.diff(offs))
        g = pd.DataFrame({"source": rep, "token": flat}) \
            .groupby(["source", "token"], sort=False, as_index=False) \
            .size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g.astype({"cnt": "int64"}),
                                    preserve_index=False)

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "token": pd.Series(dtype="object"),
                                 "cnt": pd.Series(dtype="int64")})
        g = df.groupby(["source", "token"], sort=False,
                       as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "token"], ascending=[False, True],
                          kind="mergesort")
        out = g.groupby("source", sort=False).head(k)
        return out.astype({"cnt": "int64"}).reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    with _hint(sf_dir):
        return partition_map(partials, ["source"], kernel,
                             batch_format="pandas")


def q_dedup_keep_best(sf_dir: str):
    """Quality-keep exact dedup: per md5-fingerprint cluster, keep the
    doc with the MOST characters (ties to the lowest id) instead of
    dedup_exact's min-id policy — the curation variant that preserves
    the best copy when near-identical pages differ by truncation.
    ONE fingerprint exchange; the kernel is one lexsort on
    (fingerprint, -n_chars, doc_id) + a boundary-mask first-row gather
    — no per-group Python."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.exchange import partition_map
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        t = add_fingerprint(t)
        return pa.table({
            "fingerprint": t["fingerprint"],
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})

    def kernel(df):
        import pandas as pd
        if not len(df):
            return pd.DataFrame({
                "fingerprint": pd.Series(dtype="object"),
                "keep_doc_id": pd.Series(dtype="int64"),
                "keep_chars": pd.Series(dtype="int64"),
                "n_dups": pd.Series(dtype="int64")})
        fp = df["fingerprint"].to_numpy()
        did = df["doc_id"].to_numpy()
        nc = df["n_chars"].to_numpy()
        order = np.lexsort((did, -nc, fp))
        fp, did, nc = fp[order], did[order], nc[order]
        starts = np.flatnonzero(
            np.concatenate([[True], fp[1:] != fp[:-1]]))
        sizes = np.diff(np.append(starts, len(fp)))
        return pd.DataFrame({"fingerprint": fp[starts],
                             "keep_doc_id": did[starts].astype("int64"),
                             "keep_chars": nc[starts].astype("int64"),
                             "n_dups": sizes.astype("int64")})

    with _hint(sf_dir):
        return partition_map(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["fingerprint"], kernel, batch_format="pandas")


def q_dup_size_hist(sf_dir: str):
    """Dedup-cluster-size spectrum: how many exact-duplicate clusters
    have exactly k members — the dedup IMPACT report (k=1 mass is the
    unique tail; the k>=2 masses say how much a dedup pass will delete)
    read off the same md5-fingerprint groups as dedup_exact. ONE
    fingerprint exchange (per-block pre-combined), then the k census is
    single-block (k is bounded by duplication depth, not corpus
    size)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import add_fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow") \
           .select_columns(["fingerprint"])
    with _hint(sf_dir):
        clusters = grouped_aggregate(ds, ["fingerprint"],
                                     {"cluster_size": (None, "count")})

    def census_rows(t: pa.Table) -> pa.Table:
        return pa.table({"cluster_size": t["cluster_size"]})

    return grouped_aggregate(
        clusters.map_batches(census_rows, batch_format="pyarrow"),
        ["cluster_size"], {"n_clusters": (None, "count")},
        combine="single_block")


def q_char_census(sf_dir: str):
    """Corpus byte-frequency fingerprint: count per byte value over
    every document's UTF-8 text — the encoding-drift / charset-anomaly
    detector (a new crawl slice with mojibake or binary spill shifts
    this distribution before any parser notices). ZERO keyed
    exchanges: the per-block kernel is ONE np.bincount over the Arrow
    string data buffer (np.frombuffer — the text bytes are never
    copied or iterated), partials are <=256-row enums folded in a
    single block. Byte == codepoint on this ASCII corpus (the twin's
    ord(); for non-ASCII corpora the engine stays byte-grain — the
    right grain for drift detection — while ord() is codepoint-grain;
    documented divergence)."""
    import numpy as np
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks()
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], odt)[
            arr.offset:arr.offset + len(arr) + 1]
        if not len(offs) or offs[-1] == offs[0]:
            return pa.table({"byte": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64())})
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        counts = np.bincount(data[offs[0]:offs[-1]], minlength=256)
        nz = np.flatnonzero(counts)
        return pa.table({"byte": pa.array(nz.astype(np.int64)),
                         "__n": pa.array(counts[nz].astype(np.int64))})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["byte"], {"n_chars": ("__n", "sum")},
        combine="single_block")


def q_dedup_latest_event(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import latest_event_per_user
    with _hint(sf_dir, "events"):
        return latest_event_per_user(sf_dir)


def _rem(t: pa.Table, mod: int) -> pa.Array:
    did = pc.cast(t["doc_id"], pa.int64())
    return pc.subtract(did, pc.multiply(pc.divide(did, mod), mod))


def q_normalize_text(sf_dir: str):
    """Unicode normalization pass (functions/text.normalize_text: curly
    quotes/dashes/ellipsis/NBSP folds, control strip, ws collapse, trim)
    — every row exercises the folds via deterministic planted decorations
    (curly quotes + ellipsis around the text, identical expression on the
    SQL side); one streaming vectorized map, RE2 sources shared verbatim
    with the oracle."""
    from pypdfium2_ray.functions.text import normalize_text

    def f(t: pa.Table) -> pa.Table:
        decorated = pc.binary_join_element_wise(
            "“", t["text"], "”… — ok", "")
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "norm_text": normalize_text(decorated)})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def q_snapshot_delta(sf_dir: str):
    """Two crawl snapshots of the same url space derived deterministically
    from documents (old: doc_id%3!=0; new: doc_id%2!=0 with the text of
    every doc_id%5==0 row edited) -> per-url delta class via ONE url
    exchange (stages/snapshot.snapshot_delta). FULL OUTER JOIN oracle."""
    from pypdfium2_ray.functions.text import fingerprint_md5
    from pypdfium2_ray.stages.snapshot import snapshot_delta
    base = _docs(sf_dir, ["doc_id", "text", "source"])

    def fp_snapshot(keep_mod: int, edit: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(_rem(t, keep_mod), 0))
            txt = t["text"]
            if edit:
                txt = pc.if_else(
                    pc.equal(_rem(t, 5), 0),
                    pc.binary_join_element_wise(txt, " v2", ""), txt)
            url = pc.binary_join_element_wise(
                "doc://", t["source"], "/",
                pc.cast(t["doc_id"], pa.string()), "")
            return pa.table({"url": url,
                             "fingerprint": fingerprint_md5(txt)})
        return f

    old = base.map_batches(fp_snapshot(3, False), batch_format="pyarrow")
    new = base.map_batches(fp_snapshot(2, True), batch_format="pyarrow")
    with _hint(sf_dir):
        return snapshot_delta(old, new)


def q_incremental_dedup(sf_dir: str):
    """Incremental crawl dedup: snapshot B (doc_id%4>=1, plus a planted
    copy of every %4==2 row under a shifted id) deduped against the
    fingerprint STATE of already-processed snapshot A (doc_id%4<=1) —
    drop-seen and in-snapshot keep-min-id fused into ONE fingerprint
    exchange (stages/snapshot.incremental_dedup); state keys only ever
    move. NOT-IN + GROUP BY oracle."""
    from pypdfium2_ray.functions.text import fingerprint_md5
    from pypdfium2_ray.stages.snapshot import incremental_dedup
    base = _docs(sf_dir, ["doc_id", "text"])

    def proj(lo: int, hi: int, shift: int = 0):
        def f(t: pa.Table) -> pa.Table:
            rem = _rem(t, 4)
            t = t.filter(pc.and_(pc.greater_equal(rem, lo),
                                 pc.less_equal(rem, hi)))
            did = pc.add(pc.cast(t["doc_id"], pa.int64()), shift)
            return pa.table({"doc_id": did,
                             "fingerprint": fingerprint_md5(t["text"])})
        return f

    state = base.map_batches(proj(0, 1), batch_format="pyarrow") \
                .select_columns(["fingerprint"])
    b_main = base.map_batches(proj(1, 3), batch_format="pyarrow")
    b_copy = base.map_batches(proj(2, 2, 100_000_000),
                              batch_format="pyarrow")
    with _hint(sf_dir):
        out = incremental_dedup(b_main.union(b_copy), state,
                                order_col="doc_id")
    return _cast_i64(out, ["doc_id", "n_dups"])


#: minhash query params — shared with the oracle SQL generator below.
#: threshold 0.5 sits in a wide empirical gap of the corpus's pair-Jaccard
#: distribution (background <= 0.31, planted near-dups >= 0.93 at sf0.01),
#: so LSH recall at the threshold is 1.0 with huge margin: a J=0.93 pair
#: misses all 16 bands (8 rows each) w.p. (1 - 0.93^8)^16 ~ 3e-6.
MINHASH = dict(threshold=0.5, shingle_k=5, num_perm=128, bands=16)

#: shared CTE chain computing the exact all-pairs shingle overlap (the
#: minhash oracle and the two cluster oracles build on the same pair set)
_MINHASH_CTES = f"""norm AS (
              SELECT doc_id,
                     trim(regexp_replace(text, '[ \\t\\r\\n\\f\\v]+', ' ', 'g'),
                          ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id, CASE
                WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                WHEN length(t) < {MINHASH["shingle_k"]} THEN [t]
                ELSE list_distinct([substr(t, i, {MINHASH["shingle_k"]})
                       for i in range(1, length(t) - {MINHASH["shingle_k"]} + 2)])
              END AS s FROM norm),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               AND least(len(a.s), len(b.s))
                   >= {MINHASH["threshold"]} * greatest(len(a.s), len(b.s))),
            sim AS (
              SELECT id_a, id_b,
                     len(list_intersect(sa, sb))::BIGINT AS n_inter,
                     (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
                       AS n_union
              FROM cand)"""
_MINHASH_COND = (f"n_union = 0 OR n_inter / n_union "
                 f">= {MINHASH['threshold']}")


def q_minhash_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs, verified to EXACT integer
    (n_inter, n_union) shingle overlap via repartition joins — matches the
    all-pairs exact-Jaccard SQL oracle (no driver-side corpus read, no
    text broadcast)."""
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return minhash_dup_pairs(ds, **MINHASH)


def q_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs. bands=4 pigeonhole banding makes recall at
    max_dist=3 EXACT by construction, and the md5-based fingerprint is
    SQL-expressible — the all-pairs Hamming oracle is a true oracle."""
    from pypdfium2_ray.stages.dedup import simhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return simhash_dup_pairs(ds, ngram_n=3, bands=4, max_dist=3)


def q_cocitation(sf_dir: str):
    """Co-citation 'related pages' pairs (stages/triangles
    .cocitation_counts — Dean & Henzinger WWW'99): page pairs linked by
    >= 2 distinct sources over the synthetic graph; one src exchange for
    distinct-target pair generation (out-degree-quadratic, loud max_out
    cap), one packed-key exchange for the counts."""
    from pypdfium2_ray.stages.triangles import cocitation_counts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        return cocitation_counts(edges, min_count=2)


def _cocitation_sql() -> str:
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)
          FROM nodes),
        de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
                            WHERE src <> dst)
        SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS n_common
        FROM de a JOIN de b ON a.src = b.src AND a.dst < b.dst
        GROUP BY a.dst, b.dst HAVING count(*) >= 2"""


#: deterministic walk corpus: 2 walks per node, 4 steps
WALKS_PER_NODE = 2
WALK_LEN = 4


def q_graph_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk corpus (stages/walks): the next
    edge at step s of walk w from node u is md5_64(f\"{w}|{s}|{u}\") %
    outdeg(u) — run/shard/cluster-invariant training sequences with an
    exact md5_number_upper SQL twin. One edge-ranking exchange, then two
    ids-only joins per step; sinks end walks via the inner join."""
    from pypdfium2_ray.stages.walks import graph_walks
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    with _hint(sf_dir):
        return graph_walks(edges, nodes, walks_per_node=WALKS_PER_NODE,
                           length=WALK_LEN)


def _graph_walks_sql() -> str:
    """Per-step CTE: join the previous positions onto row_number-ranked
    edges where the rank equals the md5 choice (both sides UBIGINT, the
    full-range modulo the engine computes in exact python ints)."""
    T, L = WALKS_PER_NODE, WALK_LEN
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        "ie AS MATERIALIZED (SELECT src, dst,"
        " row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,"
        " count(*) OVER (PARTITION BY src) AS outdeg FROM edges)",
        f"w0 AS (SELECT node * {T} + t AS walk_id, node FROM nodes,"
        f" unnest(generate_series(0, {T - 1})) AS u(t))",
    ]
    for s in range(L):
        ctes.append(
            f"w{s + 1} AS MATERIALIZED (SELECT w.walk_id, e.dst AS node "
            f"FROM w{s} w JOIN ie e ON e.src = w.node "
            f"AND CAST(e.r AS UBIGINT) = md5_number_upper("
            f"w.walk_id::VARCHAR || '|{s}|' || w.node::VARCHAR) "
            f"% CAST(e.outdeg AS UBIGINT))")
    parts = [f"SELECT walk_id, CAST({p} AS BIGINT) AS pos, node FROM w{p}"
             for p in range(L + 1)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(parts)


#: content-defined chunking: 16-char gear window, 6 mask bits (expected
#: 64-char chunks) — small enough that the sf corpora share real chunks
CDC_WINDOW = 16
CDC_MASK_BITS = 6


def q_shared_chunks(sf_dir: str):
    """Cross-document shared chunks via content-defined chunking
    (stages/cdc — FastCDC-lineage windowed gear hash over code points):
    boundaries cut where the W-char gear sum hits the mask, chunk md5s
    pre-combined (occurrences + distinct docs) per block, ONE hash
    exchange on chunk_md5. The mask test commutes with uint64 wraparound
    (2^mask_bits | 2^64), so the HUGEINT SQL twin is exact."""
    from pypdfium2_ray.stages.cdc import shared_chunks
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return shared_chunks(ds, window=CDC_WINDOW, mask_bits=CDC_MASK_BITS)


def _shared_chunks_sql() -> str:
    """Per-position windowed gear sum as a W-wide self-join (weight
    2^(distance), summed in HUGEINT — the 48-bit gear keeps each shifted
    term within BIGINT for ``<<``), boundary rows -> lag() spans + the
    per-doc tail, chunk md5 + rollup. Short docs (< W chars) fall out of
    the tail branch as their single full-length chunk."""
    w, mask = CDC_WINDOW, (1 << CDC_MASK_BITS)
    return f"""
        WITH ch AS (SELECT doc_id, text FROM documents
                    WHERE text IS NOT NULL AND length(text) > 0),
        pos AS (SELECT doc_id, i, unicode(substr(text, i, 1)) AS cp
                FROM ch, unnest(generate_series(1, length(text))) AS t(i)),
        g AS (SELECT doc_id, i,
                     CAST(md5_number_upper(cp::VARCHAR) >> 16 AS BIGINT)
                       AS gv FROM pos),
        h AS (SELECT a.doc_id, a.i,
                     sum(CAST(b.gv << (a.i - b.i) AS HUGEINT)) AS hsum
              FROM g a JOIN g b ON b.doc_id = a.doc_id
                   AND b.i BETWEEN a.i - {w - 1} AND a.i
              WHERE a.i >= {w}
              GROUP BY a.doc_id, a.i),
        bnd AS (SELECT doc_id, i FROM h WHERE hsum % {mask} = 0),
        spans AS (
          SELECT doc_id,
                 COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                          0) + 1 AS s,
                 i AS e
          FROM bnd
          UNION ALL
          SELECT c.doc_id, COALESCE(mx.m, 0) + 1, length(c.text)
          FROM ch c LEFT JOIN (SELECT doc_id, max(i) AS m FROM bnd
                               GROUP BY doc_id) mx USING (doc_id)
          WHERE length(c.text) > COALESCE(mx.m, 0)),
        chunks AS (SELECT sp.doc_id,
                          md5(substr(c.text, sp.s, sp.e - sp.s + 1))
                            AS chunk_md5
                   FROM spans sp JOIN ch c USING (doc_id))
        SELECT chunk_md5, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY chunk_md5 HAVING count(*) >= 2"""


#: template threshold: a chunk is per-source boilerplate when it appears
#: in >= 1/5 of the source's chunk-producing docs (and >= 2 of them)
TPL_FRAC = (1, 5)


def q_template_chunks(sf_dir: str):
    """Per-source template (boilerplate) chunks (stages/cdc
    .template_chunks): CDC chunk contents present in >= 20% of a
    source's docs — the nav-bar/footer detector. Numerators AND the
    per-source denominators both derive from ONE chunk-row scan (the
    denominator rides the exchange as ``chunk_md5=''`` sentinel rows),
    so the whole rollup is one pass + ONE hash exchange on source.
    Threshold compared in exact integers: n_docs*5 >= src_docs."""
    from pypdfium2_ray.stages.cdc import template_chunks
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    with _hint(sf_dir):
        return template_chunks(ds, group_col="source", window=CDC_WINDOW,
                               mask_bits=CDC_MASK_BITS,
                               frac_num=TPL_FRAC[0], frac_den=TPL_FRAC[1])


def _template_chunks_sql() -> str:
    """Same chunker CTEs as _shared_chunks_sql (source carried through),
    plus a per-source chunk-producing-doc total and the integer-exact
    20% threshold."""
    w, mask = CDC_WINDOW, (1 << CDC_MASK_BITS)
    num, den = TPL_FRAC
    return f"""
        WITH ch AS (SELECT doc_id, text, source FROM documents
                    WHERE text IS NOT NULL AND length(text) > 0),
        pos AS (SELECT doc_id, i, unicode(substr(text, i, 1)) AS cp
                FROM ch, unnest(generate_series(1, length(text))) AS t(i)),
        g AS (SELECT doc_id, i,
                     CAST(md5_number_upper(cp::VARCHAR) >> 16 AS BIGINT)
                       AS gv FROM pos),
        h AS (SELECT a.doc_id, a.i,
                     sum(CAST(b.gv << (a.i - b.i) AS HUGEINT)) AS hsum
              FROM g a JOIN g b ON b.doc_id = a.doc_id
                   AND b.i BETWEEN a.i - {w - 1} AND a.i
              WHERE a.i >= {w}
              GROUP BY a.doc_id, a.i),
        bnd AS (SELECT doc_id, i FROM h WHERE hsum % {mask} = 0),
        spans AS (
          SELECT doc_id,
                 COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                          0) + 1 AS s,
                 i AS e
          FROM bnd
          UNION ALL
          SELECT c.doc_id, COALESCE(mx.m, 0) + 1, length(c.text)
          FROM ch c LEFT JOIN (SELECT doc_id, max(i) AS m FROM bnd
                               GROUP BY doc_id) mx USING (doc_id)
          WHERE length(c.text) > COALESCE(mx.m, 0)),
        chunks AS (SELECT sp.doc_id, c.source,
                          md5(substr(c.text, sp.s, sp.e - sp.s + 1))
                            AS chunk_md5
                   FROM spans sp JOIN ch c USING (doc_id)),
        tot AS (SELECT source, count(*) AS src_docs FROM ch
                GROUP BY source),
        agg AS (SELECT source, chunk_md5,
                       count(DISTINCT doc_id) AS n_docs
                FROM chunks GROUP BY source, chunk_md5)
        SELECT a.source, a.chunk_md5, a.n_docs::BIGINT AS n_docs,
               t.src_docs::BIGINT AS src_docs
        FROM agg a JOIN tot t USING (source)
        WHERE a.n_docs * {den} >= t.src_docs * {num}
          AND a.n_docs >= 2"""


def _decorate_boilerplate(t):
    """Plant deterministic per-source boilerplate lines around each doc
    (the normalize_text planting pattern — the synthetic corpus is
    single-line, so the template structure is SQL-composed identically
    on both sides): a nav header + copyright footer on EVERY doc (100%),
    a promo line on doc_id%3==0 (33% >= 20% threshold: stripped), a rare
    notice on doc_id%50==0 (2% < 20%: kept)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    t = t.filter(pc.is_valid(t["text"]))
    did = pc.cast(t["doc_id"], pa.int64()).combine_chunks()
    src = pc.cast(t["source"], pa.string()).combine_chunks()
    d = did.to_numpy(zero_copy_only=False)
    cat = (lambda *parts: pc.binary_join_element_wise(*parts, ""))
    promo = pc.if_else(pa.array(d % 3 == 0),
                       cat("subscribe to ", src, " newsletter\n"),
                       pa.scalar(""))
    rare = pc.if_else(pa.array(d % 50 == 0),
                      cat("rare notice ", src, "\n"), pa.scalar(""))
    text = cat("home | ", src, " | about\n", promo,
               t["text"].combine_chunks(), "\n", rare, "(c) 2026 ", src)
    return pa.table({"doc_id": did, "text": text, "source": src})


def q_strip_boilerplate(sf_dir: str):
    """Per-source boilerplate LINE stripping (stages/boilerplate
    .strip_boilerplate — the rewrite tier of the template family):
    lines in >= 20% of a source's docs are removed and the doc
    reassembled. Census pays ONE source exchange (sentinel-row
    denominators on the same exchange); the rewrite pays one more with
    the text payload crossing the wire once. Planted header/footer
    (100%) and promo (33%) lines must vanish; the rare notice (2%) and
    the body must survive — threshold exercised on both sides."""
    from pypdfium2_ray.stages.boilerplate import strip_boilerplate
    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        _decorate_boilerplate, batch_format="pyarrow")
    with _hint(sf_dir):
        return strip_boilerplate(ds, frac_num=TPL_FRAC[0],
                                 frac_den=TPL_FRAC[1])


def _strip_boilerplate_sql() -> str:
    """Line explode via the list-index idiom (no WITH ORDINALITY in
    DuckDB), per-source frequency census, LEFT-JOIN template flag,
    ordered string_agg rebuild; COALESCE('') keeps all-boilerplate docs
    alive like the engine does."""
    num, den = TPL_FRAC
    return f"""
        WITH d0 AS (SELECT doc_id, source, text FROM documents
                    WHERE text IS NOT NULL),
        dec AS (SELECT doc_id, source,
                  'home | ' || source || ' | about' || chr(10) ||
                  CASE WHEN doc_id % 3 = 0 THEN
                    'subscribe to ' || source || ' newsletter' || chr(10)
                    ELSE '' END ||
                  text || chr(10) ||
                  CASE WHEN doc_id % 50 = 0 THEN
                    'rare notice ' || source || chr(10) ELSE '' END ||
                  '(c) 2026 ' || source AS text
                FROM d0),
        ls AS (SELECT doc_id, source, string_split(text, chr(10)) AS l
               FROM dec),
        lines AS (SELECT doc_id, source, i, l[i] AS ln
                  FROM ls, unnest(generate_series(1, len(l))) AS t(i)),
        tot AS (SELECT source, count(*) AS sd FROM dec GROUP BY source),
        freq AS (SELECT source, md5(ln) AS lm,
                        count(DISTINCT doc_id) AS n
                 FROM lines GROUP BY source, md5(ln)),
        tpl AS (SELECT f.source, f.lm FROM freq f JOIN tot USING (source)
                WHERE f.n * {den} >= sd * {num} AND f.n >= 2),
        mk AS (SELECT l.doc_id, l.i, l.ln, (t.lm IS NOT NULL) AS is_tpl
               FROM lines l LEFT JOIN tpl t
                 ON t.source = l.source AND t.lm = md5(l.ln))
        SELECT doc_id,
               COALESCE(string_agg(ln, chr(10) ORDER BY i)
                        FILTER (WHERE NOT is_tpl), '') AS clean_text,
               (count(*) FILTER (WHERE is_tpl))::BIGINT AS n_dropped
        FROM mk GROUP BY doc_id"""


#: fp_neighbors value window (unsigned-64 fingerprint line): ~C(n,2) *
#: 2*delta/2^64 expected pairs on a uniform corpus — a handful at
#: sf0.001, ~400 at sf0.01
FPN_DELTA = 1 << 48


def q_fp_neighbors(sf_dir: str):
    """Sorted-neighborhood blocking pairs (stages/blocking): docs whose
    64-bit simhash fingerprints land within FPN_DELTA of each other on
    the unsigned line. ONE range-bucket exchange with halo replication
    (delta/W = 1/256 of rows ride twice); the exactly-once emission rule
    (higher member native) makes the pair set — and the exact distances
    — hash-comparable to the HUGEINT range-join SQL twin."""
    from pypdfium2_ray.stages.blocking import fingerprint_window_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return fingerprint_window_pairs(ds, ngram_n=3, delta=FPN_DELTA)


def q_top_user_per_type(sf_dir: str):
    """Grouped mode (most frequent value per group, deterministic
    tie-break): exact (event_type, user) counts then grouped_topk(k=1) —
    per-block partial quota, one survivors exchange."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.topk import grouped_topk
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        cnt = grouped_aggregate(ds, ["event_type", "user_id"],
                                {"n": (None, "count")})
        return grouped_topk(cnt, ["event_type"], ["n", "user_id"], k=1,
                            descending=[True, False])


def q_user_rolling_7d(sf_dir: str):
    """7-day trailing event count per user per active day
    (stages/window.rolling_window_sum — the RANGE-window analogue):
    per-(user, day) counts then ONE user exchange with a composite-key
    searchsorted kernel (zero per-user Python). Oracle: the same RANGE
    window in SQL."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.window import rolling_window_sum

    def to_day(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "day": pc.divide(us, 86_400_000_000)})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"]).map_batches(
        to_day, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        daily = grouped_aggregate(ds, ["user_id", "day"],
                                  {"n": (None, "count")})
        return rolling_window_sum(daily, "user_id", "day", "n",
                                  window=7, out="n_7d")


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped top revenue orders for one market segment — the
    LARGE x LARGE join path (pipelines/relational.shipping_priority):
    two keys-only exchange-tier semi joins, integer-exact revenue
    (price-cents x discount-hundredths)."""
    from pypdfium2_ray.pipelines.relational import shipping_priority
    with _hint(sf_dir, "lineitem"):
        return shipping_priority(sf_dir, segment="BUILDING", k=10)


def q_cohort_retention(sf_dir: str):
    """Cohort-retention matrix over events (stages/sessionize.
    cohort_retention): day buckets, first-seen cohort via grouped min +
    repartition join, exact distinct active users per (cohort_day,
    day_offset) cell."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import cohort_retention
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return cohort_retention(ds)


def q_length_rank(sf_dir: str):
    """Per-language window rank (stages/topk.grouped_rank — the
    row_number() analogue: one exchange, per-partition sort + run-offset
    arange, zero per-group Python). Rank by (n_chars, doc_id) ascending."""
    from pypdfium2_ray.stages.topk import grouped_rank
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    with _hint(sf_dir):
        out = grouped_rank(ds, ["lang"], ["n_chars", "doc_id"])
    return _cast_i64(out, ["n_chars", "rank"])


def q_pack_offsets(sf_dir: str):
    """GPT-style sequence packing (stages/scan.pack_offsets): distributed
    two-phase range scan computes each doc's exact start offset in the
    key-ordered concatenation, then the example ids it spans at
    example_len=1024 — all integer arithmetic, verified by a window
    cumsum oracle."""
    from pypdfium2_ray.stages.scan import pack_offsets
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    with _hint(sf_dir):
        out = pack_offsets(ds, example_len=1024)
    return _cast_i64(out, ["n_chars"])


def q_shuffle_assign(sf_dir: str):
    """Deterministic training-data shuffle (stages/shuffle.
    deterministic_shuffle): shard = md5(doc_id) % 16, position = rank
    within shard by (md5 >> 1, doc_id) — the reproducible epoch-order
    export; whole order verified by a window-function oracle."""
    from pypdfium2_ray.stages.shuffle import deterministic_shuffle
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    with _hint(sf_dir):
        out = deterministic_shuffle(ds, key_col="doc_id", n_shards=16)
    return _cast_i64(out, ["n_chars"])


#: negative_pairs: hash-ring buckets / negatives per anchor
NEG_BUCKETS = 16
NEG_K = 2


def q_negative_pairs(sf_dir: str):
    """Deterministic contrastive-negative mining (stages/shuffle.
    ring_negative_pairs): k=2 negatives per doc by cyclic next-neighbor
    pairing within md5-hash buckets sorted by (md5 >> 1, doc_id) — the
    in-batch-negatives recipe with no RNG, reproducible across runs and
    cluster sizes. One ids-only exchange; the twin replays the ring
    with row_number/count window functions."""
    from pypdfium2_ray.stages.shuffle import ring_negative_pairs
    ds = _docs(sf_dir, ["doc_id"])
    with _hint(sf_dir):
        return ring_negative_pairs(ds, key_col="doc_id",
                                   n_buckets=NEG_BUCKETS, k=NEG_K)


def _negative_pairs_sql() -> str:
    js = ", ".join(str(j) for j in range(1, NEG_K + 1))
    return f"""
WITH h AS (SELECT doc_id,
                  md5_number_upper(doc_id::VARCHAR) AS m FROM documents),
r AS (SELECT doc_id,
             (m % {NEG_BUCKETS})::BIGINT AS bkt,
             row_number() OVER (PARTITION BY m % {NEG_BUCKETS}
                                ORDER BY m >> 1, doc_id) AS rn,
             count(*) OVER (PARTITION BY m % {NEG_BUCKETS}) AS c
      FROM h),
js AS (SELECT unnest([{js}]) AS j)
SELECT a.doc_id AS anchor, nb.doc_id AS negative
FROM r a CROSS JOIN js
JOIN r nb ON nb.bkt = a.bkt AND nb.rn = (a.rn - 1 + js.j) % a.c + 1
WHERE js.j < a.c"""


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) in the INTEGER-EXACT regime
    (stages/ann.semantic_dedup_exact): kmeans_exact clusters + the
    in-cluster cosine threshold cross-multiplied to integers
    (cos > 0.95  <=>  ab > 0 AND 400*ab^2 > 361*aa*bb over e3-quantized
    vectors) — no float in any keep decision, so the unrolled SQL twin
    matches row-for-row (previously rows-only). Keep-min-id semantics,
    ONE cluster exchange, int64-exact Gram matrix per cluster."""
    from pypdfium2_ray.stages.ann import semantic_dedup_exact
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return semantic_dedup_exact(ds, k=8, n_iter=5, tau_sq=(361, 400),
                                scale=1000)


def q_collocations(sf_dir: str):
    """Top-20 bigram collocations with integer-exact PMI ingredients
    (stages/freq.collocations): exact bigram + unigram counts (one
    exchange each, per-block pre-combine), global partial top-k, and
    marginal lookups that prefilter the vocabulary against the 40
    candidate words before any exchange."""
    from pypdfium2_ray.stages.freq import collocations
    ds = _docs(sf_dir, ["text"])
    with _hint(sf_dir):
        return collocations(ds, k=20)


def q_kmeans_assign(sf_dir: str):
    """Distributed k-means over the embeddings corpus in the
    INTEGER-EXACT regime (stages/ann.kmeans_exact): e3-quantized
    vectors, integer squared-Euclidean assignment (ties to the lowest
    cluster), floor-division centroid updates, md5-ordered seeds —
    the pagerank fixed-point discipline applied to clustering, so the
    iterative algorithm has a TRUE unrolled-CTE SQL twin (previously
    rows-only). Broadcast centroids + one vectorized pass per block +
    k x d integer partials in a single-block combine; the spherical
    float variant (stages/ann.kmeans) stays the ANN-tier default."""
    from pypdfium2_ray.stages.ann import kmeans_exact
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    _, assign = kmeans_exact(ds, k=8, n_iter=5, scale=1000)
    return assign


def _kmeans_sql(n_iter: int = 5, k: int = 8, scale: int = 1000,
                tail: str = "SELECT vec_id, cluster FROM afin") -> str:
    """Unrolled-CTE integer Lloyd k-means twin (stages/ann.kmeans_exact):
    the same trick as the pagerank/hits oracles — an iterative algorithm
    whose state is integers is just n_iter CTE pairs. Seeds via
    md5_number_upper (== functions/sketch.md5_hash64), assignment via
    integer squared-Euclidean + (dist, cluster) row_number, update via
    floor(sum/count) double division (exact under the engine's 2^53
    guard), empty clusters COALESCE to the previous centroid."""
    def assign(name, cents):
        return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT v.vec_id, c.cluster,
                 sum((v.val - c.val) * (v.val - c.val)) AS dist
          FROM v JOIN {cents} c USING (dim)
          GROUP BY 1, 2))
  WHERE rn = 1)"""

    ctes = [f"""v AS (
  SELECT vec_id::BIGINT AS vec_id,
         (generate_subscripts(embedding, 1) - 1)::BIGINT AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale})
              AS BIGINT) AS val
  FROM embeddings)""", f"""seeds AS (
  SELECT vec_id::BIGINT AS vec_id,
         row_number() OVER (
             ORDER BY md5_number_upper(vec_id::VARCHAR) >> 1, vec_id)
           - 1 AS cluster
  FROM embeddings
  QUALIFY cluster < {k})""", """c0 AS (
  SELECT s.cluster, v.dim, v.val FROM seeds s JOIN v USING (vec_id))"""]
    for i in range(1, n_iter + 1):
        ctes.append(assign(f"a{i}", f"c{i - 1}"))
        ctes.append(f"""u{i} AS (
  SELECT a.cluster, v.dim,
         CAST(floor(CAST(sum(v.val) AS DOUBLE) / count(*)) AS BIGINT)
           AS val
  FROM a{i} a JOIN v USING (vec_id)
  GROUP BY 1, 2)""")
        ctes.append(f"""c{i} AS (
  SELECT c.cluster, c.dim, COALESCE(u.val, c.val) AS val
  FROM c{i - 1} c LEFT JOIN u{i} u USING (cluster, dim))""")
    ctes.append(assign("afin", f"c{n_iter}"))
    return "WITH " + ",\n".join(ctes) + "\n" + tail


def _semantic_dedup_sql(n_iter: int = 5, k: int = 8, scale: int = 1000,
                        p: int = 361, q: int = 400) -> str:
    """SemDeDup twin on top of :func:`_kmeans_sql`: in-cluster pair
    cosine threshold cross-multiplied to integers
    (ab > 0 AND q*ab^2 > p*aa*bb over the same e-quantized vectors);
    a row drops when ANY lower-id cluster member clears the threshold."""
    tail = f""", norms AS (
  SELECT vec_id, sum(val * val) AS nn FROM v GROUP BY 1),
sims AS (
  SELECT a.vec_id AS ka, b.vec_id AS kb,
         sum(va.val * vb.val) AS ab
  FROM afin a
  JOIN afin b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id AND vb.dim = va.dim
  GROUP BY 1, 2),
dups AS (
  SELECT DISTINCT s.kb AS vec_id
  FROM sims s
  JOIN norms na ON na.vec_id = s.ka
  JOIN norms nb ON nb.vec_id = s.kb
  WHERE s.ab > 0 AND {q} * s.ab * s.ab > {p} * na.nn * nb.nn)
SELECT a.vec_id, a.cluster FROM afin a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)"""
    return _kmeans_sql(n_iter=n_iter, k=k, scale=scale, tail=tail)


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid ingredients (stages/ann.
    grouped_vector_sums): one reduceat pass per block over the (rows x
    dims) matrix, scaled-integer sums (floor(v * 1e6) — float summation
    order can never flip a bit), enum-keyed single-block combine (no
    exchange). The oracle recomputes the same integer sums via
    unnest + generate_subscripts."""
    from pypdfium2_ray.stages.ann import grouped_vector_sums
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["embedding", "label"])
    out = grouped_vector_sums(ds, key_col="label", vec_col="embedding")
    return _cast_i64(out, ["label"])


def q_audio_features(sf_dir: str):
    """REAL audio decode end-to-end (the WAV leg of the multimodal
    tier): synthesize a deterministic 16-bit PCM WAV per document
    (functions/wav.encode_wav — samples are a pure integer function of
    (doc_id, n_chars)), decode it back with the from-scratch RIFF
    parser (stages/multimodal.DecodeAudio), and report integer-exact
    sample features (sum of squares, peak). The oracle recomputes every
    field — including the sample math via a list comprehension — from
    the documents table alone."""
    import numpy as np

    from pypdfium2_ray.functions.wav import encode_wav
    from pypdfium2_ray.stages.multimodal import decode_audio

    def to_wav(t: pa.Table) -> pa.Table:
        payloads = []
        for d, n in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            s = ((np.arange(int(n), dtype=np.int64) * 7 + int(d)) % 65536
                 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, 8000 + (int(d) % 4) * 4000))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        to_wav, batch_format="pyarrow")
    out = decode_audio(ds).select_columns(
        ["id", "sample_rate", "channels", "bits_per_sample", "n_samples",
         "duration_us", "sum_sq", "peak"])
    return _cast_i64(out, ["sample_rate", "channels", "bits_per_sample"])


def q_audio_resample(sf_dir: str):
    """REAL audio resample end-to-end (multimodal.ResampleAudio — the
    audio analogue of image_resize): same deterministic PCM synth as
    audio_features, decimate by 2 (NN gather on the frame axis), halve
    the rate, RE-ENCODE, and report the re-parsed container's integer
    features — the oracle recomputes the decimated sample math
    (range step 2) from the documents table alone, so the full decode →
    gather → encode → decode chain is hash-gated."""
    import numpy as np

    from pypdfium2_ray.functions.wav import encode_wav
    from pypdfium2_ray.stages.multimodal import resample_audio

    def to_wav(t: pa.Table) -> pa.Table:
        payloads = []
        for d, n in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
            s = ((np.arange(int(n), dtype=np.int64) * 7 + int(d)) % 65536
                 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, 8000 + (int(d) % 4) * 4000))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        to_wav, batch_format="pyarrow")
    out = resample_audio(ds, factor=2).select_columns(
        ["id", "sample_rate", "n_samples", "duration_us", "sum_sq",
         "peak"])
    return _cast_i64(out, ["sample_rate"])


def q_stratified_sample(sf_dir: str):
    """Per-language quota sample (data mixing: cap every language at 30
    docs) with deterministic md5-hash membership — stages/topk.
    stratified_sample; QUALIFY row_number oracle over the same halved
    md5_number_upper ordering."""
    from pypdfium2_ray.stages.topk import stratified_sample
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    with _hint(sf_dir):
        out = stratified_sample(ds, ["lang"], "doc_id", k=30)
    return _cast_i64(out, ["n_chars"])


def q_span_dedup(sf_dir: str):
    """Duplicate-span removal (fixed 10-token windows, keep globally
    first occurrence, docs reassembled from surviving spans) — the
    distributable approximation of Lee-et-al exact substring dedup.
    Two exchanges: span-value keep-first (hot keys pre-combined per
    block) then per-doc reassembly via one vectorized binary_join."""
    from pypdfium2_ray.stages.dedup import span_dedup
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return span_dedup(ds, span_tokens=10)


def _minhash_pairs(sf_dir: str):
    """Shared ids-only near-dup pair edge list for the cluster queries."""
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    return minhash_dup_pairs(ds, **MINHASH).select_columns(["id_a", "id_b"])


def q_neardup_clusters(sf_dir: str):
    """Duplicate-cluster labeling: MinHash+LSH pairs -> distributed
    connected components (alternating large-star/small-star,
    stages/components.py — ids-only exchanges, O(log n) rounds) ->
    (doc_id, component-min-id) for every doc in any near-dup cluster.
    Oracle: the same pair set fed to a WITH RECURSIVE reachability walk."""
    with _hint(sf_dir):
        from pypdfium2_ray.stages.components import connected_components
        return connected_components(_minhash_pairs(sf_dir))


def q_neardup_keep_one(sf_dir: str):
    """The end-to-end FineWeb/C4-style near-dedup: cluster the near-dup
    pairs, keep the min-id doc per cluster, drop the rest — an ANTI join
    of the corpus against the non-canonical member ids (ids broadcast
    once, zero payload shuffle; stages/join.key_filter_join)."""
    with _hint(sf_dir):
        from pypdfium2_ray.stages.components import connected_components
        from pypdfium2_ray.stages.join import key_filter_join
        cc = connected_components(_minhash_pairs(sf_dir)).materialize()
        losers = cc.filter(expr="doc_id != component") \
                   .select_columns(["doc_id"])
        docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        out = key_filter_join(docs, losers, "doc_id", mode="anti")
    return _cast_i64(out, ["n_chars"])


#: PageRank link-graph synthesis — pure doc_id arithmetic, so the DuckDB
#: oracle builds the identical edge list. Three out-edges per page:
#: a scatter permutation ((src*PR_MULT+1) % N), a HUB link (src % PR_HUBS
#: — the first PR_HUBS pages collect ~N/PR_HUBS in-links each, the
#: power-law-ish skew a real web graph has), and a cluster link
#: ((src//3) % N). Parallel edges / self-loops are allowed (both sides
#: agree; tested in tests/test_pagerank.py).
PR_MULT = 7919
PR_HUBS = 97
PR_ITERS = 4
PR_DAMPING = 85
PR_INIT = 10**9


def _synth_link_edges(n: int):
    """Per-batch builder of the synthetic skewed link graph (shared by
    q_pagerank and q_hits — identical edge list both sides)."""
    import numpy as np

    def edges(t: pa.Table) -> pa.Table:
        s = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        srcs = np.repeat(s, 3)
        dst = np.stack([(s * PR_MULT + 1) % n,       # scatter permutation
                        s % PR_HUBS,                 # hub link (skew)
                        (s // 3) % n],               # cluster link
                       axis=1).reshape(-1)
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return edges


def q_pagerank(sf_dir: str):
    """Link-graph PageRank (stages/pagerank — the canonical web-scale
    iterative graph op): synthesize a deterministic 3-out-regular link
    graph over the doc ids, run PR_ITERS damped integer fixed-point
    iterations (two ids-only exchanges per iteration: rank->edge join +
    per-dst sum). Integer-scaled arithmetic makes the result bit-identical
    at any partitioning; the oracle unrolls the same update rule as
    chained CTEs."""
    from pypdfium2_ray.stages.pagerank import pagerank
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    with _hint(sf_dir):
        out = pagerank(docs.map_batches(edges, batch_format="pyarrow"),
                       nodes, iters=PR_ITERS, damping_pct=PR_DAMPING,
                       init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rank_scaled": t["rank"]}),
        batch_format="pyarrow")


#: dup_spans: 5-token sliding windows, >=2 corpus-wide occurrences —
#: 58/71/2468 maximal spans at sf0.001/0.01/0.1 (live scale growth)
DSP_WINDOW = 5
DSP_MIN_COUNT = 2


def q_dup_spans(sf_dir: str):
    """Any-alignment duplicated-span detection (stages/dupspans — the
    Lee ACL'22 ExactSubstr semantics in distributable sliding-gram
    form): census every sliding 5-token gram (per-block pre-combined
    md5 partials, ONE exchange — the operator's only one), broadcast
    the bounded duplicated-gram set once, then a pure per-block span
    pass merges each doc's hit windows into maximal [s_tok, e_tok)
    spans — doc text never crosses the wire. Catches duplicates at ANY
    offset, unlike the fixed-window span_dedup."""
    from pypdfium2_ray.stages.dupspans import dup_spans
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return dup_spans(ds, window=DSP_WINDOW, min_count=DSP_MIN_COUNT)


def _dup_spans_sql() -> str:
    w, mc = DSP_WINDOW, DSP_MIN_COUNT
    cat = " || ' ' || ".join(f"a[i+{j}]" if j else "a[i]" for j in range(w))
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
           text, {ws}), x -> x <> '') AS a FROM documents),
g AS (SELECT doc_id, unnest([{{'p': i - 1, 'h': md5({cat})}}
      for i in range(1, len(a) - {w - 2})]) AS x FROM t),
gg AS (SELECT doc_id, x.p AS s, x.p + {w} AS e, x.h AS h FROM g),
dup AS (SELECT h FROM gg GROUP BY h HAVING count(*) >= {mc}),
hit AS (SELECT doc_id, s, e FROM gg JOIN dup USING (h)),
m AS (SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS ni
      FROM hit WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)),
isl AS (SELECT doc_id, s, e,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS island FROM m)
SELECT doc_id, min(s)::BIGINT AS s_tok, max(e)::BIGINT AS e_tok,
       count(*)::BIGINT AS n_windows
FROM isl GROUP BY doc_id, island"""


#: phrase with live occurrences at every sf (9/3/10 match starts)
PHRASE = ("big", "order", "scan")


def q_phrase_search(sf_dir: str):
    """Exact phrase query answered from the positional inverted index
    (stages/invindex.positional_postings + phrase_match — the IR
    textbook positional intersection, Manning IIR ch.2): postings are
    built term-partitioned (one exchange — the index layout, a doc's
    terms deliberately NOT co-located), then each phrase slot j emits
    ids-only (doc, pos - j, j) rows and ONE (doc, adj) exchange +
    vectorized group-count finds starts where all slots align. Returns
    (doc_id, pos) match starts."""
    from pypdfium2_ray.stages.invindex import (phrase_match,
                                               positional_postings)
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        postings = positional_postings(ds)
        return phrase_match(postings, list(PHRASE))


def _phrase_search_sql() -> str:
    k = len(PHRASE)
    cond = " AND ".join(f"a[i+{j}] = '{w}'" for j, w in enumerate(PHRASE))
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
                   text, {ws}), x -> x <> '') AS a FROM documents)
        SELECT doc_id,
               unnest([i - 1 for i in range(1, len(a) - {k - 2})
                       if {cond}])::BIGINT AS pos
        FROM t"""


#: bool_search: all_of / none_of term sets (mid-selectivity, ~10%)
BOOL_ALL = ("vector", "window")
BOOL_NONE = ("spark",)


def q_bool_search(sf_dir: str):
    """Conjunctive boolean retrieval with negation
    (stages/invindex.boolean_search): docs containing every all_of term
    and no none_of term. Because a document is row-contained this is a
    ZERO-exchange streaming map — per block: tokenize, is_in-filter to
    the query terms, distinct (doc, term), one pyarrow group_by counts
    positive/total query-term hits per doc."""
    from pypdfium2_ray.stages.invindex import boolean_search
    ds = _docs(sf_dir, ["doc_id", "text"])
    return boolean_search(ds, list(BOOL_ALL), list(BOOL_NONE))


def _bool_search_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    pos = ", ".join(f"'{t}'" for t in BOOL_ALL)
    neg = ", ".join(f"'{t}'" for t in BOOL_NONE)
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '{ws}')) AS term
  FROM documents),
m AS (SELECT doc_id,
             sum((term IN ({pos}))::INT) AS np,
             sum((term IN ({neg}))::INT) AS nn
      FROM pairs GROUP BY doc_id)
SELECT doc_id FROM m WHERE np = {len(BOOL_ALL)} AND nn = 0"""


def q_trustrank(sf_dir: str):
    """Seed-personalized PageRank — TrustRank (stages/pagerank
    .personalized_pagerank, Gyongyi VLDB'04): the teleport term lands
    only on the trusted seed set (doc_id % 500 == 7, the BFS seed list),
    so authority flows outward from seeds and spam-like unreachable
    clusters stay at 0. Same two-exchange-per-iteration budget as
    pagerank — the static seed base folds into the sum exchange as a
    max aggregate; integer fixed-point, bit-identical at any
    partitioning, unrolled by the twin as chained CTEs."""
    from pypdfium2_ray.stages.pagerank import personalized_pagerank
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    def seed_rows(t: pa.Table) -> pa.Table:
        node = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            node[node % BFS_SEED_MOD == BFS_SEED_RESIDUE], pa.int64())})

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    with _hint(sf_dir):
        out = personalized_pagerank(
            docs.map_batches(edges, batch_format="pyarrow"), nodes, seeds,
            iters=PR_ITERS, damping_pct=PR_DAMPING, init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "trust_scaled": t["rank"]}),
        batch_format="pyarrow")


def _trustrank_sql() -> str:
    base = ((100 - PR_DAMPING) * PR_INIT) // 100
    seed = (f"CASE WHEN n.node % {BFS_SEED_MOD} = {BFS_SEED_RESIDUE} "
            f"THEN {base} ELSE 0 END")
    n0 = (f"SELECT node, CASE WHEN node % {BFS_SEED_MOD} = "
          f"{BFS_SEED_RESIDUE} THEN CAST({PR_INIT} AS BIGINT) "
          f"ELSE 0 END AS r FROM nodes")
    parts = [f"""WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
edges AS (SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn) AS dst FROM nodes UNION ALL SELECT node, node % {PR_HUBS} FROM nodes UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS ({n0})"""]
    for i in range(1, PR_ITERS + 1):
        parts.append(f""",
r{i} AS (SELECT n.node, CAST({seed} + {PR_DAMPING} * COALESCE(s.insum, 0) // 100 AS BIGINT) AS r FROM nodes n LEFT JOIN (SELECT e.dst AS node, SUM(r.r // d.outdeg) AS insum FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst) s USING (node))""")
    parts.append(
        f"\nSELECT node AS doc_id, r AS trust_scaled FROM r{PR_ITERS}")
    return "".join(parts)


#: held-out "benchmark prompts" for n-gram-overlap decontamination —
#: each embeds a word trigram that genuinely occurs in the corpus (df
#: 7-9 at sf0.001), surrounded by novel words (the paraphrase case the
#: substring scan misses)
NGRAM_HELDOUT = ("please explain the big order scan now",
                 "typical group slow spark job behavior",
                 "remember the line agg hash trick")
NGRAM_N = 3


def q_ngram_decontaminate(sf_dir: str):
    """Benchmark decontamination by word n-gram OVERLAP
    (stages/textstats.ngram_decontaminate — the GPT-3 appendix-C
    discipline, the third decontamination tier next to the exact-hash
    blocklist and the verbatim substring scan): drop every document
    sharing any trigram with the held-out prompts. Per-block vectorized
    trigram explode + is_in against the broadcast held-out grams; only
    distinct hit ids leave workers; broadcast anti join back."""
    from pypdfium2_ray.stages.textstats import ngram_decontaminate
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ngram_decontaminate(ds, list(NGRAM_HELDOUT), n=NGRAM_N)
    return out.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                            "n_chars": pc.cast(pc.utf8_length(t["text"]),
                                               pa.int64())}),
        batch_format="pyarrow")


def _ngram_decontaminate_sql() -> str:
    import re as _re
    grams: set[str] = set()
    for h in NGRAM_HELDOUT:
        toks = [w for w in _re.split(r"[ \t\r\n\f\v]+", h) if w]
        grams.update(" ".join(toks[i:i + NGRAM_N])
                     for i in range(len(toks) - NGRAM_N + 1))
    vals = ", ".join("'" + g + "'" for g in sorted(grams))
    ws = r"'[ \t\r\n\f\v]+'"
    joined = " || ' ' || ".join(
        f"a[i+{j}]" if j else "a[i]" for j in range(NGRAM_N))
    return f"""
        WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
                   text, {ws}), x -> x <> '') AS a FROM documents),
        g AS (SELECT doc_id, unnest([{joined}
              for i in range(1, len(a) - {NGRAM_N - 2})]) AS gram FROM t),
        hit AS (SELECT DISTINCT doc_id FROM g WHERE gram IN ({vals}))
        SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM hit)"""


#: unigram-LM vocabulary cap — small enough that rare corpus terms fall
#: OUT of vocabulary, so the smoothing path is oracle-exercised too
LM_VOCAB = 50


def q_lm_score(sf_dir: str):
    """CCNet-style corpus LM quality score (stages/lmscore): top-50
    unigram vocabulary estimated on the corpus (one term exchange), then
    one streaming pass summing micro-scaled per-token log-probs per
    document (vocab broadcast via ray.put once; per-doc segment sums are
    block-complete cumsum differences). OOV smoothing 0.5/T; fixed-point
    ints end-to-end so the chained-CTE oracle is bit-exact."""
    from pypdfium2_ray.stages.lmscore import lm_score
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return lm_score(ds, vocab_size=LM_VOCAB)


def _lm_score_sql() -> str:
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                 text, {ws}), x -> x <> '')) AS term
          FROM documents),
        tot AS (SELECT count(*)::BIGINT AS t FROM toks),
        counts AS (SELECT term, count(*)::BIGINT AS c FROM toks
                   GROUP BY term),
        vocab AS (SELECT term, c FROM counts
                  ORDER BY c DESC, term LIMIT {LM_VOCAB}),
        lp AS (SELECT term, CAST(floor(ln(CAST(c AS DOUBLE) /
                    (SELECT t FROM tot)) * 1000000) AS BIGINT) AS lp
               FROM vocab),
        tok_lp AS (
          SELECT tk.doc_id,
                 COALESCE(lp.lp, CAST(floor(ln(0.5 / (SELECT t FROM tot))
                          * 1000000) AS BIGINT)) AS lp
          FROM toks tk LEFT JOIN lp ON tk.term = lp.term),
        agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                       CAST(sum(lp) AS BIGINT) AS logp_micro
                FROM tok_lp GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
               COALESCE(a.logp_micro, 0) AS logp_micro
        FROM documents d LEFT JOIN agg a USING (doc_id)"""


#: mixture weights (permille kept per source) for the data-mixing query:
#: full / half / one-tenth tiers
MIX_PERMILLE = {**{f"src{i}": 1000 for i in range(4)},
                **{f"src{i}": 500 for i in range(4, 8)}}
MIX_DEFAULT = 100


def q_mixture_sample(sf_dir: str):
    """Deterministic weighted mixture sampling
    (stages/textstats.mixture_sample — the data-mixing primitive: keep
    source s at permille[s]/1000 by md5-hash membership, so the blend is
    run/shard/cluster-invariant and nested across weight changes). One
    streaming filter, thresholds broadcast as a closure constant."""
    from pypdfium2_ray.stages.textstats import mixture_sample
    ds = _docs(sf_dir, ["doc_id", "source"])
    return mixture_sample(ds, "doc_id", "source", MIX_PERMILLE,
                          default_permille=MIX_DEFAULT)


def _mixture_sql() -> str:
    cases = " ".join(f"WHEN '{s}' THEN {p}"
                     for s, p in sorted(MIX_PERMILLE.items()))
    return f"""
        SELECT doc_id, source FROM documents
        WHERE md5_number_upper(doc_id::VARCHAR) % 1000 <
              CASE source {cases} ELSE {MIX_DEFAULT} END"""


#: held-out "benchmark" phrases for the substring contamination scan
CONTAM_PHRASES = ("data merge", "query window", "fast hash")


def q_contamination_scan(sf_dir: str):
    """Benchmark-contamination scan by SUBSTRING
    (stages/textstats.substring_scan — the complement of the exact-hash
    q_decontaminate blocklist: verbatim phrase leaks inside longer pages,
    which fingerprint dedup never catches). One vectorized
    match_substring pass per phrase, hit rows only; summarized per phrase
    with a single-block combine (the phrase set is enum-sized)."""
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.textstats import substring_scan
    ds = _docs(sf_dir, ["doc_id", "text"])
    hits = substring_scan(ds, list(CONTAM_PHRASES))
    return grouped_aggregate(hits, keys=["phrase"],
                             specs={"n_docs": (None, "count"),
                                    "min_doc": ("doc_id", "min")},
                             combine="single_block")


def _contamination_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in CONTAM_PHRASES)
    return f"""
        SELECT p.phrase, count(*)::BIGINT AS n_docs, min(d.doc_id) AS min_doc
        FROM documents d JOIN (VALUES {vals}) p(phrase)
          ON contains(d.text, p.phrase)
        GROUP BY 1"""


def q_url_dedup(sf_dir: str):
    """Crawl-frontier URL dedup: synthesize two messy spellings of each
    page URL from doc_id (uppercase host + default port + fragment vs the
    clean form — pure doc_id arithmetic, SQL-composable), canonicalize
    them (functions/url.canonicalize_url: RFC-3986-style fragment strip,
    case-fold of scheme+authority, default-port drop, root-slash
    collapse), and collapse duplicates with a per-canonical-URL rollup
    (one hash exchange; the curation step that keeps a crawl from
    fetching/training the same page twice)."""
    from pypdfium2_ray.functions.url import canonicalize_url
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def synth(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        pid = pc.divide(did, 2)
        site = pc.cast(pc.subtract(pid, pc.multiply(
            pc.divide(pid, 7), 7)), pa.string())     # pid % 7 (no pc.modulo)
        pid_s = pc.cast(pid, pa.string())
        messy = pc.binary_join_element_wise(
            pa.array(["HTTP://Site-"] * t.num_rows), site,
            pa.array([".Example.COM:80/page/"] * t.num_rows), pid_s,
            pa.array(["/#top"] * t.num_rows), "")
        clean = pc.binary_join_element_wise(
            pa.array(["http://site-"] * t.num_rows), site,
            pa.array([".example.com/page/"] * t.num_rows), pid_s,
            pa.array(["/"] * t.num_rows), "")
        odd = pc.equal(pc.subtract(did, pc.multiply(pc.divide(did, 2), 2)), 1)
        return pa.table({"doc_id": did,
                         "url": pc.if_else(odd, clean, messy)})

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "url_canon": canonicalize_url(t["url"])})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow") \
                                  .map_batches(canon, batch_format="pyarrow")
    with _hint(sf_dir):
        return grouped_aggregate(ds, keys=["url_canon"],
                                 specs={"n_dups": (None, "count"),
                                        "min_doc": ("doc_id", "min")})


def _url_dedup_sql() -> str:
    from pypdfium2_ray.functions.url import sql_canonicalize_url
    return f"""
        WITH raw AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 1
                   THEN 'http://site-' || CAST((doc_id // 2) % 7 AS VARCHAR)
                        || '.example.com/page/'
                        || CAST(doc_id // 2 AS VARCHAR) || '/'
                   ELSE 'HTTP://Site-' || CAST((doc_id // 2) % 7 AS VARCHAR)
                        || '.Example.COM:80/page/'
                        || CAST(doc_id // 2 AS VARCHAR) || '/#top'
                 END AS url
          FROM documents)
        SELECT {sql_canonicalize_url('url')} AS url_canon,
               count(*)::BIGINT AS n_dups,
               min(doc_id) AS min_doc
        FROM raw GROUP BY 1"""


def q_extract_links(sf_dir: str):
    """Hyperlink extraction over the raw crawl payloads
    (stages/linkgraph.extract_links): one compiled-regex anchor scan per
    document, nav/footer INCLUDED (a link graph wants every edge, unlike
    the stripped text tier); rows whose payload fails the parser's
    decode gate (docmodel.htmldoc.decode_payload — the exact
    parse_document refusal set) emit nothing, so the oracle's
    synthesis-predicate WHERE is exact. Each ok page carries the two
    boilerplate chrome links plus the per-doc related-page link."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import extract_links
    return extract_links(read_cc_from_documents(sf_dir))


def _extract_links_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    return f"""
        SELECT doc_id, '/' AS href, 'Home' AS anchor
        FROM documents WHERE {ok}
        UNION ALL
        SELECT doc_id, '/about', 'About' FROM documents WHERE {ok}
        UNION ALL
        SELECT doc_id,
               '/page/' || CAST((doc_id * {LINK_MULT} + {LINK_ADD})
                                % {LINK_MOD} AS VARCHAR),
               'rel ' || CAST(doc_id AS VARCHAR)
        FROM documents WHERE {ok}"""


def q_extract_tables(sf_dir: str):
    """HTML <table> extraction to relational cell rows
    (stages/tables.extract_tables): per-doc SAX table walk behind the
    SHARED decode gate (decode_payload — identical refusal set to the
    flagship parse, so the deterministic error slice emits nothing and
    the oracle's synthesis predicate is exact). Pure per-block map, zero
    exchanges. The wrap='table' page shape plants a 5-row metadata table
    whose cells are pure (doc_id, lang, source, length(text))
    expressions — the oracle reconstructs all 10 cells per ok doc."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.tables import extract_tables
    return extract_tables(read_cc_from_documents(sf_dir, wrap="table"))


def _extract_tables_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import sql_is_bad, sql_is_enc
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    cells = [
        (0, 0, "TRUE", "'key'"), (0, 1, "TRUE", "'value'"),
        (1, 0, "FALSE", "'id'"), (1, 1, "FALSE", "CAST(doc_id AS VARCHAR)"),
        (2, 0, "FALSE", "'lang'"), (2, 1, "FALSE", "lang"),
        (3, 0, "FALSE", "'source'"), (3, 1, "FALSE", "source"),
        (4, 0, "FALSE", "'chars'"),
        (4, 1, "FALSE", "CAST(length(text) AS VARCHAR)"),
    ]
    parts = [
        f"SELECT doc_id, 0::BIGINT AS table_idx, {r}::BIGINT AS row_idx, "
        f"{c}::BIGINT AS col_idx, {h} AS is_header, {v} AS cell "
        f"FROM documents WHERE {ok}"
        for r, c, h, v in cells]
    return " UNION ALL ".join(parts)


def q_extract_jsonld(sf_dir: str):
    """JSON-LD structured-data extraction (stages/structured
    .extract_jsonld): ld+json script bodies (CDATA to the tokenizer)
    -> json.loads -> flattened scalar rows with dotted/indexed paths,
    behind the SHARED decode gate. The wrap='ld' page plants a
    schema.org Article whose 8 scalar fields (incl. a nested author.name
    and a keywords[i] array) are pure SQL expressions."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.structured import extract_jsonld
    return extract_jsonld(read_cc_from_documents(sf_dir, wrap="ld"))


def _extract_jsonld_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import sql_is_bad, sql_is_enc
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    fields = [
        ("'@context'", "'https://schema.org'", "str"),
        ("'@type'", "'Article'", "str"),
        ("'headline'", "'Doc ' || CAST(doc_id AS VARCHAR)", "str"),
        ("'wordCount'", "CAST(length(text) AS VARCHAR)", "num"),
        ("'inLanguage'", "lang", "str"),
        ("'author.name'", "source", "str"),
        ("'keywords[0]'", "'crawl'", "str"),
        ("'keywords[1]'", "lang", "str"),
    ]
    parts = [
        f"SELECT doc_id, 0::BIGINT AS block_idx, {p} AS path, "
        f"{v} AS value, '{t}' AS value_type FROM documents WHERE {ok}"
        for p, v, t in fields]
    return " UNION ALL ".join(parts)


def q_anchor_text(sf_dir: str):
    """Anchor-text index per link TARGET (stages/linkgraph.
    anchor_text_index): n_refs / distinct-anchor count / sorted
    '|'-joined anchor texts — per-block pre-combine, ONE href exchange,
    reduceat+binary_join kernel. string_agg(ORDER BY) oracle over the
    same synthesis-predicate link list as extract_links."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import anchor_text_index, extract_links
    with _hint(sf_dir):
        return anchor_text_index(
            extract_links(read_cc_from_documents(sf_dir)))


def _anchor_text_sql() -> str:
    return f"""
        WITH links AS ({_extract_links_sql()}),
        pairs AS (
          SELECT href, anchor, count(*) AS cnt
          FROM links GROUP BY 1, 2)
        SELECT href, sum(cnt)::BIGINT AS n_refs,
               count(*)::BIGINT AS n_anchors,
               string_agg(anchor, '|' ORDER BY anchor) AS anchors
        FROM pairs GROUP BY href"""


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier generation, composed purely from existing
    primitives: parse out-links from raw payloads (extract_links), keep
    intra-site page targets (links_to_edges — vectorized href parse),
    per-block distinct pre-combine + one dst exchange (distinct_rows),
    then ANTI join against the already-crawled id set (key_filter_join,
    keys only) — the unseen targets a scheduler would enqueue next. The
    crawled set is the EVEN doc_ids (a mid-crawl snapshot: at larger sf
    the id space covers every link target, so all-docs-crawled would
    leave a degenerate empty frontier). NOT-IN oracle over the synthesis
    link predicates."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.dedup import distinct_rows
    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.linkgraph import extract_links, links_to_edges
    from pypdfium2_ray.sources.cc_from_documents import LINK_MOD

    def evens(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(_rem(t, 2), 0)).select(["doc_id"])

    crawled = _docs(sf_dir, ["doc_id"]).map_batches(
        evens, batch_format="pyarrow")
    with _hint(sf_dir):
        edges = links_to_edges(
            extract_links(read_cc_from_documents(sf_dir)),
            n_nodes=LINK_MOD)
        targets = distinct_rows(edges.select_columns(["dst"]), ["dst"])
        out = key_filter_join(targets, crawled, "dst",
                              right_key="doc_id", mode="anti")
    return _cast_i64(out, ["dst"])


def _crawl_frontier_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    ok = f"NOT {sql_is_bad()} AND NOT {sql_is_enc()}"
    return f"""
        SELECT DISTINCT
               (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} AS dst
        FROM documents WHERE {ok}
          AND (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD}
              NOT IN (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)"""


def q_link_pagerank(sf_dir: str):
    """The extraction tier feeding the graph tier END-TO-END: parse
    hyperlinks out of the raw crawl payloads (q_extract_links), keep the
    intra-site page links with existing targets
    (stages/linkgraph.links_to_edges — vectorized extract + dangling
    filter), and rank pages with the integer fixed-point PageRank. The
    oracle unrolls the same iterations over the synthesis-predicate edge
    list."""
    from pypdfium2_ray.sources.cc_from_documents import read_cc_from_documents
    from pypdfium2_ray.stages.linkgraph import extract_links, links_to_edges
    from pypdfium2_ray.stages.pagerank import pagerank
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    links = extract_links(read_cc_from_documents(sf_dir))
    edges = links_to_edges(links, n_nodes=n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    with _hint(sf_dir):
        out = pagerank(edges, nodes, iters=PR_ITERS,
                       damping_pct=PR_DAMPING, init=PR_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rank_scaled": t["rank"]}),
        batch_format="pyarrow")


def _link_pagerank_sql() -> str:
    from pypdfium2_ray.sources.cc_from_documents import (
        LINK_ADD, LINK_MOD, LINK_MULT, sql_is_bad, sql_is_enc,
    )
    edges = (
        "edges AS (SELECT CAST(doc_id AS BIGINT) AS src, "
        f"CAST((doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} AS BIGINT)"
        " AS dst FROM documents "
        f"WHERE NOT {sql_is_bad()} AND NOT {sql_is_enc()} "
        f"AND (doc_id * {LINK_MULT} + {LINK_ADD}) % {LINK_MOD} "
        "< (SELECT n FROM nn))")
    return _pagerank_sql(edges_cte=edges)


#: BM25 query: a common term, a mid-df term and a rare term (df 379/403/25
#: at sf0.001) so the idf spread actually orders the results
BM25_TERMS = ("data", "merge", "dup")
BM25_K = 15


def q_bm25_topk(sf_dir: str):
    """Corpus search: top-k documents by fixed-point BM25 over the query
    terms (stages/bm25 — scalar pre-pass + block-local tf/dl candidate
    extraction + one ids-only exchange for the per-doc sum + partial
    top-k; the corpus text never enters an exchange). Integer-scaled
    score arithmetic; idf is floor(ln(...)*1e6) on identical float64
    inputs both sides."""
    from pypdfium2_ray.stages.bm25 import bm25_topk
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return bm25_topk(ds, list(BM25_TERMS), k=BM25_K)


def _bm25_sql(k1_milli: int = 1200, b_milli: int = 750) -> str:
    """The engine's exact fixed-point BM25 (stages/bm25 docstring) as
    chained CTEs — every op BIGINT floor division on non-negative values
    except the shared floor(ln(...)*1e6) idf."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    ws = r"'[ \t\r\n\f\v]+'"
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(text, {ws})) AS term
          FROM documents),
        cand AS (
          SELECT doc_id, term, count(*)::BIGINT AS tf
          FROM toks WHERE term IN ({terms}) GROUP BY 1, 2),
        dl AS (
          SELECT doc_id, length(list_filter(regexp_split_to_array(
                 text, {ws}), x -> x <> ''))::BIGINT AS dl
          FROM documents),
        sc AS (SELECT count(*)::BIGINT AS n,
                      CAST(sum(dl) * 1000 // count(*) AS BIGINT)
                        AS avgdl_milli FROM dl),
        dfs AS (SELECT term, count(*)::BIGINT AS df FROM cand
                GROUP BY term),
        idf AS (SELECT term,
                       CAST(floor(ln(1.0 + ((SELECT n FROM sc) - df + 0.5)
                            / (df + 0.5)) * 1000000) AS BIGINT)
                         AS idf_micro
                FROM dfs),
        scored AS (
          SELECT c.doc_id,
                 CAST(i.idf_micro * (c.tf * {k1_milli + 1000} * 1000 //
                   (c.tf * 1000 + {k1_milli} * ((1000 - {b_milli})
                      + {b_milli} * (d.dl * 1000000 //
                        (SELECT avgdl_milli FROM sc)) // 1000) // 1000))
                   // 1000 AS BIGINT) AS score_micro
          FROM cand c JOIN dl d USING (doc_id) JOIN idf i USING (term))
        SELECT doc_id, CAST(sum(score_micro) AS BIGINT) AS score_micro
        FROM scored GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id LIMIT {BM25_K}"""


def _pagerank_sql(edges_cte: str | None = None) -> str:
    """The engine's exact integer update rule unrolled as chained CTEs
    (fixed iteration count => no recursion needed; every op is BIGINT
    floor division on non-negative values, bit-identical both sides).
    ``edges_cte``: the ``edges AS (...)`` definition — defaults to the
    synthetic skewed web graph of :func:`q_pagerank`."""
    base = ((100 - PR_DAMPING) * PR_INIT) // 100
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        edges_cte or (
            f"edges AS ("
            f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
            " AS dst FROM nodes"
            f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
            " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
            " FROM nodes)"),
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(PR_ITERS):
        ctes.append(
            f"r{k + 1} AS (SELECT n.node, CAST({base} + {PR_DAMPING} * "
            "COALESCE(s.insum, 0) // 100 AS BIGINT) AS r "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS node, SUM(r.r // d.outdeg) AS insum "
            f"FROM edges e JOIN r{k} r ON e.src = r.node "
            "JOIN deg d ON d.src = e.src "
            "GROUP BY e.dst) s USING (node))")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, r AS rank_scaled FROM r{PR_ITERS}")


HITS_ITERS = 4
HITS_INIT = 10**6


def q_hits(sf_dir: str):
    """HITS hubs & authorities over the same synthetic skewed link graph
    as q_pagerank (stages/hits): two lookup_join + grouped-sum exchanges
    per half-step, integer max-rescale normalization (scale = max(1,
    max(raw)//init)) so the whole trajectory is bit-identical at any
    partitioning and unrollable as exact integer SQL."""
    from pypdfium2_ray.stages.hits import hits
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = _synth_link_edges(n)
    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    with _hint(sf_dir):
        out = hits(docs.map_batches(edges, batch_format="pyarrow"),
                   nodes, iters=HITS_ITERS, init=HITS_INIT)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "auth": t["auth"],
                            "hub": t["hub"]}),
        batch_format="pyarrow")


def _hits_sql() -> str:
    """The engine's exact half-step trajectory unrolled as chained CTEs:
    per half-step a LEFT JOIN sum (COALESCE 0 keeps sinks/isolates) and the
    integer rescale ``raw // greatest(max(raw) // init, 1)`` as a scalar
    subquery — every op BIGINT/HUGEINT floor division on non-negative
    values, bit-identical to stages/hits.py."""
    init = HITS_INIT
    ctes = [
        "nodes AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        f"h0 AS (SELECT node, CAST({init} AS BIGINT) AS v FROM nodes)",
    ]
    for k in range(HITS_ITERS):
        ctes.append(
            f"ar{k + 1} AS MATERIALIZED (SELECT n.node, COALESCE(s.v_sum, 0) AS raw "
            "FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(h.v) AS v_sum FROM edges e "
            f"JOIN h{k} h ON e.src = h.node GROUP BY e.dst) s USING (node))")
        ctes.append(
            f"a{k + 1} AS MATERIALIZED (SELECT node, raw // greatest("
            f"(SELECT max(raw) FROM ar{k + 1}) // {init}, 1) AS v "
            f"FROM ar{k + 1})")
        ctes.append(
            f"hr{k + 1} AS MATERIALIZED (SELECT n.node, COALESCE(s.v_sum, 0) AS raw "
            "FROM nodes n LEFT JOIN ("
            f"SELECT e.src AS node, SUM(a.v) AS v_sum FROM edges e "
            f"JOIN a{k + 1} a ON e.dst = a.node GROUP BY e.src) s "
            "USING (node))")
        ctes.append(
            f"h{k + 1} AS MATERIALIZED (SELECT node, raw // greatest("
            f"(SELECT max(raw) FROM hr{k + 1}) // {init}, 1) AS v "
            f"FROM hr{k + 1})")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT a.node AS doc_id, CAST(a.v AS BIGINT) AS auth, "
              f"CAST(h.v AS BIGINT) AS hub "
              f"FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (node)")


def _synth_tri_edges(n: int):
    """q_triangles edge builder: the shared pagerank/hits skewed graph
    (``_synth_link_edges``) PLUS an intra-cluster chain link
    (src -> src+1 when src % 3 != 2) — each 3-cluster then closes two
    triangles with its shared ``(src//3) % n`` target, keeping the
    triangle population dense (~2n/3) at every sf instead of relying on
    the sparse modular coincidences of the base graph alone."""
    base = _synth_link_edges(n)

    def edges(t: pa.Table) -> pa.Table:
        import numpy as np
        b = base(t)
        s = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        m = (s % 3 != 2) & (s + 1 < n)
        extra = pa.table({"src": pa.array(s[m], pa.int64()),
                          "dst": pa.array(s[m] + 1, pa.int64())})
        return pa.concat_tables([b, extra])

    return edges


def q_triangles(sf_dir: str):
    """Per-node triangle counts over the synthetic link graph
    (stages/triangles — degree-oriented wedge generation + oriented-edge
    semi-join, Suri & Vassilvitskii WWW'11): all exchanges carry 2-3
    int64s, hub skew is neutralized by the (degree, id) orientation, and
    the count is exact — the all-pairs-free SQL twin enumerates each
    triangle once via the u<v canonical three-way join."""
    from pypdfium2_ray.stages.triangles import triangle_counts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = triangle_counts(edges)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "n_triangles": t["n_triangles"]}),
        batch_format="pyarrow")


#: kcore: k=5 peels the shared densified graph non-trivially (degree-4
#: chain/cluster nodes die, hub neighborhoods survive); 3 peel rounds is
#: the bounded-round contract (the BFS fixed-hop discipline) — the peel
#: has NOT converged at 3 rounds (fixpoint is ~20-36 rounds on this
#: graph) and both sides define the result as the 3-round peel
KCORE_K = 5
KCORE_ROUNDS = 3


def q_kcore(sf_dir: str):
    """Bounded-round k-core peel over the synthetic link graph
    (stages/kcore — synchronous distributed peeling, Montresor PODC'11
    lineage): per round ONE pre-combined degree exchange + TWO ids-only
    repartition semi-joins remove every node with degree < k from the
    undirected simple graph; output (doc_id, deg) is each survivor's
    degree within the final induced subgraph. Deterministic at any
    partitioning (synchronous removal), unrolled by the SQL twin as
    chained MATERIALIZED CTEs."""
    from pypdfium2_ray.stages.kcore import kcore
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = kcore(edges, k=KCORE_K, rounds=KCORE_ROUNDS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "deg": t["deg"]}),
        batch_format="pyarrow")


def _kcore_sql() -> str:
    """Unrolled peel: e0 = distinct canonical undirected (both-dir)
    edges of the shared densified graph; per round deg -> survivors
    (deg >= k) -> induced edges. MATERIALIZED per hop: e_r is referenced
    by both d_{r+1} and e_{r+1}, and DuckDB's default inlining would
    re-evaluate the chain exponentially (the hits-oracle lesson)."""
    k = KCORE_K
    parts = ["""
WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
raw AS (
  SELECT node AS src, (node * 7919 + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL SELECT node, node % 97 FROM nodes
  UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
  UNION ALL SELECT node, node + 1 FROM nodes
    WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src <> dst),
e0 AS MATERIALIZED (
  SELECT lo AS s, hi AS d FROM und UNION ALL SELECT hi, lo FROM und)"""]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f""",
d{r} AS MATERIALIZED (
  SELECT s, count(*) AS c FROM e{r - 1} GROUP BY s),
n{r} AS MATERIALIZED (SELECT s FROM d{r} WHERE c >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{r - 1} e
  JOIN n{r} a ON e.s = a.s JOIN n{r} b ON e.d = b.s)""")
    parts.append(f"""
SELECT s AS doc_id, count(*)::BIGINT AS deg
FROM e{KCORE_ROUNDS} GROUP BY s""")
    return "".join(parts)


#: communities: 3 synchronous LPA rounds over the shared densified
#: graph — the bounded-round contract (synchronous LPA can 2-cycle on
#: bipartite regions, so a fixed R is part of the operator definition,
#: not a truncation); 3 rounds already collapses the graph to large
#: hub-anchored communities
LPA_ROUNDS = 3


def q_communities(sf_dir: str):
    """Bounded-round synchronous label propagation over the synthetic
    link graph (stages/labelprop — Raghavan Phys.Rev.E'07 with the
    deterministic synchronous/min-label-tie-break contract): label(v,0)
    = v, each round every node takes its neighbors' modal label (ties
    to the smallest). Per round: ONE ids-only label-fetch join + ONE
    src exchange with a vectorized count/argmax kernel — bit-identical
    at any partitioning; the twin unrolls the same R rounds."""
    from pypdfium2_ray.stages.labelprop import label_propagation
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = label_propagation(edges, rounds=LPA_ROUNDS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "community": t["community"]}),
        batch_format="pyarrow")


def _communities_sql() -> str:
    """Unrolled synchronous LPA: e0 = the kcore twin's canonical
    both-direction edge set; per round neighbor-label counts ->
    row_number() pick of (max count, min label). MATERIALIZED per hop
    (each l_r feeds the next round's join — the hits-oracle inlining
    lesson)."""
    parts = ["""
WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
raw AS (
  SELECT node AS src, (node * 7919 + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL SELECT node, node % 97 FROM nodes
  UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
  UNION ALL SELECT node, node + 1 FROM nodes
    WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src <> dst),
e0 AS MATERIALIZED (
  SELECT lo AS s, hi AS d FROM und UNION ALL SELECT hi, lo FROM und),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lbl FROM e0)"""]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(f""",
c{r} AS (
  SELECT e.s AS node, l.lbl, count(*) AS c
  FROM e0 e JOIN l{r - 1} l ON l.node = e.d GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl) AS rn
    FROM c{r}) WHERE rn = 1)""")
    parts.append(f"""
SELECT node AS doc_id, lbl AS community FROM l{LPA_ROUNDS}""")
    return "".join(parts)


#: crawl_depth: seeds are doc_id % 500 == 7 (1 seed at sf0.001 scaling
#: to 100 at sf0.1); 6 hops over the 3-out-regular graph reaches most
#: of the corpus without the result degenerating to all-zeros
BFS_SEED_MOD = 500
BFS_SEED_RESIDUE = 7
BFS_HOPS = 6


def q_crawl_depth(sf_dir: str):
    """Crawl depth from the seed list (stages/bfs — Pregel-style frontier
    BFS over the synthetic link graph): min directed hops from any seed,
    clipped at BFS_HOPS; per hop ONE frontier-onto-edges repartition join
    + ONE grouped min, rows are (node, depth) int64 pairs only. The min
    semilattice makes the result bit-identical at any partitioning and
    the fixed hop count unrolls to exact integer SQL."""
    import ray.data as rd
    from pypdfium2_ray.stages.bfs import bfs_depths
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_link_edges(n), batch_format="pyarrow")

    def seed_rows(t: pa.Table) -> pa.Table:
        import numpy as np
        node = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            node[node % BFS_SEED_MOD == BFS_SEED_RESIDUE], pa.int64())})

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    with _hint(sf_dir):
        out = bfs_depths(edges, seeds, hops=BFS_HOPS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "depth": t["depth"]}),
        batch_format="pyarrow")


def _crawl_depth_sql() -> str:
    """One chained CTE per hop (the pagerank/hits unroll discipline):
    d_{k+1} = grouped min over d_k UNION ALL (edges JOIN d_k ON src).
    Expanding ALL settled rows (not just the frontier) re-derives only
    larger-or-equal depths, so the engine's frontier optimization is
    invisible. MATERIALIZED per hop: DuckDB would otherwise inline each
    d_k into the next hop's two references, doubling the plan per hop."""
    ctes = [
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"edges AS MATERIALIZED ("
        f"SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)"
        " AS dst FROM nodes"
        f" UNION ALL SELECT node, node % {PR_HUBS} FROM nodes"
        " UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn)"
        " FROM nodes)",
        f"d0 AS (SELECT node, CAST(0 AS BIGINT) AS depth FROM nodes "
        f"WHERE node % {BFS_SEED_MOD} = {BFS_SEED_RESIDUE})",
    ]
    for k in range(BFS_HOPS):
        ctes.append(
            f"d{k + 1} AS MATERIALIZED (SELECT node, min(depth) AS depth "
            f"FROM (SELECT node, depth FROM d{k} "
            f"UNION ALL SELECT e.dst, d.depth + 1 "
            f"FROM edges e JOIN d{k} d ON e.src = d.node) GROUP BY node)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, depth FROM d{BFS_HOPS}")


def _triangles_sql() -> str:
    """Canonical-triangle enumeration: distinct undirected u<v edges,
    three-way join (a<b<c exactly once), per-corner explode + count —
    the same triangle SET the oriented engine confirms, so the per-node
    counts match exactly. ``und`` is MATERIALIZED: DuckDB would otherwise
    inline the DISTINCT subtree into all three join references."""
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
          UNION ALL SELECT node, node + 1 FROM nodes
            WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
        und AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges WHERE src <> dst),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri)
        SELECT node AS doc_id, count(*) AS n_triangles
        FROM tn GROUP BY node"""


def q_local_clustering(sf_dir: str):
    """Exact local-clustering-coefficient parts per node
    (stages/triangles.clustering_parts): n_triangles and
    n_wedges = d*(d-1)/2 for every node of degree >= 2, so
    T/wedges stays an exact rational — the per-node community-density
    signal on the shared synthetic link graph. The triangle machinery
    plus ONE left repartition join (triangle-free nodes fill 0;
    degree-1 nodes emit nothing on both engines)."""
    from pypdfium2_ray.stages.triangles import clustering_parts
    docs = _docs(sf_dir, ["doc_id"])
    n = docs.count()
    edges = docs.map_batches(_synth_tri_edges(n), batch_format="pyarrow")
    with _hint(sf_dir):
        out = clustering_parts(edges)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "n_triangles": t["n_triangles"],
                            "n_wedges": t["n_wedges"]}),
        batch_format="pyarrow")


def _local_clustering_sql() -> str:
    """The :func:`_triangles_sql` construction plus degrees and the
    left join: wedge counts from the distinct undirected degree,
    triangle counts COALESCEd to 0, degree-1 nodes excluded."""
    return f"""
        WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
        nn AS (SELECT count(*) AS n FROM nodes),
        edges AS (
          SELECT node AS src, (node * {PR_MULT} + 1) % (SELECT n FROM nn)
                 AS dst FROM nodes
          UNION ALL SELECT node, node % {PR_HUBS} FROM nodes
          UNION ALL SELECT node, (node // 3) % (SELECT n FROM nn) FROM nodes
          UNION ALL SELECT node, node + 1 FROM nodes
            WHERE node % 3 <> 2 AND node + 1 < (SELECT n FROM nn)),
        und AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges WHERE src <> dst),
        deg AS (SELECT node, count(*)::BIGINT AS d
                FROM (SELECT u AS node FROM und
                      UNION ALL SELECT v FROM und)
                GROUP BY node),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri),
        tc AS (SELECT node, count(*)::BIGINT AS n_triangles
               FROM tn GROUP BY node)
        SELECT deg.node AS doc_id,
               COALESCE(tc.n_triangles, 0)::BIGINT AS n_triangles,
               (d * (d - 1) // 2)::BIGINT AS n_wedges
        FROM deg LEFT JOIN tc USING (node)
        WHERE d >= 2"""


# ---------------------------------------------------------------------------
# similarity search

def _embeddings(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _embeddings_rows(sf_dir: str) -> int:
    """Corpus row count from parquet footers only — no data scan."""
    import pyarrow.parquet as pq
    return pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/embeddings.parquet").metadata.num_rows


def _query_vectors(sf_dir: str, ids) -> pa.Table:
    """Pushdown-filtered fetch of JUST the query rows — never the corpus.
    At 10^12 rows the ``filters`` predicate prunes row groups via parquet
    statistics; only matching pages are decoded driver-side."""
    import pyarrow.parquet as pq
    return pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "in", list(ids))])


def _train_sample(sf_dir: str, n: int = 1024, seed: int = 11) -> pa.Table:
    """IVF centroid train set via the contract stages/ann.train_centroids
    prescribes: a streaming seeded ``random_sample`` with only ~n rows ever
    reaching the driver (``take_batch``), never the whole corpus. The
    sample fraction targets ~4n rows so the take is stable at any scale."""
    rows = max(_embeddings_rows(sf_dir), 1)
    frac = min(1.0, (4.0 * n) / rows)
    return (_embeddings(sf_dir).random_sample(frac, seed=seed)
            .take_batch(n, batch_format="pyarrow"))


#: broadcast-tier ceiling for the exact embedding near-dup query: above
#: this corpus size (~100 MB of normalized float64 per actor at dim 64)
#: the query routes to the LSH-bucketed tier instead of broadcasting.
EMB_BROADCAST_MAX_ROWS = 200_000


def q_ngram_dups(sf_dir: str):
    """Word-trigram Jaccard near-dup pairs — the n-gram variant of the
    MinHash family (shingle_kind="word"). bands=32 x 4 rows: a J=0.9 pair
    is missed w.p. (1 - 0.9^4)^32 ~ 7e-16; background pairs sit below
    J=0.15 on this corpus, so the exact all-pairs SQL is a true oracle."""
    from pypdfium2_ray.stages.dedup import minhash_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return minhash_dup_pairs(ds, shingle_kind="word", shingle_k=3,
                                 num_perm=128, bands=32, threshold=0.5)


def q_canonical_resolve(sf_dir: str):
    """Canonical-chain resolution by pointer doubling
    (stages/canonical.resolve_canonical — Wyllie-style path compression):
    rounds=3 squares f three times, resolving every chain up to length 8
    in THREE ids-only exchanges instead of eight sequential follows; the
    planted functional graph (descend-to-multiple-of-8 chains, %101==55
    up-jumps forming 2-cycles, +1 edges off the table's top edge
    exercising the identity completion) covers chains, roots, cycles and
    out-of-set targets. Result defined as f^(2^rounds) + is_root flag —
    exact on cycles too, so the unrolled MATERIALIZED self-join twin is
    bit-identical."""
    import numpy as np
    from pypdfium2_ray.stages.canonical import resolve_canonical

    def to_edges(t: pa.Table) -> pa.Table:
        u = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        v = np.where(u % 101 == 55, u + 1,
                     np.where(u % 8 == 0, u, u - 1))
        return pa.table({"src": pa.array(u, pa.int64()),
                         "dst": pa.array(v, pa.int64())})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(to_edges,
                                               batch_format="pyarrow")
    with _hint(sf_dir):
        return resolve_canonical(ds, rounds=3)


def _canonical_resolve_sql() -> str:
    return """
        WITH nodes AS (SELECT doc_id AS u FROM documents),
        e0 AS MATERIALIZED (
          SELECT u, CASE WHEN u % 101 = 55 THEN u + 1
                         WHEN u % 8 = 0 THEN u
                         ELSE u - 1 END AS v FROM nodes),
        f1 AS MATERIALIZED (
          SELECT * FROM e0
          UNION ALL
          SELECT DISTINCT v, v FROM e0
          WHERE v NOT IN (SELECT u FROM e0)),
        f2 AS MATERIALIZED (SELECT a.u, b.v FROM f1 a JOIN f1 b
                            ON b.u = a.v),
        f4 AS MATERIALIZED (SELECT a.u, b.v FROM f2 a JOIN f2 b
                            ON b.u = a.v),
        f8 AS MATERIALIZED (SELECT a.u, b.v FROM f4 a JOIN f4 b
                            ON b.u = a.v)
        SELECT f8.u AS src, f8.v AS canon, (p.v = f8.v) AS is_root
        FROM f8 JOIN f1 p ON p.u = f8.v"""


#: corpus-global repeated-line threshold (strip_repeated query)
GLOBAL_LINE_MIN = 10


def _decorate_global_lines(t):
    """Planted lines for the GLOBAL scrub: a CDN banner on every doc
    (always stripped), a 'via <source>' footer (stripped when the source
    has >= GLOBAL_LINE_MIN docs), and a rare doc_id%97 notice in 7
    variants whose strip/keep flips WITH SCALE (~7 docs/variant at
    sf0.01 < 10 kept; ~73 at sf0.1 >= 10 stripped) — the oracle tracks
    the same census, so the flip verifies global counting, not a
    constant."""
    import pyarrow as pa
    import pyarrow.compute as pc
    t = t.filter(pc.is_valid(t["text"]))
    did = pc.cast(t["doc_id"], pa.int64()).combine_chunks()
    src = pc.cast(t["source"], pa.string()).combine_chunks()
    d = did.to_numpy(zero_copy_only=False)
    cat = (lambda *parts: pc.binary_join_element_wise(*parts, ""))
    var = pc.cast(pa.array(d % 7, pa.int64()), pa.string())
    notice = pc.if_else(pa.array(d % 97 == 0),
                        cat("notice ", var, "\n"), pa.scalar(""))
    text = cat("cdn: served by example-cdn\n", notice,
               t["text"].combine_chunks(), "\nvia ", src)
    return pa.table({"doc_id": did, "text": text})


def q_strip_repeated(sf_dir: str):
    """Corpus-GLOBAL repeated-line scrub (stages/boilerplate
    .strip_repeated_lines): lines in >= 10 distinct docs ANYWHERE
    removed everywhere. The census is the only exchange (pre-combined
    md5 rows); the template set is a bounded heavy-hitter set
    (<= occurrences/min_count), broadcast once via ray.put, and the
    rewrite is a pure per-block map — doc text NEVER crosses the wire
    (the shape the per-source strip_boilerplate cannot use, since its
    sets are per-group unbounded)."""
    from pypdfium2_ray.stages.boilerplate import strip_repeated_lines
    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        _decorate_global_lines, batch_format="pyarrow")
    with _hint(sf_dir):
        return strip_repeated_lines(ds, min_count=GLOBAL_LINE_MIN)


def _strip_repeated_sql() -> str:
    m = GLOBAL_LINE_MIN
    return f"""
        WITH d0 AS (SELECT doc_id, source, text FROM documents
                    WHERE text IS NOT NULL),
        dec AS (SELECT doc_id,
                  'cdn: served by example-cdn' || chr(10) ||
                  CASE WHEN doc_id % 97 = 0 THEN
                    'notice ' || CAST(doc_id % 7 AS VARCHAR) || chr(10)
                    ELSE '' END ||
                  text || chr(10) || 'via ' || source AS text
                FROM d0),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM dec),
        lines AS (SELECT doc_id, i, l[i] AS ln
                  FROM ls, unnest(generate_series(1, len(l))) AS t(i)),
        freq AS (SELECT md5(ln) AS lm, count(DISTINCT doc_id) AS n
                 FROM lines GROUP BY md5(ln)),
        tpl AS (SELECT lm FROM freq WHERE n >= {m}),
        mk AS (SELECT l.doc_id, l.i, l.ln, (t.lm IS NOT NULL) AS is_tpl
               FROM lines l LEFT JOIN tpl t ON t.lm = md5(l.ln))
        SELECT doc_id,
               COALESCE(string_agg(ln, chr(10) ORDER BY i)
                        FILTER (WHERE NOT is_tpl), '') AS clean_text,
               (count(*) FILTER (WHERE is_tpl))::BIGINT AS n_dropped
        FROM mk GROUP BY doc_id"""


def q_rollup_stats(sf_dir: str):
    """Hierarchical ROLLUP(source, lang) corpus report
    (stages/rollup.rollup_aggregate): finest groups + per-source
    subtotals + grand total with the RAW table exchanged once — coarser
    levels derive from the previous level's materialized finalized rows
    (distributive aggregate algebra: count/sum re-sum, max re-maxes),
    so level L's exchange carries |groups| rows, not |docs|. ``level``
    mirrors SQL's 2 - grouping(source) - grouping(lang)."""
    from pypdfium2_ray.stages.rollup import rollup_aggregate
    ds = _docs(sf_dir, ["source", "lang", "n_chars"])
    with _hint(sf_dir):
        return rollup_aggregate(
            ds, keys=["source", "lang"],
            aggs={"n_docs": ("count",), "total_chars": ("sum", "n_chars"),
                  "max_chars": ("max", "n_chars")},
            fill="(all)")


def q_cube_stats(sf_dir: str):
    """GROUP BY CUBE(lang, source) corpus report (stages/rollup.
    cube_aggregate): every key-subset grouping — including the
    per-lang-across-sources slice a ROLLUP(source, lang) cannot emit —
    with the raw table exchanged ONCE; the other 2^n - 2 subsets
    re-aggregate the finest level's materialized finalized rows.
    ``grouping_id`` is the SQL GROUPING_ID bitmask (lang = MSB)."""
    from pypdfium2_ray.stages.rollup import cube_aggregate
    ds = _docs(sf_dir, ["lang", "source", "n_chars"])
    with _hint(sf_dir):
        return cube_aggregate(
            ds, keys=["lang", "source"],
            aggs={"n_docs": ("count",), "total_chars": ("sum", "n_chars"),
                  "max_chars": ("max", "n_chars")},
            fill="(all)")


def _cube_stats_sql() -> str:
    return """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       max(n_chars)::BIGINT AS max_chars,
       (2 * GROUPING(lang) + GROUPING(source))::BIGINT AS grouping_id
FROM documents GROUP BY CUBE(lang, source)"""


def _rollup_stats_sql() -> str:
    return """
        SELECT COALESCE(source, '(all)') AS source,
               COALESCE(lang, '(all)') AS lang,
               count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               max(n_chars)::BIGINT AS max_chars,
               (2 - grouping(source) - grouping(lang))::BIGINT AS level
        FROM documents GROUP BY ROLLUP(source, lang)"""


#: ppjoin threshold: word-trigram Jaccard — dups on this corpus sit
#: >0.75 and background <0.4, so 0.6 is mid-gap (measured). Trigrams,
#: not bigrams: the synthetic 30-word vocab admits only ~900 bigrams, so
#: bigram prefix buckets average hundreds of docs and candidate mass
#: goes quadratic (measured 72 s at sf0.1) — the degenerate small-vocab
#: regime the ppjoin module docstring warns about; 27k trigrams restore
#: Zipf-like bucket sizes (2 s)
PPJ_TAU = 0.6

#: containment threshold: |inner ∩ outer| / |inner| >= 0.8 over word
#: trigrams — 56/50/512 ordered pairs at sf0.001/0.01/0.1
CONTAIN_TAU = 0.8


def q_containment_dups(sf_dir: str):
    """EXACT asymmetric-containment self-join
    (stages/ppjoin.containment_pairs): every ORDERED pair where >= 80%
    of the inner doc's word-trigram shingles appear in the outer doc —
    the quote / partial-duplicate direction symmetric Jaccard tiers
    cannot see (a short page verbatim inside a long one has low Jaccard
    but containment ~1). Recall 1 by construction: inner-prefix x
    outer-full bucket pairing under the md5 token order (ids-only rows,
    ONE tok_key exchange), exact verify on semi-join-prefiltered text
    joins."""
    from pypdfium2_ray.stages.ppjoin import containment_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return containment_pairs(ds, tau=CONTAIN_TAU, shingle_k=3,
                                 shingle_kind="word")


def _containment_sql() -> str:
    """Shared-shingle-prefiltered all-pairs twin (sound: tau > 0 and
    n_inner >= 1 force n_inter >= 1, so qualifying pairs share a
    shingle; the integer length filter 10*|outer| >= 8*|inner| follows
    from n_inter <= |outer|). Final predicate is the same IEEE-double
    division compare the engine's verify uses."""
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '{ws}') AS w
              FROM documents),
sh AS MATERIALIZED (SELECT doc_id, CASE
        WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)])
      END AS s FROM toks),
ex AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM sh),
cp AS (SELECT DISTINCT a.doc_id AS id_in, b.doc_id AS id_out
       FROM ex a JOIN ex b USING (g) WHERE a.doc_id <> b.doc_id),
cand AS (SELECT id_in, id_out, sa.s AS sa, sb.s AS sb
         FROM cp JOIN sh sa ON sa.doc_id = cp.id_in
                 JOIN sh sb ON sb.doc_id = cp.id_out
         WHERE 10 * len(sb.s) >= 8 * len(sa.s) AND len(sa.s) > 0),
sim AS (SELECT id_in, id_out,
               len(list_intersect(sa, sb))::BIGINT AS n_inter,
               len(sa)::BIGINT AS n_inner FROM cand)
SELECT id_in, id_out, n_inter, n_inner FROM sim
WHERE n_inter / n_inner >= {CONTAIN_TAU}"""


def q_doc_keywords(sf_dir: str):
    """Per-doc keyword extraction by tf/df rank (stages/keywords — the
    tf-idf family with RATIONAL scoring: one IEEE division of two
    int64s, bit-reproducible in the oracle, where any log-idf variant
    would put libm in the gate). Block-local vectorized tf (a doc is
    one row, so tf is final with NO exchange), one pre-combined df
    exchange, one word-keyed repartition join, grouped_topk per doc."""
    from pypdfium2_ray.stages.keywords import doc_keywords
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return doc_keywords(ds, k=3)


def _doc_keywords_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '{ws}'))
                AS word FROM documents),
tf AS MATERIALIZED (SELECT doc_id, word, count(*)::BIGINT AS tf
                    FROM toks GROUP BY 1, 2),
df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
sc AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
              row_number() OVER (
                PARTITION BY tf.doc_id
                ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.word)
                AS rn
       FROM tf JOIN df USING (word))
SELECT doc_id, word, tf, df FROM sc WHERE rn <= 3"""


#: weighted_sample: k=100, weight = length tier least(1 + n_chars//200, 8)
WSAMPLE_K = 100


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (stages/textstats.weighted_hash_sample — expanded-multiset bottom-k,
    Cohen & Kaplan PODC'07 sketch semantics): inclusion odds scale with
    an integer length-tier weight, priorities are min-of-w md5 draws
    (no floats, no libm — the u^(1/w) exponential-keys trick would not
    twin bit-for-bit), selection is the topk partial bound. Stable
    across runs, shard layouts and cluster sizes."""
    from pypdfium2_ray.stages.textstats import weighted_hash_sample
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def tier(t: pa.Table) -> pa.Table:
        w = pc.min_element_wise(
            pc.add(pc.divide(pc.cast(t["n_chars"], pa.int64()), 200), 1),
            pa.scalar(8, pa.int64()))
        return t.append_column("wt", w)

    with _hint(sf_dir):
        return weighted_hash_sample(
            ds.map_batches(tier, batch_format="pyarrow"),
            key_col="doc_id", weight_col="wt", k=WSAMPLE_K)


def _weighted_sample_sql() -> str:
    """Same expansion: unnest(range(wt)) unit copies, min md5 priority,
    (p, doc_id) bottom-k."""
    return f"""
WITH w AS (SELECT doc_id, n_chars,
                  LEAST(1 + n_chars // 200, 8) AS wt FROM documents),
ex AS (SELECT doc_id, n_chars, wt, unnest(range(wt)) AS j FROM w),
pri AS (SELECT doc_id, n_chars, wt,
               min(md5_number_upper(doc_id::VARCHAR || ':'
                                    || j::VARCHAR)) AS p
        FROM ex GROUP BY 1, 2, 3)
SELECT doc_id, n_chars, wt FROM pri ORDER BY p, doc_id LIMIT {WSAMPLE_K}"""


#: bpe_merges: top-40 merge candidates — large enough to exercise the
#: tie-break region, small enough that the twin's LIMIT stays cheap
BPE_TOPK = 40


def q_bpe_merges(sf_dir: str):
    """One BPE-training counting round (stages/bpe.merge_pair_counts,
    Sennrich ACL'16): adjacent character-pair counts over the corpus,
    weighted by word frequency — the word-freq factoring means the
    per-word pair loop runs once per DISTINCT word (vocab-sized), the
    occurrence dimension is vectorized Arrow split/flatten/group-count.
    Two pre-combined exchanges + the topk partial bound; (cnt DESC,
    pair ASC) is a total order so the top-40 set is unique."""
    from pypdfium2_ray.stages.bpe import merge_pair_counts
    ds = _docs(sf_dir, ["text"])
    with _hint(sf_dir):
        return merge_pair_counts(ds, k=BPE_TOPK)


def _bpe_merges_sql() -> str:
    """Word-freq table, per-word overlapping 2-char substrings weighted
    by f, global count, same (cnt DESC, pair) total order."""
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH toks AS (SELECT regexp_extract_all(text, '{ws}') AS w FROM documents),
words AS (SELECT unnest(w) AS word FROM toks),
wf AS MATERIALIZED (SELECT word, count(*)::BIGINT AS f
                    FROM words GROUP BY word),
pr AS (SELECT unnest([substr(word, i, 2)
                      for i in range(1, length(word))]) AS pair, f
       FROM wf),
agg AS (SELECT pair, sum(f)::BIGINT AS cnt FROM pr GROUP BY pair)
SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT {BPE_TOPK}"""


def q_gram_novelty(sf_dir: str):
    """Per-doc n-gram novelty (stages/novelty.gram_novelty — the Gopher
    duplicated-fraction family as first-occurrence attribution): n_grams
    = distinct word trigrams, n_novel = those whose global min(doc_id)
    is this doc. ids-only rows through ONE gram-hash exchange (min-doc
    attribution + per-doc partials in one vectorized kernel), then one
    tiny sum exchange; the twin groups by the same md5 >> 3 hash so
    collisions replicate instead of diverging."""
    from pypdfium2_ray.stages.novelty import gram_novelty
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return gram_novelty(ds, k=3, shingle_kind="word")


def _gram_novelty_sql() -> str:
    """Same per-doc-distinct hashed-trigram rows, min-doc attribution
    via a grouped min + join; hash = md5_number_upper >> 3 (the
    md5_hash64 twin), so the rare gram collisions are identical."""
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '{ws}') AS w
              FROM documents),
sh AS (SELECT doc_id, CASE
        WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)])
      END AS s FROM toks),
dg AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CAST(md5_number_upper(unnest(s)) >> 3 AS BIGINT) AS g
  FROM sh),
mins AS (SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g)
SELECT dg.doc_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN mins.first_doc = dg.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_novel
FROM dg JOIN mins USING (g) GROUP BY dg.doc_id"""


def q_ppjoin_dups(sf_dir: str):
    """EXACT set-similarity self-join via prefix filtering
    (stages/ppjoin.ppjoin_dup_pairs — Chaudhuri ICDE'06 / Xiao WWW'08 /
    Vernica SIGMOD'10): recall-1 candidate generation from md5-ordered
    prefix tokens (ids-only rows, ONE tok_key exchange, vectorized
    bucket pairing + slacked length filter), exact Jaccard verify on
    semi-join-prefiltered text joins. The deterministic counterpart of
    minhash_dups/ngram_dups: no bands, no probability — the SQL
    all-pairs twin is an oracle by definition, not by tuned recall."""
    from pypdfium2_ray.stages.ppjoin import ppjoin_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return ppjoin_dup_pairs(ds, tau=PPJ_TAU, shingle_k=3,
                                shingle_kind="word")


def q_postings_compress(sf_dir: str):
    """Index-compression accounting (invindex.compressed_posting_sizes
    + functions/varint — the IR-textbook LEB128 gap encoding): per
    term, df and the ACTUAL byte size of the delta-varint posting
    list. The kernel really encodes (one vectorized varint_encode over
    the partition's concatenated gap array, buffer length asserted
    against the width sum); the twin reproduces the widths via the
    lag-gap + threshold-CASE formula — identical for every value
    < 2^56, far above any doc id."""
    from pypdfium2_ray.stages.invindex import compressed_posting_sizes
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return compressed_posting_sizes(ds)


def _postings_compress_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    width = ("1 + (x >= 128)::INT + (x >= 16384)::INT"
             " + (x >= 2097152)::INT + (x >= 268435456)::INT"
             " + (x >= 34359738368)::INT + (x >= 4398046511104)::INT"
             " + (x >= 562949953421312)::INT")
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '{ws}')) AS term
  FROM documents),
g AS (
  SELECT term, doc_id,
         doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
           AS gap
  FROM pairs),
v AS (SELECT term, COALESCE(gap, doc_id) AS x FROM g)
SELECT term, count(*)::BIGINT AS df, sum({width})::BIGINT AS n_bytes
FROM v GROUP BY term"""


#: editdist_dups: Levenshtein prefix key length / distance threshold
ED_PLEN = 20
ED_K = 1


def q_editdist_dups(sf_dir: str):
    """Levenshtein near-dup pairs over the 20-char key prefix
    (stages/editdist — FastSS deletion-neighborhood candidates +
    vectorized exact-DP verify): the third similarity family next to
    Jaccard and Hamming, the title/URL-variant dedup measure. Candidate
    recall is exact by the deletion theorem; the oracle is the honest
    all-pairs levenshtein join (DuckDB's native function), which the
    engine beats by never comparing beyond shared-variant buckets."""
    from pypdfium2_ray.stages.editdist import editdist_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return editdist_dup_pairs(ds, prefix_len=ED_PLEN, max_dist=ED_K)


def _editdist_sql() -> str:
    return f"""
WITH p AS (SELECT doc_id, substr(text, 1, {ED_PLEN}) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.s, b.s)::BIGINT AS dist
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE abs(length(a.s) - length(b.s)) <= {ED_K}
  AND levenshtein(a.s, b.s) <= {ED_K}"""


#: editdist2_dups: deeper key, distance-2 threshold
ED2_PLEN = 24
ED2_K = 2


def q_editdist2_dups(sf_dir: str):
    """Depth-2 FastSS (the general-k tier of editdist_dups): Levenshtein
    distance <= 2 over the 24-char prefix via two-deletion
    neighborhoods — 1 + L + C(L,2) variant hashes per key, each a
    three-segment rolling-hash combine (no variant strings ever
    materialize), recall exact by the FastSS theorem, candidates
    bounded d <= 4 so the exact DP verify does the filtering."""
    from pypdfium2_ray.stages.editdist import editdist_dup_pairs
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return editdist_dup_pairs(ds, prefix_len=ED2_PLEN,
                                  max_dist=ED2_K)


def _editdist2_sql() -> str:
    return f"""
WITH p AS (SELECT doc_id, substr(text, 1, {ED2_PLEN}) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.s, b.s)::BIGINT AS dist
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE abs(length(a.s) - length(b.s)) <= {ED2_K}
  AND levenshtein(a.s, b.s) <= {ED2_K}"""


def q_dup_owner(sf_dir: str):
    """Canonical-owner assignment for every doc (stages/dedup.
    prefix_dup_owner): docs sharing a 20-char prefix key cluster
    together; dup_of = cluster min id when the cluster has >= 2
    members, else -1 (sentinel, never NULL — gate convention). ONE
    key exchange; owner lookup + assignment fused into the group
    kernel via Cython groupby.transform."""
    from pypdfium2_ray.stages.dedup import prefix_dup_owner
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return prefix_dup_owner(ds, prefix_len=ED_PLEN)


def _dup_owner_sql() -> str:
    return f"""
WITH f AS (SELECT doc_id, substr(text, 1, {ED_PLEN}) AS k FROM documents),
g AS (SELECT k, min(doc_id) AS owner, count(*) AS c FROM f GROUP BY k)
SELECT f.doc_id,
       COALESCE(CASE WHEN g.c > 1 THEN g.owner END, -1)::BIGINT AS dup_of
FROM f JOIN g USING (k)"""


#: jaccard_knn: top-2 neighbors per doc above the ppjoin threshold
KNN_K = 2


def q_jaccard_knn(sf_dir: str):
    """Per-doc k-nearest-neighbor lists over the EXACT Jaccard pair set
    (the dedup-clustering input): ppjoin's recall-1 pairs expanded to
    both directions, similarity = n_inter/n_union (0/0 -> 1.0, the
    family's dup convention — one IEEE division, oracle-exact), then
    stages/topk.grouped_topk keeps each doc's top-2 by (sim DESC, nbr
    ASC). Pure composition: the only additions over ppjoin_dups are a
    vectorized direction flip and the partial-bound per-doc top-k."""
    from pypdfium2_ray.stages.ppjoin import ppjoin_dup_pairs
    from pypdfium2_ray.stages.topk import grouped_topk
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        pairs = ppjoin_dup_pairs(ds, tau=PPJ_TAU, shingle_k=3,
                                 shingle_kind="word")

        def both_dirs(t: pa.Table) -> pa.Table:
            import numpy as np
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            ni = t["n_inter"].to_numpy(zero_copy_only=False)
            nu = t["n_union"].to_numpy(zero_copy_only=False)
            ni2 = np.concatenate([ni, ni])
            nu2 = np.concatenate([nu, nu])
            sim = np.where(nu2 == 0, 1.0,
                           ni2 / np.where(nu2 == 0, 1, nu2))
            return pa.table({
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
                "n_inter": pa.array(ni2, pa.int64()),
                "n_union": pa.array(nu2, pa.int64()),
                "__sim": pa.array(sim, pa.float64())})

        out = grouped_topk(
            pairs.map_batches(both_dirs, batch_format="pyarrow"),
            keys=["doc_id"], order_cols=["__sim", "nbr"], k=KNN_K,
            descending=[True, False])
    return out.map_batches(lambda t: t.drop_columns(["__sim"]),
                           batch_format="pyarrow")


def _jaccard_knn_sql() -> str:
    """The ppjoin twin's sim CTE, both directions, row_number top-k by
    the same (sim DESC, nbr) order."""
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '{ws}') AS w
              FROM documents),
sh AS (SELECT doc_id, CASE
        WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)])
      END AS s FROM toks),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
   AND least(len(a.s), len(b.s))
       >= {PPJ_TAU} * greatest(len(a.s), len(b.s)) - 1),
sim AS (
  SELECT id_a, id_b,
         len(list_intersect(sa, sb))::BIGINT AS n_inter,
         (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
           AS n_union
  FROM cand
  WHERE (len(sa) + len(sb) - len(list_intersect(sa, sb))) = 0
     OR len(list_intersect(sa, sb))
        / (len(sa) + len(sb) - len(list_intersect(sa, sb))) >= {PPJ_TAU}),
bi AS (
  SELECT id_a AS doc_id, id_b AS nbr, n_inter, n_union FROM sim
  UNION ALL
  SELECT id_b, id_a, n_inter, n_union FROM sim),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id
    ORDER BY CASE WHEN n_union = 0 THEN 1.0
                  ELSE CAST(n_inter AS DOUBLE) / n_union END DESC,
             nbr) AS rn
  FROM bi)
SELECT doc_id, nbr, n_inter, n_union FROM rk WHERE rn <= {KNN_K}"""


def _ppjoin_dups_sql() -> str:
    """Word-trigram all-pairs exact Jaccard. The length prefilter carries
    an integer slack of 1 so IEEE rounding of tau*len can never drop a
    qualifying pair — the final fl-division compare (shared with the
    engine's verify) decides membership."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(text, '[^ \t\r\n\f\v]+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id, CASE
            WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
            WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
            ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                for i in range(1, len(w) - 1)])
          END AS s FROM toks),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           AND least(len(a.s), len(b.s))
               >= {PPJ_TAU} * greatest(len(a.s), len(b.s)) - 1),
        sim AS (
          SELECT id_a, id_b,
                 len(list_intersect(sa, sb))::BIGINT AS n_inter,
                 (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
                   AS n_union
          FROM cand)
        SELECT id_a, id_b, n_inter, n_union FROM sim
        WHERE n_union = 0 OR n_inter / n_union >= {PPJ_TAU}"""


CHUNK_WINDOW = 32
CHUNK_STEP = 24     # overlap 8 — the standard RAG sliding-window shape


def q_rag_chunks(sf_dir: str):
    """Token-window document chunking (stages/chunk.chunk_tokens): one
    row per overlapping 32-token window (step 24) — zero exchanges, one
    vectorized repeat/arange gather per block. Twin: lateral
    generate_series + 1-based inclusive list slice."""
    from pypdfium2_ray.stages.chunk import chunk_tokens
    ds = _docs(sf_dir, ["doc_id", "text"])
    return chunk_tokens(ds, window=CHUNK_WINDOW, step=CHUNK_STEP)


def q_token_entropy(sf_dir: str):
    """Per-document unigram entropy in fixed-point micro-nats
    (stages/textstats.token_entropy): floor(ln(N/c)*1e6) per distinct
    token, exact int64 weighted sum, one floor division — libm-twinned
    both sides, zero exchanges."""
    from pypdfium2_ray.stages.textstats import token_entropy
    ds = _docs(sf_dir, ["doc_id", "text"])
    return token_entropy(ds)


_TOKEN_ENTROPY_SQL = """
    WITH tok AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(list_filter(regexp_split_to_array(text,
                  '[ \\t\\r\\n\\f\\v]+'), t -> t <> '')) AS tok
           FROM documents),
    cnt AS MATERIALIZED (SELECT doc_id, tok, count(*)::BIGINT AS c
                         FROM tok GROUP BY doc_id, tok),
    n AS MATERIALIZED (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
                       FROM cnt GROUP BY doc_id),
    e AS (SELECT cnt.doc_id,
          CAST(SUM(cnt.c * CAST(floor(ln(CAST(n.n AS DOUBLE) / cnt.c)
                                      * 1e6) AS BIGINT)) AS BIGINT) AS s
          FROM cnt JOIN n USING (doc_id) GROUP BY cnt.doc_id)
    SELECT d.doc_id, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(e.s // n.n, 0) AS BIGINT) AS entropy_micro
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
    LEFT JOIN n USING (doc_id) LEFT JOIN e USING (doc_id)"""


HASH_EMBED_DIM = 64
#: integer cosine threshold num/den for the hash-embed near-dup pass
#: (0.9: the planted near-dup pairs plus same-template neighbors — 44
#: pairs at sf0.001; 0.8 admits ~3.2k same-topic pairs at dim 64)
TEXT_DUP_TAU = (9, 10)


def q_hash_embed(sf_dir: str):
    """Feature-hashing text embedding (stages/embed.hash_embed_long): one
    signed md5-bucketed token-count row per nonzero bucket — a pure
    per-block map with ZERO exchanges (tokens never leave their block).
    Exact int64 values, twin = token explode + md5_number_upper % dim +
    sign-bit CASE sum in SQL."""
    from pypdfium2_ray.stages.embed import hash_embed_long
    ds = _docs(sf_dir, ["doc_id", "text"])
    return hash_embed_long(ds, dim=HASH_EMBED_DIM)


def q_text_semantic_dups(sf_dir: str):
    """Semantic near-dup pairs straight from RAW TEXT: hash-embed (zero
    exchanges) then the integer-exact cosine broadcast tier —
    ``cos >= 4/5`` tested as ``dot>0 AND dot^2*25 >= 16*|a|^2*|b|^2``, no
    float anywhere, so the pair set AND its (dot, na2, nb2) evidence
    columns are SQL-exact. Broadcast gated on the documents footer row
    count (same regime rule as q_embedding_dups); beyond the gate, cast
    the vectors to float and route through the stages/ann LSH/IVF tiers."""
    import pyarrow.parquet as pq
    from pypdfium2_ray.stages.embed import hash_embed, int_cosine_dup_pairs
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    if rows > EMB_BROADCAST_MAX_ROWS:
        raise RuntimeError(
            f"text_semantic_dups broadcast tier is gated at "
            f"{EMB_BROADCAST_MAX_ROWS} rows (got {rows}); cast the "
            "hash-embed vectors to float and use stages/ann LSH/IVF")
    ds = _docs(sf_dir, ["doc_id", "text"])
    emb = hash_embed(ds, dim=HASH_EMBED_DIM).materialize()
    corpus = emb.take_batch(rows, batch_format="pyarrow")
    return int_cosine_dup_pairs(emb, corpus, *TEXT_DUP_TAU)


#: shared CTE prefix: token explode -> md5 -> nonzero signed bucket sums
#: (the exact twin of stages/embed._doc_token_matrix; MATERIALIZED — emb
#: is referenced by both join sides and the norm CTE)
_HASH_EMBED_CTES = f"""
    tok AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(list_filter(regexp_split_to_array(text,
                  '[ \\t\\r\\n\\f\\v]+'), t -> t <> '')) AS tok
           FROM documents),
    h AS (SELECT doc_id, md5_number_upper(tok) AS h FROM tok),
    emb AS MATERIALIZED (SELECT doc_id,
           CAST(h % {HASH_EMBED_DIM} AS BIGINT) AS bucket,
           CAST(SUM(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END)
                AS BIGINT) AS val
           FROM h GROUP BY doc_id, bucket
           HAVING SUM(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END)
                  <> 0)"""

_HASH_EMBED_SQL = ("WITH " + _HASH_EMBED_CTES
                   + "\n    SELECT doc_id, bucket, val FROM emb")

_TEXT_DUPS_SQL = ("WITH " + _HASH_EMBED_CTES + f""",
    norm AS MATERIALIZED (SELECT doc_id, SUM(val * val) AS n2
                          FROM emb GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    SUM(a.val * b.val) AS dot
             FROM emb a JOIN emb b
               ON a.bucket = b.bucket AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id)
    SELECT d.id_a, d.id_b, CAST(d.dot AS BIGINT) AS dot,
           CAST(na.n2 AS BIGINT) AS na2, CAST(nb.n2 AS BIGINT) AS nb2
    FROM dots d JOIN norm na ON na.doc_id = d.id_a
                JOIN norm nb ON nb.doc_id = d.id_b
    WHERE d.dot > 0 AND d.dot * d.dot * {TEXT_DUP_TAU[1] ** 2}
          >= {TEXT_DUP_TAU[0] ** 2} * na.n2 * nb.n2""")


def q_winnow_fingerprint(sf_dir: str):
    """Rolling-hash (winnowing) document fingerprint: min md5-window hash
    + distinct-window count per document (functions.sketch.winnow_min_hash,
    exact SQL twin)."""
    from pypdfium2_ray.functions.sketch import winnow_min_hash

    def f(t: pa.Table) -> pa.Table:
        mins, ns = [], []
        for txt in t["text"].to_pylist():
            m, n = winnow_min_hash(txt or "", k=8)
            mins.append(m)
            ns.append(n)
        return pa.table({"id": t["doc_id"],
                         "winnow_min": pa.array(mins, pa.int64()),
                         "n_windows": pa.array(ns, pa.int64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def q_sliding_distinct_users(sf_dir: str):
    """Per-sliding-window EXACT distinct users — the non-associative
    window aggregate, composed from two existing primitives: the hopping
    fan-out alone (stages/window.hopping_fan_out — each event replicated
    per covering window BEFORE anything moves) into the exact distinct
    machinery (freq.grouped_distinct_count: per-block pair distinct ->
    one pair exchange -> count). Nothing new to maintain: the
    composition IS the operator."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import grouped_distinct_count
    from pypdfium2_ray.stages.window import hopping_fan_out
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "user_id"])
    with _hint(sf_dir, "events"):
        fanned = hopping_fan_out(ds, "ts", size_s=7200, hop_s=3600)
        return grouped_distinct_count(fanned, ["window_start"], "user_id",
                                      out="n_users")


def q_events_hourly_sliding(sf_dir: str):
    """Hopping-window aggregate (stages/window.hopping_window): 2-hour
    windows every hour — each event fans out to 2 windows (vectorized
    repeat before the partial aggregation)."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.window import hopping_window
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "event_type", "value"])
    with _hint(sf_dir, "events"):
        out = hopping_window(ds, "ts", size_s=7200, hop_s=3600,
                             keys=["event_type"],
                             aggs={"n_events": (None, "count"),
                                   "sum_value_e4": ("value", "sum")})
    return _cast_i64(_scale_cols(out, {"sum_value_e4": 10_000}), ["n_events"])


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k. The query rows come from a pushdown-
    filtered read (3 rows), never a corpus materialization."""
    from pypdfium2_ray.stages.ann import ann_topk
    queries = _query_vectors(sf_dir, ANN_QUERY_IDS)
    with _hint(sf_dir, "embeddings"):
        return ann_topk(_embeddings(sf_dir), queries, k=ANN_K, scale=100)


def q_ann_ivf_topk(sf_dir: str):
    """IVF (coarse-quantizer) top-k, driven at nprobe == n_centroids so the
    probe set covers every cell and the result provably equals brute force
    (unit-tested equivalence, tests/test_ann.py) — which makes the exact
    ``ann_topk`` SQL its oracle; with full probe the centroids cannot
    affect the result, so the sampled train set is correctness-neutral.
    Modest-probe recall stays unit-tested."""
    from pypdfium2_ray.stages.ann import ivf_topk
    queries = _query_vectors(sf_dir, ANN_QUERY_IDS)
    train = _train_sample(sf_dir)
    with _hint(sf_dir, "embeddings"):
        return ivf_topk(_embeddings(sf_dir), queries, train, k=ANN_K,
                        n_centroids=16, nprobe=16, scale=100)


def q_pq_topk(sf_dir: str):
    """Product-quantization ADC top-k (stages/pq): codebooks trained on
    the streaming sample, corpus encoded to m=8 uint8 codes (8x smaller
    than the float64 vectors — the memory-scale ANN tier), integer
    fixed-point LUT scoring so results are bit-identical at any
    partitioning. Approximate by construction (quantization error) —
    rows-only driver check like kmeans_assign; exactness regime and
    recall are unit-tested (tests/test_pq.py)."""
    from pypdfium2_ray.stages.pq import pq_encode, pq_topk, train_pq
    queries = _query_vectors(sf_dir, ANN_QUERY_IDS)
    books = train_pq(_train_sample(sf_dir), m=8, k=64)
    with _hint(sf_dir, "embeddings"):
        codes = pq_encode(_embeddings(sf_dir), books)
        return pq_topk(codes, queries, books, k=ANN_K)


def q_embedding_dups(sf_dir: str):
    """Exact near-dup pairs, broadcast tier — gated on corpus size (footer
    row count, no scan): beyond EMB_BROADCAST_MAX_ROWS the broadcast matrix
    would not fit worker heaps and the query routes to the LSH-bucketed
    tier, which returns the same pairs at recall-validated configs."""
    import pyarrow.parquet as pq
    from pypdfium2_ray.stages.ann import embedding_dup_pairs
    if _embeddings_rows(sf_dir) > EMB_BROADCAST_MAX_ROWS:
        return q_embedding_lsh_dups(sf_dir)
    corpus = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    return embedding_dup_pairs(_embeddings(sf_dir), corpus, tau=DUP_TAU,
                               scale=100)


def q_embedding_lsh_dups(sf_dir: str):
    """LSH-bucketed near-dup variant. With 8 bands of 2 bits, recall is
    1.0 at the sf0.001/0.01 driver gates (deterministic seeded
    hyperplanes), so the exact-pairs SQL is a true oracle there; vectors
    never enter the band shuffle (ids only + verify joins). Measured
    honestly at sf0.1: 141/144 pairs — tau=0.45 is the low-threshold
    regime where hyperplane LSH degenerates (see the tier docstring), and
    the three misses sit at sim 0.48-0.53; the broadcast tier
    (q_embedding_dups) or the IVF tier (q_ivf_dups, recall 1.0 at sf0.1)
    is the right choice at low tau. ``max_bucket`` is sized from the
    corpus footer so the cap cannot silently truncate at these scales."""
    from pypdfium2_ray.stages.ann import embedding_lsh_dup_pairs
    with _hint(sf_dir, "embeddings"):
        return embedding_lsh_dup_pairs(
            _embeddings(sf_dir), dim=64, tau=DUP_TAU, n_bits=16, bands=8,
            scale=100, max_bucket=max(2000, _embeddings_rows(sf_dir)))


def q_ivf_dups(sf_dir: str):
    """IVF-cell-local near-dup pairs (stages/ann.ivf_dup_pairs) — the
    cluster-locality alternative to hyperplane LSH for low-threshold
    regimes. n_assign=4 of n_centroids=8 multi-probe reaches recall 1.0 on
    this corpus at sf0.001/0.01/0.1 (validated against the exact-pairs
    oracle, with centroids trained on the streaming sample — sampled
    centroids shift cell boundaries vs full-corpus training, hence the
    generous probe fraction); on near-orthogonal data no sublinear method
    separates structurally, so recall is config-validated, not guaranteed.
    ``max_bucket`` is sized from the corpus footer row count so the cap
    (which LOSES pairs when hit — see ivf_dup_pairs) cannot truncate at
    validated scales."""
    from pypdfium2_ray.stages.ann import ivf_dup_pairs
    train = _train_sample(sf_dir)
    with _hint(sf_dir, "embeddings"):
        return ivf_dup_pairs(_embeddings(sf_dir), train, tau=DUP_TAU,
                             n_centroids=8, n_assign=4, scale=100,
                             max_bucket=max(2000, _embeddings_rows(sf_dir)))


# ---------------------------------------------------------------------------
# relational surface

def q_pricing_summary(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import lineitem_pricing_summary
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(lineitem_pricing_summary(sf_dir), ["n_rows"])


def q_orders_by_region(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import orders_by_region
    with _hint(sf_dir, "orders"):
        return _cast_i64(orders_by_region(sf_dir), ["n_orders"])


def q_top_orders(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import top_orders
    return top_orders(sf_dir)


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10-shaped top-20 customers by returned-item revenue
    (pipelines/relational.returned_revenue): fact x fact x dimension x
    tiny-dimension — four keyed exchanges (two pre-combined aggs, two
    repartition joins; customer scales so it is never broadcast),
    nation broadcast, partial-bound top-k, integer-exact revenue."""
    from pypdfium2_ray.pipelines.relational import returned_revenue
    with _hint(sf_dir, "lineitem"):
        return returned_revenue(sf_dir)


def _returned_revenue_sql() -> str:
    return """
WITH rev AS (
  SELECT o_custkey,
         sum((round(l_extendedprice*100))::BIGINT
             * (100 - (round(l_discount*100))::BIGINT))::BIGINT
           AS revenue_e4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' GROUP BY o_custkey)
SELECT c.c_custkey, c.c_name, n.n_name,
       (round(c.c_acctbal*100))::BIGINT AS acctbal_cents,
       r.revenue_e4
FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_e4 DESC, c.c_custkey LIMIT 20"""


def q_local_volume(sf_dir: str):
    """TPC-H Q5-shaped local-supplier volume (pipelines/relational.
    local_supplier_volume): per-nation revenue where supplier and
    customer share the nation, one region — three repartition joins
    (customer and supplier both scale, never broadcast), block-local
    partials before the orderkey exchange, single-block nation rollup."""
    from pypdfium2_ray.pipelines.relational import local_supplier_volume
    with _hint(sf_dir, "lineitem"):
        return local_supplier_volume(sf_dir)


def _local_volume_sql() -> str:
    return """
SELECT n_name,
       sum((round(l_extendedprice*100))::BIGINT
           * (100 - (round(l_discount*100))::BIGINT))::BIGINT AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name"""


def q_big_orders(sf_dir: str):
    """TPC-H Q18-shaped large-volume orders (pipelines/relational.
    big_orders): per-order quantity sum HAVING > 300, joined back to
    orders and customer — one pre-combined agg exchange + two
    repartition joins."""
    from pypdfium2_ray.pipelines.relational import big_orders
    with _hint(sf_dir, "lineitem"):
        return big_orders(sf_dir)


def _big_orders_sql() -> str:
    return """
WITH q AS (
  SELECT l_orderkey, sum((round(l_quantity*100))::BIGINT) AS qty_e2
  FROM lineitem GROUP BY l_orderkey
  HAVING sum((round(l_quantity*100))::BIGINT) > 30000)
SELECT c_custkey, c_name, o_orderkey,
       epoch_us(o_orderdate) AS orderdate_us,
       (round(o_totalprice*100))::BIGINT AS total_cents, qty_e2
FROM q JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey"""


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped conditional revenue per brand (pipelines/
    relational.brand_promo_revenue): promo-type vs total revenue as
    exact integers — per-partkey pre-combined exchange + one
    repartition join onto the scaling part dimension, single-block
    brand rollup."""
    from pypdfium2_ray.pipelines.relational import brand_promo_revenue
    with _hint(sf_dir, "lineitem"):
        return brand_promo_revenue(sf_dir)


def _promo_revenue_sql() -> str:
    return """
WITH rev AS (
  SELECT l_partkey,
         (round(l_extendedprice*100))::BIGINT
         * (100 - (round(l_discount*100))::BIGINT) AS rev
  FROM lineitem)
SELECT p_brand,
       sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)::BIGINT
         AS promo_rev_e4,
       sum(rev)::BIGINT AS total_rev_e4
FROM rev JOIN part ON l_partkey = p_partkey
GROUP BY p_brand"""


def q_user_event_pivot(sf_dir: str):
    """Long->wide pivot (stages/pivot.pivot_counts): one row per user
    with an int64 count column per event type. Label census is a
    no-exchange single-block rollup over the fixed type enum; the pivot
    is per-block (key,label) partials + ONE key exchange + a vectorized
    per-partition crosstab."""
    import ray.data as rd
    from pypdfium2_ray.stages.pivot import label_census, pivot_counts
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type"])
    with _hint(sf_dir, "events"):
        labels = label_census(ev, "event_type")
        return pivot_counts(ev, "user_id", "event_type", labels)


def _user_event_pivot_sql() -> str:
    # labels fixed by the generator's event-type enum; the census is
    # oracle-checked implicitly (a missing/extra label changes the schema)
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{lb}')::BIGINT AS n_{lb}"
        for lb in ("click", "error", "purchase", "signup", "view"))
    return f"SELECT user_id,\n       {cols}\nFROM events GROUP BY user_id"


def q_type_distinct_users(sf_dir: str):
    """Exact per-type COUNT(DISTINCT user) (stages/agg.
    grouped_count_distinct): per-block pre-distinct on the (type, user)
    pair, ONE pair exchange, per-partition distinct+count partials,
    single-block combine over the fixed type enum. The sketch twin is
    distinct_users_hll; this is the exact tier."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_count_distinct
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        return grouped_count_distinct(ev, ["event_type"], "user_id",
                                      out="n_users",
                                      combine="single_block")


def q_value_moments(sf_dir: str):
    """Per-type second-order integer moments of (seconds-into-2024,
    value_e4) (stages/agg.grouped_moments): n / sum_x / sum_y / sum_xx /
    sum_yy / sum_xy — the associative partials behind variance,
    covariance, correlation and OLS slope, emitted as exact int64 sums
    (a float corr would hash-diverge across engines' summation orders).
    ZERO keyed exchanges: block partials + single-block enum combine."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_moments
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        x = pc.subtract(pc.divide(us, 1_000_000), 1_704_067_200)
        y = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "x": x, "y": y})

    with _hint(sf_dir, "events"):
        return grouped_moments(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["event_type"], "x", "y", combine="single_block")


def _value_moments_sql() -> str:
    return """
WITH m AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000 - 1704067200) AS x,
         (round(value * 10000))::BIGINT AS y
  FROM events)
SELECT event_type, count(*)::BIGINT AS n,
       sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
       sum(x*x)::BIGINT AS sum_xx, sum(y*y)::BIGINT AS sum_yy,
       sum(x*y)::BIGINT AS sum_xy
FROM m GROUP BY event_type"""


def q_user_pareto(sf_dir: str):
    """Pareto-maximal users under (activity, spend) dominance
    (stages/skyline): per-user (n_events, sum_value_e4) via one
    pre-combined key exchange, then the skyline filter — a two-level
    reduction with NO further exchange (any globally maximal point is
    maximal in its own block, so per-block fronts + one tiny combine)."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.skyline import skyline
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"], "value_e4": y})

    with _hint(sf_dir, "events"):
        per_user = grouped_aggregate(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["user_id"],
            {"n_events": (None, "count"),
             "sum_value_e4": ("value_e4", "sum")})
        return skyline(per_user, "n_events", "sum_value_e4")


def _user_pareto_sql() -> str:
    return """
WITH u AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         sum((round(value*10000))::BIGINT)::BIGINT AS sum_value_e4
  FROM events GROUP BY user_id)
SELECT * FROM u p
WHERE NOT EXISTS (
  SELECT 1 FROM u q
  WHERE q.n_events >= p.n_events AND q.sum_value_e4 >= p.sum_value_e4
    AND (q.n_events > p.n_events OR q.sum_value_e4 > p.sum_value_e4))"""


def q_table_digest(sf_dir: str):
    """Bucketed anti-entropy digest (stages/digest.table_digest): per
    md5-bucket row count + XOR of row hashes over (doc_id, lang,
    n_chars) — equality of two sides' 64x3 digests certifies row-
    multiset equality without moving either table; a mismatch localizes
    repair to 1/64 of the keyspace. ZERO exchanges: per-block partials,
    single-block XOR combine, bit-identical at any partitioning."""
    from pypdfium2_ray.stages.digest import table_digest
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return table_digest(ds, ["doc_id", "lang", "n_chars"], n_buckets=64)


def _table_digest_sql() -> str:
    h = "md5_number_upper(doc_id::VARCHAR || '|' || lang || '|' || n_chars::VARCHAR)"
    return f"""
WITH d AS (
  SELECT ({h} % 64)::BIGINT AS bucket, (({h} >> 1))::BIGINT AS hv
  FROM documents)
SELECT b.range::BIGINT AS bucket, count(d.hv)::BIGINT AS n_rows,
       COALESCE(bit_xor(d.hv), 0)::BIGINT AS xor_hash
FROM range(64) b LEFT JOIN d ON d.bucket = b.range
GROUP BY b.range"""


def q_chars_ntile(sf_dir: str):
    """Global equi-depth decile of every doc under the (n_chars, doc_id)
    total order (stages/scan.ranged_prefix_sum with val=1: the exact
    exclusive global rank — two-phase range scan, ONE keyed exchange),
    then decile = rank*10 // N with N from the parquet footer (no
    scan). The global-window-function shape (NTILE) that hash groupby
    cannot express."""
    import pyarrow.parquet as pq
    from pypdfium2_ray.stages.scan import ranged_prefix_sum
    n_total = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def composite(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        c = pc.cast(t["n_chars"], pa.int64())
        if t.num_rows and (pc.max(d).as_py() >= 2 ** 33
                           or pc.max(c).as_py() >= 2 ** 29):
            raise ValueError("composite ntile key would overflow — "
                             "re-derive the shift widths")
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"doc_id": d, "n_chars": c, "one": one,
                         "ckey": pc.add(pc.shift_left(c, 33), d)})

    import numpy as np
    with _hint(sf_dir):
        ranked = ranged_prefix_sum(
            ds.map_batches(composite, batch_format="pyarrow"),
            "ckey", "one", out="rank0")

    def decile(t: pa.Table) -> pa.Table:
        r = t["rank0"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"],
                         "decile": pa.array(r * 10 // n_total, pa.int64())})

    return ranked.map_batches(decile, batch_format="pyarrow")


def _chars_ntile_sql() -> str:
    return """
SELECT doc_id, n_chars,
       (((row_number() OVER (ORDER BY n_chars, doc_id)) - 1) * 10
        // (SELECT count(*) FROM documents))::BIGINT AS decile
FROM documents"""


def q_sorted_layout(sf_dir: str):
    """TeraSort-style globally-ordered layout: every doc's exact global
    position under the (n_chars, doc_id) total order, with bucket
    boundaries from a DETERMINISTIC content-keyed sample
    (stages/scan.sample_boundaries — a pure function of the key set,
    identical at any run/partitioning/cluster size) instead of the
    linear min/max map — the balance fix for skewed keys; assignment
    monotonicity keeps exactness regardless. ONE keyed exchange plus
    the bounded sample pass."""
    import numpy as np
    from pypdfium2_ray.stages.scan import (ranged_prefix_sum,
                                           sample_boundaries)
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def composite(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        c = pc.cast(t["n_chars"], pa.int64())
        one = pa.array(np.ones(t.num_rows, np.int64))
        return pa.table({"doc_id": d, "n_chars": c, "one": one,
                         "ckey": pc.add(pc.shift_left(c, 33), d)})

    cds = ds.map_batches(composite, batch_format="pyarrow")
    with _hint(sf_dir):
        cuts = sample_boundaries(cds, "ckey", n_buckets=8, modulus=16)
        ranked = ranged_prefix_sum(cds, "ckey", "one", out="global_pos",
                                   boundaries=cuts)
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "n_chars", "global_pos"]),
        batch_format="pyarrow")


def _sorted_layout_sql() -> str:
    return """
SELECT doc_id, n_chars,
       ((row_number() OVER (ORDER BY n_chars, doc_id)) - 1)::BIGINT
         AS global_pos
FROM documents"""


def q_basket_pairs(sf_dir: str):
    """Market-basket pair support, top-20 (stages/basket.pair_support):
    co-purchased part pairs across orders — per-block pre-distinct, ONE
    basket exchange, output-sensitive vectorized diagonal pair sweep +
    per-partition pre-combine, ONE pair exchange, partial-bound top-k.
    Set semantics (duplicate items per basket count once)."""
    import ray.data as rd
    from pypdfium2_ray.stages.basket import pair_support
    from pypdfium2_ray.stages.topk import topk
    line = rd.read_parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"])
    with _hint(sf_dir, "lineitem"):
        sup = pair_support(line, "l_orderkey", "l_partkey")
        return topk(sup, ["n_baskets", "item_a", "item_b"], 20,
                    descending=[True, False, False])


def _basket_pairs_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       count(*)::BIGINT AS n_baskets
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_baskets DESC, item_a, item_b LIMIT 20"""


def q_user_paths(sf_dir: str):
    """Ordered per-user journey strings (stages/sessionize.event_paths):
    each user's event types joined in (ts, event_id) order — ONE key
    exchange, one lexsort + pyarrow list-aggregate (encounter order ==
    sort order) + ONE binary_join per partition, zero per-key Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import event_paths
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    with _hint(sf_dir, "events"):
        return event_paths(ev)


def _user_paths_sql() -> str:
    return """
SELECT user_id, count(*)::BIGINT AS n_events,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id"""


def q_user_value_integral(sf_dir: str):
    """Per-user time-weighted value integral (stages/sessionize.
    time_weighted_sum): sum(dt_seconds x value_e4) over consecutive
    events, each interval weighted by its LEFT endpoint — the
    metering/billing aggregate (state held at v until the next change).
    ONE key exchange, whole-partition vectorized kernel; single-event
    users integrate to 0 and still emit."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import time_weighted_sum
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"], "ts": t["ts"],
                         "value_e4": v})

    with _hint(sf_dir, "events"):
        return time_weighted_sum(
            ev.map_batches(prescale, batch_format="pyarrow"))


def _user_value_integral_sql() -> str:
    return """
WITH o AS (
  SELECT user_id, (round(value*10000))::BIGINT AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS tn
  FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       COALESCE(sum(((tn - t) // 1000000) * v), 0)::BIGINT
         AS integral_e4
FROM o GROUP BY user_id"""


def q_late_orders(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join (pipelines/relational.
    late_orders): orders per priority with >= 1 lineitem shipped > 60
    days after the order date. Decorrelated: EXISTS over a monotone
    predicate == per-orderkey MAX, so lineitem collapses to partials +
    one key exchange, one repartition join, vectorized filter,
    single-block enum count."""
    from pypdfium2_ray.pipelines.relational import late_orders
    with _hint(sf_dir, "lineitem"):
        return _cast_i64(late_orders(sf_dir), ["n_late"])


def q_events_rollup(sf_dir: str):
    from pypdfium2_ray.pipelines.relational import events_rollup
    with _hint(sf_dir, "events"):
        return _cast_i64(events_rollup(sf_dir), ["n_events"])


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (stages/window): per (hour, event_type)
    counters — the windowed-aggregate custom op."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.window import tumbling_window
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["ts", "event_type", "value"])
    with _hint(sf_dir, "events"):
        out = tumbling_window(ds, "ts", "hour", keys=["event_type"],
                              aggs={"n_events": (None, "count"),
                                    "sum_value_e4": ("value", "sum")})
    return _cast_i64(_scale_cols(out, {"sum_value_e4": 10_000}), ["n_events"])


def q_events_median(sf_dir: str):
    """Exact per-type median event value (stages/agg.grouped_median — the
    non-associative aggregate: one hash exchange, vectorized pandas median
    per partition)."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.agg import grouped_median
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])
    with _hint(sf_dir, "events"):
        out = grouped_median(ds, ["event_type"], "value",
                             out="median_value_e4")
    return _cast_i64(_scale_cols(out, {"median_value_e4": 10_000}), [])


def q_user_decay(sf_dir: str):
    """Recency-decayed per-user activity score (stages/agg.
    grouped_decay_sum): each event contributes value_e4 >> hours-back
    from the user's latest event (half-life 1h, shift-capped at 40) —
    exponential decay with exact integer semantics on both engines (a
    binary shift, never libm pow). ONE user exchange, two Cython
    groupby passes."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_decay_sum
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "value"])
    with _hint(sf_dir, "events"):
        return grouped_decay_sum(ds, ["user_id"], "ts", "value")


def _user_decay_sql() -> str:
    return """
WITH e AS (SELECT user_id, ts, round(value * 10000)::BIGINT AS v,
                  max(ts) OVER (PARTITION BY user_id) AS latest
           FROM events)
SELECT user_id,
       sum(v // (1::BIGINT << least(
           (epoch_us(latest) - epoch_us(ts)) // 3600000000,
           40)))::BIGINT AS decay_e4
FROM e GROUP BY user_id"""


def _docs_v2(sf_dir: str):
    """Deterministic second crawl of the documents table: doc_id%9==4
    gone, doc_id%6==1 text-updated (' UPD'), doc_id%13==2 re-published
    under doc_id+1e7 (' NEWDOC') — every rule pure doc_id arithmetic so
    the oracle composes it in SQL."""
    import ray.data as rd

    def mutate(t: pa.Table) -> pa.Table:
        import numpy as np
        idn = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        base = t.filter(pa.array(idn % 9 != 4))
        bid = base["doc_id"].combine_chunks()
        bidn = bid.to_numpy(zero_copy_only=False)
        upd = pa.array(bidn % 6 == 1)
        text2 = pc.if_else(
            upd, pc.binary_join_element_wise(
                base["text"].combine_chunks(), " UPD", ""),
            base["text"].combine_chunks())
        v2 = pa.table({"doc_id": bid, "text": text2,
                       "lang": base["lang"], "source": base["source"]})
        new_m = pa.array(bidn % 13 == 2)
        nid = bid.filter(new_m)
        new = pa.table({
            "doc_id": pc.add(nid, 10_000_000),
            "text": pc.binary_join_element_wise(
                base["text"].combine_chunks().filter(new_m),
                " NEWDOC", ""),
            "lang": base["lang"].combine_chunks().filter(new_m),
            "source": base["source"].combine_chunks().filter(new_m)})
        return pa.concat_tables([v2, new])

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(mutate, batch_format="pyarrow")


_EXTRACT_COLS = ["url", "status", "err_code", "n_pages", "n_chars",
                 "extracted_text"]


def _v1_extract_cache(sf_dir: str) -> str:
    """The v1 crawl's extraction results persisted ONCE per sf_dir as
    parquet — the stored artifact a production incremental run reuses
    (the incremental_dedup persisted-state convention; idempotent
    temp-then-rename cache like _warc_corpus)."""
    import hashlib
    import os
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(
        f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    out = f"/tmp/graft_xv1_{tag}_{rows}"
    if os.path.isdir(out):
        return out
    tmp = out + ".build"
    v1 = _extract(sf_dir, "range").select_columns(_EXTRACT_COLS)
    v1.write_parquet(tmp)
    os.replace(tmp, out)
    return out


def q_incremental_extract(sf_dir: str):
    """The incremental crawl round, composed end-to-end: fingerprint
    both snapshots (ids+hash only), snapshot_delta classifies each url,
    ONLY new/changed pages run the extraction stack (semi-join before
    the parser — the whole point of incrementality), unchanged urls
    reuse the persisted v1 results, and the union is the new extraction
    table. The ORACLE is the full recompute over the v2 documents —
    incremental must equal full, byte-exact per url, or the composition
    is wrong. Exchanges: 1 delta classify + 2 keys-only semi joins; the
    delta table is materialized once as the split point (production
    writes it to parquet instead)."""
    from functools import partial as _p

    import ray.data as rd
    from pypdfium2_ray.docmodel.layout import LayoutParams
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    from pypdfium2_ray.sources.cc_from_documents import (
        documents_to_cc, read_cc_from_documents)
    from pypdfium2_ray.stages.join import key_filter_join
    from pypdfium2_ray.stages.snapshot import snapshot_delta

    def add_fp(t: pa.Table) -> pa.Table:
        fp = [md5_hash64(v) >> 1 for v in t["html"].to_pylist()]
        return pa.table({"url": t["url"],
                         "fingerprint": pa.array(fp, pa.int64())})

    v1_cc = read_cc_from_documents(sf_dir)
    v2_cc = _docs_v2(sf_dir).map_batches(documents_to_cc,
                                         batch_format="pyarrow")
    with _hint(sf_dir):
        delta = snapshot_delta(
            v1_cc.map_batches(add_fp, batch_format="pyarrow"),
            v2_cc.map_batches(add_fp, batch_format="pyarrow"),
            key="url").materialize()
        todo = delta.filter(
            expr="delta == 'new' or delta == 'changed'") \
            .select_columns(["url"])
        same = delta.filter(expr="delta == 'unchanged'") \
            .select_columns(["url"])
        prior = rd.read_parquet(_v1_extract_cache(sf_dir))
        reuse = key_filter_join(prior, same, "url", mode="semi",
                                tier="exchange")
        fresh_in = key_filter_join(v2_cc, todo, "url", mode="semi",
                                   tier="exchange")
        fresh = extract_pipeline(
            ds=fresh_in, skew_split=True,
            extract_opts=dict(strategy="range", include_pages=False,
                              include_rects=False,
                              layout=LayoutParams(page_width=1e9)))
    fresh = _cast_i64(fresh.select_columns(_EXTRACT_COLS),
                      ["err_code", "n_pages", "n_chars"])
    reuse = _cast_i64(reuse.select_columns(_EXTRACT_COLS),
                      ["err_code", "n_pages", "n_chars"])
    return reuse.union(fresh)


def q_merge_snapshot(sf_dir: str):
    """Changelog MERGE (stages/snapshot.apply_changelog — the
    upsert/delete incremental-materialization primitive of
    log-structured table formats): base snapshot + a deterministic
    synthetic changelog (updates for doc_id%5==0 at v1, deletes for
    doc_id%7==3 at v2, inserts keyed doc_id+1e7 for doc_id%11==0);
    per key the highest version wins, winning deletes drop the key.
    Union + ONE key exchange + vectorized keep-last kernel with a loud
    (key, version)-uniqueness contract."""
    from pypdfium2_ray.stages.snapshot import apply_changelog

    def as_base(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"], "text": t["text"],
            "version": pa.array(np.zeros(n, np.int64)),
            "op": pa.array(["upsert"] * n)})

    def as_delta(t: pa.Table) -> pa.Table:
        import numpy as np
        ids = t["doc_id"].combine_chunks()
        txt = t["text"].combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        upd_m = pa.array(idn % 5 == 0)
        n_upd = int((idn % 5 == 0).sum())
        upd = pa.table({
            "doc_id": ids.filter(upd_m),
            "text": pc.binary_join_element_wise(
                txt.filter(upd_m), " [v2]", ""),
            "version": pa.array(np.full(n_upd, 1, np.int64)),
            "op": pa.array(["upsert"] * n_upd)})
        del_m = pa.array(idn % 7 == 3)
        n_del = int((idn % 7 == 3).sum())
        dele = pa.table({
            "doc_id": ids.filter(del_m),
            "text": pa.array([""] * n_del, pa.string()),
            "version": pa.array(np.full(n_del, 2, np.int64)),
            "op": pa.array(["delete"] * n_del)})
        ins_m = pa.array(idn % 11 == 0)
        n_ins = int((idn % 11 == 0).sum())
        ins_ids = ids.filter(ins_m)
        ins = pa.table({
            "doc_id": pc.add(ins_ids, 10_000_000),
            "text": pc.binary_join_element_wise(
                "new doc ", pc.cast(ins_ids, pa.string()), ""),
            "version": pa.array(np.full(n_ins, 1, np.int64)),
            "op": pa.array(["upsert"] * n_ins)})
        return pa.concat_tables([upd, dele, ins])

    base = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        as_base, batch_format="pyarrow")
    delta = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        as_delta, batch_format="pyarrow")
    with _hint(sf_dir):
        merged = apply_changelog(base, delta)

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "rev": pc.cast(t["version"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow")


def _merge_snapshot_sql() -> str:
    return """
WITH log AS (
  SELECT doc_id, text, 0 AS version, 'upsert' AS op FROM documents
  UNION ALL
  SELECT doc_id, text || ' [v2]', 1, 'upsert' FROM documents
  WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, '', 2, 'delete' FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id + 10000000, 'new doc ' || doc_id, 1, 'upsert'
  FROM documents WHERE doc_id % 11 = 0),
r AS (SELECT doc_id, text, version, op,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY version DESC) AS rn
      FROM log)
SELECT doc_id, version::BIGINT AS rev, length(text)::BIGINT AS n_chars
FROM r WHERE rn = 1 AND op = 'upsert'"""


def q_props_stats(sf_dir: str):
    """Semi-structured field projection + rollup over the events JSON
    props column: extract $.k with Arrow's C++ JSON block parser (the
    whole column joins to one newline-delimited buffer per block — rows
    never pass through Python objects; a loud guard rejects embedded
    newlines, which the corpus convention forbids), then the per-type
    enum rollup in the single-block combine tier."""
    import io

    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate

    def extract(t: pa.Table) -> pa.Table:
        import pyarrow.json as pj
        pr = pc.fill_null(t["props"], "{}")
        if pc.any(pc.match_substring(pr, "\n")).as_py():
            raise ValueError("props values must be single-line JSON "
                             "for the block parse")
        payload = "\n".join(pr.to_pylist()).encode()
        parsed = pj.read_json(io.BytesIO(payload))
        return pa.table({"event_type": t["event_type"],
                         "k": pc.cast(parsed["k"], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "props"])
    ds = ds.map_batches(extract, batch_size=None, batch_format="pyarrow")
    return _cast_i64(grouped_aggregate(
        ds, ["event_type"],
        {"n_events": (None, "count"), "sum_k": ("k", "sum"),
         "min_k": ("k", "min"), "max_k": ("k", "max")},
        combine="single_block"), ["sum_k", "min_k", "max_k"])


def _props_stats_sql() -> str:
    return """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type"""


def q_lang_mode(sf_dir: str):
    """Per-source dominant language (stages/agg.grouped_mode): the
    modal lang per source with (count DESC, lang ASC) tie-break — the
    majority-label aggregate of mixture accounting. Per-block counts
    pre-combine, ONE source exchange, vectorized argmax kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mode
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["source", "lang"])
    with _hint(sf_dir):
        return grouped_mode(ds, ["source"], "lang",
                            out_val="mode_lang", out_n="n_docs")


def _lang_mode_sql() -> str:
    return """
WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
           FROM documents GROUP BY 1, 2),
r AS (SELECT source, lang, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rn
      FROM c)
SELECT source, lang AS mode_lang, n AS n_docs FROM r WHERE rn = 1"""


def q_user_gap_stats(sf_dir: str):
    """Per-user inter-arrival-time stats (stages/sessionize.gap_stats):
    gaps between consecutive events in ts order, integer microseconds
    end-to-end — the lead/lag window family as a batch aggregate
    (burstiness / bot-cadence features). Single-event users emit
    nothing; ONE user exchange, lexsort+diff+mask kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import gap_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts"])
    with _hint(sf_dir, "events"):
        return gap_stats(ds)


def _user_gap_stats_sql() -> str:
    return """
WITH g AS (SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts) AS gap
           FROM events)
SELECT user_id, count(*)::BIGINT AS n_gaps, min(gap)::BIGINT AS min_gap_us,
       max(gap)::BIGINT AS max_gap_us, sum(gap)::BIGINT AS sum_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY user_id"""


def q_overlap_pairs(sf_dir: str):
    """Per-user interval OVERLAP join (intervals.overlap_join): events
    become sessions [ts, ts + (1 + value_e2 % 600) s); even event_ids
    are side A, odd side B; emit every same-user cross-side overlapping
    pair — the temporal-join primitive point-in-interval range joins
    cannot express. ONE user exchange + an output-sensitive vectorized
    offset sweep (pass d compares the partition shifted by d; monotone
    starts make the first empty pass a proof of completeness)."""
    import ray.data as rd
    from pypdfium2_ray.stages.intervals import overlap_join

    def to_iv(t: pa.Table) -> pa.Table:
        import numpy as np
        ts = t["ts"].combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view("int64")
        v = np.rint(t["value"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "s": pa.array(ts, pa.int64()),
            "e": pa.array(ts + (1 + v % 600) * 1_000_000, pa.int64()),
            "side": pa.array((eid % 2).astype(np.int8)),
            "event_id": t["event_id"]})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(to_iv, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        return overlap_join(ds, "user_id", "s", "e", "side", "event_id")


def _overlap_pairs_sql() -> str:
    return """
WITH iv AS (SELECT event_id, user_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                     + (1 + (round(value*100))::BIGINT % 600) * 1000000
                     AS e
            FROM events),
a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
b AS (SELECT * FROM iv WHERE event_id % 2 = 1)
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM a JOIN b ON a.user_id = b.user_id
WHERE a.s < b.e AND b.s < a.e"""


def q_event_transitions(sf_dir: str):
    """Markov transition counts over per-user event streams
    (sessionize.transition_counts): every adjacent (prev_type,
    next_type) pair in (ts, event_id) order, summed across users — the
    sequence-mining aggregate (funnel checks one fixed pattern; this
    counts them all). ONE user exchange emitting per-partition partial
    pair counts; the enum-sized final combine is single-block."""
    import ray.data as rd
    from pypdfium2_ray.stages.sessionize import transition_counts
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    with _hint(sf_dir, "events"):
        return _cast_i64(transition_counts(ds), ["n"])


def _event_transitions_sql() -> str:
    return """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS prev_type, event_type AS next_type, count(*)::BIGINT AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2"""


def q_events_quartiles(sf_dir: str):
    """Exact per-type DISCRETE quartiles (agg.grouped_order_stats): the
    actual element at index q*(n-1)//4 under the (value, event_id)
    total order — real rows, no interpolation, so doubles hash-match
    the row_number twin bit-for-bit (interpolated quantiles would put
    IEEE expression order in the gate). One exchange, one vectorized
    gather kernel."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_order_stats
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value", "event_id"])
    with _hint(sf_dir, "events"):
        return grouped_order_stats(ds, ["event_type"], "value",
                                   tiebreak="event_id")


def _events_quartiles_sql() -> str:
    picks = ", ".join(
        f"max(CASE WHEN rn - 1 = {q} * (c - 1) // 4 THEN value END) AS q{q}"
        for q in (1, 2, 3))
    return f"""
WITH r AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS c
           FROM events)
SELECT event_type, {picks} FROM r GROUP BY event_type"""


def q_heavy_bigrams(sf_dir: str):
    """Exact heavy-hitter word bigrams across the corpus via the two-pass
    Misra-Gries sketch-then-verify op (stages/freq.heavy_hitters): blocks
    reduce to k counters, only candidates are re-counted exactly — the
    result is EXACT (hash-checked vs HAVING count >= ceil(frac*N)).
    k_sketch=2048 >= N/threshold = 1/frac, the documented completeness
    rule."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import explode_bigrams, heavy_hitters

    def make():
        return rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                               columns=["text"])             .map_batches(explode_bigrams, batch_size=None,
                         batch_format="pyarrow")
    with _hint(sf_dir):
        return heavy_hitters(make, "token", threshold_frac=0.001,
                             k_sketch=2048)


def q_distinct_users(sf_dir: str):
    """Exact count(distinct user_id) per event_type
    (stages/freq.grouped_distinct_count): per-block distinct pre-combine,
    ONE pair exchange, enum-keyed single-block count."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import grouped_distinct_count
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    with _hint(sf_dir, "events"):
        return grouped_distinct_count(ds, ["event_type"], "user_id",
                                      combine="single_block")


def q_distinct_users_hll(sf_dir: str):
    """HyperLogLog tier of distinct_users: one 2^p-byte register row per
    (block, group) moves instead of the distinct pairs — the cardinality
    path when the pair exchange stops being affordable. Runs the
    ``hash="md5"`` tier so the ESTIMATE itself is SQL-exact (md5 registers,
    exact-integer harmonic sum, libm-twinned linear-counting correction —
    the Count-Min discipline applied to cardinality); the production
    ``hash="fast"`` tier is bound-tested in tests/test_freq.py."""
    import ray.data as rd
    from pypdfium2_ray.stages.freq import grouped_distinct_hll
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_distinct_hll(ds, ["event_type"], "user_id",
                                out="est_micro", combine="single_block",
                                hash="md5")


#: SQL twin of the md5 HLL tier (p=12): registers from md5_number_upper,
#: rho via bin() bit length, the harmonic sum as the EXACT integer
#: N = zeros*2^53 + sum(2^(53-rho)) in HUGEINT, and the same
#: double-expression estimate order as stages/freq._hll_estimate_micro.
_HLL_ORACLE = """
    WITH vals AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v
                  FROM events WHERE user_id IS NOT NULL),
    h AS (SELECT event_type, md5_number_upper(v) AS h FROM vals),
    rr AS (SELECT event_type, CAST(h >> 52 AS BIGINT) AS idx,
                  CASE WHEN (h & 4503599627370495::UBIGINT) = 0 THEN 53
                       ELSE 53 - length(bin(h & 4503599627370495::UBIGINT))
                  END AS rho
           FROM h),
    regs AS (SELECT event_type, idx, MAX(rho) AS m
             FROM rr GROUP BY event_type, idx),
    agg AS (SELECT event_type, COUNT(*) AS npres,
                   SUM(CAST(1::BIGINT << (53 - m) AS HUGEINT)) AS s
            FROM regs GROUP BY event_type),
    est AS (SELECT event_type, 4096 - npres AS zeros,
                   CAST(4096 - npres AS HUGEINT)
                     * 9007199254740992::HUGEINT + s AS n
            FROM agg)
    SELECT event_type,
           CAST(floor(CASE
                 WHEN ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                      * 9007199254740992.0 / CAST(n AS DOUBLE) <= 10240.0
                  AND zeros > 0
                 THEN 4096.0 * ln(4096.0 / zeros)
                 ELSE ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                      * 9007199254740992.0 / CAST(n AS DOUBLE)
               END * 1e6) AS BIGINT) AS est_micro
    FROM est"""


def q_events_median_sketch(sf_dir: str):
    """Approximate per-type median via the t-digest sketch tier
    (stages/agg.grouped_quantile_sketch): each block compresses to
    <= ~delta/2 weighted centroids per group, so only centroid rows move —
    the whole-corpus quantile path where the exact grouped_median's
    full-projection exchange is no longer affordable. No SQL oracle:
    estimates are approximate (rank error ~ 1/delta, layout-dependent in
    those digits — inherent to mergeable sketches); correctness is the
    rank-error-bound tests in tests/test_tdigest.py, which also pin this
    query against the exact median on the same table."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_quantile_sketch
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_quantile_sketch(ds, ["event_type"], "value", q=0.5,
                                   out="median_est",
                                   combine="single_block")  # fixed enum


def q_path_census(sf_dir: str):
    """URL path-prefix census (stages/pathcensus.path_prefix_census):
    page counts per path prefix at every depth — per-DEPTH vectorized
    prefix build (bounded loop over levels, never rows), pre-combined
    partials, ONE prefix exchange, loud max_depth truncation. Planted
    3-level paths /cat{id%5}/sub{id%17}/p{id} behind a real
    scheme+host (exercising the scheme strip)."""
    from pypdfium2_ray.stages.pathcensus import path_prefix_census

    def to_urls(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        m5 = pc.subtract(did, pc.multiply(pc.divide(did, 5), 5))
        m17 = pc.subtract(did, pc.multiply(pc.divide(did, 17), 17))
        url = pc.binary_join_element_wise(
            "https://", pc.cast(t["source"], pa.string()),
            "/cat", pc.cast(m5, pa.string()),
            "/sub", pc.cast(m17, pa.string()),
            "/p", pc.cast(did, pa.string()), "")
        return pa.table({"url": url})

    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        to_urls, batch_format="pyarrow")
    with _hint(sf_dir):
        return path_prefix_census(ds, max_depth=8)


def _path_census_sql() -> str:
    return """
        WITH pref AS (
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR) AS prefix,
                 1 AS depth FROM documents
          UNION ALL
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
                 || '/sub' || CAST(doc_id % 17 AS VARCHAR), 2
          FROM documents
          UNION ALL
          SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
                 || '/sub' || CAST(doc_id % 17 AS VARCHAR)
                 || '/p' || CAST(doc_id AS VARCHAR), 3
          FROM documents)
        SELECT prefix, depth::BIGINT AS depth,
               count(*)::BIGINT AS n_pages
        FROM pref GROUP BY prefix, depth"""


VOCAB_MIN_COUNT = 2


#: oov_rate: vocabulary size for the per-doc OOV accounting
OOV_K = 20


def q_oov_rate(sf_dir: str):
    """Per-doc out-of-vocabulary counts against the corpus's own top-20
    token vocabulary (stages/vocab.oov_counts): census exchange +
    partial-bound top-k + a broadcast k-token set, then a ZERO-exchange
    per-block doc rollup — how much of each document a k-token
    vocabulary fails to cover (tokenizer sizing / quality signal)."""
    from pypdfium2_ray.stages.vocab import oov_counts
    ds = _docs(sf_dir, ["doc_id", "text"])
    with _hint(sf_dir):
        return oov_counts(ds, vocab_k=OOV_K)


def _oov_rate_sql() -> str:
    ws = r"[^ \t\r\n\f\v]+"
    return f"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '{ws}'))
               AS token FROM documents),
cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY token),
vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT {OOV_K})
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum((token NOT IN (SELECT token FROM vocab))::INT)::BIGINT AS n_oov
FROM tok GROUP BY doc_id"""


def q_vocab_coverage(sf_dir: str):
    """Tokenizer-prep vocabulary table (stages/vocab.vocab_coverage):
    exact global token census (per-block Counter pre-combine, ONE token
    exchange), (cnt DESC, token ASC) total-order ranks, EXACT integer
    cumulative coverage (cum_cnt/total_cnt, denominator counting
    below-cut occurrences from the same census — nothing rescans the
    corpus). The post-cut ordered scan is single-partition by design
    with a loud ceiling (heavy-hitter bound <= occurrences/min_count)."""
    from pypdfium2_ray.stages.vocab import vocab_coverage
    ds = _docs(sf_dir, ["text"])
    with _hint(sf_dir):
        return vocab_coverage(ds, min_count=VOCAB_MIN_COUNT)


def _vocab_coverage_sql() -> str:
    return f"""
        WITH tok AS (SELECT unnest(regexp_extract_all(text,
                       '[^ \t\r\n\f\v]+')) AS token FROM documents
                     WHERE text IS NOT NULL),
        cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok
                GROUP BY token),
        tot AS (SELECT sum(c)::BIGINT AS t FROM cnt),
        v AS (SELECT token, c,
                     row_number() OVER (ORDER BY c DESC, token) AS rank,
                     sum(c) OVER (ORDER BY c DESC, token
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM cnt WHERE c >= {VOCAB_MIN_COUNT})
        SELECT rank::BIGINT AS rank, token, c AS cnt,
               cum::BIGINT AS cum_cnt, (SELECT t FROM tot) AS total_cnt
        FROM v"""


def q_interval_coverage(sf_dir: str):
    """Gaps-and-islands interval merge (stages/intervals
    .interval_coverage): per-user overlap-merged coverage of synthetic
    watch-windows [ts, ts + (event_id%120+30) min] — islands split where
    s > running max(e) (touching merges), covered = sum of island
    spans. ONE user exchange; kernel is lexsort + Cython groupby.cummax
    + reduceat, int64 µs end to end."""
    import ray.data as rd
    from pypdfium2_ray.stages.intervals import interval_coverage

    def to_iv(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        eid = pc.cast(t["event_id"], pa.int64())
        rem = pc.subtract(eid, pc.multiply(pc.divide(eid, 120), 120))
        mins = pc.add(rem, 30)
        dur = pc.multiply(mins, pa.scalar(60_000_000, pa.int64()))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "s": s, "e": pc.add(s, dur)})

    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_id", "ts"]
                         ).map_batches(to_iv, batch_format="pyarrow")
    with _hint(sf_dir, "events"):
        out = interval_coverage(ds, key_col="user_id")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["user_id", "n_islands", "covered"])

    return out.map_batches(rename, batch_format="pyarrow")


def _interval_coverage_sql() -> str:
    return """
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                           epoch_us(ts) + (event_id % 120 + 30)
                             * 60 * 1000000 AS e
                    FROM events),
        m AS (SELECT user_id, s, e,
                     CASE WHEN max(e) OVER w IS NULL
                               OR s > max(e) OVER w
                          THEN 1 ELSE 0 END AS ni
              FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING)),
        isl AS (SELECT user_id, s, e,
                       sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS island
                FROM m),
        per AS (SELECT user_id, island, max(e) - min(s) AS cov
                FROM isl GROUP BY user_id, island)
        SELECT user_id, count(*)::BIGINT AS n_islands,
               sum(cov)::BIGINT AS covered
        FROM per GROUP BY user_id"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered conversion funnel (stages/funnel.funnel): deepest
    view->click->purchase stage per user with STRICT chaining (each step
    strictly after the previous step's first time), convert_us for full
    conversions (-1 sentinel otherwise — no NULLs, the driver gate
    cannot order mixed-null columns). Events pre-filtered to step types
    and projected to (user, step, int64 µs) before the ONE user
    exchange; the kernel is chained groupby-min/merge pandas, int64
    throughout (reindex fills are int64 MAX, never NaN — the
    bigint-float trap)."""
    import ray.data as rd
    from pypdfium2_ray.stages.funnel import funnel
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    with _hint(sf_dir, "events"):
        return funnel(ds, steps=FUNNEL_STEPS)


def _funnel_sql() -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
        WITH e AS (SELECT user_id, event_type, ts FROM events
                   WHERE event_type IN ('{s1}', '{s2}', '{s3}')),
        t1 AS (SELECT user_id, min(ts) AS ts1 FROM e
               WHERE event_type = '{s1}' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM e
               JOIN t1 USING (user_id)
               WHERE event_type = '{s2}' AND e.ts > t1.ts1
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM e
               JOIN t2 USING (user_id)
               WHERE event_type = '{s3}' AND e.ts > t2.ts2
               GROUP BY e.user_id),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT u.user_id,
               (CASE WHEN ts3 IS NOT NULL THEN 3
                     WHEN ts2 IS NOT NULL THEN 2
                     WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS stage,
               COALESCE(epoch_us(ts3) - epoch_us(ts1), -1)::BIGINT
                 AS convert_us
        FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
               LEFT JOIN t3 USING (user_id)"""


def q_session_stats(sf_dir: str):
    """Per-session aggregates: sessionize (gap 30 min) then group by
    (user, session) — event count and session span in seconds. The classic
    session-window aggregate, composed from the session-id op + the
    partial/combine aggregation."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.sessionize import sessionize
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    with _hint(sf_dir, "events"):
        s = sessionize(ds, key="user_id", ts_col="ts", gap_s=1800)
        out = grouped_aggregate(s, ["user_id", "session_id"], {
            "n_events": (None, "count"),
            "t_min": ("ts", "min"),
            "t_max": ("ts", "max")})

    def span(t: pa.Table) -> pa.Table:
        dur = pc.divide(pc.cast(pc.subtract(
            pc.cast(t["t_max"], pa.int64()),
            pc.cast(t["t_min"], pa.int64())), pa.int64()), 1_000_000)
        return pa.table({"user_id": t["user_id"],
                         "session_id": t["session_id"],
                         "n_events": pc.cast(t["n_events"], pa.int64()),
                         "span_s": pc.cast(dur, pa.int64())})
    return out.map_batches(span, batch_format="pyarrow")


#: value buckets for the range-join query: [lo, hi) -> bucket id.
#: SQL VALUES and the broadcast interval table are generated from THIS list
#: so the two sides cannot drift.
VALUE_BUCKETS = [(i, float(i * 50), float((i + 1) * 50)) for i in range(20)]


def q_events_value_bucket(sf_dir: str):
    """Range join (stages/rangejoin): events.value -> containing bucket
    interval (broadcast interval table + searchsorted), then counts."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.rangejoin import range_join
    intervals = pa.table({
        "bucket": pa.array([b for b, _, _ in VALUE_BUCKETS], pa.int64()),
        "lo": pa.array([lo for _, lo, _ in VALUE_BUCKETS]),
        "hi": pa.array([hi for _, _, hi in VALUE_BUCKETS]),
    })
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "value"])
    joined = range_join(ds, intervals, value_col="value")
    with _hint(sf_dir, "events"):
        return grouped_aggregate(joined, ["bucket"],
                                 {"n_events": (None, "count")},
                                 combine="single_block")  # fixed buckets


def q_asof_last_purchase(sf_dir: str):
    """As-of join (stages/asof): each click event joined to the same
    user's most recent strictly-earlier purchase event."""
    import ray.data as rd
    from pypdfium2_ray.pipelines.relational import _scale_cols
    from pypdfium2_ray.stages.asof import asof_join

    def read_type(et, rename=None):
        ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])
        ds = ds.map_batches(
            lambda t, et=et: t.filter(pc.equal(t["event_type"], et))
                              .drop_columns(["event_type"]),
            batch_format="pyarrow")
        if rename:
            ds = ds.map_batches(
                lambda t: t.rename_columns([rename.get(c, c)
                                            for c in t.column_names]),
                batch_format="pyarrow")
        return ds

    left = read_type("click").map_batches(
        lambda t: t.drop_columns(["value"]), batch_format="pyarrow")
    right = read_type("purchase",
                      rename={"event_id": "p_event_id", "value": "p_value_e4"})
    with _hint(sf_dir, "events"):
        out = asof_join(left, right, by="user_id", on="ts")
    return _scale_cols(out, {"p_value_e4": 10_000})


# ---------------------------------------------------------------------------
# multimodal: binary payload columns through actor-pool decode stages

def q_decode_images(sf_dir: str):
    """Deterministic md5-derived decode stub over binary payloads — the
    dims are pure functions of the payload digest with an exact DuckDB
    twin (md5_number_upper), so the stub path itself is oracle-checked."""
    from pypdfium2_ray.stages.multimodal import decode_images

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["doc_id"],
                         "data": pc.cast(t["text"], pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_payload, batch_format="pyarrow")
    out = decode_images(ds, mode="fake")
    return _cast_i64(out.select_columns(["id", "width", "height", "n_bytes"]),
                     ["width", "height"])


def q_image_meta(sf_dir: str):
    """REAL image decode end-to-end: synthesize a PNG per document (dims
    derived from the text — stdlib encoder, functions/png.py), then parse
    the header back with the from-scratch parser (functions/imagemeta),
    including the reference's metadata field set (bpp / colorspace — M14;
    the 8-bit gray engine PNGs carry no pHYs, so dpi stays 0 like
    PDFium's no-density report). The oracle recomputes every field from
    the text."""
    import numpy as np
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.text import token_count
    from pypdfium2_ray.stages.multimodal import decode_images

    def to_png(t: pa.Table) -> pa.Table:
        toks = token_count(t["text"]).to_pylist()
        payloads = []
        for txt, ntok in zip(t["text"].to_pylist(), toks):
            w = 1 + len(txt or "") % 64
            h = 1 + int(ntok) % 64
            payloads.append(encode_png(np.zeros((h, w), dtype=np.uint8)))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_png, batch_format="pyarrow")
    out = decode_images(ds, mode="headers")
    return _cast_i64(
        out.select_columns(["id", "status", "format", "width", "height",
                            "bpp", "colorspace", "dpi_x", "dpi_y"]),
        ["width", "height", "bpp", "dpi_x", "dpi_y"])


def _qf_parts() -> tuple[str, str]:
    from pypdfium2_ray.functions.text import sql_token_count
    from pypdfium2_ray.stages.textstats import sql_quality_filter
    return (sql_token_count("text"),
            sql_quality_filter("text", min_tokens=50, max_tokens=100_000,
                               min_mean_token_chars=3.0,
                               max_mean_token_chars=9.0,
                               min_stopword_frac=0.01))


#: quality-filter twins (token-count expr + WHERE clause)
_QF_TOKS, _QF_WHERE = _qf_parts()


def _winnow_sql() -> str:
    from pypdfium2_ray.functions.sketch import sql_winnow_fingerprint
    return sql_winnow_fingerprint(k=8)


#: winnowing-fingerprint SQL twin (engine-exact, see sketch.py)
_WINNOW_SQL = _winnow_sql()


def _simhash_fp_sql() -> str:
    from pypdfium2_ray.functions.sketch import sql_simhash_fingerprints
    return sql_simhash_fingerprints(ngram_n=3)


#: per-doc simhash fingerprint SQL (engine-exact, see sketch.py)
_SIMHASH_FP_SQL = _simhash_fp_sql()

#: exact cosine near-dup pairs — shared by embedding_dups (broadcast tier)
#: and embedding_lsh_dups (bucketed tier at recall-1 config)
_EMB_DUPS_SQL = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE
                      * 100) AS BIGINT) AS sim_centi
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {DUP_TAU}"""

#: exact cosine top-k oracle — shared by ann_topk and full-probe ann_ivf_topk
_ANN_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id IN {ANN_QUERY_IDS}),
    s AS (SELECT q.qid, e.vec_id,
                 list_cosine_similarity(e.embedding, q.qe) AS sim
          FROM embeddings e, q WHERE e.vec_id <> q.qid)
    SELECT qid AS query_id, vec_id AS neighbor_id,
           CAST(round(sim::DOUBLE * 100) AS BIGINT) AS sim_centi
    FROM s
    QUALIFY row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, vec_id) <= {ANN_K}"""


#: image twins: doc_id % 40 == 1 shares its predecessor's pixels
IMG_TWIN_MOD = 40


def q_image_dups(sf_dir: str):
    """Perceptual image near-dup pairs (stages/imagedup.image_dup_pairs):
    REAL decode (three lossless from-scratch codecs cycled by doc_id%3 —
    a PNG twin of a BMP twin still collides, the re-encode-dedup story)
    -> REAL NN downsample -> dHash -> shared simhash pigeonhole banding
    + hamming verify, recall exact at max_dist<=bands-1. The planted
    image encodes md5_hash64(visual_id) bit-for-bit in its horizontal
    gradients (±1 steps from 32 at even columns; the 9x8 downsample
    lands exactly on them), so the pipeline's recovered fingerprint —
    and therefore every pair — is the md5_number_upper SQL expression."""
    import numpy as np
    from pypdfium2_ray.functions.bmp import encode_bmp
    from pypdfium2_ray.functions.gif import encode_gif
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.imagedup import image_dup_pairs

    def to_img(t: pa.Table) -> pa.Table:
        payloads = []
        for did in t["doc_id"].to_pylist():
            v = did - 1 if did % IMG_TWIN_MOD == 1 else did
            fp = md5_hash64(str(v).encode())
            img = np.empty((16, 18), np.uint8)
            for j in range(8):
                c, vals = 32, [32]
                for k in range(8):
                    c += 1 if (fp >> (j * 8 + k)) & 1 else -1
                    vals.append(c)
                row = np.repeat(np.array(vals, np.uint8), 2)
                img[2 * j] = row
                img[2 * j + 1] = row
            enc = (encode_png, encode_bmp, encode_gif)[did % 3]
            payloads.append(enc(img))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(to_img,
                                               batch_format="pyarrow")
    with _hint(sf_dir):
        return image_dup_pairs(ds, bands=4, max_dist=3)


def _image_dups_sql() -> str:
    return f"""
        WITH f AS (SELECT doc_id,
            md5_number_upper(CAST(doc_id - CASE WHEN doc_id % {IMG_TWIN_MOD}
                = 1 THEN 1 ELSE 0 END AS VARCHAR)) AS fp
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3"""


def q_image_resize(sf_dir: str):
    """REAL resize end-to-end over a MIXED-format corpus: doc_id mod 4
    picks PNG / uncompressed BMP / GIF / baseline JPEG (all four
    from-scratch codecs — GIF exercises LZW, JPEG the DCT entropy
    round-trip); resize to half (decode -> vectorized nearest-neighbor
    -> re-encode in the same format), then header-parse the RESIZED
    payload back; the oracle recomputes halved dims and the doc_id-mod
    format."""
    import numpy as np
    from pypdfium2_ray.functions.bmp import encode_bmp
    from pypdfium2_ray.functions.gif import encode_gif
    from pypdfium2_ray.functions.jpeg import encode_jpeg
    from pypdfium2_ray.functions.png import encode_png
    from pypdfium2_ray.functions.text import token_count
    from pypdfium2_ray.stages.multimodal import decode_images, resize_images

    def to_img(t: pa.Table) -> pa.Table:
        toks = token_count(t["text"]).to_pylist()
        payloads = []
        for did, txt, ntok in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(), toks):
            w = 2 + len(txt or "") % 64
            h = 2 + int(ntok) % 64
            img = np.zeros((h, w), dtype=np.uint8)
            enc = (encode_png, encode_bmp, encode_gif,
                   encode_jpeg)[did % 4]
            payloads.append(enc(img))
        return pa.table({"id": t["doc_id"],
                         "data": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_img, batch_format="pyarrow")
    resized = resize_images(ds, scale=0.5)
    out = decode_images(resized.select_columns(["id", "data"]),
                        mode="headers")
    return _cast_i64(
        out.select_columns(["id", "status", "format", "width", "height"]),
        ["width", "height"])


def q_value_outliers(sf_dir: str):
    """Robust per-type outliers (stages/agg.grouped_mad_outliers): rows
    with |v - median| > 3 x MAD in 1e-4 units — the skew-proof curation
    gate (a z-score gate's own threshold is dragged by the outliers it
    should catch; median/MAD are not). Doubled discrete medians keep the
    whole test in int64 (2 x dev2 > 3 x mad4 — cross-multiplied, no
    division), so doubles hash-match the row_number twin bit-for-bit.
    ONE exchange on event_type, two lexsorts per partition, zero
    per-group Python."""
    import ray.data as rd
    from pypdfium2_ray.stages.agg import grouped_mad_outliers
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_type", "event_id", "value"])

    def prescale(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "event_id": t["event_id"], "value_e4": v})

    with _hint(sf_dir, "events"):
        return grouped_mad_outliers(
            ev.map_batches(prescale, batch_format="pyarrow"),
            ["event_type"], "value_e4", tiebreak="event_id")


def _value_outliers_sql() -> str:
    # med2 = v[(n-1)//2] + v[n//2] under (v, event_id): both picks via
    # row_number CASE sums (odd n -> same index counted twice); dev2 and
    # mad4 repeat the rule on |2v - med2|. 2*dev2 > 3*mad4 is the
    # cross-multiplied |v-med| > 3*MAD.
    return """
WITH s AS (SELECT event_type, event_id,
                  (round(value*10000))::BIGINT AS value_e4 FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY value_e4, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c FROM s),
m AS (SELECT event_type,
             sum(CASE WHEN rn - 1 = (c - 1) // 2 THEN value_e4 ELSE 0 END)
           + sum(CASE WHEN rn - 1 = c // 2 THEN value_e4 ELSE 0 END) AS med2
      FROM r GROUP BY event_type),
d AS (SELECT r.event_type, r.event_id, r.value_e4,
             abs(2 * r.value_e4 - m.med2)::BIGINT AS dev2
      FROM r JOIN m USING (event_type)),
d2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                    ORDER BY dev2, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type) AS c FROM d),
md AS (SELECT event_type,
              sum(CASE WHEN rn - 1 = (c - 1) // 2 THEN dev2 ELSE 0 END)
            + sum(CASE WHEN rn - 1 = c // 2 THEN dev2 ELSE 0 END) AS mad4
       FROM d2 GROUP BY event_type)
SELECT d.event_type, d.event_id, d.value_e4, d.dev2, md.mad4
FROM d JOIN md USING (event_type)
WHERE 2 * d.dev2 > 3 * md.mad4"""


def q_k_anon_events(sf_dir: str):
    """k-anonymity release gate (stages/privacy.k_anonymize): suppress
    every row whose quasi-identifier combination (event_type, UTC hour
    of day, value decade) isolates fewer than k=5 rows corpus-wide —
    Sweeney's re-identification floor as ONE hash exchange on the quasi
    keys + a whole-partition count-and-mask kernel (no census + semi-join
    round trip)."""
    import ray.data as rd
    from pypdfium2_ray.stages.privacy import k_anonymize
    ev = rd.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])

    def quasi(t: pa.Table) -> pa.Table:
        import numpy as np
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) % 24
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t["value"], pa.float64()), 10_000.0)),
            pa.int64()).to_numpy(zero_copy_only=False)
        decade = v // 100_000  # 10-unit-wide value buckets in 1e-4 units
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "hour": pa.array(hour.astype(np.int64)),
                         "value_decade": pa.array(decade)})

    with _hint(sf_dir, "events"):
        return k_anonymize(ev.map_batches(quasi, batch_format="pyarrow"),
                           ["event_type", "hour", "value_decade"], k=5)


def _k_anon_events_sql() -> str:
    # epoch microseconds // 3.6e9 % 24 == UTC hour; value decade floors
    # the 1e-4-scaled value by 1e5. DuckDB // truncates toward zero but
    # both operands are nonnegative here (ts after 1970, value >= 0 in
    # the synthetic events table) so floor == truncate.
    return """
WITH q AS (SELECT event_id, event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hour,
                  (round(value*10000))::BIGINT // 100000 AS value_decade
           FROM events)
SELECT event_id, event_type, hour, value_decade FROM q
QUALIFY count(*) OVER (PARTITION BY event_type, hour, value_decade) >= 5"""


# ---------------------------------------------------------------------------
# driver contract

def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return q_extract_text(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": q_extract_text,
        "extract_bounded": q_extract_bounded,
        "warc_extract": q_warc_extract,
        "density_extract": q_density_extract,
        "tile_extract": q_tile_extract,
        "doc_flags": q_doc_flags,
        "meta_extract": q_meta_extract,
        "token_stats": q_token_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "term_search": q_term_search,
        "term_search_word": q_term_search_word,
        "extract_status_rollup": q_extract_status_rollup,
        "text_slice": q_text_slice,
        "bpe_tokens": q_bpe_tokens,
        "sessions": q_sessions,
        "collapse_repeats": q_collapse_repeats,
        "jsonl_tokens": q_jsonl_tokens,
        "csv_tokens": q_csv_tokens,
        "curate_corpus": q_curate_corpus,
        "quality_filter": q_quality_filter,
        "hash_sample": q_hash_sample,
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "median_length_gate": q_median_length_gate,
        "repetition_stats": q_repetition_stats,
        "domain_stats": q_domain_stats,
        "doc_stats": q_doc_stats,
        "top_docs_per_domain": q_top_docs_per_domain,
        "inverted_index": q_inverted_index,
        "phrase_search": q_phrase_search,
        "bool_search": q_bool_search,
        "dedup_exact": q_dedup_exact,
        "dedup_latest_event": q_dedup_latest_event,
        "snapshot_delta": q_snapshot_delta,
        "incremental_dedup": q_incremental_dedup,
        "normalize_text": q_normalize_text,
        "cm_counts": q_cm_counts,
        "join_size_est": q_join_size_est,
        "join_size_exact": q_join_size_exact,
        "cust_order_dist": q_cust_order_dist,
        "order_priority_semi": q_order_priority_semi,
        "top_supplier": q_top_supplier,
        "small_qty_revenue": q_small_qty_revenue,
        "idle_rich_customers": q_idle_rich_customers,
        "key_skew": q_key_skew,
        "nation_flow": q_nation_flow,
        "mkt_share": q_mkt_share,
        "part_supplier_census": q_part_supplier_census,
        "blame_supplier": q_blame_supplier,
        "user_running_total": q_user_running_total,
        "event_islands": q_event_islands,
        "monthly_delta": q_monthly_delta,
        "value_centered": q_value_centered,
        "dense_topk": q_dense_topk,
        "important_parts": q_important_parts,
        "forecast_revenue": q_forecast_revenue,
        "event_lag": q_event_lag,
        "running_distinct": q_running_distinct,
        "first_touch": q_first_touch,
        "time_to_convert": q_time_to_convert,
        "user_trend": q_user_trend,
        "user_gini": q_user_gini,
        "densify_days": q_densify_days,
        "bounce_rate": q_bounce_rate,
        "benford_digits": q_benford_digits,
        "ks_distance": q_ks_distance,
        "mutual_links": q_mutual_links,
        "kwic_first": q_kwic_first,
        "value_cume": q_value_cume,
        "weighted_median": q_weighted_median,
        "user_type_bitmask": q_user_type_bitmask,
        "burst_count": q_burst_count,
        "trailing_sum": q_trailing_sum,
        "active_streak": q_active_streak,
        "state_duration": q_state_duration,
        "time_profile": q_time_profile,
        "rfm_scores": q_rfm_scores,
        "spike_days": q_spike_days,
        "source_share": q_source_share,
        "peak_day": q_peak_day,
        "systematic_sample": q_systematic_sample,
        "adoption_lag": q_adoption_lag,
        "session_pairs": q_session_pairs,
        "type_jaccard": q_type_jaccard,
        "early_ltv": q_early_ltv,
        "max_gap_at": q_max_gap_at,
        "ship_delay": q_ship_delay,
        "first_session_size": q_first_session_size,
        "concurrency_curve": q_concurrency_curve,
        "embedding_norms": q_embedding_norms,
        "transition_probs": q_transition_probs,
        "island_lengths": q_island_lengths,
        "taste_shift": q_taste_shift,
        "momentum_score": q_momentum_score,
        "session_handoff": q_session_handoff,
        "new_vs_returning": q_new_vs_returning,
        "dim_stats": q_dim_stats,
        "last_touch": q_last_touch,
        "purchase_gaps": q_purchase_gaps,
        "customer_order_gaps": q_customer_order_gaps,
        "length_histogram": q_length_histogram,
        "dim_gram": q_dim_gram,
        "brand_price_quartiles": q_brand_price_quartiles,
        "bracket_revenue": q_bracket_revenue,
        "type_corr_parts": q_type_corr_parts,
        "running_peak": q_running_peak,
        "priority_median": q_priority_median,
        "touches_to_convert": q_touches_to_convert,
        "dup_size_hist": q_dup_size_hist,
        "dedup_keep_best": q_dedup_keep_best,
        "extract_toc": q_extract_toc,
        "token_length_hist": q_token_length_hist,
        "gap_hist": q_gap_hist,
        "entry_conversion": q_entry_conversion,
        "type_cadence": q_type_cadence,
        "idle_users": q_idle_users,
        "brand_return_rate": q_brand_return_rate,
        "order_status_matrix": q_order_status_matrix,
        "ab_split_metrics": q_ab_split_metrics,
        "norm_hist": q_norm_hist,
        "bookend_types": q_bookend_types,
        "type_dow_profile": q_type_dow_profile,
        "user_activity_hist": q_user_activity_hist,
        "type_trigrams": q_type_trigrams,
        "source_top_tokens": q_source_top_tokens,
        "char_census": q_char_census,
        "order_size_hist": q_order_size_hist,
        "discount_profile": q_discount_profile,
        "zorder_layout": q_zorder_layout,
        "robots_gate": q_robots_gate,
        "minhash_dups": q_minhash_dups,
        "simhash_dups": q_simhash_dups,
        "fp_neighbors": q_fp_neighbors,
        "shared_chunks": q_shared_chunks,
        "template_chunks": q_template_chunks,
        "strip_boilerplate": q_strip_boilerplate,
        "graph_walks": q_graph_walks,
        "cocitation": q_cocitation,
        "neardup_clusters": q_neardup_clusters,
        "neardup_keep_one": q_neardup_keep_one,
        "pagerank": q_pagerank,
        "trustrank": q_trustrank,
        "hits": q_hits,
        "triangles": q_triangles,
        "local_clustering": q_local_clustering,
        "kcore": q_kcore,
        "communities": q_communities,
        "crawl_depth": q_crawl_depth,
        "extract_links": q_extract_links,
        "extract_tables": q_extract_tables,
        "extract_jsonld": q_extract_jsonld,
        "anchor_text": q_anchor_text,
        "crawl_frontier": q_crawl_frontier,
        "link_pagerank": q_link_pagerank,
        "bm25_topk": q_bm25_topk,
        "url_dedup": q_url_dedup,
        "contamination_scan": q_contamination_scan,
        "mixture_sample": q_mixture_sample,
        "lm_score": q_lm_score,
        "ngram_decontaminate": q_ngram_decontaminate,
        "span_dedup": q_span_dedup,
        "dup_spans": q_dup_spans,
        "stratified_sample": q_stratified_sample,
        "audio_features": q_audio_features,
        "embedding_centroids": q_embedding_centroids,
        "kmeans_assign": q_kmeans_assign,
        "collocations": q_collocations,
        "semantic_dedup": q_semantic_dedup,
        "shuffle_assign": q_shuffle_assign,
        "negative_pairs": q_negative_pairs,
        "pack_offsets": q_pack_offsets,
        "length_rank": q_length_rank,
        "cohort_retention": q_cohort_retention,
        "shipping_priority": q_shipping_priority,
        "user_rolling_7d": q_user_rolling_7d,
        "top_user_per_type": q_top_user_per_type,
        "ngram_dups": q_ngram_dups,
        "ppjoin_dups": q_ppjoin_dups,
        "jaccard_knn": q_jaccard_knn,
        "editdist_dups": q_editdist_dups,
        "editdist2_dups": q_editdist2_dups,
        "dup_owner": q_dup_owner,
        "postings_compress": q_postings_compress,
        "containment_dups": q_containment_dups,
        "gram_novelty": q_gram_novelty,
        "bpe_merges": q_bpe_merges,
        "weighted_sample": q_weighted_sample,
        "doc_keywords": q_doc_keywords,
        "rollup_stats": q_rollup_stats,
        "cube_stats": q_cube_stats,
        "strip_repeated": q_strip_repeated,
        "canonical_resolve": q_canonical_resolve,
        "winnow_fingerprint": q_winnow_fingerprint,
        "hash_embed": q_hash_embed,
        "text_semantic_dups": q_text_semantic_dups,
        "rag_chunks": q_rag_chunks,
        "token_entropy": q_token_entropy,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "pq_topk": q_pq_topk,
        "embedding_dups": q_embedding_dups,
        "embedding_lsh_dups": q_embedding_lsh_dups,
        "ivf_dups": q_ivf_dups,
        "pricing_summary": q_pricing_summary,
        "orders_by_region": q_orders_by_region,
        "top_orders": q_top_orders,
        "late_orders": q_late_orders,
        "returned_revenue": q_returned_revenue,
        "local_volume": q_local_volume,
        "big_orders": q_big_orders,
        "promo_revenue": q_promo_revenue,
        "user_event_pivot": q_user_event_pivot,
        "type_distinct_users": q_type_distinct_users,
        "value_moments": q_value_moments,
        "user_pareto": q_user_pareto,
        "table_digest": q_table_digest,
        "chars_ntile": q_chars_ntile,
        "sorted_layout": q_sorted_layout,
        "basket_pairs": q_basket_pairs,
        "user_paths": q_user_paths,
        "user_value_integral": q_user_value_integral,
        "value_outliers": q_value_outliers,
        "k_anon_events": q_k_anon_events,
        "crawl_schedule": q_crawl_schedule,
        "user_decay": q_user_decay,
        "lang_mode": q_lang_mode,
        "props_stats": q_props_stats,
        "merge_snapshot": q_merge_snapshot,
        "incremental_extract": q_incremental_extract,
        "audio_resample": q_audio_resample,
        "lang_confusion": q_lang_confusion,
        "user_gap_stats": q_user_gap_stats,
        "events_quartiles": q_events_quartiles,
        "event_transitions": q_event_transitions,
        "overlap_pairs": q_overlap_pairs,
        "oov_rate": q_oov_rate,
        "events_rollup": q_events_rollup,
        "events_median": q_events_median,
        "events_median_sketch": q_events_median_sketch,
        "heavy_bigrams": q_heavy_bigrams,
        "distinct_users": q_distinct_users,
        "distinct_users_hll": q_distinct_users_hll,
        "session_stats": q_session_stats,
        "funnel": q_funnel,
        "interval_coverage": q_interval_coverage,
        "vocab_coverage": q_vocab_coverage,
        "path_census": q_path_census,
        "events_hourly": q_events_hourly,
        "events_hourly_sliding": q_events_hourly_sliding,
        "sliding_distinct_users": q_sliding_distinct_users,
        "events_value_bucket": q_events_value_bucket,
        "asof_last_purchase": q_asof_last_purchase,
        "decode_images": q_decode_images,
        "image_meta": q_image_meta,
        "image_resize": q_image_resize,
        "image_dups": q_image_dups,
    }


def oracle_sql() -> dict[str, str]:
    from pypdfium2_ray.pipelines.relational import (
        FORECAST_DISC, FORECAST_MAX_QTY, FORECAST_WINDOW,
        MKT_SHARE_NATION, MKT_SHARE_REGION, MKT_SHARE_TYPE,
        TOP_SUPPLIER_WINDOW,
    )
    from pypdfium2_ray.stages.agg import PERIOD_DELTA_SENTINEL
    from pypdfium2_ray.functions.text import (
        LANG_STOPWORDS, sql_bpe_token_count, sql_lang_pred, sql_term_count,
        sql_token_count,
    )
    from pypdfium2_ray.stages.chunk import sql_chunk_tokens
    from pypdfium2_ray.functions.text import (
        sql_normalize_text,
        sql_pii_count as _sql_pii_count,
        sql_redact_pii as _sql_redact_pii,
        sql_repetition_counts,
    )
    _REP_SQL = sql_repetition_counts("text")
    from pypdfium2_ray.sources.cc_from_documents import (
        _sql_page_texts, sql_extracted_text, sql_n_chars, sql_is_bad,
        sql_is_enc)

    en_stop = "\\b(" + "|".join(LANG_STOPWORDS["en"]) + ")\\b"
    ext = sql_extracted_text("text")
    n_chars_sql = sql_n_chars("text")
    # deterministic error slice of the synthesized crawl (cc_from_documents
    # ERR_MOD family): pure doc_id arithmetic, so the oracle expresses the
    # per-row (status, err_code, empty-output) discipline exactly —
    # err_code values are the PDFium constants (FORMAT=3, PASSWORD=4)
    bad, enc = sql_is_bad(), sql_is_enc()
    p1_sql, p2_sql = _sql_page_texts("text")
    from pypdfium2_ray.stages.zorder import sql_zorder_key
    _zorder_sql = sql_zorder_key("user_id", "(epoch_us(ts) // 1000000)")
    is_err = f"({bad} OR {enc})"
    status_sql = (f"CASE WHEN {bad} THEN 'format_error' "
                  f"WHEN {enc} THEN 'password_error' ELSE 'ok' END")
    errc_sql = (f"(CASE WHEN {bad} THEN 3 WHEN {enc} THEN 4 "
                f"ELSE 0 END)::BIGINT")
    ext_err = f"CASE WHEN {is_err} THEN '' ELSE {ext} END"
    npages_sql = f"(CASE WHEN {is_err} THEN 0 ELSE 2 END)::BIGINT"
    nchars_err = (f"(CASE WHEN {is_err} THEN 0 "
                  f"ELSE {n_chars_sql} END)::BIGINT")

    return {
        "extract_text": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   lang,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        "extract_bounded": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {ext_err} AS extracted_text
            FROM documents""",
        # incremental == full recompute: the oracle extracts the ENTIRE
        # v2 snapshot directly; the engine reuses v1 results for
        # unchanged urls and parses only new/changed pages
        "incremental_extract": f"""
            WITH docs2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 6 = 1 THEN text || ' UPD'
                          ELSE text END AS text,
                     lang, source
              FROM documents WHERE doc_id % 9 <> 4
              UNION ALL
              SELECT doc_id + 10000000, text || ' NEWDOC', lang, source
              FROM documents WHERE doc_id % 9 <> 4 AND doc_id % 13 = 2)
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM docs2""",
        # 2x1 imposition + serialize + reopen: one sheet whose text is
        # page1's lines then page2's under a single frame (ok rows only —
        # tile refuses failed documents)
        "tile_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   1::BIGINT AS n_pages,
                   '# Page 1' || chr(10) || {p1_sql} || chr(13) || chr(10)
                    || {p2_sql} || chr(10) AS extracted_text
            FROM documents WHERE NOT {bad} AND NOT {enc}""",
        # density policy over the no-<main> corpus shape: the heuristic
        # must reproduce the flagship bytes exactly
        "density_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        # WARC-sourced flagship: identical per-url contract as
        # extract_text (minus lang, which the container doesn't carry)
        "warc_extract": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   {status_sql} AS status,
                   {errc_sql} AS err_code,
                   {npages_sql} AS n_pages,
                   {nchars_err} AS n_chars,
                   {ext_err} AS extracted_text
            FROM documents""",
        # the synthesized corpus: h1/h2 outline => tagged + use_outlines
        # (PAGEMODE_USEOUTLINES = 1, the PDFium constant), forms
        # stripped-absent => formtype none (0); error rows carry the
        # error-document defaults (untagged, no pagemode)
        "doc_flags": f"""
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   NOT {is_err} AS is_tagged,
                   0::BIGINT AS formtype,
                   (CASE WHEN {is_err} THEN 0 ELSE 1 END)::BIGINT AS pagemode
            FROM documents""",
        "token_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "jsonl_tokens": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "csv_tokens": f"""
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   {sql_token_count('text')} AS n_tokens,
                   length(regexp_extract_all(text, '[.!?]')) AS n_punct,
                   length(regexp_extract_all(text, '{en_stop}')) AS n_stopwords
            FROM documents""",
        "lang_id": f"""
            SELECT doc_id, {sql_lang_pred('text')} AS lang_pred
            FROM documents""",
        "lang_confusion": f"""
            SELECT lang, {sql_lang_pred('text')} AS lang_pred,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1, 2""",
        "fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents""",
        "term_search": f"""
            SELECT doc_id, {sql_term_count('text', SEARCH_TERM)} AS n_matches
            FROM documents""",
        "term_search_word": f"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\b{SEARCH_TERM}\\b'))
                     AS n_word_matches
            FROM documents""",
        "extract_status_rollup": f"""
            SELECT {status_sql} AS status, {errc_sql} AS err_code,
                   count(*) AS n_docs,
                   sum(CASE WHEN {is_err} THEN 0 ELSE {n_chars_sql} END)
                     ::BIGINT AS sum_chars
            FROM documents GROUP BY 1, 2""",
        "text_slice": """
            SELECT doc_id, substr(text, 11, 50) AS slice_text FROM documents""",
        "bpe_tokens": f"""
            SELECT doc_id, {sql_bpe_token_count('text')} AS n_bpe_tokens
            FROM documents""",
        "sessions": """
            WITH d AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT event_id, user_id, ts,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM d""",
        "quality_filter": f"""
            SELECT doc_id, {_QF_TOKS} AS n_tokens
            FROM documents WHERE {_QF_WHERE}""",
        # deterministic hash sampling: md5_number_upper == md5_hash64
        # (first 8 digest bytes LE, verified)
        "hash_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE md5_number_upper(doc_id::VARCHAR) % 10 = 3""",
        "median_length_gate": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     median(n_chars) OVER (PARTITION BY lang) AS med
              FROM documents)
            WHERE n_chars >= med""",
        "pii_redact": f"""
            WITH t2 AS (
              SELECT doc_id,
                     text || ' contact doc' || doc_id ||
                     '@example.com or +1 555-12' || doc_id ||
                     ' ip 10.0.0.1' AS txt
              FROM documents)
            SELECT doc_id, {_sql_redact_pii('txt')} AS clean,
                   {_sql_pii_count('email', 'txt')}::BIGINT AS n_emails,
                   {_sql_pii_count('phone', 'txt')}::BIGINT AS n_phones,
                   {_sql_pii_count('ip', 'txt')}::BIGINT AS n_ips
            FROM t2""",
        "repetition_stats": f"""
            SELECT doc_id, {_REP_SQL[0]}::BIGINT AS n_tokens,
                   {_REP_SQL[1]}::BIGINT AS n_distinct_tokens
            FROM documents""",
        "decontaminate": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id NOT IN (
                SELECT doc_id FROM documents
                WHERE md5_number_upper(doc_id::VARCHAR) % 10 = 3)""",
        # the oracle applies the SAME host regex to the SAME synthesized
        # url, so a source containing '/' (or failing the regex) diverges
        # identically on both sides instead of silently only in the engine
        "domain_stats": """
            SELECT regexp_extract('doc://' || source || '/' || doc_id,
                                  '^doc://([^/]+)/', 1) AS host,
                   count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1""",
        "phrase_search": _phrase_search_sql(),
        "bool_search": _bool_search_sql(),
        "crawl_schedule": _crawl_schedule_sql(),
        "user_decay": _user_decay_sql(),
        "lang_mode": _lang_mode_sql(),
        "props_stats": _props_stats_sql(),
        "merge_snapshot": _merge_snapshot_sql(),
        "user_gap_stats": _user_gap_stats_sql(),
        "events_quartiles": _events_quartiles_sql(),
        "event_transitions": _event_transitions_sql(),
        "overlap_pairs": _overlap_pairs_sql(),
        "oov_rate": _oov_rate_sql(),
        "inverted_index": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(text,
                     '[ \t\r\n\f\v]+')) AS token FROM documents),
            t2 AS (SELECT DISTINCT doc_id, token FROM toks
                   WHERE token <> '')
            SELECT token AS term, count(*)::BIGINT AS df,
                   sum(doc_id)::BIGINT AS sum_doc_ids,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM t2 GROUP BY token""",
        "top_docs_per_domain": """
            WITH d AS (
              SELECT regexp_extract('doc://' || source || '/' || doc_id,
                                    '^doc://([^/]+)/', 1) AS host,
                     doc_id, CAST(length(text) AS BIGINT) AS n_chars
              FROM documents)
            SELECT host, doc_id, n_chars FROM d
            QUALIFY row_number() OVER (
                PARTITION BY host ORDER BY n_chars DESC, doc_id) <= 3""",
        "doc_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang""",
        "dedup_exact": """
            SELECT md5(text) AS fingerprint, min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1""",
        "dedup_latest_event": """
            SELECT user_id, event_id, ts FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) = 1""",
        "snapshot_delta": """
            WITH old AS (
              SELECT 'doc://' || source || '/' || doc_id AS url,
                     md5(text) AS fp
              FROM documents WHERE doc_id % 3 <> 0),
            new AS (
              SELECT 'doc://' || source || '/' || doc_id AS url,
                     md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                              ELSE text END) AS fp
              FROM documents WHERE doc_id % 2 <> 0)
            SELECT COALESCE(o.url, n.url) AS url,
                   CASE WHEN o.url IS NULL THEN 'new'
                        WHEN n.url IS NULL THEN 'gone'
                        WHEN o.fp = n.fp THEN 'unchanged'
                        ELSE 'changed' END AS delta
            FROM old o FULL OUTER JOIN new n ON o.url = n.url""",
        "normalize_text": (
            "SELECT doc_id, "
            + sql_normalize_text("('“' || text || '”… — ok')")
            + " AS norm_text FROM documents"),
        "cm_counts": _cm_counts_sql(),
        "join_size_est": _join_size_est_sql(),
        "join_size_exact": """
            SELECT count(*)::BIGINT AS exact
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
        "cust_order_dist": """
            WITH per_cust AS (
              SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY 1)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM per_cust GROUP BY 1""",
        "order_priority_semi": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_returnflag = 'R')
            GROUP BY 1""",
        "top_supplier": f"""
            WITH rev AS (
              SELECT l_suppkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))
                         )::BIGINT AS total_rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_WINDOW[0]}'
                AND l_shipdate < TIMESTAMP '{TOP_SUPPLIER_WINDOW[1]}'
              GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, r.total_rev_e4
            FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
            WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)""",
        "small_qty_revenue": """
            WITH per_part AS (
              SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                     count(*)::BIGINT AS n_li
              FROM lineitem GROUP BY 1)
            SELECT COALESCE(SUM(CAST(round(l.l_extendedprice*100)
                                     AS BIGINT)), 0)::BIGINT AS sum_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * p.n_li < p.sum_qty""",
        "idle_rich_customers": """
            WITH pos AS (
              SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT AS s,
                     count(*)::BIGINT AS n
              FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
            SELECT c_nationkey::BIGINT AS c_nationkey,
                   count(*)::BIGINT AS n_cust,
                   SUM(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT
                     AS sum_acctbal_cents
            FROM customer, pos
            WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
              AND c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY 1""",
        "key_skew": """
            WITH per_key AS (SELECT user_id, count(*)::BIGINT AS cnt
                             FROM events GROUP BY 1)
            SELECT CAST(floor(log2(cnt)) AS BIGINT) AS bucket,
                   count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
                   max(cnt)::BIGINT AS max_cnt
            FROM per_key GROUP BY 1""",
        "nation_flow": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS year,
                   SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT))
                       )::BIGINT AS rev_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey <> c_nationkey
            GROUP BY 1, 2, 3""",
        "mkt_share": f"""
            SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                   SUM(CASE WHEN s.s_nationkey = tn.n_nationkey
                       THEN CAST(round(l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l_discount*100) AS BIGINT))
                       ELSE 0 END)::BIGINT AS rev_nation_e4,
                   SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT))
                       )::BIGINT AS rev_total_e4
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier s ON l_suppkey = s.s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer c ON o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            CROSS JOIN (SELECT n_nationkey FROM nation
                        WHERE n_name = '{MKT_SHARE_NATION}') tn
            WHERE p_type = '{MKT_SHARE_TYPE}'
              AND r_name = '{MKT_SHARE_REGION}'
            GROUP BY 1""",
        "part_supplier_census": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2, 3""",
        "blame_supplier": """
            WITH o AS (
              SELECT l_orderkey, max(l_shipdate) AS mx,
                     count(DISTINCT l_suppkey) AS nsupp
              FROM lineitem GROUP BY 1),
            w AS (
              SELECT l.l_orderkey, min(l.l_suppkey) AS supp,
                     count(DISTINCT l.l_suppkey) AS nmax
              FROM lineitem l
              JOIN o ON l.l_orderkey = o.l_orderkey
                    AND l.l_shipdate = o.mx
              GROUP BY 1)
            SELECT w.supp::BIGINT AS s_suppkey,
                   count(*)::BIGINT AS n_blamed
            FROM w JOIN o ON w.l_orderkey = o.l_orderkey
            WHERE o.nsupp >= 2 AND w.nmax = 1
            GROUP BY 1""",
        "user_running_total": """
            SELECT event_id, user_id,
                   SUM(CAST(round(value*10000) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS run_total_e4
            FROM events""",
        "event_islands": """
            WITH x AS (
              SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS grp
              FROM events)
            SELECT user_id, event_type, count(*)::BIGINT AS n_events,
                   CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                   CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
                   min(event_id)::BIGINT AS first_id
            FROM x GROUP BY user_id, event_type, grp""",
        "monthly_delta": f"""
            WITH m AS (
              SELECT event_type,
                     CAST(year(ts)*10000 + month(ts)*100 + day(ts)
                          AS BIGINT) AS ym,
                     SUM(CAST(round(value*10000) AS BIGINT))::BIGINT
                       AS sum_e4
              FROM events GROUP BY 1, 2)
            SELECT event_type, ym, sum_e4,
                   COALESCE(sum_e4 - LAG(sum_e4) OVER (
                              PARTITION BY event_type ORDER BY ym),
                            {PERIOD_DELTA_SENTINEL})::BIGINT AS delta_e4
            FROM m""",
        "forecast_revenue": f"""
            SELECT COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                     * CAST(round(l_discount*100) AS BIGINT)), 0)::BIGINT
                     AS revenue_e4,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{FORECAST_WINDOW[0]}'
              AND l_shipdate < TIMESTAMP '{FORECAST_WINDOW[1]}'
              AND CAST(round(l_discount*100) AS BIGINT)
                  BETWEEN {FORECAST_DISC[0]} AND {FORECAST_DISC[1]}
              AND l_quantity < {FORECAST_MAX_QTY}""",
        "first_touch": """
            WITH s AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s),
            s3 AS (
              SELECT event_id, user_id, session_id, event_type,
                     FIRST_VALUE(event_type) OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS first_touch
              FROM s2)
            SELECT event_id, user_id, session_id::BIGINT AS session_id,
                   first_touch
            FROM s3 WHERE event_type = 'purchase'""",
        "time_to_convert": """
            SELECT event_id, user_id,
                   COALESCE(CAST(epoch_us(
                       MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING
                                  AND UNBOUNDED FOLLOWING)) AS BIGINT)
                     - CAST(epoch_us(ts) AS BIGINT), -1) AS us_to_convert
            FROM events""",
        "user_trend": """
            WITH r AS (
              SELECT user_id,
                     CAST(round(value*10000) AS BIGINT) AS y,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS x
              FROM events)
            SELECT user_id, COUNT(*)::BIGINT AS n,
                   CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT)
                       AS slope_num,
                   CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT)
                       AS slope_den
            FROM r GROUP BY user_id HAVING COUNT(*) >= 2""",
        "user_gini": """
            WITH r AS (
              SELECT user_id,
                     CAST(round(value*10000) AS BIGINT) AS x,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY CAST(round(value*10000) AS BIGINT)) AS i
              FROM events)
            SELECT user_id, COUNT(*)::BIGINT AS n,
                   CAST(2*SUM(i*x) - (COUNT(*)+1)*SUM(x) AS BIGINT)
                       AS gini_num,
                   CAST(COUNT(*)*SUM(x) AS BIGINT) AS gini_den
            FROM r GROUP BY user_id""",
        "densify_days": """
            WITH d AS (SELECT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                             AS day
                       FROM events),
            b AS (SELECT user_id, min(day) AS mn, max(day) AS mx
                  FROM d GROUP BY user_id),
            spine AS (SELECT user_id,
                             unnest(generate_series(mn, mx)) AS day
                      FROM b),
            c AS (SELECT user_id, day, COUNT(*)::BIGINT AS cnt
                  FROM d GROUP BY 1, 2)
            SELECT s.user_id, s.day,
                   COALESCE(c.cnt, 0)::BIGINT AS n_events
            FROM spine s LEFT JOIN c USING (user_id, day)""",
        "bounce_rate": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            g AS (
              SELECT user_id, sid,
                     first(event_type ORDER BY ts, event_id)
                         AS first_touch,
                     COUNT(*) AS sz
              FROM s2 GROUP BY user_id, sid)
            SELECT first_touch, COUNT(*)::BIGINT AS n_sessions,
                   SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_bounces
            FROM g GROUP BY first_touch""",
        "benford_digits": """
            WITH x AS (SELECT event_type,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events
                       WHERE CAST(round(value*10000) AS BIGINT) > 0)
            SELECT event_type,
                   CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit,
                   COUNT(*)::BIGINT AS n
            FROM x GROUP BY 1, 2""",
        "ks_distance": """
            WITH x AS (SELECT CAST(round(value*10000) AS BIGINT) AS v,
                         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                             AS a,
                         CASE WHEN event_type = 'purchase' THEN 1
                              ELSE 0 END AS b
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            g AS (SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM x
                  GROUP BY v),
            c AS (SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
                         SUM(cb) OVER (ORDER BY v) AS cum_b FROM g),
            t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM x)
            SELECT CAST(MAX(ABS(cum_a*nb - cum_b*na)) AS BIGINT)
                       AS d_num,
                   CAST(MAX(na*nb) AS BIGINT) AS d_den,
                   CAST(MAX(na) AS BIGINT) AS n_a,
                   CAST(MAX(nb) AS BIGINT) AS n_b
            FROM c, t""",
        "mutual_links": _mutual_links_sql(),
        "weighted_median": """
            WITH x AS (SELECT l_returnflag,
                         CAST(round(l_extendedprice*100) AS BIGINT) AS p,
                         CAST(round(l_quantity) AS BIGINT) AS w
                       FROM lineitem),
            g AS (SELECT l_returnflag, p, SUM(w) AS w FROM x
                  GROUP BY l_returnflag, p),
            c AS (SELECT l_returnflag, p,
                         SUM(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY p) AS cw,
                         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
                  FROM g)
            SELECT l_returnflag, CAST(MIN(p) AS BIGINT) AS wmedian
            FROM c WHERE 2*cw >= tw GROUP BY l_returnflag""",
        "user_type_bitmask": """
            WITH b AS (SELECT user_id, CASE event_type
                         WHEN 'click' THEN 1 WHEN 'error' THEN 2
                         WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                         WHEN 'view' THEN 16 END AS bit
                       FROM events)
            SELECT user_id, CAST(SUM(DISTINCT bit) AS BIGINT)
                       AS type_mask,
                   COUNT(DISTINCT bit)::BIGINT AS n_types
            FROM b GROUP BY user_id""",
        "burst_count": """
            WITH e AS (SELECT event_id, user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
            p AS (SELECT a.event_id, a.user_id, count(*) AS n
                  FROM e a JOIN e b
                    ON a.user_id = b.user_id
                   AND (b.us > a.us
                        OR (b.us = a.us AND b.event_id > a.event_id))
                   AND b.us - a.us <= 3600000000
                  GROUP BY a.event_id, a.user_id)
            SELECT e.event_id, e.user_id,
                   COALESCE(p.n, 0)::BIGINT AS n_burst
            FROM e LEFT JOIN p USING (event_id, user_id)""",
        "trailing_sum": """
            WITH r AS (SELECT event_id, user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW) AS BIGINT)
                       AS trail_sum_e4
            FROM r""",
        "active_streak": """
            WITH d AS (SELECT DISTINCT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                             AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         day - ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS grp
                  FROM d),
            g AS (SELECT user_id, grp, COUNT(*) AS len FROM r
                  GROUP BY 1, 2)
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
                   CAST(SUM(len) AS BIGINT) AS n_active_days
            FROM g GROUP BY user_id""",
        "state_duration": """
            WITH s AS (SELECT user_id, event_type,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT user_id, event_type,
                   CAST(SUM(nxt - us) AS BIGINT) AS dur_us,
                   COUNT(*)::BIGINT AS n_holds
            FROM s WHERE nxt IS NOT NULL
            GROUP BY user_id, event_type""",
        "time_profile": """
            WITH x AS (SELECT
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7
                     AS dow,
                 (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24
                     AS hod,
                 CAST(round(value*10000) AS BIGINT) AS v
               FROM events)
            SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT)
                       AS hod,
                   COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY dow, hod""",
        "rfm_scores": """
            WITH a AS (SELECT user_id,
                 CAST((SELECT max(CAST(epoch_us(ts) AS BIGINT))
                           // 86400000000 FROM events)
                      - max(CAST(epoch_us(ts) AS BIGINT))
                           // 86400000000 AS BIGINT) AS rec_days,
                 COUNT(*)::BIGINT AS freq,
                 CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT)
                     AS mon_e4
               FROM events GROUP BY user_id),
            n AS (SELECT COUNT(*)::BIGINT AS nu FROM a)
            SELECT user_id, rec_days, freq, mon_e4,
                   CAST((ROW_NUMBER() OVER (ORDER BY rec_days, user_id)
                         - 1) * 5 // nu AS BIGINT) AS r_q,
                   CAST((ROW_NUMBER() OVER (ORDER BY freq, user_id)
                         - 1) * 5 // nu AS BIGINT) AS f_q,
                   CAST((ROW_NUMBER() OVER (ORDER BY mon_e4, user_id)
                         - 1) * 5 // nu AS BIGINT) AS m_q
            FROM a, n""",
        "spike_days": """
            WITH d AS (SELECT CAST(epoch_us(ts) AS BIGINT)
                           // 86400000000 AS day,
                         COUNT(*)::BIGINT AS n
                       FROM events GROUP BY day),
            w AS (SELECT day, n,
                    COALESCE(SUM(n) OVER (ORDER BY day
                      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)
                        AS trail7
                  FROM d)
            SELECT CAST(day AS BIGINT) AS day, n AS n_events,
                   CAST(trail7 AS BIGINT) AS trail7,
                   (CASE WHEN trail7 > 0 AND n*7 > 2*trail7
                         THEN 1 ELSE 0 END)::BIGINT AS is_spike
            FROM w""",
        "source_share": """
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot_docs,
                   CAST(SUM(SUM(n_chars)) OVER () AS BIGINT)
                       AS tot_chars
            FROM documents GROUP BY source""",
        "peak_day": """
            WITH d AS (SELECT user_id,
                         CAST(epoch_us(ts) AS BIGINT) // 86400000000
                             AS day,
                         COUNT(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, day, n,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, day) AS rn,
                    SUM(n) OVER (PARTITION BY user_id) AS tot
                  FROM d)
            SELECT user_id, CAST(day AS BIGINT) AS top_day,
                   n AS n_top, CAST(tot AS BIGINT) AS n_total
            FROM r WHERE rn = 1""",
        "systematic_sample": """
            WITH r AS (SELECT event_id,
                         ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1
                             AS rank0
                       FROM events)
            SELECT event_id, CAST(rank0 AS BIGINT) AS rank0
            FROM r WHERE rank0 % 100 = 0""",
        "adoption_lag": """
            WITH m AS (SELECT user_id, event_type,
                         min(CAST(epoch_us(ts) AS BIGINT)) AS mt
                       FROM events GROUP BY 1, 2),
            u AS (SELECT user_id, min(mt) AS m0 FROM m
                  GROUP BY user_id)
            SELECT m.user_id, m.event_type,
                   CAST(mt - m0 AS BIGINT) AS lag_us
            FROM m JOIN u USING (user_id)""",
        "session_pairs": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            it AS (SELECT user_id, sid, CASE event_type
                     WHEN 'click' THEN 0 WHEN 'error' THEN 1
                     WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                     WHEN 'view' THEN 4 END AS item
                   FROM s2),
            d AS (SELECT DISTINCT user_id, sid, item FROM it)
            SELECT a.item AS item_a, b.item AS item_b,
                   COUNT(*)::BIGINT AS n_baskets
            FROM d a JOIN d b ON a.user_id = b.user_id
                             AND a.sid = b.sid AND a.item < b.item
            GROUP BY 1, 2""",
        "type_jaccard": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            p AS (SELECT a.event_type AS ta, b.event_type AS tb
                  FROM d a JOIN d b USING (user_id)
                  WHERE a.event_type < b.event_type),
            i AS (SELECT ta, tb, COUNT(*)::BIGINT AS n_inter
                  FROM p GROUP BY 1, 2),
            c AS (SELECT event_type, COUNT(DISTINCT user_id) AS nu
                  FROM events GROUP BY 1)
            SELECT i.ta AS type_a, i.tb AS type_b, n_inter,
                   CAST(ca.nu + cb.nu - n_inter AS BIGINT) AS n_union
            FROM i JOIN c ca ON ca.event_type = i.ta
                   JOIN c cb ON cb.event_type = i.tb""",
        "early_ltv": """
            WITH w AS (SELECT user_id,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         CAST(round(value*10000) AS BIGINT) AS v,
                         min(CAST(epoch_us(ts) AS BIGINT))
                             OVER (PARTITION BY user_id) AS m0
                       FROM events)
            SELECT user_id,
                   CAST(SUM(CASE WHEN us - m0 < 604800000000
                                 THEN v ELSE 0 END) AS BIGINT)
                       AS week1_value_e4,
                   CAST(SUM(CASE WHEN us - m0 < 604800000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS week1_events,
                   CAST(SUM(v) AS BIGINT) AS total_value_e4
            FROM w GROUP BY user_id""",
        "max_gap_at": """
            WITH s AS (SELECT user_id, event_id, ts,
                         LAG(event_id) OVER w AS prev_id,
                         CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(LAG(ts) OVER w) AS BIGINT)
                             AS gap
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            r AS (SELECT user_id, gap, prev_id, event_id,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY gap DESC, ts, event_id) AS rn
                  FROM s WHERE gap IS NOT NULL)
            SELECT user_id, CAST(gap AS BIGINT) AS max_gap_us,
                   CAST(prev_id AS BIGINT) AS gap_start_id,
                   event_id AS gap_end_id
            FROM r WHERE rn = 1""",
        "ship_delay": """
            WITH d AS (SELECT o_orderpriority,
                         CAST(epoch_us(l_shipdate) AS BIGINT)
                             // 86400000000
                         - CAST(epoch_us(o_orderdate) AS BIGINT)
                             // 86400000000 AS d
                       FROM lineitem JOIN orders
                         ON l_orderkey = o_orderkey)
            SELECT o_orderpriority, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(d) AS BIGINT) AS sum_delay_days,
                   CAST(MIN(d) AS BIGINT) AS min_delay_days,
                   CAST(MAX(d) AS BIGINT) AS max_delay_days
            FROM d GROUP BY o_orderpriority""",
        "first_session_size": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s)
            SELECT user_id,
                   CAST(SUM(CASE WHEN sid = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s0_events,
                   CAST(MAX(sid) + 1 AS BIGINT) AS n_sessions,
                   COUNT(*)::BIGINT AS n_events
            FROM s2 GROUP BY user_id""",
        "concurrency_curve": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            b AS (SELECT user_id, sid,
                    min(CAST(epoch_us(ts) AS BIGINT)) AS st,
                    max(CAST(epoch_us(ts) AS BIGINT)) AS en
                  FROM s2 GROUP BY 1, 2),
            t AS (SELECT st AS t_us, 1 AS s, 0 AS e FROM b
                  UNION ALL SELECT en, 0, 1 FROM b),
            g AS (SELECT t_us, SUM(s) AS n_start, SUM(e) AS n_end
                  FROM t GROUP BY t_us),
            c AS (SELECT t_us, n_start, n_end,
                    SUM(n_start) OVER (ORDER BY t_us) AS cs,
                    SUM(n_end) OVER (ORDER BY t_us) AS ce FROM g)
            SELECT CAST(t_us AS BIGINT) AS t_us,
                   CAST(n_start AS BIGINT) AS n_start,
                   CAST(n_end AS BIGINT) AS n_end,
                   CAST(cs - ce AS BIGINT) AS n_open
            FROM c""",
        "embedding_norms": """
            SELECT CAST(label AS BIGINT) AS label,
                   COUNT(*)::BIGINT AS n_vecs,
                   CAST(SUM(list_sum(list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE)*1000)
                                 AS BIGINT)
                            * CAST(round(CAST(x AS DOUBLE)*1000)
                                   AS BIGINT))))
                       AS BIGINT) AS sum_sq_e6
            FROM embeddings GROUP BY label""",
        "transition_probs": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events),
            p AS (SELECT event_type AS prev_type,
                    LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, COUNT(*)::BIGINT AS n
                  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, n,
                   CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
                       AS n_prev
            FROM c""",
        "island_lengths": """
            WITH s AS (SELECT user_id, event_type, ts, event_id,
                         CASE WHEN event_type = LAG(event_type) OVER w
                              THEN 0 ELSE 1 END AS brk
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            r AS (SELECT user_id, event_type,
                    SUM(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
                  FROM s),
            g AS (SELECT user_id, event_type, rid, COUNT(*) AS len
                  FROM r GROUP BY 1, 2, 3)
            SELECT event_type, CAST(len AS BIGINT) AS run_len,
                   COUNT(*)::BIGINT AS n_runs
            FROM g GROUP BY 1, 2""",
        "taste_shift": """
            WITH m AS (SELECT (min(CAST(epoch_us(ts) AS BIGINT)
                                   // 86400000000)
                               + max(CAST(epoch_us(ts) AS BIGINT)
                                     // 86400000000) + 1) // 2 AS mid
                       FROM events),
            b AS (SELECT user_id, event_type,
                    CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                              // 86400000000 < (SELECT mid FROM m)
                         THEN 0 ELSE 1 END AS half
                  FROM events),
            c AS (SELECT user_id, half, event_type, COUNT(*) AS n
                  FROM b GROUP BY 1, 2, 3),
            r AS (SELECT user_id, half, event_type,
                    ROW_NUMBER() OVER (PARTITION BY user_id, half
                        ORDER BY n DESC, event_type) AS rn
                  FROM c)
            SELECT a.user_id, a.event_type AS top_first,
                   z.event_type AS top_second
            FROM r a JOIN r z ON a.user_id = z.user_id
            WHERE a.rn = 1 AND z.rn = 1 AND a.half = 0
              AND z.half = 1""",
        "momentum_score": """
            WITH v AS (SELECT user_id, ts, event_id,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events),
            d AS (SELECT user_id, ts, event_id,
                    v - LAG(v) OVER w AS dv
                  FROM v WINDOW w AS (PARTITION BY user_id
                                      ORDER BY ts, event_id)),
            p AS (SELECT user_id,
                    sign(dv) * sign(LAG(dv) OVER (
                        PARTITION BY user_id
                        ORDER BY ts, event_id)) AS prod
                  FROM d)
            SELECT user_id,
                   CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_agree,
                   CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_flip
            FROM p WHERE prod IS NOT NULL GROUP BY user_id""",
        "session_handoff": """
            WITH d AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT *, SUM(new_s) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
                  FROM d),
            fl AS (SELECT DISTINCT user_id, sid,
                     FIRST_VALUE(event_type) OVER w2 AS f,
                     LAST_VALUE(event_type) OVER (
                         PARTITION BY user_id, sid ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS l
                   FROM s
                   WINDOW w2 AS (PARTITION BY user_id, sid
                                 ORDER BY ts, event_id)),
            p AS (SELECT f AS next_first,
                    LAG(l) OVER (PARTITION BY user_id ORDER BY sid)
                        AS prev_last
                  FROM fl)
            SELECT prev_last, next_first, COUNT(*)::BIGINT AS n
            FROM p WHERE prev_last IS NOT NULL
            GROUP BY prev_last, next_first""",
        "new_vs_returning": """
            WITH ud AS (SELECT DISTINCT user_id,
                          CAST(epoch_us(ts) AS BIGINT) // 86400000000
                              AS day
                        FROM events),
            f AS (SELECT user_id, min(day) AS fd FROM ud
                  GROUP BY user_id)
            SELECT day, COUNT(*)::BIGINT AS n_active,
                   CAST(SUM(CASE WHEN day = fd THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(SUM(CASE WHEN day > fd THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_returning
            FROM ud JOIN f USING (user_id) GROUP BY day""",
        "extract_toc": _extract_toc_sql(),
        "norm_hist": """
            WITH n AS (SELECT
                CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                         * CAST(round(CAST(x AS DOUBLE)*1000)
                                AS BIGINT))) AS BIGINT) AS ss
              FROM embeddings)
            SELECT CAST(ss // 1000000 AS BIGINT) AS norm_bucket,
                   COUNT(*)::BIGINT AS n_vecs
            FROM n GROUP BY ss // 1000000""",
        "ab_split_metrics": """
            WITH x AS (SELECT
                 CAST(md5_number_upper(user_id::VARCHAR) % 2
                      AS BIGINT) AS arm,
                 event_type,
                 CAST(round(value * 10000) AS BIGINT) AS v
               FROM events)
            SELECT arm, event_type, COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY arm, event_type""",
        "order_status_matrix": """
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*)::BIGINT AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_price_e2
            FROM orders GROUP BY o_orderstatus, o_orderpriority""",
        "bookend_types": """
            WITH s AS (SELECT user_id, event_type,
                         row_number() OVER w AS rn,
                         count(*) OVER (PARTITION BY user_id) AS c
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            b AS (SELECT f.user_id, f.event_type AS first_type,
                         l.event_type AS last_type
                  FROM s f JOIN s l ON f.user_id = l.user_id
                  WHERE f.rn = 1 AND l.rn = l.c)
            SELECT first_type, last_type, COUNT(*)::BIGINT AS n_users
            FROM b GROUP BY first_type, last_type""",
        "type_dow_profile": """
            WITH x AS (SELECT event_type,
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7
                     AS dow,
                 CAST(round(value * 10000) AS BIGINT) AS v
               FROM events)
            SELECT event_type, CAST(dow AS BIGINT) AS dow,
                   COUNT(*)::BIGINT AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_value_e4
            FROM x GROUP BY event_type, dow""",
        "brand_return_rate": """
            WITH l AS (SELECT l_partkey,
                         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                             AS ret,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100)
                                       AS BIGINT)) AS rev
                       FROM lineitem)
            SELECT p_brand, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(ret) AS BIGINT) AS n_returned,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4,
                   CAST(SUM(ret * rev) AS BIGINT)
                       AS returned_revenue_e4
            FROM l JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand""",
        "user_activity_hist": """
            WITH u AS (SELECT user_id, count(*)::BIGINT AS n_events
                       FROM events GROUP BY user_id)
            SELECT n_events, COUNT(*)::BIGINT AS n_users
            FROM u GROUP BY n_events""",
        "idle_users": """
            WITH m AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)
                               // 86400000000) AS mx FROM events),
            u AS (SELECT user_id,
                    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                        AS last_day
                  FROM events GROUP BY user_id)
            SELECT user_id, CAST(last_day AS BIGINT) AS last_day,
                   CAST(mx - last_day AS BIGINT) AS idle_days
            FROM u, m""",
        "type_trigrams": """
            WITH s AS (SELECT user_id, event_type,
                         LAG(event_type, 2) OVER w AS a,
                         LAG(event_type, 1) OVER w AS b
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT a AS t1, b AS t2, event_type AS t3,
                   COUNT(*)::BIGINT AS n
            FROM s WHERE a IS NOT NULL GROUP BY a, b, event_type""",
        "type_cadence": """
            WITH g AS (SELECT event_type,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id, event_type
                             ORDER BY ts) AS gap
                       FROM events)
            SELECT event_type, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY event_type""",
        "entry_conversion": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
            s3 AS (
              SELECT user_id, sid, event_type,
                     FIRST_VALUE(event_type) OVER (
                         PARTITION BY user_id, sid
                         ORDER BY ts, event_id) AS ft
              FROM s2),
            sess AS (
              SELECT user_id, sid, min(ft) AS first_touch,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS conv
              FROM s3 GROUP BY user_id, sid)
            SELECT first_touch, COUNT(*)::BIGINT AS n_sessions,
                   CAST(SUM(conv) AS BIGINT) AS n_converting
            FROM sess GROUP BY first_touch""",
        "source_top_tokens": """
            WITH c AS (SELECT source, t AS token, COUNT(*)::BIGINT
                           AS cnt
                       FROM (SELECT source,
                               unnest(string_split(text, ' ')) AS t
                             FROM documents)
                       GROUP BY source, t)
            SELECT source, token, cnt FROM c
            QUALIFY row_number() OVER (PARTITION BY source
                ORDER BY cnt DESC, token) <= 5""",
        "token_length_hist": """
            SELECT CAST(length(t) AS BIGINT) AS token_len,
                   COUNT(*)::BIGINT AS n_tokens
            FROM (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents)
            WHERE length(t) >= 1
            GROUP BY length(t)""",
        "gap_hist": """
            WITH g AS (SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts) AS gap
                       FROM events)
            SELECT CAST(gap // 3600000000 AS BIGINT) AS gap_hours,
                   COUNT(*)::BIGINT AS n_gaps
            FROM g WHERE gap IS NOT NULL
            GROUP BY gap // 3600000000""",
        "dedup_keep_best": """
            SELECT md5(text) AS fingerprint,
                   doc_id AS keep_doc_id,
                   CAST(length(text) AS BIGINT) AS keep_chars,
                   CAST(count(*) OVER (PARTITION BY md5(text))
                        AS BIGINT) AS n_dups
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(text)
                ORDER BY length(text) DESC, doc_id) = 1""",
        "dup_size_hist": """
            WITH c AS (SELECT md5(text) AS fp, count(*)::BIGINT
                           AS cluster_size
                       FROM documents GROUP BY md5(text))
            SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
            FROM c GROUP BY cluster_size""",
        "char_census": """
            SELECT CAST(ord(ch) AS BIGINT) AS byte,
                   COUNT(*)::BIGINT AS n_chars
            FROM (SELECT unnest(string_split(text, '')) AS ch
                  FROM documents)
            GROUP BY ord(ch)""",
        "touches_to_convert": """
            WITH s AS (SELECT user_id, event_type,
                         row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn
                       FROM events)
            SELECT user_id, CAST(min(rn) - 1 AS BIGINT) AS n_touches
            FROM s WHERE event_type = 'purchase' GROUP BY user_id""",
        "order_size_hist": """
            WITH o AS (SELECT l_orderkey, count(*)::BIGINT AS n_lines
                       FROM lineitem GROUP BY l_orderkey)
            SELECT n_lines, COUNT(*)::BIGINT AS n_orders
            FROM o GROUP BY n_lines""",
        "discount_profile": """
            WITH b AS (SELECT
                CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
                CAST(round(l_quantity) AS BIGINT) AS qty,
                CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
              FROM lineitem)
            SELECT disc_pct, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(qty) AS BIGINT) AS sum_qty,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4
            FROM b GROUP BY disc_pct""",
        "running_peak": """
            WITH v AS (SELECT event_id, user_id, ts,
                         CAST(round(value * 10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   CAST(MAX(v) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_e4,
                   (CASE WHEN v > COALESCE(MAX(v) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1)
                         THEN 1 ELSE 0 END)::BIGINT AS is_record
            FROM v""",
        "priority_median": """
            SELECT o_orderpriority,
                   CAST(round(median(o_totalprice) * 1000) AS BIGINT)
                     AS median_price_e3
            FROM orders GROUP BY o_orderpriority""",
        "type_corr_parts": """
            WITH p AS (SELECT user_id, event_type,
                         CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                              AS BIGINT) AS s
                       FROM events GROUP BY user_id, event_type)
            SELECT a.event_type AS type_i, b.event_type AS type_j,
                   CAST(SUM(a.s * b.s) AS BIGINT) AS sum_xy_e8
            FROM p a JOIN p b
              ON a.user_id = b.user_id
             AND a.event_type <= b.event_type
            GROUP BY a.event_type, b.event_type""",
        "dim_gram": """
            WITH u AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                * 1000) AS BIGINT) AS q
              FROM embeddings)
            SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
                   CAST(SUM(a.q * b.q) AS BIGINT) AS sum_prod_e6
            FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i""",
        "brand_price_quartiles": """
            WITH r AS (SELECT p_brand, p_retailprice,
                         row_number() OVER (
                             PARTITION BY p_brand
                             ORDER BY p_retailprice, p_partkey) AS rn,
                         count(*) OVER (PARTITION BY p_brand) AS c
                       FROM part)
            SELECT p_brand,
                   max(CASE WHEN rn - 1 = 1 * (c - 1) // 4
                            THEN p_retailprice END) AS q1,
                   max(CASE WHEN rn - 1 = 2 * (c - 1) // 4
                            THEN p_retailprice END) AS q2,
                   max(CASE WHEN rn - 1 = 3 * (c - 1) // 4
                            THEN p_retailprice END) AS q3
            FROM r GROUP BY p_brand""",
        "bracket_revenue": """
            WITH j AS (SELECT CASE
                WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 1 AND 15 THEN 1
                WHEN p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                     AND l_quantity BETWEEN 10 AND 25 THEN 2
                WHEN p_brand = 'Brand#3' AND p_size BETWEEN 25 AND 50
                     AND l_quantity BETWEEN 20 AND 35 THEN 3
                ELSE 0 END AS bracket,
                CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT bracket, COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(rev) AS BIGINT) AS revenue_e4
            FROM j WHERE bracket > 0 GROUP BY bracket""",
        "last_touch": """
            WITH s AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                               - CAST(epoch_us(LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            s2 AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s),
            s3 AS (
              SELECT event_id, user_id, session_id, event_type,
                     COALESCE(LAG(event_type) OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id), '(direct)') AS last_touch
              FROM s2)
            SELECT event_id, user_id, session_id::BIGINT AS session_id,
                   last_touch
            FROM s3 WHERE event_type = 'purchase'""",
        "purchase_gaps": """
            WITH g AS (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id ORDER BY ts) AS gap
                       FROM events WHERE event_type = 'purchase')
            SELECT user_id, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY user_id""",
        "customer_order_gaps": """
            WITH g AS (SELECT o_custkey,
                         epoch_us(o_orderdate)
                         - lag(epoch_us(o_orderdate)) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate) AS gap
                       FROM orders)
            SELECT o_custkey, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_us,
                   max(gap)::BIGINT AS max_gap_us,
                   sum(gap)::BIGINT AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY o_custkey""",
        "length_histogram": """
            WITH b AS (SELECT n_chars,
                         CAST(length(bin(n_chars)) - 1 AS BIGINT)
                             AS bucket
                       FROM documents WHERE n_chars >= 1)
            SELECT bucket, COUNT(*)::BIGINT AS n_docs,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
            FROM b GROUP BY bucket""",
        "dim_stats": """
            WITH u AS (
              SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                * 1000) AS BIGINT) AS q
              FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim, COUNT(*)::BIGINT AS n,
                   MIN(q) AS min_e3, MAX(q) AS max_e3,
                   CAST(SUM(q) AS BIGINT) AS sum_e3
            FROM u GROUP BY dim""",
        "kwic_first": """
            WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                         CAST(position('merge' IN text) AS BIGINT) AS pos
                       FROM documents)
            SELECT doc_id, pos,
                   substr(text,
                          CAST(greatest(1, pos - 24) AS BIGINT),
                          CAST(pos - greatest(1, pos - 24) AS BIGINT))
                       AS left_ctx,
                   substr(text, pos + 5, 24) AS right_ctx
            FROM p WHERE pos > 0""",
        "value_cume": """
            WITH r AS (SELECT event_id, user_id,
                         CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cd_num,
                   COUNT(*) OVER (PARTITION BY user_id) AS cd_den
            FROM r""",
        "running_distinct": """
            WITH f AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN row_number() OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) = 1
                          THEN 1 ELSE 0 END AS is_first
              FROM events)
            SELECT event_id, user_id,
                   SUM(is_first) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS n_distinct
            FROM f""",
        "event_lag": """
            WITH v AS (SELECT event_id, user_id, ts,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   COALESCE(LAG(event_id) OVER w, -1)::BIGINT AS prev_id,
                   COALESCE(CAST(epoch_us(ts) AS BIGINT)
                            - CAST(epoch_us(LAG(ts) OVER w) AS BIGINT),
                            -1)::BIGINT AS dt_us,
                   COALESCE(v - LAG(v) OVER w, 0)::BIGINT AS dv
            FROM v WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)""",
        "important_parts": """
            WITH pp AS (
              SELECT l_partkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         )::BIGINT AS sum_cents
              FROM lineitem GROUP BY 1),
            tot AS (SELECT SUM(sum_cents) AS t, count(*) AS n FROM pp)
            SELECT l_partkey, sum_cents
            FROM pp, tot WHERE sum_cents * 5 * n > 6 * t""",
        "dense_topk": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value) AS BIGINT) AS value_e0
                       FROM events)
            SELECT event_id, event_type, value_e0,
                   DENSE_RANK() OVER (PARTITION BY event_type
                                      ORDER BY value_e0 DESC)::BIGINT
                     AS rank
            FROM v QUALIFY rank <= 3""",
        "value_centered": """
            WITH v AS (SELECT event_id, user_id,
                              CAST(round(value*10000) AS BIGINT) AS v
                       FROM events)
            SELECT event_id, user_id,
                   (count(*) OVER w)::BIGINT AS n_key,
                   (v * count(*) OVER w - sum(v) OVER w)::BIGINT AS dev_n
            FROM v WINDOW w AS (PARTITION BY user_id)""",
        "zorder_layout": f"""
            SELECT event_id, {_zorder_sql} AS zkey
            FROM events""",
        # RFC 9309 longest-match per synthesized host rules: src0 all
        # blocked; src1 '/1' prefix blocked unless '/12' (Allow longer);
        # src2 anchored '*7$'; other hosts allowed
        "robots_gate": """
            SELECT 'doc://' || source || '/' || doc_id AS url,
                   doc_id
            FROM documents
            WHERE NOT (source = 'src0'
                   OR (source = 'src1'
                       AND doc_id::VARCHAR LIKE '1%'
                       AND doc_id::VARCHAR NOT LIKE '12%')
                   OR (source = 'src2'
                       AND doc_id::VARCHAR LIKE '%7'))""",
        "incremental_dedup": """
            WITH a AS (
              SELECT md5(text) AS fp FROM documents WHERE doc_id % 4 <= 1),
            b AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 4 >= 1
              UNION ALL
              SELECT doc_id + 100000000, text FROM documents
              WHERE doc_id % 4 = 2)
            SELECT min(doc_id)::BIGINT AS doc_id,
                   md5(text) AS fingerprint,
                   count(*)::BIGINT AS n_dups
            FROM b WHERE md5(text) NOT IN (SELECT fp FROM a)
            GROUP BY md5(text)""",
        # exact all-pairs char-shingle Jaccard (integer n_inter/n_union —
        # no float hashing); the size prefilter (J>=t => min >= t*max) only
        # drops provably-below-threshold pairs. LSH recall at the threshold
        # is 1.0 on this corpus (see MINHASH note).
        "minhash_dups": f"""
            WITH {_MINHASH_CTES}
            SELECT id_a, id_b, n_inter, n_union FROM sim
            WHERE {_MINHASH_COND}""",
        # same exact pair set, clustered: WITH RECURSIVE reachability walk
        # (c reachable from u) -> component = min reachable id
        "neardup_clusters": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            pairs AS (
              SELECT id_a, id_b FROM sim WHERE {_MINHASH_COND}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            walk(u, c) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, w.c FROM edges e JOIN walk w ON e.v = w.u)
            SELECT CAST(u AS BIGINT) AS doc_id,
                   CAST(min(c) AS BIGINT) AS component
            FROM walk GROUP BY u""",
        "top_user_per_type": """
            WITH c AS (SELECT event_type, user_id,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2)
            SELECT event_type, user_id, n FROM c
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY n DESC, user_id) = 1""",
        "user_rolling_7d": """
            WITH d AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2)
            SELECT user_id, day, n,
                   CAST(sum(n) OVER (PARTITION BY user_id ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_7d
            FROM d""",
        "shipping_priority": """
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_e4
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = 'BUILDING'))
            GROUP BY l_orderkey
            ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""",
        "cohort_retention": """
            WITH e AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS day
              FROM events),
            f AS (
              SELECT user_id, min(day) AS cohort_day FROM e
              GROUP BY user_id)
            SELECT f.cohort_day,
                   (e.day - f.cohort_day)::BIGINT AS day_offset,
                   count(DISTINCT e.user_id)::BIGINT AS n_users
            FROM e JOIN f USING (user_id)
            GROUP BY 1, 2""",
        "length_rank": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars,
                   (row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars, doc_id))::BIGINT AS rank
            FROM documents""",
        "pack_offsets": """
            SELECT doc_id, n_chars::BIGINT AS n_chars,
                   start_off,
                   (start_off // 1024)::BIGINT AS first_example,
                   (CASE WHEN n_chars > 0
                         THEN (start_off + n_chars - 1) // 1024
                         ELSE start_off // 1024 END)::BIGINT
                     AS last_example
            FROM (SELECT doc_id, n_chars,
                         (sum(n_chars::BIGINT) OVER (ORDER BY doc_id)
                          - n_chars)::BIGINT AS start_off
                  FROM documents)""",
        "shuffle_assign": """
            SELECT doc_id, n_chars::BIGINT AS n_chars,
                   (md5_number_upper(doc_id::VARCHAR) % 16)::BIGINT
                     AS shard,
                   (row_number() OVER (
                      PARTITION BY md5_number_upper(doc_id::VARCHAR) % 16
                      ORDER BY md5_number_upper(doc_id::VARCHAR) >> 1,
                               doc_id) - 1)::BIGINT AS pos
            FROM documents""",
        "negative_pairs": _negative_pairs_sql(),
        # integer PMI ingredients only — the float log is the caller's
        "collocations": """
            WITH toks AS (
              SELECT list_filter(
                       regexp_split_to_array(text, '[ \t\r\n\f\v]+'),
                       t -> t <> '') AS a
              FROM documents),
            uni AS (SELECT unnest(a) AS w FROM toks),
            ucnt AS (SELECT w, count(*)::BIGINT AS n FROM uni GROUP BY w),
            big AS (
              SELECT unnest([a[i] || ' ' || a[i+1]
                             for i in range(1, len(a))]) AS bg
              FROM toks),
            bcnt AS (SELECT bg, count(*)::BIGINT AS n_pair
                     FROM big GROUP BY bg),
            top AS (SELECT bg, n_pair FROM bcnt
                    ORDER BY n_pair DESC, bg LIMIT 20)
            SELECT split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2, n_pair,
                   u1.n AS n_w1, u2.n AS n_w2,
                   (SELECT count(*)::BIGINT FROM uni) AS n_total
            FROM top
            JOIN ucnt u1 ON u1.w = split_part(bg, ' ', 1)
            JOIN ucnt u2 ON u2.w = split_part(bg, ' ', 2)""",
        # the integer-exact iterative tier: unrolled-CTE twins (the
        # pagerank discipline applied to clustering — see _kmeans_sql)
        "kmeans_assign": _kmeans_sql(n_iter=5, k=8, scale=1000),
        "semantic_dedup": _semantic_dedup_sql(n_iter=5, k=8, scale=1000,
                                              p=361, q=400),
        # scaled-int sums: CAST to DOUBLE before the multiply so both
        # sides compute floor over the same float64 product
        "embedding_centroids": """
            SELECT label::BIGINT AS label, dim,
                   CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS BIGINT) AS sum_scaled,
                   count(*)::BIGINT AS n_vecs
            FROM (SELECT label, unnest(embedding) AS v,
                         (generate_subscripts(embedding, 1) - 1)::BIGINT
                           AS dim
                  FROM embeddings)
            GROUP BY 1, 2""",
        # the synthetic signal is an integer function of (doc_id, i) so
        # the decoded sample features are SQL-recomputable exactly
        "audio_features": """
            SELECT doc_id AS id,
                   (8000 + (doc_id % 4) * 4000)::BIGINT AS sample_rate,
                   1::BIGINT AS channels,
                   16::BIGINT AS bits_per_sample,
                   n_chars::BIGINT AS n_samples,
                   (n_chars::BIGINT * 1000000)
                     // (8000 + (doc_id % 4) * 4000) AS duration_us,
                   COALESCE(CAST(list_sum(
                     [((i*7+doc_id)%65536-32768)*((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars)]) AS BIGINT), 0) AS sum_sq,
                   COALESCE(CAST(list_max(
                     [abs((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars)]) AS BIGINT), 0) AS peak
            FROM documents""",
        # decimate-by-2: the surviving samples are the even indices of
        # the same synth formula; rate halves, count = ceil(n/2)
        "audio_resample": """
            SELECT doc_id AS id,
                   ((8000 + (doc_id % 4) * 4000) // 2)::BIGINT
                     AS sample_rate,
                   ((n_chars + 1) // 2)::BIGINT AS n_samples,
                   (((n_chars + 1) // 2)::BIGINT * 1000000)
                     // ((8000 + (doc_id % 4) * 4000) // 2) AS duration_us,
                   COALESCE(CAST(list_sum(
                     [((i*7+doc_id)%65536-32768)*((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars, 2)]) AS BIGINT), 0)
                     AS sum_sq,
                   COALESCE(CAST(list_max(
                     [abs((i*7+doc_id)%65536-32768)
                      for i in range(0, n_chars, 2)]) AS BIGINT), 0)
                     AS peak
            FROM documents""",
        # halved hash (>>1) keeps UBIGINT int64-safe; >>1 is monotonic so
        # the quota membership is identical on both sides
        "stratified_sample": """
            SELECT doc_id, lang, n_chars::BIGINT AS n_chars FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY md5_number_upper(doc_id::VARCHAR) >> 1, doc_id)
              <= 30""",
        # fixed 10-token windows; list-comprehension chunking mirrors the
        # engine's offsets-based chunk grouping exactly
        "dup_spans": _dup_spans_sql(),
        "span_dedup": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\r\n\f\v]+') AS w
              FROM documents),
            chunks AS (
              SELECT doc_id, generate_subscripts(cl, 1) - 1 AS span_idx,
                     unnest(cl) AS span
              FROM (SELECT doc_id,
                           [array_to_string(w[(i-1)*10+1 : i*10], ' ')
                            for i in range(1, (len(w)+9)//10 + 1)] AS cl
                    FROM toks)),
            keep AS (
              SELECT doc_id, span_idx, span FROM chunks
              QUALIFY row_number() OVER (PARTITION BY span
                                         ORDER BY doc_id, span_idx) = 1)
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS text,
                   count(*)::BIGINT AS n_spans
            FROM keep GROUP BY doc_id""",
        "neardup_keep_one": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            pairs AS (
              SELECT id_a, id_b FROM sim WHERE {_MINHASH_COND}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            walk(u, c) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, w.c FROM edges e JOIN walk w ON e.v = w.u),
            assign AS (
              SELECT u AS doc_id, min(c) AS component FROM walk GROUP BY u)
            SELECT d.doc_id, d.lang, d.n_chars::BIGINT AS n_chars
            FROM documents d
            WHERE d.doc_id NOT IN
              (SELECT doc_id FROM assign WHERE doc_id != component)""",
        "pagerank": _pagerank_sql(),
        "trustrank": _trustrank_sql(),
        "hits": _hits_sql(),
        "triangles": _triangles_sql(),
        "local_clustering": _local_clustering_sql(),
        "kcore": _kcore_sql(),
        "communities": _communities_sql(),
        "crawl_depth": _crawl_depth_sql(),
        "shared_chunks": _shared_chunks_sql(),
        "template_chunks": _template_chunks_sql(),
        "strip_boilerplate": _strip_boilerplate_sql(),
        "graph_walks": _graph_walks_sql(),
        "cocitation": _cocitation_sql(),
        "extract_links": _extract_links_sql(),
        "extract_tables": _extract_tables_sql(),
        "extract_jsonld": _extract_jsonld_sql(),
        "anchor_text": _anchor_text_sql(),
        "crawl_frontier": _crawl_frontier_sql(),
        "link_pagerank": _link_pagerank_sql(),
        "bm25_topk": _bm25_sql(),
        "url_dedup": _url_dedup_sql(),
        "contamination_scan": _contamination_sql(),
        "mixture_sample": _mixture_sql(),
        "lm_score": _lm_score_sql(),
        "meta_extract": _meta_extract_sql(),
        "ngram_decontaminate": _ngram_decontaminate_sql(),
        # word-trigram variant of the exact all-pairs Jaccard oracle
        "ppjoin_dups": _ppjoin_dups_sql(),
        "jaccard_knn": _jaccard_knn_sql(),
        "editdist_dups": _editdist_sql(),
        "editdist2_dups": _editdist2_sql(),
        "dup_owner": _dup_owner_sql(),
        "postings_compress": _postings_compress_sql(),
        "containment_dups": _containment_sql(),
        "gram_novelty": _gram_novelty_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "weighted_sample": _weighted_sample_sql(),
        "doc_keywords": _doc_keywords_sql(),
        "collapse_repeats": _collapse_repeats_sql(),
        "curate_corpus": _curate_corpus_sql(),
        "rollup_stats": _rollup_stats_sql(),
        "cube_stats": _cube_stats_sql(),
        "strip_repeated": _strip_repeated_sql(),
        "canonical_resolve": _canonical_resolve_sql(),
        "ngram_dups": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\r\n\f\v]+') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, CASE
                WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                    for i in range(1, len(w) - 1)])
              END AS s FROM toks),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               AND least(len(a.s), len(b.s))
                   >= 0.5 * greatest(len(a.s), len(b.s))),
            sim AS (
              SELECT id_a, id_b,
                     len(list_intersect(sa, sb))::BIGINT AS n_inter,
                     (len(sa) + len(sb) - len(list_intersect(sa, sb)))::BIGINT
                       AS n_union
              FROM cand)
            SELECT id_a, id_b, n_inter, n_union FROM sim
            WHERE n_union = 0 OR n_inter / n_union >= 0.5""",
        "winnow_fingerprint": _WINNOW_SQL,
        "hash_embed": _HASH_EMBED_SQL,
        "text_semantic_dups": _TEXT_DUPS_SQL,
        "rag_chunks": sql_chunk_tokens(CHUNK_WINDOW, CHUNK_STEP),
        "token_entropy": _TOKEN_ENTROPY_SQL,
        # exact all-pairs Hamming over the md5-based simhash fingerprint
        # (sql_simhash_fingerprints == simhash64 bit-for-bit); pigeonhole
        # banding with bands=4 > max_dist=3 makes engine recall exact.
        "simhash_dups": f"""
            WITH fp AS ({_SIMHASH_FP_SQL})
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
            FROM fp a JOIN fp b ON a.id < b.id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3""",
        # the engine maps the unsigned fingerprint into signed space by
        # flipping the top bit (skey = u - 2^63); the twin performs the
        # same flip in HUGEINT (no BIGINT literal fits 2^63) and ranges
        # in HUGEINT so no subtraction can overflow — DuckDB plans the
        # BETWEEN predicate as an IEJoin, its own sorted-neighborhood
        "fp_neighbors": f"""
            WITH fp AS ({_SIMHASH_FP_SQL}),
            sk AS (SELECT id, CAST(CASE WHEN fp >= 0
                     THEN CAST(fp AS HUGEINT) - 9223372036854775808
                     ELSE CAST(fp AS HUGEINT) + 9223372036854775808 END
                   AS BIGINT) AS skey FROM fp)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(abs(CAST(a.skey AS HUGEINT) - b.skey) AS BIGINT)
                     AS fp_dist
            FROM sk a JOIN sk b
              ON a.id < b.id
             AND CAST(b.skey AS HUGEINT)
                 BETWEEN CAST(a.skey AS HUGEINT) - {FPN_DELTA}
                     AND CAST(a.skey AS HUGEINT) + {FPN_DELTA}""",
        "ann_topk": _ANN_TOPK_SQL,
        # full-probe IVF == brute force (tests/test_ann.py equivalence), so
        # the exact top-k SQL is a true oracle for the IVF code path too
        "ann_ivf_topk": _ANN_TOPK_SQL,
        "embedding_dups": _EMB_DUPS_SQL,
        # the LSH-bucketed variant reaches recall 1.0 on this corpus
        # (q_embedding_lsh_dups note), so the exact-pairs SQL is its oracle
        "embedding_lsh_dups": _EMB_DUPS_SQL,
        # IVF multi-probe at n_assign=3 also reaches recall 1.0 here
        "ivf_dups": _EMB_DUPS_SQL,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents,
                   CAST(round(avg(l_discount) * 1000000) AS BIGINT) AS avg_disc_micro,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "orders_by_region": """
            SELECT r_name, count(*) AS n_orders,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_price_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "top_orders": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "late_orders": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_late
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 60 DAY)
            GROUP BY o_orderpriority""",
        "returned_revenue": _returned_revenue_sql(),
        "local_volume": _local_volume_sql(),
        "big_orders": _big_orders_sql(),
        "promo_revenue": _promo_revenue_sql(),
        "user_event_pivot": _user_event_pivot_sql(),
        "type_distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type""",
        "value_moments": _value_moments_sql(),
        "user_pareto": _user_pareto_sql(),
        "table_digest": _table_digest_sql(),
        "chars_ntile": _chars_ntile_sql(),
        "sorted_layout": _sorted_layout_sql(),
        "basket_pairs": _basket_pairs_sql(),
        "user_paths": _user_paths_sql(),
        "user_value_integral": _user_value_integral_sql(),
        "value_outliers": _value_outliers_sql(),
        "k_anon_events": _k_anon_events_sql(),
        "heavy_bigrams": """
            WITH arrs AS (
              SELECT list_filter(regexp_split_to_array(text,
                     '[ \t\r\n\f\v]+'), t -> t <> '') AS a
              FROM documents),
            bg AS (
              SELECT unnest([a[i] || ' ' || a[i+1]
                             for i in range(1, len(a))]) AS token
              FROM arrs)
            SELECT token, count(*)::BIGINT AS n FROM bg GROUP BY token
            HAVING count(*) >= (SELECT greatest(1, ceil(0.001 * count(*)))
                                FROM bg)""",
        "distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type""",
        "distinct_users_hll": _HLL_ORACLE,
        "events_rollup": """
            SELECT event_type, count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4,
                   CAST(round(avg(value) * 1000000) AS BIGINT) AS avg_value_micro,
                   CAST(round(max(value) * 10000) AS BIGINT) AS max_value_e4
            FROM events GROUP BY event_type""",
        "events_median": """
            SELECT event_type,
                   CAST(round(median(value) * 10000) AS BIGINT)
                     AS median_value_e4
            FROM events GROUP BY event_type""",
        "funnel": _funnel_sql(),
        "interval_coverage": _interval_coverage_sql(),
        "vocab_coverage": _vocab_coverage_sql(),
        "path_census": _path_census_sql(),
        "session_stats": """
            WITH d AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_id
              FROM d)
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                        AS BIGINT) AS span_s
            FROM s GROUP BY user_id, session_id""",
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY 1, 2""",
        # hopping windows: every event belongs to size/hop = 2 windows;
        # window starts via integer epoch-microsecond arithmetic, exactly
        # the engine's numpy construction
        "events_hourly_sliding": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000
                                  - k.k * 3600000000) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4
            FROM events, (SELECT unnest(range(2)) AS k) k
            GROUP BY 1, 2""",
        "sliding_distinct_users": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000
                                  - k.k * 3600000000) AS window_start,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM events, (SELECT unnest(range(2)) AS k) k
            GROUP BY 1""",
        "events_value_bucket": f"""
            SELECT b.bucket::BIGINT AS bucket, count(*) AS n_events
            FROM events e
            JOIN (VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BUCKETS)})
                 b(bucket, lo, hi)
              ON e.value >= b.lo AND e.value < b.hi
            GROUP BY b.bucket""",
        "asof_last_purchase": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.event_id AS p_event_id,
                   CAST(round(r.value * 10000) AS BIGINT) AS p_value_e4
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts > r.ts""",
        # md5-derived fake decode: dims are digest bytes 0/1 ==
        # (md5_number_upper >> 0/8) & 255 (DuckDB packs the first 8 digest
        # bytes little-endian; verified empirically)
        "decode_images": """
            SELECT doc_id AS id,
                   CAST(64 + (md5_number_upper(text) & 255) % 192 AS BIGINT)
                     AS width,
                   CAST(64 + ((md5_number_upper(text) >> 8) & 255) % 192
                        AS BIGINT) AS height,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents""",
        # real PNG round-trip: the engine encodes (1 + len % 64) x
        # (1 + tokens % 64) PNGs and header-parses them back; the oracle
        # recomputes the dims straight from the text
        "image_meta": f"""
            SELECT doc_id AS id, 'ok' AS status, 'png' AS format,
                   CAST(1 + length(text) % 64 AS BIGINT) AS width,
                   CAST(1 + {sql_token_count('text')} % 64 AS BIGINT) AS height,
                   8::BIGINT AS bpp, 'gray' AS colorspace,
                   0::BIGINT AS dpi_x, 0::BIGINT AS dpi_y
            FROM documents""",
        # dims of a (2+len%64) x (2+tokens%64) image after scale-0.5
        # nearest-neighbor resize: floor halves (source dims >= 2);
        # format alternates by doc_id parity (even=png, odd=bmp) — the
        # resized payload must round-trip in its ORIGINAL format
        "image_dups": _image_dups_sql(),
        "image_resize": f"""
            SELECT doc_id AS id, 'ok' AS status,
                   CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                        WHEN 2 THEN 'gif' ELSE 'jpeg' END AS format,
                   CAST((2 + length(text) % 64) // 2 AS BIGINT) AS width,
                   CAST((2 + {sql_token_count('text')} % 64) // 2 AS BIGINT)
                     AS height
            FROM documents""",
    }
