"""Text-analysis queries (functions/text.py; oracle-paired).

Carved out of the original single-file ``__ray_entry__.py`` board
(round-4 housekeeping; content unchanged). See
``pypdfium2_ray/queries/__init__.py`` for the layout.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.queries.common import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.extraction import *  # noqa: F401,F403,E501

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




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
