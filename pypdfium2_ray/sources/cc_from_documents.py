"""Derive a Common-Crawl-style ``cc_pages`` table from the driver's
``documents`` table (``doc_id:int64, text, lang, source, n_chars``).

The driver's star schema carries no ``html:binary`` payload, so the flagship
pipeline's input (BASELINE.json ``input_hint`` schema) is synthesized
deterministically — and NOT as a trivial one-``<p>`` page: each document
becomes a two-page site-shaped HTML file exercising the extraction
pipeline's real work:

- ``<nav>``/``<header>``/``<footer>`` boilerplate that MUST be stripped
  (its text would corrupt the oracle otherwise),
- a ``<main>`` wrapper triggering the main-content restriction,
- an ``<h1>`` heading line + the document text + a templated paragraph,
- an explicit ``<pb>`` page break and a second page with an ``<h2>``
  (which also exercises the heading outline / tagged flag).

All transforms are vectorized Arrow string kernels, and every non-``text``
fragment is a fixed template over (doc_id, lang, source) — so the exact
extracted bytes remain ANSI-SQL-composable (:func:`sql_extracted_text`).

``url = doc://{source}/{doc_id}``; ``warc_ts = 2026-01-01 + doc_id sec``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BASE_EPOCH_S = 1_767_225_600  # 2026-01-01T00:00:00Z

# --- deterministic error injection (SQL-composable from doc_id) -----------
# A real crawl carries malformed and access-protected payloads; the
# reference types these failures per document (document.py:583-585 +
# internal/consts.py:130-138). A deterministic ~2% of rows exercise the
# error-row discipline end-to-end: the predicates below are pure doc_id
# arithmetic, so the DuckDB oracle expresses the expected (status,
# err_code, empty-output) rows exactly.
ERR_MOD = 101
BAD_REM = 7          # doc_id % ERR_MOD == 7  -> malformed  (format_error)
ENC_REM = 13         # doc_id % ERR_MOD == 13 -> encrypted  (password_error)
ENC_PASSWORD = "graft-pw"   # decrypts the encrypted rows in tests
#: malformed payload: a null byte fails the binary sniff immediately
_MALFORMED = b"\x00\xde\xad: not html \xff\xfe truncated-warc-record"


def sql_is_bad(id_col: str = "doc_id") -> str:
    return f"({id_col} % {ERR_MOD} = {BAD_REM})"


def sql_is_enc(id_col: str = "doc_id") -> str:
    return f"({id_col} % {ERR_MOD} = {ENC_REM})"

#: fixed boilerplate the parser must strip (nav/header before main,
#: footer after) — deliberately containing link text and punctuation
_BOILER_TOP = ('<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
               "<header>Example Site — all pages</header>")
_BOILER_BOTTOM = "<footer>(c) example.org — generated page</footer>"


def _inject_errors(html: pa.Array, doc_id: pa.Array) -> pa.Array:
    """Replace the deterministic error slice of ``html``: BAD rows get a
    fixed malformed payload (vectorized ``if_else``); ENC rows get a real
    :func:`~pypdfium2_ray.docmodel.htmldoc.encrypt_payload` envelope (the
    per-row encryption touches ONLY the ~1% selected rows — the ok path
    stays fully vectorized)."""
    import numpy as np
    from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
    did = pc.cast(doc_id, pa.int64())
    rem = pc.subtract(did, pc.multiply(
        pc.divide(did, ERR_MOD), ERR_MOD))        # pyarrow 16: no pc.modulo
    bad = pc.equal(rem, BAD_REM)
    enc = pc.equal(rem, ENC_REM)
    if isinstance(enc, pa.ChunkedArray):     # replace_with_mask wants Arrays
        enc = enc.combine_chunks()
    html = pc.if_else(bad, pa.scalar(_MALFORMED, pa.binary()), html)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    enc_np = enc.to_numpy(zero_copy_only=False)
    if enc_np.any():
        idx = np.flatnonzero(enc_np)
        repl = pa.array(
            [encrypt_payload(v.as_py(), ENC_PASSWORD)
             for v in html.take(pa.array(idx))], pa.binary())
        html = pc.replace_with_mask(html, enc, repl)
    return html


#: per-doc related-page nav link: dst page id = (doc_id*LINK_MULT+LINK_ADD)
#: % LINK_MOD — pure doc_id arithmetic (SQL-composable), INSIDE <nav> so
#: the boilerplate strip removes it from extracted text (the extraction
#: oracles are untouched) while the link-graph scanners see a varying edge
LINK_MULT, LINK_ADD, LINK_MOD = 31, 7, 997


def documents_to_cc(batch: pa.Table, errors: bool = True,
                    wrap: str = "main") -> pa.Table:
    """Vectorized ``documents`` row -> ``cc_pages`` row. ``errors=False``
    yields the all-ok corpus (fixtures that need clean input).

    ``wrap``: page shape around the same content.

    - ``"main"`` — semantic markup: ``<nav>/<header>/<footer>``
      boilerplate + a ``<main>`` wrapper (the semantic-policy page).
    - ``"divs"`` — the WILD-crawl shape: NO ``<main>``, boilerplate as
      link-dense ``<div>`` blocks plus a short plain-text site banner
      div; only the density content policy recovers the same extracted
      text (the banner scores positive, so plain tag-stripping is NOT
      enough — the heuristic must out-score it with the content div).
    """
    doc_id_str = pc.cast(batch["doc_id"], pa.string())
    did = pc.cast(batch["doc_id"], pa.int64())
    rel = pc.add(pc.multiply(did, LINK_MULT), LINK_ADD)
    rel_str = pc.cast(pc.subtract(rel, pc.multiply(
        pc.divide(rel, LINK_MOD), LINK_MOD)), pa.string())   # rel % LINK_MOD
    url = pc.binary_join_element_wise(
        "doc://", batch["source"], "/", doc_id_str, "")
    title = pc.binary_join_element_wise("doc ", doc_id_str, "")
    content = ("<h1>Doc ", doc_id_str, "</h1><p>", batch["text"],
               "</p><p>Language: ", batch["lang"], ".</p>",
               "<pb>",
               "<h2>Appendix ", doc_id_str, "</h2><p>End of ",
               batch["source"], " document ", doc_id_str, ".</p>")
    if wrap == "main":
        parts = (
            _BOILER_TOP,
            '<nav><a href="/page/', rel_str, '">rel ', doc_id_str,
            "</a></nav>", "<main>", *content, "</main>", _BOILER_BOTTOM)
    elif wrap == "table":
        # single-page shape with a 5-row metadata <table> whose cells are
        # pure (doc_id, lang, source, length(text)) expressions — the
        # extract_tables oracle reconstructs them in SQL verbatim
        n_str = pc.cast(pc.utf8_length(batch["text"]), pa.string())
        parts = (
            _BOILER_TOP, "<main><h1>Doc ", doc_id_str, "</h1><p>",
            batch["text"], "</p>",
            '<table class="meta"><tr><th>key</th><th>value</th></tr>',
            "<tr><td>id</td><td>", doc_id_str, "</td></tr>",
            "<tr><td>lang</td><td>", batch["lang"], "</td></tr>",
            "<tr><td>source</td><td>", batch["source"], "</td></tr>",
            "<tr><td>chars</td><td>", n_str, "</td></tr>",
            "</table></main>", _BOILER_BOTTOM)
    elif wrap == "ld":
        # single-page shape with a schema.org Article JSON-LD block whose
        # scalar fields are pure (doc_id, lang, source, length(text))
        # expressions — the extract_jsonld oracle reconstructs them
        n_str = pc.cast(pc.utf8_length(batch["text"]), pa.string())
        parts = (
            _BOILER_TOP,
            '<script type="application/ld+json">{"@context":'
            '"https://schema.org","@type":"Article","headline":"Doc ',
            doc_id_str, '","wordCount":', n_str, ',"inLanguage":"',
            batch["lang"], '","author":{"name":"', batch["source"],
            '"},"keywords":["crawl","', batch["lang"], '"]}</script>',
            "<main><h1>Doc ", doc_id_str, "</h1><p>", batch["text"],
            "</p></main>", _BOILER_BOTTOM)
    else:   # "divs"
        parts = (
            '<div class="menu"><a href="/">Home</a> '
            '<a href="/about">About</a> <a href="/page/', rel_str,
            '">rel ', doc_id_str, "</a></div>",
            "<div>Example Site — all pages</div>",
            "<div>", *content, "</div>",
            '<div class="share"><a href="#t">Share this page</a> '
            '<a href="#f">Like</a> <a href="/signup">Sign up free '
            "today</a></div>")
    html = pc.cast(pc.binary_join_element_wise(
        "<html><head><title>", title, "</title></head><body>",
        *parts,
        "</body></html>", ""), pa.binary())
    if errors:
        html = _inject_errors(html, batch["doc_id"])
    ts = pc.cast(pc.multiply(
        pc.add(pc.cast(batch["doc_id"], pa.int64()), _BASE_EPOCH_S),
        1_000_000), pa.timestamp("us"))
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": batch["text"],
        "lang": batch["lang"],
        "doc_id": batch["doc_id"],
    })


def read_cc_from_documents(sf_dir: str, errors: bool = True,
                           wrap: str = "main"):
    """``read_parquet(documents)`` (column-pruned) -> streaming cc_pages."""
    from functools import partial
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir.rstrip('/')}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(partial(documents_to_cc, errors=errors, wrap=wrap),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SQL twins — compose the exact extracted bytes from (doc_id, text, lang,
# source); the construction above guarantees invertibility

_CRLF = "chr(13) || chr(10)"


def _sql_page_texts(text_col: str = "text") -> tuple[str, str]:
    """Per-page textpage text (CRLF between lines within a page)."""
    collapsed = (f"trim(regexp_replace({text_col}, "
                 "'[ \\t\\r\\n\\f\\v]+', ' ', 'g'), ' ')")
    p1 = (f"'Doc ' || doc_id || {_CRLF} || {collapsed} || {_CRLF} || "
          "'Language: ' || lang || '.'")
    p2 = (f"'Appendix ' || doc_id || {_CRLF} || "
          "'End of ' || source || ' document ' || doc_id || '.'")
    return p1, p2


def sql_extracted_text(text_col: str = "text") -> str:
    """The DuckDB oracle for the flagship ``extracted_text``:
    ``"# Page {i}\\n" + page_text`` per page, pages joined by a blank line,
    trailing newline (cli/extract_text.py:26-45 framing)."""
    p1, p2 = _sql_page_texts(text_col)
    return (f"'# Page 1' || chr(10) || {p1} || chr(10) || chr(10) || "
            f"'# Page 2' || chr(10) || {p2} || chr(10)")


def sql_n_chars(text_col: str = "text") -> str:
    """Sum of per-page ``count_chars()`` (page text incl. intra-page CRLF,
    excl. the document framing)."""
    p1, p2 = _sql_page_texts(text_col)
    return f"(length({p1}) + length({p2}))"
