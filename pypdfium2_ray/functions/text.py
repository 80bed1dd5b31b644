"""Vectorized text-analysis functions + their ANSI-SQL twins.

Both sides of every pair use RE2 regex semantics (pyarrow's
``count_substring_regex`` and DuckDB's ``regexp_*`` are both RE2), so a
Ray result and its DuckDB oracle agree byte-for-byte. The SQL strings are
generated from the same constants as the Python kernels.

Reference lineage: the per-char/per-text scalar layer of SURVEY §2.8 (decode
policy ``textpage.py:85,146``, whitespace/CRLF conventions ``textpage.py:24-26``)
extended with the language-ID / quality-scoring / token-counting /
fingerprinting operators required for training-data curation at crawl scale.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

#: one token = a maximal run of non-whitespace (RE2 \S)
TOKEN_RE = r"\S+"
#: BPE-ish subword tokenization (GPT-2-style pre-tokenizer pattern, RE2
#: subset: contraction suffixes | space-prefixed letter runs | digit runs |
#: punctuation runs | whitespace). Counts approximate LLM token counts far
#: better than whitespace tokens.
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
#: sentence-ending punctuation
PUNCT_RE = r"[.!?]"
#: whitespace runs (the docmodel's line-collapse class, htmldoc._WS_RE)
WS_RE = r"[ \t\r\n\f\v]+"

#: tiny per-language stopword lists for the n-gram/stopword-hit language-ID
#: heuristic. Deterministic tie-break: first language in this (ordered) dict
#: wins; all-zero scores -> "und".
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "y", "es", "una", "por"),
}


def _stop_re(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


# ---------------------------------------------------------------------------
# counting / slicing kernels (all zero-copy Arrow in, Arrow out)

def token_count(texts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Whitespace-token count per string (vectorized RE2 scan)."""
    return pc.cast(pc.count_substring_regex(texts, TOKEN_RE), pa.int64())


def bpe_token_count(texts) -> pa.ChunkedArray:
    """Approximate LLM token count: non-overlapping matches of the BPE-ish
    pre-tokenizer pattern (vectorized RE2 scan)."""
    return pc.cast(pc.count_substring_regex(texts, BPE_RE), pa.int64())


def sql_bpe_token_count(col: str = "text") -> str:
    pat = BPE_RE.replace("'", "''")
    return f"length(regexp_extract_all({col}, '{pat}'))"


def term_count(texts, term: str) -> pa.ChunkedArray:
    """Non-overlapping occurrence count of a literal *term* per string —
    the corpus-wide form of ``PdfTextSearcher`` (textpage.py:255-334) in its
    default non-consecutive mode (advance by match length)."""
    return pc.cast(pc.count_substring(texts, term), pa.int64())


def collapse_ws(texts) -> pa.ChunkedArray:
    """Whitespace-run collapse + strip — the docmodel line normalization
    (htmldoc._flush_line semantics) as a standalone vectorized kernel."""
    collapsed = pc.replace_substring_regex(texts, WS_RE, " ")
    return pc.utf8_trim(collapsed, " ")


def fingerprint_md5(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex MD5 per string — the document-fingerprint operator (the engine's
    ``get_identifier`` analogue, document.py:278-292, as a corpus column).
    Hashing is inherently per-value; the loop stays off the per-char level."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
         for t in texts.to_pylist()],
        type=pa.string())


def lang_scores(texts) -> dict[str, pa.ChunkedArray]:
    """Per-language stopword-hit counts."""
    return {lang: pc.cast(pc.count_substring_regex(texts, _stop_re(lang)), pa.int64())
            for lang in LANG_STOPWORDS}


def lang_pred(texts) -> pa.Array:
    """Predicted language: argmax of stopword hits, ties -> earlier language
    in LANG_STOPWORDS order, all-zero -> 'und'. Strictly deterministic."""
    scores = lang_scores(texts)
    langs = list(LANG_STOPWORDS)
    cols = [scores[lg].combine_chunks() if isinstance(scores[lg], pa.ChunkedArray)
            else scores[lg] for lg in langs]
    n = len(cols[0])
    best = pa.nulls(n, pa.string()).to_pylist()
    best_score = [0] * n
    for lg, col in zip(langs, cols):
        vals = col.to_pylist()
        for i, v in enumerate(vals):
            if v is not None and v > best_score[i]:
                best_score[i] = v
                best[i] = lg
    return pa.array([b if b is not None else "und" for b in best], type=pa.string())


def quality_columns(texts) -> dict[str, pa.ChunkedArray | pa.Array]:
    """Quality-scoring counters per document (integer counts — exact,
    shuffle-free, oracle-safe): char count, token count, sentence-punct
    count, english-stopword count."""
    return {
        "n_chars_text": pc.cast(pc.utf8_length(texts), pa.int64()),
        "n_tokens": token_count(texts),
        "n_punct": pc.cast(pc.count_substring_regex(texts, PUNCT_RE), pa.int64()),
        "n_stopwords": pc.cast(pc.count_substring_regex(texts, _stop_re("en")), pa.int64()),
    }


# ---------------------------------------------------------------------------
# the SQL twins (DuckDB / ANSI) — generated from the same constants

def sql_token_count(col: str = "text") -> str:
    return f"length(regexp_extract_all({col}, '\\S+'))"


def sql_term_count(col: str, term: str) -> str:
    """Literal, non-overlapping — matches ``pc.count_substring``.

    The term is regex-escaped (RE2 semantics, via ``re.escape`` which only
    backslashes ASCII specials) and SQL-quote-escaped, so metacharacters or
    quotes in the term cannot diverge from the literal Python kernel or
    break the generated SQL. Backslashes are NOT doubled: DuckDB's
    single-quoted strings pass them through verbatim (same convention as
    the other patterns in this module).
    """
    import re
    pat = re.escape(term).replace("'", "''")
    return f"length(regexp_extract_all({col}, '{pat}'))"


def sql_collapse_ws(col: str = "text") -> str:
    return f"trim(regexp_replace({col}, '[ \\t\\r\\n\\f\\v]+', ' ', 'g'), ' ')"


def sql_lang_count(lang: str, col: str = "text") -> str:
    pat = _stop_re(lang).replace("\\b", "\\b")
    return f"length(regexp_extract_all({col}, '{pat}'))"


def sql_lang_pred(col: str = "text") -> str:
    """CASE chain replicating lang_pred's argmax + tie-break exactly."""
    langs = list(LANG_STOPWORDS)
    counts = {lg: sql_lang_count(lg, col) for lg in langs}
    # lang i wins iff count_i > all earlier counts and >= all later counts
    # (strictly-greater beats earlier entries == earlier entry wins ties)
    cases = []
    for i, lg in enumerate(langs):
        conds = [f"{counts[lg]} > 0"]
        for j, other in enumerate(langs):
            if j == i:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{counts[lg]} {op} {counts[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


# ---------------------------------------------------------------------------
# PII redaction + repetition metrics (training-data scrubbing / quality)

#: PII patterns — RE2 syntax shared VERBATIM with the SQL twins (both
#: sides run RE2, so matches are identical). Replacement order matters for
#: overlaps (an email contains digit runs): emails, then phones, then IPs
#: — the twins apply the same order.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

_PII_ORDER = (("email", EMAIL_RE, "<EMAIL>"),
              ("phone", PHONE_RE, "<PHONE>"),
              ("ip", IPV4_RE, "<IP>"))


def redact_pii(texts):
    """Replace emails / phone numbers / IPv4 addresses with typed
    placeholder tokens — one vectorized RE2 pass per pattern, in the
    documented order."""
    out = texts
    for _name, pat, repl in _PII_ORDER:
        out = pc.replace_substring_regex(out, pat, repl)
    return out


def pii_counts(texts) -> dict[str, pa.ChunkedArray]:
    """Per-document counts of each PII kind (non-overlapping matches,
    counted BEFORE redaction in the same order semantics)."""
    return {f"n_{name}s": pc.cast(
        pc.count_substring_regex(texts, pat), pa.int64())
        for name, pat, _repl in _PII_ORDER}


def sql_redact_pii(col: str = "text") -> str:
    """Nested global regexp_replace in the same order (DuckDB RE2)."""
    expr = col
    for _name, pat, repl in _PII_ORDER:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def sql_pii_count(kind: str, col: str = "text") -> str:
    pat = dict((n, p) for n, p, _r in _PII_ORDER)[kind].replace("'", "''")
    return f"length(regexp_extract_all({col}, '{pat}'))"


def repetition_counts(texts) -> dict[str, pa.Array]:
    """Repetition quality signals (the Gopher-style duplicate-fraction
    family, integer-exact): per document, total token count and DISTINCT
    token count (dup fraction = 1 - distinct/total). Vectorized: one RE2
    split, then a Cython drop_duplicates over (doc, token) pairs — no
    Python per row."""
    import numpy as np
    import pandas as pd
    la = pc.split_pattern_regex(texts, WS_RE)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    parent = np.repeat(np.arange(len(la), dtype=np.int64),
                       np.diff(la.offsets.to_numpy()))
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[keep]
    words = flat.filter(pa.array(keep))
    n_tokens = np.bincount(parent, minlength=len(la)).astype(np.int64)
    first = ~pd.DataFrame({"p": parent,
                           "w": words.to_pandas()}).duplicated().to_numpy()
    n_distinct = np.bincount(parent[first], minlength=len(la)).astype(np.int64)
    return {"n_tokens": pa.array(n_tokens),
            "n_distinct_tokens": pa.array(n_distinct)}


def sql_repetition_counts(col: str = "text") -> tuple[str, str]:
    """(n_tokens, n_distinct_tokens) expressions — list_filter +
    list_distinct over the same whitespace split."""
    arr = (f"list_filter(regexp_split_to_array({col}, "
           f"'[ \\t\\r\\n\\f\\v]+'), t -> t <> '')")
    return (f"len({arr})", f"len(list_distinct({arr}))")


# ---------------------------------------------------------------------------
# unicode text normalization (curation cleaning pass)

#: (name, pattern, replacement) applied IN ORDER — identical RE2 source on
#: the engine (pyarrow replace_substring_regex) and the DuckDB oracle
#: (regexp_replace ... 'g'), the sql-twin idiom of _PII_ORDER above.
#: Order matters: ellipsis folds before whitespace collapse so "a … b"
#: becomes "a ... b", and the control strip runs before the collapse so
#: control runs merge into the neighboring whitespace.
_NORM_ORDER = (
    ("quotes_single", "[‘’‚‛]", "'"),
    ("quotes_double", "[“”„‟]", '"'),
    ("dashes", "[–—―−]", "-"),
    ("ellipsis", "…", "..."),
    ("nbsp", "[   ]", " "),
    ("controls", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
    ("ws_collapse", "[ \\t\\r\\n\\f\\v]+", " "),
)


def normalize_text(texts):
    """Deterministic unicode cleanup: curly quotes/dashes/ellipsis/NBSP
    folded to ASCII, control chars stripped, whitespace runs collapsed,
    ends trimmed — one vectorized RE2 pass per rule."""
    out = texts
    for _name, pat, repl in _NORM_ORDER:
        out = pc.replace_substring_regex(out, pat, repl)
    return pc.utf8_trim(out, " ")


def sql_normalize_text(col: str = "text") -> str:
    """Nested regexp_replace chain in the same order + trim (DuckDB)."""
    expr = col
    for _name, pat, repl in _NORM_ORDER:
        # DuckDB string literals keep backslashes verbatim — RE2 gets the
        # identical pattern source; only quotes need SQL-escaping
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr}, ' ')"
