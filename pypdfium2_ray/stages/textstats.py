"""Text-analysis stages: thin ``map_batches`` wrappers over
:mod:`pypdfium2_ray.functions.text` (all vectorized Arrow kernels).

Each function appends columns to the streaming batch — no shuffle, no row
loops (MD5 is per-value by nature but stays a flat C-speed loop).
"""

from __future__ import annotations

import pyarrow as pa

from pypdfium2_ray.functions.text import (
    fingerprint_md5, lang_pred, quality_columns, term_count, token_count,
)


def add_quality_columns(batch: pa.Table, col: str = "text") -> pa.Table:
    """n_chars_text / n_tokens / n_punct / n_stopwords counters."""
    for name, arr in quality_columns(batch[col]).items():
        batch = batch.append_column(name, arr)
    return batch


def add_lang_pred(batch: pa.Table, col: str = "text",
                  out: str = "lang_pred") -> pa.Table:
    """Stopword-hit language-ID column."""
    return batch.append_column(out, lang_pred(batch[col]))


def add_fingerprint(batch: pa.Table, col: str = "text",
                    out: str = "fingerprint") -> pa.Table:
    """Hex-MD5 document fingerprint column."""
    return batch.append_column(out, fingerprint_md5(batch[col]))


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "n_tokens") -> pa.Table:
    return batch.append_column(out, token_count(batch[col]))


def add_term_count(batch: pa.Table, term: str, col: str = "text",
                   out: str = "n_matches") -> pa.Table:
    """Corpus-wide literal search — the batch form of
    ``PdfTextPage.search`` in default flags (textpage.py:255-292)."""
    return batch.append_column(out, term_count(batch[col], term))
