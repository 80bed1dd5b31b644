"""Token-window document chunking — the RAG / context-window prep op
(fixed-size overlapping token windows per document, the standard
retrieval-corpus transform; the non-overlapping packing variant lives in
``stages/scan.pack_offsets``).

Pure per-block map, ZERO exchanges: a document's tokens never leave its
block, chunk rows are emitted in place. Fully vectorized — the
overlapping windows are materialized with one repeat/arange gather into
the block's flattened token array, one ``ListArray`` rebuild and one
``binary_join`` (no Python per doc or per chunk).

Chunk rule (shared verbatim with the SQL twin): tokens = whitespace
split with empties dropped; starts = 0, step, 2*step, ... while
start < n_tokens; chunk = tokens[start : start+window] joined by a
single space (the final chunk may be short; empty docs emit no rows).
SQL twin: ``FROM docs, unnest(generate_series(0, len(toks)-1, step))
u(s)`` + 1-based inclusive list slice ``toks[s+1 : s+window]``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE

I64 = pa.int64()


def chunk_tokens(ds, window: int = 128, step: int | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Dataset[(id_col, chunk_idx, chunk_text, n_tokens)] — one row per
    token window. ``step`` defaults to ``window`` (no overlap); overlap =
    ``window - step`` when ``step < window``."""
    step = window if step is None else step
    if window < 1 or not (1 <= step <= window):
        raise ValueError("need window >= 1 and 1 <= step <= window")

    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], I64).to_numpy(zero_copy_only=False)
        la = pc.split_pattern_regex(t[text_col], WS_RE)
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten()
        row = np.repeat(np.arange(len(la), dtype=np.int64),
                        np.diff(la.offsets.to_numpy()))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        row = row[keep.to_numpy(zero_copy_only=False)]
        n = np.bincount(row, minlength=len(la)).astype(np.int64)
        k = np.where(n > 0, (np.maximum(n, 1) - 1) // step + 1, 0)
        total_k = int(k.sum())
        if not total_k:
            return pa.table({id_col: pa.array([], I64),
                             "chunk_idx": pa.array([], I64),
                             "chunk_text": pa.array([], pa.string()),
                             "n_tokens": pa.array([], I64)})
        doc_rep = np.repeat(np.arange(len(la), dtype=np.int64), k)
        kcum = np.concatenate([[0], np.cumsum(k)])
        cidx = np.arange(total_k, dtype=np.int64) - np.repeat(kcum[:-1], k)
        start = cidx * step
        length = np.minimum(start + window, n[doc_rep]) - start
        doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
        coff = np.concatenate([[0], np.cumsum(length)])
        pos = (np.arange(int(length.sum()), dtype=np.int64)
               - np.repeat(coff[:-1], length))
        gidx = np.repeat(doc_off[doc_rep] + start, length) + pos
        toks = flat.take(pa.array(gidx, I64))
        lst = pa.ListArray.from_arrays(
            pa.array(coff, pa.int32()), toks)
        return pa.table({id_col: pa.array(ids[doc_rep], I64),
                         "chunk_idx": pa.array(cidx, I64),
                         "chunk_text": pc.binary_join(lst, " "),
                         "n_tokens": pa.array(length, I64)})

    return ds.select_columns([id_col, text_col]) \
             .map_batches(f, batch_format="pyarrow")


def sql_chunk_tokens(window: int, step: int, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Exact DuckDB twin of :func:`chunk_tokens` over ``table``."""
    return f"""
    WITH a AS (SELECT CAST({id_col} AS BIGINT) AS {id_col},
               list_filter(regexp_split_to_array({text_col},
                       '[ \\t\\r\\n\\f\\v]+'), t -> t <> '') AS toks
               FROM {table})
    SELECT a.{id_col}, CAST(u.s // {step} AS BIGINT) AS chunk_idx,
           array_to_string(a.toks[u.s + 1 : u.s + {window}], ' ')
               AS chunk_text,
           CAST(len(a.toks[u.s + 1 : u.s + {window}]) AS BIGINT)
               AS n_tokens
    FROM a, unnest(generate_series(0, len(a.toks) - 1, {step})) AS u(s)"""
