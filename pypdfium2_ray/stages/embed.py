"""Feature-hashing text embeddings ("the hashing trick", Weinberger et
al., ICML'09) — the bridge from raw crawl text into the semantic tiers
(ANN / k-means / SemDeDup) when no model embedding exists yet.

Each document becomes a ``dim``-bucket signed token-count vector:
``bucket = md5(token) % dim``, ``sign = +1/-1`` from md5 bit 6, value =
signed count of the token's occurrences. Everything about the vector is
an exact int64, which buys two things the float tiers cannot offer:

- **Zero-exchange embedding**: a document's tokens never leave its block,
  so ``hash_embed`` is a pure per-block map — at 10^12 rows the stage
  adds no shuffle at all (the md5 runs once per DISTINCT token per block
  via dictionary encoding).
- **SQL-exact similarity**: cosine thresholds become integer
  cross-multiplication — ``cos(a,b) >= num/den``  ⇔  ``dot > 0  AND
  dot² · den² >= num² · |a|² · |b|²`` — no float anywhere, so near-dup
  pairs are oracle-checkable bit-for-bit (DuckDB twin: token explode +
  ``md5_number_upper % dim`` + a sparse shared-bucket self-join).

``int_cosine_dup_pairs`` is the BROADCAST tier (per-block int64 matmul
against a ``ray.put`` corpus matrix — same regime boundary as
``stages/ann.embedding_dup_pairs``: right up to ~worker-heap corpus
sizes, after which the LSH/IVF tiers in ``stages/ann`` take over on the
same vectors, cast to float).

No reference analogue (pypdfium2 has no corpus layer); curation-op
family next to minhash/simhash — the *semantic* near-dup signal from raw
text where minhash gives the *lexical* one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.functions.text import WS_RE

I64 = pa.int64()

#: md5 bit used for the +/-1 sign (SQL twin: ``((h >> 6) & 1)``); any bit
#: independent of ``h % dim`` works for dim <= 64 — bit 6 is the first
#: bit above the widest supported bucket field.
SIGN_BIT = 6


def _doc_token_matrix(t: pa.Table, id_col: str, text_col: str,
                      dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n_rows, dim) int64 signed-count matrix) for one block —
    vectorized split/flatten, md5 once per distinct token."""
    from pypdfium2_ray.functions.sketch import md5_hash64
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
    mat = np.zeros((len(ids), dim), np.int64)
    if len(flat):
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        hu = np.fromiter(
            (md5_hash64(tok.encode()) for tok in d.dictionary.to_pylist()),
            dtype=np.uint64, count=len(d.dictionary))
        bucket = (hu % np.uint64(dim)).astype(np.int64)
        sign = np.where((hu >> np.uint64(SIGN_BIT)) & np.uint64(1) == 1,
                        1, -1).astype(np.int64)
        np.add.at(mat, (row, bucket[codes]), sign[codes])
    return ids, mat


def hash_embed(ds, dim: int = 64, id_col: str = "doc_id",
               text_col: str = "text", out: str = "embedding"):
    """Dataset[(id_col, out: fixed_size_list<int64>[dim])] — one signed
    hashed token-count vector per document, zero exchanges."""
    if not (1 <= dim <= 1 << SIGN_BIT):
        raise ValueError(f"dim must be in [1, {1 << SIGN_BIT}] so the "
                         "sign bit is independent of the bucket field")

    def embed(t: pa.Table) -> pa.Table:
        ids, mat = _doc_token_matrix(t, id_col, text_col, dim)
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), I64), dim)
        return pa.table({id_col: pa.array(ids, I64), out: vecs})

    return ds.select_columns([id_col, text_col]) \
             .map_batches(embed, batch_format="pyarrow")


def hash_embed_long(ds, dim: int = 64, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Long-format projection: one (id, bucket, val) row per NONZERO
    bucket — the oracle-friendly rendering (and the natural input to an
    inverted bucket index)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, mat = _doc_token_matrix(t, id_col, text_col, dim)
        r, b = np.nonzero(mat)
        return pa.table({id_col: pa.array(ids[r], I64),
                         "bucket": pa.array(b.astype(np.int64), I64),
                         "val": pa.array(mat[r, b], I64)})

    return ds.select_columns([id_col, text_col]) \
             .map_batches(explode, batch_format="pyarrow")


def int_cosine_dup_pairs(emb_ds, corpus: pa.Table, tau_num: int,
                         tau_den: int, id_col: str = "doc_id",
                         vec_col: str = "embedding"):
    """Pairs with ``cos >= tau_num/tau_den`` over int64 vectors —
    integer-exact threshold semantics (broadcast tier).

    ``corpus``: the full (small-side) embedding table, shipped ONCE via
    ``ray.put`` and matmul'ed against each block. Output
    ``(id_a < id_b, dot, na2, nb2)`` — every column an exact int64, so
    the DuckDB twin matches bit-for-bit. Raises loudly if the integer
    cross-multiply could overflow int64 (no silent caps)."""
    import ray
    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num <= tau_den")
    c_ids = pc.cast(corpus[id_col], I64).to_numpy(zero_copy_only=False)
    dim = len(corpus[vec_col][0])
    c_mat = np.asarray(corpus[vec_col].combine_chunks().values
                       .to_numpy(zero_copy_only=False)).reshape(-1, dim)
    c_n2 = (c_mat * c_mat).sum(axis=1)
    lim = (1 << 62) // (tau_den * tau_den)
    if int(c_n2.max(initial=0)) ** 2 > lim:
        raise ValueError(
            "int_cosine_dup_pairs overflow guard: max |v|^2 = "
            f"{int(c_n2.max())} — dot^2*den^2 would exceed int64; shrink "
            "documents (or scale counts down) before pairing")
    ref = ray.put((c_ids, c_mat, c_n2))
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def pairs(t: pa.Table) -> pa.Table:
        ids_b = pc.cast(t[id_col], I64).to_numpy(zero_copy_only=False)
        b_mat = np.asarray(t[vec_col].combine_chunks().values
                           .to_numpy(zero_copy_only=False)).reshape(-1, dim)
        ids_c, mat_c, n2_c = ray.get(ref)
        dot = b_mat @ mat_c.T                      # int64 exact
        b_n2 = (b_mat * b_mat).sum(axis=1)
        ok = ((ids_b[:, None] < ids_c[None, :]) & (dot > 0)
              & (dot * dot * den2 >= num2 * b_n2[:, None] * n2_c[None, :]))
        r, c = np.nonzero(ok)
        return pa.table({"id_a": pa.array(ids_b[r], I64),
                         "id_b": pa.array(ids_c[c], I64),
                         "dot": pa.array(dot[r, c], I64),
                         "na2": pa.array(b_n2[r], I64),
                         "nb2": pa.array(n2_c[c], I64)})

    return emb_ds.map_batches(pairs, batch_format="pyarrow")
