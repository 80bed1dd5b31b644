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


def quality_filter(ds, col: str = "text", min_tokens: int = 10,
                   max_tokens: int | None = None,
                   min_mean_token_chars: float | None = 2.0,
                   max_mean_token_chars: float | None = 12.0,
                   min_stopword_frac: float | None = None,
                   emit_counters: bool = False):
    """Heuristic quality gate — the Gopher/C4-style rule family as one
    vectorized streaming filter (no shuffle): token-count bounds, mean
    token length bounds, optional english-stopword fraction floor. All
    comparisons are done on exact integer counters x scaled thresholds so
    the SQL twin (same expressions over the same counters) agrees exactly.

    Mean token length uses non-whitespace chars / tokens (both integers);
    a bound ``mean >= m`` is evaluated as ``nonws_chars >= m * n_tokens``
    with the float product on both sides (engine and oracle compute the
    identical IEEE expression).

    ``emit_counters`` appends the already-computed ``n_tokens`` column to
    the survivors — downstream consumers then need no second regex scan
    over the text (the scan is this op's dominant cost).
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        toks = pc.cast(token_count(t[col]), pa.float64())
        ws = pc.cast(pc.count_substring_regex(t[col], r"[ \t\r\n\f\v]"),
                     pa.int64())
        nonws = pc.cast(pc.subtract(pc.utf8_length(t[col]), ws), pa.float64())
        keep = pc.greater_equal(toks, float(min_tokens))
        if max_tokens is not None:
            keep = pc.and_(keep, pc.less_equal(toks, float(max_tokens)))
        if min_mean_token_chars is not None:
            keep = pc.and_(keep, pc.greater_equal(
                nonws, pc.multiply(toks, float(min_mean_token_chars))))
        if max_mean_token_chars is not None:
            keep = pc.and_(keep, pc.less_equal(
                nonws, pc.multiply(toks, float(max_mean_token_chars))))
        if min_stopword_frac is not None:
            from pypdfium2_ray.functions.text import lang_scores
            stops = pc.cast(lang_scores(t[col])["en"], pa.float64())
            keep = pc.and_(keep, pc.greater_equal(
                stops, pc.multiply(toks, float(min_stopword_frac))))
        if emit_counters:
            t = t.append_column("n_tokens", pc.cast(toks, pa.int64()))
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def sql_quality_filter(col: str = "text", min_tokens: int = 10,
                       max_tokens: int | None = None,
                       min_mean_token_chars: float | None = 2.0,
                       max_mean_token_chars: float | None = 12.0,
                       min_stopword_frac: float | None = None) -> str:
    """WHERE-clause twin of :func:`quality_filter` (same counters, same
    float products)."""
    from pypdfium2_ray.functions.text import sql_lang_count, sql_token_count
    toks = sql_token_count(col)
    nonws = (f"(length({col}) - "
             f"length(regexp_extract_all({col}, '[ \\t\\r\\n\\f\\v]')))")
    conds = [f"{toks} >= {float(min_tokens)}"]
    if max_tokens is not None:
        conds.append(f"{toks} <= {float(max_tokens)}")
    if min_mean_token_chars is not None:
        conds.append(f"{nonws} >= {toks} * {float(min_mean_token_chars)}")
    if max_mean_token_chars is not None:
        conds.append(f"{nonws} <= {toks} * {float(max_mean_token_chars)}")
    if min_stopword_frac is not None:
        conds.append(f"{sql_lang_count('en', col)} >= {toks} * "
                     f"{float(min_stopword_frac)}")
    return " AND ".join(conds)


def hash_sample(ds, key_col: str, modulus: int = 10, keep: int = 0):
    """Deterministic hash sampling: keep rows whose
    ``md5_hash64(str(key)) % modulus == keep`` — reproducible across runs,
    cluster sizes and shard layouts (the stable train/val-split op; unlike
    ``ds.random_sample`` the membership of a row never changes). SQL twin:
    ``md5_number_upper(key::VARCHAR) % modulus = keep``."""
    from pypdfium2_ray.functions.sketch import md5_hash64

    def f(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        mask = pa.array(
            [k is not None and md5_hash64(str(k).encode()) % modulus == keep
             for k in keys])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


#: weighted_hash_sample refuses weights above this: the md5 expansion is
#: w calls per row, so an unbounded weight column would smuggle per-row
#: O(w) work in — clip/bucket the weight upstream instead (loud, the
#: no-silent-caps discipline)
MAX_SAMPLE_WEIGHT = 64


def weighted_hash_sample(ds, key_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling without replacement: ``k`` rows,
    inclusion odds proportional to the row's positive INTEGER weight.

    Semantics are the expanded-multiset bottom-k (the bottom-k sketch
    over a weighted universe, e.g. Cohen & Kaplan, "Summarizing data
    using bottom-k sketches", PODC 2007 — public literature): each row
    competes as ``w`` independent unit copies, copy ``j`` drawing the
    64-bit key ``md5(key || ':' || j)``; the row's priority is its
    MINIMUM draw and the global ``k`` smallest priorities win (ties —
    2^-64 events — break by key).  Exactly reproduces "uniform bottom-k
    over the corpus with every row repeated w times, deduped by key",
    with no replication and no floats: integer md5 min instead of the
    ``u^(1/w)`` exponential-keys trick, whose libm ``pow`` the SQL twin
    could not match bit-for-bit.  Deterministic across runs, shard
    layouts and cluster sizes, like :func:`hash_sample`.

    The per-row ``w`` md5 calls are inherent per-value work
    (``hash_sample`` convention); weights must be small ints — buckets,
    quality tiers, clipped sizes — and > ``MAX_SAMPLE_WEIGHT`` raises.
    Selection is the ``stages/topk`` partial bound: only ``k x
    n_blocks`` (priority, row) partials ever move, no global sort.

    SQL twin: ``min(md5_number_upper(key::VARCHAR || ':' || j))`` over
    ``unnest(range(w))`` + ``ORDER BY p, key LIMIT k``.
    """
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.topk import topk
    if k < 1:
        raise ValueError("k must be >= 1")

    def pri(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        ws = t[weight_col].to_pylist()
        out = []
        for key, w in zip(keys, ws):
            if w is None or w < 1 or w != int(w):
                raise ValueError(
                    f"weighted_hash_sample: weight must be a positive "
                    f"integer, got {w!r} for key {key!r}")
            if w > MAX_SAMPLE_WEIGHT:
                raise ValueError(
                    f"weighted_hash_sample: weight {w} for key {key!r} "
                    f"exceeds MAX_SAMPLE_WEIGHT={MAX_SAMPLE_WEIGHT} — "
                    f"bucket/clip the weight column upstream (the md5 "
                    f"expansion is w hashes per row by design)")
            s = str(key)
            out.append(min(md5_hash64(f"{s}:{j}".encode())
                           for j in range(int(w))))
        return t.append_column("__pri", pa.array(out, pa.uint64()))

    ranked = ds.map_batches(pri, batch_format="pyarrow")
    win = topk(ranked, ["__pri", key_col], k, descending=False)
    return win.map_batches(lambda t: t.drop_columns(["__pri"]),
                           batch_format="pyarrow")


def substring_scan(ds, phrases: list[str], doc_col: str = "doc_id",
                   text_col: str = "text"):
    """Benchmark-contamination scan by SUBSTRING (the complement of the
    exact-hash ``q_decontaminate`` blocklist): which documents contain any
    of a small set of held-out phrases VERBATIM — the check run before a
    training set ships (benchmark prompts leak as substrings of longer
    pages, which exact-fingerprint dedup never catches).

    The phrase set is tiny by construction (benchmark suites are),
    so it rides into every task as a closure constant; per phrase one
    vectorized RE2 ``match_substring`` pass over the block — O(|P|)
    kernel launches, zero Python per row, no exchange (output rows are
    (doc_id, phrase) hits only). Emits one row per (doc, phrase) hit.
    """
    import pyarrow.compute as pc
    if not phrases:
        raise ValueError("substring_scan: empty phrase set")

    def scan(t: pa.Table) -> pa.Table:
        ids, hits = [], []
        did = pc.cast(t[doc_col], pa.int64())
        for p in phrases:
            m = pc.match_substring(t[text_col], p)
            sel = did.filter(m)
            ids.append(sel)
            hits.append(pa.array([p] * len(sel), pa.string()))
        return pa.table({
            doc_col: pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in ids]) if ids
            else pa.array([], pa.int64()),
            "phrase": pa.concat_arrays(hits) if hits
            else pa.array([], pa.string())})

    return ds.map_batches(scan, batch_format="pyarrow")


def mixture_sample(ds, key_col: str, group_col: str,
                   permille: dict[str, int], default_permille: int = 0):
    """Deterministic weighted MIXTURE sampling — the data-mixing primitive
    that re-weights sources into a training blend (keep source s at
    ``permille[s]/1000``): a row survives iff
    ``md5_hash64(str(key)) % 1000 < permille[group]``.

    Membership is a pure function of the row key, so the blend is
    reproducible across runs, shard layouts and cluster sizes, and NESTED
    samples are free: raising a source's permille strictly grows its
    subset (the thresholds slice one fixed hash order). Same hash twin as
    ``hash_sample`` (DuckDB ``md5_number_upper``); the per-row md5 is
    inherent to the contract. Thresholds ride in as a closure constant;
    lookup is a vectorized ``index_in`` + take, one mask compare per
    block, no exchange.
    """
    import numpy as np
    import pyarrow.compute as pc

    from pypdfium2_ray.functions.sketch import md5_hash64
    groups = sorted(permille)
    garr = pa.array(groups, pa.string())
    thr = np.array([permille[g] for g in groups] or [0], dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        h = np.array([md5_hash64(str(k).encode()) % 1000
                      for k in t[key_col].to_pylist()], dtype=np.int64)
        codes = pc.fill_null(pc.index_in(t[group_col], value_set=garr),
                             -1).to_numpy(zero_copy_only=False)
        limits = np.where(codes < 0, default_permille,
                          thr[np.where(codes < 0, 0, codes)])
        return t.filter(pa.array(h < limits))

    return ds.map_batches(f, batch_format="pyarrow")


def ngram_decontaminate(ds, heldout_texts: list[str], n: int = 3,
                        doc_col: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination by word n-GRAM OVERLAP — the GPT-3
    appendix-C discipline (Brown et al. 2020, public): drop every
    document sharing ANY word n-gram with a held-out evaluation set.
    Strictly stronger than the exact-hash blocklist (q_decontaminate)
    and than verbatim substring hits when the leak is paraphrased around
    a copied span.

    The held-out n-gram set is computed driver-side (the held-out corpus
    is small by definition) and broadcast as a closure constant. Per
    block: vectorized n-gram explode carrying doc ids
    (``freq.explode_ngrams``), one ``is_in`` against the broadcast set,
    per-block distinct of hit ids — only contaminated doc ids (tiny)
    leave the worker. The final anti join broadcasts those distinct ids
    back (``join.key_filter_join`` broadcast tier): zero payload shuffle
    end-to-end.
    """
    import re as _re

    import pyarrow.compute as pc

    from pypdfium2_ray.functions.text import WS_RE
    from pypdfium2_ray.stages.freq import explode_ngrams
    from pypdfium2_ray.stages.join import key_filter_join
    grams: set[str] = set()
    for h in heldout_texts:
        toks = [w for w in _re.split(WS_RE, h) if w]   # shared split class
        grams.update(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    if not grams:
        raise ValueError("ngram_decontaminate: held-out set has no n-grams")
    gram_arr = pa.array(sorted(grams), pa.string())

    def hits(t: pa.Table) -> pa.Table:
        g = explode_ngrams(t, n, col=text_col, doc_col=doc_col)
        m = pc.is_in(g["gram"], value_set=gram_arr)
        ids = pc.unique(g[doc_col].filter(m))
        return pa.table({doc_col: pc.cast(ids, pa.int64())})

    contaminated = ds.map_batches(hits, batch_format="pyarrow")
    return key_filter_join(ds, contaminated, doc_col, mode="anti")


def token_entropy(ds, id_col: str = "doc_id", col: str = "text"):
    """Per-document unigram Shannon entropy — the distribution-shape
    quality signal (low entropy = repetitive/boilerplate, high = diverse
    prose; the same family as repetition_counts but weighting by
    frequency, H = sum c_i/N * ln(N/c_i)).

    Pure per-block map, zero exchanges (a document's tokens stay in its
    block). Fixed-point oracle-parity discipline (stages/bm25.py:31-37):
    the one transcendental is ``floor(ln(N/c) * 1e6)`` per DISTINCT
    token, summed weighted by c as exact int64, then one floor division
    by N — ``entropy_micro = (sum c_i * floor(ln(N/c_i)*1e6)) // N`` —
    identical float64 inputs and platform libm on both numpy and DuckDB,
    so the driver oracle matches bit-for-bit. Empty docs report (0, 0).
    """
    import numpy as np
    import pyarrow.compute as pc

    from pypdfium2_ray.functions.text import WS_RE

    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        la = pc.split_pattern_regex(t[col], WS_RE)
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten()
        row = np.repeat(np.arange(len(la), dtype=np.int64),
                        np.diff(la.offsets.to_numpy()))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        row = row[keep.to_numpy(zero_copy_only=False)]
        n = np.bincount(row, minlength=len(la)).astype(np.int64)
        s = np.zeros(len(la), np.int64)
        if len(flat):
            d = flat.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            key = row * len(d.dictionary) + codes      # (doc, token) pair id
            uk, c = np.unique(key, return_counts=True)
            urow = uk // len(d.dictionary)
            lg = np.floor(np.log(n[urow] / c) * 1e6).astype(np.int64)
            np.add.at(s, urow, c.astype(np.int64) * lg)
        ent = np.where(n > 0, s // np.maximum(n, 1), 0)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "entropy_micro": pa.array(ent, pa.int64())})

    return ds.select_columns([id_col, col]) \
             .map_batches(f, batch_format="pyarrow")


def _gather_slices(data, starts, stops):
    """Build a large_string array whose i-th value is
    ``data[starts[i]:stops[i]]`` — one fancy-index gather over the
    shared byte buffer, no per-row Python."""
    import numpy as np

    lens = (stops - starts).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    total = int(offs[-1])
    idx = np.arange(total, dtype=np.int64) \
        - np.repeat(offs[:-1], lens) + np.repeat(starts, lens)
    payload = data[idx] if total else np.array([], np.uint8)
    return pa.Array.from_buffers(
        pa.large_utf8(), len(starts),
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(payload.tobytes())])


def kwic_first(ds, term: str, doc_col: str = "doc_id",
               text_col: str = "text", ctx: int = 24):
    """Keyword-in-context concordance, first occurrence per document:
    for every doc containing *term*, emit its 1-based position plus
    ``ctx`` characters of left and right context — the corpus-inspection
    primitive behind every "show me how this token is used" audit.
    Docs without the term emit nothing (the twin's ``WHERE pos > 0``).

    ZERO exchanges — a pure streaming map. The kernel is
    ``pc.find_substring`` (one vectorized pass) plus two fancy-index
    gathers over the Arrow byte buffer (:func:`_gather_slices`) — no
    per-row Python. Positions and context windows are BYTE offsets,
    identical to the SQL twin's character semantics on ASCII corpora
    (this repo's synthetic corpus is ASCII; for full UTF-8 parity swap
    in a codepoint index at ~3x the cost)."""
    import numpy as np

    import pyarrow.compute as pc

    tl = len(term.encode())

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].combine_chunks()
        pos = pc.find_substring(texts, term) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pos >= 0
        mask = pa.array(keep)
        arr = texts.filter(mask).cast(pa.large_utf8())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        p = pos[keep]
        voff = np.frombuffer(arr.buffers()[1], np.int64)[
            arr.offset: arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        starts = voff[:-1]
        left = _gather_slices(data, starts + np.maximum(p - ctx, 0),
                              starts + p)
        right = _gather_slices(data, starts + p + tl,
                               np.minimum(starts + p + tl + ctx,
                                          voff[1:]))
        return pa.table({doc_col: pc.filter(t[doc_col], mask),
                         "pos": pa.array(p + 1, pa.int64()),
                         "left_ctx": left, "right_ctx": right})

    return ds.select_columns([doc_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")
