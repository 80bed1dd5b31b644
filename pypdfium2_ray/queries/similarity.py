"""Similarity-search queries (ANN/IVF/PQ/kmeans tiers).

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
from pypdfium2_ray.queries.textstats import *  # noqa: F401,F403,E501
from pypdfium2_ray.queries.dedup import *  # noqa: F401,F403,E501

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
    from pypdfium2_ray.stages.pq import (
        pq_encode_exact, pq_topk_exact, train_pq_exact)
    queries = _query_vectors(sf_dir, ANN_QUERY_IDS)
    books = train_pq_exact(_embeddings(sf_dir), m=8, k=8, n_iter=3,
                           scale=1000)
    with _hint(sf_dir, "embeddings"):
        codes = pq_encode_exact(_embeddings(sf_dir), books, scale=1000)
        return pq_topk_exact(codes, queries, books, k=ANN_K, scale=1000)


def _pq_topk_sql(m: int = 8, k: int = 8, n_iter: int = 3,
                 scale: int = 1000, topk: int = 10,
                 qids=(0, 1, 2)) -> str:
    """Unrolled-CTE twin of the integer-exact PQ chain — the per-subspace
    generalization of dedup._kmeans_sql: every CTE carries a ``sub``
    column; training is n_iter (assign, update, coalesce) triples over
    (sub, cluster, dim); codes are the final per-(vec_id, sub)
    assignment; the ADC score is the exact integer sum over subspaces of
    the query-subvector x assigned-centroid inner products; top-k breaks
    ties (sim DESC, neighbor_id)."""
    def assign(name, cents):
        return f"""{name} AS (
  SELECT vec_id, sub, cluster FROM (
    SELECT vec_id, sub, cluster,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cluster) AS rn
    FROM (SELECT v.vec_id, v.sub, c.cluster,
                 sum((v.val - c.val) * (v.val - c.val)) AS dist
          FROM v JOIN {cents} c ON c.sub = v.sub AND c.dim = v.dim
          GROUP BY 1, 2, 3))
  WHERE rn = 1)"""

    ctes = [f"""v AS (
  SELECT vec_id::BIGINT AS vec_id,
         ((generate_subscripts(embedding, 1) - 1) // (len(embedding) // {m}))
           ::BIGINT AS sub,
         ((generate_subscripts(embedding, 1) - 1) % (len(embedding) // {m}))
           ::BIGINT AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale})
              AS BIGINT) AS val
  FROM embeddings)""", f"""seeds AS (
  SELECT vec_id::BIGINT AS vec_id,
         row_number() OVER (
             ORDER BY md5_number_upper(vec_id::VARCHAR) >> 1, vec_id)
           - 1 AS cluster
  FROM embeddings
  QUALIFY cluster < {k})""", """c0 AS (
  SELECT s.cluster, v.sub, v.dim, v.val
  FROM seeds s JOIN v USING (vec_id))"""]
    for i in range(1, n_iter + 1):
        ctes.append(assign(f"a{i}", f"c{i - 1}"))
        ctes.append(f"""u{i} AS (
  SELECT a.sub, a.cluster, v.dim,
         CAST(floor(CAST(sum(v.val) AS DOUBLE) / count(DISTINCT v.vec_id))
              AS BIGINT) AS val
  FROM a{i} a JOIN v ON v.vec_id = a.vec_id AND v.sub = a.sub
  GROUP BY 1, 2, 3)""")
        ctes.append(f"""c{i} AS (
  SELECT c.sub, c.cluster, c.dim, COALESCE(u.val, c.val) AS val
  FROM c{i - 1} c LEFT JOIN u{i} u
    ON u.sub = c.sub AND u.cluster = c.cluster AND u.dim = c.dim)""")
    ctes.append(assign("afin", f"c{n_iter}"))
    ctes.append(f"""qv AS (
  SELECT * FROM v WHERE vec_id IN ({', '.join(str(q) for q in qids)}))""")
    ctes.append(f"""lut AS (
  SELECT q.vec_id AS query_id, c.sub, c.cluster,
         sum(q.val * c.val) AS d
  FROM qv q JOIN c{n_iter} c ON c.sub = q.sub AND c.dim = q.dim
  GROUP BY 1, 2, 3)""")
    ctes.append("""scores AS (
  SELECT l.query_id, a.vec_id AS neighbor_id,
         CAST(sum(l.d) AS BIGINT) AS sim
  FROM afin a JOIN lut l ON l.sub = a.sub AND l.cluster = a.cluster
  WHERE a.vec_id <> l.query_id
  GROUP BY 1, 2)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT query_id, neighbor_id, sim FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rn
  FROM scores)
WHERE rn <= {topk}""")


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




__all__ = [_n for _n in dict(globals()) if not _n.startswith('__')]
