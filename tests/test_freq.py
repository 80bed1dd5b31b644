"""Frequency/cardinality ops (stages/freq): exact heavy hitters via
Misra-Gries sketch-then-verify, exact grouped distinct counts, HLL tier.

The driver oracle exercises these on near-uniform synthetic tables (the
MG reduction barely fires there); these tests use zipf-skewed data so the
sketch genuinely reduces (err > 0) and the completeness guarantee — not
just the trivial small-vocabulary path — is what's being verified.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pypdfium2_ray.stages.freq import (
    _hll_estimate, _hll_registers, _mg_reduce, explode_bigrams,
    explode_tokens, grouped_distinct_count, grouped_distinct_hll,
    heavy_hitters)


@pytest.fixture(scope="module")
def zipf_tokens(tmp_path_factory):
    """Sharded parquet of ~100k zipf-distributed tokens (heavy skew: the
    sketch must reduce) + the exact pandas truth."""
    rng = np.random.default_rng(1)
    toks = np.array([f"w{int(i)}" for i in rng.zipf(1.5, 100_000)
                     if i < 10_000])
    df = pd.DataFrame({"token": toks})
    d = tmp_path_factory.mktemp("zipf")
    for i in range(4):
        pq.write_table(pa.Table.from_pandas(df.iloc[i::4], preserve_index=False),
                       str(d / f"p{i}.parquet"))
    return str(d), df


def test_mg_reduce_bound():
    """Reduction invariant: any item's true count <= stored + decrement,
    and items with count > decrement survive."""
    rng = np.random.default_rng(2)
    counts = rng.integers(1, 1000, 500)
    vals = np.arange(500)
    kv, kc, dec = _mg_reduce(vals, counts, 64)
    assert kv.size <= 64
    stored = dict(zip(kv, kc))
    for v, c in zip(vals, counts):
        assert c <= stored.get(v, 0) + dec


def test_heavy_hitters_exact_on_skew(ray_session, zipf_tokens):
    """Sketch pass genuinely reduces (k << vocabulary), yet the verified
    output equals the exact groupby-HAVING answer value-for-value."""
    import ray.data as rd
    d, df = zipf_tokens
    out = heavy_hitters(lambda: rd.read_parquet(d), "token",
                        threshold_count=500, k_sketch=512).to_pandas()
    truth = df["token"].value_counts()
    truth = truth[truth >= 500].rename("n").astype("int64")
    got = out.set_index("token")["n"].sort_index()
    assert got.equals(truth.sort_index())


def test_heavy_hitters_threshold_frac(ray_session, zipf_tokens):
    import ray.data as rd
    d, df = zipf_tokens
    thr = max(1, int(np.ceil(0.01 * len(df))))
    out = heavy_hitters(lambda: rd.read_parquet(d), "token",
                        threshold_frac=0.01, k_sketch=1024).to_pandas()
    truth = df["token"].value_counts()
    assert set(out["token"]) == set(truth[truth >= thr].index)


def test_heavy_hitters_undersized_sketch_raises(ray_session, zipf_tokens):
    """k < N/threshold cannot certify completeness — must raise with the
    sizing rule, never return a silent subset."""
    import ray.data as rd
    d, _df = zipf_tokens
    with pytest.raises(ValueError, match="Raise k_sketch"):
        heavy_hitters(lambda: rd.read_parquet(d), "token",
                      threshold_count=3, k_sketch=8)


def test_explode_tokens_and_bigrams():
    t = pa.table({"text": [" a b  c", "d", "", "e f"]})
    assert explode_tokens(t)["token"].to_pylist() == \
        ["a", "b", "c", "d", "e", "f"]
    # bigrams never straddle documents; <2-token docs contribute nothing
    assert explode_bigrams(t)["token"].to_pylist() == ["a b", "b c", "e f"]
    assert explode_bigrams(pa.table({"text": [" ", ""]}))["token"] \
        .to_pylist() == []


def test_distinct_count_exact(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    ev = pd.DataFrame({"k": rng.integers(0, 5, 50_000),
                       "u": rng.integers(0, 3_000, 50_000)})
    p = str(tmp_path / "ev.parquet")
    ev.to_parquet(p, index=False)
    import ray.data as rd
    want = ev.groupby("k")["u"].nunique().sort_index()
    for combine in ("single_block", "exchange"):
        got = grouped_distinct_count(
            rd.read_parquet(p, override_num_blocks=4), ["k"], "u",
            num_partitions=4, combine=combine) \
            .to_pandas().set_index("k")["n_distinct"].sort_index()
        assert (got == want).all()


def test_hll_relative_error_bound(ray_session, tmp_path):
    """HLL estimates within 5% (~3 sigma at p=12) of exact, on both
    combine tiers and across block layouts (merge = register max is
    layout-independent up to nothing — estimates are IDENTICAL because
    the merged register state is)."""
    rng = np.random.default_rng(4)
    ev = pd.DataFrame({"k": rng.integers(0, 5, 60_000),
                       "u": rng.integers(0, 5_000, 60_000)})
    p = str(tmp_path / "ev.parquet")
    ev.to_parquet(p, index=False)
    import ray.data as rd
    want = ev.groupby("k")["u"].nunique().sort_index()
    ests = []
    for blocks in (2, 8):
        got = grouped_distinct_hll(
            rd.read_parquet(p, override_num_blocks=blocks), ["k"], "u",
            combine="single_block") \
            .to_pandas().set_index("k")["n_distinct_est"].sort_index()
        assert (((got - want).abs() / want) < 0.05).all()
        ests.append(got)
    # register-max merging makes the ESTIMATE layout-independent (unlike
    # t-digest): same registers regardless of which block saw which row
    assert ests[0].equals(ests[1])


def test_hll_registers_deterministic():
    s = pd.Series(["a", "b", "c", "a"])
    gid = np.zeros(4, np.int64)
    r1 = _hll_registers(gid, s, 1)
    r2 = _hll_registers(gid, s, 1)
    assert (r1 == r2).all()
    assert int(_hll_estimate(r1)[0]) == 3        # tiny-range correction


def test_query_entries_agree(ray_session):
    """distinct_users_hll (md5 fixed-point tier, floor(est*1e6)) within 5%
    of the exact distinct_users on the same table."""
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    exact = E.queries()["distinct_users"](sf).to_pandas() \
        .set_index("event_type")["n_distinct"].sort_index()
    est = E.queries()["distinct_users_hll"](sf).to_pandas() \
        .set_index("event_type")["est_micro"].sort_index() / 1e6
    assert set(est.index) == set(exact.index)
    assert (((est - exact).abs() / exact) < 0.05).all()


def test_hll_md5_tier_sql_exact(ray_session, tmp_path):
    """The md5 HLL tier's ESTIMATE (registers, exact-integer harmonic sum,
    linear-counting correction, collisions included) equals the DuckDB SQL
    twin bit-for-bit, and is partition-invariant across block layouts and
    both combine tiers."""
    import duckdb
    import ray.data as rd
    rng = np.random.default_rng(9)
    ev = pd.DataFrame({"k": rng.integers(0, 4, 30_000),
                       "u": rng.integers(0, 8_000, 30_000)})
    p = str(tmp_path / "ev.parquet")
    ev.to_parquet(p, index=False)
    sql = """
        WITH vals AS (SELECT DISTINCT k, CAST(u AS VARCHAR) AS v FROM ev),
        h AS (SELECT k, md5_number_upper(v) AS h FROM vals),
        rr AS (SELECT k, CAST(h >> 52 AS BIGINT) AS idx,
                      CASE WHEN (h & 4503599627370495::UBIGINT) = 0 THEN 53
                           ELSE 53 - length(bin(h & 4503599627370495::UBIGINT))
                      END AS rho FROM h),
        regs AS (SELECT k, idx, MAX(rho) AS m FROM rr GROUP BY k, idx),
        agg AS (SELECT k, COUNT(*) AS npres,
                       SUM(CAST(1::BIGINT << (53 - m) AS HUGEINT)) AS s
                FROM regs GROUP BY k),
        est AS (SELECT k, 4096 - npres AS zeros,
                       CAST(4096 - npres AS HUGEINT)
                         * 9007199254740992::HUGEINT + s AS n FROM agg)
        SELECT k, CAST(floor(CASE
              WHEN ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                   * 9007199254740992.0 / CAST(n AS DOUBLE) <= 10240.0
               AND zeros > 0
              THEN 4096.0 * ln(4096.0 / zeros)
              ELSE ((0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0)
                   * 9007199254740992.0 / CAST(n AS DOUBLE)
            END * 1e6) AS BIGINT) AS est_micro
        FROM est"""
    want = duckdb.connect().execute(sql).fetchdf() \
        .set_index("k")["est_micro"].sort_index()
    for blocks, combine in ((2, "single_block"), (8, "exchange")):
        got = grouped_distinct_hll(
            rd.read_parquet(p, override_num_blocks=blocks), ["k"], "u",
            out="est_micro", combine=combine, hash="md5") \
            .to_pandas().set_index("k")["est_micro"].sort_index()
        assert got.equals(want), (combine, got, want)


def test_explode_ngrams_boundaries(ray_session):
    import pyarrow as pa

    from pypdfium2_ray.stages.freq import explode_ngrams
    t = pa.table({"doc_id": pa.array([5, 6, 7], pa.int64()),
                  "text": ["a b c d", "x  y", ""]})
    g3 = explode_ngrams(t, 3, doc_col="doc_id").to_pydict()
    assert g3 == {"gram": ["a b c", "b c d"], "doc_id": [5, 5]}
    g2 = explode_ngrams(t, 2, doc_col="doc_id").to_pydict()
    # no cross-document "d x" or "y <empty>" windows
    assert g2 == {"gram": ["a b", "b c", "c d", "x y"],
                  "doc_id": [5, 5, 5, 6]}
    assert explode_ngrams(t, 5, doc_col="doc_id").num_rows == 0


def test_ngram_decontaminate(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pypdfium2_ray.stages.textstats import ngram_decontaminate
    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": ["the quick brown fox",        # shares "quick brown fox"
                 "a quick brown dog",          # bigram overlap only -> kept
                 "totally unrelated words",
                 "prefix quick brown fox suffix"],  # hit mid-document
    })
    ds = rd.from_arrow(docs).repartition(2)
    out = ngram_decontaminate(ds, ["benchmark: quick brown fox?"], n=3)
    # held-out trigrams: {"benchmark: quick brown", "quick brown fox?"} --
    # note "fox?" != "fox": punctuation is part of the whitespace token
    assert set(out.to_pandas()["doc_id"]) == {0, 1, 2, 3}
    out2 = ngram_decontaminate(ds, ["benchmark quick brown fox end"], n=3)
    assert set(out2.to_pandas()["doc_id"]) == {1, 2}
    with pytest.raises(ValueError):
        ngram_decontaminate(ds, ["too short"], n=3)


# ---------------------------------------------------------------------------
# Count-Min sketch

def _cm_corpus():
    import pyarrow as pa
    # zipf-ish: 'alpha' x 60, 'beta' x 25, tail singletons
    vals = ["alpha"] * 60 + ["beta"] * 25 + [f"tail{i}" for i in range(40)]
    return pa.table({"tok": pa.array(vals, pa.string())})


def test_count_min_never_underestimates(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import cm_estimate, count_min_sketch
    t = _cm_corpus()
    sk = count_min_sketch(rd.from_arrow(t), "tok",
                          width=64, depth=4).to_pandas()
    sk = __import__("pyarrow").Table.from_pandas(sk, preserve_index=False)
    est = cm_estimate(sk, ["alpha", "beta", "tail0", "absent"],
                      width=64, depth=4).to_pydict()
    got = dict(zip(est["value"], est["est"]))
    assert got["alpha"] >= 60 and got["beta"] >= 25 and got["tail0"] >= 1
    # eps*N bound: e/width * N = 2.718/64 * 125 ~ 5.3
    n = 125
    for v, true in (("alpha", 60), ("beta", 25), ("tail0", 1),
                    ("absent", 0)):
        assert got[v] <= true + 6


def test_count_min_partition_invariant(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import count_min_sketch
    t = _cm_corpus()
    a = count_min_sketch(rd.from_arrow(t), "tok",
                         width=32, depth=3).to_pandas()
    b = count_min_sketch(rd.from_arrow(t).repartition(9), "tok",
                         width=32, depth=3, num_partitions=5).to_pandas()
    key = ["d", "cell"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.values.tolist() == b.values.tolist()
    # total mass per depth row == N exactly (sums are exact ints)
    assert (a.groupby("d")["count"].sum() == 125).all()


def test_join_size_exact_matches_true_join(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import exact_join_size
    a = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3, 9], pa.int64())})
    b = pa.table({"k": pa.array([1, 2, 2, 3, 7], pa.int64())})
    # true join size: 2*1 + 1*2 + 3*1 = 7
    out = exact_join_size(rd.from_arrow(a).repartition(3), "k",
                          rd.from_arrow(b), "k").take_all()
    assert out == [{"exact": 7}]


def test_join_size_exact_empty_side(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import exact_join_size
    a = pa.table({"k": pa.array([1, 2], pa.int64())})
    b = pa.table({"k": pa.array([], pa.int64())})
    out = exact_join_size(rd.from_arrow(a), "k",
                          rd.from_arrow(b), "k").take_all()
    assert out == [{"exact": 0}]


def test_cm_join_size_never_underestimates(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import cm_join_size, exact_join_size
    rng = __import__("numpy").random.default_rng(7)
    a = pa.table({"k": pa.array(rng.integers(0, 40, 500), pa.int64())})
    b = pa.table({"k": pa.array(rng.integers(0, 60, 300), pa.int64())})
    exact = exact_join_size(rd.from_arrow(a), "k",
                            rd.from_arrow(b), "k").take_all()[0]["exact"]
    est = cm_join_size(rd.from_arrow(a).repartition(4), "k",
                       rd.from_arrow(b), "k",
                       width=256, depth=4).take_all()[0]["est"]
    assert est >= exact
    # E[excess] <= N_A*N_B/width = 500*300/256 ~ 586 per depth row; min
    # over 4 rows stays well inside 3x that in practice
    assert est <= exact + 3 * (500 * 300 // 256)


def test_cm_join_size_partition_invariant(ray_session):
    import ray.data as rd
    from pypdfium2_ray.stages.freq import cm_join_size
    a = pa.table({"k": pa.array(list(range(30)) * 3, pa.int64())})
    b = pa.table({"k": pa.array(list(range(0, 60, 2)), pa.int64())})
    one = cm_join_size(rd.from_arrow(a), "k", rd.from_arrow(b), "k",
                       width=128, depth=3).take_all()
    two = cm_join_size(rd.from_arrow(a).repartition(7), "k",
                       rd.from_arrow(b).repartition(2), "k",
                       width=128, depth=3,
                       num_partitions=5).take_all()
    assert one == two
