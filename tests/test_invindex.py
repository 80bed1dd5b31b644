"""Inverted-index build (stages/invindex) + per-group top-k
(stages/topk.grouped_topk): exact contents vs pandas references, across
block layouts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pypdfium2_ray.stages.invindex import (
    build_inverted_index, explode_doc_tokens)


def test_explode_doc_tokens():
    t = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                  "text": [" a b  a", "", "b"]})
    out = explode_doc_tokens(t)
    assert out["doc_id"].to_pylist() == [7, 7, 7, 9]
    assert out["term"].to_pylist() == ["a", "b", "a", "b"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(40)])
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
            for _ in range(600)]
    df = pd.DataFrame({"doc_id": np.arange(600, dtype=np.int64),
                       "text": docs})
    p = str(tmp_path_factory.mktemp("inv") / "docs.parquet")
    df.to_parquet(p, index=False)
    return p, df


def _expected_index(df: pd.DataFrame) -> dict[str, list[int]]:
    post: dict[str, set] = {}
    for did, text in zip(df["doc_id"], df["text"]):
        for tok in text.split(" "):
            if tok:
                post.setdefault(tok, set()).add(did)
    return {t: sorted(s) for t, s in post.items()}


def test_inverted_index_exact_postings(ray_session, corpus):
    """Postings are EXACTLY the sorted distinct doc ids per term — list
    contents asserted (the driver query only hash-checks scalar
    summaries), identical across block layouts."""
    import ray.data as rd
    p, df = corpus
    want = _expected_index(df)
    for blocks in (2, 8):
        idx = build_inverted_index(
            rd.read_parquet(p, override_num_blocks=blocks),
            num_partitions=4).to_pandas()
        got = {r["term"]: list(r["postings"]) for _, r in idx.iterrows()}
        assert got == want, blocks
        assert (idx["df"] == idx["postings"].map(len)).all()


def test_grouped_topk_matches_pandas(ray_session, tmp_path):
    """Per-group top-k == pandas sort+groupby.head, ties deterministic."""
    import ray.data as rd

    from pypdfium2_ray.stages.topk import grouped_topk
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"g": rng.integers(0, 30, 5_000),
                       "score": rng.integers(0, 50, 5_000),
                       "id": np.arange(5_000, dtype=np.int64)})
    p = str(tmp_path / "g.parquet")
    df.to_parquet(p, index=False)
    got = grouped_topk(rd.read_parquet(p, override_num_blocks=4),
                       ["g"], ["score", "id"], k=3,
                       descending=[True, False], num_partitions=4) \
        .to_pandas()
    want = df.sort_values(["score", "id"], ascending=[False, True],
                          kind="mergesort").groupby("g").head(3)
    key = lambda d: sorted(map(tuple, d[["g", "score", "id"]].to_numpy()))
    assert key(got) == key(want)
    assert len(got) == len(want)


def test_boolean_search(ray_session, corpus):
    """AND/NOT retrieval matches the brute-force set; zero exchanges
    (pure map) so no partition hint is needed."""
    import ray.data as rd

    from pypdfium2_ray.stages.invindex import boolean_search
    p, df = corpus
    want = sorted(
        did for did, text in zip(df["doc_id"], df["text"])
        if {"w1", "w2"} <= set(text.split()) and "w3" not in text.split())
    got = boolean_search(rd.read_parquet(p, override_num_blocks=4),
                         ["w1", "w2"], ["w3"]).to_pandas()
    assert sorted(got["doc_id"]) == want
    assert len(want) > 0
    with pytest.raises(ValueError):
        boolean_search(rd.read_parquet(p), [], ["w3"])


@pytest.mark.parametrize("nparts", [1, 5])
def test_grouped_dense_topk(ray_session, nparts):
    import ray.data as rd

    from pypdfium2_ray.stages.topk import grouped_dense_topk
    rng = np.random.RandomState(9)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n).tolist(),
        "rid": np.arange(n, dtype=np.int64),
        # tiny value domain -> heavy ties, multi-row rank classes
        "v": rng.randint(0, 12, n).astype(np.int64),
    })
    got = grouped_dense_topk(rd.from_pandas(df).repartition(nparts),
                             ["g"], "v", k=3) \
        .to_pandas().sort_values("rid").reset_index(drop=True)
    r = df.groupby("g")["v"].rank(method="dense", ascending=False)
    exp = df.assign(rank=r.astype("int64"))
    exp = exp[exp["rank"] <= 3].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64"}), exp)
    # ties really exercised: some rank class holds > 1 row
    assert (exp.groupby(["g", "rank"]).size() > 1).any()
