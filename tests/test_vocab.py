"""Vocabulary coverage table (stages/vocab.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.vocab import token_census, vocab_coverage


def _docs(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def test_census_counts_occurrences():
    with partition_hint(2):
        out = token_census(rd.from_arrow(_docs(
            ["a b a", "b c", None, ""]))).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    assert got == {"a": 2, "b": 2, "c": 1}


def test_coverage_table_rank_and_totals():
    texts = ["x x x y y z", "x y w"]           # x:4 y:3 z:1 w:1
    with partition_hint(2):
        out = vocab_coverage(rd.from_arrow(_docs(texts)),
                             min_count=2).to_pandas()
    rows = sorted(map(tuple, out.to_numpy()))
    # only x and y survive the cut; totals count z and w too
    assert rows == [(1, "x", 4, 4, 9), (2, "y", 3, 7, 9)]


def test_rank_tie_breaks_by_token():
    texts = ["b a", "a b"]                     # a:2 b:2 — tie
    with partition_hint(2):
        out = vocab_coverage(rd.from_arrow(_docs(texts)),
                             min_count=1).to_pandas()
    assert list(out.sort_values("rank")["token"]) == ["a", "b"]


def test_scan_cap_is_loud():
    with pytest.raises(ValueError, match="max_vocab_scan"):
        with partition_hint(2):
            vocab_coverage(rd.from_arrow(_docs(["a b c d e"])),
                           min_count=1, max_vocab_scan=2).to_pandas()


def test_partition_invariance():
    texts = [f"tok{i % 7} tok{i % 3} filler{i}" for i in range(40)]

    def run(parts, blocks):
        ds = rd.from_arrow(_docs(texts)).repartition(blocks)
        with partition_hint(parts):
            out = vocab_coverage(ds, min_count=3).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(3, 5)
