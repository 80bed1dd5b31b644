"""Hierarchical ROLLUP aggregate (stages/rollup.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.rollup import rollup_aggregate

ROWS = [("a", "en", 10), ("a", "en", 20), ("a", "de", 5),
        ("b", "en", 7), ("b", "fr", 1), ("b", "fr", 2)]


def _t(rows=ROWS):
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64())})


def _run(t, parts=2, **kw):
    with partition_hint(parts):
        out = rollup_aggregate(
            rd.from_arrow(t), keys=["source", "lang"],
            aggs={"cnt": ("count",), "tot": ("sum", "n"),
                  "mx": ("max", "n")}, **kw).to_pandas()
    return sorted(map(tuple, out.fillna("~").to_numpy()))


def test_rollup_three_levels():
    got = _run(_t())
    assert (("a", "en", 2, 30, 20, 2) in got)          # finest
    assert (("a", "~", 3, 35, 20, 1) in got)           # source subtotal
    assert (("b", "~", 3, 10, 7, 1) in got)
    assert (("~", "~", 6, 45, 20, 0) in got)           # grand total
    assert len(got) == 4 + 2 + 1


def test_matches_duckdb_rollup(tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    p = tmp_path / "t.parquet"
    pq.write_table(_t(), p)
    orc = duckdb.sql(f"""
        SELECT COALESCE(source, '~') AS source, COALESCE(lang, '~') AS lang,
               count(*)::BIGINT AS cnt, sum(n)::BIGINT AS tot,
               max(n)::BIGINT AS mx,
               (2 - grouping(source) - grouping(lang))::BIGINT AS level
        FROM read_parquet('{p}') GROUP BY ROLLUP(source, lang)
        """).fetchall()
    assert _run(_t(), fill="~") == sorted(map(tuple, orc))


def test_partition_invariance():
    rows = [(f"s{i % 5}", f"l{i % 3}", i) for i in range(100)]

    def run(parts, blocks):
        ds = rd.from_arrow(_t(rows)).repartition(blocks)
        with partition_hint(parts):
            out = rollup_aggregate(
                ds, keys=["source", "lang"],
                aggs={"cnt": ("count",), "tot": ("sum", "n")},
                fill="").to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(4, 7)


def test_single_key_rollup():
    got = _run(_t())  # smoke above covers 2 keys; now 1 key
    with partition_hint(2):
        out = rollup_aggregate(
            rd.from_arrow(_t()), keys=["source"],
            aggs={"cnt": ("count",)}, fill="*").to_pandas()
    rows = sorted(map(tuple, out.to_numpy()))
    assert rows == [("*", 6, 0), ("a", 3, 1), ("b", 3, 1)]


def test_validation():
    with pytest.raises(ValueError):
        rollup_aggregate(rd.from_arrow(_t()), keys=[], aggs={})
    with pytest.raises(ValueError):
        rollup_aggregate(rd.from_arrow(_t()), keys=["source"],
                         aggs={"m": ("avg", "n")})


def _run_cube(t, parts=2, **kw):
    from pypdfium2_ray.stages.rollup import cube_aggregate
    with partition_hint(parts):
        out = cube_aggregate(
            rd.from_arrow(t), keys=["source", "lang"],
            aggs={"cnt": ("count",), "tot": ("sum", "n"),
                  "mx": ("max", "n")}, **kw).to_pandas()
    return sorted(map(tuple, out.fillna("~").to_numpy()))


@pytest.mark.parametrize("parts", [1, 3])
def test_cube_matches_duckdb(tmp_path, parts):
    import duckdb
    import pyarrow.parquet as pq
    p = tmp_path / f"c{parts}.parquet"
    pq.write_table(_t(), p)
    orc = duckdb.sql(f"""
        SELECT COALESCE(source, '~') AS source, COALESCE(lang, '~') AS lang,
               count(*)::BIGINT AS cnt, sum(n)::BIGINT AS tot,
               max(n)::BIGINT AS mx,
               (2 * grouping(source) + grouping(lang))::BIGINT AS gid
        FROM read_parquet('{p}') GROUP BY CUBE(source, lang)
        """).fetchall()
    assert _run_cube(_t(), parts=parts) == sorted(map(tuple, orc))


def test_cube_lang_only_slice():
    """The subset ROLLUP(source, lang) cannot produce: per-lang across
    all sources (grouping_id = 2: source rolled up, lang kept)."""
    got = _run_cube(_t())
    assert ("~", "en", 3, 37, 20, 2) in got
    assert ("~", "fr", 2, 3, 2, 2) in got
    assert len(got) == 4 + 2 + 3 + 1   # finest + source + lang + total
