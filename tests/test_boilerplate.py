"""Per-source boilerplate line stripping (stages/boilerplate.py)."""

import hashlib

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.boilerplate import (strip_boilerplate,
                                              template_lines)
from pypdfium2_ray.stages.exchange import partition_hint


def _corpus(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string())})


def _run(t, parts=2, **kw):
    with partition_hint(parts):
        out = strip_boilerplate(rd.from_arrow(t), **kw).to_pandas()
    return {int(r.doc_id): (r.clean_text, int(r.n_dropped))
            for r in out.itertuples()}


HDR, FTR = "NAV home about", "(c) footer"


def test_strip_semantics():
    # 5 docs on host a: header+footer everywhere (stripped), bodies
    # unique (kept); host b has 2 distinct docs sharing nothing.
    rows = [(i, f"{HDR}\nbody {i}\n{FTR}", "a") for i in range(5)]
    rows += [(10, "solo one", "b"), (11, "solo two", "b")]
    out = _run(_corpus(rows))
    for i in range(5):
        assert out[i] == (f"body {i}", 2)
    assert out[10] == ("solo one", 0)
    assert out[11] == ("solo two", 0)


def test_all_boilerplate_doc_survives_as_empty():
    rows = [(i, HDR, "a") for i in range(4)]
    out = _run(_corpus(rows))
    assert all(out[i] == ("", 1) for i in range(4))


def test_threshold_and_min_docs():
    # line in 2/10 docs == exactly 20%: stripped; 2/11 docs: kept;
    # line in 1/5: blocked by min_docs=2 even though 1*5 >= 5*1.
    def host(n, n_dup, src):
        rows = [(100 * ord(src) + i, f"dup line\nbody {src}{i}", src)
                for i in range(n_dup)]
        rows += [(100 * ord(src) + 50 + i, f"only {src}{i}", src)
                 for i in range(n - n_dup)]
        return rows

    out = _run(_corpus(host(10, 2, "x") + host(11, 2, "y") + host(5, 1, "z")))
    assert out[100 * ord("x")] == ("body x0", 1)      # 2*5 >= 10
    assert out[100 * ord("y")][1] == 0                 # 2*5 < 11
    assert out[100 * ord("z")][1] == 0                 # min_docs gate


def test_cross_source_isolation():
    # the same line frequent on host a but rare on host b is stripped
    # only from a's docs.
    rows = [(i, f"shared\nbody a{i}", "a") for i in range(3)]
    rows += [(10 + i, f"shared\nbody b{i}" if i == 0 else f"own b{i}", "b")
             for i in range(6)]
    out = _run(_corpus(rows))
    assert all(out[i] == (f"body a{i}", 1) for i in range(3))
    assert out[10] == ("shared\nbody b0", 0)


def test_empty_text_and_null_text():
    # '' is one empty line; with 3 of 4 docs empty the empty line is a
    # template, so those docs stay '' with n_dropped=1 and the real doc
    # keeps its body. Null-text docs never appear in the output.
    rows = [(1, "", "a"), (2, "", "a"), (3, "", "a"),
            (4, "real body", "a"), (5, None, "a")]
    out = _run(_corpus(rows))
    assert out[1] == ("", 1) and out[3] == ("", 1)
    assert out[4] == ("real body", 0)
    assert 5 not in out


def test_partition_and_layout_invariance():
    rows = [(i, f"{HDR}\nbody {i % 4}\n{FTR}", f"s{i % 3}")
            for i in range(30)]
    t = _corpus(rows)

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            out = strip_boilerplate(ds).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(4, 6)


def test_template_lines_census():
    rows = [(i, f"{HDR}\nbody {i}", "a") for i in range(5)]
    with partition_hint(2):
        out = template_lines(rd.from_arrow(_corpus(rows))).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source"], r["line_md5"], r["n_docs"], r["src_docs"]) == \
        ("a", hashlib.md5(HDR.encode()).hexdigest(), 5, 5)


def test_repeated_lines_census_and_global_strip():
    from pypdfium2_ray.stages.boilerplate import (repeated_lines,
                                                  strip_repeated_lines)
    # "common" in 12 docs (>= 10), "semi" in 9 (< 10), bodies unique
    rows = [(i, f"common\nsemi\nbody {i}" if i < 9
             else f"common\nbody {i}", "s") for i in range(12)]
    t = _corpus(rows)
    with partition_hint(2):
        census = repeated_lines(rd.from_arrow(t), min_count=10).to_pandas()
    assert len(census) == 1
    assert census.iloc[0]["line_md5"] == hashlib.md5(b"common").hexdigest()
    assert census.iloc[0]["n_docs"] == 12
    with partition_hint(2):
        out = strip_repeated_lines(rd.from_arrow(t),
                                   min_count=10).to_pandas()
    got = {int(r.doc_id): (r.clean_text, int(r.n_dropped))
           for r in out.itertuples()}
    assert got[0] == ("semi\nbody 0", 1)
    assert got[11] == ("body 11", 1)


def test_strip_repeated_crosses_sources():
    # global census ignores source boundaries: 5+5 docs of two sources
    # share a line -> stripped with min_count=10
    from pypdfium2_ray.stages.boilerplate import strip_repeated_lines
    rows = [(i, f"shared\nbody {i}", "a" if i < 5 else "b")
            for i in range(10)]
    with partition_hint(2):
        out = strip_repeated_lines(rd.from_arrow(_corpus(rows)),
                                   min_count=10).to_pandas()
    assert (out["n_dropped"] == 1).all()


def test_strip_repeated_broadcast_cap():
    import pytest
    from pypdfium2_ray.stages.boilerplate import strip_repeated_lines
    rows = [(i, "x\ny", "s") for i in range(4)]
    with pytest.raises(ValueError, match="max_broadcast"):
        with partition_hint(2):
            strip_repeated_lines(rd.from_arrow(_corpus(rows)), min_count=2,
                                 max_broadcast=1).to_pandas()


def test_strip_repeated_partition_invariance():
    from pypdfium2_ray.stages.boilerplate import strip_repeated_lines
    rows = [(i, f"hdr\nbody {i % 5}", f"s{i % 3}") for i in range(20)]
    t = _corpus(rows)

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            out = strip_repeated_lines(ds, min_count=4).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(3, 5)
