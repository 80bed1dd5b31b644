"""URL path-prefix census (stages/pathcensus.py)."""

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.exchange import partition_hint
from pypdfium2_ray.stages.pathcensus import path_prefix_census


def _run(urls, parts=2, **kw):
    t = pa.table({"url": pa.array(urls, pa.string())})
    with partition_hint(parts):
        out = path_prefix_census(rd.from_arrow(t), **kw).to_pandas()
    return {(r.prefix, int(r.depth)): int(r.n_pages)
            for r in out.itertuples()}


def test_counts_per_prefix_and_depth():
    got = _run(["/a/b/c", "/a/b/d", "/a/x", "/z"])
    assert got[("/a", 1)] == 3
    assert got[("/a/b", 2)] == 2
    assert got[("/a/b/c", 3)] == 1
    assert got[("/a/x", 2)] == 1
    assert got[("/z", 1)] == 1


def test_scheme_and_host_stripped():
    got = _run(["https://example.com/a/b", "http://other.org:8080/a",
                "/a/b"])
    assert got[("/a", 1)] == 3
    assert got[("/a/b", 2)] == 2


def test_trailing_and_double_slashes_dropped():
    got = _run(["/a/", "/a//b", "https://h/"])
    assert got[("/a", 1)] == 2
    assert got[("/a/b", 2)] == 1
    assert ("/", 1) not in got        # empty path yields no prefixes


def test_max_depth_truncates():
    got = _run(["/a/b/c/d"], max_depth=2)
    assert set(got) == {("/a", 1), ("/a/b", 2)}


def test_partition_invariance():
    urls = [f"/s{i % 4}/t{i % 7}/p{i}" for i in range(60)]
    t = pa.table({"url": pa.array(urls, pa.string())})

    def run(parts, blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        with partition_hint(parts):
            out = path_prefix_census(ds).to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    assert run(1, 1) == run(3, 5)
