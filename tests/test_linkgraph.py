"""Link extraction (stages/linkgraph): anchor scan semantics, the
shared decode gate (skip set == parser error set), edge parsing."""

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
from pypdfium2_ray.stages.linkgraph import extract_links, links_to_edges

GOOD = (b'<html><body><nav><a href="/">Home</a></nav>'
        b'<main><p>x <a class="z" href="/page/7">seven</a> y</p>'
        b'<a href="https://off.site/p">off</a></main></body></html>')


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "html": pa.array([r[1] for r in rows], pa.binary())}))


def test_extract_links_order_and_attrs(ray_session):
    out = extract_links(_ds([(1, GOOD)])).to_pandas()
    assert out[["href", "anchor"]].values.tolist() == [
        ["/", "Home"], ["/page/7", "seven"], ["https://off.site/p", "off"]]
    assert (out["doc_id"] == 1).all()


def test_extract_links_decode_gate_matches_parser(ray_session):
    rows = [(1, GOOD),
            (2, b"\x00junk <a href=\"/x\">y</a>"),       # null byte -> skip
            (3, encrypt_payload(GOOD, "pw")),            # no password -> skip
            (4, b"\xff\xfe not utf8 <a href=\"/x\">y</a>")]
    out = extract_links(_ds(rows)).to_pandas()
    assert set(out["doc_id"]) == {1}
    # with the password the encrypted row yields its links
    out2 = extract_links(_ds(rows), password="pw").to_pandas()
    assert set(out2["doc_id"]) == {1, 3}
    assert len(out2[out2.doc_id == 3]) == 3


def test_extract_links_nested_markup_skipped(ray_session):
    html = b'<a href="/a"><b>bold</b></a> <a href="/b">plain</a>'
    out = extract_links(_ds([(9, html)])).to_pandas()
    # documented: anchors with nested markup don't match the plain-text
    # pattern (same RE2 both sides)
    assert out[["href", "anchor"]].values.tolist() == [["/b", "plain"]]


def test_links_to_edges_filters(ray_session):
    links = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "href": ["/page/3", "/", "/page/99", "https://x/page/2", "/page/02"],
        "anchor": [""] * 5}))
    out = links_to_edges(links, n_nodes=10).to_pandas() \
        .sort_values(["src", "dst"]).values.tolist()
    # /page/99 dangling (>=10), absolute URL not prefix-matched,
    # /page/02 parses as 2
    assert out == [[1, 3], [4, 2]]


def test_anchor_text_index(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.linkgraph import anchor_text_index
    links = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "href": pa.array(["/a", "/a", "/a", "/b", "/b"]),
        "anchor": pa.array(["one", "two", "one", "x", "x"])})
    got = anchor_text_index(rd.from_arrow(links)).to_pandas() \
        .sort_values("href").reset_index(drop=True)
    assert got.values.tolist() == [
        ["/a", 3, 2, "one|two"],
        ["/b", 2, 1, "x"]]


def test_anchor_text_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pypdfium2_ray.stages.linkgraph import anchor_text_index
    n = 200
    links = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "href": pa.array([f"/p{i % 7}" for i in range(n)]),
        "anchor": pa.array([f"t{i % 13}" for i in range(n)])})
    a = anchor_text_index(rd.from_arrow(links)).to_pandas() \
        .sort_values("href").reset_index(drop=True)
    b = anchor_text_index(rd.from_arrow(links).repartition(9),
                          num_partitions=4).to_pandas() \
        .sort_values("href").reset_index(drop=True)
    assert a.values.tolist() == b.values.tolist()
