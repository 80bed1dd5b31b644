"""JSON-LD extraction (stages/structured.py)."""

import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.structured import extract_jsonld, parse_jsonld


def _page(*blocks):
    scripts = "".join(
        f'<script type="application/ld+json">{b}</script>' for b in blocks)
    return f"<html><body>{scripts}<p>x</p></body></html>"


def test_scalar_types_and_paths():
    rows = parse_jsonld(_page(
        '{"a": "s", "n": 42, "f": 1.5, "b": true, "z": null}'))
    assert rows == [(0, "a", "s", "str"), (0, "n", "42", "num"),
                    (0, "f", "1.5", "num"), (0, "b", "true", "bool"),
                    (0, "z", "null", "null")]


def test_nested_and_array_paths():
    rows = parse_jsonld(_page(
        '{"author": {"name": "x", "org": {"id": 7}}, "tags": ["a", "b"],'
        ' "items": [{"k": 1}]}'))
    assert (0, "author.name", "x", "str") in rows
    assert (0, "author.org.id", "7", "num") in rows
    assert (0, "tags[0]", "a", "str") in rows
    assert (0, "tags[1]", "b", "str") in rows
    assert (0, "items[0].k", "1", "num") in rows


def test_multiple_blocks_and_invalid_json_skipped():
    rows = parse_jsonld(_page('{"a": 1}', "{not json", '{"b": 2}'))
    # block indices follow document order even across the skipped block
    assert rows == [(0, "a", "1", "num"), (2, "b", "2", "num")]


def test_non_ld_scripts_ignored_and_cdata_semantics():
    html = ('<script>var x = {"a": 1};</script>'
            '<script type="application/ld+json">{"q": "a<b&amp;"}'
            "</script>")
    rows = parse_jsonld(html)
    # script bodies are CDATA: the &amp; inside is NOT entity-decoded
    assert rows == [(0, "q", "a<b&amp;", "str")]


def test_top_level_array_document():
    rows = parse_jsonld(_page('[{"a": 1}, {"a": 2}]'))
    assert rows == [(0, "[0].a", "1", "num"), (0, "[1].a", "2", "num")]


def test_stage_gate_and_schema():
    from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
    good = _page('{"k": "v"}').encode()
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "html": pa.array([good, b"\x00bad",
                                    encrypt_payload(good, "pw")],
                                   pa.binary())})
    out = extract_jsonld(rd.from_arrow(t)).to_pandas()
    assert list(out.columns) == ["doc_id", "block_idx", "path", "value",
                                 "value_type"]
    assert set(out["doc_id"]) == {1}
    out2 = extract_jsonld(rd.from_arrow(t), password="pw").to_pandas()
    assert set(out2["doc_id"]) == {1, 3}
