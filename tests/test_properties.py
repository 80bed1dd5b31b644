"""Property-based tests (hypothesis) for the docmodel invariants the
reference asserts only on fixtures (SURVEY §5 notes no property testing —
we go further): bounded==range under the page bbox, rect/char count
consistency, search soundness, parse determinism, whitespace-collapse
parity with the slow path."""

import string

from hypothesis import given, settings, strategies as st

from pypdfium2_ray.docmodel.htmldoc import extract_document_text, parse_document
from pypdfium2_ray.docmodel.layout import LayoutParams
from pypdfium2_ray.docmodel.textpage import TextPage

# printable ASCII text without HTML-special chars (escaping is the
# generator's job, not under test here)
_plain = st.text(
    alphabet=string.ascii_letters + string.digits + " \t.,!?-",
    min_size=0, max_size=120)

_lines = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + " .,!?-",
            min_size=0, max_size=80).map(str.strip),
    min_size=0, max_size=12)

WIDE = LayoutParams(page_width=1e9)


@settings(max_examples=60, deadline=None)
@given(_lines)
def test_bounded_equals_range_within_bbox(lines):
    """tests/test_textpage.py:26-29 invariant generalized: with default
    (page-bbox) boundaries and all chars inside, bounded == range."""
    lines = [ln for ln in lines if ln]
    tp = TextPage(lines, WIDE)
    assert tp.get_text_bounded() == tp.get_text_range()


@settings(max_examples=60, deadline=None)
@given(_lines)
def test_counts_consistent(lines):
    lines = [ln for ln in lines if ln]
    tp = TextPage(lines, WIDE)
    assert tp.count_chars() == len(tp.text)
    assert tp.count_rects() == len(tp.rects) == len(lines)
    # rect text concatenation == lines
    assert [tp.rect_text(i) for i in range(len(tp.rects))] == lines


@settings(max_examples=60, deadline=None)
@given(_lines, st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=4))
def test_search_occurrences_sound(lines, needle):
    lines = [ln for ln in lines if ln]
    tp = TextPage(lines, WIDE)
    for (start, count) in tp.search_all(needle):
        assert tp.get_text_range(start, count).casefold() == needle.casefold()


@settings(max_examples=40, deadline=None)
@given(_plain)
def test_parse_deterministic_and_collapsed(text):
    html = f"<html><body><p>{text}</p></body></html>".encode()
    d1 = parse_document(html, layout=WIDE)
    d2 = parse_document(html, layout=WIDE)
    assert extract_document_text(d1) == extract_document_text(d2)
    # whitespace collapse spec: runs -> single space, stripped
    expected = " ".join(p for p in text.replace("\t", " ").split(" ") if p)
    assert d1[0].lines in ([expected], [] if not expected else [expected])


@settings(max_examples=30, deadline=None)
@given(_plain, _plain)
def test_mixed_style_collapse_matches_single_style(a, b):
    """The fast (single-style) and slow (mixed-style) _flush_line paths must
    produce identical line text for identical character content."""
    plain = f"<p>{a} {b}</p>"
    mixed = f"<p>{a} <b>{b}</b></p>"
    d_plain = parse_document(f"<html><body>{plain}</body></html>".encode(), layout=WIDE)
    d_mixed = parse_document(f"<html><body>{mixed}</body></html>".encode(), layout=WIDE)
    assert d_plain[0].lines == d_mixed[0].lines


# ---------------------------------------------------------------------------
# round-2 properties: save round-trip, winnow normalization, page ranges


_doc_html = st.builds(
    lambda paras, title: (
        "<html><head><title>" + title + "</title></head><body>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + "</body></html>").encode(),
    st.lists(_plain, min_size=0, max_size=8),
    _plain,
)


@settings(max_examples=60, deadline=None)
@given(_doc_html)
def test_serialize_roundtrip_property(html):
    """parse(serialize(parse(html))) reproduces text/toc/metadata for any
    plain-paragraph document, and serialize is a fixed point."""
    from pypdfium2_ray.docmodel.serialize import serialize_document
    doc = parse_document(html)
    if not doc.ok:
        return
    ser = serialize_document(doc)
    doc2 = parse_document(ser)
    assert doc2.ok
    assert extract_document_text(doc2) == extract_document_text(doc)
    assert doc2.get_metadata_dict() == doc.get_metadata_dict()
    assert [(e.level, e.title, e.page_index) for e in doc2.toc] \
        == [(e.level, e.title, e.page_index) for e in doc.toc]
    assert serialize_document(doc2) == ser


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + " \t\r\n\f\v",
               min_size=0, max_size=60))
def test_winnow_whitespace_invariance(text):
    """The winnow fingerprint is invariant under whitespace-run shape (the
    collapse normalization), like the SQL twin."""
    from pypdfium2_ray.functions.sketch import winnow_min_hash
    import re
    collapsed = re.sub(r"[ \t\r\n\f\v]+", " ", text).strip(" ")
    assert winnow_min_hash(text) == winnow_min_hash(collapsed)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                max_size=8))
def test_parse_page_range_roundtrip(pages):
    """Rendering a spec from 1-based pages and parsing it returns exactly
    those pages 0-based, order preserved."""
    from pypdfium2_ray.functions.units import parse_page_range
    spec = ",".join(str(p) for p in pages)
    assert parse_page_range(spec) == [p - 1 for p in pages]


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parse_never_raises_on_arbitrary_bytes(data):
    """Error-rows discipline: any byte payload yields a Document (failed
    ones as status rows), never an exception."""
    doc = parse_document(data)
    assert doc.status in ("ok", "format_error", "password_error",
                          "unknown_error")
    if not doc.ok:
        assert len(doc) == 0
        assert extract_document_text(doc) == ""


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=200))
def test_image_meta_never_raises(data):
    """Header sniffing on arbitrary bytes: None or a plausible meta tuple,
    never an exception."""
    from pypdfium2_ray.functions.imagemeta import parse_image_meta
    meta = parse_image_meta(data)
    if meta is not None:
        fmt, w, h = meta
        assert fmt in ("png", "gif", "bmp", "jpeg")
        assert w >= 0 and h >= 0


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_wav_parse_never_raises(data):
    """RIFF chunk walk on arbitrary bytes: None, a meta dict, or (on
    decode) ValueError for unsupported codecs — never a crash."""
    from pypdfium2_ray.functions.wav import decode_wav, parse_wav_meta
    meta = parse_wav_meta(data)
    if meta is not None:
        assert meta["n_samples"] >= 0
        assert meta["data_offset"] + meta["data_size"] <= len(data)
    try:
        out = decode_wav(data)
    except ValueError:
        return
    assert (out is None) == (meta is None)
