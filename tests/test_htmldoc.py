"""Document-level parse semantics over the fixture corpus — the analogue of
the reference's test_document.py / test_opener.py / test_toc.py and the
golden-output CLI comparisons of test_cli.py."""

import pytest

from pypdfium2_ray.docmodel import (
    ERR_FORMAT, ERR_PASSWORD, METADATA_KEYS, parse_document,
    extract_document_text,
)
from pypdfium2_ray.docmodel.htmldoc import encrypt_payload
from pypdfium2_ray.sources.fixtures import (
    ENCRYPTED_PASSWORD, LINK_LINES, LOREM_LINES, fixture_rows,
)


@pytest.fixture(scope="module")
def rows():
    return {r["url"].removeprefix("https://fixtures.test"): r for r in fixture_rows()}


def expected_flagship_text():
    """The byte-identical doc-level invariant for /text: CLI framing of
    cli/extract_text.py:30-45 over the two pages of the text fixture."""
    p1 = "\r\n".join(LOREM_LINES)
    p2 = "\r\n".join(LINK_LINES)
    return f"# Page 1\n{p1}\n\n# Page 2\n{p2}\n"


def test_flagship_byte_identity(rows):
    doc = parse_document(rows["/text"]["html"])
    assert extract_document_text(doc) == expected_flagship_text()
    # bounded strategy must agree (test_textpage.py:26-29 analogue, doc level)
    assert extract_document_text(doc, "bounded") == expected_flagship_text()


def test_multipage(rows):
    # tests/test_cli.py:145 analogue: per-page texts
    doc = parse_document(rows["/multipage"]["html"])
    assert len(doc) == 3
    assert [p.get_textpage().text for p in doc.pages] == \
        ["Page\r\n1", "Page\r\n2", "Page\r\n3"]
    assert doc[1].get_size() == (595.0, 842.0)


def test_empty(rows):
    doc = parse_document(rows["/empty"]["html"])
    assert doc.ok and len(doc) == 1
    assert extract_document_text(doc) == "# Page 1\n\n"


def test_encrypted(rows):
    # test_opener.py:100-124 analogue
    html = rows["/encrypted"]["html"]
    no_pw = parse_document(html)
    assert no_pw.status == "password_error" and no_pw.err_code == ERR_PASSWORD
    wrong = parse_document(html, password="wrong")
    assert wrong.status == "password_error"
    ok = parse_document(html, password=ENCRYPTED_PASSWORD)
    assert ok.ok
    assert ok[0].get_textpage().text == "Encrypted PDF"


def test_encrypt_roundtrip():
    payload = b"<html><body><p>secret</p></body></html>"
    enc = encrypt_payload(payload, "pw123")
    assert payload not in enc
    doc = parse_document(enc, password="pw123")
    assert doc.ok and doc[0].get_textpage().text == "secret"


def test_malformed(rows):
    doc = parse_document(rows["/malformed"]["html"])
    assert doc.status == "format_error" and doc.err_code == ERR_FORMAT
    assert len(doc) == 0 and extract_document_text(doc) == ""
    assert parse_document(b"").err_code == ERR_FORMAT


def test_toc(rows):
    # document.py:520-559 get_toc semantics
    doc = parse_document(rows["/toc"]["html"])
    toc = [(e.level, e.title, e.page_index) for e in doc.get_toc()]
    assert toc == [
        (0, "One", 0), (1, "One A", 0), (1, "One B", 1),
        (0, "Two", 1), (1, "Two A", 2), (2, "Two A deep", 2),
        (0, "Three", 2),
    ]


def test_toc_circular(rows):
    # document.py:543-550: traversal terminates + warning
    doc = parse_document(rows["/toc-circular"]["html"])
    assert doc.ok
    assert "circular bookmark reference detected" in doc.warnings
    assert len(doc.toc) < 10


def test_toc_maxdepth(rows):
    # document.py:553-557: depth cap + warning
    doc = parse_document(rows["/toc-maxdepth"]["html"])
    assert doc.ok
    assert any("maximum recursion depth" in w for w in doc.warnings)
    assert max(e.level for e in doc.toc) == 14
    assert len(doc.toc) == 15


def test_heading_outline():
    html = (b"<html><body><h1>Top</h1><p>x</p><h2>Sub</h2><p>y</p>"
            b"<h1>Top2</h1></body></html>")
    doc = parse_document(html)
    assert [(e.level, e.title, e.page_index) for e in doc.get_toc()] == \
        [(0, "Top", 0), (1, "Sub", 0), (0, "Top2", 0)]


def test_metadata(rows):
    # document.py:308-337 / test_opener.py:237-245 analogue
    doc = parse_document(rows["/metadata"]["html"])
    d = doc.get_metadata_dict()
    assert set(d) == set(METADATA_KEYS)
    assert d["Title"] == "Metadata Title"
    assert d["Author"] == "Author Person"
    assert d["Producer"] == "LibreOffice 6.4"
    assert d["CreationDate"] == "D:20220520145414+02'00'"
    assert d["ModDate"] == ""
    skipped = doc.get_metadata_dict(skip_empty=True)
    assert "ModDate" not in skipped
    assert doc.get_metadata_value("Title") == "Metadata Title"
    with pytest.raises(ValueError):
        doc.get_metadata_value("NotAKey")


def test_boilerplate_strip(rows):
    # the north_rule's main-content extraction: header/nav/aside/footer/script
    # are boilerplate; only <main> survives
    doc = parse_document(rows["/boilerplate"]["html"])
    text = extract_document_text(doc)
    assert text == "# Page 1\nMain content line one.\r\nMain content line two.\n"
    for noise in ("SITE HEADER", "MENU ITEM", "AD BLOCK", "COPYRIGHT", "SCRIPT NOISE"):
        assert noise not in text


def test_whitespace_collapse():
    html = b"<html><body><p>  a   b\t\nc  </p><p>   </p><p>d</p></body></html>"
    doc = parse_document(html)
    assert doc[0].get_textpage().text == "a b c\r\nd"


def test_hidden_elements():
    html = (b"<html><body><p>visible</p><p hidden>ghost</p>"
            b'<div style="display: none"><p>ghost2</p></div></body></html>')
    doc = parse_document(html)
    assert doc[0].get_textpage().text == "visible"


def test_entities_and_br():
    html = b"<html><body><p>a &amp; b&lt;c&gt;<br>next</p></body></html>"
    doc = parse_document(html)
    assert doc[0].get_textpage().text == "a & b<c>\r\nnext"


def test_auto_pagination():
    body = "".join(f"<p>line {i}</p>" for i in range(100))
    doc = parse_document(f"<html><body>{body}</body></html>".encode())
    assert len(doc) == 3  # 48 + 48 + 4
    assert len(doc[0].lines) == 48 and len(doc[2].lines) == 4
    assert doc[0].lines[0] == "line 0"
    assert doc[2].lines[-1] == "line 99"


def test_spans_and_objects(rows):
    # pageobjects.py:164-309 analogue: style-derived font attributes
    html = (b"<html><body><h1>Head</h1><p>plain <b>bold</b> "
            b"<i>it</i> <code>mono</code></p>"
            b'<img src="x.png" width="10" height="5" alt="pic"></body></html>')
    doc = parse_document(html)
    page = doc[0]
    spans = {s.text: s for s in page.spans}
    assert spans["Head"].font_size == 24.0 and spans["Head"].weight == 700
    assert spans["bold"].weight == 700
    assert spans["it"].italic
    assert spans["mono"].font_family == "Courier"
    assert spans["plain "].weight == 400
    images = [o for o in page.objects if o.type == "image"]
    assert len(images) == 1
    assert (images[0].width, images[0].height, images[0].alt) == (10, 5, "pic")
    texts = [o for o in page.objects if o.type == "text"]
    assert len(texts) == len(page.spans)
    for o in page.objects:
        l, b, r, t = o.bounds
        assert l <= r and b <= t


def test_identifier_stability(rows):
    # document.py:278-292: permanent id stable under metadata change
    d1 = parse_document(b"<html><head><title>A</title></head><body><p>x</p></body></html>")
    d2 = parse_document(b"<html><head><title>B</title></head><body><p>x</p></body></html>")
    assert d1.get_identifier(permanent=True) == d2.get_identifier(permanent=True)
    assert d1.get_identifier(permanent=False) != d2.get_identifier(permanent=False)
    assert isinstance(d1.get_identifier(), bytes) and len(d1.get_identifier()) == 16


def test_fixture_determinism():
    a = fixture_rows()
    b = fixture_rows()
    assert [r["html"] for r in a] == [r["html"] for r in b]
    assert [r["url"] for r in a] == [r["url"] for r in b]


# ---------------------------------------------------------------------------
# fast-lane tokenizer differential crosscheck

def _doc_signature(doc):
    """Everything handler-visible, flattened for equality."""
    return (doc.err_code, doc.metadata, doc.tagged, doc.formtype,
            doc.pagemode, doc.warnings,
            [(e.title, e.page_index, e.level) for e in doc.toc],
            [p.lines for p in doc.pages],
            [(p.index, [(s.text, s.font_size, s.weight, s.italic)
                        for s in p.spans]) for p in doc.pages],
            [(a.name, a.data) for a in doc.attachments],
            [dict(f.__dict__) if hasattr(f, "__dict__") else f
             for f in doc.form_fields])


def _both(payload: bytes):
    import pypdfium2_ray.docmodel.htmldoc as H
    fast = H.parse_document(payload)
    old = H.FAST_FEED_ENABLED
    H.FAST_FEED_ENABLED = False
    try:
        ref = H.parse_document(payload)
    finally:
        H.FAST_FEED_ENABLED = old
    return fast, ref


FAST_CASES = [
    b"<html><body><main><p>plain text</p></main></body></html>",
    b'<a href="x>y" class=\'q\' bare>t</a>',
    b"<br/><img src=i/><input disabled/>",
    b"<!DOCTYPE html><!-- c -- ment --><p>x</p>",
    b"<script>if (a<b && c>d) {}</script><p>after</p>",
    b"<style>p > a { color: red }</style><p>s</p>",
    b"<p>a &amp; b</p>",                      # entity -> stdlib lane
    b"<p>bare < less</p>",                    # bare '<' -> stdlib lane
    b"<a href=x/>glued</a>",                  # unquoted+slash -> stdlib
    b"<?php echo ?><p>pi</p>",                # PI -> stdlib lane
    b"<![CDATA[x]]><p>c</p>",                 # CDATA -> stdlib lane
    b"<p foo=>odd</p>",                       # empty unquoted -> stdlib
    b"<script>never closed",                  # unterminated cdata
    b"<TITLE>Mixed Case</TITLE><MAIN><P>U</P></MAIN>",
    b"<nav data-toc><ul><li data-page='2'>s1</li></ul></nav><main><p>b</p></main>",
    b'<form><input name="f" value="v"><textarea name="t">tv</textarea></form>',
    b"<main><h1>H</h1><p>one</p><pb><h2>H2</h2><p>two</p></main>",
    b"text before <main><p>in</p></main> after",
    b"<p style='display:none'>hid</p><p>shown</p>",
    b"unclosed <em>tail",
]


def test_fast_feed_matches_stdlib_on_constructs():
    for case in FAST_CASES:
        fast, ref = _both(case)
        assert _doc_signature(fast) == _doc_signature(ref), case


def test_fast_feed_fuzz_differential():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    pieces = st.sampled_from([
        "<p>", "</p>", "<main>", "</main>", "<b>", "</b>", "text ",
        "mixed Case", "<br/>", "<img src=x>", "&amp;", "&", "<", ">",
        "<!-- c -->", "<script>a<b</script>", "<a href=\"u\">t</a>",
        "<a href=u/>", "<title>T</title>", "\n", "  ", "<pb>",
        "<li data-page='3'>", "</li>", "<nav data-toc>", "</nav>",
        "<em style='display:none'>", "</em>", "<?pi?>", "<!decl>",
    ])

    @settings(max_examples=120, deadline=None)
    @given(st.lists(pieces, min_size=0, max_size=14))
    def go(parts):
        payload = "".join(parts).encode()
        fast, ref = _both(payload)
        assert _doc_signature(fast) == _doc_signature(ref)

    go()


# ---------------------------------------------------------------------------
# density content policy (htmldoc._density_select)

def _density_doc(html: bytes, policy="density"):
    import pypdfium2_ray.docmodel.htmldoc as H
    return H.parse_document(html, content_policy=policy)


def test_density_picks_content_div():
    html = (b"<html><body>"
            b'<div><a href="/">Home</a> <a href="/a">About us</a> '
            b'<a href="/b">Contact</a></div>'
            b"<div>Short banner</div>"
            b"<div><p>This is the long main body of the page with "
            b"plenty of real sentences in it.</p><p>Another paragraph "
            b"of content text.</p></div>"
            b'<div><a href="#s">Share</a> <a href="#l">Like</a></div>'
            b"</body></html>")
    doc = _density_doc(html)
    text = doc[0].get_textpage().text
    assert text.startswith("This is the long main body")
    assert "Home" not in text and "Short banner" not in text
    # semantic policy keeps everything (no <main> present)
    sem = _density_doc(html, policy="semantic")
    assert "Short banner" in sem[0].get_textpage().text


def test_density_semantic_main_wins():
    html = (b"<html><body><div><p>huge decoy content far longer than the "
            b"main element body text by a wide margin indeed</p></div>"
            b"<main><p>tiny</p></main></body></html>")
    doc = _density_doc(html)
    assert doc[0].get_textpage().text == "tiny"   # <main> overrides density


def test_density_all_links_keeps_page():
    html = (b'<html><body><div><a href="/">Home</a></div>'
            b'<div><a href="/b">More</a></div></body></html>')
    doc = _density_doc(html)
    assert doc[0].get_textpage().text == "Home\r\nMore"   # nothing positive


def test_density_break_follows_segment():
    html = (b"<html><body>"
            b'<div><a href="/">Home</a> <a href="/x">About</a></div>'
            b"<div><p>first page of the real content body</p><pb>"
            b"<p>second page of the real content body</p></div>"
            b"</body></html>")
    doc = _density_doc(html)
    assert len(doc) == 2
    assert doc[0].get_textpage().text == "first page of the real content body"


def test_density_fast_and_stdlib_lanes_agree():
    import pypdfium2_ray.docmodel.htmldoc as H
    html = (b"<html><body><div><a href='/'>Home nav</a></div>"
            b"<div><p>content body long enough to win the score</p>"
            b"</div></body></html>")
    fast = H.parse_document(html, content_policy="density")
    old = H.FAST_FEED_ENABLED
    H.FAST_FEED_ENABLED = False
    try:
        ref = H.parse_document(html, content_policy="density")
    finally:
        H.FAST_FEED_ENABLED = old
    assert [p.lines for p in fast.pages] == [p.lines for p in ref.pages]


def test_flush_line_collapse_guard_equivalence():
    """The _flush_line already-collapsed fast path must be invisible:
    fuzz raw fragments against the unconditional sub+strip."""
    import re
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pypdfium2_ray.docmodel.htmldoc as H
    pat = re.compile(r"[ \t\r\n\f\v]+")

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=" \t\r\n\f\v\xa0abZ.9", max_size=30))
    def go(raw):
        doc = H.parse_document(
            ("<html><body><p>" + raw + "</p></body></html>").encode())
        lines = [ln for p in doc.pages for ln in p.lines]
        want = pat.sub(" ", raw).strip(" ")
        assert lines == ([want] if want else [])

    go()
