"""Deterministic cc_pages fixture corpus.

Mirrors the reference's conformance corpus (`/root/reference/tests/resources/`,
16 PDFs gathered by tests/conftest.py:25-34) as synthetic HTML payloads in the
Common-Crawl-style input schema of BASELINE.json's input_hint. Every byte is
seeded/constant — regenerating the corpus is reproducible, and each row's
expected extraction is fixed by the docmodel spec (FIXTURES.md).

The `/text` row reproduces the reference's flagship fixture: its extracted
page-1 text must be byte-identical to the Page-1 block of
``tests/expectations/text_extract.txt`` — 438 chars incl. CRLF line breaks
(tests/test_textpage.py:26-34), 10 rects (:50-55), "labor" at char indices
(89,5),(181,5),(430,5) (:84-98).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa

from pypdfium2_ray.docmodel.htmldoc import encrypt_payload

CC_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

#: The 10 text lines of the reference's text.pdf page 1 — joined with CRLF
#: they are exactly 438 chars (tests/test_textpage.py:26-34).
LOREM_LINES = [
    "Lorem ipsum dolor sit amet,",
    "consectetur adipisici elit,",
    "sed eiusmod tempor incidunt ut labore et dolore magna aliqua.",
    "Ut enim ad minim veniam,",
    "quis nostrud exercitation ullamco laboris nisi ut aliquid ex ea",
    "commodi consequat.",
    "Quis aute iure reprehenderit in voluptate velit esse cillum dolore",
    "eu fugiat nulla pariatur.",
    "Excepteur sint obcaecat cupiditat non proident, sunt in culpa qui",
    "officia deserunt mollit anim id est laborum.",
]

#: text.pdf page 2 (tests/expectations/text_extract.txt:13-17)
LINK_LINES = [
    "https://www.wikipedia.org/",
    "https://www.openstreetmap.org/",
    "https://www.opensuse.org/",
    "https://kde.org/",
]

ENCRYPTED_PASSWORD = "test_user"  # like tests/resources/encrypted.pdf

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)
BASE_URL = "https://fixtures.test"


def _page(lines: list[str]) -> str:
    return "\n".join(f"<p>{ln}</p>" for ln in lines)


def _doc(body: str, title: str = "", head_extra: str = "") -> bytes:
    head = f"<title>{title}</title>" if title else ""
    return (f"<html><head>{head}{head_extra}</head>"
            f"<body>{body}</body></html>").encode()


def _text_doc() -> bytes:
    return _doc(_page(LOREM_LINES) + "<pb></pb>" + _page(LINK_LINES))


def _toc_doc() -> bytes:
    nav = (
        '<nav data-toc><ul>'
        '<li data-page="0">One<ul>'
        '<li data-page="0">One A</li>'
        '<li data-page="1">One B</li>'
        '</ul></li>'
        '<li data-page="1">Two<ul>'
        '<li data-page="2">Two A<ul><li data-page="2">Two A deep</li></ul></li>'
        '</ul></li>'
        '<li data-page="2">Three</li>'
        '</ul></nav>')
    body = nav + _page(["Chapter One", "Body text."]) + "<pb></pb>" + \
        _page(["Chapter Two"]) + "<pb></pb>" + _page(["Chapter Three"])
    return _doc(body, title="TOC Test")


def _toc_circular_doc() -> bytes:
    nav = (
        '<nav data-toc><ul>'
        '<li data-page="0" id="a">A<ul>'
        '<li data-page="0" id="b" data-ref="#a">B loops to A</li>'
        '</ul></li>'
        '</ul></nav>')
    return _doc(nav + _page(["Circular outline doc"]))


def _toc_maxdepth_doc(depth: int = 20) -> bytes:
    inner = f'<li data-page="0">level {depth - 1}</li>'
    for lvl in range(depth - 2, -1, -1):
        inner = f'<li data-page="0">level {lvl}<ul>{inner}</ul></li>'
    return _doc(f'<nav data-toc><ul>{inner}</ul></nav>' + _page(["Deep outline doc"]))


def _metadata_doc() -> bytes:
    head_extra = (
        '<meta name="author" content="Author Person">'
        '<meta name="subject" content="Metadata fixtures">'
        '<meta name="keywords" content="ray, arrow, extraction">'
        '<meta name="creator" content="Writer">'
        '<meta name="producer" content="LibreOffice 6.4">'
        '<meta name="creation-date" content="D:20220520145414+02\'00\'">')
    return _doc(_page(["Metadata body"]), title="Metadata Title",
                head_extra=head_extra)


def _images_doc() -> bytes:
    """Image-object fixture (mirrors tests/resources/images.pdf and the
    extract-images CLI trace, cli/extract_images.py:55-89)."""
    body = ('<p>Intro line</p>'
            '<img src="a.jpg" width="100" height="50" alt="first">'
            '<p>Between images</p>'
            '<img src="b.png" width="20" height="30" alt="second">'
            '<pb></pb>'
            '<p>Second page</p>'
            '<img src="c.gif" width="8" height="8" alt="third">')
    return _doc(body, title="Images")


def _attachments_doc() -> bytes:
    """Embedded-file fixture (mirrors tests/resources/attachments.pdf and
    the attachments CLI, cli/attachments.py:53-71)."""
    import base64
    a1 = base64.b64encode(b"attachment one contents").decode()
    body = ('<p>Doc with attachments</p>'
            f'<a download="1.txt" href="data:text/plain;base64,{a1}">one</a>'
            '<a download="attached.bin" href="https://files.test/attached.bin">two</a>')
    return _doc(body, title="Attachments")


def _boilerplate_doc() -> bytes:
    """Main-content restriction test: nav/header/footer stripped, only
    <main> kept."""
    body = (
        "<header><p>SITE HEADER</p></header>"
        "<nav><p>MENU ITEM</p></nav>"
        "<main><p>Main content line one.</p><p>Main content line two.</p></main>"
        "<aside><p>AD BLOCK</p></aside>"
        "<footer><p>COPYRIGHT</p></footer>"
        "<script>var x = 'SCRIPT NOISE';</script>")
    return _doc(body, title="Boilerplate")


def fixture_rows() -> list[dict]:
    """The conformance corpus: one row per reference resource (FIXTURES.md §1)."""
    rows = []

    def add(suffix, html, text="", lang="en"):
        rows.append(dict(
            url=f"{BASE_URL}{suffix}",
            warc_ts=_BASE_TS + timedelta(seconds=len(rows)),
            html=html, text=text, lang=lang))

    add("/text", _text_doc(), text=" ".join(LOREM_LINES))
    add("/links", _doc(_page(LINK_LINES)))
    add("/empty", _doc(""))
    add("/multipage", _doc("<pb></pb>".join(
        _page(["Page", str(i)]) for i in (1, 2, 3))))
    add("/encrypted", encrypt_payload(
        _doc(_page(["Encrypted PDF"])), ENCRYPTED_PASSWORD))
    add("/toc", _toc_doc())
    add("/toc-circular", _toc_circular_doc())
    add("/toc-maxdepth", _toc_maxdepth_doc())
    add("/metadata", _metadata_doc())
    add("/boilerplate", _boilerplate_doc())
    add("/images", _images_doc())
    add("/attachments", _attachments_doc())
    add("/malformed", b"\x00\xff\xfe garbage not utf8 \x80\x81")
    # skew-path row: big payload (>= heavy threshold used in tests)
    add("/huge", _doc(_page(LOREM_LINES * 200)))
    # dedup rows: same url, two snapshots
    rows.append(dict(url=f"{BASE_URL}/dup", warc_ts=_BASE_TS + timedelta(days=1),
                     html=_doc(_page(["version two"])), text="", lang="en"))
    rows.append(dict(url=f"{BASE_URL}/dup", warc_ts=_BASE_TS,
                     html=_doc(_page(["version one"])), text="", lang="en"))
    return rows


def fixture_table() -> pa.Table:
    return pa.Table.from_pylist(fixture_rows(), schema=CC_PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# synthetic corpus for bench (seeded, heavy-tailed sizes)

_WORDS = ("the quick brown fox jumps over lazy dog ray data arrow parquet "
          "stream block actor batch shuffle page text line word crawl web "
          "content main extract parse table column row index").split()


def synthetic_rows(n: int, seed: int = 42, heavy_tail: bool = True) -> list[dict]:
    """n deterministic pseudo-random HTML pages. Sizes are heavy-tailed
    (~1% large docs) to exercise the skew split, mirroring real crawl data."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if heavy_tail and rng.random() < 0.01:
            n_lines = rng.randint(400, 1200)
        else:
            n_lines = rng.randint(3, 40)
        parts = [f"<h1>Document {i}</h1>"]
        for j in range(n_lines):
            words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 14)))
            parts.append(f"<p>{words}</p>")
        html = _doc("".join(parts), title=f"synthetic {i}")
        rows.append(dict(
            url=f"https://synthetic.test/{i}",
            warc_ts=_BASE_TS + timedelta(seconds=i),
            html=html, text="", lang="en"))
    return rows


def synthetic_table(n: int, seed: int = 42, heavy_tail: bool = True) -> pa.Table:
    return pa.Table.from_pylist(synthetic_rows(n, seed, heavy_tail),
                                schema=CC_PAGES_SCHEMA)


def write_cc_parquet(path: str, n_synthetic: int = 0, seed: int = 42,
                     include_fixtures: bool = True, row_group_size: int = 1024) -> str:
    """Write a cc_pages parquet file: the fixture corpus plus *n_synthetic*
    seeded rows. Returns *path*."""
    import pyarrow.parquet as pq
    tables = []
    if include_fixtures:
        tables.append(fixture_table())
    if n_synthetic:
        tables.append(synthetic_table(n_synthetic, seed))
    table = pa.concat_tables(tables)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path
