"""Mirrors the reference's tests/test_textpage.py assertions 1:1 where they
are layout-independent, and freezes this engine's own deterministic grid
geometry where the reference asserts PDF-specific pixel coords."""

import pytest

from pypdfium2_ray.docmodel import parse_document
from pypdfium2_ray.docmodel.textpage import TextPage
from pypdfium2_ray.sources.fixtures import LOREM_LINES, fixture_rows


@pytest.fixture(scope="module")
def textpage():
    rows = {r["url"]: r for r in fixture_rows()}
    doc = parse_document(rows["https://fixtures.test/text"]["html"])
    assert doc.ok and len(doc) == 2
    return doc[0].get_textpage()


@pytest.fixture(scope="module")
def empty_textpage():
    rows = {r["url"]: r for r in fixture_rows()}
    doc = parse_document(rows["https://fixtures.test/empty"]["html"])
    assert doc.ok and len(doc) == 1
    return doc[0].get_textpage()


def test_gettext(textpage):
    # reference test_textpage.py:26-39
    text_a = textpage.get_text_bounded()
    text_b = textpage.get_text_range()
    assert text_a == text_b
    assert len(text_a) == 438
    exp_start = "Lorem ipsum dolor sit amet,\r\n"
    exp_end = "\r\nofficia deserunt mollit anim id est laborum."
    assert text_a.startswith(exp_start)
    assert text_a.endswith(exp_end)
    assert textpage.get_text_range(0, len(exp_start)) == exp_start
    assert textpage.get_text_range(len(text_a) - len(exp_end)) == exp_end
    assert textpage.get_text_range(len(text_a) - len(exp_end), len(exp_end)) == exp_end


@pytest.mark.parametrize("loose", [False, True])
def test_getcharbox(textpage, loose):
    # reference test_textpage.py:42-47
    for index in range(textpage.count_chars()):
        box = textpage.get_charbox(index, loose=loose)
        assert all(isinstance(v, (int, float)) for v in box)
        assert box[0] <= box[2] and box[1] <= box[3]


def test_getrectboxes(textpage):
    # reference test_textpage.py:50-68 (coords are this engine's grid)
    n_rects = textpage.count_rects()
    rects = [textpage.get_rect(i) for i in range(n_rects)]
    assert len(rects) == 10

    first_rect = rects[0]
    assert pytest.approx(first_rect, abs=1) == (58, 767, 252, 782)
    first_text = textpage.get_text_bounded(*first_rect)
    assert first_text == "Lorem ipsum dolor sit amet,"
    assert textpage.get_text_range(0, len(first_text)) == first_text

    for rect in rects:
        assert len(rect) == 4
        assert 56 < rect[0] < 59
        text = textpage.get_text_bounded(*rect)
        assert isinstance(text, str)
        assert len(text) <= 66

    assert text == "officia deserunt mollit anim id est laborum."
    assert textpage.get_text_range(textpage.count_chars() - len(text)) == text


def test_search_text(textpage):
    # reference test_textpage.py:84-109
    searcher = textpage.search("labor")
    occ_1a = searcher.get_next()
    occ_2a = searcher.get_next()
    occ_3a = searcher.get_next()
    occ_4x = searcher.get_next()
    occ_2b = searcher.get_prev()
    occ_1b = searcher.get_prev()

    assert occ_1a == (89, 5)
    assert occ_2a == (181, 5)
    assert occ_3a == (430, 5)
    assert occ_4x is None
    assert occ_1a == occ_1b and occ_2a == occ_2b

    # rect resolution of each occurrence (reference's _get_rects helper)
    exp_rect_lines = [2, 4, 9]  # the grid line of each occurrence
    for occ, exp_line in zip((occ_1a, occ_2a, occ_3a), exp_rect_lines):
        c_index, c_count = occ
        r_index = textpage.count_rects(0, c_index) - 1
        r_count = textpage.count_rects(c_index, c_count)
        assert r_count == 1
        assert r_index == exp_line
        rect = textpage.get_rect(r_index)
        assert textpage.get_text_bounded(*rect) == LOREM_LINES[exp_line]


def test_search_flags(textpage):
    # flag semantics (reference textpage.py:255-292 documented behavior)
    assert textpage.search_all("LABOR") == [(89, 5), (181, 5), (430, 5)]
    assert textpage.search_all("LABOR", match_case=True) == []
    assert textpage.search_all("Lorem", match_case=True) == [(0, 5)]
    # whole word: "labore" etc. don't match, none are standalone words
    assert textpage.search_all("labor", match_whole_word=True) == []
    assert textpage.search_all("laboris", match_whole_word=True) == [(181, 7)]
    # consecutive / overlapping
    tp = TextPage(["aaaa"])
    assert tp.search_all("aa") == [(0, 2), (2, 2)]
    assert tp.search_all("aa", consecutive=True) == [(0, 2), (1, 2), (2, 2)]
    # start index
    assert textpage.search_all("labor", index=100) == [(181, 5), (430, 5)]
    with pytest.raises(ValueError):
        textpage.search_all("")


def test_get_index(textpage):
    # reference test_textpage.py:112-121
    x, y = 60, 842 - 66
    index = textpage.get_index(x, y, 5, 5)
    assert index is not None and index < textpage.count_chars() and index == 0
    charbox = textpage.get_charbox(index)
    assert textpage.get_text_bounded(*charbox) == "L"
    # far away from any char -> None
    assert textpage.get_index(5, 5, 1, 1) is None


def test_empty_page(empty_textpage):
    # reference test_textpage.py:124-141
    tp = empty_textpage
    assert tp.get_text_range() == ""
    assert tp.get_text_bounded() == ""
    assert tp.count_chars() == 0
    assert tp.count_rects() == 0
    assert tp.get_index(0, 0, 0, 0) is None
    assert tp.search_all("a") == []


def test_text_range_subsets(textpage):
    text = textpage.get_text_range()
    assert textpage.get_text_range(10, 7) == text[10:17]
    assert textpage.get_text_range(430) == text[430:]
    assert textpage.get_text_range(1000) == ""
    assert textpage.get_text_range(0, 0) == ""


def test_crlf_generated_chars(textpage):
    # generated CRLF chars have degenerate boxes, excluded from bounded text
    text = textpage.get_text_range()
    i = text.index("\r")
    assert textpage.is_generated(i) and textpage.is_generated(i + 1)
    box = textpage.get_charbox(i)
    assert box[0] == box[2]
    assert not textpage.is_generated(0)
