"""Byte-level parity against the reference's OWN committed golden files.

The strongest form of the invariant: our fixture row `/text` mirrors
`tests/resources/text.pdf`, and the extracted output (after the documented
CRLF->LF normalization, reference tests/test_cli.py:72-74 `normalize_lfs`)
must equal `tests/expectations/text_extract.txt` byte for byte.

Skipped when the reference snapshot is not present (portability).
"""

import os

import pytest

REF = "/root/reference/tests/expectations/text_extract.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference snapshot not available")


def _our_flagship_text() -> str:
    from pypdfium2_ray.docmodel.htmldoc import (
        extract_document_text, parse_document)
    from pypdfium2_ray.sources.fixtures import _text_doc
    doc = parse_document(_text_doc())
    return extract_document_text(doc, strategy="range")


def test_extracted_text_matches_reference_golden_bytes():
    expected = open(REF, "rb").read()
    ours = _our_flagship_text().replace("\r\n", "\n").encode("utf-8")
    assert ours == expected


def test_bounded_strategy_matches_reference_golden_bytes():
    from pypdfium2_ray.docmodel.htmldoc import (
        extract_document_text, parse_document)
    from pypdfium2_ray.sources.fixtures import _text_doc
    doc = parse_document(_text_doc())
    ours = extract_document_text(doc, strategy="bounded") \
        .replace("\r\n", "\n").encode("utf-8")
    assert ours == open(REF, "rb").read()


def test_reference_char_count_constant():
    """tests/test_textpage.py:26-34: page 1 text is exactly 438 chars."""
    from pypdfium2_ray.docmodel.htmldoc import parse_document
    from pypdfium2_ray.sources.fixtures import _text_doc
    tp = parse_document(_text_doc())[0].get_textpage()
    assert tp.count_chars() == 438


def test_reference_search_constants():
    """tests/test_textpage.py:84-98: 'labor' at (89,5), (181,5), (430,5)."""
    from pypdfium2_ray.docmodel.htmldoc import parse_document
    from pypdfium2_ray.sources.fixtures import _text_doc
    tp = parse_document(_text_doc())[0].get_textpage()
    assert tp.search_all("labor") == [(89, 5), (181, 5), (430, 5)]
