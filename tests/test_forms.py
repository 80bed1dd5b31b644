"""Forms surface (M25, previously out of scope): field collection from
the stripped <form> subtree, the init_forms/close_forms formenv lifecycle
(document.py:159-228), and page.flatten() baking visible field values
into page text (page.py:328-346)."""

import pytest

from pypdfium2_ray.docmodel.htmldoc import parse_document
from pypdfium2_ray.docmodel.model import (
    FLATTEN_NOTHINGTODO, FLATTEN_SUCCESS, FORMTYPE_ACRO_FORM,
    FORMTYPE_NONE)

FORM_HTML = b"""<html><body><p>before</p>
<form action="/s"><input type="text" name="q" value="hello world">
<input type="hidden" name="tok" value="SECRET">
<input type="checkbox" name="c1" checked value="yes">
<input type="checkbox" name="c2" value="no">
<textarea name="msg">  multi
  line  note </textarea>
<select name="lang"><option>en</option><option selected>de</option></select>
<button value="Go">Go!</button></form>
<p>after</p></body></html>"""


def test_field_collection_and_values():
    doc = parse_document(FORM_HTML)
    assert doc.get_formtype() == FORMTYPE_ACRO_FORM
    by_name = {f.name: f for f in doc.form_fields}
    # hidden inputs are NOT fields (no visible widget)
    assert "tok" not in by_name
    assert by_name["q"].value == "hello world"
    assert by_name["c1"].value == "yes"          # checked -> on-value
    assert by_name["c2"].value == ""             # unchecked -> invisible
    assert by_name["msg"].value == "multi line note"   # ws-collapsed
    assert by_name["lang"].value == "de"         # selected option label
    # form content stays OUT of the text flow (stripped subtree)
    assert doc.pages[0].lines == ["before", "after"]


def test_formenv_lifecycle_and_flatten():
    doc = parse_document(FORM_HTML)
    page = doc.pages[0]
    with pytest.raises(RuntimeError, match="init_forms"):
        page.flatten()                           # reference parity
    assert doc.init_forms() is True
    assert doc.init_forms() is False             # already initialized
    assert page.formenv is doc.formenv

    assert page.flatten() == FLATTEN_SUCCESS
    # visible values baked at the field position, in document order;
    # invisible fields (c2, empty buttons) contribute nothing
    assert page.lines == ["before", "hello world", "yes",
                          "multi line note", "de", "Go", "after"]
    assert "SECRET" not in " ".join(page.lines)
    # fields consumed: a second flatten has nothing to do
    assert page.flatten() == FLATTEN_NOTHINGTODO
    # flattened content reaches the textpage
    assert "multi line note" in page.get_textpage().text

    assert doc.close_forms() is True
    assert doc.close_forms() is False
    assert page.formenv is None


def test_no_forms_is_noop():
    doc = parse_document(b"<html><body><p>x</p></body></html>")
    assert doc.get_formtype() == FORMTYPE_NONE
    assert doc.init_forms() is False
    assert doc.formenv is None


def test_extract_stage_flatten_forms_option():
    """The pipeline surface: flatten_forms=True bakes field values into
    the extracted text; default leaves them stripped."""
    from pypdfium2_ray.stages.extract import make_extract_fn
    import pyarrow as pa
    batch = pa.table({
        "url": ["doc://f/1"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [FORM_HTML],
        "lang": ["en"],
    })
    plain = make_extract_fn(include_pages=False,
                            include_rects=False)(batch)
    flat = make_extract_fn(include_pages=False, include_rects=False,
                           flatten_forms=True)(batch)
    assert "hello world" not in plain["extracted_text"][0].as_py()
    t = flat["extracted_text"][0].as_py()
    assert "hello world" in t and "multi line note" in t
    assert "SECRET" not in t
