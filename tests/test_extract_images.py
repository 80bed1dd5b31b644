"""extract-images pipeline: object inventory -> one row per image
(cli/extract_images.py:55-89 trace, SURVEY §3.3)."""

import pytest


def test_extract_images_rows(ray_session, fixture_parquet):
    import ray.data as rd
    from pypdfium2_ray.pipelines.extract_images import extract_images_pipeline
    ds = rd.read_parquet(fixture_parquet)
    df = extract_images_pipeline(ds).to_pandas()
    imgs = df[df["url"] == "https://fixtures.test/images"] \
        .sort_values(["page_idx", "img_idx"]).reset_index(drop=True)
    assert len(imgs) == 3
    assert list(imgs["page_idx"]) == [0, 0, 1]
    assert list(imgs["img_idx"]) == [0, 1, 0]      # per-page numbering
    assert list(imgs["src"]) == ["a.jpg", "b.png", "c.gif"]
    assert list(imgs["width"]) == [100, 20, 8]
    assert list(imgs["alt"]) == ["first", "second", "third"]
    # no image rows from image-free docs
    assert not (df["url"] == "https://fixtures.test/text").any()


def test_objects_column_opt_in(ray_session, fixture_parquet):
    from pypdfium2_ray.pipelines.extract_text import extract_pipeline
    ds = extract_pipeline(path=fixture_parquet, skew_split=False,
                          extract_opts=dict(include_objects=True))
    df = ds.to_pandas().set_index("url")
    page0 = df.loc["https://fixtures.test/images", "pages"][0]
    types = [o["type"] for o in page0["objects"]]
    assert types.count("image") == 2
    assert types.count("text") >= 2
    # text objects carry bounds; image objects carry dims
    img = [o for o in page0["objects"] if o["type"] == "image"][0]
    assert (img["width"], img["height"]) == (100, 50)


def test_extract_attachments_rows(ray_session, fixture_parquet):
    import ray.data as rd
    from pypdfium2_ray.pipelines.extract_attachments import (
        extract_attachments_pipeline)
    ds = rd.read_parquet(fixture_parquet)
    df = extract_attachments_pipeline(ds).to_pandas()
    atts = df[df["url"] == "https://fixtures.test/attachments"] \
        .sort_values("att_idx").reset_index(drop=True)
    assert list(atts["name"]) == ["1.txt", "attached.bin"]
    assert atts.loc[0, "data"] == b"attachment one contents"
    assert atts.loc[0, "mime"] == "text/plain"
    assert atts.loc[1, "n_bytes"] == 0
    assert atts.loc[1, "src"] == "https://files.test/attached.bin"
    # docs without attachments yield no rows
    assert not (df["url"] == "https://fixtures.test/text").any()


def test_attachment_docmodel_api():
    from pypdfium2_ray.docmodel.htmldoc import parse_document
    from pypdfium2_ray.sources.fixtures import _attachments_doc
    doc = parse_document(_attachments_doc())
    assert doc.count_attachments() == 2
    assert doc.get_attachment(0).name == "1.txt"
