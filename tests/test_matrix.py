"""PdfMatrix (reference _helpers/matrix.py; test_misc.py matrix tests analogue)."""

import pytest

from pypdfium2_ray.docmodel.matrix import PdfMatrix


def test_identity():
    m = PdfMatrix()
    assert m.get() == (1, 0, 0, 1, 0, 0)
    assert m.on_point(3, 4) == (3, 4)


def test_translate_scale():
    m = PdfMatrix().translate(10, 20).scale(2, 3)
    assert m.on_point(1, 1) == (22, 63)
    assert m.on_rect(0, 0, 1, 1) == (20, 60, 22, 63)


def test_rotate():
    m = PdfMatrix().rotate(90)
    x, y = m.on_point(1, 0)
    assert pytest.approx((x, y), abs=1e-9) == (0, -1)
    ccw = PdfMatrix().rotate(90, ccw=True)
    assert pytest.approx(ccw.on_point(1, 0), abs=1e-9) == (0, 1)


def test_mirror():
    m = PdfMatrix().mirror(invert_x=True)
    assert m.on_point(2, 3) == (-2, 3)
    m2 = PdfMatrix().mirror(invert_y=True)
    assert m2.on_point(2, 3) == (2, -3)


def test_multiply_order():
    t = PdfMatrix().translate(5, 0)
    s = PdfMatrix().scale(2, 2)
    ts = t.multiply(s)   # translate, then scale
    assert ts.on_point(0, 0) == (10, 0)
    st = s.multiply(t)   # scale, then translate
    assert st.on_point(0, 0) == (5, 0)


def test_invert_roundtrip():
    m = PdfMatrix().translate(3, 7).scale(2, 5).rotate(30)
    inv = m.invert()
    x, y = inv.on_point(*m.on_point(11, -4))
    assert pytest.approx((x, y), abs=1e-9) == (11, -4)
    with pytest.raises(ValueError):
        PdfMatrix(0, 0, 0, 0, 0, 0).invert()


def test_on_rect_rotated():
    m = PdfMatrix().rotate(90)
    l, b, r, t = m.on_rect(0, 0, 2, 1)
    assert pytest.approx((l, b, r, t), abs=1e-9) == (0, -2, 1, 0)
