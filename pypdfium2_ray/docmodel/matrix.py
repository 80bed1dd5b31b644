"""2D affine transform — reimplements the reference's pure-Python
``PdfMatrix`` (``/root/reference/src/pypdfium2/_helpers/matrix.py``):
row-vector 6-tuple ``(a, b, c, d, e, f)``, PDF coordinate system with origin
bottom-left (matrix.py:13-39); multiplication matrix.py:76-92; point/rect
application matrix.py:152-180. Engine-independent; used by bounded-rect
queries and the (optional) render tier."""

from __future__ import annotations

import math


class PdfMatrix:

    def __init__(self, a=1.0, b=0.0, c=0.0, d=1.0, e=0.0, f=0.0):
        self.a, self.b, self.c, self.d, self.e, self.f = (
            float(a), float(b), float(c), float(d), float(e), float(f))

    def __repr__(self):
        return f"PdfMatrix{self.get()}"

    def __eq__(self, other):
        return isinstance(other, PdfMatrix) and self.get() == other.get()

    def get(self) -> tuple[float, float, float, float, float, float]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)

    def multiply(self, other: "PdfMatrix") -> "PdfMatrix":
        """self @ other (apply self first, then other) — matrix.py:76-92."""
        return PdfMatrix(
            self.a * other.a + self.b * other.c,
            self.a * other.b + self.b * other.d,
            self.c * other.a + self.d * other.c,
            self.c * other.b + self.d * other.d,
            self.e * other.a + self.f * other.c + other.e,
            self.e * other.b + self.f * other.d + other.f,
        )

    def translate(self, x: float, y: float) -> "PdfMatrix":
        return self.multiply(PdfMatrix(1, 0, 0, 1, x, y))

    def scale(self, x: float, y: float) -> "PdfMatrix":
        return self.multiply(PdfMatrix(x, 0, 0, y, 0, 0))

    def rotate(self, angle: float, ccw: bool = False) -> "PdfMatrix":
        """Clockwise rotation by *angle* degrees (ccw=True for counter-
        clockwise), like matrix.py's rotate."""
        rad = math.radians(angle)
        s, c = math.sin(rad), math.cos(rad)
        if ccw:
            s = -s
        return self.multiply(PdfMatrix(c, -s, s, c, 0, 0))

    def mirror(self, invert_x: bool = False, invert_y: bool = False) -> "PdfMatrix":
        return self.multiply(PdfMatrix(-1 if invert_x else 1, 0, 0,
                                       -1 if invert_y else 1, 0, 0))

    def skew(self, x_angle: float, y_angle: float) -> "PdfMatrix":
        return self.multiply(PdfMatrix(
            1, math.tan(math.radians(y_angle)),
            math.tan(math.radians(x_angle)), 1, 0, 0))

    def on_point(self, x: float, y: float) -> tuple[float, float]:
        """Apply to a point (matrix.py:152-162)."""
        return (self.a * x + self.c * y + self.e,
                self.b * x + self.d * y + self.f)

    def on_rect(self, l: float, b: float, r: float, t: float) -> tuple[float, float, float, float]:
        """Apply to a rect; result is the transformed corners' bbox
        (matrix.py:165-180)."""
        pts = [self.on_point(l, b), self.on_point(r, b),
               self.on_point(l, t), self.on_point(r, t)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return (min(xs), min(ys), max(xs), max(ys))

    def invert(self) -> "PdfMatrix":
        det = self.a * self.d - self.b * self.c
        if det == 0:
            raise ValueError("Matrix is not invertible")
        ia, ib = self.d / det, -self.b / det
        ic, id_ = -self.c / det, self.a / det
        ie = -(self.e * ia + self.f * ic)
        if_ = -(self.e * ib + self.f * id_)
        return PdfMatrix(ia, ib, ic, id_, ie, if_)
