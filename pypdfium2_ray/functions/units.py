"""CLI-parity scalar helpers: page-range parsing and unit conversion.

Independent implementations of the reference CLI's small parsing surface
(upstream pypdfium2 ``cli/_parsers.py`` page-number text and the tiler's
pt/mm/cm/in units; the vendored reference snapshot ships without the cli
package, so behavior follows the public CLI's documented ``--pages``
syntax: 1-based, comma-separated, ``a-b`` inclusive ranges).
"""

from __future__ import annotations

#: points per unit (1 pt = 1/72 inch)
_PT_PER = {"pt": 1.0, "in": 72.0, "cm": 72.0 / 2.54, "mm": 72.0 / 25.4}


def to_pt(value: float, unit: str) -> float:
    """Convert *value* in ``pt|in|cm|mm`` to points."""
    try:
        return value * _PT_PER[unit]
    except KeyError:
        raise ValueError(f"Invalid unit {unit!r} (expected one of "
                         f"{sorted(_PT_PER)})") from None


def from_pt(value: float, unit: str) -> float:
    """Convert *value* in points to ``pt|in|cm|mm``."""
    try:
        return value / _PT_PER[unit]
    except KeyError:
        raise ValueError(f"Invalid unit {unit!r} (expected one of "
                         f"{sorted(_PT_PER)})") from None


def round_coords(values, n_digits: int = 4) -> tuple:
    """Round a coordinate tuple for printing (the reference CLI's
    coordinate-rounding helper; formatting only — never feed rounded
    values back into geometry)."""
    return tuple(round(float(v), n_digits) for v in values)


def parse_page_range(spec: str, n_pages: int | None = None) -> list[int]:
    """``"1,3-5,7"`` -> ``[0, 2, 3, 4, 6]`` (1-based inclusive input,
    0-based output, order preserved, duplicates kept — the CLI passes the
    result straight to page indexing). With *n_pages*, out-of-range pages
    raise; an empty/whitespace spec means "all pages" (requires n_pages).
    """
    spec = spec.strip()
    if not spec:
        if n_pages is None:
            raise ValueError("empty page range needs n_pages")
        return list(range(n_pages))
    out: list[int] = []
    for token in spec.split(","):
        token = token.strip()
        if not token:
            raise ValueError(f"empty token in page range {spec!r}")
        if "-" in token:
            a_s, b_s = token.split("-", 1)
            a, b = int(a_s), int(b_s)
            if a < 1 or b < a:
                raise ValueError(f"bad range {token!r}")
            nums = range(a, b + 1)
        else:
            a = int(token)
            if a < 1:
                raise ValueError(f"bad page number {token!r}")
            nums = range(a, a + 1)
        for n in nums:
            if n_pages is not None and n > n_pages:
                raise ValueError(f"page {n} out of range (document has "
                                 f"{n_pages} pages)")
            out.append(n - 1)
    return out


def round_list(lst, n_digits: int):
    """Container-preserving elementwise round for printed coordinates —
    the reference's CLI formatting helper (pypdfium2_cli/_parsers.py:64-65
    ``round_list``): rounds every value, returning the SAME container
    type (tuple in, tuple out)."""
    return type(lst)(round(v, n_digits) for v in lst)
