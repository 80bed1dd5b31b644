"""Sysfont surface (docmodel/sysfont — the sysfontinfo.py analogue):
default map, style suffixes, handler chain with forwarding, singleton
install semantics, destroyed-handler refusal."""

import pytest

from pypdfium2_ray.docmodel.sysfont import (
    DEFAULT_FACE_MAP, SysfontBase, resolve_face)


@pytest.fixture(autouse=True)
def _clean_singleton():
    yield
    if SysfontBase.SINGLETON is not None:
        SysfontBase.SINGLETON.close()


def test_default_resolution_and_styles():
    assert resolve_face("Helvetica") == "Helvetica"
    assert resolve_face("serif") == "Times New Roman"
    assert resolve_face("nope-unknown") == DEFAULT_FACE_MAP["sans-serif"]
    assert resolve_face("Courier", weight=700) == "Courier Bold"
    assert resolve_face("serif", weight=700, italic=True) == \
        "Times New Roman Bold Italic"
    assert resolve_face("monospace", italic=True) == "Courier New Italic"


def test_handler_chain_override_and_forwarding():
    """An override intercepts; unoverridden callbacks are forwarded to
    the wrapped default at construction (no delegation layer)."""
    class Corporate(SysfontBase):
        def MapFont(self, family, weight=400, italic=False):
            if family == "sans-serif":
                return "Inter"
            return self.default.MapFont(family, weight, italic)

    h = Corporate()
    assert h.MapFont("sans-serif") == "Inter"
    assert h.MapFont("serif") == "Times New Roman"
    # not overridden => forwarded straight to the default's bound method
    assert h.EnumFonts() == sorted(set(DEFAULT_FACE_MAP.values()))
    assert "GetFaceName" in h.__dict__        # instance-level forward

    # chain: a wrapper around Corporate sees its mapping
    outer = SysfontBase(default=h)
    assert outer.MapFont("sans-serif") == "Inter"


def test_singleton_install_semantics():
    class A(SysfontBase):
        def MapFont(self, family, weight=400, italic=False):
            return "A-face"

    class B(SysfontBase):
        def MapFont(self, family, weight=400, italic=False):
            return "B-face"

    a = A().setup()
    assert resolve_face("serif") == "A-face"
    b = B().setup()                     # implicitly closes a
    assert SysfontBase.SINGLETON is b
    assert resolve_face("serif") == "B-face"
    with pytest.raises(RuntimeError, match="closed"):
        a.setup()                       # closed handlers cannot reinstall
    b.close()
    assert resolve_face("serif") == "Times New Roman"   # back to default
