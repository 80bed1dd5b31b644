"""System-font resolution surface — the reference's sysfontinfo analogue.

`/root/reference/src/pypdfium2/_helpers/sysfontinfo.py` exposes two
things: a default charset->fontname table (``PdfDefaultTTFMap``) and a
pluggable callback-chain handler (``PdfSysfontBase``) where a subclass
overrides some callbacks, everything else delegates to the wrapped
default, and exactly one handler is installed at a time (``setup()``
implicitly closes the previous singleton). This module re-expresses that
surface for the HTML docmodel: the "charset" axis becomes the CSS
generic-family axis, ``MapFont`` resolves (family, weight, italic) to a
concrete face name, and the chain/singleton/forwarding semantics match
the reference's structure (sysfontinfo.py:85-200) without any ctypes.

Pure Python, importable without Ray (X6 raw-layer discipline); the Ray
consumer is the ``fonts`` CLI subcommand (reference ``cli/fonts.py``) and
any render engine wanting face names.
"""

from __future__ import annotations

#: the PdfDefaultTTFMap analogue: generic family -> base face name
DEFAULT_FACE_MAP = {
    "serif": "Times New Roman",
    "sans-serif": "Arial",
    "monospace": "Courier New",
    "cursive": "Comic Sans MS",
    "fantasy": "Impact",
    # concrete families resolve to themselves (identity entries keep the
    # map total over the docmodel's own defaults)
    "helvetica": "Helvetica",
    "courier": "Courier",
    "times": "Times New Roman",
}

#: callbacks a handler may override; anything not overridden is forwarded
#: to the wrapped default (sysfontinfo.py _CallbackNames discipline)
_CALLBACK_NAMES = ("MapFont", "GetFaceName", "EnumFonts")


class _DefaultSysfont:
    """Root implementation (the FPDF_GetDefaultSystemFontInfo analogue):
    resolve via DEFAULT_FACE_MAP with a sans-serif fallback, appending
    the standard style suffixes."""

    def MapFont(self, family: str, weight: int = 400,
                italic: bool = False) -> str:
        base = DEFAULT_FACE_MAP.get((family or "").strip().lower(),
                                    DEFAULT_FACE_MAP["sans-serif"])
        style = []
        if weight >= 600:
            style.append("Bold")
        if italic:
            style.append("Italic")
        return base + (" " + " ".join(style) if style else "")

    def GetFaceName(self, face: str) -> str:
        return face

    def EnumFonts(self) -> list[str]:
        return sorted(set(DEFAULT_FACE_MAP.values()))


_DEFAULT = _DefaultSysfont()


class SysfontBase:
    """Chainable font handler (PdfSysfontBase analogue,
    sysfontinfo.py:85-200): subclass and override any of ``MapFont`` /
    ``GetFaceName`` / ``EnumFonts``; unoverridden callbacks are FORWARDED
    to the wrapped default at construction time (the reference's
    ``_forward_default_callbacks`` optimization — no per-call delegation
    layer), and ``setup()`` installs the handler as the process singleton,
    implicitly closing the previous one."""

    #: currently installed handler (class-level, like the reference)
    SINGLETON = None

    def __init__(self, default=None):
        self.default = default if default is not None else _DEFAULT
        self._is_installed = False
        self._destroyed = False
        # forward any callback this class did NOT override straight to
        # the default implementation object
        for name in _CALLBACK_NAMES:
            if getattr(type(self), name, None) is getattr(SysfontBase, name):
                setattr(self, name, getattr(self.default, name))

    # base implementations delegate (overridden instances bypass these
    # entirely via the constructor forwarding above)
    def MapFont(self, family: str, weight: int = 400,
                italic: bool = False) -> str:
        return self.default.MapFont(family, weight, italic)

    def GetFaceName(self, face: str) -> str:
        return self.default.GetFaceName(face)

    def EnumFonts(self) -> list[str]:
        return self.default.EnumFonts()

    def setup(self):
        """Install as the active handler; only one handler is active at a
        time — installing implicitly closes the previous singleton
        (sysfontinfo.py:186-200)."""
        if self._destroyed:
            raise RuntimeError("cannot install a closed sysfont handler")
        if SysfontBase.SINGLETON is not None:
            SysfontBase.SINGLETON.close()
        SysfontBase.SINGLETON = self
        self._is_installed = True
        return self

    def close(self):
        if SysfontBase.SINGLETON is self:
            SysfontBase.SINGLETON = None
        self._is_installed = False
        self._destroyed = True


def resolve_face(family: str, weight: int = 400, italic: bool = False) -> str:
    """Resolve a (family, weight, italic) triple through the installed
    handler chain, or the default map when none is installed — the single
    entry point render/report consumers call."""
    handler = SysfontBase.SINGLETON or _DEFAULT
    return handler.MapFont(family, weight, italic)
