"""Engine build identity + feature probes — the ``version.py`` surface
(reference ``src/pypdfium2/version.py`` / ``src/pypdfium2_raw/version.py``:
``PYPDFIUM_INFO`` for the helpers layer, ``PDFIUM_INFO`` with a ``flags``
tuple of optional-capability probes like ``("V8", "XFA")`` on a V8 build).

The docmodel analogue: :data:`ENGINE_INFO.flags` enumerates which OPTIONAL
capability families this build actually provides, probed at access time
from the modules themselves (the reference's flags likewise reflect what
the linked binary was compiled with, document.py:181,193 gates
``init_forms`` XFA handling on them). Callers gate features the same way
the reference does::

    if "FORMS" in ENGINE_INFO.flags:
        doc.init_forms()
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property


def _probe_flags() -> tuple[str, ...]:
    """Import-probe the optional capability families. Each probe is
    cheap (module import only) and never raises — a missing/broken
    module simply drops its flag, exactly how a reference build without
    V8 support drops ``"V8"``."""
    flags: list[str] = []
    probes = {
        # image codecs (the multimodal tier's from-scratch decoders)
        "PNG": "pypdfium2_ray.functions.png",
        "BMP": "pypdfium2_ray.functions.bmp",
        "GIF": "pypdfium2_ray.functions.gif",
        "JPEG": "pypdfium2_ray.functions.jpeg",
        "WAV": "pypdfium2_ray.functions.wav",
    }
    for flag, mod in probes.items():
        try:
            __import__(mod)
            flags.append(flag)
        except Exception:
            pass
    try:
        from pypdfium2_ray.functions import jpeg as _j
        if hasattr(_j, "_decode_prog_scan"):
            flags.append("JPEG_PROGRESSIVE")
    except Exception:
        pass
    try:
        from pypdfium2_ray.docmodel.model import FormEnv  # noqa: F401
        flags.append("FORMS")
    except Exception:
        pass
    try:
        import ray.data  # noqa: F401
        flags.append("RAY_DATA")
    except Exception:
        pass
    return tuple(flags)


@dataclass(frozen=True)
class _EngineInfo:
    """Mirrors the reference's ``_version_class`` observable fields
    (major/minor/patch/tag/desc/flags) for the docmodel engine."""
    major: int = 0
    minor: int = 1
    patch: int = 0

    @cached_property
    def flags(self) -> tuple[str, ...]:
        # lazily probed on first access (NOT at module import): the RAY_DATA
        # probe imports ray.data, which is multi-second — callers that only
        # want the version tag must not pay for it. cached_property writes
        # the result into __dict__ directly, bypassing the frozen guard.
        return _probe_flags()

    @property
    def api_tag(self) -> tuple[int, int, int]:
        return (self.major, self.minor, self.patch)

    @property
    def tag(self) -> str:
        return ".".join(str(c) for c in self.api_tag)

    @property
    def version(self) -> str:
        return f"{self.tag}+{self.desc}" if self.desc else self.tag

    @property
    def desc(self) -> str:
        return ",".join(self.flags)

    def __str__(self) -> str:          # reference __str__: full version
        return self.version


ENGINE_INFO = _EngineInfo()
