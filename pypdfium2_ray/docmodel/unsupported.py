"""Unsupported-feature handler registry (X3).

The reference exposes ``FPDF_SetUnSpObjProcessHandler``-style hooks: a
process-global callback invoked whenever the parser meets a feature it
cannot process, alongside the per-document warning record. Here the
per-document record is the ``warnings`` column (error-rows discipline);
this module adds the *handler* half: a per-process registry the parse
path notifies with ``(kind, detail)``.

In a Ray pipeline the registry is per WORKER process — install handlers
in an actor's ``__init__`` (the ST1 warm-state slot), not on the driver.
"""

from __future__ import annotations

from typing import Callable

#: warning kinds emitted by the parse path
KIND_CIRCULAR_TOC = "circular_toc"
KIND_TOC_DEPTH = "toc_depth"
KIND_ATTACHMENT_DECODE = "attachment_decode"

_handlers: dict[str | None, list[Callable[[str, str], None]]] = {}


def set_unsupported_handler(fn: Callable[[str, str], None],
                            kind: str | None = None) -> None:
    """Register *fn* to be called as ``fn(kind, detail)`` for warnings of
    *kind* (``None`` = every kind). Multiple handlers stack."""
    _handlers.setdefault(kind, []).append(fn)


def clear_unsupported_handlers() -> None:
    _handlers.clear()


def notify_unsupported(kind: str, detail: str) -> None:
    """Invoke registered handlers; handler errors are swallowed (a hook
    must never fail the parse — parse failures are error ROWS)."""
    for fn in _handlers.get(kind, []) + _handlers.get(None, []):
        try:
            fn(kind, detail)
        except Exception:
            pass
