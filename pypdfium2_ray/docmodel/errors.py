"""Error / status model.

The reference raises ``PdfiumError`` with a typed ``err_code`` on load
failure (``document.py:583-585``; code->string table
``internal/consts.py:130-138``). At 10^12 rows malformed input is data, not
an exception: the engine turns every failure into a ``(status, err_code)``
column pair on the output row. The numeric codes keep PDFium's values so the
column is directly comparable.
"""

from __future__ import annotations

ERR_SUCCESS = 0
ERR_UNKNOWN = 1
ERR_FILE = 2
ERR_FORMAT = 3
ERR_PASSWORD = 4
ERR_SECURITY = 5
ERR_PAGE = 6

#: err_code -> human string (mirrors internal/consts.py:130-138)
_ERR_TO_STR = {
    ERR_SUCCESS: "Success",
    ERR_UNKNOWN: "Unknown error",
    ERR_FILE: "File access error",
    ERR_FORMAT: "Data format error",
    ERR_PASSWORD: "Incorrect password error",
    ERR_SECURITY: "Unsupported security scheme error",
    ERR_PAGE: "Page not found or content error",
}

#: err_code -> machine status label (the ``status`` output column)
_ERR_TO_STATUS = {
    ERR_SUCCESS: "ok",
    ERR_UNKNOWN: "unknown_error",
    ERR_FILE: "file_error",
    ERR_FORMAT: "format_error",
    ERR_PASSWORD: "password_error",
    ERR_SECURITY: "security_error",
    ERR_PAGE: "page_error",
}

STATUS_OK = "ok"


def err_to_str(code: int) -> str:
    return _ERR_TO_STR.get(code, f"Unknown error code {code}")


def err_to_status(code: int) -> str:
    return _ERR_TO_STATUS.get(code, "unknown_error")


class DocError(Exception):
    """Analogue of ``PdfiumError`` (``_helpers/misc.py``) for the pure layer.

    Only raised by the pure docmodel API when used directly; the Ray stages
    catch it and emit status rows instead.
    """

    def __init__(self, msg: str, err_code: int = ERR_UNKNOWN):
        super().__init__(msg)
        self.err_code = err_code
