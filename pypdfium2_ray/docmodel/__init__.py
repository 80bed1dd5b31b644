"""Pure-Python document model (no Ray).

The "raw layer" of the engine: everything here is deterministic, importable
in a plain pytest run, and mirrors a cited operator of the reference helper
API (`/root/reference/src/pypdfium2/_helpers/`).
"""

from pypdfium2_ray.docmodel.errors import (  # noqa: F401
    ERR_SUCCESS, ERR_UNKNOWN, ERR_FILE, ERR_FORMAT, ERR_PASSWORD,
    ERR_SECURITY, ERR_PAGE, STATUS_OK, DocError, err_to_str, err_to_status,
)
from pypdfium2_ray.docmodel.layout import LayoutParams  # noqa: F401
from pypdfium2_ray.docmodel.textpage import TextPage  # noqa: F401
from pypdfium2_ray.docmodel.model import Attachment, Document, Page, Span, PageObject, TocEntry, METADATA_KEYS  # noqa: F401
from pypdfium2_ray.docmodel.htmldoc import parse_document, extract_document_text  # noqa: F401
from pypdfium2_ray.docmodel.matrix import PdfMatrix  # noqa: F401
