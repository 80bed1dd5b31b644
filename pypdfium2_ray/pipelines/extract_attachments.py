"""Attachment inventory pipeline — the Ray Data shape of
``pypdfium2 attachments list|extract`` (cli/attachments.py:53-71, SURVEY
§2.1 S9): one ROW per embedded file instead of numbered files on disk,
with the reference's index-stable ``[i+1] name`` numbering preserved in
``att_idx``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from pypdfium2_ray.stages.extract import ExtractText
from pypdfium2_ray.stages.warm import warm_task

ATTACHMENT_ROWS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("att_idx", pa.int32()),
    ("name", pa.string()),
    ("mime", pa.string()),
    ("n_bytes", pa.int64()),
    ("data", pa.binary()),
    ("src", pa.string()),
])


def _explode_attachments(batch: pa.Table) -> pa.Table:
    out = {k: [] for k in ATTACHMENT_ROWS_SCHEMA.names}
    for url, atts in zip(batch["url"].to_pylist(),
                         batch["attachments"].to_pylist()):
        for i, a in enumerate(atts or []):
            out["url"].append(url)
            out["att_idx"].append(i)
            out["name"].append(a["name"])
            out["mime"].append(a["mime"])
            out["n_bytes"].append(a["n_bytes"])
            out["data"].append(a["data"])
            out["src"].append(a["src"])
    return pa.Table.from_pydict(out, schema=ATTACHMENT_ROWS_SCHEMA)


def extract_attachments_pipeline(ds, extract_opts: dict[str, Any] | None = None,
                                 batch_size: int = 256):
    opts = dict(include_pages=False, include_rects=False,
                include_attachments=True) | (extract_opts or {})
    extracted = ds.map_batches(warm_task(ExtractText, **opts),
                               batch_format="pyarrow", batch_size=batch_size)
    return extracted.map_batches(_explode_attachments, batch_format="pyarrow")
