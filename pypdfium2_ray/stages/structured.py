"""JSON-LD structured-data extraction — schema.org blocks to rows.

Real crawls carry machine-readable metadata in
``<script type="application/ld+json">`` blocks (schema.org Article /
Product / Organization…); a training-data pipeline mines them for
document-level supervision (titles, authors, dates, word counts). This
stage emits one row per SCALAR field: ``(doc_id, block_idx, path,
value, value_type)`` with dotted paths for nested objects and ``[i]``
segments for arrays — the flattened shape a feature store ingests.

Pure per-block map, ZERO exchanges. The payload gate is the shared
:func:`docmodel.htmldoc.decode_payload` (identical refusal set to the
flagship parse and the table/link extractors). Script bodies are CDATA
to the HTML tokenizer (stdlib ``HTMLParser`` delivers them unescaped,
matching browser semantics); blocks that fail ``json.loads`` are
skipped — malformed embedded JSON is data, not an error condition
(tests pin the behavior).

Value canonicalization (deterministic, SQL-twinnable): strings pass
through verbatim; numbers/booleans/null render as their JSON source
text via ``json.dumps`` (``42``, ``1.5``, ``true``, ``null``) with
``value_type`` in {str, num, bool, null}. Dict keys flatten in JSON
source order (Python ``json`` preserves it), arrays in index order —
document order end to end.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import pyarrow as pa

_LD_TYPE = "application/ld+json"


class _LdBlocks(HTMLParser):
    """Collect raw ld+json script bodies in document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            attrd = dict(attrs)
            if (attrd.get("type") or "").strip().lower() == _LD_TYPE:
                self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._buf is not None:
            self.blocks.append("".join(self._buf))
            self._buf = None

    def handle_data(self, data):
        if self._buf is not None:
            self._buf.append(data)


def _flatten(obj, prefix: str, out: list[tuple[str, str, str]]):
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(v, f"{prefix}.{k}" if prefix else str(k), out)
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}[{i}]", out)
    elif isinstance(obj, str):
        out.append((prefix, obj, "str"))
    elif isinstance(obj, bool):            # before int: bool is int in py
        out.append((prefix, json.dumps(obj), "bool"))
    elif isinstance(obj, (int, float)):
        out.append((prefix, json.dumps(obj), "num"))
    elif obj is None:
        out.append((prefix, "null", "null"))


def parse_jsonld(text: str) -> list[tuple[int, str, str, str]]:
    """All scalar fields of every ld+json block of one document:
    ``[(block_idx, path, value, value_type), ...]``."""
    p = _LdBlocks()
    p.feed(text)
    p.close()
    rows: list[tuple[int, str, str, str]] = []
    for bidx, raw in enumerate(p.blocks):
        try:
            obj = json.loads(raw)
        except (ValueError, RecursionError):
            continue
        flat: list[tuple[str, str, str]] = []
        _flatten(obj, "", flat)
        rows += [(bidx, path, v, t) for path, v, t in flat]
    return rows


class _ExtractJsonLd:
    def __init__(self, id_col: str, html_col: str,
                 password: str | None = None):
        self.id_col = id_col
        self.html_col = html_col
        self.password = password

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pypdfium2_ray.docmodel.htmldoc import decode_payload
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.html_col].to_pylist()
        out = {"doc_id": [], "block_idx": [], "path": [], "value": [],
               "value_type": []}
        for did, data in zip(ids, payloads):
            text, err = decode_payload(data or b"", self.password)
            if err:
                continue
            for bidx, path, v, t in parse_jsonld(text):
                out["doc_id"].append(did)
                out["block_idx"].append(bidx)
                out["path"].append(path)
                out["value"].append(v)
                out["value_type"].append(t)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "block_idx": pa.array(out["block_idx"], pa.int64()),
            "path": pa.array(out["path"], pa.string()),
            "value": pa.array(out["value"], pa.string()),
            "value_type": pa.array(out["value_type"], pa.string())})


def extract_jsonld(ds, id_col: str = "doc_id", html_col: str = "html",
                   password: str | None = None):
    """Dataset[(doc_id, block_idx, path, value, value_type)] — one row
    per scalar JSON-LD field. Pure per-block map, zero exchanges."""
    from pypdfium2_ray.stages.warm import warm_task
    return ds.map_batches(
        warm_task(_ExtractJsonLd, id_col=id_col, html_col=html_col,
                  password=password),
        batch_format="pyarrow")
