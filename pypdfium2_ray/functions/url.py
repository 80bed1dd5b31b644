"""URL canonicalization — the crawl-curation normalizer that turns the
many spellings of one web page into a single dedup key (the reference
engine keys nothing on URLs; this is web-corpus machinery, rule set after
RFC 3986 §6 normalization).

Rules (applied in this order, each one vectorized RE2 — the SQL twins in
``sql_canonicalize_url`` use the identical patterns so the DuckDB oracle
is exact):

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme + authority (host names are case-insensitive;
   the PATH is case-sensitive and untouched);
3. drop the default port (``:80`` for http, ``:443`` for https);
4. collapse a bare root path ``/`` to the empty path.

Out of scope (documented, not silently wrong): query-parameter
reordering and tracking-param removal — both need per-URL parsing that
is not expressible as a fixed RE2 rewrite, so they belong in a dedicated
actor stage if a corpus needs them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: scheme://authority | rest split (RE2; named groups for Arrow
#: ``extract_regex``, still numbered 1/2 for DuckDB ``regexp_extract``)
_HEAD_RE = (r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
            r"(?P<rest>[^#]*)(?:#.*)?$")
_PORT_HTTP = (r"^(http://[^:/?#]+):80$", r"\1")
_PORT_HTTPS = (r"^(https://[^:/?#]+):443$", r"\1")


def canonicalize_url(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form; URLs not matching ``scheme://...`` pass
    through unchanged (no silent data loss on junk rows)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _HEAD_RE)
    matched = pc.is_valid(parts)
    head = pc.utf8_lower(pc.struct_field(parts, 0))
    head = pc.replace_substring_regex(head, _PORT_HTTP[0], _PORT_HTTP[1])
    head = pc.replace_substring_regex(head, _PORT_HTTPS[0], _PORT_HTTPS[1])
    rest = pc.replace_substring_regex(pc.struct_field(parts, 1), r"^/$", "")
    canon = pc.binary_join_element_wise(head, rest, "")
    return pc.if_else(matched, canon, urls)


def sql_canonicalize_url(col: str) -> str:
    """DuckDB twin: same RE2 patterns, same order. ``regexp_extract``
    with a group list yields the head/rest struct; non-matching rows pass
    through via the CASE guard."""
    head = (f"regexp_replace(regexp_replace(lower("
            f"regexp_extract({col}, '{_HEAD_RE}', 1)), "
            f"'{_PORT_HTTP[0]}', '{_PORT_HTTP[1]}'), "
            f"'{_PORT_HTTPS[0]}', '{_PORT_HTTPS[1]}')")
    rest = f"regexp_replace(regexp_extract({col}, '{_HEAD_RE}', 2), '^/$', '')"
    return (f"CASE WHEN regexp_matches({col}, '{_HEAD_RE}') "
            f"THEN {head} || {rest} ELSE {col} END")
