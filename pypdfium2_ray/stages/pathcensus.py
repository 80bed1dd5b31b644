"""URL path-prefix census — the site-structure rollup.

Every crawl audit wants "how many pages live under /docs/, under
/docs/v2/, …" — a count per path PREFIX at every depth. This is the
string-hierarchy cousin of the ROLLUP aggregate: instead of fixed key
columns, each url contributes one row per ancestor prefix of its path.

Distributed shape: prefixes are built per block with one vectorized
pass PER DEPTH LEVEL (``list_slice`` + ``binary_join`` over every url
at once — levels are bounded by ``max_depth``, so the loop is over a
small constant, never over rows), pre-combined to distinct
``(prefix, depth, count)`` partials, then ONE hash exchange on prefix.
Deeper-than-``max_depth`` tails are truncated LOUDLY (counter in the
log) — a pathological calendar/query-string crawler trap would
otherwise explode the prefix space.

Path convention: the path starts at the first ``/`` after the scheme's
``://`` (or the string start if no scheme); empty segments from
trailing slashes are dropped; the depth-d prefix renders as
``/seg1/../segd``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map


def _paths(urls: pa.Array) -> pa.Array:
    """url -> path part (strip scheme+authority if present)."""
    # after '://', the path begins at the next '/'
    has_scheme = pc.match_substring(urls, "://")
    tail = pc.replace_substring_regex(urls, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    path = pc.if_else(has_scheme, tail, urls)
    return path


def path_prefix_census(ds, url_col: str = "url", max_depth: int = 8,
                       num_partitions: int | None = None):
    """Dataset[(prefix, depth, n_pages)] — page count per path prefix at
    every depth up to ``max_depth`` (deeper tails truncated loudly)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "depth": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        path = _paths(pc.cast(t[url_col], pa.string()).combine_chunks())
        # split on '/', drop the leading empty segment and empties
        segs = pc.split_pattern(path, "/")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        # filter empty segments per list (leading/trailing slashes)
        flat = pc.list_flatten(segs)
        lens = pc.list_value_length(segs).to_numpy().astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        kept_counts = (np.bincount(doc_idx[nonempty], minlength=len(lens))
                       .astype(np.int64) if len(doc_idx)
                       else np.zeros(len(lens), np.int64))
        offsets = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        clean = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         flat.filter(pa.array(nonempty)))
        depths = kept_counts
        n_trunc = int((depths > max_depth).sum())
        if n_trunc:
            import logging
            logging.getLogger(__name__).warning(
                "path census truncation: %d url(s) deeper than "
                "max_depth=%d — their deeper prefixes are NOT counted",
                n_trunc, max_depth)
        outs = []
        for d in range(1, max_depth + 1):
            sel = depths >= d
            if not sel.any():
                break
            sub = clean.filter(pa.array(sel))
            pref = pc.binary_join_element_wise(
                "/", pc.binary_join(pc.list_slice(sub, 0, d), "/"), "")
            outs.append(pa.table({
                "prefix": pref,
                "depth": pa.array(np.full(len(pref), d), pa.int64())}))
        if not outs:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "depth": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        allp = pa.concat_tables(outs)
        g = allp.group_by(["prefix", "depth"],
                          use_threads=False).aggregate([([], "count_all")])
        return pa.table({"prefix": g["prefix"], "depth": g["depth"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "depth": pa.array([], pa.int64()),
                             "n_pages": pa.array([], pa.int64())})
        g = t.group_by(["prefix", "depth"],
                       use_threads=False).aggregate([("cnt", "sum")])
        return pa.table({"prefix": g["prefix"], "depth": g["depth"],
                         "n_pages": pc.cast(g["cnt_sum"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, ["prefix"], final,
                         num_partitions=num_partitions)
