"""Content-defined chunking + cross-document chunk dedup — the
storage-layer dedup family (FastCDC lineage: Xia et al., USENIX ATC'16
— public paper), over text as code points.

Fixed-size chunking breaks on any insertion; CONTENT-defined boundaries
(cut where a rolling hash of the trailing window satisfies a mask)
realign after edits, which is what makes cross-document shared-chunk
detection work on near-identical boilerplate that is shifted by a few
characters between pages.

The rolling hash is the windowed gear form, chosen so it has an exact
SQL twin: for 1-based position p >= W,

    h_p = sum_{j=0..W-1} G(cp_{p-j}) * 2^j        (G = 48-bit md5 gear)

and a boundary is cut at p when h_p % 2^mask_bits == 0. Because
2^mask_bits divides 2^64, the boundary test commutes with the uint64
wraparound the engine's accumulator uses — the SQL side sums exactly in
HUGEINT and takes the same small modulus, no 2^64 reduction needed.
G values are ``md5_number_upper(cp::VARCHAR) >> 16`` on both sides (48
bits so the largest shifted term stays within int64 for the SQL ``<<``).

Distributed shape: chunking is a pure per-block map (W vectorized
shifted adds per document — no per-character Python); the shared-chunk
rollup pre-combines (chunk_md5 -> occurrences, distinct docs) inside
each block (a document never spans blocks, so per-block distinct-doc
counts sum exactly) and pays ONE hash exchange on chunk_md5.

No min/max chunk-size clamps: this is the normalized-chunking baseline
(boundaries purely mask-driven; adjacent boundaries can produce 1-char
chunks). Clamps would break the clean per-position SQL twin and are a
policy layer, not part of the boundary math.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.exchange import partition_map

DEFAULT_WINDOW = 16
DEFAULT_MASK_BITS = 6        # expected chunk length 2^6 = 64 chars


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class _CdcChunks:
    """Actor: text -> per-chunk rows (doc_id, chunk_md5[, carry]). The
    gear table is memoized per code point across batches (warm state —
    the corpus alphabet is tiny relative to the corpus)."""

    def __init__(self, id_col: str, text_col: str, window: int,
                 mask_bits: int, carry_col: str | None = None):
        if window < 1 or not 0 <= mask_bits <= 62:
            raise ValueError("need window >= 1 and 0 <= mask_bits <= 62")
        self.id_col = id_col
        self.text_col = text_col
        self.window = window
        self.mask = np.uint64((1 << mask_bits) - 1)
        self.carry_col = carry_col
        self._gear: dict[int, int] = {}

    def _gvals(self, cps: np.ndarray) -> np.ndarray:
        from pypdfium2_ray.functions.sketch import md5_hash64
        uniq = np.unique(cps)
        gear = self._gear
        for cp in uniq:
            c = int(cp)
            if c not in gear:
                gear[c] = md5_hash64(str(c).encode()) >> 16
        lut = np.array([gear[int(c)] for c in uniq], dtype=np.uint64)
        return lut[np.searchsorted(uniq, cps)]

    def chunks_of(self, text: str) -> list[str]:
        w = self.window
        if not text:
            return []
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        n = len(cps)
        if n < w:
            return [text]
        g = self._gvals(cps)
        acc = np.zeros(n - w + 1, dtype=np.uint64)
        for j in range(w):
            acc += g[w - 1 - j:n - j] << np.uint64(j)
        ends = np.flatnonzero((acc & self.mask) == 0) + w   # 1-based ends
        out, s = [], 0
        for p in ends:
            out.append(text[s:p])
            s = int(p)
        if s < n:
            out.append(text[s:])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[self.id_col], pa.int64()).to_pylist()
        texts = batch[self.text_col].to_pylist()
        carry = (batch[self.carry_col].to_pylist() if self.carry_col
                 else None)
        out_id, out_md5, out_carry = [], [], []
        for k, (did, tx) in enumerate(zip(ids, texts)):
            for c in self.chunks_of(tx or ""):
                out_id.append(did)
                out_md5.append(_md5_hex(c))
                if carry is not None:
                    out_carry.append(carry[k])
        cols = {"doc_id": pa.array(out_id, pa.int64()),
                "chunk_md5": pa.array(out_md5, pa.string())}
        if carry is not None:
            cols[self.carry_col] = pa.array(out_carry, pa.string())
        return pa.table(cols)


def cdc_chunk_rows(ds, id_col: str = "doc_id", text_col: str = "text",
                   window: int = DEFAULT_WINDOW,
                   mask_bits: int = DEFAULT_MASK_BITS,
                   carry_col: str | None = None):
    """Dataset[(doc_id, chunk_md5[, carry])] — one row per chunk
    occurrence, in document order. Pure per-block map, zero exchanges.
    ``carry_col`` (a string column, e.g. the source host) is replicated
    onto every chunk row of its document."""
    from pypdfium2_ray.stages.warm import warm_task
    return ds.map_batches(
        warm_task(_CdcChunks, id_col=id_col, text_col=text_col,
                  window=window, mask_bits=mask_bits, carry_col=carry_col),
        batch_format="pyarrow")


def _partial_rollup(t: pa.Table) -> pa.Table:
    """Per-block pre-combine: (chunk_md5, occurrences, distinct docs).
    A document lives in exactly one block, so block-level distinct-doc
    counts are disjoint across blocks and sum exactly."""
    occ = t.group_by("chunk_md5", use_threads=False).aggregate(
        [([], "count_all")])
    dd = (t.group_by(["chunk_md5", "doc_id"], use_threads=False)
          .aggregate([]).group_by("chunk_md5", use_threads=False)
          .aggregate([([], "count_all")]))
    j = occ.join(dd, keys=["chunk_md5"], right_suffix="_dd")
    return pa.table({"chunk_md5": j["chunk_md5"],
                     "occ": pc.cast(j["count_all"], pa.int64()),
                     "docs": pc.cast(j["count_all_dd"], pa.int64())})


def _final_rollup(min_occ: int):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"chunk_md5": pa.array([], pa.string()),
                          "n_occurrences": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64())})
        if t.num_rows == 0 or "chunk_md5" not in t.column_names:
            return empty
        g = t.group_by("chunk_md5", use_threads=False).aggregate(
            [("occ", "sum"), ("docs", "sum")])
        out = pa.table({"chunk_md5": g["chunk_md5"],
                        "n_occurrences": g["occ_sum"],
                        "n_docs": g["docs_sum"]})
        return out.filter(pc.greater_equal(out["n_occurrences"], min_occ))

    return fn


def shared_chunks(ds, id_col: str = "doc_id", text_col: str = "text",
                  window: int = DEFAULT_WINDOW,
                  mask_bits: int = DEFAULT_MASK_BITS,
                  min_occurrences: int = 2,
                  num_partitions: int | None = None):
    """Dataset[(chunk_md5, n_occurrences, n_docs)] — every chunk content
    appearing at least ``min_occurrences`` times corpus-wide (the
    boilerplate / storage-dedup candidate set). ONE exchange, carrying
    only pre-combined (md5, two counts) rows."""
    rows = cdc_chunk_rows(ds, id_col=id_col, text_col=text_col,
                          window=window, mask_bits=mask_bits)
    partials = rows.map_batches(_partial_rollup, batch_format="pyarrow")
    return partition_map(partials, ["chunk_md5"], _final_rollup(min_occurrences),
                         num_partitions=num_partitions)


def _tpl_partial(group_col: str, md5_col: str = "chunk_md5"):
    """Per-block pre-combine for the template rollup (shared by the CDC
    chunk tier and stages/boilerplate's line tier via *md5_col*). Two row
    kinds share one schema (group, md5_col, docs):

    - unit partials: distinct docs of *group* containing *md5_col*
      in this block;
    - denominator sentinels (``md5_col = ''`` — an md5 hex is never
      empty): distinct unit-producing docs of *group* in this block.

    A document lives in exactly one block, so both distinct-doc partials
    are disjoint across blocks and sum exactly after the exchange."""

    def fn(t: pa.Table) -> pa.Table:
        dd = (t.group_by([group_col, md5_col, "doc_id"],
                         use_threads=False).aggregate([])
              .group_by([group_col, md5_col], use_threads=False)
              .aggregate([([], "count_all")]))
        tot = (t.group_by([group_col, "doc_id"], use_threads=False)
               .aggregate([]).group_by([group_col], use_threads=False)
               .aggregate([([], "count_all")]))
        grp = pa.concat_arrays([
            pc.cast(dd[group_col], pa.string()).combine_chunks(),
            pc.cast(tot[group_col], pa.string()).combine_chunks()])
        md5 = pa.concat_arrays([
            dd[md5_col].combine_chunks(),
            pa.array([""] * tot.num_rows, pa.string())])
        docs = pa.concat_arrays([
            pc.cast(dd["count_all"], pa.int64()).combine_chunks(),
            pc.cast(tot["count_all"], pa.int64()).combine_chunks()])
        return pa.table({group_col: grp, md5_col: md5, "docs": docs})

    return fn


def _tpl_final(group_col: str, frac_num: int, frac_den: int,
               min_docs: int, md5_col: str = "chunk_md5"):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          md5_col: pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "src_docs": pa.array([], pa.int64())})
        if t.num_rows == 0 or md5_col not in t.column_names:
            return empty
        g = t.group_by([group_col, md5_col],
                       use_threads=False).aggregate([("docs", "sum")])
        is_tot = pc.equal(g[md5_col], "")
        tot = g.filter(is_tot)
        ch = g.filter(pc.invert(is_tot))
        if ch.num_rows == 0 or tot.num_rows == 0:
            return empty
        j = ch.join(pa.table({group_col: tot[group_col],
                              "src_docs": tot["docs_sum"]}),
                    keys=[group_col], join_type="inner")
        nd = pc.cast(j["docs_sum"], pa.int64())
        sd = pc.cast(j["src_docs"], pa.int64())
        keep = pc.and_(
            pc.greater_equal(pc.multiply(nd, pa.scalar(frac_den, pa.int64())),
                             pc.multiply(sd, pa.scalar(frac_num, pa.int64()))),
            pc.greater_equal(nd, pa.scalar(min_docs, pa.int64())))
        out = pa.table({group_col: j[group_col],
                        md5_col: j[md5_col],
                        "n_docs": nd, "src_docs": sd})
        return out.filter(keep)

    return fn


def template_chunks(ds, id_col: str = "doc_id", text_col: str = "text",
                    group_col: str = "source",
                    window: int = DEFAULT_WINDOW,
                    mask_bits: int = DEFAULT_MASK_BITS,
                    frac_num: int = 1, frac_den: int = 5,
                    min_docs: int = 2,
                    num_partitions: int | None = None):
    """Per-source template (boilerplate) chunks: CDC chunk contents that
    appear in at least ``frac_num/frac_den`` of a source's
    chunk-producing documents (AND at least ``min_docs`` of them) — the
    nav-bar / footer / legal-banner detector a crawl-cleaning pipeline
    runs before training-data export. Returns Dataset[(group, chunk_md5,
    n_docs, src_docs)].

    The threshold is exact-integer (``n_docs * frac_den >= src_docs *
    frac_num``) so the result is bit-identical to the SQL twin. The
    denominator counts chunk-producing docs (non-empty text), derived
    from the SAME chunk-row stream as the numerators — the input is
    scanned ONCE, and the whole rollup pays ONE hash exchange on
    *group_col* carrying pre-combined (group, md5, count) rows plus one
    sentinel row per (block, group).

    Partitioning assumption: a single group's pre-combined rows fit one
    partition — per-host volume is bounded by (distinct chunks per host
    x blocks touching that host). A pathological mega-host would need a
    two-stage rollup ((group, chunk_md5) exchange first, then a
    group-keyed join onto the totals); at crawl host-size distributions
    the one-exchange form wins."""
    rows = cdc_chunk_rows(ds, id_col=id_col, text_col=text_col,
                          window=window, mask_bits=mask_bits,
                          carry_col=group_col)
    partials = rows.map_batches(_tpl_partial(group_col),
                                batch_format="pyarrow")
    return partition_map(partials, [group_col],
                         _tpl_final(group_col, frac_num, frac_den,
                                    min_docs),
                         num_partitions=num_partitions)
