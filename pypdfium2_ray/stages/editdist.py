"""Edit-distance near-duplicate pairs via FastSS deletion neighborhoods.

A THIRD string-similarity family next to Jaccard (stages/dedup,
stages/ppjoin) and Hamming (simhash): unit-cost Levenshtein, the
measure behind title/URL-variant dedup in webtext curation. Candidate
generation is the deletion-neighborhood method of Bocek et al. 2007
("Fast Similarity Search in Large Dictionaries", public literature):
for k=1, if d(x, y) <= 1 then D(x) ∩ D(y) != ∅, where D(s) = {s} ∪
{s with one char deleted} — substitution at i matches the two pos-i
deletions, insertion matches the longer string's deletion against the
shorter string itself, equality matches the strings themselves. The
converse over-generates (a shared variant only bounds d <= 2, e.g.
"ab"/"ba" share "a"), so every candidate pair is verified with the
exact Levenshtein DP, vectorized across the PAIR axis.

Dataflow is the dedup-family template (reference surface: the
reference's only similarity op is substring search,
/root/reference/src/pypdfium2/_helpers/textpage.py:188-216 — this
family is the corpus-scale extension SURVEY §6 prescribes):

    key -> deletion-variant HASHES (ids only — rolling polynomial
    prefix/suffix hashes make each variant ONE vectorized combine, no
    variant strings materialize) -> hash exchange on the variant hash
    -> vectorized bucket pairing (dedup._bucket_pairs_partition) ->
    pair-distinct fused into the first repartition join -> join the
    two key strings back -> vectorized Levenshtein verify.

Scale: the band exchange carries (doc_id:int64, band:int32,
band_key:int64) × (keylen+1) rows per doc; the joins ship only the
candidate ids' SHORT keys (prefix_len chars), semi-join prefiltered.
A hash collision in band_key can only ADD a candidate pair (verify
removes it) — recall is exact by the theorem above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.dedup import _bucket_pairs_partition
from pypdfium2_ray.stages.exchange import lookup_join, partition_map

#: polynomial-hash base (odd => invertible mod 2^64; FNV-1a prime)
_P = np.uint64(0x100000001B3)
#: length-mixing multiplier (splitmix64 increment)
_LMIX = np.uint64(0x9E3779B97F4A7C15)


def _codepoint_matrix(strs: list[str], lens: np.ndarray,
                      width: int) -> np.ndarray:
    """(n, width) uint64 codepoint matrix, zero-padded past each row's
    length — one scatter, no per-row Python."""
    n = len(strs)
    mat = np.zeros((n, width), np.uint64)
    if n == 0 or lens.sum() == 0:
        return mat
    flat = np.frombuffer("".join(strs).encode("utf-32-le"),
                         np.uint32).astype(np.uint64)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(flat)) - np.repeat(offs, lens)
    mat[rows, cols] = flat
    return mat


def _variant_hashes(mat: np.ndarray, lens: np.ndarray, k: int = 1
                    ) -> tuple[np.ndarray, np.ndarray]:
    """``(doc_row_idx, hash)`` for every depth-``k`` deletion-
    neighborhood member (the string itself, each single-deletion
    variant, and for k=2 each two-deletion variant).

    Rolling polynomial hashes make this O(width) vectorized passes:
    with pre[j] = H(s[:j]) and suf[j] = Σ_{t>=j} (c_t+1)·P^(L-1-t),
    the pos-i deletion hashes to pre[i]·P^(L-1-i) + suf[i+1] — one
    combine per position instead of re-hashing each variant. Length is
    mixed into the final key so equal-hash means equal-length (plus
    equal polynomial), never a prefix/pad artifact. uint64 wraparound
    is the modulus (numpy array ops wrap silently by contract).
    """
    n, width = mat.shape
    contrib = np.where(mat != 0, mat + np.uint64(1), np.uint64(0))
    pw = np.ones(width + 1, np.uint64)
    if width:
        pw[1:] = np.cumprod(np.full(width, _P, np.uint64))
    pre = np.zeros((n, width + 1), np.uint64)
    for j in range(width):
        pre[:, j + 1] = pre[:, j] * _P + contrib[:, j]
    # suf[:, j] = hash of s[j:] (highest-order-first convention); the
    # exponent P^(L-1-t) varies per row, so scale by pw[L-1-t] masked
    suf = np.zeros((n, width + 1), np.uint64)
    for j in range(width - 1, -1, -1):
        active = lens > j
        exp = np.where(active, lens - 1 - j, 0)
        suf[:, j] = suf[:, j + 1] + np.where(
            active, contrib[:, j] * pw[exp], np.uint64(0))
    rows_out, hash_out = [], []
    all_rows = np.arange(n)
    # the string itself (0 deletions): pre[L], length L
    self_h = pre[all_rows, lens] + _LMIX * lens.astype(np.uint64)
    rows_out.append(all_rows)
    hash_out.append(self_h)
    for i in range(width):
        m = lens > i
        if not m.any():
            break
        li = lens[m]
        h = (pre[m, i] * pw[li - 1 - i] + suf[m, i + 1]
             + _LMIX * (li - 1).astype(np.uint64))
        rows_out.append(all_rows[m])
        hash_out.append(h)
    if k >= 2:
        # two deletions at i < j: variant = A+B+C with A=s[:i],
        # B=s[i+1:j], C=s[j+1:]; H(ABC) = H(A)P^(|B|+|C|) + H(B)P^|C|
        # + H(C), where the standalone mid hash is the prefix
        # difference H(B) = pre[j] - pre[i+1]*P^|B| (mod 2^64)
        for i in range(width - 1):
            if not (lens > i + 1).any():
                break
            for j in range(i + 1, width):
                m = lens > j
                if not m.any():
                    break
                li = lens[m]
                lb = j - i - 1
                lc = (li - 1 - j).astype(np.int64)
                h_mid = pre[m, j] - pre[m, i + 1] * pw[lb]
                h = (pre[m, i] * pw[lb + lc] + h_mid * pw[lc]
                     + suf[m, j + 1]
                     + _LMIX * (li - 2).astype(np.uint64))
                rows_out.append(all_rows[m])
                hash_out.append(h)
    return np.concatenate(rows_out), np.concatenate(hash_out)


def levenshtein_pairs(sa: list[str], sb: list[str]) -> np.ndarray:
    """Exact unit-cost Levenshtein per pair, DP vectorized across the
    pair axis: width_a × width_b numpy passes, each O(n_pairs)."""
    la = np.array([len(s) for s in sa], np.int64)
    lb = np.array([len(s) for s in sb], np.int64)
    wa = int(la.max(initial=0))
    wb = int(lb.max(initial=0))
    A = _codepoint_matrix(sa, la, wa)
    B = _codepoint_matrix(sb, lb, wb)
    prev = np.broadcast_to(np.arange(wb + 1, dtype=np.int64),
                           (len(sa), wb + 1)).copy()
    out = lb.copy()                       # rows with la == 0: d = lb
    for i in range(1, wa + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, wb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out


def editdist_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                       prefix_len: int = 20, max_dist: int = 1,
                       max_bucket: int = 500,
                       num_partitions: int | None = None):
    """``(id_a, id_b, dist)`` — unordered id pairs whose ``prefix_len``-char
    key prefixes are within Levenshtein distance ``max_dist`` (id_a <
    id_b). Depth-1 and depth-2 deletion neighborhoods are implemented
    (k=2 emits 1 + L + C(L,2) variant hashes per key — recall is exact
    by the FastSS theorem; shared variants only bound d <= 2k, so the
    exact DP verify stays mandatory)."""
    if max_dist not in (1, 2):
        raise NotImplementedError("deletion neighborhoods generated for "
                                  "max_dist in {1, 2}")

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.fill_null(t[text_col], ""), 0, prefix_len)
        return pa.table({"doc_id": t[id_col], "__key": key})

    keys_ds = ds.select_columns([id_col, text_col]).map_batches(
        keyed, batch_format="pyarrow")

    def bands(t: pa.Table) -> pa.Table:
        kt = keyed(t)
        strs = kt["__key"].to_pylist()
        lens = pc.utf8_length(kt["__key"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mat = _codepoint_matrix(strs, lens, prefix_len)
        rows, hashes = _variant_hashes(mat, lens, k=max_dist)
        ids = kt["doc_id"].to_numpy(zero_copy_only=False)[rows]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(np.zeros(len(rows), np.int32), pa.int32()),
            "band_key": pa.array((hashes >> np.uint64(1)).astype(np.int64),
                                 pa.int64()),
        })

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        bands, batch_format="pyarrow")
    candidates = partition_map(
        band_rows, ["band", "band_key"],
        lambda t: _bucket_pairs_partition(t.to_pandas(), "doc_id",
                                          max_bucket),
        num_partitions=num_partitions)

    pair_cols = {"id_a": pa.int64(), "id_b": pa.int64()}
    j = lookup_join(candidates, pair_cols, keys_ds, source_key="doc_id",
                    key_col="id_a", payload_cols={"__key_a": pa.string()},
                    source_payload={"__key_a": "__key"},
                    distinct_target_on=["id_a", "id_b"],
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    j = lookup_join(j, {**pair_cols, "__key_a": pa.string()}, keys_ds,
                    source_key="doc_id", key_col="id_b",
                    payload_cols={"__key_b": pa.string()},
                    source_payload={"__key_b": "__key"},
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)

    def verify(t: pa.Table) -> pa.Table:
        d = levenshtein_pairs(t["__key_a"].to_pylist(),
                              t["__key_b"].to_pylist())
        keep = d <= max_dist
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "dist": pa.array(d[keep], pa.int64()),
        })

    return j.map_batches(verify, batch_format="pyarrow")
