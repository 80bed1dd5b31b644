"""t-digest quantile sketch — vectorized scale-function construction.

The exact grouped median (``stages/agg.grouped_median``) must move every
``(keys, col)`` row through one hash exchange because the median is
non-associative. At whole-corpus scale the sketch path is the right tier:
each block compresses its rows into <= ~delta/2 weighted centroids per
group, the exchange moves ONLY centroids (``n_blocks x n_groups x delta/2``
rows of three floats), and merged digests answer any quantile with rank
error ~ ``q(1-q)/delta``.

Construction is Dunning & Ertl's scale-function clustering (public paper:
"Computing Extremely Accurate Quantiles Using t-Digests",
arXiv:1902.04023): sort, assign each point the integer part of
``k1(q) = (delta / 2pi) * asin(2q - 1)`` at its mid-rank, and collapse
equal-``k`` runs into centroids. ``k1`` compresses the tails hardest, so
mid-quantiles (the median) are the most accurate. Everything here is
segment-vectorized numpy — no per-group Python even at millions of groups;
groups are handled by making the cumulative-weight axis globally monotone
(per-group offsets) so one ``searchsorted`` serves every group at once.

Determinism: a digest depends on which rows share a block, so estimates
can differ in the last rank-error digits across block layouts — inherent
to every mergeable sketch; the rank-error BOUND is layout-independent
(tests assert the bound under adversarial layouts).

No reference analogue (pypdfium2 has no aggregation layer at all).
"""

from __future__ import annotations

import numpy as np

#: default compression — ~delta/2 centroids; rank error at the median
#: empirically < 1/delta
DEFAULT_DELTA = 200


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1.0, 1.0))


def compress(gid: np.ndarray, values: np.ndarray, weights: np.ndarray,
             delta: float = DEFAULT_DELTA):
    """Collapse weighted points into t-digest centroids, per group.

    ``gid``: int group codes (any order); returns ``(gid, mean, weight)``
    arrays sorted by ``(gid, mean)``. Input points may themselves be
    centroids — compression is closed under merging, which is what makes
    the partial/combine split work.
    """
    order = np.lexsort((values, gid))
    gid, values, weights = gid[order], values[order], weights[order]

    # per-group cumulative weight at each point's mid-rank, via one global
    # cumsum minus each group's starting offset (segment trick)
    seg_start = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    c = np.cumsum(weights)
    base = np.repeat(np.r_[0.0, c[seg_start[1:] - 1]],
                     np.diff(np.r_[seg_start, gid.size]))
    totals = np.repeat(np.r_[c[seg_start[1:] - 1], c[-1]] -
                       np.r_[0.0, c[seg_start[1:] - 1]],
                       np.diff(np.r_[seg_start, gid.size]))
    qmid = (c - base - weights / 2) / totals
    k = np.floor(_k1(qmid, delta)).astype(np.int64)

    # collapse equal-(gid, k) runs (both sorted => runs are contiguous)
    new_run = np.r_[True, (gid[1:] != gid[:-1]) | (k[1:] != k[:-1])]
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1
    w_sum = np.bincount(run_id, weights, minlength=n_runs)
    wv_sum = np.bincount(run_id, weights * values, minlength=n_runs)
    return gid[new_run], wv_sum / w_sum, w_sum


def quantile(gid: np.ndarray, means: np.ndarray, weights: np.ndarray,
             q: float, n_groups: int):
    """Estimate quantile ``q`` per group from centroid arrays sorted by
    ``(gid, mean)``. Returns an array of length ``n_groups`` (NaN for
    groups with no centroids). One global ``searchsorted`` over an
    offset-monotone cumulative-weight axis — zero per-group Python."""
    out = np.full(n_groups, np.nan)
    if gid.size == 0:
        return out
    seg_start = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    seg_end = np.r_[seg_start[1:], gid.size]          # exclusive
    c = np.cumsum(weights)
    base = np.repeat(np.r_[0.0, c[seg_start[1:] - 1]], seg_end - seg_start)
    totals_seg = np.r_[c[seg_start[1:] - 1], c[-1]] - \
        np.r_[0.0, c[seg_start[1:] - 1]]
    cmid = c - base - weights / 2                     # in-group mid cumweight

    # make cmid globally monotone: add seg_idx * span so one searchsorted
    # answers every group's target at once
    span = float(totals_seg.max()) + 1.0
    seg_idx = np.cumsum(np.r_[False, gid[1:] != gid[:-1]])
    cmid_adj = cmid + seg_idx * span
    t = q * totals_seg
    t_adj = t + np.arange(seg_start.size) * span
    idx = np.searchsorted(cmid_adj, t_adj)            # first cmid >= t

    lo, hi = seg_start, seg_end - 1
    below = idx <= lo                                 # t before first mid
    above = idx > hi                                  # t past last mid
    mid = ~(below | above)
    est = np.empty(seg_start.size)
    est[below] = means[lo[below]]
    est[above] = means[hi[above]]
    i = idx[mid]
    c0, c1 = cmid[i - 1], cmid[i]
    frac = np.where(c1 > c0, (t[mid] - c0) / np.where(c1 > c0, c1 - c0, 1),
                    0.0)
    est[mid] = means[i - 1] + frac * (means[i] - means[i - 1])
    out[gid[seg_start]] = est
    return out
