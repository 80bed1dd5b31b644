"""Exact set-similarity self-join via prefix filtering (PPJoin lineage).

The MinHash/LSH tier (``stages/dedup.minhash_dup_pairs``) is
probabilistic — recall < 1, tuned by band count. This tier is EXACT:
all pairs with shingle-set Jaccard >= tau, recall 1 BY CONSTRUCTION.
The prefix-filtering theorem (Chaudhuri et al. ICDE'06; Xiao et al.
WWW'08 PPJoin): under any total token order shared by every document,
two sets with ``J(a,b) >= tau`` must share at least one token among the
first ``p(x) = |x| - ceil(tau*|x|) + 1`` tokens of each — so emitting
only prefix tokens as candidate keys loses no qualifying pair, and the
shared exact verify (``dedup._VerifyJaccardJoined``) makes precision 1.
The distributed 3-stage shape is Vernica et al. SIGMOD'10 (token order,
RID-pair generation, verify), re-expressed on the repo's exchange
primitives.

Token order: **md5-hash order by default** — deterministic everywhere,
ZERO census exchanges. The papers' frequency-ascending order minimizes
candidates but needs a global token-frequency census; at web-scale
vocab the full rank broadcast is the bottleneck. The Vernica'10 middle
path is exposed as ``freq_order_top=F``: census the corpus once
(pre-combined ``(token, df)`` partials, ONE token exchange), broadcast
only the top-F most frequent tokens, and give them order keys ABOVE the
hash range — frequent tokens sort LAST and fall out of every prefix,
which is most of the df-order benefit at a bounded broadcast.
Correctness never depends on the choice (any shared total order
satisfies the theorem); only candidate volume does. Ties are broken by
token bytes, so the order is a true total order at any partitioning.

REGIME WARNING — prefix filtering presumes a Zipf-ish token space:
candidate mass is sum-of-squares over prefix-token bucket sizes, so a
corpus whose shingle universe is SMALL (tiny vocab, short shingles)
makes every bucket huge and the join quadratic regardless of order
(measured 36x on a 30-word-vocab synthetic corpus going word bigrams ->
trigrams: ~900 possible bigrams vs 27k trigrams). Pick shingles with
enough distinctness for the corpus, and watch the loud max_bucket
truncation log — it is also the quadratic-regime alarm.

Distributed costs: prefix rows are ``(doc_id:int64, size:int64,
tok_key:int64)`` — ids only, ONE hash exchange on ``tok_key``; bucket
pairing is the vectorized triu kernel with the loud ``max_bucket``
truncation discipline plus the integer length filter
(``J >= tau`` implies ``min(|a|,|b|) >= tau * max(|a|,|b|)``, applied
with a 1e-9 slack so IEEE rounding can never drop a qualifying pair);
pair-distinct fuses into the first verify join's exchange; both verify
joins are semi-join-prefiltered so only candidate texts ever shuffle.
With ``freq_order_top`` the input lineage executes twice (census +
prefix emission) — feed a materialized/checkpointed table there.

Empty shingle sets (the 0/0-counts-as-dup convention shared with the
SQL twins) bucket under a reserved sentinel key so empty-empty pairs
are emitted; an empty set can never reach tau against a non-empty one.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from pypdfium2_ray.functions.sketch import (char_shingles, md5_hash64,
                                            word_ngrams)
from pypdfium2_ray.stages.dedup import (_run_starts, _VerifyJaccardJoined)
from pypdfium2_ray.stages.exchange import lookup_join, partition_map

#: hash-order keys live in [0, 2^61); top-F frequency keys start here so
#: frequent tokens sort AFTER every tail token (out of all prefixes)
TOP_BASE = np.int64(1) << np.int64(62)
#: bucket key for empty shingle sets (hash keys are >= 0)
EMPTY_KEY = -1


def _prefix_len(sz: int, tau: float) -> int:
    """p = sz - ceil(tau*sz) + 1, with the ceil taken on a slightly
    LOWERED product so float rounding can only lengthen the prefix
    (more candidates — the safe direction), never shorten it."""
    return sz - math.ceil(tau * sz - 1e-9) + 1


class _PrefixTokens:
    """Actor: text -> shingle set -> prefix rows (doc_id, size, tok_key).
    The token->order-key LUT is memoized per actor (warm state — md5 runs
    once per distinct token per worker, the gear-LUT discipline)."""

    def __init__(self, id_col: str, text_col: str, tau: float,
                 shingle_k: int, shingle_kind: str = "word",
                 top_ranks: dict[bytes, int] | None = None):
        if not 0.0 < tau <= 1.0:
            raise ValueError("tau must be in (0, 1]")
        self.id_col = id_col
        self.text_col = text_col
        self.tau = tau
        self.shingle_k = shingle_k
        self.shingle_fn = (char_shingles if shingle_kind == "char"
                           else word_ngrams)
        self.top_ranks = top_ranks or {}
        self.n_top = len(self.top_ranks)
        self._key: dict[bytes, int] = {}

    def _order_key(self, tok: bytes) -> int:
        k = self._key.get(tok)
        if k is None:
            r = self.top_ranks.get(tok)
            if r is not None:
                # rank 0 = most frequent = LARGEST key (sorts last)
                k = int(TOP_BASE) + (self.n_top - r)
            else:
                k = md5_hash64(tok) >> 3        # [0, 2^61)
            self._key[tok] = k
        return k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_sz, out_key = [], [], []
        for i, t in zip(ids, texts):
            toks = sorted(self.shingle_fn(t or "", self.shingle_k))
            sz = len(toks)
            if sz == 0:
                out_id.append(i)
                out_sz.append(0)
                out_key.append(EMPTY_KEY)
                continue
            keys = np.fromiter((self._order_key(x) for x in toks),
                               np.int64, sz)
            # stable argsort over (key); input is token-sorted, so ties
            # resolve by token bytes — one total order on every worker
            order = np.argsort(keys, kind="stable")
            for j in order[:_prefix_len(sz, self.tau)]:
                out_id.append(i)
                out_sz.append(sz)
                out_key.append(int(keys[j]))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "size": pa.array(out_sz, pa.int64()),
                         "tok_key": pa.array(out_key, pa.int64())})


def _prefix_pairs_partition(df: pd.DataFrame, tau: float,
                            max_bucket: int) -> pa.Table:
    """All (id_a < id_b) pairs sharing a tok_key bucket, length-filtered.
    Vectorized: one mergesort, run detection, triu indices per run."""
    df = df.sort_values(["tok_key", "doc_id"], kind="mergesort")
    key = df["tok_key"].to_numpy()
    ids = df["doc_id"].to_numpy().astype(np.int64)
    szs = df["size"].to_numpy().astype(np.int64)
    # drop duplicate (tok_key, doc_id): hash collisions between two
    # distinct prefix tokens of ONE doc would pair it with itself
    if len(ids) > 1:
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ~((key[1:] == key[:-1]) & (ids[1:] == ids[:-1]))
        key, ids, szs = key[keep], ids[keep], szs[keep]
    starts, lengths = _run_starts(key)
    n_trunc = int((lengths > max_bucket).sum())
    if n_trunc:
        import logging
        logging.getLogger(__name__).warning(
            "ppjoin bucket truncation: %d bucket(s) exceed max_bucket=%d "
            "(largest=%d); pairs involving dropped members are LOST and "
            "the join is no longer exact — raise max_bucket or use "
            "freq_order_top to demote frequent tokens", n_trunc,
            max_bucket, int(lengths.max()))
    out_a, out_b = [], []
    for r in np.flatnonzero(lengths >= 2):
        s = starts[r]
        m = int(min(lengths[r], max_bucket))
        sub_i, sub_s = ids[s:s + m], szs[s:s + m]
        ii, jj = np.triu_indices(m, k=1)
        a, b = sub_i[ii], sub_i[jj]
        sa, sb = sub_s[ii], sub_s[jj]
        # length filter with slack: J >= tau forces lo/hi >= tau exactly;
        # the 1e-9 margin means IEEE rounding can only ADMIT extras
        # (killed by the verify), never drop a qualifying pair
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        keep = lo.astype(np.float64) >= (tau - 1e-9) * hi
        out_a.append(a[keep])
        out_b.append(b[keep])
    cat = (lambda xs: np.concatenate(xs) if xs else np.zeros(0, np.int64))
    return pa.table({"id_a": pa.array(cat(out_a), pa.int64()),
                     "id_b": pa.array(cat(out_b), pa.int64())})


def _top_frequent_tokens(ds, text_col: str, shingle_k: int,
                         shingle_kind: str, top: int,
                         num_partitions: int | None) -> dict[bytes, int]:
    """token -> frequency rank (0 = most frequent) for the top-F tokens:
    per-block distinct-count partials, ONE token exchange, sort + limit.
    Only F rows ever reach the driver."""
    shingle_fn = char_shingles if shingle_kind == "char" else word_ngrams

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            c.update(shingle_fn(x or "", shingle_k))
        toks = list(c.keys())
        return pa.table({"tok": pa.array(toks, pa.binary()),
                         "df": pa.array([c[k] for k in toks], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["tok"], use_threads=False).aggregate([("df", "sum")])
        return pa.table({"tok": g["tok"], "df": g["df_sum"]})

    census = partition_map(
        ds.map_batches(partial, batch_format="pyarrow"), ["tok"], final,
        num_partitions=num_partitions)
    rows = census.sort(["df", "tok"], descending=[True, False]).limit(top)
    out = rows.to_pandas()
    return {bytes(tok): r for r, tok in enumerate(out["tok"])}


class _ContainTokens:
    """Actor: text -> shingle set -> candidate rows for the containment
    join. Each non-empty doc emits BOTH roles: role 0 ("inner" /
    containee) rows for its md5-order PREFIX tokens (prefix length from
    t = ceil(tau*sz): overlap >= t forces a shared token among the first
    sz - t + 1 — the Chaudhuri ICDE'06 theorem with the overlap bound
    fixed by the INNER side alone), and role 1 ("outer" / container)
    rows for ALL its tokens — the container's required overlap depends
    on the unknown inner size, so no container prefix is sound.  Token
    order keys are md5 (zero census exchanges, the ppjoin default)."""

    def __init__(self, id_col: str, text_col: str, tau: float,
                 shingle_k: int, shingle_kind: str = "word"):
        if not 0.0 < tau <= 1.0:
            raise ValueError("tau must be in (0, 1]")
        self.id_col = id_col
        self.text_col = text_col
        self.tau = tau
        self.shingle_k = shingle_k
        self.shingle_fn = (char_shingles if shingle_kind == "char"
                           else word_ngrams)
        self._key: dict[bytes, int] = {}

    def _order_key(self, tok: bytes) -> int:
        k = self._key.get(tok)
        if k is None:
            k = md5_hash64(tok) >> 3            # [0, 2^61)
            self._key[tok] = k
        return k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_sz, out_key, out_role = [], [], [], []
        for i, t in zip(ids, texts):
            toks = sorted(self.shingle_fn(t or "", self.shingle_k))
            sz = len(toks)
            if sz == 0:
                continue        # empty sets can neither contain nor be
                                # contained at tau > 0 (n_inter >= 1 needed)
            keys = np.fromiter((self._order_key(x) for x in toks),
                               np.int64, sz)
            order = np.argsort(keys, kind="stable")
            # overlap bound t = ceil(tau*sz) (slack-lowered ceil: IEEE
            # rounding can only LENGTHEN the prefix — admit-only)
            p = sz - math.ceil(self.tau * sz - 1e-9) + 1
            for j in order[:p]:
                out_id.append(i)
                out_sz.append(sz)
                out_key.append(int(keys[j]))
                out_role.append(0)
            out_id.extend([i] * sz)
            out_sz.extend([sz] * sz)
            out_key.extend(int(k) for k in keys)
            out_role.extend([1] * sz)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "size": pa.array(out_sz, pa.int64()),
                         "tok_key": pa.array(out_key, pa.int64()),
                         "role": pa.array(out_role, pa.int8())})


def _contain_pairs_partition(df: pd.DataFrame, tau: float,
                             max_bucket: int) -> pa.Table:
    """All (inner, outer) candidate pairs sharing a tok_key bucket
    across roles, size-filtered (containment forces sz_out >=
    tau*sz_in, applied with admit-only slack). Vectorized: one
    mergesort, run detection, repeat x tile per run."""
    df = df.sort_values(["tok_key", "role", "doc_id"], kind="mergesort")
    key = df["tok_key"].to_numpy()
    ids = df["doc_id"].to_numpy().astype(np.int64)
    szs = df["size"].to_numpy().astype(np.int64)
    role = df["role"].to_numpy().astype(np.int8)
    # drop duplicate (tok_key, doc_id, role): md5 collisions between two
    # distinct tokens of one doc must not replicate its bucket presence
    if len(ids) > 1:
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ~((key[1:] == key[:-1]) & (ids[1:] == ids[:-1])
                     & (role[1:] == role[:-1]))
        key, ids, szs, role = key[keep], ids[keep], szs[keep], role[keep]
    starts, lengths = _run_starts(key)
    out_a, out_b = [], []
    n_trunc = 0
    max_len = 0
    for r in range(len(starts)):
        s = starts[r]
        ln = int(lengths[r])
        sub_role = role[s:s + ln]
        n0_full = int(np.searchsorted(sub_role, 1))  # roles sorted 0 then 1
        n1_full = ln - n0_full
        if n0_full == 0 or n1_full == 0:
            continue
        n0, n1 = n0_full, n1_full
        if n0 > max_bucket or n1 > max_bucket:
            n_trunc += 1
            max_len = max(max_len, n0, n1)
            n0 = min(n0, max_bucket)
            n1 = min(n1, max_bucket)
        inner_i = ids[s:s + n0]
        inner_s = szs[s:s + n0]
        outer_i = ids[s + n0_full:s + n0_full + n1]
        outer_s = szs[s + n0_full:s + n0_full + n1]
        a = np.repeat(inner_i, n1)
        sa = np.repeat(inner_s, n1)
        b = np.tile(outer_i, n0)
        sb = np.tile(outer_s, n0)
        keep = (a != b) & (sb.astype(np.float64)
                           >= (tau - 1e-9) * sa)
        out_a.append(a[keep])
        out_b.append(b[keep])
    if n_trunc:
        import logging
        logging.getLogger(__name__).warning(
            "containment bucket truncation: %d bucket side(s) exceed "
            "max_bucket=%d (largest=%d); pairs involving dropped members "
            "are LOST and the join is no longer exact — raise max_bucket "
            "(container rows carry EVERY token, so frequent shingles "
            "concentrate here by design)", n_trunc, max_bucket, max_len)
    cat = (lambda xs: np.concatenate(xs) if xs else np.zeros(0, np.int64))
    return pa.table({"id_in": pa.array(cat(out_a), pa.int64()),
                     "id_out": pa.array(cat(out_b), pa.int64())})


class _VerifyContainmentJoined:
    """Batch fn: rows carry both texts; exact containment
    |inner ∩ outer| / |inner| >= tau per ordered pair (the shared
    float-division-compare convention: both the engine and the SQL
    twin divide the same two int64s in IEEE double). Shingle sets
    memoized per worker like dedup._VerifyJaccardJoined."""

    _MAX_CACHE = 4096

    def __init__(self, threshold: float, shingle_k: int,
                 shingle_kind: str = "word"):
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.shingle_fn = (char_shingles if shingle_kind == "char"
                           else word_ngrams)
        self._cache: dict[int, set] = {}

    def _shingles(self, i: int, text) -> set:
        s = self._cache.get(i)
        if s is None:
            s = self.shingle_fn(text or "", self.shingle_k)
            if len(self._cache) >= self._MAX_CACHE:
                self._cache.clear()
            self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = batch["id_in"].to_pylist()
        ib = batch["id_out"].to_pylist()
        ta = batch["__text_in"].to_pylist()
        tb = batch["__text_out"].to_pylist()
        rows = {"id_in": [], "id_out": [], "n_inter": [], "n_inner": []}
        for a, b, xa, xb in zip(ia, ib, ta, tb):
            sa = self._shingles(a, xa)
            inner = len(sa)
            if inner == 0:
                continue
            inter = len(sa & self._shingles(b, xb))
            if inter / inner >= self.threshold:
                rows["id_in"].append(a)
                rows["id_out"].append(b)
                rows["n_inter"].append(inter)
                rows["n_inner"].append(inner)
        return pa.table({
            "id_in": pa.array(rows["id_in"], pa.int64()),
            "id_out": pa.array(rows["id_out"], pa.int64()),
            "n_inter": pa.array(rows["n_inter"], pa.int64()),
            "n_inner": pa.array(rows["n_inner"], pa.int64())})


def containment_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      tau: float = 0.8, shingle_k: int = 3,
                      shingle_kind: str = "word", max_bucket: int = 2000,
                      num_partitions: int | None = None):
    """EXACT asymmetric-containment self-join: every ORDERED pair
    ``(id_in, id_out, n_inter, n_inner)`` with
    ``|S(in) ∩ S(out)| / |S(in)| >= tau`` and ``S(in)`` non-empty —
    the quote / partial-duplicate / subset-page detector the symmetric
    Jaccard tiers cannot express (a short doc verbatim inside a long
    one has LOW Jaccard but containment 1.0; MinHash misses it by
    design).  Recall 1 BY CONSTRUCTION: the inner side emits prefix
    tokens under the overlap bound t = ceil(tau*|in|) (Chaudhuri
    ICDE'06), the outer side emits ALL tokens (its required prefix
    depends on the unknown inner size — no container prefix is sound),
    so every qualifying ordered pair shares a bucket.  Both directions
    of a near-identical pair emit two rows, matching the SQL twin.

    Cost honesty: container rows carry every token, so bucket sizes
    follow raw token frequency (no prefix damping on that side) —
    containment join is inherently hot-token-heavy; the loud
    ``max_bucket`` log is the overload alarm, and a Zipf-adequate
    shingle universe (the ppjoin REGIME WARNING) matters doubly here.
    Exchanges: ids-only candidate rows through ONE tok_key exchange;
    pair-distinct fused into the first semi-join-prefiltered text join;
    exact verify on joined texts (floats only in the final IEEE-double
    compare shared with the twin)."""
    from pypdfium2_ray.stages.warm import warm_task
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    rows = ds.map_batches(
        warm_task(_ContainTokens, id_col=id_col, text_col=text_col,
                  tau=tau, shingle_k=shingle_k, shingle_kind=shingle_kind),
        batch_format="pyarrow")
    candidates = partition_map(
        rows, ["tok_key"],
        lambda t: _contain_pairs_partition(t.to_pandas(), tau, max_bucket),
        num_partitions=num_partitions)

    pair_cols = {"id_in": pa.int64(), "id_out": pa.int64()}
    j = lookup_join(candidates, pair_cols, ds, source_key=id_col,
                    key_col="id_in",
                    payload_cols={"__text_in": pa.string()},
                    source_payload={"__text_in": text_col},
                    distinct_target_on=["id_in", "id_out"],
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    j = lookup_join(j, {**pair_cols, "__text_in": pa.string()}, ds,
                    source_key=id_col, key_col="id_out",
                    payload_cols={"__text_out": pa.string()},
                    source_payload={"__text_out": text_col},
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    return j.map_batches(
        warm_task(_VerifyContainmentJoined, threshold=tau,
                  shingle_k=shingle_k, shingle_kind=shingle_kind),
        batch_format="pyarrow")


def ppjoin_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                     tau: float = 0.6, shingle_k: int = 2,
                     shingle_kind: str = "word", freq_order_top: int = 0,
                     max_bucket: int = 2000,
                     num_partitions: int | None = None):
    """EXACT Jaccard-similar pairs: ``(id_a < id_b, n_inter, n_union)``
    for every pair with shingle-Jaccard >= tau (0/0 counts as a dup,
    the convention shared with the MinHash tier and the SQL twins).

    ``freq_order_top > 0`` runs the bounded-broadcast frequency-order
    census first (see module docstring) — the input lineage then
    executes twice."""
    from pypdfium2_ray.stages.warm import warm_task
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    top_ranks = None
    if freq_order_top > 0:
        top_ranks = _top_frequent_tokens(ds, text_col, shingle_k,
                                         shingle_kind, freq_order_top,
                                         num_partitions)
    prefix_rows = ds.map_batches(
        warm_task(_PrefixTokens, id_col=id_col, text_col=text_col,
                  tau=tau, shingle_k=shingle_k, shingle_kind=shingle_kind,
                  top_ranks=top_ranks),
        batch_format="pyarrow")
    candidates = partition_map(
        prefix_rows, ["tok_key"],
        lambda t: _prefix_pairs_partition(t.to_pandas(), tau, max_bucket),
        num_partitions=num_partitions)

    pair_cols = {"id_a": pa.int64(), "id_b": pa.int64()}
    j = lookup_join(candidates, pair_cols, ds, source_key=id_col,
                    key_col="id_a",
                    payload_cols={"__text_a": pa.string()},
                    source_payload={"__text_a": text_col},
                    distinct_target_on=["id_a", "id_b"],
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    j = lookup_join(j, {**pair_cols, "__text_a": pa.string()}, ds,
                    source_key=id_col, key_col="id_b",
                    payload_cols={"__text_b": pa.string()},
                    source_payload={"__text_b": text_col},
                    num_partitions=num_partitions,
                    prefilter_keys=5_000_000)
    return j.map_batches(
        warm_task(_VerifyJaccardJoined, threshold=tau,
                  shingle_k=shingle_k, shingle_kind=shingle_kind),
        batch_format="pyarrow")
