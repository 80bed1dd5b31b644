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
