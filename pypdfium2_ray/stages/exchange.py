"""Key-based exchange primitives: hash partitioning and repartition joins.

Ray Data's sort-based ``groupby(k).map_groups(fn)`` calls ``fn`` once per
key group — a Python call per group, which at crawl scale (billions of
urls / fingerprints / candidate pairs) is billions of interpreter calls.
The scale-right shape is *hash partition by key, then one vectorized
``map_batches`` call per partition* (every key's rows are complete within
one block, so per-partition kernels like sort + ``drop_duplicates`` or a
pyarrow ``group_by`` give exactly the per-group answer with zero per-group
Python).

Ray implements that exchange natively (``Dataset.repartition(keys=...)``
and ``Dataset.join``) but only under the hash-shuffle strategy, which is
NOT safe to enable globally: sort-based ``map_groups`` pipelines deadlock
under it (observed on this Ray 2.49: default 64 aggregator actors starve
an 8-CPU pool). Each Dataset chain snapshots its own ``DataContext`` at
source-creation time (``Dataset.context`` -> ``plan._context``), and the
planner consults that snapshot at execution — so :func:`_enable_hash`
flips the strategy on the *dataset's own* context, scoping it to the one
chain without touching unrelated pipelines. Aggregator actors are capped
at the cluster CPU count so small clusters (the 4-CPU test fixture)
cannot deadlock on actor scheduling.

No reference analogue: pypdfium2 is single-document (the closest is the mp
pool fan-out, ``cli/render.py:401-524``); this layer exists to make the
corpus-level ops (dedup, joins, grouped finalize) scale.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


from contextlib import contextmanager
from contextvars import ContextVar

#: scoped override for the exchange partition count (see partition_hint)
_PARTITION_HINT: ContextVar[int | None] = ContextVar("partition_hint",
                                                     default=None)


@contextmanager
def partition_hint(n: int | None):
    """Scope a partition-count hint over pipeline CONSTRUCTION: every
    exchange built inside uses *n* partitions unless given an explicit
    ``num_partitions``. Callers that know their input size set this from
    :func:`partitions_for_bytes` — partition count is a property of the
    data volume, not of the cluster."""
    tok = _PARTITION_HINT.set(n)
    try:
        yield
    finally:
        _PARTITION_HINT.reset(tok)


#: candidate-join guards (lookup_join prefilter path): above this many
#: target rows the fused pair-distinct becomes its own ids-only exchange
_PREDISTINCT_ROWS = 1_000_000
#: per-candidate payload estimate for sizing the join exchange
_EST_PAYLOAD_BYTES = 1024


def partitions_for_bytes(n_bytes: int, target_bytes: int = 64 << 20,
                         floor: int = 2, cap: int = 200) -> int:
    """Shuffle-partition count from input size: ~one partition per
    ``target_bytes`` of input (the standard shuffle sizing rule), floored
    for small inputs and capped for this sandbox — a real multi-node run
    raises ``cap`` so partitions stay ~64-256 MB at any scale.

    ``floor`` is 2 (not cpus-many): every exchange pays ~0.15 s of
    aggregator-actor spawn PER PARTITION-SERVING ACTOR cold on this Ray
    2.49, so a byte-sized input should get a byte-sized exchange — the
    count grows with the data, never with the cluster."""
    return max(floor, min(cap, -(-int(n_bytes) // target_bytes)))


def default_partitions(cap: int = 200) -> int:
    """Exchange partition count when the caller gave no explicit value and
    no :func:`partition_hint` is active: ~1 partition per CPU. Hash
    exchanges carry a fixed per-partition cost (this Ray 2.49: ~0.1-0.3 s
    per partition cold at 32 CPUs), so oversizing hurts small jobs —
    size-aware callers should prefer :func:`partitions_for_bytes`."""
    hint = _PARTITION_HINT.get()
    if hint is not None:
        return hint
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus))


def default_aggregators() -> int:
    """Aggregator-actor cap per exchange. Empirically (this Ray 2.49,
    32-CPU node) each exchange pays ~0.15 s of actor spawn PER AGGREGATOR
    cold, so cpus-many aggregators cost more in startup than they return
    in finalize parallelism until partitions carry serious data; cpus/4
    is the sweet spot at bench scale and still gives a cluster-sized pool
    at 100 TB (partitions stay cpus-many — an aggregator serves several
    partitions, which also smooths skew)."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(4, cpus // 4)


def _enable_hash(ds, num_partitions: int | None) -> int:
    """Switch *this dataset chain's* snapshotted context to hash shuffle
    (required by keyed repartition / join) and bound its aggregator count.
    Returns the resolved partition count.

    The cap must be SET, not max()-ed against the context value: Ray's
    default ``max_hash_shuffle_aggregators`` is 64, so a max() against it
    is a no-op and 64 aggregator actors spawn per exchange (the exact
    small-cluster starvation this exists to prevent). Our own sentinel
    tracks the largest cap any exchange on this chain asked for, so later
    stages can raise but never exceed the cluster-derived ceiling.
    """
    from ray.data.context import ShuffleStrategy

    from pypdfium2_ray.stages import warmpool
    warmpool.install()   # reuse aggregator actors across exchanges
    n = num_partitions or default_partitions()
    ctx = ds.context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    cap = max(min(n, default_aggregators()),
              getattr(ctx, "_graft_agg_cap", 0))
    ctx._graft_agg_cap = cap
    ctx.max_hash_shuffle_aggregators = cap
    return n


def with_output_schema(ds, schema: pa.Schema):
    """Pin *ds*'s output schema so it survives an all-empty run.

    Ray 2.49's all-to-all operators (plain ``repartition`` and the hash
    shuffle) emit ZERO output bundles when every input block is empty —
    downstream ``map_batches`` UDFs are never invoked (verified on this
    Ray: a schema-restoring UDF after ``repartition(1)`` of an all-empty
    dataset never runs), so a legitimately-empty pipeline result reports
    ``schema() is None`` and the driver's schema gate fails even when
    rows/values match the oracle. Unioning a zero-row seed block that
    carries the declared schema AHEAD of the stream keeps the result
    typed: the seed contributes no rows, ``union`` preserves block order,
    and Ray's schema unification starts from the typed seed. Costs one
    trivial input bundle.

    The union snapshots the FIRST dataset's ``DataContext`` (verified on
    this Ray 2.49), so the seed's plan context is swapped for *ds*'s
    before unioning — otherwise the seed's default SORT_SHUFFLE snapshot
    would mask the hash-shuffle strategy :func:`_enable_hash` scoped onto
    the chain and any keyed repartition in the lineage would refuse to
    run.

    Known residual (Ray 2.49, verified by probe): map UDFs are NEVER
    invoked on zero-row blocks — the block-to-batch iterator yields no
    batches — so zero-row blocks degrade to zero-COLUMN husks after any
    map stage and no map-side guard can retype them. ``schema()`` stays
    correct (the typed seed leads the stream and drives unification), but
    ``Dataset.to_pandas()`` on an ALL-empty dataset returns a 0-column
    frame on this Ray even for a fully-typed single block (probe:
    ``from_arrow(schema.empty_table()).to_pandas()`` has no columns).
    Consumers that need typed empty DataFrames must build them from
    ``ds.schema()`` — which is what the driver's schema gate reads."""
    import ray
    seed = ray.data.from_arrow(schema.empty_table())
    seed._plan._context = ds.context
    return seed.union(ds)


def _schema_guarded(fn: Callable[[pa.Table], pa.Table],
                    out_schema: pa.Schema | None):
    """Wrap a per-partition kernel so degenerate exchange blocks stay
    typed: Ray's hash-shuffle aggregators emit zero-COLUMN empty blocks
    for empty partitions (the "RefBundle with a different schema: <empty>"
    warning class) which would KeyError inside a column-addressing kernel;
    with a declared schema those become typed empties, and every kernel
    output is aligned (column order + type cast) to the declaration so all
    blocks of the stream agree."""
    if out_schema is None:
        return fn

    def wrapped(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        out = fn(t)
        if out.schema != out_schema:
            out = pa.table(
                {name: pc.cast(out[name], out_schema.field(name).type)
                 for name in out_schema.names})
        return out

    return wrapped


def partition_map(ds, keys: list[str], fn: Callable[[pa.Table], pa.Table],
                  num_partitions: int | None = None,
                  batch_format: str = "pyarrow",
                  out_schema: pa.Schema | None = None, **mb_kwargs):
    """Hash-partition ``ds`` on *keys*, then apply one vectorized ``fn``
    per partition (``batch_size=None`` => whole-block batches; every key's
    rows arrive complete in exactly one call).

    This is the billions-of-groups replacement for
    ``groupby(keys).map_groups`` — ``fn`` must be a *per-partition* kernel
    (e.g. ``pandas sort_values + drop_duplicates`` or pyarrow ``group_by``),
    not a per-group one.

    ``out_schema`` (optional) declares the kernel's output schema: kernel
    outputs are aligned to it, zero-column degenerate blocks from empty
    partitions become typed empties, and the returned dataset reports this
    schema even when the whole exchange is empty (see
    :func:`with_output_schema`). Pass it on any exchange whose result can
    legitimately be empty.
    """
    if out_schema is not None and batch_format != "pyarrow":
        raise ValueError("out_schema requires batch_format='pyarrow' "
                         "(the guard aligns Arrow tables)")
    n = _enable_hash(ds, num_partitions)
    out = ds.repartition(num_blocks=n, keys=keys)
    out = out.map_batches(_schema_guarded(fn, out_schema), batch_size=None,
                          batch_format=batch_format, **mb_kwargs)
    if out_schema is not None:
        out = with_output_schema(out, out_schema)
    return out


def lookup_join(target, target_cols: dict[str, pa.DataType],
                source, source_key: str, key_col: str,
                payload_cols: dict[str, pa.DataType],
                source_payload: dict[str, str] | None = None,
                distinct_target_on: list[str] | None = None,
                num_partitions: int | None = None,
                prefilter_keys: int | None = None,
                how: str = "inner"):
    """Repartition (hash) join: attach *source*'s payload columns onto
    *target* rows where ``target[key_col] == source[source_key]``.

    ``how="inner"`` (default) keeps matched target rows; ``how="left"``
    keeps every target row, null-filling the payload columns where no
    source key matches (``index_in`` yields null indices and ``take``
    propagates them — the outer variant costs nothing extra). Callers
    whose output feeds the driver hash gate should ``fill_null`` the
    payloads with a sentinel (the gate cannot sort mixed None/str).

    Both sides are null-padded to one shared schema, tagged, unioned, and
    hash-exchanged ONCE on the key; each partition then runs a single
    vectorized pyarrow ``Table.join`` — no driver materialization, no
    broadcast, no per-group Python. The small-side-broadcast pattern
    (stages/join.broadcast_join) stays the right call for dimension
    tables; this is for large-x-large equi-joins (candidate pairs back to
    the corpus).

    Built on union + :func:`partition_map` rather than the experimental
    ``Dataset.join``, which (Ray 2.49) crashes when a hash-repartitioned
    input carries the zero-column empty blocks its own aggregators emit
    for empty partitions.

    ``target_cols`` / ``payload_cols`` are the static schemas of the two
    sides (callers know them by construction); ``key_col`` must be one of
    ``target_cols``. ``source_payload`` maps an output payload name to the
    source column it comes from (default: same name).

    ``distinct_target_on``: dedupe target rows on these columns inside the
    join partition (valid iff ``key_col`` is one of them, so equal rows
    are guaranteed co-partitioned) — fuses an LSH pair-distinct into the
    join's exchange instead of paying a separate one.

    ``prefilter_keys``: semi-join prefilter for KNOWN-SMALL targets (the
    dedup/ANN verify joins: a tiny candidate-pair set against the full
    corpus). The target is materialized (it is about to be enumerated
    twice anyway), its distinct keys broadcast once (``ray.put``), and
    source blocks are filtered BEFORE the pad/union — so the exchange
    carries only matching source rows instead of the whole corpus
    payload. The value is the EXACT-broadcast ceiling: above it the
    prefilter degrades to a Bloom filter (``functions/bloom``: ~10
    bits/key, ~1% false positives, built distributedly as OR-combined
    per-block bitmaps) with a loud log — false positives are dropped in
    the join kernel, so correctness never depends on the filter; only
    ~1% of non-matching source rows slip into the exchange instead of
    all of them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if distinct_target_on is not None:
        assert key_col in distinct_target_on
    t_names = list(target_cols)
    p_names = list(payload_cols)
    src_of = source_payload or {}
    assert key_col in target_cols and not set(p_names) & set(t_names)
    key_type = target_cols[key_col]

    keys_ref = bloom_ref = None
    if prefilter_keys is not None:
        import ray
        target = target.materialize()
        n_target = target.count()               # cheap on materialized data
        # -- big-candidate guards (the LSH/ppjoin candidate-join shape) --
        # (1) above _PREDISTINCT_ROWS, run the pair-distinct as its OWN
        # ids-only exchange instead of fusing it into the join: fused
        # distinct means every band-duplicated candidate row (up to
        # `bands` copies) rides the text-payload exchange and join
        # kernel. Only valid when the distinct key IS the whole target
        # row set (true for candidate pairs); results are identical
        # either way.
        if (distinct_target_on is not None
                and n_target > _PREDISTINCT_ROWS
                and set(distinct_target_on) == set(t_names)):
            dk = list(distinct_target_on)

            def _distinct_kernel(t: pa.Table) -> pa.Table:
                return t.group_by(dk, use_threads=False).aggregate([])

            target = partition_map(
                target, [key_col], _distinct_kernel,
                num_partitions=max(num_partitions or 0,
                                   partitions_for_bytes(
                                       target.size_bytes() or 0)) or None
            ).materialize()
            n_target = target.count()
            distinct_target_on = None
        # (2) size the JOIN exchange by the candidate volume, not the raw
        # input hint: each surviving target row gathers a payload row, so
        # the join output is ~n_target x payload bytes — a 2-partition
        # hint from a small input OOMs (or overflows pyarrow's 2^31
        # string offsets in) the kernel when candidates are millions of
        # pairs. Payload estimated at _EST_PAYLOAD_BYTES/row (web-text
        # class); partitions only ever RAISE, never drop below the
        # caller's count.
        est_bytes = (target.size_bytes() or 0) + n_target * _EST_PAYLOAD_BYTES
        num_partitions = max(num_partitions or 0,
                             partitions_for_bytes(est_bytes)) or None
        if n_target <= prefilter_keys:
            key_vals = pc.unique(pa.chunked_array([
                pc.cast(b[key_col], key_type)
                for b in target.iter_batches(batch_format="pyarrow",
                                             batch_size=None)
                if b.num_rows] or [pa.array([], key_type)]))
            keys_ref = ray.put(key_vals)
        else:
            import logging

            from pypdfium2_ray.functions import bloom
            logging.getLogger(__name__).warning(
                "lookup_join prefilter: target has %d rows > "
                "prefilter_keys=%d — degrading from exact key broadcast "
                "to a Bloom filter (%d bits, ~1%% false positives pass "
                "to the kernel)", n_target, prefilter_keys,
                bloom.sizing(n_target))
            bits = bloom.build_from_dataset(target, key_col, n_target,
                                            cast_type=key_type)
            bloom_ref = ray.put(bits)

    def pad_target(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: pc.cast(t[c], target_cols[c]) for c in t_names}
        cols.update({c: pa.nulls(n, ty) for c, ty in payload_cols.items()})
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def pad_source(t: pa.Table) -> pa.Table:
        if keys_ref is not None:
            import ray
            keys = ray.get(keys_ref)            # local plasma hit, zero-copy
            t = t.filter(pc.is_in(pc.cast(t[source_key], key_type),
                                  value_set=keys))
        elif bloom_ref is not None:
            import ray

            from pypdfium2_ray.functions import bloom
            bits = ray.get(bloom_ref)           # plasma-local bitmap
            if t.num_rows:
                t = t.filter(pa.array(bloom.contains(
                    bits, pc.cast(t[source_key], key_type).combine_chunks())))
        n = t.num_rows
        cols = {c: pa.nulls(n, ty) for c, ty in target_cols.items()}
        cols[key_col] = pc.cast(t[source_key], key_type)
        cols.update({c: pc.cast(t[src_of.get(c, c)], payload_cols[c])
                     for c in p_names})
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    tagged = target.map_batches(pad_target, batch_format="pyarrow").union(
        source.map_batches(pad_source, batch_format="pyarrow"))

    def kernel(t: pa.Table) -> pa.Table:
        # local merge via index_in + take (NOT pyarrow Table.join, which
        # rejects list-typed non-key columns): source keys are unique by
        # contract (a lookup), so first-match == only-match, and take()
        # gathers any payload type (strings, list<float>, binary) zero-copy
        side = t["__side"]
        tgt = t.filter(pc.equal(side, 0))
        src = t.filter(pc.equal(side, 1))
        if distinct_target_on is not None and tgt.num_rows:
            dup = tgt.select(distinct_target_on).to_pandas().duplicated()
            tgt = tgt.filter(pa.array(~dup.to_numpy()))
        idx = pc.index_in(tgt[key_col].combine_chunks(),
                          value_set=src[key_col].combine_chunks())
        if how == "inner":
            mask = pc.is_valid(idx)
            tgt = tgt.filter(mask)
            idx = idx.filter(mask)
        cols = {c: tgt[c] for c in t_names}
        for c in p_names:
            cols[c] = pc.take(src[c].combine_chunks(), idx)
        return pa.table(cols)

    return partition_map(tagged, [key_col], kernel,
                         num_partitions=num_partitions)
