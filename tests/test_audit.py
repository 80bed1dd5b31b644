"""Exchange-budget contracts (stages/audit): every stage's documented
shuffle count, pinned as assertions on the logical plan — a regression
that adds a hidden second exchange to a one-exchange op fails here."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from pypdfium2_ray.stages.audit import count_exchanges, exchange_budget
from pypdfium2_ray.stages.exchange import partition_hint


def _docs_ds(n=30):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"w{i % 5} w{i % 7} tail{i}" for i in range(n)]),
    }))


def _events_ds(n=40):
    t0 = pd.Timestamp("2024-01-01")
    return rd.from_pandas(pd.DataFrame({
        "user_id": [i % 6 for i in range(n)],
        "event_id": list(range(n)),
        "ts": [t0 + pd.Timedelta(minutes=i) for i in range(n)],
        "value": [float(i % 9) for i in range(n)],
        "event_type": [f"t{i % 3}" for i in range(n)],
    }))


def test_zero_exchange_ops(ray_session):
    from pypdfium2_ray.stages.invindex import boolean_search
    assert count_exchanges(boolean_search(_docs_ds(), ["w1"])) == 0


def test_one_exchange_ops(ray_session):
    from pypdfium2_ray.stages.agg import (
        grouped_decay_sum, grouped_median, grouped_mode,
        grouped_order_stats)
    from pypdfium2_ray.stages.dedup import prefix_dup_owner
    from pypdfium2_ray.stages.invindex import compressed_posting_sizes
    from pypdfium2_ray.stages.sessionize import gap_stats
    from pypdfium2_ray.stages.shuffle import (
        deterministic_shuffle, ring_negative_pairs)
    from pypdfium2_ray.stages.snapshot import apply_changelog
    docs, ev = _docs_ds(), _events_ds()
    with partition_hint(2):
        one = [
            prefix_dup_owner(docs),
            compressed_posting_sizes(docs),
            ring_negative_pairs(docs),
            deterministic_shuffle(docs),
            gap_stats(ev),
            grouped_mode(ev, ["event_type"], "user_id"),
            grouped_median(ev, ["event_type"], "value"),
            grouped_order_stats(ev, ["event_type"], "value", "event_id"),
            grouped_decay_sum(ev, ["user_id"], "ts", "value"),
            apply_changelog(
                rd.from_arrow(pa.table({
                    "doc_id": pa.array([1], pa.int64()), "text": ["a"],
                    "version": pa.array([0], pa.int64()),
                    "op": ["upsert"]})),
                rd.from_arrow(pa.table({
                    "doc_id": pa.array([1], pa.int64()), "text": ["b"],
                    "version": pa.array([1], pa.int64()),
                    "op": ["upsert"]}))),
        ]
    for ds in one:
        assert count_exchanges(ds) == 1, ds


def test_no_native_wide_ops_anywhere(ray_session):
    """The repo's stages never fall back to Ray Data's sort-based
    groupby/sort — a nonzero count would mean a per-group-Python or
    sort-shuffle path crept in."""
    from pypdfium2_ray.stages.dedup import prefix_dup_owner
    b = exchange_budget(prefix_dup_owner(_docs_ds()))
    assert b["sorts"] == 0 and b["aggregates"] == 0
