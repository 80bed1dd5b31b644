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


def test_query_pipeline_budgets(ray_session, tmp_path):
    """Multi-exchange pipeline budgets, exactly as their docstrings
    claim: late_orders 2 (max agg + join; enum count is single-block),
    returned_revenue 4 (two pre-combined aggs + two repartition joins;
    nation is broadcast), event_transitions 1 (user exchange; the pair
    combine is single-block)."""
    import importlib

    import numpy as np
    import pandas as pd
    E = importlib.import_module("__ray_entry__")
    # tiny self-contained sf dir
    d0 = pd.Timestamp("2024-01-01")
    pd.DataFrame({"o_orderkey": [1], "o_custkey": [1],
                  "o_orderstatus": ["O"], "o_totalprice": [1.0],
                  "o_orderdate": [d0], "o_orderpriority": ["1-URGENT"]}
                 ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame({"l_orderkey": [1], "l_extendedprice": [1.0],
                  "l_discount": [0.0], "l_returnflag": ["R"],
                  "l_shipdate": [d0], "l_quantity": [400.0],
                  "l_suppkey": [1], "l_partkey": [1]}
                 ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    pd.DataFrame({"s_suppkey": [1], "s_name": ["s"],
                  "s_nationkey": np.array([0], np.int32),
                  "s_acctbal": [1.0]}
                 ).to_parquet(tmp_path / "supplier.parquet", index=False)
    pd.DataFrame({"p_partkey": [1], "p_name": ["p"], "p_brand": ["B#1"],
                  "p_type": ["ECONOMY"],
                  "p_size": np.array([1], np.int32),
                  "p_retailprice": [1.0]}
                 ).to_parquet(tmp_path / "part.parquet", index=False)
    pd.DataFrame({"r_regionkey": np.array([0], np.int32),
                  "r_name": ["ASIA"]}
                 ).to_parquet(tmp_path / "region.parquet", index=False)
    pd.DataFrame({"c_custkey": [1], "c_name": ["c"],
                  "c_nationkey": np.array([0], np.int32),
                  "c_acctbal": [1.0], "c_mktsegment": ["B"]}
                 ).to_parquet(tmp_path / "customer.parquet", index=False)
    pd.DataFrame({"n_nationkey": np.array([0, 7], np.int32),
                  "n_name": ["X", "NATION_7"],
                  "n_regionkey": np.array([0, 0], np.int32)}
                 ).to_parquet(tmp_path / "nation.parquet", index=False)
    pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d"],
                  "lang": ["en", "de"], "source": ["s1", "s2"],
                  "n_chars": [3, 3]}
                 ).to_parquet(tmp_path / "documents.parquet", index=False)
    pd.DataFrame({"event_id": [1, 2], "user_id": [1, 1],
                  "ts": [d0, d0 + pd.Timedelta(seconds=1)],
                  "event_type": ["a", "b"], "value": [1.0, 2.0],
                  "props": ['{"k": 1}'] * 2}
                 ).to_parquet(tmp_path / "events.parquet", index=False)
    pa_tbl = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1], pa.int32())})
    import pyarrow.parquet as pq
    pq.write_table(pa_tbl, tmp_path / "embeddings.parquet")
    q = E.queries()
    sf = str(tmp_path)
    assert count_exchanges(q["late_orders"](sf)) == 2
    assert count_exchanges(q["returned_revenue"](sf)) == 4
    assert count_exchanges(q["event_transitions"](sf)) == 1
    # round-3 additions: Q5 = three repartition joins (nation rollup is
    # single-block), Q18 = one pre-combined agg + two joins, Q14 = one
    # pre-combined agg + one join (brand rollup single-block), pivot =
    # one key exchange (label census is single-block, separate lineage)
    assert count_exchanges(q["local_volume"](sf)) == 3
    assert count_exchanges(q["big_orders"](sf)) == 3
    assert count_exchanges(q["promo_revenue"](sf)) == 2
    assert count_exchanges(q["user_event_pivot"](sf)) == 1
    # count-distinct: ONE pair exchange (enum combine is single-block);
    # integer moments over an enum key: ZERO exchanges end to end
    assert count_exchanges(q["type_distinct_users"](sf)) == 1
    assert count_exchanges(q["value_moments"](sf)) == 0
    # pareto: one pre-combined per-user agg exchange; the skyline itself
    # is exchange-free (per-block fronts + single-block combine)
    assert count_exchanges(q["user_pareto"](sf)) == 1
    # anti-entropy digest: pure streaming partials + single-block XOR
    # combine; ntile: the range scan's one bucket exchange (the totals
    # pass lives before the materialize split)
    assert count_exchanges(q["table_digest"](sf)) == 0
    assert count_exchanges(q["chars_ntile"](sf)) == 1
    assert count_exchanges(q["sorted_layout"](sf)) == 1
    # basket: basket exchange + pair-count exchange (top-k partial-bound);
    # paths: a key's journey must colocate — exactly one exchange
    assert count_exchanges(q["basket_pairs"](sf)) == 2
    assert count_exchanges(q["user_paths"](sf)) == 1
    assert count_exchanges(q["user_value_integral"](sf)) == 1
    # Q4/Q22 shapes: one exchange-tier semi/anti join each (rollups are
    # enum-small single-block; Q22's average is a driver two-scalar pass)
    assert count_exchanges(q["order_priority_semi"](sf)) == 1
    assert count_exchanges(q["idle_rich_customers"](sf)) == 1
    assert count_exchanges(q["key_skew"](sf)) == 1
    # Q17: per-part agg + repartition join (the final fold is an unkeyed
    # coalesce, not a keyed exchange)
    assert count_exchanges(q["small_qty_revenue"](sf)) == 2
    # Q7: supplier join + orders join + per-cust pre-combine + customer
    # join; Q8 adds the part-type semi join in front
    assert count_exchanges(q["nation_flow"](sf)) == 4
    assert count_exchanges(q["mkt_share"](sf)) == 5
    # Q16: pair-dedup + part join + attr dedup (census is single-block);
    # Q21: orderkey verdict exchange + per-supplier count
    assert count_exchanges(q["part_supplier_census"](sf)) == 3
    assert count_exchanges(q["blame_supplier"](sf)) == 2
    assert count_exchanges(q["user_running_total"](sf)) == 1
    # windows/islands: one key exchange each; the trend table is a
    # time-bounded census — zero keyed exchanges end to end
    assert count_exchanges(q["event_islands"](sf)) == 1
    assert count_exchanges(q["value_centered"](sf)) == 1
    assert count_exchanges(q["monthly_delta"](sf)) == 0
    # dense top-k: partial-bound survivors, one exchange
    assert count_exchanges(q["dense_topk"](sf)) == 1
    # Q6 predicate scan: any keyed exchange is a planner bug
    assert count_exchanges(q["forecast_revenue"](sf)) == 0
    assert count_exchanges(q["event_lag"](sf)) == 1
    assert count_exchanges(q["running_distinct"](sf)) == 1
    assert count_exchanges(q["first_touch"](sf)) == 1
    assert count_exchanges(q["time_to_convert"](sf)) == 1
    assert count_exchanges(q["user_trend"](sf)) == 1
    assert count_exchanges(q["user_gini"](sf)) == 1
    assert count_exchanges(q["densify_days"](sf)) == 1
    assert count_exchanges(q["bounce_rate"](sf)) == 1
    assert count_exchanges(q["benford_digits"](sf)) == 0
    # ks_distance's prefix scans materialize their bucketed inputs, so
    # the final lineage segment holds at most ONE keyed exchange (zero
    # when this fixture's empty ECDF support short-circuits the scans)
    assert count_exchanges(q["ks_distance"](sf)) <= 1
    assert count_exchanges(q["mutual_links"](sf)) == 1
    assert count_exchanges(q["kwic_first"](sf)) == 0
    assert count_exchanges(q["value_cume"](sf)) == 1
    assert count_exchanges(q["weighted_median"](sf)) == 0
    assert count_exchanges(q["user_type_bitmask"](sf)) == 1
    assert count_exchanges(q["burst_count"](sf)) == 1
    assert count_exchanges(q["trailing_sum"](sf)) == 1
    assert count_exchanges(q["active_streak"](sf)) == 1
    assert count_exchanges(q["state_duration"](sf)) == 1
    # time_profile: fixed 168-cell grid -> single-block combine, zero
    # keyed exchanges; rfm: the two earlier range scans + the user agg
    # materialize away, the final lineage holds the last bucket shuffle
    assert count_exchanges(q["time_profile"](sf)) == 0
    assert count_exchanges(q["rfm_scores"](sf)) == 1
    assert count_exchanges(q["spike_days"](sf)) == 0
    assert count_exchanges(q["source_share"](sf)) == 0
    assert count_exchanges(q["peak_day"](sf)) == 1
    assert count_exchanges(q["systematic_sample"](sf)) == 1
    assert count_exchanges(q["adoption_lag"](sf)) == 1
    # sessionize + basket pair-gen + pair-count
    assert count_exchanges(q["session_pairs"](sf)) == 3
    assert count_exchanges(q["type_jaccard"](sf)) == 1
    assert count_exchanges(q["early_ltv"](sf)) == 1
    assert count_exchanges(q["max_gap_at"](sf)) == 1
    assert count_exchanges(q["ship_delay"](sf)) == 1
    assert count_exchanges(q["first_session_size"](sf)) == 1
    # concurrency curve: the prefix scans materialize; final segment
    # holds the last bucket shuffle (zero on an empty boundary set)
    assert count_exchanges(q["concurrency_curve"](sf)) <= 1
    assert count_exchanges(q["embedding_norms"](sf)) == 0
    assert count_exchanges(q["transition_probs"](sf)) == 1
    assert count_exchanges(q["island_lengths"](sf)) == 1
    assert count_exchanges(q["taste_shift"](sf)) == 1
    assert count_exchanges(q["momentum_score"](sf)) == 1
    assert count_exchanges(q["session_handoff"](sf)) == 1
    assert count_exchanges(q["new_vs_returning"](sf)) == 1
    assert count_exchanges(q["dim_stats"](sf)) == 0
    assert count_exchanges(q["last_touch"](sf)) == 1
    assert count_exchanges(q["purchase_gaps"](sf)) == 1
    assert count_exchanges(q["customer_order_gaps"](sf)) == 1
    assert count_exchanges(q["length_histogram"](sf)) == 0
    assert count_exchanges(q["dim_gram"](sf)) == 0
    assert count_exchanges(q["brand_price_quartiles"](sf)) == 1
    # bracket revenue: the one repartition join (rollup is single-block)
    assert count_exchanges(q["bracket_revenue"](sf)) == 1
    assert count_exchanges(q["type_corr_parts"](sf)) == 1
    assert count_exchanges(q["running_peak"](sf)) == 1
    assert count_exchanges(q["priority_median"](sf)) == 1
    assert count_exchanges(q["touches_to_convert"](sf)) == 1
    assert count_exchanges(q["order_size_hist"](sf)) == 1
    assert count_exchanges(q["discount_profile"](sf)) == 0
    assert count_exchanges(q["dup_size_hist"](sf)) == 1
    assert count_exchanges(q["char_census"](sf)) == 0
    assert count_exchanges(q["extract_toc"](sf)) == 0
    assert count_exchanges(q["token_length_hist"](sf)) == 0
    assert count_exchanges(q["gap_hist"](sf)) == 1
    assert count_exchanges(q["entry_conversion"](sf)) == 1
    assert count_exchanges(q["source_top_tokens"](sf)) == 1
    assert count_exchanges(q["type_cadence"](sf)) == 1
    assert count_exchanges(q["idle_users"](sf)) == 1
    assert count_exchanges(q["type_trigrams"](sf)) == 1
    # promo_revenue shape: per-partkey pre-combine + repartition join
    assert count_exchanges(q["brand_return_rate"](sf)) == 2
    assert count_exchanges(q["user_activity_hist"](sf)) == 1
    assert count_exchanges(q["order_status_matrix"](sf)) == 0
    assert count_exchanges(q["bookend_types"](sf)) == 1
    assert count_exchanges(q["type_dow_profile"](sf)) == 0
    assert count_exchanges(q["ab_split_metrics"](sf)) == 0
    assert count_exchanges(q["norm_hist"](sf)) == 0
    assert count_exchanges(q["dedup_keep_best"](sf)) == 1


def test_flagship_is_shuffle_free(ray_session):
    """The 100-TB claim of the extraction tier, pinned: the flagship
    read -> parse -> extract chain moves ZERO bytes through any wide
    operator — pure streaming maps end to end (dedup, when requested,
    is the single deliberate exception and lives outside this path)."""
    import importlib
    E = importlib.import_module("__ray_entry__")
    b = exchange_budget(E.queries()["extract_text"](
        "/root/testdata/sf0.001"))
    assert b == {"hash_exchanges": 0, "unkeyed_repartitions": 0,
                 "sorts": 0, "aggregates": 0}
