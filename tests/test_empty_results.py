"""Empty-input / empty-result robustness of the relational family.

Ray 2.49's all-to-all operators emit ZERO output bundles when every input
block is empty, so without an explicit schema declaration a legitimately
empty pipeline reports ``schema() is None`` and fails the driver's schema
gate even when rows/values match the oracle (the round-3 red cell:
``idle_rich_customers`` at sf0.01). These tests drive every public
relational query over a ZERO-ROW corpus (each table keeps its real
parquet schema) and assert the result is still a well-typed dataset —
no crash, non-None schema wherever the exchange/aggregate layer's
``out_schema`` threading applies (stages/exchange.with_output_schema).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

#: every public query in pipelines/relational.py
RELATIONAL = [
    "lineitem_pricing_summary", "orders_by_region", "top_orders",
    "events_rollup", "latest_event_per_user", "shipping_priority",
    "late_orders", "local_supplier_volume", "big_orders",
    "brand_promo_revenue", "returned_revenue", "cust_order_dist",
    "order_priority_semi", "top_supplier", "small_qty_revenue",
    "idle_rich_customers", "nation_flow", "mkt_share",
    "part_supplier_census", "blame_supplier", "important_parts",
    "forecast_revenue", "ship_delay",
]


@pytest.fixture(scope="module")
def empty_sf(ray_session, tmp_path_factory):
    """A corpus dir whose tables carry the REAL sf0.001 schemas with
    zero rows — the adversarial input for every empty-path branch."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        sch = pq.read_schema(os.path.join(SF, f"{t}.parquet"))
        pq.write_table(sch.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_on_empty_corpus(ray_session, empty_sf, name):
    import ray.data

    from pypdfium2_ray.pipelines import relational
    ds = getattr(relational, name)(empty_sf)
    if isinstance(ds, pa.Table):       # bounded results may materialize
        assert ds.num_columns > 0
        return
    assert isinstance(ds, ray.data.Dataset)
    sch = ds.schema()
    assert sch is not None, f"{name}: empty-input result lost its schema"
    assert len(sch.names) > 0, f"{name}: empty-input schema has no columns"
    # consuming the empty result must not crash either
    rows = ds.take_all()
    assert isinstance(rows, list)


def test_idle_rich_customers_empty_result_schema(ray_session):
    """The round-3 red cell: sf0.001 has rich customers but none idle —
    a legitimately EMPTY result from a non-empty input must keep its
    declared, oracle-matching schema."""
    from pypdfium2_ray.pipelines.relational import idle_rich_customers
    ds = idle_rich_customers(SF)
    sch = ds.schema()
    assert sch is not None
    assert sch.names == ["c_nationkey", "n_cust", "sum_acctbal_cents"]


def test_with_output_schema_seed_keeps_hash_context(ray_session):
    """The seed union must inherit the chain's hash-shuffle context —
    a later keyed exchange on the seeded dataset would otherwise refuse
    to run (seed's default context is SORT_SHUFFLE)."""
    import ray.data

    from pypdfium2_ray.stages.exchange import partition_map

    sch = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    ds = ray.data.from_arrow(pa.table({"k": [1, 2, 2], "v": [1, 1, 1]}))

    def count(t: pa.Table) -> pa.Table:
        g = t.group_by(["k"]).aggregate([([], "count_all")])
        return pa.table({"k": g["k"],
                         "n": pa.compute.cast(g["count_all"], pa.int64())})

    first = partition_map(ds, ["k"], count, num_partitions=2,
                          out_schema=sch)
    # chain a SECOND keyed exchange off the schema-pinned result
    second = partition_map(first, ["k"], lambda t: t, num_partitions=2,
                           out_schema=sch)
    got = sorted(second.take_all(), key=lambda r: r["k"])
    assert got == [{"k": 1, "n": 1}, {"k": 2, "n": 2}]


def test_partition_map_out_schema_on_all_empty(ray_session):
    import ray.data

    from pypdfium2_ray.stages.exchange import partition_map

    sch = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                       "n": pa.array([], pa.int64())}))
    out = partition_map(ds, ["k"], lambda t: t, num_partitions=2,
                        out_schema=sch)
    got_schema = out.schema()
    assert got_schema is not None and got_schema.names == ["k", "n"]
    assert out.take_all() == []


def test_grouped_aggregate_out_schema_both_tiers(ray_session):
    import ray.data

    from pypdfium2_ray.stages.agg import grouped_aggregate

    sch = pa.schema([("k", pa.int64()), ("total", pa.int64())])
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                          "v": pa.array([], pa.int64())}))
    for tier in ("exchange", "single_block"):
        out = grouped_aggregate(empty, ["k"], {"total": ("v", "sum")},
                                combine=tier, out_schema=sch)
        s = out.schema()
        assert s is not None and s.names == ["k", "total"], tier
        assert out.take_all() == [], tier
