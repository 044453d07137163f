"""Bucketed-table co-location: plan-level proof that writing both join
sides bucketed on the join key removes the shuffle (sources/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.sources.bucketing import colocated_join, write_bucketed
from frappe_data_pipelines_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.withColumnRenamed("o_orderkey", "orderkey"),
                   "t_orders_b", ["orderkey"], n_buckets=8, sort_cols=["orderkey"])
    write_bucketed(li.withColumnRenamed("l_orderkey", "orderkey"),
                   "t_lineitem_b", ["orderkey"], n_buckets=8, sort_cols=["orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, on=["orderkey"])
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffled"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expect = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy().agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .first()
    )
    got = (
        colocated_join(spark, lt, rt, on=["orderkey"])
        .groupBy().agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .first()
    )
    assert got["n"] == expect["n"] and got["q"] == expect["q"]


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the write-time distribution."""
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed groupBy still shuffled"
