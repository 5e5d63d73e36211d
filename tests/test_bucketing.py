"""Bucketing: pre-shuffled table layout that eliminates the join exchange.

SURVEY §2C's 100 TB posture names bucketing as the co-located-join
strategy for repeated fact-fact joins (orders ⋈ lineitem on orderkey).
This test proves the property end-to-end: write both facts bucketed by
the join key, join them, and assert the physical plan contains NO shuffle
exchange on either side — while an unbucketed join of the same data does.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # table data lands under an explicit per-test path (warehouse.dir is a
    # static conf and cannot move after session start)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    from hadoop_sync_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    for df, name, key in (
        (orders, "orders_b", "o_orderkey"),
        (li, "lineitem_b", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(wh, name))
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _join_plan(spark, left, right):
    joined = (
        spark.table(left)
        .join(spark.table(right), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # disable broadcast so the test observes the shuffle decision itself
    with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)
    return plan, n


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    plan, n = _join_plan(spark, left, right)
    assert n > 0
    # bucketed-on-join-key scan feeds the sort-merge join directly
    assert "Exchange hashpartitioning" not in plan, plan


def test_unbucketed_join_shuffles(spark, sf_dir):
    from hadoop_sync_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    joined = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)
    assert "Exchange hashpartitioning" in plan


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    from hadoop_sync_spark.io import load_table

    expected = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    got = (
        spark.table(left)
        .join(spark.table(right), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert got == expected
