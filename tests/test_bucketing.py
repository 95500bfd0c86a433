"""Bucketed co-located joins: pre-partitioned storage eliminates the join
shuffle — the 100 TB pattern for repeated joins on the same key (facts
bucketed by order key join with zero Exchange)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.createDataFrame(
        [(i, f"o{i}") for i in range(1000)], "k long, payload string"
    )
    b = spark.createDataFrame(
        [(i % 500, i * 1.5) for i in range(2000)], "k long, amount double"
    )
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_orders")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_lines")
    yield "bt_orders", "bt_lines"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    # the test tables are tiny, so the planner would broadcast (also
    # shuffle-free, but not what we're demonstrating) — force the big-table
    # path where bucketing is what saves the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ta).join(spark.table(tb), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides arrive pre-partitioned on k: the join runs with NO Exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the result is right
        assert joined.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = spark.table(ta).groupBy("k").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 1000
