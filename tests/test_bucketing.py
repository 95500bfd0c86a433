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


def test_analyze_table_statistics_feed_planner(spark, tmp_path):
    """Catalog statistics surface: ANALYZE TABLE COMPUTE STATISTICS (table
    + column level) must land rowCount/size in the catalog — the numbers
    cost-based planning reads — and a join against the analyzed small
    table must plan as a broadcast."""
    import pyspark.sql.functions as F

    from hadoop_data_lake_spark.core.io import read_table

    nation = read_table(spark, "/root/testdata/sf0.001", "nation")
    spark.sql("DROP TABLE IF EXISTS nation_stats_t")
    nation.write.saveAsTable("nation_stats_t")
    try:
        spark.sql("ANALYZE TABLE nation_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
        desc = spark.sql("DESCRIBE EXTENDED nation_stats_t").collect()
        stats_row = next(r for r in desc if r["col_name"] == "Statistics")
        assert "rows" in stats_row["data_type"]  # e.g. "1381 bytes, 25 rows"
        col_desc = spark.sql(
            "DESCRIBE EXTENDED nation_stats_t n_nationkey"
        ).collect()
        info = {r["info_name"]: r["info_value"] for r in col_desc}
        assert info.get("distinct_count") not in (None, "NULL")
        big = spark.range(0, 200_000).select(
            (F.col("id") % 25).alias("n_nationkey"), F.col("id").alias("v")
        )
        plan = (
            big.join(spark.table("nation_stats_t"), "n_nationkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats_t")
