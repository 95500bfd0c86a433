"""Salted operators must produce exactly the unsalted results."""

import pyspark.sql.functions as F
import pytest

from hadoop_data_lake_spark.operators.skew import (
    salted_skew_join,
    two_stage_count,
    two_stage_sum,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" carries 90% of rows
    rows = [("hot", i, i % 7) for i in range(900)] + [
        (f"k{i % 20}", i, i % 5) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, uid long, v long").cache()


def test_two_stage_count_matches_plain(spark, skewed):
    plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in two_stage_count(skewed, ["k"], salt_from="uid").collect()}
    assert salted == plain


def test_two_stage_sum_matches_plain(spark, skewed):
    plain = {r["k"]: r["t"] for r in skewed.groupBy("k").agg(F.sum("v").alias("t")).collect()}
    salted = {r["k"]: r["total"] for r in two_stage_sum(skewed, ["k"], "v", salt_from="uid").collect()}
    assert salted == plain


def test_salted_skew_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(20)], "k string, label string"
    )
    plain = sorted(
        map(tuple, skewed.join(dim, on="k").select("k", "uid", "label").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_skew_join(skewed, dim, on=["k"], salt_from="uid")
            .select("k", "uid", "label")
            .collect(),
        )
    )
    assert salted == plain
    # left rows with no dim match stay out for inner, in for left
    left = salted_skew_join(skewed, dim.where("k <> 'hot'"), on=["k"], salt_from="uid", how="left")
    assert left.where("label IS NULL").count() == 900