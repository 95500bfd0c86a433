"""Empty/degenerate inputs must produce empty (not crashing) results."""

import pyspark.sql.functions as F

from hadoop_data_lake_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs
from hadoop_data_lake_spark.operators.graph import connected_components
from hadoop_data_lake_spark.operators.similarity import brute_force_topk
from hadoop_data_lake_spark.operators.timeseries import time_grid_ffill
from hadoop_data_lake_spark.operators.windows import sessionize, top1_per_group


def test_empty_docs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(empty, "doc_id", "text").count() == 0
    assert minhash_lsh_pairs(empty, "doc_id", "text").count() == 0


def test_empty_edges(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0


def test_empty_vectors(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert brute_force_topk(empty, empty).count() == 0


def test_single_row_inputs(spark):
    one = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "k long, s string").withColumn(
        "ts", F.to_timestamp("s")
    )
    assert top1_per_group(one, ["k"], [F.col("ts").asc()]).count() == 1
    sess = sessionize(one, ["k"], "ts", gap_seconds=60).collect()
    assert sess[0]["session_id"] == 1
    filled = time_grid_ffill(
        one.withColumn("v", F.lit(1.0)), ["k"], "ts", "v", bucket_seconds=600
    ).collect()
    assert len(filled) == 1 and filled[0]["v"] == 1.0 and filled[0]["observed"]


def test_approx_percentiles_bounded_error(spark):
    """percentile_approx (accuracy=10000) must sit within 1% relative error
    of the exact percentile at gate scale — the sketch is the 100 TB path,
    the exact percentile is the oracle-checked one."""
    from hadoop_data_lake_spark.queries.registry import REGISTRY
    from hadoop_data_lake_spark.core.io import read_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_pcts"]
        for r in REGISTRY["value_percentiles_approx"].fn(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["pcts"]
        for r in read_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("pcts"))
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et in exact:
        for a, e in zip(approx[et], exact[et]):
            assert abs(a - e) <= 0.01 * max(abs(e), 1.0), (et, a, e)
