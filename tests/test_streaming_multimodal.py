"""Structured Streaming replay vs the batch plan, and the multimodal
binary-column plumbing."""

import pyspark.sql.functions as F

from hadoop_data_lake_spark.core.io import read_table
from hadoop_data_lake_spark.operators.multimodal import synth_media_from_text, extract_features
from hadoop_data_lake_spark.streaming.ingest import run_batch_replay
from tests.conftest import SF_DIR


def test_stream_replay_equals_batch(spark):
    got = run_batch_replay(spark, f"{SF_DIR}/events.parquet", window_seconds=600)
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(
            (F.floor(F.unix_micros("ts") / 600_000_000) * 600_000_000).alias("window_start_us"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    g = {(r["window_start_us"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["window_start_us"], r["event_type"]): r["n"] for r in batch.collect()}
    assert g == b


def test_multimodal_feature_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "xyz"), (3, "")], "doc_id long, text string"
    )
    media = synth_media_from_text(docs, "doc_id", "text")
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint",
        "binary",
        "struct<format:string,width:int,height:int,n_bytes:bigint>",
    ]
    feats = {r["media_id"]: r for r in extract_features(media, fake_decode=True).collect()}
    assert feats[1]["n_bytes"] == 2
    assert feats[1]["byte_sum"] == ord("a") + ord("b")
    assert feats[1]["first_byte"] == ord("a") and feats[1]["last_byte"] == ord("b")
    assert feats[2]["byte_mean"] == (ord("x") + ord("y") + ord("z")) / 3
    assert feats[3]["n_bytes"] == 0 and feats[3]["first_byte"] == -1
