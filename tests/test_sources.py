"""Custom Python DataSource connector (sources/synthetic.py)."""

import pyspark.sql.functions as F
import pytest

from hadoop_data_lake_spark.sources.synthetic import SCHEMA, SyntheticEvents, _row


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    spark.dataSource.register(SyntheticEvents)


def test_batch_read_rows_and_schema(spark):
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 250)
        .option("numPartitions", 8)
        .load()
    )
    assert (
        df.schema.simpleString()
        == "struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"
    )
    assert df.count() == 250
    # event_id is the row index: contiguous, unique, covers the range
    ids = [r["event_id"] for r in df.select("event_id").collect()]
    assert sorted(ids) == list(range(250))


def test_batch_read_is_partition_parallel(spark):
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 100)
        .option("numPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    # each partition holds its contiguous slice (20 rows)
    sizes = df.withColumn("p", F.spark_partition_id()).groupBy("p").count().collect()
    assert sorted(r["count"] for r in sizes) == [20] * 5


def test_batch_read_deterministic_across_reads(spark):
    def snap():
        return sorted(
            map(tuple, spark.read.format("synthetic_events").option("rows", 50).load().collect())
        )

    assert snap() == snap()
    # and matches the driver-side generator exactly (portable md5 scheme)
    assert snap()[0] == _row(0, 0)


def test_seed_changes_payload_not_ids(spark):
    a = spark.read.format("synthetic_events").option("rows", 50).option("seed", 1).load()
    b = spark.read.format("synthetic_events").option("rows", 50).option("seed", 2).load()
    ra, rb = (sorted(map(tuple, d.collect())) for d in (a, b))
    assert [r[0] for r in ra] == [r[0] for r in rb]          # same ids
    assert ra != rb                                          # different payloads


def test_stream_reader_micro_batches(spark, tmp_path):
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .option("maxRows", 120)
        .option("seed", 0)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("synth_stream").collect()
        # exactly maxRows rows across 3 micro-batches, matching the pure
        # generator row-for-row
        assert len(got) == 120
        as_tuples = sorted(map(tuple, got))
        assert as_tuples[0] == _row(0, 0)
        assert [r[0] for r in as_tuples] == list(range(120))
    finally:
        q.stop()
        spark.catalog.dropTempView("synth_stream")
