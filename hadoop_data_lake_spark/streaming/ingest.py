"""Structured Streaming ingest variant (engine extension; the reference is
weekly batch only — README.md:6 — so this is the §2.8 'optional extension').

`windowed_event_counts` is the streaming twin of the zone report's
time-bucketed counts: tumbling event-time windows + watermark for late data.
`run_batch_replay` drives the same plan over a static parquet directory with
the availableNow trigger + memory sink, which is how the correctness oracle
can check a streaming plan deterministically (single batch, no late drops).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type (append-able with
    watermark; windows align to the epoch so starts are deterministic)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{window_seconds} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )


def run_batch_replay(
    spark: SparkSession, parquet_path: str, window_seconds: int = 600
) -> DataFrame:
    """Run the streaming plan over a static parquet file: availableNow
    trigger drains everything as one batch into a memory sink and returns
    the (batch) result table."""
    from hadoop_data_lake_spark.core.io import normalize_ns_ts

    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(parquet_path).schema
    # The file-stream source monitors a DIRECTORY; expose a single-file input
    # through a scratch dir with a symlink (read-only source stays untouched).
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(parquet_path, os.path.join(src_dir, os.path.basename(parquet_path)))
    stream = normalize_ns_ts(spark.readStream.schema(schema).parquet(src_dir))
    out = windowed_event_counts(stream, window_seconds)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
