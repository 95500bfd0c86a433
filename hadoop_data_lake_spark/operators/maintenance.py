"""Data-lake maintenance: small-file compaction.

Streaming ingest and frequent small-batch writes leave partitions with
hundreds of tiny files; at 100 TB that means a scan pays NameNode/listing
latency and task-startup overhead per file instead of reading full
128 MB-class splits. Compaction rewrites a dataset in place-equivalent form
with bounded file counts, preserving the Hive partition layout (the
reference's datasets are date-partitioned parquet, save_mes_geo.py:16-22).

Spark-first shape: one distributed read of the whole root (partition columns
recovered from the directory layout), a repartition keyed on the partition
columns so each output partition's rows land together, and a dynamic
partition-overwrite write bounded by `maxRecordsPerFile`. No driver-side
file loops — the only metadata op is Spark's own listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_dataset(
    spark: SparkSession,
    root: str,
    partition_by: str | list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 1,
    out_root: str | None = None,
) -> DataFrame:
    """Rewrite the parquet dataset at `root` with compacted files.

    `partition_by`: Hive partition columns of the layout (None = flat).
    `files_per_partition`: target file count per Hive partition (before the
    `max_records_per_file` cap re-splits oversized ones — the cap wins, so
    huge partitions still parallelize).
    `out_root`: write there instead of in-place (in-place uses dynamic
    partition overwrite: only partitions present in the data are replaced).

    Returns the compacted DataFrame (lazily re-read from the destination).
    """
    parts = (
        [partition_by]
        if isinstance(partition_by, str)
        else list(partition_by or [])
    )
    df = spark.read.parquet(root)
    if parts:
        # co-locate each Hive partition's rows; salt spreads a partition
        # across `files_per_partition` writer tasks when asked for >1
        keys = [F.col(c) for c in parts]
        if files_per_partition > 1:
            keys.append(F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition)))
        shuffled = df.repartition(*keys)
    else:
        shuffled = df.coalesce(files_per_partition)

    dst = out_root or root
    if dst == root:
        # an in-place rewrite cannot stream from the files it is replacing:
        # materialize first (block-manager copy), which also makes the write
        # safe against mid-job failure re-listing a half-overwritten root.
        # At petabyte scale prefer out_root + a metastore/location swap over
        # holding the dataset in cluster storage.
        shuffled = shuffled.localCheckpoint(eager=True)
    writer = (
        shuffled.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(dst)
    return spark.read.parquet(dst)
