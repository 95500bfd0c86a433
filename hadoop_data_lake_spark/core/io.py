"""Parquet IO with partition-pruning-friendly reads.

Replaces the reference's manual `date=YYYY-MM-DD` path-list construction
(reference: src/scripts/save_mes_geo.py:16-22) with a root-path read plus a
partition-column filter: Catalyst's PruneFileSourcePartitions then prunes the
same directories, but the filter also composes with column pruning and
predicate pushdown instead of living outside the plan.

At 100 TB the difference matters: a path-list read pins the file listing to
the driver up front; a root read + partition filter lets the catalog/file
index (or a metastore) do the listing, and AQE sizes the scan tasks.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated table (TESTDATA.md layout).

    The events table stores TIMESTAMP(NANOS) which Spark 4 has no native
    type for; we read nanos as long (legacy conf, set dynamically so it works
    under any session) and truncate to microsecond timestamps — the same
    truncation DuckDB applies, so both engines see identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ns_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def normalize_ns_ts(df: DataFrame) -> DataFrame:
    """Convert a nanos-as-long `ts` column back to a microsecond timestamp
    (floor division — the same truncation DuckDB applies to NANOS parquet)."""
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the session's parallelism.

    Small parquet files (single row group) arrive as one partition, which
    serializes any compute-heavy projection downstream (hashing, shingling,
    vector math). At real scale inputs already have >= cores partitions, so
    this is a no-op there — the shuffle is only paid exactly when it buys
    full-core utilization on small inputs.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_partitioned(
    spark: SparkSession,
    root: str,
    partition_col: str = "date",
    start: str | _dt.date | None = None,
    end: str | _dt.date | None = None,
) -> DataFrame:
    """Read a Hive-partitioned dataset root, pruning partitions by range.

    Equivalent semantics to the reference's input_paths() date/depth path
    enumeration (save_mes_geo.py:16-22) but expressed declaratively so the
    pruning shows up in the plan (PartitionFilters) instead of in the path
    list. `basePath` keeps the partition column in the schema.
    """
    df = spark.read.option("basePath", root).parquet(root)
    if start is not None:
        df = df.where(F.col(partition_col) >= F.lit(str(start)))
    if end is not None:
        df = df.where(F.col(partition_col) <= F.lit(str(end)))
    return df


FORMATS = ("parquet", "orc", "csv", "json")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Read `path` in any supported format.

    Parquet/ORC are the columnar primaries (README.md:8 rationale: fastest in
    Spark, vectorized reader, predicate pushdown). CSV/JSON are ingest-edge
    formats: schema should be passed explicitly (schema-on-read contract) —
    inference costs an extra pass and types drift.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    **options: str,
) -> None:
    """Write `df` to `path` in any supported format (overwrite by default)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.save(path)


def write_overwrite(df: DataFrame, path: str, partition_by: str | list[str] | None = None) -> None:
    """Overwrite-sink (reference S4/S5: save_mes_geo.py:50,
    calculate_zone_report.py:60 partitionBy week).

    Dynamic partition overwrite so a rerun of one week's data doesn't wipe
    sibling partitions — the safe default for a periodically-refreshed
    datamart at scale.
    """
    writer = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every driver table as a temp view so the whole engine surface
    is reachable from `spark.sql(...)` — the SQL catalog layer the reference
    lacks (every query there is a hard-coded script; SURVEY.md §3). Views are
    lazy: registering costs one schema read per table, no data scan."""
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
