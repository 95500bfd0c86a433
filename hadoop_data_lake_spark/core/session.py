"""SparkSession factory.

Mirrors the reference's resource profile idea (reference:
src/dags/reports_dag.py:22-27 configures executor cores/memory for YARN) as
config *profiles* rather than hard-coded per-script builders.

Local profile targets the test/bench environment (single JVM, N threads);
cluster profile is the same settings minus master, suitable for spark-submit
on YARN/k8s. Scale-relevant defaults:

- AQE on (runtime re-plan, skew-join handling, partition coalescing).
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes an over-estimate cheap.

Skew handling — when to rely on which mechanism:

- `spark.sql.adaptive.skewJoin.enabled` (on here) splits oversized shuffle
  partitions of sort-merge/shuffled-hash JOINS at runtime using map output
  sizes. It is the right default for skewed join KEYS: zero code changes,
  and it only kicks in when a partition exceeds
  skewedPartitionThresholdInBytes (256 MB default) and the skew factor.
- `operators/skew.py` salting is for what AQE can NOT fix: skewed
  group-by/AGGREGATION keys (AQE skew handling applies to joins, not
  aggregates — a hot group still lands in one reducer), and joins where one
  specific hot key dominates so badly that even split partitions all carry
  the same key against a broadcast-too-big build side. Salting trades an
  extra partial-agg/explode for bounded per-task input; see
  salted_type_weight_sum for the worked pattern.
- session timezone pinned to UTC so timestamp semantics are reproducible and
  oracle-comparable (DuckDB timestamps are UTC-naive).
- Arrow enabled for any pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "hadoop_data_lake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
