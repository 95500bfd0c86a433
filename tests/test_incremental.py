"""Partition-level incremental refresh (pipelines/incremental.py):
stale build + refresh of changed weeks == full rebuild, untouched
partitions not rewritten."""

import glob
import os

import pyspark.sql.functions as F

from hadoop_data_lake_spark.core.io import read_table, write_overwrite
from hadoop_data_lake_spark.pipelines.incremental import (
    affected_weeks,
    refresh_weekly_zone_counts,
    weekly_zone_counts,
)
from tests.conftest import SF_DIR


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)): None for r in df.collect()
    }.keys()


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    events = read_table(spark, SF_DIR, "events")
    cutoff = events.select(
        F.date_add(F.max(F.to_date("ts")), -6).alias("c")
    ).first()["c"]

    facts_root = str(tmp_path / "events_by_date")
    out_root = str(tmp_path / "weekly")

    # v1 facts: everything before the final week; stale full build from them
    write_overwrite(
        events.withColumn("date", F.to_date("ts").cast("string")),
        facts_root,
        partition_by="date",
    )
    v1 = events.where(F.to_date("ts") < F.lit(str(cutoff)))
    (
        weekly_zone_counts(v1)
        .repartition("week")
        .write.mode("overwrite")
        .partitionBy("week")
        .parquet(out_root)
    )
    stale_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{out_root}/week=*/*.parquet")
    }

    # the new batch arrives (the final week's events, incl. a boundary week)
    batch = events.where(F.to_date("ts") >= F.lit(str(cutoff)))
    weeks = affected_weeks(batch)
    assert weeks
    refresh_weekly_zone_counts(spark, facts_root, out_root, weeks)

    # refreshed output == full rebuild from all facts
    got = spark.read.parquet(out_root)
    full = weekly_zone_counts(events)
    assert sorted(_rows(got)) == sorted(_rows(full))

    # untouched week partitions kept their original files
    for f, mtime in stale_files.items():
        week = int(f.split("week=")[1].split("/")[0])
        if week not in weeks:
            assert os.path.getmtime(f) == mtime, f


def test_refresh_prunes_fact_partitions(spark, tmp_path):
    events = read_table(spark, SF_DIR, "events")
    facts_root = str(tmp_path / "facts")
    write_overwrite(
        events.withColumn("date", F.to_date("ts").cast("string")),
        facts_root,
        partition_by="date",
    )
    from hadoop_data_lake_spark.core.io import read_partitioned

    one_week = [
        r["w"]
        for r in events.select(F.weekofyear("ts").alias("w")).distinct().limit(1).collect()
    ]
    pruned = read_partitioned(spark, facts_root).where(
        F.weekofyear(F.to_date(F.col("date"))).isin(one_week)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "PartitionFilters" in scan
    # the week predicate binds to the partition column -> no data filter
    assert "DataFilters: []" in scan
