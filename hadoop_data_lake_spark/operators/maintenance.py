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


def write_audit_publish(
    spark,
    df,
    target_path: str,
    expectations: dict,
    keep_generations: int = 2,
) -> dict:
    """Write-Audit-Publish (the Iceberg WAP pattern) on the repo's
    generation-pointer protocol: stage the frame as a new immutable
    generation dir, AUDIT the staged files (each expectation is a
    callable DataFrame -> bool evaluated on a re-read of the staged data
    — auditing what was actually written, not the input lineage), and
    only then PUBLISH with one atomic pointer replace. A failing audit
    leaves CURRENT untouched and the staged dir quarantined under its
    gen_* name with a REJECTED marker — consumers never observe a bad
    snapshot, and the rejected data stays inspectable.

    Returns {"published": bool, "generation": name, "audit": {name: bool}}.

    Same LOCAL-POSIX contract as stream_upsert_latest's commit; on object
    stores the identical choreography runs over a manifest/branch commit
    (Iceberg's wap.branch).
    """
    import os
    import shutil
    import time as _time

    os.makedirs(target_path, exist_ok=True)
    pointer = os.path.join(target_path, "CURRENT")
    gen_name = f"gen_{int(_time.time() * 1000):013d}"
    gen_dir = os.path.join(target_path, gen_name)
    df.write.mode("overwrite").parquet(gen_dir)

    staged = spark.read.parquet(gen_dir)
    results = {name: bool(check(staged)) for name, check in expectations.items()}
    if not all(results.values()):
        with open(os.path.join(gen_dir, "REJECTED"), "w", encoding="utf-8") as fh:
            fh.write(",".join(n for n, ok in results.items() if not ok))
        return {"published": False, "generation": gen_name, "audit": results}

    tmp = f"{pointer}.tmp_{gen_name}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(gen_name)
    os.replace(tmp, pointer)  # the commit point
    gens = sorted(
        (
            e
            for e in os.listdir(target_path)
            if e.startswith("gen_")
            and not os.path.exists(os.path.join(target_path, e, "REJECTED"))
        ),
        reverse=True,
    )
    for entry in gens[max(1, keep_generations):]:
        shutil.rmtree(os.path.join(target_path, entry), ignore_errors=True)
    return {"published": True, "generation": gen_name, "audit": results}
