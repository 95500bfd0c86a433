"""IO surface: format round-trips, partitioned writes, partition pruning.

Covers SURVEY.md §2.1 S1-S5 (parquet scans/sinks, partition enumeration ->
declarative pruning) plus the ORC/CSV/JSON extension formats.
"""

import pyspark.sql.functions as F
import pytest

from hadoop_data_lake_spark.core.io import (
    read_any,
    read_partitioned,
    write_any,
    write_overwrite,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-01", 10.5, "a"),
            (2, "2024-01-01", 20.0, "b"),
            (3, "2024-01-02", 30.25, "a"),
            (4, "2024-01-03", 40.0, "c"),
        ],
        "id long, date string, amount double, tag string",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"data_{fmt}")
    write_any(sample, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_partitioned_write_layout_and_pruning(spark, sample, tmp_path):
    root = str(tmp_path / "part_ds")
    write_overwrite(sample, root, partition_by="date")
    # Hive layout on disk
    import os

    assert sorted(d for d in os.listdir(root) if d.startswith("date=")) == [
        "date=2024-01-01",
        "date=2024-01-02",
        "date=2024-01-03",
    ]
    pruned = read_partitioned(spark, root, "date", start="2024-01-01", end="2024-01-02")
    assert pruned.count() == 3
    # the range filter must reach the scan as a PartitionFilter (S2's
    # declarative replacement for path-list enumeration)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "date" in plan


def test_dynamic_partition_overwrite_preserves_siblings(spark, sample, tmp_path):
    root = str(tmp_path / "dyn_ds")
    write_overwrite(sample, root, partition_by="date")
    # overwrite ONLY 2024-01-01 with one replacement row
    patch = spark.createDataFrame(
        [(99, "2024-01-01", 1.0, "z")], "id long, date string, amount double, tag string"
    )
    write_overwrite(patch, root, partition_by="date")
    back = spark.read.parquet(root)
    # the partition column is type-inferred from the directory names (dates
    # here) — compare on the string form
    by_date = {
        str(r["date"]): r["n"]
        for r in back.groupBy("date").agg(F.count("*").alias("n")).collect()
    }
    # sibling partitions survive the rerun (dynamic overwrite semantics)
    assert by_date == {"2024-01-01": 1, "2024-01-02": 1, "2024-01-03": 1}


def test_csv_header_and_projection_pushdown(spark, sample, tmp_path):
    path = str(tmp_path / "csv_ds")
    write_any(sample, path, fmt="csv")
    back = read_any(spark, path, fmt="csv", schema="id long, date string, amount double, tag string")
    two_cols = back.select("id", "amount")
    plan = two_cols._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    assert two_cols.count() == 4


def test_register_tables_sql_entry_point(spark):
    from hadoop_data_lake_spark.core.io import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT r_name, count(*) AS n_nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert sum(r["n_nations"] for r in out) == 25
    # events view readable with normalized timestamps
    assert spark.sql("SELECT count(*) n FROM events WHERE ts IS NOT NULL").collect()[0]["n"] > 0


def test_schema_contracts_validate_every_table(spark):
    from hadoop_data_lake_spark.core.io import SCHEMAS, TABLES, read_table

    assert set(SCHEMAS) == set(TABLES)
    for t in TABLES:  # validate=True is the default; must not raise
        read_table(spark, "/root/testdata/sf0.001", t)


def test_schema_contract_mismatch_fails_loudly(spark, tmp_path):
    from hadoop_data_lake_spark.core.io import (
        SchemaContractError,
        read_table,
        validate_schema,
    )

    # wrong type: r_regionkey written as bigint instead of int
    bad = spark.createDataFrame([(1, "AFRICA")], "r_regionkey long, r_name string")
    with pytest.raises(SchemaContractError, match="r_regionkey"):
        validate_schema(bad, "region")
    # missing column
    bad2 = spark.createDataFrame([(1,)], "r_regionkey int")
    with pytest.raises(SchemaContractError, match="region"):
        validate_schema(bad2, "region")
    # a deviating file still readable with validate=False
    bad.write.parquet(str(tmp_path / "region.parquet"))
    df = read_table(spark, str(tmp_path), "region", validate=False)
    assert df.count() == 1
    with pytest.raises(SchemaContractError):
        read_table(spark, str(tmp_path), "region")


def test_schema_evolution_merge_read(spark, tmp_path):
    """Data-lake schema evolution: files written before a column was added
    must still read alongside newer files — mergeSchema unions the file
    schemas and backfills the missing column with NULL (per-file column
    pruning still applies: old files never materialize the new column)."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.mode("overwrite").parquet(root + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    v2.write.mode("overwrite").parquet(root + "/batch=2")

    merged = read_any(spark, root, fmt="parquet", mergeSchema="true")
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 30.0
    # evolved-column aggregation skips NULL backfill rows, not files
    assert merged.agg(F.count("score")).collect()[0][0] == 2
