"""Pipeline DAG runner — the reference's weekly Airflow chain
(src/dags/reports_dag.py:36-65) as a plain function chain:

    geotag -> user_city -> zone_report -> recommendations

The geotagged interim dataset (`mes_geo`) is MATERIALIZED to parquet once
and re-read by the three reports — the reference's cross-job checkpoint
pattern (reports_dag.py:17,46,53,60): at 100 TB you don't recompute the
events x cities argmin three times, you pay one write.

No scheduler dependency: any orchestrator (Airflow SparkSubmitOperator,
cron, dbt) can call `run_all` or the individual stages; stages take/return
paths, not DataFrames, so each is independently restartable — the property
the reference's DAG relies on.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from hadoop_data_lake_spark.core.io import write_overwrite
from hadoop_data_lake_spark.pipelines.geotag import events_with_city
from hadoop_data_lake_spark.pipelines.recommendations import recommend_pairs
from hadoop_data_lake_spark.pipelines.user_city import user_city_datamart
from hadoop_data_lake_spark.pipelines.zone_report import zone_report_from_mes_geo


def run_geotag(
    spark: SparkSession, events: DataFrame, geo: DataFrame, mes_geo_path: str
) -> str:
    """Stage 1 (save_mes_geo.py): geotag events, materialize the interim."""
    write_overwrite(events_with_city(events, geo), mes_geo_path)
    return mes_geo_path


def run_user_city(spark: SparkSession, mes_geo_path: str, out_path: str) -> str:
    """Stage 2 (calculate_user_city.py)."""
    mes_geo = spark.read.parquet(mes_geo_path)
    write_overwrite(user_city_datamart(mes_geo), out_path)
    return out_path


def run_zone_report(spark: SparkSession, mes_geo_path: str, out_path: str) -> str:
    """Stage 3 (calculate_zone_report.py) — week-partitioned like the
    reference's sink (calculate_zone_report.py:60)."""
    mes_geo = spark.read.parquet(mes_geo_path)
    write_overwrite(zone_report_from_mes_geo(mes_geo), out_path, partition_by="week")
    return out_path


def run_recommendations(
    spark: SparkSession,
    mes_geo_path: str,
    out_path: str,
    radius_km: float = 1.0,
    processed_date: _dt.date | None = None,
) -> str:
    """Stage 4 (calculate_user_recommendations.py intent, B2 fixed) —
    partitioned by processed date."""
    mes_geo = spark.read.parquet(mes_geo_path)
    recs = recommend_pairs(mes_geo, radius_km=radius_km, processed_date=processed_date)
    write_overwrite(recs, out_path, partition_by="processed_dttm")
    return out_path


def run_all(
    spark: SparkSession,
    events: DataFrame,
    geo: DataFrame,
    base_path: str,
    radius_km: float = 1.0,
    processed_date: _dt.date | None = None,
) -> dict[str, str]:
    """The full linear DAG; returns the four output paths."""
    paths = {
        "mes_geo": f"{base_path}/mes_geo",
        "user_city": f"{base_path}/analytics/user_city",
        "zone_report": f"{base_path}/analytics/zone_report",
        "recommendations": f"{base_path}/analytics/recommendations",
    }
    run_geotag(spark, events, geo, paths["mes_geo"])
    run_user_city(spark, paths["mes_geo"], paths["user_city"])
    run_zone_report(spark, paths["mes_geo"], paths["zone_report"])
    run_recommendations(
        spark,
        paths["mes_geo"],
        paths["recommendations"],
        radius_km=radius_km,
        processed_date=processed_date,
    )
    return paths
