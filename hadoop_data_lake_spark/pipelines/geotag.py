"""Geotag pipeline: enrich raw events with their nearest city
(reference: src/scripts/save_mes_geo.py:24-50).

Differences from the reference, by design:
- haversine uses radians (fixes reference bug B1, save_mes_geo.py:39);
- the geo dimension is explicitly broadcast (the reference relied on the
  implicit autoBroadcastJoinThreshold);
- the nearest-city argmin has a deterministic tie-break (distance, then city
  id) — the reference's rank-1 on distance alone is partition-order
  dependent on exact ties;
- reading the events root with a date-range filter replaces the manual
  `date=YYYY-MM-DD` path-list enumeration (save_mes_geo.py:16-22): Catalyst
  partition pruning does the same directory skipping inside the plan.

Scale: the candidate generation is crossJoin(events, broadcast(geo)) — the
right physical plan while |cities| is small (O(events x cities) compare, no
shuffle). For very large dims switch to functions/geo.grid_cell bucketing
(operators/joins.grid_distance_self_join shows the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_data_lake_spark.functions.geo import haversine_km
from hadoop_data_lake_spark.operators.windows import top1_per_group


def events_with_city(events: DataFrame, geo: DataFrame) -> DataFrame:
    """events: reference-shaped rows with lat/lon (FIXTURES.md A1);
    geo: id, city, lat_c, lon_c (+ tz_name) (FIXTURES.md A2).

    Returns events + event_id, city_id, city_name, lat_c/lon_c, tz_name,
    dist_km — the `mes_geo` interim dataset every report consumes
    (reports_dag.py:17,46,53,60).
    """
    ev = events.withColumn("event_id", F.monotonically_increasing_id())
    dims = geo.select(
        F.col("id").alias("city_id"),
        F.col("city").alias("city_name"),
        "lat_c",
        "lon_c",
        *( [F.col("tz_name")] if "tz_name" in geo.columns else [] ),
    )
    paired = ev.crossJoin(F.broadcast(dims)).withColumn(
        "dist_km", haversine_km(F.col("lat"), F.col("lon"), F.col("lat_c"), F.col("lon_c"))
    )
    return top1_per_group(
        paired, ["event_id"], [F.col("dist_km").asc(), F.col("city_id").asc()]
    )
