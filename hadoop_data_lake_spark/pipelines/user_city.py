"""User-city datamart: actual city, home city, travel history, local time
(reference: src/scripts/calculate_user_city.py:25-77).

Intended semantics implemented (reference bugs fixed per SURVEY.md §2.9):
- B4: day gaps computed on exact epoch integers, not interval casts;
- Q1: home city = the LATEST contiguous stay longer than `home_stay_days`
  (the reference could emit several home cities per user and fan out its
  final join);
- the timezone UDF (calculate_user_city.py:28-38, timezonefinder) is
  replaced by a broadcast-joined `city_id -> tz_name` dimension +
  from_utc_timestamp (§7.5): pure JVM, deterministic, oracle-checkable.

Contiguity is computed by run-length encoding city visits (lag + cumsum),
which is the well-defined version of the reference's lag-over-desc-window
day counting: a 'stay' is a maximal run of consecutive events in one city;
its length is last_ts - first_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_data_lake_spark.operators.windows import top1_per_group


def _messages(mes_geo: DataFrame) -> DataFrame:
    """Per-message rows: user_id, ts, city, tz (calculate_user_city.py:17-20
    projection, null timestamps dropped)."""
    return (
        mes_geo.where(F.col("event_type") == "message")
        .select(
            F.col("event.message_from").cast("long").alias("user_id"),
            F.to_timestamp("event.datetime", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("event_id").alias("uid"),
            "city_id",
            "city_name",
            *( [F.col("tz_name")] if "tz_name" in mes_geo.columns else [] ),
        )
        .where(F.col("ts").isNotNull())
    )


def _city_runs(msgs: DataFrame) -> DataFrame:
    """Maximal runs of consecutive same-city events per user, with bounds."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("uid").asc())
    runs = (
        msgs.withColumn("prev_city", F.lag("city_id").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_city").isNull() | (F.col("prev_city") != F.col("city_id")), 1
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return runs.groupBy("user_id", "run_id").agg(
        F.first("city_id").alias("city_id"),
        F.first("city_name").alias("city_name"),
        F.min("ts").alias("run_start"),
        F.max("ts").alias("run_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(86400.0 * 1e6)
        ).alias("stay_days"),
    )


def user_city_datamart(mes_geo: DataFrame, home_stay_days: float = 27.0) -> DataFrame:
    msgs = _messages(mes_geo)
    has_tz = "tz_name" in msgs.columns

    latest = top1_per_group(msgs, ["user_id"], [F.col("ts").desc(), F.col("uid").desc()])
    act = latest.select(
        "user_id",
        F.col("city_name").alias("act_city"),
        "ts",
        *( [F.col("tz_name")] if has_tz else [] ),
    )
    if has_tz:
        act = act.withColumn("local_time", F.from_utc_timestamp("ts", F.col("tz_name"))).drop(
            "tz_name"
        )
    act = act.drop("ts")

    runs = _city_runs(msgs)
    home = (
        top1_per_group(
            runs.where(F.col("stay_days") > home_stay_days),
            ["user_id"],
            [F.col("run_id").desc()],
        )
        .select("user_id", F.col("city_name").alias("home_city"))
    )

    visited = runs.groupBy("user_id").agg(
        F.count("*").alias("travel_count"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("run_id"), F.col("city_name")))
            ),
            lambda s: s["city_name"],
        ).alias("travel_array"),
    )

    return (
        act.join(home, on="user_id", how="left")
        .join(visited, on="user_id", how="left")
    )
