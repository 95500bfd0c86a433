"""Friend-recommendation pairs (reference:
src/scripts/calculate_user_recommendations.py — which does not execute as
written; SURVEY.md §2.9-B2 reconstructs the intent implemented here):

  users subscribed to the SAME channel, currently in the SAME city, whose
  latest known positions are within `radius_km` (haversine, radians-correct
  per B1), each unordered pair once, with local time and processed date.

Scale design: the pair candidate set is generated channel+city-locally via
the grid-cell banded self-join (operators/joins.grid_distance_self_join) —
never a quadratic blowup beyond a cell neighborhood; the exact haversine
filter runs only on cell-local candidates.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_data_lake_spark.operators.joins import grid_distance_self_join
from hadoop_data_lake_spark.operators.windows import top1_per_group


def _subscriptions(mes_geo: DataFrame) -> DataFrame:
    """(channel, user) pairs (calculate_user_recommendations.py:14-17
    intent, null users dropped, cast to bigint)."""
    return (
        mes_geo.where(
            (F.col("event_type") == "subscription")
            & F.col("event.user").isNotNull()
            & F.col("event.subscription_channel").isNotNull()
        )
        .select(
            F.col("event.subscription_channel").cast("long").alias("channel"),
            F.col("event.user").cast("long").alias("user"),
        )
        .distinct()
    )


def _latest_position(mes_geo: DataFrame) -> DataFrame:
    """Latest known coordinates + city per user from message events."""
    msgs = (
        mes_geo.where(F.col("event_type") == "message")
        .select(
            F.col("event.message_from").cast("long").alias("user"),
            F.to_timestamp("event.datetime", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("event_id").alias("uid"),
            "lat",
            "lon",
            "city_id",
            *( [F.col("tz_name")] if "tz_name" in mes_geo.columns else [] ),
        )
        .where(F.col("ts").isNotNull() & F.col("lat").isNotNull() & F.col("lon").isNotNull())
    )
    return top1_per_group(msgs, ["user"], [F.col("ts").desc(), F.col("uid").desc()]).drop(
        "ts", "uid"
    )


def recommend_pairs(
    mes_geo: DataFrame,
    radius_km: float = 1.0,
    processed_date: _dt.date | None = None,
) -> DataFrame:
    subs = _subscriptions(mes_geo)
    pos = _latest_position(mes_geo)
    has_tz = "tz_name" in pos.columns

    members = subs.join(pos, on="user", how="inner")

    pairs = grid_distance_self_join(
        members,
        id_col="user",
        lat_col="lat",
        lon_col="lon",
        radius_km=radius_km,
        keys=["channel", "city_id"],
        payload=["tz_name"] if has_tz else [],
    )
    # A pair may qualify through several shared channels — keep each
    # unordered user pair once with its smallest qualifying channel.
    out = pairs.groupBy(
        F.col("user_l").alias("user_left"), F.col("user_r").alias("user_right")
    ).agg(
        F.min("channel").alias("channel"),
        F.first("city_id").alias("zone_id"),
        F.min("dist_km").alias("dist_km"),
        *( [F.first("tz_name_l").alias("tz_name")] if has_tz else [] ),
    )

    processed = F.lit(str(processed_date)) if processed_date else F.current_date()
    out = out.withColumn("processed_dttm", processed.cast("date"))
    if has_tz:
        out = out.withColumn(
            "local_time",
            F.from_utc_timestamp(F.col("processed_dttm").cast("timestamp"), F.col("tz_name")),
        ).drop("tz_name")
    return out
