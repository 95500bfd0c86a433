"""Zone activity report builder (reference:
src/scripts/calculate_zone_report.py:12-60).

Output contract (reference Q2, SURVEY.md §2.9): one row per
(week, month, zone_id) carrying denormalized week- and month-totals per
event type plus registration counts (first event per user).

The builder is schema-agnostic: callers hand it a base frame already
carrying (week, month, zone_id, event_type, ts, user, uid) — the flat driver
`events` table and the nested reference-shaped `mes_geo` dataset both reduce
to that shape. Registration counts join LEFT (+0 fill) so zones without any
first-time user keep their activity row (deviation from the reference's
row-dropping inner join, documented here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_data_lake_spark.operators.windows import top1_per_group


def build_zone_report(base: DataFrame, event_types: list[str]) -> DataFrame:
    """base columns: week int, month int, zone_id long, event_type string,
    ts timestamp, user long, uid long (unique row id for tie-breaks).

    All three count grains — (week, month, zone), (week, zone), (month,
    zone) — come out of ONE groupingSets aggregation (single fact scan,
    single shuffle); the naive version recomputed the pivot subtree per
    rollup, scanning the fact table three times (no exchange reuse: column
    pruning makes each copy structurally different). Registrations likewise
    produce both grains from one aggregation over one window pass.
    grouping_id bits (cols week, month, zone_id): 0 = cell grain,
    2 = month aggregated (week totals), 4 = week aggregated (month totals).
    """
    counts = base.groupingSets(
        [["week", "month", "zone_id"], ["week", "zone_id"], ["month", "zone_id"]],
        "week",
        "month",
        "zone_id",
    ).agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in event_types
        ],
        F.grouping_id().alias("gid"),
    )
    # localCheckpoint: three consumers slice this frame, and column pruning
    # makes each slice structurally different (no exchange reuse) — without
    # materialization the fact scan + Expand + aggregate run three times
    # (persist() kept the cached plan's FileScan visible and re-executable
    # under cache eviction; the checkpoint truncates lineage, so the fact
    # table is provably read ONCE — r10 control re-baseline). The frame is
    # grain-bounded (weeks x months x zones rows), tiny at any data scale.
    counts = counts.localCheckpoint(eager=True)
    zone_prep = counts.where(F.col("gid") == 0).select("week", "month", "zone_id", *event_types)
    week_tot = counts.where(F.col("gid") == 2).select(
        "week", "zone_id", *[F.col(t).alias(f"week_{t}") for t in event_types]
    )
    month_tot = counts.where(F.col("gid") == 4).select(
        "month", "zone_id", *[F.col(t).alias(f"month_{t}") for t in event_types]
    )

    regs = top1_per_group(
        base, ["user"], [F.col("ts").asc(), F.col("uid").asc()]
    ).select("user", "week", "month", "zone_id")
    # Same single-pass move: two grain slices consume this bounded
    # aggregate; the checkpoint makes the window pass over the fact table
    # run once (second and last fact read of the whole report).
    reg_counts = regs.groupingSets(
        [["week", "zone_id"], ["month", "zone_id"]], "week", "month", "zone_id"
    ).agg(F.count("*").alias("n"), F.grouping_id().alias("gid")).localCheckpoint(eager=True)
    week_user = reg_counts.where(F.col("gid") == 2).select(
        "week", "zone_id", F.col("n").alias("week_user")
    )
    month_user = reg_counts.where(F.col("gid") == 4).select(
        "month", "zone_id", F.col("n").alias("month_user")
    )

    out = (
        zone_prep.join(week_tot, on=["week", "zone_id"], how="inner")
        .join(month_tot, on=["month", "zone_id"], how="inner")
        .join(week_user, on=["week", "zone_id"], how="left")
        .join(month_user, on=["month", "zone_id"], how="left")
        .fillna(0, subset=["week_user", "month_user"])
    )
    return out.select(
        "week",
        "month",
        "zone_id",
        *[F.col(f"week_{t}") for t in event_types],
        "week_user",
        *[F.col(f"month_{t}") for t in event_types],
        "month_user",
    )


def zone_report_from_mes_geo(mes_geo: DataFrame, event_types: list[str] | None = None) -> DataFrame:
    """Reference-shaped entry: mes_geo rows with nested `event` struct,
    event_type, city_id (calculate_zone_report.py:13-22 derivations, with
    the B4-safe timestamp parse)."""
    event_types = event_types or ["message", "reaction", "subscription"]
    base = (
        mes_geo.select(
            F.to_timestamp("event.datetime", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
            F.col("city_id").cast("long").alias("zone_id"),
            F.col("event.message_from").cast("long").alias("user"),
            F.col("event_id").alias("uid"),
        )
        .where(F.col("ts").isNotNull())
        .withColumn("week", F.weekofyear("ts"))
        .withColumn("month", F.month("ts"))
    )
    return build_zone_report(base, event_types)
