"""Time-series regularization: bucket -> dense time grid -> forward fill.

The missing piece between event streams and ML feature matrices: events
arrive irregularly; models want one row per (key, time bucket) with the
last-known value carried forward.

Plan shape (all JVM, two shuffles):
  1. last event per (key, bucket)      — shuffle on (key, bucket)
  2. per-key bucket bounds + sequence() -> explode = the dense grid
  3. grid LEFT JOIN step-1, then last(value, ignoreNulls) over a running
     window per key — the forward fill. Running frame = single pass.

At 100 TB the grid explode is bounded by (keys x buckets), not events, and
the fill window shuffles once on key — no iterative or Python step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_data_lake_spark.operators.windows import top1_per_group


def time_grid_ffill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per (keys..., bucket) between each key's first and last
    event, with `value_col` = last observed value at or before that bucket.

    Returns keys + bucket_start_us + value (+ __observed flag).
    `tiebreak` columns make the per-bucket 'last event' deterministic when
    timestamps tie.
    """
    bucket_us = bucket_seconds * 1_000_000
    tiebreak = tiebreak or []

    b = (F.unix_micros(F.col(ts_col)) / bucket_us).cast("long")
    events = df.select(
        *keys, b.alias("__b"), F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"),
        *tiebreak,
    )
    last_per_bucket = top1_per_group(
        events,
        [*keys, "__b"],
        [F.col("__ts").desc(), *[F.col(c).desc() for c in tiebreak]],
    ).select(*keys, "__b", "__v")

    bounds = events.groupBy(*keys).agg(
        F.min("__b").alias("__b_min"), F.max("__b").alias("__b_max")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("__b_min", "__b_max")).alias("__b")
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        grid.join(last_per_bucket, on=[*keys, "__b"], how="left")
        .withColumn("__observed", F.col("__v").isNotNull())
        .withColumn("__filled", F.last("__v", ignorenulls=True).over(w))
    )
    return filled.select(
        *keys,
        (F.col("__b") * bucket_us).alias("bucket_start_us"),
        F.col("__filled").alias(value_col),
        F.col("__observed").alias("observed"),
    )


def time_grid_interpolate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Dense grid with LINEAR interpolation between observations (the
    ffill's smooth sibling: gaps ramp between endpoints instead of
    stair-stepping; edges beyond the first/last observation clamp to it).

    Same grid/shuffle shape as time_grid_ffill plus one backward-looking
    and one forward-looking window over the SAME key partitioning — still
    a single hash shuffle on the key, no Python, no iteration.
    """
    bucket_us = bucket_seconds * 1_000_000
    tiebreak = tiebreak or []

    b = (F.unix_micros(F.col(ts_col)) / bucket_us).cast("long")
    events = df.select(
        *keys, b.alias("__b"), F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"),
        *tiebreak,
    )
    last_per_bucket = top1_per_group(
        events,
        [*keys, "__b"],
        [F.col("__ts").desc(), *[F.col(c).desc() for c in tiebreak]],
    ).select(*keys, "__b", "__v")

    bounds = events.groupBy(*keys).agg(
        F.min("__b").alias("__b_min"), F.max("__b").alias("__b_max")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("__b_min", "__b_max")).alias("__b")
    )

    back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("__v").isNotNull(), F.col("__b"))
    j = (
        grid.join(last_per_bucket, on=[*keys, "__b"], how="left")
        .withColumn("__observed", F.col("__v").isNotNull())
        .withColumn("__pv", F.last("__v", ignorenulls=True).over(back))
        .withColumn("__pb", F.last(obs_b, ignorenulls=True).over(back))
        .withColumn("__nv", F.first("__v", ignorenulls=True).over(fwd))
        .withColumn("__nb", F.first(obs_b, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("__pb").isNull(), F.col("__nv"))
        .when(F.col("__nb").isNull(), F.col("__pv"))
        .when(F.col("__nb") == F.col("__pb"), F.col("__pv"))
        .otherwise(
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (F.col("__b") - F.col("__pb"))
            / (F.col("__nb") - F.col("__pb"))
        )
    )
    return j.select(
        *keys,
        (F.col("__b") * bucket_us).alias("bucket_start_us"),
        interp.alias(value_col),
        F.col("__observed").alias("observed"),
    )
