"""Reusable window-function operators.

Generalizes the reference's four window patterns (SURVEY.md §2.5):
  W1 argmin-per-group   (save_mes_geo.py:41-44 — nearest city by distance)
  W2 latest-per-key     (calculate_user_city.py:42-50 — actual city)
  W3 lag-gap            (calculate_user_city.py:56 — days stayed)
  W4 first-per-key      (calculate_zone_report.py:28-35 — registration)

Every ordering carries an explicit deterministic tie-break column list —
the reference orders by a single (non-unique) column, so its rank-1 row is
partition-order-dependent; ours is reproducible across runs and engines.

Scale note: row_number() windows shuffle on the partition keys once; that is
the minimal shuffle for the semantics. For top-1 patterns Spark 3.4+'s
WindowGroupLimit pushes the rn==1 filter into the shuffle read, so no
materialized full ranking exists at any point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(keys: list[str], order: list[Column]):
    return Window.partitionBy(*keys).orderBy(*order)


def top1_per_group(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per group under `order` (argmin/argmax/latest/first).

    `order` must be a total order within each group (append a unique id)."""
    w = _ordered_window(keys, order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(df: DataFrame, keys: list[str], order: list[Column], k: int, rank_col: str = "rnk") -> DataFrame:
    """Top-k rows per group with the rank exposed."""
    w = _ordered_window(keys, order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def with_lag_gap_us(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    order: list[Column] | None = None,
    gap_col: str = "gap_us",
) -> DataFrame:
    """Microsecond gap to the previous row per key (reference W3, with the
    B4 interval-cast bug fixed: exact integer arithmetic on unix_micros)."""
    order = order or [F.col(ts_col).asc()]
    w = _ordered_window(keys, order)
    prev = F.lag(F.unix_micros(F.col(ts_col)), 1).over(w)
    return df.withColumn(gap_col, F.unix_micros(F.col(ts_col)) - prev)


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_seconds: int,
    order: list[Column] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-key session ids: a new session starts when the gap to the
    previous event exceeds `gap_seconds`.

    Classic lag + conditional cumsum — one shuffle on `keys`, all JVM-side.
    """
    order = order or [F.col(ts_col).asc()]
    w = _ordered_window(keys, order)
    gapped = with_lag_gap_us(df, keys, ts_col, order, gap_col="__gap_us")
    is_new = F.when(
        F.col("__gap_us").isNull() | (F.col("__gap_us") > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return (
        gapped.withColumn("__new", is_new)
        .withColumn(session_col, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("__gap_us", "__new")
    )
