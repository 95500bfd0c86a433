"""Slowly-changing-dimension (type 2) collapse: turn an event log into
validity intervals per key.

Classic data-lake dimension build (gaps-and-islands): consecutive rows of a
key whose tracked attributes are unchanged collapse into one interval row
`[valid_from, valid_to)` with `is_current` on the open tail. The reference's
user-city datamart (calculate_user_city.py:42-50) keeps only the LATEST
attribute per user (SCD1); this operator is the history-preserving upgrade a
lakehouse dimension table needs.

Scale shape: every window and the final group-by partition on the same key
columns, so the whole build is ONE hash shuffle of the fact table — no
global window, no driver state. Run-change detection is a lag comparison
(null-safe, so a genuinely-NULL attribute doesn't open a new run), the run
id is a running conditional sum, and interval close is a lead over the
collapsed (already small) frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    keys: str | list[str],
    order_cols: str | list[str],
    attrs: str | list[str],
) -> DataFrame:
    """Collapse `df` into SCD2 validity intervals.

    Returns one row per (keys, version) with the tracked `attrs`, where
    `version` numbers the key's attribute regimes from 1 in `order_cols`
    order, `valid_from` = first order value of the regime, `valid_to` =
    `valid_from` of the next regime (NULL on the current one), `n_rows` =
    rows collapsed, and `is_current` marks the open interval.

    `order_cols` must be a total order within each key (add a unique
    tie-break column, e.g. an event id) or run boundaries are ambiguous.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    attrs = [attrs] if isinstance(attrs, str) else list(attrs)

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])

    def changed(attr: str) -> Column:
        # null-safe "is distinct from previous row" — a NULL-to-NULL step is
        # the same regime, not a new one.
        return ~F.lag(F.col(attr)).over(w).eqNullSafe(F.col(attr))

    # lag over a literal is NULL exactly on a key's first row; without this
    # term a key whose first tracked value is NULL would start at version 0.
    is_first = F.lag(F.lit(1)).over(w).isNull()
    any_change = reduce(lambda a, b: a | b, (changed(a) for a in attrs), is_first)
    run = df.withColumn(
        "__version",
        F.sum(F.when(any_change, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    first_order = order_cols[0]
    collapsed = run.groupBy(*keys, "__version", *attrs).agg(
        F.min(first_order).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_ver = Window.partitionBy(*keys).orderBy(F.col("__version").asc())
    valid_to = F.lead("valid_from").over(w_ver)
    return collapsed.select(
        *keys,
        F.col("__version").cast("long").alias("version"),
        *attrs,
        "valid_from",
        valid_to.alias("valid_to"),
        F.col("n_rows").cast("long").alias("n_rows"),
        valid_to.isNull().alias("is_current"),
    )
