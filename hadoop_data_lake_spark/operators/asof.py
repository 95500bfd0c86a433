"""As-of (point-in-time) join.

Spark has no native as-of join; the reference has none either, but any
time-series datamart needs it. Two implementations:

1. `asof_join` — cogrouped `applyInPandas` + `pd.merge_asof` per key group.
   This is the scale path: both sides shuffle once on the key, each group is
   merged in O(n log n) inside an Arrow batch, and no quadratic candidate
   set ever materializes. (Pattern: public Spark docs' cogroup example; same
   shape Flink's temporal join and pandas merge_asof define.)

2. `asof_join_sql` — pure DataFrame fallback: equi-join on key with
   right.ts <= left.ts, then argmax per left row. O(candidates) — fine when
   the per-key right side is small, used for cross-checking the pandas path.

Semantics (direction='backward', the common case): for each left row, the
single right row with the greatest right_ts <= left_ts within the same key;
left rows with no match survive with nulls (left outer).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join via cogrouped Arrow batches + merge_asof."""
    right_cols = [c for c in right.columns if c != on]
    out_schema = StructType(list(left.schema.fields))
    for f in right.schema.fields:
        if f.name != on:
            out_schema.add(f.name, f.dataType, True)
    left_cols = list(left.columns)
    # Unmatched left rows put NaN into integral right columns; pandas
    # nullable dtypes keep them convertible to Spark long/int nulls.
    nullable_int = {
        f.name: "Int64" if f.dataType.simpleString() == "bigint" else "Int32"
        for f in right.schema.fields
        if f.name != on and f.dataType.simpleString() in ("bigint", "int")
    }

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[*left_cols, *right_cols])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[c] = None
            return out[[*left_cols, *right_cols]]
        # Secondary sort on the remaining right columns: merge_asof takes the
        # LAST qualifying row, so equal-timestamp ties resolve to the max of
        # the tie-break columns — deterministic across partitionings.
        rpdf = rpdf.drop(columns=[on]).sort_values(
            [right_ts, *[c for c in right_cols if c != right_ts]], kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts, direction="backward"
        )
        merged = merged[[*left_cols, *right_cols]]
        for c, dt in nullable_int.items():
            merged[c] = merged[c].astype(dt)
        return merged

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join_sql(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Join + argmax fallback (small right side per key). `left_id` must be
    unique per left row; `tiebreak` breaks equal right_ts deterministically.
    """
    from hadoop_data_lake_spark.operators.windows import top1_per_group

    r = right.select(
        F.col(on).alias("__on"),
        *[F.col(c).alias(c) for c in right.columns if c != on],
    )
    joined = left.join(
        r, (F.col(on) == F.col("__on")) & (F.col(right_ts) <= F.col(left_ts)), "left"
    ).drop("__on")
    order = [F.col(right_ts).desc_nulls_last()]
    if tiebreak:
        order.append(F.col(tiebreak).desc_nulls_last())
    return top1_per_group(joined, [left_id], order)
