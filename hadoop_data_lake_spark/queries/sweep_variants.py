"""Bench-scale sweep variants (VERDICT r13 item 6).

A handful of graded oracles build DENSE per-user time spines whose
DuckDB plan grows super-linearly with the data span: at sf0.1 the
`user_value_interpolate` oracle materializes a ~65M-row 10-minute grid
and runs four IGNORE-NULLS windows over it single-threaded (~25 min of
the ~40-min full-registry sweep — the Spark side takes ~1.2 s). The
driver gate runs at sf0.01 where the grids are small; the sf0.1 sweep
is builder-side INSURANCE, so it may verify the same operator on a
coarser spine instead of stalling the whole round's gate cycle.

Each entry is a QuerySpec twin of the graded query: the SAME operator
call with ONLY the spine parameter coarsened, and the oracle SQL with
the matching constant — every other token identical, so any semantic
regression in the operator still fails the variant. Used exclusively by
`tools/check_oracle.py --scaled-variants` (round_gate's sf0.1 close
step); the graded sf0.01 pair and the sf0.001 sweep are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_data_lake_spark.core.io import read_table
from hadoop_data_lake_spark.queries.registry import QuerySpec


def _user_value_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded query with bucket_seconds 600 -> 3600 (hourly spine):
    6x fewer grid rows per user, same interpolation code path."""
    from hadoop_data_lake_spark.operators.timeseries import time_grid_interpolate

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    return time_grid_interpolate(
        ev, ["user_id"], "ts", "value", bucket_seconds=3600, tiebreak=["event_id"]
    )


def _user_value_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded query with bucket_seconds 600 -> 3600 — the forward-fill
    sibling rides the same dense per-user grid (37 s of the r14 sf0.1
    sweep segment, next-slowest after interpolate)."""
    from hadoop_data_lake_spark.operators.timeseries import time_grid_ffill

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    return time_grid_ffill(
        ev, ["user_id"], "ts", "value", bucket_seconds=3600, tiebreak=["event_id"]
    )


from hadoop_data_lake_spark.queries.events_queries import (
    USER_VALUE_FFILL_SQL,
    USER_VALUE_INTERPOLATE_SQL,
)

_USER_VALUE_INTERPOLATE_HOURLY_SQL = USER_VALUE_INTERPOLATE_SQL.replace(
    "600000000", "3600000000"
)
_USER_VALUE_FFILL_HOURLY_SQL = USER_VALUE_FFILL_SQL.replace(
    "600000000", "3600000000"
)

def _linkage_jaro_winkler_block2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded query with the blocking key widened from the first name
    token to the first TWO tokens: block sizes shrink, the candidate set
    falls quadratically, and the pandas-UDF metric + the 3.1M-row result
    multiset stop dominating the sweep (242 s of the 15.9-min r14 full
    sf0.1 sweep — Spark-side, the scorer itself). Same blocking shape,
    same UDF, same threshold; the oracle widens identically. Since r15
    this is just the `operators/linkage` blocking scale law pinned at
    width 2 — the width its auto rule picks at sf0.1 under the default
    candidate budget (BENCH_NOTES r15 curve)."""
    from hadoop_data_lake_spark.operators.linkage import (
        blocked_jaro_winkler_pairs,
    )

    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return blocked_jaro_winkler_pairs(
        part, "p_partkey", "p_name", threshold=0.93, block_tokens=2
    )


_LINKAGE_JARO_WINKLER_BLOCK2_SQL = """
WITH blocked AS (
  SELECT p_partkey, p_name,
         split_part(p_name, ' ', 1) || ' ' || split_part(p_name, ' ', 2) AS blk
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim_r
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.93
"""


SCALED_SWEEP_VARIANTS: dict[str, QuerySpec] = {
    "linkage_jaro_winkler": QuerySpec(
        _linkage_jaro_winkler_block2,
        _LINKAGE_JARO_WINKLER_BLOCK2_SQL,
        ("entity-resolution", "scaled-sweep-variant"),
    ),
    "user_value_interpolate": QuerySpec(
        _user_value_interpolate_hourly,
        _USER_VALUE_INTERPOLATE_HOURLY_SQL,
        ("timeseries", "scaled-sweep-variant"),
    ),
    "user_value_ffill": QuerySpec(
        _user_value_ffill_hourly,
        _USER_VALUE_FFILL_HOURLY_SQL,
        ("timeseries", "scaled-sweep-variant"),
    ),
}
