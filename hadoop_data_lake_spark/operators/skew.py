"""Skew mitigation: deterministic salting for hot keys.

AQE's skew-join splitting (enabled in core/session.py) handles sort-merge
join skew at runtime; these operators cover the cases AQE does not:
aggregation fan-in on a hot key, and broadcast-infeasible joins where one
side's key distribution is pathological.

Salts are DERIVED (xxhash64 of a caller-chosen column, mod N) — never
random — so plans stay deterministic and replayable, per the engine-wide
reproducibility contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(from_col: str | Column, salt_mod: int) -> Column:
    """Deterministic salt in [0, salt_mod): xxhash64 of `from_col` mod N."""
    c = F.col(from_col) if isinstance(from_col, str) else from_col
    return F.pmod(F.xxhash64(c), F.lit(salt_mod)).cast("int")


def two_stage_count(
    df: DataFrame,
    keys: list[str],
    salt_from: str,
    salt_mod: int = 16,
    count_col: str = "n",
) -> DataFrame:
    """count(*) per key with a salted partial stage.

    Stage 1 groups on (keys..., salt) — a hot key's rows spread over
    `salt_mod` reducers; stage 2 sums the per-salt partials on the real key.
    Identical result to a plain groupBy().count(), bounded fan-in per task.
    """
    partial = (
        df.withColumn("__salt", salt_col(salt_from, salt_mod))
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__pn"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pn").alias(count_col))


def two_stage_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_from: str,
    salt_mod: int = 16,
    sum_col: str = "total",
) -> DataFrame:
    """sum(value) per key via salted partials (use fixed-point units for
    doubles — functions/fixedpoint.py — or the re-grouping changes the
    float accumulation order)."""
    partial = (
        df.withColumn("__salt", salt_col(salt_from, salt_mod))
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__ps"))
    )
    return partial.groupBy(*keys).agg(F.sum("__ps").alias(sum_col))


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    salt_mod: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` is too large to
    broadcast: big rows get a derived salt, small rows are replicated once
    per salt value, and the join runs on (keys..., salt) — a hot key's rows
    land on `salt_mod` different reducers instead of one straggler.

    Cost: small side is written salt_mod times into the shuffle. Worth it
    exactly when one reducer would otherwise dominate the stage.
    """
    b = big.withColumn("__salt", salt_col(salt_from, salt_mod))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt_mod)]))
    )
    return b.join(s, on=[*on, "__salt"], how=how).drop("__salt")
