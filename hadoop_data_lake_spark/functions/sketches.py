"""Mergeable sketches: pre-aggregated distinct counts.

`approx_count_distinct` answers one grain; a 100 TB rollup cube needs
distinct counts at MANY grains without re-scanning the facts per grain.
The lakehouse pattern is: aggregate once to fine-grain HLL SKETCHES
(binary, mergeable), persist them, then answer any coarser grain by
merging sketches — a tiny aggregation over pre-aggregated state. Spark 3.5+
ships the Datasketches HLL family as SQL functions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate); these helpers wrap the
build-then-merge split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partial_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per fine-grain key combination (column `hll`).

    This is the expensive pass — one shuffle of the facts — and the only
    one that ever touches the raw data. Persist the output; it is
    ~1.5 KB/key instead of the key's full value set."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("hll")
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    rollup_keys: list[str],
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grain sketches up to `rollup_keys` and estimate.

    Runs entirely on pre-aggregated state: the shuffle moves one sketch per
    fine-grain key, never the facts. Any number of coarser grains can be
    answered from the same persisted sketch table."""
    return sketches.groupBy(*rollup_keys).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias(out_col)
    )
