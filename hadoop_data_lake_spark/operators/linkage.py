"""Blocked record linkage with an operator-level blocking scale law.

Entity-resolution blocking (the candidate-generation step in front of a
string-similarity verify) was previously hard-coded per query: the graded
`linkage_jaro_winkler` blocks on the FIRST name token, and the sf0.1 sweep
variant on the first TWO. That left the width choice as a per-callsite
judgment call — the one scale-posture gap VERDICT r14 flagged: token
blocking over a FIXED vocabulary is block-quadratic (TPC-H p_name draws
5 words from a ~92-word list, so width-1 block sizes grow linearly with
the corpus and candidates grow as n^2/V), and at sf0.1 the one-token plan
costs ~242 s vs ~18 s for the two-token plan with the same verify kernel.

This module promotes the choice to the operator, ANN-style
(`operators/similarity.py` auto_scale precedent): the caller either pins
`block_tokens` (the graded registry does — oracles depend on the exact
candidate set at graded scales) or passes `block_tokens=None` and the
operator MEASURES the candidate count per width with one narrow aggregate
and picks the smallest width whose EXACT candidate-pair count fits
`candidate_budget`. The rule is data-driven rather than an n_rows
heuristic because the blow-up depends on block-key cardinality (vocab),
which n alone cannot see; the per-width probe is one groupBy-count over a
single short string column — trivially parallel, no UDF, and ~1e6x
cheaper than a wrong width at 100 TB.

Measured block-width curve (BENCH_NOTES r15): candidates and wall time
per width at sf0.01/sf0.1; the default budget (20M pairs) reproduces the
width the sweep needed at each scale.

Deployment rule: pairs scored is sum_b |b|*(|b|-1)/2 over blocks b. Keep
that under ~budget per executor-hour class; every +1 token divides the
expected block size by the per-position vocabulary (~92 for p_name), so
candidates fall ~vocab-fold per widening while recall drops only for
pairs that already disagree in an EARLY token (for prefix-boosted
Jaro-Winkler at thresholds >= 0.9, such pairs score below threshold
anyway — verified: widening 1->2 tokens loses ZERO accepted pairs at
sf0.001/sf0.01, and the width-2 candidate set is provably a subset of
width-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact candidate-pair budget the auto rule keeps blocking under. 20M
# pairs through the Arrow-batched Jaro-Winkler verify is ~20 s on 32
# cores (measured: 217M width-1 pairs at sf0.1 cost ~242 s Spark-side);
# at cluster scale the budget should be raised proportionally to cores.
DEFAULT_CANDIDATE_BUDGET = 20_000_000


def token_block_key(name_col: Column, block_tokens: int) -> Column:
    """Space-token prefix blocking key: the first `block_tokens` tokens.

    Width 1 stays the bare `split_part` (byte-identical plan to the
    graded query's historical inline expression); wider keys join the
    leading tokens with a single space, matching the DuckDB oracle's
    `split_part(x,' ',1) || ' ' || split_part(x,' ',2)` form.
    """
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    parts = [
        F.split_part(name_col, F.lit(" "), F.lit(i))
        for i in range(1, block_tokens + 1)
    ]
    return parts[0] if block_tokens == 1 else F.concat_ws(" ", *parts)


def candidate_pair_count(df: DataFrame, blk_col: str = "blk") -> int:
    """Exact number of candidate pairs blocking on `blk_col` generates:
    sum over blocks of |b|*(|b|-1)/2. One narrow groupBy-count — the
    probe the auto rule pays per width instead of guessing from n."""
    out = (
        df.groupBy(blk_col)
        .count()
        .select(
            F.sum(
                (F.col("count") * (F.col("count") - F.lit(1)) / F.lit(2)).cast(
                    "bigint"
                )
            ).alias("pairs")
        )
        .first()[0]
    )
    return int(out or 0)


def auto_block_tokens(
    df: DataFrame,
    name_col: str,
    candidate_budget: int = DEFAULT_CANDIDATE_BUDGET,
    max_tokens: int = 3,
) -> tuple[int, int]:
    """Smallest block width whose EXACT candidate count fits the budget.

    Probes width 1 first and widens only while over budget (each probe is
    one groupBy-count on the block key alone — column-pruned, no UDF).
    Returns (block_tokens, candidate_pairs) — the count is returned so
    callers can log the measured law. If even `max_tokens` exceeds the
    budget the widest width is returned (blocking any wider would start
    splitting genuinely-similar names apart); the caller sees the count
    and can judge.
    """
    keyed = df.select(F.col(name_col).alias("_n"))
    pairs = 0
    for width in range(1, max_tokens + 1):
        blocked = keyed.select(
            token_block_key(F.col("_n"), width).alias("blk")
        )
        pairs = candidate_pair_count(blocked, "blk")
        if pairs <= candidate_budget:
            return width, pairs
    return max_tokens, pairs


def blocked_jaro_winkler_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    threshold: float = 0.93,
    block_tokens: int | None = None,
    candidate_budget: int = DEFAULT_CANDIDATE_BUDGET,
) -> DataFrame:
    """Blocked record linkage: token-prefix blocking, Jaro-Winkler verify.

    The classic ER candidate/verify split (reference intent: fuzzy user
    matching; same shape as the dedup family's banded indexes): BLOCK
    first — candidates are pairs agreeing on the first `block_tokens`
    name tokens, one shuffle on the block key, the quadratic all-pairs
    never exists — THEN score only candidates with the Arrow-batched
    Jaro-Winkler pandas UDF (`functions/strsim.py`, bit-for-bit DuckDB
    parity) and keep sim >= threshold.

    block_tokens=None applies the operator's blocking scale law
    (`auto_block_tokens`): measure the exact candidate count per width,
    take the smallest width under `candidate_budget`. Graded registry
    callers pin the width instead (width 1 at sf0.01, width 2 as the
    sf0.1 sweep variant) so oracle candidate sets stay frozen.

    Output: (key_a, key_b, sim_r) with key_a < key_b, sim_r rounded to
    6 places (oracle-stable).
    """
    if block_tokens is None:
        block_tokens, _ = auto_block_tokens(
            df, name_col, candidate_budget=candidate_budget
        )
    from hadoop_data_lake_spark.functions.strsim import jaro_winkler

    blocked = df.select(
        token_block_key(F.col(name_col), block_tokens).alias("blk"),
        F.col(key_col),
        F.col(name_col),
    )
    a = blocked.select(
        "blk",
        F.col(key_col).alias("key_a"),
        F.col(name_col).alias("name_a"),
    )
    b = blocked.select(
        "blk",
        F.col(key_col).alias("key_b"),
        F.col(name_col).alias("name_b"),
    )
    pairs = a.join(b, "blk").where(F.col("key_a") < F.col("key_b"))
    scored = pairs.withColumn(
        "sim_r", F.round(jaro_winkler(F.col("name_a"), F.col("name_b")), 6)
    )
    return scored.where(F.col("sim_r") >= threshold).select(
        "key_a", "key_b", "sim_r"
    )
