"""operators/linkage.py — the ER blocking scale law (VERDICT r14 item 3).

The graded registry oracle (linkage_jaro_winkler, width pinned at 1) and
the sf0.1 sweep variant (width 2) prove value parity against DuckDB;
these tests pin the OPERATOR contracts: candidate counting is exact, the
auto rule picks the smallest in-budget width, widening shrinks the
candidate set monotonically, and — the recall claim the scale law rests
on — widening 1->2 tokens loses zero ACCEPTED pairs at the graded
threshold on the real corpus.
"""

from __future__ import annotations

import pytest

from hadoop_data_lake_spark.core.io import read_table
from hadoop_data_lake_spark.operators.linkage import (
    auto_block_tokens,
    blocked_jaro_winkler_pairs,
    candidate_pair_count,
    token_block_key,
)

SF = "/root/testdata/sf0.001"


def test_candidate_pair_count_exact(spark):
    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)], "blk string"
    )
    # 4C2 + 2C2 + 1C2 = 6 + 1 + 0
    assert candidate_pair_count(df, "blk") == 7


def test_candidate_pair_count_empty(spark):
    df = spark.createDataFrame([], "blk string")
    assert candidate_pair_count(df, "blk") == 0


def test_token_block_key_width1_and_2(spark):
    df = spark.createDataFrame(
        [("almond antique blue royal burnished",), ("almond azure",)],
        "n string",
    )
    from pyspark.sql import functions as F

    got = df.select(
        token_block_key(F.col("n"), 1).alias("w1"),
        token_block_key(F.col("n"), 2).alias("w2"),
    ).collect()
    assert [r.w1 for r in got] == ["almond", "almond"]
    assert [r.w2 for r in got] == ["almond antique", "almond azure"]


def test_token_block_key_rejects_zero():
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        token_block_key(F.col("n"), 0)


def test_auto_rule_smallest_in_budget_width(spark):
    part = read_table(spark, SF, "part").select("p_name")
    n = part.count()
    # Huge budget: width 1 always fits.
    w, pairs1 = auto_block_tokens(part, "p_name", candidate_budget=n * n)
    assert w == 1 and pairs1 > 0
    # Budget below width-1's count forces widening; the returned count
    # must be the chosen width's exact count and strictly smaller.
    w2, pairs2 = auto_block_tokens(
        part, "p_name", candidate_budget=pairs1 - 1
    )
    assert w2 >= 2 and pairs2 < pairs1
    # Impossible budget: returns the widest allowed width, not an error.
    w3, _ = auto_block_tokens(
        part, "p_name", candidate_budget=0, max_tokens=3
    )
    assert w3 == 3


def test_widening_shrinks_candidates_and_keeps_accepted_pairs(spark):
    """Width-2 candidates are a subset of width-1 (agreeing on two tokens
    implies agreeing on one), and at the graded 0.93 threshold the
    ACCEPTED output is identical — the measured-recall claim behind
    defaulting deployments to the auto rule."""
    part = read_table(spark, SF, "part").select("p_partkey", "p_name")
    out1 = {
        (r.key_a, r.key_b, r.sim_r)
        for r in blocked_jaro_winkler_pairs(
            part, "p_partkey", "p_name", block_tokens=1
        ).collect()
    }
    out2 = {
        (r.key_a, r.key_b, r.sim_r)
        for r in blocked_jaro_winkler_pairs(
            part, "p_partkey", "p_name", block_tokens=2
        ).collect()
    }
    assert out2 <= out1
    assert out1 == out2, (
        "widening 1->2 dropped accepted pairs: "
        f"{sorted(out1 - out2)[:5]}"
    )


def test_auto_width_matches_pinned_output(spark):
    """block_tokens=None routes through the auto rule and must produce
    exactly the pinned-width output for whatever width it picks."""
    part = read_table(spark, SF, "part").select("p_partkey", "p_name")
    w, _ = auto_block_tokens(part, "p_name")
    auto_rows = {
        (r.key_a, r.key_b, r.sim_r)
        for r in blocked_jaro_winkler_pairs(
            part, "p_partkey", "p_name", block_tokens=None
        ).collect()
    }
    pinned_rows = {
        (r.key_a, r.key_b, r.sim_r)
        for r in blocked_jaro_winkler_pairs(
            part, "p_partkey", "p_name", block_tokens=w
        ).collect()
    }
    assert auto_rows == pinned_rows
