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
        n_capped = sum(1 for r in rows if r["capped"])
        assert alloc + n_capped > budget
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


def test_soundex_sql_matches_spark_on_classic_vectors(spark):
    """The DuckDB soundex replay equals Spark's F.soundex on the classic
    edge-case vectors (collapse through h/w, first-letter runs, vowels)."""
    import duckdb
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.functions.phonetic import soundex_sql

    words = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
        "Honeyman", "Wright", "Hughes", "AA", "MM", "Momo", "jackson",
        "washington", "lee", "gutierrez",
    ]
    got_spark = {
        r["w"]: r["sx"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("sx"))
        .collect()
    }
    con = duckdb.connect()
    for w in words:
        (code,) = con.sql(f"SELECT {soundex_sql(repr(w))}").fetchone()
        assert code == got_spark[w], (w, code, got_spark[w])


def test_grid_density_clusters_are_connected_and_dense(spark):
    """Every reported cluster's event count is at least its cell count
    times the core threshold floor, and cluster reps are member cells."""
    from hadoop_data_lake_spark.queries.geo_queries import grid_density_clusters

    rows = grid_density_clusters(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_cells"] >= 1
        assert r["n_events"] >= r["n_cells"]  # core cells are non-empty


def test_markov_trigram_entropy_bounds(spark):
    """Second-order conditional entropy is bounded by log2(#event types)
    and equal on every output row."""
    import math

    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.queries.events_queries import markov_trigram_entropy
    from pyspark.sql import functions as F

    rows = markov_trigram_entropy(spark, SF_DIR).collect()
    hs = {r["h2_r"] for r in rows}
    assert len(hs) == 1
    h = hs.pop()
    n_types = (
        read_table(spark, SF_DIR, "events")
        .select(F.count_distinct("event_type").alias("k"))
        .collect()[0]["k"]
    )
    assert 0.0 <= h <= math.log2(n_types) + 1e-9


def test_qini_final_point_is_overall_uplift(spark):
    """The last Qini point equals total treated responders minus scaled
    control responders — the curve's anchor identity."""
    from hadoop_data_lake_spark.queries.events_queries import qini_uplift_curve

    rows = sorted(qini_uplift_curve(spark, SF_DIR).collect(), key=lambda r: r["decile"])
    nt = sum(r["n_t"] for r in rows)
    nc = sum(r["n_c"] for r in rows)
    rt = sum(r["r_t"] for r in rows)
    rc = sum(r["r_c"] for r in rows)
    expect = round(rt - rc * nt / nc, 6)
    assert abs(rows[-1]["qini_r"] - expect) < 1e-6


def test_missing_partition_audit_finds_planted_gaps(spark, tmp_path):
    """Drop two date ranges from a copy of events; the audit must report
    exactly those runs with correct lengths (and nothing on the intact
    table — covered by the oracle's empty result)."""
    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.queries.events_queries import missing_partition_audit
    from pyspark.sql import functions as F

    ev = read_table(spark, SF_DIR, "events")
    days = sorted(
        r["d"] for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    holes = {days[3], days[4], days[10]}  # one 2-day run + one 1-day run
    holed = ev.where(~F.to_date("ts").isin(list(holes)))
    out = str(tmp_path / "events.parquet")
    holed.write.parquet(out)
    # the audit reads via read_table(sf_dir, "events") => point sf_dir at tmp
    import shutil, os
    sfdir = str(tmp_path / "sf")
    os.makedirs(sfdir)
    # single-file layout expected: write directly under sf/events.parquet
    holed.coalesce(1).write.mode("overwrite").parquet(os.path.join(sfdir, "events.parquet"))
    got = {
        (r["gap_start"], r["gap_end"], r["n_days_missing"])
        for r in missing_partition_audit(spark, sfdir).collect()
    }
    assert got == {
        (str(days[3]), str(days[4]), 2),
        (str(days[10]), str(days[10]), 1),
    }


def test_shapley_efficiency_axiom(spark):
    """Sum of Shapley values must equal v(grand coalition) - v(empty) =
    the conversion rate of users whose coalition is exactly all k
    channels (0 if unobserved). Only holds when the FULL 2^k lattice is
    enumerated — the restricted observed-coalition sum violates it
    (ADVICE r5)."""
    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.queries.events_queries import (
        shapley_channel_attribution,
    )
    from pyspark.sql import functions as F

    rows = shapley_channel_attribution(spark, SF_DIR).collect()
    total = sum(r["shapley_r"] for r in rows)
    chans = sorted(r["channel"] for r in rows)
    ev = read_table(spark, SF_DIR, "events").select("user_id", "event_type")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.when(
                                F.col("event_type") != "purchase",
                                F.col("event_type"),
                            )
                        )
                    )
                ),
                ",",
            ).alias("coal"),
            F.max((F.col("event_type") == "purchase").cast("long")).alias("conv"),
        )
        .where(F.col("coal") == ",".join(chans))
    )
    grand = per_user.agg(
        F.count("*").alias("n"), F.sum("conv").alias("c")
    ).collect()[0]
    v_grand = (grand["c"] / grand["n"]) if grand["n"] else 0.0
    assert abs(total - v_grand) < 1e-4  # 6-dp rounding x k channels
