"""Deterministic sketches (functions/detsketches.py): error bounds vs exact
counts, the CMS overestimate guarantee, and KMV merge correctness.

The value-hash replay itself is covered by the registry oracles
(hll_det_daily_users / kmv_distinct_users / cms_token_counts); these tests
pin the STATISTICAL contracts the oracle can't see."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_data_lake_spark.functions.detsketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    KMV_K,
    cms_point_estimates,
    cms_sketch,
    hll_det_estimate,
    kmv_estimate,
    kmv_minima,
)


def _ints(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.col("id").cast("string").alias("v")
    )


def test_hll_inside_published_error_bound(spark):
    # m=256 -> sigma = 1.04/sqrt(256) = 6.5%; 4 sigma = 26%. A deterministic
    # hash either lands inside or the implementation is wrong — there is no
    # sampling luck to absorb a miss.
    for n in (500, 5_000, 20_000):
        est = hll_det_estimate(_ints(spark, n), ["grp"], "v").first()["est"]
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_small_cardinality_uses_linear_counting(spark):
    # 10 distinct values: far below 2.5*m, so the linear-counting branch
    # must produce a near-exact answer (every bucket miss is informative).
    est = hll_det_estimate(_ints(spark, 10), ["grp"], "v").first()["est"]
    assert abs(est - 10) <= 1.0


def test_kmv_exact_below_k_and_bounded_above_k(spark):
    # below k the sketch IS the value set -> exact.
    est = kmv_estimate(kmv_minima(_ints(spark, 40), ["grp"], "v"), ["grp"]).first()[
        "est"
    ]
    assert est == 40.0
    # above k: relative error ~ 1/sqrt(k-2) ~ 13%; allow 4 sigma.
    for n in (2_000, 30_000):
        est = kmv_estimate(
            kmv_minima(_ints(spark, n), ["grp"], "v"), ["grp"]
        ).first()["est"]
        assert abs(est - n) / n < 0.52, (n, est)


def test_kmv_merge_equals_sketch_of_union(spark):
    # the k smallest hashes of (state A union state B) must equal the k-min
    # state of the unioned raw sets — the property that makes KMV states
    # mergeable without revisiting facts.
    a = _ints(spark, 1_000, "a")
    b = spark.range(500, 2_000).select(
        F.lit("b").alias("grp"), F.col("id").cast("string").alias("v")
    )
    both = a.unionByName(b).select(F.lit("u").alias("grp"), "v")
    direct = kmv_minima(both, ["grp"], "v").select("h")
    merged = (
        kmv_minima(a, ["grp"], "v")
        .unionByName(kmv_minima(b, ["grp"], "v"))
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    assert sorted(r["h"] for r in direct.collect()) == sorted(
        r["h"] for r in merged.collect()
    )


def test_cms_never_underestimates_and_error_bounded(spark):
    # 100 distinct tokens with zipf-ish counts; N total items. CMS point
    # estimate e(t) satisfies true <= e(t) <= true + 2N/w with probability
    # (1 - 2^-d) per row; with a fixed hash it either holds or not.
    rows = []
    for i in range(100):
        rows.extend([f"tok{i}"] * (200 // (i + 1) + 1))
    items = spark.createDataFrame([(t,) for t in rows], ["t"])
    n_total = len(rows)
    sketch = cms_sketch(items, "t")
    assert sketch.agg(F.sum("cnt")).first()[0] == n_total * CMS_DEPTH
    true = items.groupBy("t").agg(F.count("*").alias("n_true"))
    est = cms_point_estimates(sketch, true.select("t"), "t")
    joined = true.join(est, "t").collect()
    assert len(joined) == 100
    bound = 2.0 * n_total / CMS_WIDTH
    for r in joined:
        assert r["cms_est"] >= r["n_true"], r
        assert r["cms_est"] <= r["n_true"] + max(bound, 3), r


def test_cms_sketches_merge_by_cell_addition(spark):
    # sketch(A + B) == cellwise sketch(A) + sketch(B): the mergeable-state
    # contract that lets partial sketches roll up without the raw stream.
    a = spark.createDataFrame([("x",), ("y",), ("x",)], ["t"])
    b = spark.createDataFrame([("x",), ("z",)], ["t"])
    both = a.unionByName(b)
    merged = (
        cms_sketch(a, "t")
        .unionByName(cms_sketch(b, "t"))
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_sketch(both, "t")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
