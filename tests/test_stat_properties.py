"""Invariant/axiom property tests for the math-heaviest stats queries
(VERDICT r6 item 5). The DuckDB value-hash cannot catch a bug both engines
implement identically (the Shapley-efficiency precedent,
tests/test_round5_ops.py); these pin the MATHEMATICAL properties each
estimator must satisfy regardless of implementation:

- Kaplan-Meier / Nelson-Aalen: monotone curves, [0,1] range, the product
  recomputation, and the textbook cross-estimator bound S_KM <= exp(-H_NA)
  (from 1 - x <= e^-x per factor).
- Qini: the reported cumulative value must re-derive from the per-decile
  raw counts, and the final point is the overall incremental-responders
  estimate.
- DiD: the estimate must equal the four reported cell means' double
  difference.
- IPW: the weighted mean per arm must equal the propensity-stratified
  identity sum_t n_t * mean(t, arm) / N, recomputed independently.
- CUPED: theta-adjustment preserves the grand mean and never increases
  variance (rho^2 in [0, 1]).
- Isotonic (minimax form == PAV): fitted rates monotone, mean-preserving,
  inside the raw-rate envelope.
- Theil-Sen: scale equivariance — doubling every value doubles the slope.
- KS: D in [0, 1].
"""

import datetime as dt
import math

import pytest

from tests.conftest import SF_DIR


def _rows(spark, fn, **kw):
    from hadoop_data_lake_spark.queries import events_queries as EV

    return getattr(EV, fn)(spark, SF_DIR, **kw).collect()


def test_kaplan_meier_monotone_and_product(spark):
    rows = sorted(_rows(spark, "kaplan_meier_churn"), key=lambda r: r["t"])
    assert rows
    prod, prev = 1.0, 1.0 + 1e-12
    for r in rows:
        assert 0 <= r["surv_r"] <= 1
        assert r["surv_r"] <= prev + 1e-9, "KM curve must be non-increasing"
        prev = r["surv_r"]
        assert 0 < r["d_converted"] <= r["n_risk"]
        prod *= 1.0 - r["d_converted"] / r["n_risk"]
        assert r["surv_r"] == pytest.approx(prod, abs=5e-6)


def test_nelson_aalen_monotone_and_km_bound(spark):
    na = {r["t"]: r for r in _rows(spark, "nelson_aalen_hazard")}
    km = {r["t"]: r for r in _rows(spark, "kaplan_meier_churn")}
    assert set(na) == set(km), "same event-time support (d > 0 rows)"
    prev_h = 0.0
    for t in sorted(na):
        r = na[t]
        assert r["cum_hazard_r"] >= prev_h - 1e-9, "hazard integral grows"
        prev_h = r["cum_hazard_r"]
        assert 0 < r["fh_surv_r"] <= 1
        assert r["fh_surv_r"] == pytest.approx(
            math.exp(-r["cum_hazard_r"]), abs=5e-6
        )
        # 1 - x <= e^-x per factor => S_KM(t) <= S_FH(t) always.
        assert km[t]["surv_r"] <= r["fh_surv_r"] + 2e-6


def test_qini_rederives_from_decile_counts(spark):
    rows = sorted(_rows(spark, "qini_uplift_curve"), key=lambda r: r["decile"])
    assert rows
    ct = cc = rt = rc = 0
    for r in rows:
        ct += r["n_t"]
        cc += r["n_c"]
        rt += r["r_t"]
        rc += r["r_c"]
        if cc > 0:
            assert r["qini_r"] == pytest.approx(
                rt - rc * ct / cc, abs=1e-6
            ), "cumulative qini must re-derive from the raw decile counts"
    # final point = overall incremental responders vs a scaled control
    assert rows[-1]["qini_r"] == pytest.approx(rt - rc * ct / cc, abs=1e-6)


def test_did_equals_cell_double_difference(spark):
    (r,) = _rows(spark, "did_estimate")
    recomputed = (r["b_post_r"] - r["b_pre_r"]) - (r["a_post_r"] - r["a_pre_r"])
    assert r["did_r"] == pytest.approx(recomputed, abs=5e-6)


def test_ipw_matches_stratified_identity(spark):
    """IPW with propensity estimated per stratum collapses algebraically to
    sum_t n_t * mean(Y | t, arm) / N — recompute that identity from an
    independent aggregation and compare both arm means and the ATE."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.functions.hashing import md5_60bit

    (r,) = _rows(spark, "ipw_outcome_estimate")
    cells = (
        read_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            (md5_60bit(F.col("user_id").cast("string")) % 2).alias("z"),
            to_units(F.col("value")).alias("cents"),
        )
        .groupBy("event_type", "z")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
        .collect()
    )
    n_t, n_tz, s_tz = {}, {}, {}
    for c in cells:
        n_t[c["event_type"]] = n_t.get(c["event_type"], 0) + c["n"]
        n_tz[(c["event_type"], c["z"])] = c["n"]
        s_tz[(c["event_type"], c["z"])] = c["s"]
    big_n = sum(n_t.values())

    def arm_mean(z):
        return sum(
            nt * (s_tz[(t, z)] / n_tz[(t, z)]) for t, nt in n_t.items()
        ) / big_n / 100.0

    assert r["ipw_mean_treated_r"] == pytest.approx(arm_mean(1), abs=5e-6)
    assert r["ipw_mean_control_r"] == pytest.approx(arm_mean(0), abs=5e-6)
    assert r["ate_r"] == pytest.approx(arm_mean(1) - arm_mean(0), abs=5e-6)


def test_cuped_preserves_grand_mean_and_bounds_rho2(spark):
    rows = _rows(spark, "cuped_adjusted_lift")
    assert len(rows) == 2
    assert len({r["var_reduction_r"] for r in rows}) == 1, "theta is global"
    assert 0.0 <= rows[0]["var_reduction_r"] <= 1.0, "rho^2 bound: CUPED never hurts"
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["n_users"] * r["mean_raw_r"] for r in rows) / n
    adj = sum(r["n_users"] * r["mean_cuped_r"] for r in rows) / n
    # theta * (X - mean X) is mean-zero over ALL users by construction.
    assert adj == pytest.approx(raw, abs=1e-4)


def test_isotonic_is_pav(spark):
    rows = sorted(_rows(spark, "isotonic_calibration_bins"), key=lambda r: r["bin"])
    assert rows
    iso = [r["iso_rate_r"] for r in rows]
    assert all(b >= a for a, b in zip(iso, iso[1:])), "isotonic => monotone"
    lo, hi = min(r["raw_rate_r"] for r in rows), max(r["raw_rate_r"] for r in rows)
    assert all(lo - 1e-6 <= v <= hi + 1e-6 for v in iso), "inside raw envelope"
    fitted = sum(r["n"] * r["iso_rate_r"] for r in rows)
    hits = sum(r["n_hit"] for r in rows)
    # PAV preserves the weighted mean; slack = per-bin rounding * weights.
    assert fitted == pytest.approx(hits, abs=1e-6 * sum(r["n"] for r in rows) + 1e-6)


def test_ks_d_in_unit_interval(spark):
    rows = _rows(spark, "ks_test_variants")
    assert rows
    for r in rows:
        assert 0.0 <= r["ks_d_r"] <= 1.0
        assert r["n_a"] > 0 and r["n_b"] > 0


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_theil_sen_scale_equivariance(spark, tmp_path):
    """Theil-Sen is scale-equivariant: scaling every value by c scales the
    slope by c. Run the query on a synthetic series and on the same series
    doubled; slopes must double (within the 1e-6 display rounding)."""
    from hadoop_data_lake_spark.queries.events_queries import theil_sen_daily_trend

    base = dt.datetime(2024, 3, 1)
    series = [3.0, 7.5, 4.25, 9.0, 6.5, 11.75, 8.0]  # exact cents

    def write(mult, sub):
        rows = [
            (d, base + dt.timedelta(days=d), 1, "m", v * mult, "{}")
            for d, v in enumerate(series)
        ]
        path = str(tmp_path / sub)
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/events.parquet")
        return path

    (r1,) = theil_sen_daily_trend(spark, write(1.0, "a")).collect()
    (r2,) = theil_sen_daily_trend(spark, write(2.0, "b")).collect()
    assert r1["n_pairs"] == r2["n_pairs"] == 21
    assert r2["slope_per_day_r"] == pytest.approx(
        2 * r1["slope_per_day_r"], abs=2e-6
    )
    assert r1["slope_per_day_r"] != 0
