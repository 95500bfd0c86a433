"""Regression tests for the round-8 fixes (VERDICT r7 item 4 + driver
ADVICE r7):

1. pca_power_iterate — the scatter moments (sij, c = n*S - s*s^T) now run
   through dprod/decimal(38,0); the old bigint path wrapped at ~3e3
   unit-norm vectors (n^2 * 1e12 quantization-squared), which is EXACTLY
   the driver's sf0.1 embeddings size. The test drives an adversarial
   +-1-component corpus past that bound and checks every loading against
   a serial Python big-int reference (immune to overflow by construction).
2. rolling_zscore_anomaly — the window sum s1 is a bigint that legitimately
   ranges to +-9.2e18, but it was cast to decimal(18,0) (max ~1e18): under
   ANSI a 19-digit s1 was a runtime ERROR, non-ANSI silently nulled the
   gate and dropped the row. The widened decimal(19,0) cast must keep the
   full bigint domain.
3. backlog_report --assert — a graded non-guard window slot must still be
   accepted when the registry declares it in INTENTIONAL_REGRADES
   (the stale-row re-grade ladder, VERDICT r7 items 1+7), and rejected
   otherwise.
"""

import datetime as dt
import math

import pytest

from pyspark.sql import types as T


def _pca_serial_reference(vecs, dim, iters=8):
    """Serial big-int mirror of pca_power_iterate's exact algorithm:
    quantize, scatter via n*S - s*s^T, digit-length power-of-10
    normalization, `iters` truncating mat-vec steps. Python ints cannot
    overflow, so this is the ground truth the distributed decimal path
    must reproduce bit-for-bit."""
    q = [[math.floor(x * 1_000_000) for x in v] for v in vecs]
    n = len(q)
    s = [sum(row[d] for row in q) for d in range(dim)]
    c = [
        [
            n * sum(row[a] * row[b] for row in q) - s[a] * s[b]
            for b in range(dim)
        ]
        for a in range(dim)
    ]
    mx = max(abs(c[a][b]) for a in range(dim) for b in range(dim))
    dk = max(len(str(mx)) - 9, 0)
    p = 10**dk
    a_mat = [
        [(-1 if c[x][y] < 0 else 1) * (abs(c[x][y]) // p) for y in range(dim)]
        for x in range(dim)
    ]
    v = [1_000_000] * dim
    for _ in range(iters):
        u = [sum(a_mat[li][j] * v[j] for j in range(dim)) for li in range(dim)]
        vm = max(abs(x) for x in u)
        div = (vm // 1_000_000) + 1
        v = [(-1 if x < 0 else 1) * (abs(x) // div) for x in u]
    return v


def test_pca_iterate_survives_bigint_overflow_vs_serial_reference(spark):
    """3200 unit-magnitude +-1 vectors: n*sij = 3200^2 * 1e12 ~ 1e19 wraps
    the old bigint scatter (bound ~3034 for |x|=1); the decimal path must
    match the serial big-int reference on every loading."""
    from hadoop_data_lake_spark.operators.similarity import pca_power_iterate

    dim, n = 4, 3200
    # deterministic, full-rank-ish sign patterns with a dominant direction:
    # component d of vector i is +-1 by a fixed bit recipe (no RNG state)
    vecs = [
        [
            1.0 if ((i >> d) ^ (i >> (d + 1)) ^ (1 if d == 0 else 0)) & 1 else -1.0
            for d in range(dim)
        ]
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r["dim"]: r["loading"] for r in pca_power_iterate(df, dim=dim, iters=8).collect()}
    want = _pca_serial_reference(vecs, dim)
    assert got == {d: want[d] for d in range(dim)}
    # the fixture really is past the old bigint bound
    assert n * n * 10**12 > 2**63 - 1


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_rolling_zscore_survives_19_digit_window_sum(spark, tmp_path):
    """Ten rows of 1e17 cents inside one 24 h window push s1 past 1e18
    (19 decimal digits — still a perfectly valid bigint): the old
    decimal(18,0) cast errored under ANSI / nulled the gate otherwise.
    The planted zero-value outlier must come through with the exact z."""
    from hadoop_data_lake_spark.queries.events_queries import rolling_zscore_anomaly

    # value = 1e15 + 16*i: cents = 1e17 + 1600*i, exactly representable as
    # double (spacing at 1e17 is 16; 1600*i is a multiple of 16)
    rows = [
        (i, EPOCH + dt.timedelta(minutes=i), 1, "m", 1.0e15 + 16.0 * i, "{}")
        for i in range(10)
    ]
    outlier_id = 999
    rows.append(
        (outlier_id, EPOCH + dt.timedelta(minutes=10), 1, "m", 0.0, "{}")
    )
    path = str(tmp_path)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")

    out = {r["event_id"]: r["z_r"] for r in rolling_zscore_anomaly(spark, path).collect()}

    cents = [round(1.0e15 + 16.0 * i) * 100 for i in range(10)] + [0]
    n, s1 = len(cents), sum(cents)
    assert len(str(s1)) == 19, "fixture must actually produce a 19-digit s1"
    s2 = sum(c * c for c in cents)
    dev = cents[-1] * n - s1
    var_int = n * s2 - s1 * s1
    assert 4 * dev * dev >= 9 * var_int > 0
    assert outlier_id in out, "19-digit s1 killed the gate (decimal cast too narrow)"
    assert out[outlier_id] == pytest.approx(
        round(dev / math.sqrt(var_int), 6), abs=2e-6
    )


def test_rotation_assert_accepts_declared_regrades(monkeypatch):
    """--assert must accept a graded non-guard window slot that the registry
    declares in INTENTIONAL_REGRADES, and still reject undeclared repeats."""
    import tools.backlog_report as br

    fake_registry = {f"q{i}": None for i in range(br.DRIVER_WINDOW_SIZE + 5)}
    monkeypatch.setattr(br, "REGISTRY", fake_registry)
    monkeypatch.setattr(br, "graded_ever", lambda: {"q3", "q7"})

    monkeypatch.setattr(br, "INTENTIONAL_REGRADES", frozenset({"q3", "q7"}))
    assert br.assert_rotation() == 0  # both repeats declared

    monkeypatch.setattr(br, "INTENTIONAL_REGRADES", frozenset({"q3"}))
    assert br.assert_rotation() == 1  # q7 graded but undeclared


def test_rotation_assert_rejects_stale_regrade_declarations(monkeypatch):
    """A declared re-grade that is NOT in the current window is a leftover
    from a prior rotation and must fail --assert — otherwise it silently
    sanctions re-grading that query again at the NEXT rotation."""
    import tools.backlog_report as br

    fake_registry = {f"q{i}": None for i in range(br.DRIVER_WINDOW_SIZE + 5)}
    monkeypatch.setattr(br, "REGISTRY", fake_registry)
    monkeypatch.setattr(br, "graded_ever", lambda: set())

    # q52 sits OUTSIDE the 50-slot window -> stale declaration
    monkeypatch.setattr(
        br, "INTENTIONAL_REGRADES", frozenset({f"q{br.DRIVER_WINDOW_SIZE + 2}"})
    )
    assert br.assert_rotation() == 1

    monkeypatch.setattr(br, "INTENTIONAL_REGRADES", frozenset())
    assert br.assert_rotation() == 0


@pytest.fixture(scope="module")
def degenerate_dirs(spark, tmp_path_factory):
    """Three corpora that break closed-form denominators: a single event
    (one hour bin, one group member, possibly an empty hash sample), one
    day with two types (empty variants), and thirty identical values
    (zero variance everywhere)."""
    cases = {
        "one_event": [(1, EPOCH, 1, "purchase", 5.0, "{}")],
        "one_day_two_types": [
            (1, EPOCH, 1, "purchase", 5.0, "{}"),
            (2, EPOCH + dt.timedelta(hours=1), 2, "view", 3.0, "{}"),
        ],
        "all_same_value": [
            (i, EPOCH + dt.timedelta(hours=i), i % 3, "click", 7.0, "{}")
            for i in range(30)
        ],
    }
    dirs = {}
    root = tmp_path_factory.mktemp("degenerate")
    for name, rows in cases.items():
        d = str(root / name)
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/events.parquet")
        dirs[name] = d
    return dirs


def test_degenerate_inputs_never_divide_by_zero(spark, degenerate_dirs):
    """The r8 degenerate-input sweep found five window queries crashing
    with ANSI DIVIDE_BY_ZERO on inputs with empty variants / single bins /
    one group / zero variance (the daily_revenue_changepoint class).
    Undefined statistics must read NULL (or filter the undefined rows),
    never raise."""
    from hadoop_data_lake_spark.queries import events_queries as EV

    guarded = [
        # the five window queries from the first sweep + changepoint
        EV.ks_test_variants, EV.fano_burstiness, EV.anova_eta_squared,
        EV.sample_representativeness_audit, EV.value_outliers_zscore,
        EV.daily_revenue_changepoint,
        # the thirteen registry-wide offenders from the full sweep
        EV.kendall_tau_daily, EV.mann_whitney_variants,
        EV.jackknife_daily_mean, EV.ols_weekend_effect, EV.ols_daily_trend,
        EV.cuped_adjusted_lift, EV.ipw_outcome_estimate, EV.value_psi_drift,
        EV.neyman_allocation_plan, EV.woe_value_bins, EV.eb_shrunk_conversion,
        EV.target_encode_event_type, EV.self_join_skew_profile,
    ]
    anova_eta_squared = EV.anova_eta_squared
    fano_burstiness = EV.fano_burstiness
    ks_test_variants = EV.ks_test_variants
    value_outliers_zscore = EV.value_outliers_zscore

    for d in degenerate_dirs.values():
        for fn in guarded:
            fn(spark, d).collect()  # must not raise

    # semantics, not just survival:
    # zero variance -> no z-score outliers, NULL eta/F, NULL fano
    same = degenerate_dirs["all_same_value"]
    assert value_outliers_zscore(spark, same).count() == 0
    (a,) = anova_eta_squared(spark, same).collect()
    assert a["eta_sq_r"] is None and a["f_stat_r"] is None
    for r in fano_burstiness(spark, same).collect():
        assert r["fano_r"] == 0.0  # one event in each of 30 hours: zero dispersion
    # one-variant types are UNDEFINED for KS and must be absent, not NULL
    for r in ks_test_variants(spark, same).collect():
        assert r["n_a"] > 0 and r["n_b"] > 0
    # single-hour span -> fano undefined (n-1 = 0)
    one = degenerate_dirs["one_event"]
    (f,) = fano_burstiness(spark, one).collect()
    assert f["n_hours"] == 1 and f["fano_r"] is None


def test_degenerate_table_corpora_guards(spark):
    """The TQ/NS arm of the degenerate sweep, pinned as a test: constant
    prices / identical documents / identical embeddings and single-row
    facts must not raise, and the undefined statistics must read NULL
    (or the scikit silhouette-0 convention)."""
    from tools.degenerate_sweep import _table_cases
    from hadoop_data_lake_spark.queries.northstar_queries import (
        length_bias_auc,
        semdedup_silhouette,
        source_mmd_hashed,
    )
    from hadoop_data_lake_spark.queries.tpch_queries import (
        activity_tail_hill,
        discount_elasticity,
        price_dispersion_by_brand,
    )

    dirs = _table_cases(spark)
    for d in dirs.values():
        for fn in (
            price_dispersion_by_brand, length_bias_auc, activity_tail_hill,
            source_mmd_hashed, discount_elasticity, semdedup_silhouette,
        ):
            fn(spark, d).collect()  # must not raise

    # semantics on the constant-values corpus:
    const = dirs["constant_values"]
    (e,) = discount_elasticity(spark, const).collect()
    assert e["n_levels"] == 1 and e["elasticity_r"] is None, (
        "a one-point discount ladder has no slope"
    )
    for r in semdedup_silhouette(spark, const).collect():
        assert r["mean_silhouette_r"] == 0.0, (
            "identical points take the scikit-learn s = 0 convention"
        )
    # single-row facts: a single active user leaves the Hill mean undefined
    one = dirs["one_row_facts"]
    (h,) = activity_tail_hill(spark, one).collect()
    assert h["k_used"] == 1 and h["hill_r"] is None
