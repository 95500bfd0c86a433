"""Regression tests for the round-7 ADVICE fixes (driver ADVICE.md, r6):

1. value_outliers_zscore — the per-row cents^2 product must be widened to
   decimal BEFORE the multiply (bigint wraps past ~9.2e18, i.e. any
   |value| > ~3e7), and a singleton group (n=1) must yield sd = NULL, not
   sqrt(0/0) = NaN (Spark orders NaN above every number, so the old
   expression emitted the lone row as its own outlier).
2. user_value_twap — cents x dur_us must likewise widen before the
   multiply (a large value held across a multi-hour gap overflows bigint).

Both tests build synthetic events parquet in the driver schema and check
the query output against exact Python big-int arithmetic, which is immune
to both overflow and float association — precisely the property the dprod
fix claims.
"""

import datetime as dt

import pytest

from pyspark.sql import types as T

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


def _write_events(spark, tmp_path, rows):
    path = str(tmp_path)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")
    return path


def test_zscore_survives_bigint_overflow_and_skips_singletons(spark, tmp_path):
    from hadoop_data_lake_spark.queries.events_queries import value_outliers_zscore

    # Group 'big': cents = 4e9 per row, cents^2 = 1.6e19 > bigint max —
    # the pre-fix sum wrapped (or errored under ANSI). One clear outlier.
    # n = 20 because a single extreme point's z tops out at (n-1)/sqrt(n),
    # which only crosses the |z| >= 3 gate for n >= 12.
    big_vals = [4.0e7 + i for i in range(19)] + [8.0e7]
    rows = [
        (i, EPOCH + dt.timedelta(minutes=i), 1, "big", v, "{}")
        for i, v in enumerate(big_vals)
    ]
    # Group 'solo': n = 1 — sd must be NULL (filtered), not NaN (emitted).
    rows.append((100, EPOCH, 2, "solo", 5.0, "{}"))
    sf_dir = _write_events(spark, tmp_path, rows)

    out = {r["event_id"]: r["z"] for r in value_outliers_zscore(spark, sf_dir).collect()}

    # Exact expectation with Python big ints (no overflow possible).
    cents = [round(v * 100) for v in big_vals]
    n = len(cents)
    sc, sq = sum(cents), sum(c * c for c in cents)
    mu = sc / (100.0 * n)
    sd = ((sq - sc * sc / n) / (n - 1)) ** 0.5 / 100.0
    expected = {
        i: round((v - mu) / sd, 6)
        for i, v in enumerate(big_vals)
        if abs(round((v - mu) / sd, 6)) >= 3
    }
    assert expected, "fixture must actually contain an outlier"
    assert 100 not in out, "singleton group leaked through a NaN sd"
    assert out == pytest.approx(expected)


def test_twap_survives_bigint_overflow(spark, tmp_path):
    from hadoop_data_lake_spark.queries.events_queries import user_value_twap

    # cents = 9e10; held 2 h = 7.2e9 us -> product 6.48e20 >> bigint max.
    rows = [
        (1, EPOCH, 7, "m", 9.0e8, "{}"),
        (2, EPOCH + dt.timedelta(hours=2), 7, "m", 1.0, "{}"),
        (3, EPOCH + dt.timedelta(hours=3), 7, "m", 2.0, "{}"),  # lead=None, dropped
    ]
    sf_dir = _write_events(spark, tmp_path, rows)

    out = user_value_twap(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]

    durs_us = [2 * 3600 * 10**6, 1 * 3600 * 10**6]
    cents = [round(9.0e8 * 100), 100]
    swc = sum(c * d for c, d in zip(cents, durs_us))  # exact big int
    total = sum(durs_us)
    assert r["n_obs"] == 2
    assert r["total_dur_us"] == total
    assert r["twap"] == pytest.approx(round(swc / (100.0 * total), 6))


def test_rotation_assert_flags_non_guard_repeats(monkeypatch):
    """tools/backlog_report.py --assert must fail when a non-guard window
    slot was already graded in any CORRECTNESS_r*.json, and pass when every
    repeat is a streaming-guard slot (VERDICT r6 item 3)."""
    import tools.backlog_report as br

    fake_registry = {f"q{i}": None for i in range(br.DRIVER_WINDOW_SIZE + 5)}
    monkeypatch.setattr(br, "REGISTRY", fake_registry)
    # pin the declared-re-grade set empty: this test exercises the
    # first-time/guard rules in isolation (the r8 lifecycle rules have
    # their own tests in test_round8_fixes.py), and the REAL set's names
    # are never in the fake registry's window
    monkeypatch.setattr(br, "INTENTIONAL_REGRADES", frozenset())

    monkeypatch.setattr(br, "graded_ever", lambda: {"q3"})
    assert br.assert_rotation() == 1  # q3 is in the window and graded

    monkeypatch.setattr(
        br, "graded_ever", lambda: {f"q{br.DRIVER_WINDOW_SIZE + 1}"}
    )
    assert br.assert_rotation() == 0  # graded entry sits outside the window

    # Rebuild with the guard name INSIDE the window (dict insertion order
    # is the window order — pop+assign would append it outside).
    guarded = {
        ("stream_windowed_counts" if k == "q49" else k): v
        for k, v in fake_registry.items()
    }
    assert list(guarded).index("stream_windowed_counts") < br.DRIVER_WINDOW_SIZE
    monkeypatch.setattr(br, "REGISTRY", guarded)
    monkeypatch.setattr(br, "graded_ever", lambda: {"stream_windowed_counts"})
    assert br.assert_rotation() == 0  # guard slots may repeat


def test_rolling_zscore_survives_window_bigint_overflow(spark, tmp_path):
    """rolling_zscore_anomaly (round-7 widening): a 24 h window holding
    1500 cents~9e7 events wraps the old bigint SUM(vc*vc) (~1.2e19) and
    its s1^2 quadratic (~1.8e22), driving the integer gate's var_int
    negative — the planted outlier silently vanished. The decimal path
    must keep the gate exact and emit it."""
    from hadoop_data_lake_spark.queries.events_queries import rolling_zscore_anomaly

    n_big = 1500
    rows = [
        # alternate two nearby large values so the window variance is
        # positive but tiny next to the planted outlier's deviation
        (i, EPOCH + dt.timedelta(seconds=10 * i), 1, "m",
         9.0e5 + (i % 2), "{}")
        for i in range(n_big)
    ]
    outlier_id = 10_000
    rows.append(
        (outlier_id, EPOCH + dt.timedelta(seconds=10 * n_big), 1, "m", 1.0, "{}")
    )
    sf_dir = _write_events(spark, tmp_path, rows)

    out = {r["event_id"]: r["z_r"] for r in rolling_zscore_anomaly(spark, sf_dir).collect()}
    assert outlier_id in out, "overflow in the window quadratics ate the outlier"

    # exact recompute at the outlier row (whole history is inside 24 h)
    cents = [round((9.0e5 + (i % 2)) * 100) for i in range(n_big)] + [100]
    n, s1 = len(cents), sum(cents)
    s2 = sum(c * c for c in cents)
    dev = cents[-1] * n - s1
    var_int = n * s2 - s1 * s1
    assert out[outlier_id] == pytest.approx(
        round(dev / var_int**0.5, 6), abs=2e-6
    )
