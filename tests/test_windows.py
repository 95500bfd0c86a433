"""Window operators: argmin/top-k tie determinism, lag gap (B4 fix),
sessionization."""

import pyspark.sql.functions as F

from hadoop_data_lake_spark.operators.windows import (
    sessionize,
    top1_per_group,
    topk_per_group,
    with_lag_gap_us,
)


def _scores(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 10.0),  # exact tie with id=1 — tie-break on id
            ("a", 3, 20.0),
            ("b", 4, 5.0),
        ],
        "k string, id long, score double",
    )


def test_top1_deterministic_tie_break(spark):
    out = top1_per_group(
        _scores(spark), ["k"], [F.col("score").asc(), F.col("id").asc()]
    ).collect()
    got = {r["k"]: r["id"] for r in out}
    assert got == {"a": 1, "b": 4}


def test_topk_ranks(spark):
    out = topk_per_group(
        _scores(spark), ["k"], [F.col("score").asc(), F.col("id").asc()], k=2
    ).collect()
    got = sorted((r["k"], r["rnk"], r["id"]) for r in out)
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 1, 4)]


def test_lag_gap_exact_microseconds(spark):
    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:00:30"),
            ("u", "2024-01-02 00:00:30"),
        ],
        "k string, s string",
    ).withColumn("ts", F.to_timestamp("s"))
    out = with_lag_gap_us(df, ["k"], "ts").orderBy("ts").collect()
    assert [r["gap_us"] for r in out] == [None, 30_000_000, 86_400_000_000]


def test_sessionize_gap_boundary(spark):
    # 1800 s sessions: gap == 1800 s keeps the session, gap > 1800 s splits.
    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:30:00"),   # exactly 1800 s later — same session
            ("u", "2024-01-01 01:00:01"),   # 1801 s later — new session
            ("v", "2024-01-01 00:00:00"),
        ],
        "k string, s string",
    ).withColumn("ts", F.to_timestamp("s"))
    out = sessionize(df, ["k"], "ts", gap_seconds=1800).orderBy("k", "ts").collect()
    assert [(r["k"], r["session_id"]) for r in out] == [
        ("u", 1),
        ("u", 1),
        ("u", 2),
        ("v", 1),
    ]


def test_distributed_prefix_sum_matches_serial(spark):
    """Two-phase prefix sum == driver-side serial cumsum, across multiple
    range partitions, and no global single-partition window in the plan."""
    from hadoop_data_lake_spark.operators.packing import pack_sequences, token_prefix_sum

    vals = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(vals, "id long, n long")
    got = {r["id"]: r["cum"] for r in token_prefix_sum(df, "id", "n", num_partitions=8).collect()}
    running = 0
    for i, n in vals:
        running += n
        assert got[i] == running
    # packing: a doc straddling the context boundary spans two sequences
    packed = {r["id"]: r for r in pack_sequences(df, "id", "n", context_len=128).collect()}
    for i, n in vals:
        r = packed[i]
        assert r["end_tok"] - r["start_tok"] + 1 == n
        assert r["start_seq"] == r["start_tok"] // 128
        assert r["end_seq"] == r["end_tok"] // 128
    assert any(packed[i]["end_seq"] > packed[i]["start_seq"] for i, _ in vals)


def test_time_grid_interpolate_linear_values(spark):
    from hadoop_data_lake_spark.operators.timeseries import time_grid_interpolate

    # user 1: observations at buckets 0 (v=0.0) and 3 (v=9.0) -> ramp 0,3,6,9
    rows = [
        (1, 0, 100, 0.0),
        (1, 3 * 600_000_000, 101, 9.0),
        # user 2: single observation -> constant
        (2, 600_000_000, 200, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, us long, event_id long, value double").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_id", "value"
    )
    out = time_grid_interpolate(
        df, ["user_id"], "ts", "value", bucket_seconds=600, tiebreak=["event_id"]
    )
    got = {
        (r["user_id"], r["bucket_start_us"]): (r["value"], r["observed"])
        for r in out.collect()
    }
    assert got[(1, 0)] == (0.0, True)
    assert got[(1, 600_000_000)] == (3.0, False)
    assert got[(1, 1_200_000_000)] == (6.0, False)
    assert got[(1, 1_800_000_000)] == (9.0, True)
    assert got[(2, 600_000_000)] == (5.0, True)
    assert len(got) == 5


def test_prefix_agg_multi_column_and_running_max(spark):
    """prefix_agg: several running sums + a running max share one range
    repartition and match the serial fold, including negative values
    (where 'max of local running sums' would be the wrong partition
    total) and a NULL-offset first partition for the max."""
    from hadoop_data_lake_spark.operators.packing import prefix_agg

    vals = [(i, ((i * 37) % 100) - 50, (i * 13) % 997) for i in range(400)]
    df = spark.createDataFrame(vals, "id long, v long, m long")
    out = {
        r["id"]: (r["cum_v"], r["n"], r["cmax"])
        for r in prefix_agg(
            df,
            "id",
            sum_cols={"cum_v": "v", "n": "id"},
            max_cols={"cmax": "m"},
            num_partitions=8,
        ).collect()
    }
    run_v = run_id = 0
    run_m = None
    for i, v, m in vals:
        run_v += v
        run_id += i
        run_m = m if run_m is None or m > run_m else run_m
        assert out[i] == (run_v, run_id, run_m), i


def test_prefix_agg_requires_a_running_column(spark):
    from hadoop_data_lake_spark.operators.packing import prefix_agg
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError):
        prefix_agg(df, "id")
