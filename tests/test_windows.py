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
