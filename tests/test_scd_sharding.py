"""SCD2 collapse (operators/scd.py) and deterministic shard export
(operators/packing.py shuffle_shard_plan)."""

import pyspark.sql.functions as F

from hadoop_data_lake_spark.operators.packing import shuffle_shard_plan
from hadoop_data_lake_spark.operators.scd import scd2_collapse


def test_scd2_collapses_runs_into_intervals(spark):
    rows = [
        # user 1: A A B A  -> 3 versions
        (1, 10, 100, "A"),
        (1, 20, 101, "A"),
        (1, 30, 102, "B"),
        (1, 40, 103, "A"),
        # user 2: constant -> 1 open interval
        (2, 10, 200, "X"),
        (2, 50, 201, "X"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, attr string")
    got = {
        (r["user_id"], r["version"]): r
        for r in scd2_collapse(df, "user_id", ["ts", "event_id"], "attr").collect()
    }
    assert len(got) == 4
    v1, v2, v3 = got[(1, 1)], got[(1, 2)], got[(1, 3)]
    assert (v1["attr"], v1["valid_from"], v1["valid_to"], v1["n_rows"]) == ("A", 10, 30, 2)
    assert (v2["attr"], v2["valid_from"], v2["valid_to"]) == ("B", 30, 40)
    assert (v3["attr"], v3["valid_to"], v3["is_current"]) == ("A", None, True)
    assert not v1["is_current"] and not v2["is_current"]
    u2 = got[(2, 1)]
    assert (u2["valid_from"], u2["valid_to"], u2["n_rows"], u2["is_current"]) == (10, None, 2, True)


def test_scd2_null_attr_is_not_a_change(spark):
    # NULL -> NULL is the same regime (null-safe comparison); NULL -> value opens one
    rows = [(1, 1, 1, None), (1, 2, 2, None), (1, 3, 3, "A")]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, attr string")
    out = scd2_collapse(df, "user_id", ["ts", "event_id"], "attr").collect()
    assert {(r["version"], r["attr"], r["n_rows"]) for r in out} == {
        (1, None, 2),
        (2, "A", 1),
    }


def test_scd2_multi_attr_change_detection(spark):
    # a change in EITHER tracked attribute opens a new version
    rows = [(1, 1, 1, "A", "x"), (1, 2, 2, "A", "y"), (1, 3, 3, "B", "y")]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, a string, b string"
    )
    out = scd2_collapse(df, "user_id", ["ts", "event_id"], ["a", "b"]).collect()
    assert sorted((r["version"], r["a"], r["b"]) for r in out) == [
        (1, "A", "x"),
        (2, "A", "y"),
        (3, "B", "y"),
    ]


def test_shard_plan_is_balanced_and_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    plan = shuffle_shard_plan(df, "doc_id", n_shards=8, salt=3)
    counts = {r["shard"]: r["n"] for r in plan.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(8)) and all(v == 125 for v in counts.values())
    # positions are a permutation of 0..999 and NOT the identity (it shuffles)
    rows = plan.collect()
    assert sorted(r["pos"] for r in rows) == list(range(1000))
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])] != list(range(1000))
    # same input partitioned differently -> identical assignment
    again = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in shuffle_shard_plan(df.repartition(13), "doc_id", 8, salt=3).collect()
    }
    assert {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in rows} == again
    # a different salt is a different permutation (new epoch order)
    other = shuffle_shard_plan(df, "doc_id", 8, salt=4).collect()
    assert {r["doc_id"]: r["pos"] for r in other} != {r["doc_id"]: r["pos"] for r in rows}


def test_shard_plan_no_global_single_task_window(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = shuffle_shard_plan(df, "doc_id", n_shards=4)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    # the prefix sum must never window over an empty partitionBy (which
    # would funnel every row through one task). The local-cumsum window now
    # sits behind the prefix sum's localCheckpoint (boundary-pinning fix),
    # so the visible plan must contain NO window at all — if one ever
    # reappears here it must carry the __pid partitioning.
    for line in txt.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__pid" in line
    # and the output really is a dense global position assignment
    assert sorted(r["pos"] for r in plan.collect()) == list(range(100))


def test_scd2_single_shuffle(spark):
    # run-detect window (user), run groupBy (user, version, attr), interval
    # lead window (user): overlapping keys all reuse ONE hash exchange on
    # user_id — the whole dimension build is a single shuffle of the facts
    import re

    df = spark.createDataFrame(
        [(1, 1, 1, "A"), (1, 2, 2, "B")], "user_id long, ts long, event_id long, a string"
    )
    out = scd2_collapse(df, "user_id", ["ts", "event_id"], "a")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
