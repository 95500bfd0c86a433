"""merge_upsert: update / insert / delete / untouched in one pass."""

import pytest

from hadoop_data_lake_spark.operators.merge import merge_upsert


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),   # update
            (4, "d", 40.0, False),    # insert
            (3, None, 0.0, True),     # delete
        ],
        "id long, name string, score double, is_deleted boolean",
    )
    out = {
        r["id"]: (r["name"], r["score"])
        for r in merge_upsert(target, source, keys=["id"], delete_col="is_deleted").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


def test_merge_upsert_schema_mismatch_raises(spark):
    target = spark.createDataFrame([(1, "a")], "id long, name string")
    source = spark.createDataFrame([(1, 2.0)], "id long, other double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, source, keys=["id"])


def test_snapshot_diff_classifies_changes(spark):
    from hadoop_data_lake_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (3, "c", None), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    # 1 unchanged (no row), 3 unchanged with NULL payload (null-safe!), 2
    # updated, 4 deleted, 5 inserted
    assert set(got) == {2, 4, 5}
    assert (got[2]["op"], got[2]["v"]) == ("U", 9.0)
    assert (got[4]["op"], got[4]["v"]) == ("D", 4.0)
    assert (got[5]["op"], got[5]["v"]) == ("I", 5.0)


def test_snapshot_diff_rejects_missing_columns(spark):
    import pytest as _pytest

    from hadoop_data_lake_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["k"])


def test_snapshot_delta_folds_to_full_recompute(spark):
    """agg(old) + signed delta == agg(new) for count and sum — including an
    update whose GROUP key moves (retraction and addition land in different
    groups)."""
    import pyspark.sql.functions as F

    from hadoop_data_lake_spark.operators.merge import snapshot_delta

    old = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0), (4, "g2", 40.0)],
        "k long, grp string, v double",
    )
    new = spark.createDataFrame(
        [(1, "g1", 10.0),   # unchanged
         (2, "g2", 25.0),   # updated AND moved g1 -> g2
         (4, "g2", 40.0),   # unchanged (3 deleted)
         (5, "g1", 50.0)],  # inserted
        "k long, grp string, v double",
    )
    delta = snapshot_delta(old, new, keys=["k"])
    rows = {(r["k"], r["sign"]): (r["grp"], r["v"]) for r in delta.collect()}
    assert rows[(2, -1)] == ("g1", 20.0) and rows[(2, 1)] == ("g2", 25.0)
    assert rows[(3, -1)] == ("g2", 30.0)
    assert rows[(5, 1)] == ("g1", 50.0)
    assert len(rows) == 4  # unchanged keys emit nothing

    old_agg = old.groupBy("grp").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    d_agg = delta.groupBy("grp").agg(
        F.sum("sign").alias("dn"), F.sum(F.col("sign") * F.col("v")).alias("ds")
    )
    merged = {
        r["grp"]: (r["n"], r["s"])
        for r in old_agg.join(d_agg, "grp", "full_outer")
        .select(
            "grp",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("s", F.lit(0.0)) + F.coalesce("ds", F.lit(0.0))).alias("s"),
        )
        .collect()
    }
    direct = {
        r["grp"]: (r["n"], r["s"])
        for r in new.groupBy("grp").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert merged == direct
