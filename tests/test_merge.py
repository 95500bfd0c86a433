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
