"""End-to-end pretraining-data funnel (pipelines/pretrain_data.py)."""

import pyspark.sql.functions as F

from hadoop_data_lake_spark.pipelines.pretrain_data import run_pretrain_pipeline
from tests.conftest import SF_DIR


def test_pretrain_funnel_monotone_and_deterministic(spark):
    plan, funnel = run_pretrain_pipeline(spark, SF_DIR, n_shards=4)
    order = [
        "raw", "quality", "exact_dedup", "near_dedup", "span_dedup",
        "decontaminated", "near_decontaminated", "pii_redacted", "mixed",
    ]
    assert list(funnel) == order
    # every gate only removes rows
    for a, b in zip(order, order[1:]):
        assert funnel[b] <= funnel[a], (a, b, funnel)
    assert funnel["mixed"] > 0

    rows = plan.collect()
    assert len(rows) == funnel["mixed"]
    # balanced round-robin shards (within 1 row)
    per_shard = {}
    for r in rows:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + 1
    assert max(per_shard.values()) - min(per_shard.values()) <= 1

    # deterministic end to end: a second run yields the identical plan
    plan2, funnel2 = run_pretrain_pipeline(spark, SF_DIR, n_shards=4)
    assert funnel2 == funnel
    assert {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in rows} == {
        (r["doc_id"], r["shard"], r["pos_in_shard"]) for r in plan2.collect()
    }


def test_pretrain_probe_docs_are_held_out(spark):
    plan, _ = run_pretrain_pipeline(spark, SF_DIR, n_shards=4)
    probe_survivors = plan.where(F.col("doc_id") % 97 == 0).count()
    assert probe_survivors == 0  # the benchmark stand-in never trains


def test_cluster_safe_split_never_leaks_near_dup_pairs(spark):
    """The group-aware split's structural invariant: a near-dup pair can
    never straddle the split (both docs inherit their component's side),
    while the naive per-doc hash split measurably leaks on this corpus."""
    from hadoop_data_lake_spark.queries.northstar_queries import (
        cluster_safe_split_audit,
    )

    rows = {r["split_kind"]: r for r in cluster_safe_split_audit(spark, SF_DIR).collect()}
    assert rows["cluster_aware"]["leaked_pairs"] == 0
    assert rows["naive_hash"]["leaked_pairs"] > 0
    for r in rows.values():
        assert r["n_train"] + r["n_test"] == 500
        assert r["n_test"] > 0 and r["n_train"] > 0


def test_embedding_decontamination_flags_exactly_planted_probes(spark):
    """Every planted probe (+0.3 on one coordinate of a unit vector) must
    flag its source at cosine >= 0.9; nothing else crosses the gate."""
    from hadoop_data_lake_spark.queries.northstar_queries import (
        decontaminate_embedding_cosine,
    )

    rows = decontaminate_embedding_cosine(spark, SF_DIR).collect()
    assert {(r["vec_id"], r["probe_id"]) for r in rows} == {
        (v, v + 10_000_000) for v in range(0, 500, 50)
    }
    assert all(0.9 <= r["sim_r"] < 1.0 for r in rows)
