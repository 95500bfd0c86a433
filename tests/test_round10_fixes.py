"""Regression tests for the round-10 control re-baseline (VERDICT r9 item 1).

The four FACT_RESCAN_ALLOW control-freeze exemptions plus the multi-layer
decontamination_report were the last multi-scan plans in the registry, kept
only because changing a bench control's speed corrupts control_inflation.
Round 10 re-baselined the controls (bench.py CONTROL_R10_ABSOLUTES; the
old-plan record is BENCH_r09.json) and applied the proven aggregate-first /
localCheckpoint restructuring:

- pipelines/zone_report.build_zone_report: the two grain-bounded
  groupingSets aggregates are localCheckpoint-ed (persist() kept the
  FileScan visible and re-executable under eviction) — 5 events scans -> 0
  visible, 2 lifetime.
- operators/dedup.minhash_lsh_pairs + minhash_cross_pairs: the exploded
  inverted shingle index is checkpointed (same move as the ngram/prefix
  paths) — 6 documents scans -> 0 visible, 1 lifetime scan + 1 shingle pass.
- operators/similarity.cosine_near_dup_pairs: the SRP band index is
  checkpointed (narrow rows) — 4 embeddings scans -> 2 (the two
  column-pruned verify joins, deliberately NOT materialized: re-scanning
  pruned parquet beats storing a full copy of the embedding payload).

These tests pin the new shapes so a refactor can't silently reintroduce the
rescan (the audit would catch >= 4; these pin the actual <= 2 contract).
"""

import pytest

SF = "/root/testdata/sf0.001"

# (query, {fact_table: max allowed FileScan lines in the pre-execution plan})
_PINNED = [
    ("zone_report", {"events": 0}),
    ("dedup_minhash_lsh", {"documents": 0}),
    ("decontaminate_minhash_cross", {"documents": 0}),
    ("dedup_clusters_minhash", {"documents": 0}),
    ("embedding_near_dup", {"embeddings": 2}),
    ("decontamination_report", {"documents": 2, "embeddings": 2}),
]


def _scan_counts(spark, name):
    import re
    from collections import Counter

    from hadoop_data_lake_spark.queries.registry import REGISTRY

    plan = (
        REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    c = Counter()
    for line in plan.splitlines():
        if "FileScan" in line:
            c.update(re.findall(r"(\w+)\.parquet", line))
    return c


@pytest.mark.parametrize("name,limits", _PINNED, ids=[p[0] for p in _PINNED])
def test_rebaseline_plans_are_single_pass(spark, name, limits):
    counts = _scan_counts(spark, name)
    for table, max_scans in limits.items():
        assert counts.get(table, 0) <= max_scans, (
            f"{name}: {table} scanned {counts.get(table, 0)}x "
            f"(pinned <= {max_scans}) — the r10 checkpoint restructuring "
            f"regressed; full counts: {dict(counts)}"
        )


def test_correctness_file_epoch_untracked_falls_back_to_mtime(tmp_path, monkeypatch, capsys):
    """VERDICT r9 items 2+3: `git log -1` on an untracked CORRECTNESS file
    returns nothing, and the old code dated it to epoch 0 — every row of
    the newest round printed as 'stale by ~20000d' and the raw stale count
    doubled. Untracked files now fall back to file mtime (with a warning);
    tracked files keep their commit epoch."""
    import os

    from tools.backlog_report import correctness_file_epoch

    tracked = correctness_file_epoch("CORRECTNESS_r01.json")
    assert tracked > 1_600_000_000  # a real commit epoch, not 0

    f = tmp_path / "CORRECTNESS_rXX.json"
    f.write_text("{}")
    ep = correctness_file_epoch(str(f))
    assert abs(ep - os.path.getmtime(str(f))) < 2
    assert "untracked" in capsys.readouterr().err


def test_zone_report_values_survive_checkpoint_swap(spark):
    """The persist->localCheckpoint swap must be value-neutral: the
    flagship report at sf0.001 keeps its known grain and row count, and
    week/month totals stay internally consistent (the week total of a
    (week, month, zone) cell >= the cell's own count)."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.queries.registry import REGISTRY

    df = REGISTRY["zone_report"].fn(spark, SF)
    rows = df.count()
    assert rows > 0
    assert df.select("week", "month", "zone_id").distinct().count() == rows
    bad = df.where(
        (F.col("week_purchase") < 0)
        | (F.col("week_user") < 0)
        | (F.col("month_user") < 0)
    ).count()
    assert bad == 0
