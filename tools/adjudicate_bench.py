"""Controlled best-of-N rerun for bench-drift adjudication (VERDICT r5
items 2+3): times the flagged queries with per-rep wall clock AND the
1-minute load average recorded before each rep, so a co-tenant-noise
verdict is evidenced, not asserted.

Usage: python tools/adjudicate_bench.py [query ...]  (default: the two
r5-flagged queries). Runs alone — concurrent pytest/oracle/bench runs
triple the timings on this box (BENCH_NOTES.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.queries.registry import REGISTRY

FLAGGED = ["dedup_minhash_lsh", "ann_ivf_kmeans"]
REPS = int(os.environ.get("SPARK_GRAFT_ADJ_REPS", "5"))


def main() -> None:
    names = sys.argv[1:] or FLAGGED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.01"
    spark = get_spark("adjudicate")
    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).count()  # codegen + C2 warmup
        reps = []
        for _ in range(REPS):
            load0 = os.getloadavg()[0]
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            reps.append({"sec": round(dt, 3), "load1m_before": round(load0, 2)})
            print(
                f"# {name}: {dt:.3f}s ({rows} rows, load {load0:.2f})",
                file=sys.stderr,
            )
        out[name] = {
            "reps": reps,
            "best": min(r["sec"] for r in reps),
            "median": sorted(r["sec"] for r in reps)[len(reps) // 2],
        }
    print(json.dumps({"sf_dir": sf_dir, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
