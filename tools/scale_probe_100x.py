"""100x scale probe of the frozen flagships (VERDICT r6 item 8): extend
the bench scale tier's 1x/10x curves to 100x of the sf0.01 base (~sf1) for
the four named flagship operators — pagerank_10r, minhash_lsh_pairs,
zone_report, sessionize_events. Best-of-2 per point (the tier's warm-rep
rule); corpus synthesis is localCheckpoint'ed OUTSIDE the timed region.

Run alone (concurrent harness runs triple timings on this box):

    python tools/scale_probe_100x.py

Prints one JSON document; paste the summary into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: scaled-frame generators + op thunks
from hadoop_data_lake_spark.core.session import get_spark

MULTS = [1, 10, 100]
BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")


def _zone_report_thunk(spark, ev):
    """zone_report over a scaled events frame: same base derivation as the
    registry query (week/month from ts, zone = user % 10) feeding the
    groupingSets builder — the multi-join report flagship."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.pipelines.zone_report import build_zone_report
    from hadoop_data_lake_spark.queries.events_queries import EVENT_TYPES

    base = ev.select(
        F.weekofyear("ts").alias("week"),
        F.month("ts").alias("month"),
        (F.col("user_id") % 10).alias("zone_id"),
        "event_type",
        "ts",
        F.col("user_id").alias("user"),
        F.col("event_id").alias("uid"),
    )
    return lambda: build_zone_report(base, EVENT_TYPES)


def main() -> None:
    spark = get_spark("scale-probe-100x")
    out: dict[str, dict] = {}
    for mult in MULTS:
        docs = bench._scaled_docs(spark, BASE, mult)
        ev = bench._scaled_events(spark, BASE, mult)
        edges = bench._scaled_edges(spark, BASE, mult)
        # Assemble only the four flagships (the full tier would re-time
        # everything; this probe extends exactly the named curves).
        from hadoop_data_lake_spark.operators import dedup as DD
        from hadoop_data_lake_spark.operators.graph import pagerank_intexact
        from hadoop_data_lake_spark.operators.windows import sessionize
        from pyspark.sql import functions as F

        ops = {
            "minhash_lsh_pairs": lambda: DD.minhash_lsh_pairs(
                docs, "doc_id", "text", k=3, num_hashes=16, bands=4, threshold=0.3
            ),
            "pagerank_10r": lambda: pagerank_intexact(edges, iters=10),
            "sessionize_events": lambda: sessionize(
                ev, ["user_id"], "ts", gap_seconds=1800
            )
            .groupBy("user_id", "session_id")
            .count(),
            "zone_report": _zone_report_thunk(spark, ev),
        }
        for name, thunk in ops.items():
            best, rows = None, 0
            for _rep in range(2):
                load0 = os.getloadavg()[0]
                t0 = time.perf_counter()
                rows = thunk().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                print(
                    f"# {name} {mult}x: {dt:.3f}s ({rows} rows, load {load0:.2f})",
                    file=sys.stderr,
                )
            out.setdefault(name, {})[f"t{mult}x"] = round(best, 3)
        for f in (docs, ev, edges):
            f.unpersist()
    for name, pts in out.items():
        if pts.get("t1x"):
            pts["r10"] = round(pts["t10x"] / pts["t1x"], 2)
            pts["r100"] = round(pts["t100x"] / pts["t1x"], 2)
    print(json.dumps({"base": BASE, "mults": MULTS, "ops": out}, indent=1))


if __name__ == "__main__":
    main()
