"""Registry-wide physical-plan hygiene audit.

Plans (and where construction demands it, partially executes) every
registry query at sf0.001 and scans the executed plan string for the
anti-patterns that kill 100 TB jobs:

  * CartesianProduct           — unbounded pair blowup
  * BatchEvalPython            — row-at-a-time Python in the data path
  * BroadcastNestedLoopJoin    — reported as INFO, not failure: every
                                 occurrence in this codebase is an explicit
                                 crossJoin(F.broadcast(tiny)) — scalar
                                 cutoff/bounds/marginal frames, centroid
                                 sets, probe sets — and a BNLJ whose build
                                 side is a broadcast single-row aggregate
                                 is the CORRECT plan for those. A new BNLJ
                                 appearing on a large build side would
                                 surface here for review.

Writes PLAN_AUDIT.md (one row per query with flags + node histogram
summary) and exits non-zero if any un-whitelisted red flag appears —
usable as a CI gate.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.queries.registry import REGISTRY

RED = ("CartesianProduct", "BatchEvalPython")


def main(sf_dir: str) -> int:
    spark = get_spark("plan_audit")
    rows = []
    failures = 0
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((name, f"PLAN-ERROR: {type(exc).__name__}", 0.0))
            failures += 1
            continue
        flags = [m for m in RED if m in plan]
        if flags:
            failures += 1
        info = "bnlj-broadcast" if "BroadcastNestedLoopJoin" in plan else ""
        verdict = ",".join(flags) if flags else (f"clean ({info})" if info else "clean")
        rows.append((name, verdict, time.time() - t0))
        print(f"{name}: {rows[-1][1]} ({rows[-1][2]:.1f}s)", file=sys.stderr)

    with open("PLAN_AUDIT.md", "w", encoding="utf-8") as fh:
        fh.write(
            "# PLAN_AUDIT — registry-wide physical-plan hygiene\n\n"
            f"{len(rows)} queries planned at `{sf_dir}`; hard red flags: "
            "CartesianProduct and BatchEvalPython (row-at-a-time Python). "
            "`bnlj-broadcast` marks the deliberate "
            "crossJoin(F.broadcast(tiny)) pattern (scalar stats frames, "
            "centroid/probe sets) — the correct plan for those shapes, "
            "listed so any NEW nested-loop join gets reviewed.\n\n"
            "| query | verdict |\n|---|---|\n"
        )
        for name, verdict, _dt in rows:
            fh.write(f"| {name} | {verdict} |\n")
        n_clean = sum(1 for _, v, _ in rows if v.startswith("clean"))
        n_bnlj = sum(1 for _, v, _ in rows if "bnlj" in v)
        fh.write(
            f"\n**{n_clean}/{len(rows)} clean ({n_bnlj} of them the "
            f"deliberate broadcast-nested-loop shape); "
            f"{failures} queries with hard red flags.**\n"
        )
    print(f"PLAN_AUDIT.md written; {failures} flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
