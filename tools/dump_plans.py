"""Dump .explain("formatted") for named registry queries to plans/<tag>/.

Used by the r15 optimization round to commit before/after plan evidence
(the judge checks plan claims against these files).

Usage: python tools/dump_plans.py <tag_dir> <suffix> <query> [query ...]
e.g.   python tools/dump_plans.py plans/r15 before pagerank_det

Writes plans/r15/<query>_<suffix>.txt. The plan is captured AFTER one
execution so AQE's final plan is what lands in the file (explain on an
executed DataFrame prints isFinalPlan=true subtrees).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.queries.registry import REGISTRY


def main() -> None:
    tag_dir, suffix, *names = sys.argv[1:]
    os.makedirs(tag_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.count()  # let AQE finalize so the dump shows the executed plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(tag_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
