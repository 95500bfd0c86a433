"""Local mirror of the driver's correctness gate.

Runs every registry query on Spark at a given sf_dir AND its DuckDB oracle
on the same parquet files, then compares row count, column names, and an
order-insensitive value multiset (floats rounded to 9 significant-ish
decimals before hashing; timestamps normalized to naive UTC).

Usage:
    python tools/check_oracle.py [sf_dir] [--scaled-variants] [query ...]

--scaled-variants (VERDICT r13 item 6 — bench-scale sweep cost): a few
oracles build dense per-user time spines whose DuckDB plan is
super-linear in the data span (user_value_interpolate's 10-minute grid
is ~65M rows at sf0.1: the one query cost ~25 of the sweep's ~40
minutes). With the flag, those queries run their registered
SCALED_SWEEP_VARIANTS twin instead — the SAME operator and code path
with a coarser spine parameter, and the matching oracle — so the
full-registry insurance sweep at sf0.1 stays cheap enough to run every
round. The graded pair (driver gate, sf0.01) is untouched; sf0.001 and
sf0.01 sweeps must NOT pass the flag. Variant-verified rows are printed
with a `[scaled]` marker so the log is honest about what was compared.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from hadoop_data_lake_spark.core.io import TABLES
from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.queries.registry import REGISTRY


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.tz_convert("UTC").tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    return str(v)


def canonical_multiset(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    rows = [
        "|".join(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def run(sf_dir: str, names: list[str], scaled_variants: bool = False) -> int:
    from hadoop_data_lake_spark.queries.sweep_variants import SCALED_SWEEP_VARIANTS

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        scaled = scaled_variants and name in SCALED_SWEEP_VARIANTS
        if scaled:
            spec = SCALED_SWEEP_VARIANTS[name]
            name = f"{name} [scaled]"
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            failures += 1
            continue
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"ok   {name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb oracle raised")
            traceback.print_exc()
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            ms, mo = canonical_multiset(sdf), canonical_multiset(odf)
            if ms != mo:
                diff = [(a, b) for a, b in zip(ms, mo) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            # t_spark = the Spark side alone; total = spark + DuckDB
            # oracle + multiset compare, so slow ORACLES are visible in
            # the log without external timestamping (r14: the interpolate
            # grid oracle hid 40 min behind a 1.2s spark time).
            print(
                f"ok   {name}: {len(sdf)} rows match "
                f"({t_spark:.1f}s, total {time.time() - t0:.1f}s)"
            )
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    scaled = "--scaled-variants" in args
    args = [a for a in args if a != "--scaled-variants"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if scaled and "sf0.1" not in sf_dir:
        # The variants exist ONLY to bound sweep cost at bench scale;
        # at graded scales they would silently substitute the coarser
        # twin for the graded pair (ADVICE r14).
        print(
            f"--scaled-variants is sf0.1-only (got {sf_dir}); "
            "graded-scale sweeps must compare the graded pair",
            file=sys.stderr,
        )
        sys.exit(2)
    names = args[1:] if len(args) > 1 else list(REGISTRY)
    rc = run(sf_dir, names, scaled_variants=scaled)
    print(f"{'ALL OK' if rc == 0 else f'{rc} FAILURES'}")
    sys.exit(1 if rc else 0)
