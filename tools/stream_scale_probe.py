"""Streaming 1x/10x scale probe (VERDICT r7 item 5): the scale tier covered
batch sessionize but no stream_* replay — state-store growth under the
watermark was the one scale axis with zero measurements.

Method: the sf0.01 events corpus replicated {1x, 10x} with disjoint user-id
spaces (bench._scaled_events — per-copy time series identical, keys/rows
linear), written as 8 EVENT-TIME-ORDERED slice files and replayed with
maxFilesPerTrigger=1 + availableNow + APPEND mode. Eight batches arriving
in time order advance the watermark between batches, so this exercises the
real state-eviction path — a single-batch replay (the correctness oracle's
shape, complete mode) never evicts anything and says nothing about state
growth. Captured per run:

  - wall time of the full replay (best-of-2, same rationale as bench.py)
  - max/final stateOperators numRowsTotal across batches
  - emitted rows

Expectations this probe exists to check:
  - stream_windowed_counts state is (window x event_type) — USER-count
    independent — so 10x the rows must hold max-state ~FLAT while time
    grows sub-linearly (per-batch fixed overhead amortizes).
  - stream_session_stats state is (user x open sessions inside the
    horizon): 10x users -> ~10x state, but bounded by the watermark
    horizon, NOT by total history — max-state must sit far under the
    total session count, and the 10x/1x max-state ratio near 10 confirms
    horizon-bounded (not accumulating) state.

Usage: python tools/stream_scale_probe.py [base_sf_dir]
Prints one JSON line; paste the numbers into BENCH_NOTES.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import _scaled_events
from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.streaming.ingest import (
    scratch_root,
    session_event_stats,
    windowed_event_counts,
)

N_SLICES = 8
MULTS = (1, 10)


def materialize_sliced(spark, base_dir: str, mult: int) -> str:
    """Write the mult-scaled events corpus as N_SLICES time-ordered parquet
    files (one file per slice, strictly increasing mtimes) so the file
    stream source feeds batches in event-time order."""
    ev = _scaled_events(spark, base_dir, mult)
    sliced = ev.withColumn(
        "slice", F.ntile(N_SLICES).over(Window.orderBy("ts", "event_id"))
    ).localCheckpoint(eager=True)
    src_dir = tempfile.mkdtemp(prefix=f"stream_scale_{mult}x_", dir=scratch_root())
    for i in range(1, N_SLICES + 1):
        tmp = tempfile.mkdtemp(prefix="slice_", dir=scratch_root())
        (
            sliced.where(F.col("slice") == i)
            .drop("slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"slice_{i:03d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        shutil.rmtree(tmp, ignore_errors=True)
    return src_dir


def replay(spark, src_dir: str, plan_fn) -> dict:
    """One availableNow replay in APPEND mode over the sliced source;
    returns wall time, emitted rows, and per-batch total state rows."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = plan_fn(stream)
    name = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    state = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return {
        "sec": round(dt, 3),
        "rows": rows,
        "state_max": max(state) if state else 0,
        "state_final": state[-1] if state else 0,
        "n_batches": len(state),
    }


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("stream_scale_probe")
    plans = {
        "stream_windowed_counts": lambda s: windowed_event_counts(s),
        "stream_session_stats": lambda s: session_event_stats(s),
    }
    out: dict[str, dict] = {}
    for mult in MULTS:
        src = materialize_sliced(spark, base, mult)
        try:
            for op, fn in plans.items():
                best = None
                for _rep in range(2):
                    r = replay(spark, src, fn)
                    best = r if best is None or r["sec"] < best["sec"] else best
                out.setdefault(op, {})[f"{mult}x"] = best
                print(f"# {op} {mult}x: {best}", file=sys.stderr)
        finally:
            shutil.rmtree(src, ignore_errors=True)
    for op, d in out.items():
        d["time_ratio"] = round(d["10x"]["sec"] / d["1x"]["sec"], 2)
        d["state_ratio"] = round(
            d["10x"]["state_max"] / max(1, d["1x"]["state_max"]), 2
        )
    print(json.dumps({"base": base, "slices": N_SLICES, "ops": out}))


if __name__ == "__main__":
    main()
