"""Profile the streaming-replay fixed overhead (VERDICT r14 item 5).

The 6-slot streaming guard replays each plan over static parquet with
availableNow + a memory sink (streaming/ingest.py). Each replay pays:

  (a) schema inference     — spark.read.parquet(path).schema (footer read)
  (b) scratch-dir + symlink — trivial filesystem work
  (c) plan construction     — Python-side, no job
  (d) query start -> drain  — the streaming engine lifecycle: offset/commit
                              log, microbatch planning, N state-store
                              partitions x (init + commit), the actual scan
                              + aggregation work
  (e) result fetch          — memory-sink table -> localCheckpoint + drop

This script answers: how much of a guard query's wall is FIXED engine
overhead (would not grow with data) vs per-row work (would)? Three probes:

1. phase breakdown of run_batch_replay at sf0.1 (100k events);
2. the same replay over a 1-ROW corpus — (d) at n~0 is the pure engine
   floor (state stores, logs, batch planning) with ~zero scan work;
3. the state-partition lever: (d) re-measured with
   spark.sql.shuffle.partitions (which fixes the number of streaming
   state-store partitions at first batch) at 32 / 8 / 2.

Each timing is a best-of-N over fresh replays (the guard queries run
cold-per-invocation in the driver gate, so best-of-N on a warm session
mirrors the bench protocol, not the gate's absolute cost).

Usage: python tools/stream_replay_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.streaming import ingest


def timed(fn, reps: int):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def phase_breakdown(spark, path: str, reps: int) -> dict[str, float]:
    """Best-of-reps per phase of run_batch_replay (phases timed within one
    replay; best taken per-phase across replays)."""
    best: dict[str, float] = {}

    for _ in range(reps):
        t0 = time.perf_counter()
        schema = spark.read.parquet(path).schema  # noqa: F841
        t1 = time.perf_counter()
        stream, src_dir = ingest._open_stream(spark, path)  # includes a 2nd schema read
        t2 = time.perf_counter()
        plan = ingest.windowed_event_counts(stream, 600)
        t3 = time.perf_counter()
        name = ingest.replay_to_memory(plan, output_mode="complete")
        t4 = time.perf_counter()
        result = spark.table(name).localCheckpoint(eager=True)
        n = result.count()
        t5 = time.perf_counter()
        spark.catalog.dropTempView(name)
        import shutil

        shutil.rmtree(src_dir, ignore_errors=True)
        phases = {
            "a_schema": t1 - t0,
            "b_open_stream": t2 - t1,
            "c_plan_build": t3 - t2,
            "d_start_drain": t4 - t3,
            "e_fetch": t5 - t4,
            "total": t5 - t0,
        }
        for k, v in phases.items():
            best[k] = min(best.get(k, float("inf")), v)
    best["rows"] = n
    return best


def one_row_floor(spark, path: str, reps: int) -> float:
    """Replay the SAME plan over a single-row slice of the corpus: the
    start->drain wall at n~0 is the fixed engine cost."""
    import tempfile

    tiny = tempfile.mkdtemp(prefix="stream_profile_tiny_", dir=ingest.scratch_root())
    tiny_file = os.path.join(tiny, "events.parquet")
    spark.read.parquet(path).limit(1).coalesce(1).write.mode("overwrite").parquet(
        tiny + "/d"
    )
    # single FILE (the replay source symlinks one file)
    part = next(
        f for f in os.listdir(tiny + "/d") if f.endswith(".parquet")
    )
    os.rename(os.path.join(tiny + "/d", part), tiny_file)

    def run():
        ingest.run_batch_replay(spark, tiny_file, 600).count()

    return timed(run, reps)


def partition_lever(spark, path: str, reps: int) -> dict[int, float]:
    """start->drain wall vs streaming state-partition count. The shuffle
    partition conf is snapshotted/restored; each replay is a NEW streaming
    query, so the conf at start() fixes its state layout."""
    out: dict[int, float] = {}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_parts in (32, 8, 2):
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

            def run():
                ingest.run_batch_replay(spark, path, 600).count()

            out[n_parts] = timed(run, reps)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = f"{sf_dir}/events.parquet"
    spark = get_spark(app_name="stream_replay_profile")
    # warmup: one throwaway replay so JVM/codegen startup isn't billed
    ingest.run_batch_replay(spark, path, 600).count()

    print(f"== phase breakdown (windowed replay, {path}, best of {reps}) ==")
    phases = phase_breakdown(spark, path, reps)
    for k, v in phases.items():
        print(f"  {k:>14}: {v:.3f}" + ("" if k == "rows" else " s"))

    print(f"== 1-row corpus floor (same plan, best of {reps}) ==")
    floor = one_row_floor(spark, path, reps)
    print(f"  total replay over 1 row: {floor:.3f} s")

    print(f"== state-partition lever (full corpus, best of {reps}) ==")
    for n_parts, sec in partition_lever(spark, path, reps).items():
        print(f"  shuffle.partitions={n_parts:>2}: {sec:.3f} s")

    spark.stop()


if __name__ == "__main__":
    main()
