"""Driver-grading backlog accounting: which registry queries have a
CORRECTNESS_r{N}.json row, which never got one, and what the current
window will grade.

The external gate grades only the first DRIVER_WINDOW_SIZE registry
entries per round (contract in queries/registry.py). Rotation planning
needs exact never-graded accounting; doing it by hand produced the r5
docstring drift where entries listed as "rotated in" had in fact been
displaced again before grading. This makes it mechanical:

    python tools/backlog_report.py            # summary + never-graded list
    python tools/backlog_report.py --oldest N # N oldest never-graded (by
                                              # first-registration commit)
    python tools/backlog_report.py --assert   # pre-ship rotation invariant:
                                              # exit 1 unless every non-guard
                                              # window slot is first-time
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.queries.registry import DRIVER_WINDOW_SIZE, REGISTRY


def graded_ever() -> set[str]:
    out: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        out |= set(json.load(open(f)).keys())
    return out


def first_seen_epoch(name: str) -> int:
    """Commit epoch when `name` first appeared in registry.py (slow: one
    git call per query — only used with --oldest)."""
    out = subprocess.run(
        ["git", "log", "--reverse", "--format=%ct", f'-S"{name}"',
         "--", "hadoop_data_lake_spark/queries/registry.py"],
        capture_output=True, text=True,
    ).stdout.split()
    return int(out[0]) if out else 0


#: Window slots exempt from the first-time rule: the 6-slot streaming
#: regression guard deliberately re-grades proven queries every round
#: (registry.py window comment). Named explicitly — a tag-based rule would
#: also exempt non-guard streaming-tagged queries.
GUARD_SLOTS = frozenset({
    "stream_windowed_counts", "stream_session_stats", "stream_running_max",
    "stream_enriched_value", "stream_attribution_pairs",
    "stream_attribution_left",
})


def assert_rotation() -> int:
    """Pre-ship invariant (VERDICT r6 item 3): every non-guard window slot
    must be ABSENT from all committed CORRECTNESS_r*.json — shipping a
    window that re-grades proven queries wastes the round's entire grading
    budget."""
    graded = graded_ever()
    window = list(REGISTRY)[:DRIVER_WINDOW_SIZE]
    repeats = [n for n in window if n in graded and n not in GUARD_SLOTS]
    if repeats:
        print("ROTATION VIOLATION: non-guard window slots already graded:")
        for n in repeats:
            print(f"  {n}")
        return 1
    n_first = sum(1 for n in window if n not in graded)
    print(f"rotation ok: {n_first}/{DRIVER_WINDOW_SIZE} window slots are "
          "first-time; every repeat is a guard slot")
    return 0


def main() -> None:
    graded = graded_ever()
    names = list(REGISTRY)
    window = names[:DRIVER_WINDOW_SIZE]
    full = [n for n, s in REGISTRY.items() if s.oracle is not None]
    rows_only = [n for n, s in REGISTRY.items() if s.oracle is None]
    never = [n for n in full if n not in graded]
    print(f"registry: {len(names)} ({len(full)} full-oracle, {len(rows_only)} rows-only)")
    print(f"graded ever: {len(graded & set(names))}")
    print(f"window slots grading first-time queries: {sum(1 for n in window if n not in graded)}/{DRIVER_WINDOW_SIZE}")
    backlog_never = [n for n in never if n not in window]
    print(f"never-graded full-oracle AFTER this window grades: {len(backlog_never)}")
    if "--oldest" in sys.argv:
        k = int(sys.argv[sys.argv.index("--oldest") + 1])
        aged = sorted(backlog_never, key=first_seen_epoch)[:k]
        print(f"\n{k} oldest never-graded (rotation candidates):")
        for n in aged:
            print(f"  {n}")
    else:
        print("\nnever-graded (backlog):")
        for n in backlog_never:
            print(f"  {n}")


if __name__ == "__main__":
    try:
        if "--assert" in sys.argv:
            sys.exit(assert_rotation())
        main()
    except BrokenPipeError:  # piped into head — not an error
        pass
