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
    python tools/backlog_report.py --stale    # re-grade ladder (VERDICT r7
                                              # item 7): graded queries whose
                                              # query/oracle code changed
                                              # AFTER their newest green row,
                                              # most-stale first
    python tools/backlog_report.py --assert   # pre-ship rotation invariant:
                                              # exit 1 unless every non-guard
                                              # window slot is first-time or a
                                              # declared INTENTIONAL_REGRADE
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.queries.registry import (
    DRIVER_WINDOW_SIZE,
    INTENTIONAL_REGRADES,
    REGISTRY,
    STREAMING_GUARD,
)

#: Window slots exempt from the first-time rule (imported from the registry —
#: the single source of truth, driver-ADVICE r7 — so a guard-block change
#: there cannot silently desynchronize this invariant). Named explicitly in
#: the registry — a tag-based rule would also exempt non-guard
#: streaming-tagged queries.
GUARD_SLOTS = frozenset(STREAMING_GUARD)

#: Files whose history defines a query's semantics: the query function and
#: its DuckDB oracle SQL live in these modules. registry.py is EXCLUDED on
#: purpose — rotations move every name there without changing semantics.
_QUERY_MODULES = [
    "hadoop_data_lake_spark/queries/events_queries.py",
    "hadoop_data_lake_spark/queries/geo_queries.py",
    "hadoop_data_lake_spark/queries/northstar_queries.py",
    "hadoop_data_lake_spark/queries/tpch_queries.py",
]


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


def last_modified_epoch(name: str) -> int:
    """Newest commit epoch whose diff adds/removes `name` in the query
    modules — an approximation of "last semantic change": the query fn and
    its *_SQL oracle are named after the query, so body edits hit -S on the
    defining module. Operator-module rewrites that keep the query module
    byte-identical are invisible here (documented limitation; those rounds
    list their re-grades in INTENTIONAL_REGRADES by hand)."""
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", f"-S{name}", "--", *_QUERY_MODULES],
        capture_output=True, text=True,
    ).stdout.split()
    return int(out[0]) if out else 0


def last_graded_round_epoch() -> dict[str, tuple[str, int]]:
    """name -> (newest CORRECTNESS file containing a green row for it,
    that file's last commit epoch)."""
    out: dict[str, tuple[str, int]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        ep_out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", f],
            capture_output=True, text=True,
        ).stdout.split()
        epoch = int(ep_out[0]) if ep_out else 0
        for name in json.load(open(f)):
            out[name] = (f, epoch)  # later files overwrite: newest round wins
    return out


def stale_report() -> None:
    """Re-grade ladder (VERDICT r7 item 7): graded queries whose defining
    code changed AFTER the commit of their newest CORRECTNESS row, ranked
    most-stale first. These rows verify an older implementation; schedule
    them for re-grade windows once the never-graded backlog is empty."""
    graded = last_graded_round_epoch()
    rows = []
    for name, (cfile, graded_ep) in sorted(graded.items()):
        if name not in REGISTRY:
            continue
        mod_ep = last_modified_epoch(name)
        if mod_ep > graded_ep:
            rows.append((mod_ep - graded_ep, name, cfile))
    rows.sort(reverse=True)
    print(f"stale green rows (code newer than newest driver row): {len(rows)}")
    for delta, name, cfile in rows:
        print(f"  {name}  (row: {cfile}, code newer by {delta // 86400}d"
              f" {delta % 86400 // 3600}h)")


def assert_rotation() -> int:
    """Pre-ship invariant (VERDICT r6 item 3): every non-guard window slot
    must be ABSENT from all committed CORRECTNESS_r*.json — shipping a
    window that re-grades proven queries wastes the round's grading
    budget — unless the registry declares it an INTENTIONAL_REGRADE
    (stale-row ladder / oracle upgrades, VERDICT r7 items 1+7)."""
    graded = graded_ever()
    window = list(REGISTRY)[:DRIVER_WINDOW_SIZE]
    repeats = [n for n in window if n in graded and n not in GUARD_SLOTS]
    violations = [n for n in repeats if n not in INTENTIONAL_REGRADES]
    sanctioned = [n for n in repeats if n in INTENTIONAL_REGRADES]
    if violations:
        print("ROTATION VIOLATION: non-guard window slots already graded "
              "and not declared in INTENTIONAL_REGRADES:")
        for n in violations:
            print(f"  {n}")
        return 1
    n_first = sum(1 for n in window if n not in graded)
    print(f"rotation ok: {n_first}/{DRIVER_WINDOW_SIZE} window slots are "
          f"first-time; {len(sanctioned)} declared re-grades "
          f"({', '.join(sanctioned) if sanctioned else 'none'}); every other "
          "repeat is a guard slot")
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
        elif "--stale" in sys.argv:
            stale_report()
        else:
            main()
    except BrokenPipeError:  # piped into head — not an error
        pass
