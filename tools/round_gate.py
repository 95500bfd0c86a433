"""One-command round gates (VERDICT r13 item 7): the open/close checks
that rounds 10-13 ran by convention, made mechanical.

    python tools/round_gate.py --open
        Round-START gate. Run as the FIRST action of every round:
        1. backlog_report --artifacts  — exit 1 while any driver artifact
           (CORRECTNESS_r*/BENCH_r*.json, bench_detail.json) is untracked
           or modified (untracked artifacts silently skew --stale).
        2. backlog_report --stale      — prints the ladder the round's
           rotation must drain (informational, never fails).

    python tools/round_gate.py --close
        Round-CLOSE gate. Run at the code freeze, AFTER the rotation
        (memory: rotation comes after the last query-code commit):
        1. backlog_report --assert     — every non-guard window slot is
           first-time or a declared INTENTIONAL_REGRADE.
        2. full sf0.001 oracle sweep   — 352/352 value-hash green.
        3. 50-slot window at sf0.01    — the driver's gate scale.
        4. 50-slot window at sf0.1     — the bench scale (scale-sensitive
           semantics: ties, overflow, quantile boundaries).
        5. pytest tests/ -q
        6. plan_audit                  — regenerates PLAN_AUDIT.md at the
           freeze; exits 1 on any un-whitelisted red flag.
        7. degenerate_sweep            — no query raises on degenerate
           corpora (div-by-zero class kept closed).
        8. degenerate_sweep --plans    — fact-rescan audit on the
           empty-facts corpus (re-run after eager-checkpoint changes).
        9. entry() smoke               — the driver contract's flagship.
        10. FULL registry sweep at sf0.1 (--scaled-variants) — the
           bench-scale insurance sweep over all 352 queries (~13 min;
           VERDICT r14 item 4 made it a permanent numbered gate). Runs
           LAST so every cheaper gate fails first; the 50-slot window
           step above stays as its fast-fail precursor.

        The timed bench is deliberately NOT here: it must run ALONE on a
        calm box (BENCH_NOTES protocol), never stacked behind an hour of
        gate jobs that leave the JVMs and page cache hot.

    python tools/round_gate.py --close --only NAME[,NAME...]
        Re-run a subset after a fix (names printed in the step list).

Steps run sequentially as subprocesses (each owns its Spark session);
the gate stops at the first failure and exits with that step's code.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

_WINDOW_NAMES_SNIPPET = (
    "import sys; sys.path.insert(0, '.');"
    "from hadoop_data_lake_spark.queries.registry import REGISTRY, DRIVER_WINDOW_SIZE;"
    "print(' '.join(list(REGISTRY)[:DRIVER_WINDOW_SIZE]))"
)

_SMOKE_SNIPPET = """
import sys; sys.path.insert(0, '.')
import importlib.util
from hadoop_data_lake_spark.core.session import get_spark
spec = importlib.util.spec_from_file_location('e', '__spark_entry__.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
rows = m.entry(get_spark('round_gate_smoke')).collect()
assert len(rows) > 0 and rows[0].__fields__, rows
print(f'entry() smoke: {len(rows)} rows')
"""


def _window_names() -> list[str]:
    out = subprocess.run(
        [PY, "-c", _WINDOW_NAMES_SNIPPET], cwd=REPO, capture_output=True, text=True
    )
    if out.returncode != 0:
        print(out.stderr, file=sys.stderr)
        raise SystemExit("cannot resolve the driver window from registry.py")
    return out.stdout.split()


def open_steps() -> list[tuple[str, list[str]]]:
    return [
        ("artifacts", [PY, "tools/backlog_report.py", "--artifacts"]),
        ("stale-ladder", [PY, "tools/backlog_report.py", "--stale"]),
    ]


def close_steps() -> list[tuple[str, list[str]]]:
    window = _window_names()
    return [
        ("rotation-assert", [PY, "tools/backlog_report.py", "--assert"]),
        ("oracle-sf0.001", [PY, "-u", "tools/check_oracle.py", "/root/testdata/sf0.001"]),
        ("window-sf0.01", [PY, "-u", "tools/check_oracle.py", "/root/testdata/sf0.01", *window]),
        # --scaled-variants: the sf0.1 sweep may verify dense-spine
        # oracles on their coarser registered twin (VERDICT r13 item 6;
        # queries/sweep_variants.py) — sf0.001/sf0.01 never pass it.
        ("window-sf0.1", [PY, "-u", "tools/check_oracle.py", "/root/testdata/sf0.1", "--scaled-variants", *window]),
        ("pytest", [PY, "-m", "pytest", "tests/", "-q"]),
        ("plan-audit", [PY, "tools/plan_audit.py"]),
        ("degenerate", [PY, "tools/degenerate_sweep.py"]),
        ("degenerate-plans", [PY, "tools/degenerate_sweep.py", "--plans"]),
        ("entry-smoke", [PY, "-c", _SMOKE_SNIPPET]),
        ("oracle-sf0.1-full", [PY, "-u", "tools/check_oracle.py", "/root/testdata/sf0.1", "--scaled-variants"]),
    ]


def run(steps: list[tuple[str, list[str]]], only: set[str] | None) -> int:
    todo = [(n, c) for n, c in steps if only is None or n in only]
    if only is not None and len(todo) != len(only):
        known = {n for n, _ in steps}
        raise SystemExit(f"unknown step(s): {sorted(only - known)}; known: {sorted(known)}")
    results: list[tuple[str, float, int]] = []
    for name, cmd in todo:
        print(f"==> {name}: {' '.join(cmd[:4])}{' ...' if len(cmd) > 4 else ''}", flush=True)
        t0 = time.time()
        # Spark WARN spam can bury verdict lines (verify-skill gotcha):
        # keep stdout streaming, discard stderr for the oracle sweeps only.
        quiet = name.startswith(("oracle-", "window-"))
        proc = subprocess.run(
            cmd, cwd=REPO, stderr=subprocess.DEVNULL if quiet else None
        )
        dt = time.time() - t0
        results.append((name, dt, proc.returncode))
        print(f"<== {name}: exit {proc.returncode} in {dt:.0f}s", flush=True)
        if proc.returncode != 0:
            _summary(results)
            return proc.returncode
    _summary(results)
    return 0


def _summary(results: list[tuple[str, float, int]]) -> None:
    print("\n# round_gate summary")
    for name, dt, rc in results:
        print(f"  {'PASS' if rc == 0 else 'FAIL'}  {name:<18} {dt:7.0f}s")


def main() -> int:
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--open", action="store_true")
    g.add_argument("--close", action="store_true")
    p.add_argument("--only", help="comma-separated step names to re-run")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None
    steps = open_steps() if args.open else close_steps()
    return run(steps, only)


if __name__ == "__main__":
    raise SystemExit(main())
