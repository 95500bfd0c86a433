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
    python tools/backlog_report.py --artifacts # round-start checklist gate
                                              # (VERDICT r12 item 2): exit 1
                                              # while any round artifact
                                              # (CORRECTNESS_r*/BENCH_r*.json,
                                              # bench_detail.json) is
                                              # untracked or modified
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


def _package_modules() -> list[str]:
    """Every package module a query function can import from (operators/
    functions/pipelines/streaming) — the cross-module hop of the stale
    ladder. Excluded on purpose:
    - registry.py: rotations move names without changing semantics;
    - __init__ re-export shims: carry no blocks of their own;
    - core/ (io/session): read_table & co. are imported by EVERY query,
      so a core edit would re-date the whole registry at once — that is
      not a prioritization signal (the full-registry check_oracle sweeps
      at sf0.001/sf0.01 re-verify every query against its oracle each
      round; the ladder only ranks which DRIVER rows to refresh first)."""
    out = []
    for root, _dirs, files in os.walk("hadoop_data_lake_spark"):
        if os.path.basename(root) == "core":
            continue
        for f in files:
            p = os.path.join(root, f)
            if (
                f.endswith(".py")
                and not f.startswith("__")
                and p not in _QUERY_MODULES
                and f != "registry.py"
            ):
                out.append(p)
    return sorted(out)


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


def _parse_blocks(text: str) -> dict[str, str]:
    """Split a module into top-level blocks keyed by the def/class name or
    assignment target, with EXACT extents from the ast (driver-ADVICE r8:
    the old line scanner counted \"\"\" and ''' naively, so a ''' inside a
    \"\"\"-docstring — or either inside a comment — mis-toggled the
    in-string state and could mis-date blocks, skewing the --stale
    ladder). Every blob in the modules' history is committed working
    Python, so ast.parse is total here; a syntactically broken blob would
    raise rather than silently mis-attribute."""
    import ast

    tree = ast.parse(text)
    lines = text.splitlines()
    blocks: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            name = node.name
            start = min([node.lineno] + [d.lineno for d in node.decorator_list])
        elif isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            name, start = node.targets[0].id, node.lineno
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            name, start = node.target.id, node.lineno
        else:
            continue
        blocks[name] = "\n".join(lines[start - 1 : node.end_lineno])
    return blocks


def _block_mtimes(
    paths: list[str],
) -> tuple[dict[tuple[str, str], int], dict[str, dict[str, str]]]:
    """Walk every commit touching `paths` oldest-first, parse each
    changed file version into top-level blocks, and record the commit epoch
    whenever a block's TEXT changes (or first appears). Exact semantic
    attribution — unlike `git log -S <name>`, which only fires when the
    name string is added/removed, so body-only edits (the r7 dprod
    widenings) were invisible. Returns ({(path, block): epoch},
    {path: current blocks})."""
    log = subprocess.run(
        ["git", "log", "--reverse", "--format=C|%ct", "--raw",
         "--no-renames", "--", *paths],
        capture_output=True, text=True,
    ).stdout
    mtimes: dict[tuple[str, str], int] = {}
    prev: dict[str, dict[str, str]] = {}
    blob_cache: dict[str, dict[str, str]] = {}
    epoch = 0
    for line in log.splitlines():
        if line.startswith("C|"):
            epoch = int(line[2:])
        elif line.startswith(":"):
            parts = line.split("\t")
            path = parts[1]
            new_sha = parts[0].split()[3]
            if new_sha not in blob_cache:
                txt = subprocess.run(
                    ["git", "cat-file", "blob", new_sha],
                    capture_output=True, text=True,
                ).stdout
                blob_cache[new_sha] = _parse_blocks(txt)
            blocks = blob_cache[new_sha]
            old = prev.get(path, {})
            for name, body in blocks.items():
                if old.get(name) != body:
                    mtimes[(path, name)] = epoch
            prev[path] = blocks
    return mtimes, prev


def _import_maps(paths: list[str]) -> dict[str, dict[str, tuple[str, str | None]]]:
    """Per importing module: local name -> (target module path, symbol).
    Covers `from pkg.mod import sym [as alias]` (symbol hop) and
    `from pkg import mod [as alias]` (module-alias hop, symbol None —
    resolved per `alias.attr` reference). Imports inside function bodies
    count (ast.walk); relative imports don't occur in this package."""
    import ast

    out: dict[str, dict[str, tuple[str, str | None]]] = {}
    for path in paths:
        m: dict[str, tuple[str, str | None]] = {}
        try:
            tree = ast.parse(open(path).read())
        except (OSError, SyntaxError):
            out[path] = m
            continue
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.ImportFrom)
                and node.module
                and node.module.startswith("hadoop_data_lake_spark")
            ):
                continue
            base = node.module.replace(".", "/")
            for a in node.names:
                local = a.asname or a.name
                if os.path.exists(f"{base}/{a.name}.py"):
                    m[local] = (f"{base}/{a.name}.py", None)  # module alias
                elif os.path.exists(base + ".py"):
                    m[local] = (base + ".py", a.name)  # direct symbol
        out[path] = m
    return out


def semantic_last_modified(names: list[str]) -> dict[str, int]:
    """name -> epoch of the last commit that changed the query's defining
    blocks: its def, its <NAME>_SQL constant, one hop of same-module
    top-level blocks those reference (catches `X_SQL = _helper()` and
    shared SQL-fragment builders), plus one CROSS-module hop through the
    query's imports (a rewrite of an operators/ or functions/ block the
    query calls re-dates the query — the blind spot earlier rounds had
    to hand-list in INTENTIONAL_REGRADES) and the same-module refs of
    each imported block (its private helpers)."""
    import re

    pkg_paths = _package_modules()
    mtimes, heads = _block_mtimes(_QUERY_MODULES + pkg_paths)
    imaps = _import_maps(_QUERY_MODULES)

    def same_module_refs(path: str, root: str) -> set[str]:
        blocks = heads.get(path, {})
        if root not in blocks:
            return set()
        return {
            w
            for w in set(re.findall(r"\b[A-Za-z_]\w*\b", blocks[root]))
            if w != root and w in blocks
        }

    out: dict[str, int] = {}
    for q in names:
        roots = {q, f"{q.upper()}_SQL"}
        eps: list[int] = []
        targets: set[tuple[str, str]] = set()
        for path in _QUERY_MODULES:
            blocks = heads.get(path, {})
            local = roots & blocks.keys()
            if not local:
                continue
            refs: set[str] = set()
            for r in local:
                refs |= same_module_refs(path, r)
            targets |= {(path, b) for b in local | refs}
            # cross-module hop through this module's imports
            imap = imaps.get(path, {})
            text = "\n".join(blocks[r] for r in local | refs)
            words = set(re.findall(r"\b[A-Za-z_]\w*\b", text))
            attrs = set(re.findall(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)", text))
            for w in words:
                hit = imap.get(w)
                if not hit:
                    continue
                tpath, sym = hit
                if sym is not None:
                    syms = {sym}
                else:  # module alias: attribute only the attrs referenced
                    syms = {a for m_, a in attrs if m_ == w}
                for s in syms:
                    if s in heads.get(tpath, {}):
                        targets.add((tpath, s))
                        targets |= {
                            (tpath, h) for h in same_module_refs(tpath, s)
                        }
        for key in targets:
            if key in mtimes:
                eps.append(mtimes[key])
        out[q] = max(eps, default=0)
    return out


def correctness_file_epoch(f: str) -> int:
    """Last-commit epoch of a CORRECTNESS file, falling back to file mtime
    when the file is not yet tracked (the round-boundary state: the driver
    writes CORRECTNESS_r{N}.json after the round's last commit). The old
    behavior dated untracked files to epoch 0, which marked every row of
    the newest round "stale by ~20000d" and inflated the stale count 2x
    (VERDICT r9 item 2/3)."""
    ep_out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", f],
        capture_output=True, text=True,
    ).stdout.split()
    if ep_out:
        return int(ep_out[0])
    print(f"# warning: {f} untracked — using file mtime for staleness",
          file=sys.stderr)
    return int(os.path.getmtime(f))


def last_graded_round_epoch() -> dict[str, tuple[str, int]]:
    """name -> (newest CORRECTNESS file containing a green row for it,
    that file's last commit epoch — file mtime if untracked)."""
    out: dict[str, tuple[str, int]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        epoch = correctness_file_epoch(f)
        for name in json.load(open(f)):
            out[name] = (f, epoch)  # later files overwrite: newest round wins
    return out


def stale_ladder() -> list[tuple[int, str, str]]:
    """(staleness_delta, name, newest_correctness_file), most-stale first,
    for FULL-ORACLE queries only. Rows-only entries (REGISTRY oracle is
    None) are excluded by design (VERDICT r10 item 3): a driver slot spent
    on one is guaranteed to come back `no_oracle` with no value hash —
    their real verification is pytest (+ an oracle-exact sibling where one
    exists), so re-grading them wastes the slot. ann_ivf_kmeans burned two
    windows (r2, r10) this way before the rule."""
    graded = last_graded_round_epoch()
    in_reg = sorted(
        n for n in graded if n in REGISTRY and REGISTRY[n].oracle is not None
    )
    mod = semantic_last_modified(in_reg)
    rows = []
    for name in in_reg:
        cfile, graded_ep = graded[name]
        if mod[name] > graded_ep:
            rows.append((mod[name] - graded_ep, name, cfile))
    rows.sort(reverse=True)
    return rows


def stale_report() -> None:
    """Re-grade ladder (VERDICT r7 item 7): graded full-oracle queries
    whose defining blocks (def, *_SQL oracle, one hop of same-module
    helpers they reference) changed AFTER the commit of their newest
    CORRECTNESS row, ranked most-stale first. These rows verify an older
    implementation; schedule them for re-grade windows once the
    never-graded backlog is empty. Rows-only entries are excluded (see
    stale_ladder) and reported separately."""
    rows = stale_ladder()
    print(f"stale green rows (code newer than newest driver row): {len(rows)}")
    for delta, name, cfile in rows:
        print(f"  {name}  (row: {cfile}, code newer by {delta // 86400}d"
              f" {delta % 86400 // 3600}h)")
    graded = last_graded_round_epoch()
    excluded = sorted(
        n for n in graded if n in REGISTRY and REGISTRY[n].oracle is None
    )
    if excluded:
        print(f"rows-only entries excluded from the ladder ({len(excluded)}; "
              "pytest is their verification): " + ", ".join(excluded))


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
    # Rows-only guard (VERDICT r10 item 3): a non-guard window slot
    # holding a query with no DuckDB oracle is a wasted grading slot —
    # the driver can only record `no_oracle` for it; pytest is its real
    # verification. Every graded slot must carry a value hash.
    rows_only = [
        n for n in window
        if n not in GUARD_SLOTS
        and getattr(REGISTRY[n], "oracle", True) is None
    ]
    if rows_only:
        print("ROTATION VIOLATION: rows-only queries occupy non-guard "
              "window slots (their driver row is guaranteed no_oracle):")
        for n in rows_only:
            print(f"  {n}")
        return 1
    # Lifecycle guard: a declared re-grade that is NOT in the current
    # window is a leftover from a previous round's rotation — left in
    # place it would silently sanction re-grading that query again next
    # rotation, re-opening the hole the first-time rule closes. Each
    # round's rotation must RESET the set to its own re-grades.
    stale_decl = sorted(INTENTIONAL_REGRADES - set(window))
    if stale_decl:
        print("ROTATION VIOLATION: INTENTIONAL_REGRADES declares entries "
              "not in the current window (stale from a prior rotation):")
        for n in stale_decl:
            print(f"  {n}")
        return 1
    n_first = sum(1 for n in window if n not in graded)
    print(f"rotation ok: {n_first}/{DRIVER_WINDOW_SIZE} window slots are "
          f"first-time; {len(sanctioned)} declared re-grades "
          f"({', '.join(sanctioned) if sanctioned else 'none'}); every other "
          "repeat is a guard slot")
    return 0


def assert_artifacts() -> int:
    """Round-start checklist gate (VERDICT r12 item 2): the driver writes
    CORRECTNESS_r{N}.json / BENCH_r{N}.json / bench_detail.json AFTER the
    round's last commit, so they sit untracked at the next round's start —
    and r11 AND r12 both forgot to commit them until the judge flagged it.
    Exit 1 (listing the offenders) while any round artifact is untracked
    or carries uncommitted modifications; exit 0 when the trail is clean.
    Staleness attribution silently degrades to file mtime for untracked
    artifacts (correctness_file_epoch), so a dirty trail also skews the
    --stale ladder."""
    proc = subprocess.run(
        ["git", "status", "--porcelain", "--",
         "CORRECTNESS_r*.json", "BENCH_r*.json", "bench_detail.json"],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        # Fail CLOSED (driver-ADVICE r13): an empty stdout from a failed
        # git call (not a repo, wrong cwd, git missing) must not read as
        # "all committed".
        print("git status failed — cannot verify round artifacts:",
              file=sys.stderr)
        print(proc.stderr.strip(), file=sys.stderr)
        return 1
    dirty = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    if dirty:
        print("round artifacts NOT committed (commit them at round start):")
        for ln in dirty:
            print(f"  {ln}")
        return 1
    print("round artifacts all committed")
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
        elif "--artifacts" in sys.argv:
            sys.exit(assert_artifacts())
        elif "--stale" in sys.argv:
            stale_report()
        else:
            main()
    except BrokenPipeError:  # piped into head — not an error
        pass
