"""One-shot round-15 window rotation for queries/registry.py.

VERDICT r14 item 7: the ladder is at zero entering the round, so r15 is
rotation MAINTENANCE — no forced drains. The r15 ladder is 5 rows, all
produced by this round's own commits (da46135: the ER blocking scale law
re-dated linkage_jaro_winkler, the fused-HITS decline guard re-dated
hits_hubs_authorities; c6ebd08: the doc_lm frame-level refactor re-dated
doc_lm_perplexity / perplexity_filter / doc_lm_kneser_ney). The window
leads with the two BEHAVIOR-touched queries (kernel-change protocol rule
(d)), takes the plan-identical refactor trio next, and fills the
remaining ~39 slots with OLDEST-GREEN re-confirmations (graded queries
whose newest driver row is oldest, ties by name) so no driver row ages
past two rounds.

Run ONCE, after the round's last query-code commit, from the repo root;
check git diff afterwards, then `backlog_report.py --assert` must exit 0.

Bookkeeping is emitted from the DISPLACED/reused lists themselves
(ADVICE r13 — never a positional zip against INCOMING).
"""

import glob
import json
import re
from pathlib import Path

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from backlog_report import stale_ladder
from hadoop_data_lake_spark.queries.registry import (
    REGISTRY,
    STREAMING_GUARD,
)

REG = Path("hadoop_data_lake_spark/queries/registry.py")

GUARD = list(STREAMING_GUARD)

#: Behavior-touched in r15 — graded first regardless of staleness rank.
FRONT = [
    "linkage_jaro_winkler",   # now a thin wrapper over operators/linkage.py
    "hits_hubs_authorities",  # fused tier declines non-integral node cols
]

N_NON_GUARD = 44


def newest_row_round() -> dict[str, int]:
    """query name -> newest CORRECTNESS round that graded it."""
    out: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name in json.load(open(f)):
            out[name] = max(out.get(name, 0), rnd)
    return out


ladder = [n for _, n, _ in stale_ladder()]
for n in FRONT:
    assert n in ladder, (n, "expected stale — behavior changed in r15")
rest = [n for n in ladder if n not in FRONT and n not in GUARD]

rows = newest_row_round()
fill_candidates = sorted(
    (
        n
        for n, spec in REGISTRY.items()
        if spec.oracle is not None
        and n in rows
        and n not in ladder
        and n not in GUARD
    ),
    key=lambda n: (rows[n], n),
)
need = N_NON_GUARD - len(FRONT) - len(rest)
assert need >= 0, f"ladder ({len(ladder)}) overflows the window; use --stale order"
INCOMING = FRONT + rest + fill_candidates[:need]
assert len(INCOMING) == N_NON_GUARD
assert len(set(INCOMING)) == N_NON_GUARD
for n in INCOMING:
    assert REGISTRY[n].oracle is not None, n  # every slot hash-verified

text = REG.read_text()
lines = text.splitlines(keepends=True)

ENTRY_RE = re.compile(r'^    "(\w+)": QuerySpec\(')


def region(varname):
    start = next(i for i, l in enumerate(lines) if l.startswith(varname + ":"))
    end = next(i for i in range(start + 1, len(lines)) if lines[i].rstrip() == "}")
    return start, end


# ---- rewrite INTENTIONAL_REGRADES to the new set ----
ir_start = next(
    i for i, l in enumerate(lines) if l.startswith("INTENTIONAL_REGRADES:")
)
ir_end = next(i for i in range(ir_start + 1, len(lines)) if lines[i].rstrip() == "})")
new_ir = (
    ["INTENTIONAL_REGRADES: frozenset[str] = frozenset({\n"]
    + [f'    "{n}",\n' for n in INCOMING]
    + ["})\n"]
)
lines = lines[:ir_start] + new_ir + lines[ir_end + 1 :]

w_start, w_end = region("_WINDOW")
b_start, b_end = region("_BACKLOG")
assert w_end < b_start

window_entries = []  # (name, line)
for i in range(w_start + 1, w_end):
    m = ENTRY_RE.match(lines[i])
    if m:
        window_entries.append((m.group(1), lines[i]))
guard_lines = [l for n, l in window_entries if n in GUARD]
assert len(guard_lines) == 6
assert len(window_entries) == 50

backlog_lines = lines[b_start + 1 : b_end]

available = {n: l for n, l in window_entries if n not in GUARD}
kept_backlog = []
for l in backlog_lines:
    m = ENTRY_RE.match(l)
    if m and m.group(1) in INCOMING:
        available[m.group(1)] = l
    else:
        kept_backlog.append(l)

missing = [n for n in INCOMING if n not in available]
assert not missing, missing
incoming_lines = [available[n] for n in INCOMING]
displaced = [
    (n, l) for n, l in window_entries if n not in GUARD and n not in INCOMING
]
reused = [n for n, _ in window_entries if n in INCOMING and n not in GUARD]

header = [
    "    # ---- ROUND-15 WINDOW ------------------------------------------------\n",
    "    # Every non-guard slot is a DECLARED re-grade (all 44 in\n",
    "    # INTENTIONAL_REGRADES above; `backlog_report.py --assert`\n",
    "    # enforces the declaration; rows-only queries cannot occupy a\n",
    "    # non-guard slot). Maintenance rotation (VERDICT r14 item 7):\n",
    "    # linkage_jaro_winkler + hits_hubs_authorities lead (behavior\n",
    "    # touched by the r15-open commits), then the plan-identical\n",
    "    # doc_lm frame-refactor trio, then oldest-green re-confirmations\n",
    "    # so no driver row ages past two rounds.\n",
    "    # Bookkeeping below is emitted from the displaced/reused lists\n",
    "    # themselves (ADVICE r13 — no positional zip against INCOMING).\n",
]
for n in reused:
    header.append(f"    # {n}: reused in place (was already a window slot)\n")
for old, _ in displaced:
    header.append(
        f"    # {old} -> displaced to _BACKLOG (r14-green, driver row stands)\n"
    )

guard_comment = [
    "    # --- streaming regression guard (6 = STREAMING_GUARD above):\n",
    "    # streaming silently broke at r2 HEAD; these keep every micro-batch/\n",
    "    # watermark/stream-join path under the driver gate ---\n",
]

new_window = (
    [lines[w_start]]
    + header
    + incoming_lines
    + guard_comment
    + guard_lines
    + [lines[w_end]]
)

backlog_top_comment = [
    "    # --- round-14 green, displaced by the r15 rotation (all hold a\n",
    "    # CORRECTNESS_r14.json full-oracle PASS) ---\n",
]
new_backlog = (
    [lines[b_start]]
    + backlog_top_comment
    + [l for _, l in displaced]
    + kept_backlog
    + [lines[b_end]]
)

out = (
    lines[:w_start]
    + new_window
    + lines[w_end + 1 : b_start]
    + new_backlog
    + lines[b_end + 1 :]
)
REG.write_text("".join(out))
print(
    "rotated: window", len(incoming_lines) + len(guard_lines), "entries;",
    "displaced", len(displaced), "; reused in place", len(reused),
)
print("incoming order:", ", ".join(INCOMING))
