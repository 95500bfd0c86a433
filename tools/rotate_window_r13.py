"""One-shot round-13 window rotation for queries/registry.py.

VERDICT r12 item 1 (drain the stale ladder, behavior first): run ONCE,
after the round's last query-code commit, from the recomputed ladder.
The r12 to_units kernel change left 59 stale green rows that the 44
r12 slots could not absorb; this rotation drains 44 of them, but leads
with the queries whose BEHAVIOR changed in r12/r13 rather than the
mechanically-oldest rows (VERDICT r12: "new-behavior code carries more
regrade value than stale-by-attribution rows"):

    hits_hubs_authorities   r12 numpy driver tier + r13 overflow guard
    pagerank_det            r12 scaffolding + r13 one-exchange deg fusion
    textrank_keywords       rides pagerank_intexact (r13 contrib_base)
    lpa_modularity          r12 NULL-weight driver-tier semantics
    brand_communities_lpa   same kernel
    token_lang_mi           r12 MI-domain fix

then the remainder of `backlog_report.py --stale` order. The ~15 rows
left over wait in _BACKLOG for r14; the full-registry check_oracle
sweeps (sf0.001 + gate window at sf0.01/sf0.1) remain the builder-side
compensation for rows outside the window.

KERNEL-CHANGE PROTOCOL (VERDICT r12 item 5 — codified from what r12
improvised, applies to any edit under a widely-consumed primitive such
as functions/fixedpoint.to_units, core/io.read_table, or a shared
graph/sketch kernel):
  (a) land kernel changes EARLY in the round, so the full-registry
      sweeps and the rotation both post-date them;
  (b) ship a randomized oracle-parity test for the kernel's contract
      domain IN THE SAME COMMIT (the to_units DuckDB-parity test is the
      template);
  (c) when the re-dated consumer set exceeds one 44-slot window, record
      the planned multi-round drain in the rotation commit message and
      front-load the consumers whose VALUES the kernel could touch;
  (d) a behavior-touched query outranks a stale-by-attribution row in
      the next window, regardless of mechanical staleness order.

Like the r12 rotation, INCOMING may overlap the current window (window
lines are reused in place); the INTENTIONAL_REGRADES block is rewritten
to exactly the new 44-entry set. Run once from the repo root; check git
diff afterwards, then `backlog_report.py --assert` must exit 0.
"""

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

#: Behavior-touched in r12/r13 — graded first regardless of staleness rank.
FRONT = [
    "hits_hubs_authorities",
    "pagerank_det",
    "textrank_keywords",
    "lpa_modularity",
    "brand_communities_lpa",
    "token_lang_mi",
]

ladder = [n for _, n, _ in stale_ladder()]
for n in FRONT:
    assert n in ladder, (n, "expected stale — behavior changed in r12/r13")
rest = [n for n in ladder if n not in FRONT and n not in GUARD]
INCOMING = FRONT + rest[: 44 - len(FRONT)]
assert len(INCOMING) == 44
assert len(set(INCOMING)) == 44
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

header = [
    "    # ---- ROUND-13 WINDOW ------------------------------------------------\n",
    "    # Every non-guard slot is a DECLARED re-grade (all 44 in\n",
    "    # INTENTIONAL_REGRADES above; `backlog_report.py --assert`\n",
    "    # enforces the declaration; rows-only queries cannot occupy a\n",
    "    # non-guard slot). Drains the r12 stale-ladder remainder, but\n",
    "    # leads with the six queries whose BEHAVIOR changed in r12/r13\n",
    "    # (HITS numpy tier + r13 overflow guard, pagerank_det one-exchange\n",
    "    # deg fusion, textrank via pagerank_intexact, LPA NULL-weight\n",
    "    # semantics x2, token_lang_mi domain fix) ahead of the mechanical\n",
    "    # staleness order — see tools/rotate_window_r13.py for the\n",
    "    # kernel-change protocol this codifies. The ~15-row remainder\n",
    "    # waits in _BACKLOG; check_oracle re-verifies all 352 registered\n",
    "    # queries locally every round.\n",
]
for new, (old, _) in zip(INCOMING, displaced):
    header.append(f"    # {new} -> displaces {old} (r12-green)\n")

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
    "    # --- round-12 green, displaced by the r13 rotation (all hold a\n",
    "    # CORRECTNESS_r12.json full-oracle PASS) ---\n",
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
    "displaced", len(displaced), "; reused in place",
    len([n for n, _ in window_entries if n in INCOMING]),
)
