"""One-shot round-11 window rotation for queries/registry.py.

VERDICT r10 items 2+3: rotate the window to the complete genuine stale
ladder as measured at round-11 close (41 entries — the round-11
single-pass/driver-tier commits re-dated far more than the 11 the r10
verdict projected), fill the remaining 3 non-guard slots with the three
OLDEST green rows (CORRECTNESS_r01, alphabetical — deterministic
re-confirmations), keep the 6-slot streaming guard. Rows-only queries
are excluded from the ladder by tools/backlog_report.stale_ladder
(VERDICT r10 item 3) so every graded slot carries a value hash.

Unlike the r10 rotation, INCOMING may overlap the current window (the
round-11 perf work touched many freshly-graded r10 queries); window
lines are reused in place, only the non-incoming remainder is displaced
to the top of _BACKLOG. The INTENTIONAL_REGRADES block is rewritten to
exactly the new 44-entry set. Run once from the repo root; idempotence
is NOT attempted — check git diff afterwards.
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

RECONFIRM = [
    "cheapest_line_per_part",
    "customer_order_ranks",
    "customers_with_orders",
]

ladder = [n for _, n, _ in stale_ladder()]
assert len(ladder) == 41, (len(ladder), ladder)
INCOMING = ladder + RECONFIRM
assert len(INCOMING) == 44, len(INCOMING)
assert len(set(INCOMING)) == 44
for n in INCOMING:
    assert REGISTRY[n].oracle is not None, n  # every slot hash-verified
    assert n not in GUARD, n

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
    "    # ---- ROUND-11 WINDOW ------------------------------------------------\n",
    "    # Every non-guard slot is a DECLARED re-grade (all 44 in\n",
    "    # INTENTIONAL_REGRADES above; `backlog_report.py --assert`\n",
    "    # enforces the declaration, and rows-only queries can no longer\n",
    "    # occupy a non-guard slot — VERDICT r10 item 3). Slots 1-41: the\n",
    "    # COMPLETE genuine stale ladder in `backlog_report.py --stale`\n",
    "    # order at round-11 close — the round's single-pass restructuring\n",
    "    # (cms/tf-idf/doc-lm/containment/cohorts/laspeyres/snapshot-diff/\n",
    "    # basket), the general-graph driver tier family (textrank, LPA,\n",
    "    # pagerank), and the r2-r9 cohort beneath. Slots 42-44: the three\n",
    "    # OLDEST green rows (CORRECTNESS_r01, alphabetical) as\n",
    "    # re-confirmations — no newer stale row exists. Every displaced\n",
    "    # entry holds a CORRECTNESS_r10.json full-oracle PASS and moves to\n",
    "    # the top of _BACKLOG; check_oracle re-verifies all 352 registered\n",
    "    # queries locally every round.\n",
]
for new, (old, _) in zip(INCOMING, displaced):
    header.append(f"    # {new} -> displaces {old} (r10-green)\n")

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
    "    # --- round-10 green, displaced by the r11 rotation (all hold a\n",
    "    # CORRECTNESS_r10.json full-oracle PASS) ---\n",
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
