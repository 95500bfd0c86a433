"""One-shot round-8 window rotation for queries/registry.py.

VERDICT r7 item 1: drive the never-graded backlog to ZERO. The 44
non-guard slots become:
  1-35  the 35 remaining never-driver-graded full-oracle entries
        (tools/backlog_report.py order at round-8 start),
  36-38 re-grades of the 3 multimodal entries whose only driver rows are
        r2-era `no_oracle` (full oracles since r3, never re-graded),
  39-44 the 6 stale re-grades declared in registry.INTENTIONAL_REGRADES
        (green rows predating the r6/r7 integer-widening rewrites).
The 6-slot streaming guard stays. The 44 displaced round-7 entries (all
CORRECTNESS_r07.json full-oracle PASS) move to the top of _BACKLOG; the
promoted re-grades are removed from their old _BACKLOG sections.
Run once from the repo root; idempotence is NOT attempted — check git
diff afterwards.
"""

import re
from pathlib import Path

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.queries.registry import STREAMING_GUARD

REG = Path("hadoop_data_lake_spark/queries/registry.py")

GUARD = list(STREAMING_GUARD)

# The 35 never-graded full-oracle entries, tools/backlog_report.py order
# at round-8 start (== registry backlog order).
NEVER_GRADED = [
    "pca_top_component", "activity_streak_histogram", "brand_cf_similarity",
    "duplicate_invoice_screen", "user_cf_recommendations",
    "seasonal_naive_backtest", "token_npmi_pairs", "mm1_wait_estimate",
    "k_anonymity_audit", "shipping_latency_sla",
    "referential_integrity_audit", "ks_test_variants",
    "odds_ratio_conversion", "winsorized_value_stats",
    "max_drawdown_daily_revenue", "markov_entropy_rate", "fano_burstiness",
    "adstock_attribution", "forecast_bakeoff", "ngram_novelty_curve",
    "discount_elasticity", "order_cycle_percentiles",
    "new_vs_returning_daily", "kaplan_meier_by_variant",
    "weekday_seasonality_index", "price_dispersion_by_brand",
    "anova_eta_squared", "type_comovement_matrix", "order_backlog_aging",
    "revenue_waterfall", "supplier_customer_dependency",
    "sample_representativeness_audit", "value_tail_ratio",
    "first_touch_attribution", "user_activity_histogram",
]

# Re-grades (must equal registry.INTENTIONAL_REGRADES): oracle-upgraded
# multimodal trio first, then the stale-ladder six.
REGRADES = [
    "multimodal_decode_features", "multimodal_resize", "multimodal_frames",
    "dedup_minhash_lsh", "ann_brute_force", "value_outliers_zscore",
    "user_value_twap", "rolling_zscore_anomaly", "gini_customer_revenue",
]

INCOMING = NEVER_GRADED + REGRADES
assert len(INCOMING) == 44, len(INCOMING)

text = REG.read_text()
lines = text.splitlines(keepends=True)

ENTRY_RE = re.compile(r'^    "(\w+)": QuerySpec\(')


def region(varname):
    start = next(i for i, l in enumerate(lines) if l.startswith(varname + ":"))
    end = next(i for i in range(start + 1, len(lines)) if lines[i].rstrip() == "}")
    return start, end


w_start, w_end = region("_WINDOW")
b_start, b_end = region("_BACKLOG")
assert w_end < b_start

window_entries = []  # (name, line)
for i in range(w_start + 1, w_end):
    m = ENTRY_RE.match(lines[i])
    if m:
        window_entries.append((m.group(1), lines[i]))
displaced = [(n, l) for n, l in window_entries if n not in GUARD]
guard_lines = [l for n, l in window_entries if n in GUARD]
assert len(displaced) == 44, len(displaced)
assert len(guard_lines) == 6

backlog_lines = lines[b_start + 1 : b_end]
promoted = {}
kept_backlog = []
for l in backlog_lines:
    m = ENTRY_RE.match(l)
    if m and m.group(1) in INCOMING:
        promoted[m.group(1)] = l
    else:
        kept_backlog.append(l)
missing = [n for n in INCOMING if n not in promoted]
assert not missing, missing

incoming_lines = [promoted[n] for n in INCOMING]

header = [
    "    # ---- ROUND-8 WINDOW -------------------------------------------------\n",
    "    # VERDICT r7 items 1+7: the backlog goes to ZERO. Slots 1-35 grade\n",
    "    # the 35 remaining NEVER-driver-graded full-oracle entries (exactly\n",
    "    # tools/backlog_report.py order at round-8 start); slots 36-38\n",
    "    # re-grade the multimodal trio whose only driver rows are r2-era\n",
    "    # no_oracle checks (full oracles since r3, COVERAGE.md 'Multimodal\n",
    "    # oracle upgrade'); slots 39-44 re-grade the stale-ladder six whose\n",
    "    # green rows predate the r6/r7 integer-widening rewrites (declared\n",
    "    # in INTENTIONAL_REGRADES above — `backlog_report.py --assert`\n",
    "    # enforces that every non-guard repeat is on that list). After this\n",
    "    # window grades, never-graded full-oracle entries = 0. Every\n",
    "    # displaced entry holds a CORRECTNESS_r07.json full-oracle PASS and\n",
    "    # moves to the top of _BACKLOG; check_oracle re-verifies all 352\n",
    "    # registered queries locally every round. r8 displacement pairs:\n",
]
for new, (old, _) in zip(INCOMING, displaced):
    header.append(f"    # {new} -> displaces {old} (r7-green)\n")

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
    "    # --- round-7 green, displaced by the r8 rotation (all hold a\n",
    "    # CORRECTNESS_r07.json full-oracle PASS) ---\n",
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
print("rotated: window", len(incoming_lines) + len(guard_lines), "entries;",
      "displaced", len(displaced))
