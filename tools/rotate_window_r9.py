"""One-shot round-9 window rotation for queries/registry.py.

VERDICT r7 item 7 ladder, continued: the never-graded backlog hit ZERO
in round 8, so every non-guard slot is now a DECLARED re-grade. The 44
non-guard slots become:
  1-35  the 35 stale green rows (query/oracle code changed AFTER their
        newest driver row), exactly `tools/backlog_report.py --stale`
        order at round-9 start — includes the round-9 densification
        fixes (autocorr/OLS/Theil-Sen daily trends),
  36-44 the 9 most-stale additional rows surfaced by the round-9
        CROSS-MODULE attribution hop (operators/functions rewrites now
        re-date the queries that call them); all full-oracle. The ~12
        below-the-fold remainder is round-10's ladder.
The 6-slot streaming guard stays. The 44 displaced round-8 entries (all
CORRECTNESS_r08.json full-oracle PASS) move to the top of _BACKLOG; the
promoted re-grades are removed from their old _BACKLOG sections.
INCOMING must equal registry.INTENTIONAL_REGRADES (asserted below).
Run once from the repo root; idempotence is NOT attempted — check git
diff afterwards.
"""

import re
from pathlib import Path

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.queries.registry import (
    INTENTIONAL_REGRADES,
    STREAMING_GUARD,
)

REG = Path("hadoop_data_lake_spark/queries/registry.py")

GUARD = list(STREAMING_GUARD)

# Slots 1-35: tools/backlog_report.py --stale order at round-9 start.
STALE_LADDER = [
    "value_moments_profile", "autocorr_daily_value",
    "target_encode_event_type", "bootstrap_mean_ci", "ols_daily_trend",
    "value_psi_drift", "theil_sen_daily_trend", "benjamini_hochberg_fdr",
    "source_mmd_hashed", "self_join_skew_profile", "ipw_outcome_estimate",
    "cuped_adjusted_lift", "quantile_sample_det", "ols_weekend_effect",
    "dedup_ngram_jaccard", "semdedup_silhouette", "length_bias_auc",
    "activity_tail_hill", "degree_assortativity", "ab_test_welch",
    "woe_value_bins", "neyman_allocation_plan", "mann_whitney_variants",
    "kendall_tau_daily", "jackknife_daily_mean", "eb_shrunk_conversion",
    "conformal_value_interval", "daily_revenue_changepoint",
    "rrf_hybrid_retrieval", "rdd_value_threshold", "covariate_balance_smd",
    "ann_ivf_det", "span_dedup_corpus", "perplexity_filter",
    "dedup_containment",
]

# Slots 36-44: the 9 most-stale full-oracle rows the cross-module
# attribution hop surfaced (ladder order; ann_ivf_kmeans skipped —
# rows-only, its real verification is the recall pytest).
CROSS_MODULE = [
    "stream_sliding_counts", "stream_dedup_keys", "pack_sequences_plan",
    "export_shuffle_shards", "order_price_deciles", "curriculum_order",
    "purchase_attribution_asof", "pagerank_det", "stream_upsert_scd1",
]

INCOMING = STALE_LADDER + CROSS_MODULE
assert len(INCOMING) == 44, len(INCOMING)
assert set(INCOMING) == set(INTENTIONAL_REGRADES), (
    set(INCOMING) ^ set(INTENTIONAL_REGRADES)
)

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
    "    # ---- ROUND-9 WINDOW -------------------------------------------------\n",
    "    # The never-graded backlog is ZERO (round 8), so every non-guard\n",
    "    # slot is a DECLARED re-grade (all 44 in INTENTIONAL_REGRADES\n",
    "    # above; `backlog_report.py --assert` enforces the declaration).\n",
    "    # Slots 1-35 drive the stale ladder (VERDICT r7 item 7): green\n",
    "    # rows whose query/oracle code changed AFTER their newest driver\n",
    "    # row, in `backlog_report.py --stale` order at round-9 start —\n",
    "    # including the round-9 densification fixes (autocorr/OLS/\n",
    "    # Theil-Sen daily trends). Slots 36-44: the 9 most-stale rows the\n",
    "    # round-9 CROSS-MODULE attribution hop surfaced. Every displaced\n",
    "    # entry holds a CORRECTNESS_r08.json full-oracle PASS and moves to\n",
    "    # the top of _BACKLOG; check_oracle re-verifies all 352 registered\n",
    "    # queries locally every round. r9 displacement pairs:\n",
]
for new, (old, _) in zip(INCOMING, displaced):
    header.append(f"    # {new} -> displaces {old} (r8-green)\n")

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
    "    # --- round-8 green, displaced by the r9 rotation (all hold a\n",
    "    # CORRECTNESS_r08.json full-oracle PASS) ---\n",
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
