"""One-shot round-7 window rotation for queries/registry.py.

Moves the 44 non-guard round-6 window entries to the top of _BACKLOG,
promotes the 43 oldest never-graded backlog entries plus the new
ann_ivf_det into the window, and writes the displacement-pair comment.
Run once from the repo root; idempotence is NOT attempted — check git
diff afterwards.
"""

import re
from pathlib import Path

REG = Path("hadoop_data_lake_spark/queries/registry.py")

GUARD = [
    "stream_windowed_counts",
    "stream_session_stats",
    "stream_running_max",
    "stream_enriched_value",
    "stream_attribution_pairs",
    "stream_attribution_left",
]

# 43 oldest never-graded (tools/backlog_report.py order at round-7 start).
INCOMING = [
    "neyman_allocation_plan", "lang_id_confusion", "hash_collision_audit",
    "decayed_user_value", "markov_trigram_entropy", "woe_value_bins",
    "churn_label_windows", "isotonic_calibration_bins", "user_sequence_edit_nn",
    "lang_id_cohens_kappa", "daily_revenue_changepoint",
    "newsvendor_brand_quantiles", "ts_delta_compression_estimate",
    "eb_shrunk_conversion", "laspeyres_price_index", "sprt_conversion_monitor",
    "croston_intermittent_forecast", "semdedup_silhouette",
    "circular_hour_stats", "kendall_tau_daily", "haar_energy_daily",
    "jackknife_daily_mean", "chapman_population_estimate",
    "decontamination_report", "mann_whitney_variants", "dau_mau_stickiness",
    "hhi_brand_concentration", "token_lang_mi", "length_bias_auc",
    "token_run_lengths", "blocklist_filter", "user_series_sax_similarity",
    "lake_table_profile", "zonemap_integrity_audit", "user_value_gcd",
    "l_diversity_audit", "activity_tail_hill", "kmv_week_overlap",
    "monthly_from_daily_mv", "user_type_share_map", "quantile_forecast_pinball",
    "ols_weekend_effect", "conformal_value_interval",
]

ANN_LINE = (
    '    "ann_ivf_det": QuerySpec(NS.ann_ivf_det, NS.ANN_IVF_DET_SQL, '
    '("ann", "ivf", "deterministic", "integer-exact")),\n'
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

incoming_lines = [promoted[n] for n in INCOMING] + [ANN_LINE]
pair_names = INCOMING + ["ann_ivf_det"]

header = [
    "    # ---- ROUND-7 WINDOW -------------------------------------------------\n",
    "    # VERDICT r6 items 1+7: all 44 non-guard slots again grade NEVER-\n",
    "    # driver-graded full-oracle entries — the 43 OLDEST backlog entries\n",
    "    # (tools/backlog_report.py order at round-7 start) plus the new\n",
    "    # ann_ivf_det (the one ANN tier that lacked a deterministic full-\n",
    "    # oracle sibling; ann_lsh_det/ann_pq_det precedent). Never-graded\n",
    "    # after this window grades: 35 (pca_top_component + 34 younger" "\n",
    "    # entries) — one more rotation clears the backlog entirely. Every\n",
    "    # displaced entry holds a CORRECTNESS_r06.json full-oracle PASS and\n",
    "    # moves to the top of _BACKLOG; check_oracle re-verifies all 352\n",
    "    # registered queries locally every round. r7 displacement pairs:\n",
]
for new, (old, _) in zip(pair_names, displaced):
    header.append(f"    # {new} -> displaces {old} (r6-green)\n")

guard_comment = [
    "    # --- streaming regression guard (6): streaming silently broke at\n",
    "    # r2 HEAD; these keep every micro-batch/watermark/stream-join path\n",
    "    # under the driver gate ---\n",
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
    "    # --- round-6 green, displaced by the r7 rotation (all hold a\n",
    "    # CORRECTNESS_r06.json full-oracle PASS) ---\n",
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
