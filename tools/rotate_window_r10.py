"""One-shot round-10 window rotation for queries/registry.py.

VERDICT r9 item 2: rotate the window to the complete genuine stale
ladder. All 44 non-guard slots are declared re-grades, in
`tools/backlog_report.py --stale` order at round-10 start (after the
r10 control re-baseline commits and the untracked-file mtime fix):
slots 1-44 are the 44 most-stale green rows; 48 exist, so the 4
NEWEST-stale (semdedup_prune, doc_fingerprint,
decontaminate_ngram_overlap, stream_topk_types_per_window — re-dated
only hours ago by the r10 fact-rescan commit through the shared
dedup/similarity operators) spill to round 11. ann_ivf_kmeans (oldest
row, r2, rows-only) is included per VERDICT r9 — the driver row
re-dates it off the ladder; its recall pytest stays the real
verification. The 6-slot streaming guard stays. The 44 displaced
round-9 entries (all CORRECTNESS_r09.json full-oracle PASS) move to
the top of _BACKLOG. INCOMING must equal registry.INTENTIONAL_REGRADES
(asserted below). Run once from the repo root; idempotence is NOT
attempted — check git diff afterwards.
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

# `backlog_report.py --stale` order at round-10 start (most stale first).
INCOMING = [
    "embedding_near_dup", "dedup_clusters_minhash", "zone_report",
    "ann_ivf_kmeans", "halves_activity_nullsafe",
    "decontaminate_minhash_cross", "winnow_overlap_pairs",
    "session_type_pmi", "kmv_distinct_users", "dedup_jaccard_prefix",
    "customer_rfm_segments", "sequential_funnel",
    "cluster_safe_split_audit", "pareto_8020_customers",
    "mutual_nn_bitext_pairs", "media_phash_near_dup", "cf_ndcg_backtest",
    "lorenz_curve_points", "zipf_fit_tokens", "textrank_keywords",
    "kcore_purchase_graph", "hits_hubs_authorities",
    "brand_communities_lpa", "minhash_eval_pr", "knn_label_eval",
    "t_closeness_audit", "decontamination_report", "lpa_modularity",
    "corpus_report_card", "observed_scan_metrics",
    "quantile_forecast_pinball", "haar_energy_daily",
    "churn_label_windows", "newsvendor_brand_quantiles",
    "dedup_minhash_lsh", "kmv_week_overlap", "seasonal_naive_backtest",
    "ngram_novelty_curve", "adstock_attribution", "forecast_bakeoff",
    "type_comovement_matrix", "fano_burstiness", "coactivity_triangles",
    "user_proximity_pairs",
]

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
    "    # ---- ROUND-10 WINDOW ------------------------------------------------\n",
    "    # Every non-guard slot is a DECLARED re-grade (all 44 in\n",
    "    # INTENTIONAL_REGRADES above; `backlog_report.py --assert`\n",
    "    # enforces the declaration). Slots 1-44: the COMPLETE genuine\n",
    "    # stale ladder in `backlog_report.py --stale` order at round-10\n",
    "    # start — topped by the r10 control re-baseline family\n",
    "    # (zone_report / embedding_near_dup / the minhash operators /\n",
    "    # decontamination_report, all restructured to single-pass plans\n",
    "    # this round) and the r2-r8 cohort below it. 48 stale rows exist;\n",
    "    # the 4 newest-stale spill to round 11 (see INTENTIONAL_REGRADES\n",
    "    # comment). Every displaced entry holds a CORRECTNESS_r09.json\n",
    "    # full-oracle PASS and moves to the top of _BACKLOG; check_oracle\n",
    "    # re-verifies all 352 registered queries locally every round.\n",
    "    # r10 displacement pairs:\n",
]
for new, (old, _) in zip(INCOMING, displaced):
    header.append(f"    # {new} -> displaces {old} (r9-green)\n")

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
    "    # --- round-9 green, displaced by the r10 rotation (all hold a\n",
    "    # CORRECTNESS_r09.json full-oracle PASS) ---\n",
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
