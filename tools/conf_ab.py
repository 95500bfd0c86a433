"""Paired A/B harness for runtime SQLConf experiments (r15 optimization).

Motivation (spark_optimization_guide §1.1/§3.1/§2.3): after 14 rounds the
per-query algorithms are measured floors; the remaining levers are
session-level planner/runtime confs (join strategy preference, shuffle
codec, advisory partition size). Those affect EVERY query, so a change
must be measured across the bench set, paired against the baseline in the
SAME session so box drift and JIT state cancel.

Protocol: one session, full sf0.01 warmup of the probed queries under BOTH
conf settings (so codegen/JIT for both plan shapes is paid before timing),
then per query alternate B/A/B/A... reps and keep the per-setting MIN.
Runtime confs are snapshot/restored around each rep; AQE re-plans per
execution so a runtime `spark.conf.set` changes the executed plan.

Usage:
    python tools/conf_ab.py <conf=k:v[,k:v...]> [query ...]
e.g.
    python tools/conf_ab.py \
        'spark.sql.join.preferSortMergeJoin:false,spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold:64m' \
        q9_product_profit q21_waiting_suppliers

With no query args, probes the default join-heavy panel below.
Prints one line per query: name, A best, B best, B/A ratio; then totals.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_data_lake_spark.core.session import get_spark
from hadoop_data_lake_spark.queries.registry import REGISTRY

# Join/shuffle-heavy bench queries: every SMJ/SHJ-eligible shape in the
# frozen headline plus the heaviest extras (r14 bench_detail ordering).
DEFAULT_PANEL = [
    "zone_report",
    "q3_order_revenue",
    "q5_nation_revenue",
    "q9_product_profit",
    "q10_returned_item_revenue",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "dedup_clusters_minhash",
    "decontaminate_ngram_overlap",
    "embedding_near_dup",
    "coactivity_triangles",
    "pagerank_det",
    "er_golden_record",
    "bm25_retrieval",
    "brand_communities_lpa",
    "decontaminate_minhash_cross",
    "ivm_join_delta",
    "incremental_orders_agg",
    "ann_ivf_kmeans",
    "perplexity_filter",
    "doc_lm_perplexity",
    "chunk_text_windows",
    "user_value_interpolate",
    "textrank_keywords",
    "cluster_safe_split_audit",
]

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))


def parse_conf(spec: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in spec.split(","):
        k, _, v = part.partition(":")
        if not k or not v:
            raise SystemExit(f"bad conf spec segment: {part!r}")
        out[k.strip()] = v.strip()
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    conf_b = parse_conf(sys.argv[1])
    names = sys.argv[2:] or DEFAULT_PANEL
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.01"

    spark = get_spark("conf_ab")
    baseline = {k: spark.conf.get(k, None) for k in conf_b}

    def apply(setting: dict[str, str | None]) -> None:
        for k, v in setting.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # Warm both plan shapes at sf0.01.
    for setting in (conf_b, baseline):
        apply(setting)
        for name in names:
            try:
                REGISTRY[name].fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    apply(baseline)

    tot_a = tot_b = 0.0
    print(f"# conf B = {conf_b}")
    print(f"# panel of {len(names)} queries at {sf_dir}, best-of-{REPS} paired reps")
    for name in names:
        best = {"A": float("inf"), "B": float("inf")}
        for _ in range(REPS):
            for tag, setting in (("B", conf_b), ("A", baseline)):
                apply(setting)
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).count()
                best[tag] = min(best[tag], time.perf_counter() - t0)
        apply(baseline)
        tot_a += best["A"]
        tot_b += best["B"]
        print(
            f"{name:36s} A={best['A']:7.3f}  B={best['B']:7.3f}  "
            f"B/A={best['B'] / best['A']:5.3f}"
        )
    print(f"{'TOTAL':36s} A={tot_a:7.3f}  B={tot_b:7.3f}  B/A={tot_b / tot_a:5.3f}")


if __name__ == "__main__":
    main()
