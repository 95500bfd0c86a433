"""100x scale probe of the frozen flagships (VERDICT r6 item 8): extend
the bench scale tier's 1x/10x curves to 100x of the sf0.01 base (~sf1) for
the four named flagship operators — pagerank_10r, minhash_lsh_pairs,
zone_report, sessionize_events. Best-of-2 per point (the tier's warm-rep
rule); corpus synthesis is localCheckpoint'ed OUTSIDE the timed region.

Run alone (concurrent harness runs triple timings on this box):

    python tools/scale_probe_100x.py

Prints one JSON document; paste the summary into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: scaled-frame generators + op thunks
from hadoop_data_lake_spark.core.session import get_spark

MULTS = [1, 10, 100]
BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")

# Log-n-scaled LSH parameters for the cosine_near_dup scaled curve:
# (num_bands, bits_per_band) per corpus multiplier. Derivation at
# threshold 0.95 (per-bit match prob p = 1 - acos(.95)/pi = .899):
#   recall >= 1 - (1 - p^R)^B     unrelated-collision ~ B / 2^R
#   1x  (8, 8):   recall 98.8%, collisions ~3.1%   (the shipped default)
#   10x (12, 12): recall 98.0%, collisions ~0.29%
#   100x (24, 16): recall 99.2%, collisions ~0.037%
# Per-bucket occupancy stays roughly flat, so the candidate set stays
# near-linear in n — the fixed-parameter curve alongside it shows the
# quadratic escape when the bucket space is left to saturate.
LSH_SCALED = {1: (8, 8), 10: (12, 12), 100: (24, 16)}

# Same timing law for the SRP top-k path (candidates/query ~ tables * n /
# 2^bits, and the query set is a fixed FRACTION of the corpus, so total
# work is quadratic in n unless 2^bits scales with n) — BUT measured
# recall shows bucket-scaling is the WRONG lever for top-k: a query's
# true neighbors sit at mid-cosine (p ~ 0.65 per bit on this corpus, vs
# 0.899 at the near-dup 0.95 threshold), so per-table recall p^bits
# collapses exponentially as bits rise (measured recall@5 at 10x: 0.096
# fixed (4,8) -> 0.036 scaled (6,11); even the 1x real-corpus fixed
# recall is ~0.10 — the srp_int tier's value is DETERMINISM, not recall).
# The production top-k scale path is IVF below: cells partition the space
# (occupancy n/cells), nprobe — a LINEAR knob — governs recall, and
# nlist ~ sqrt(n) is standard practice (also keeps the centroid literal
# tree under the janino 64 KB codegen limit).
TOPK_SCALED = {1: (4, 8), 10: (6, 11), 100: (8, 15)}

# IVF (n_cells, nprobe) per multiplier: nlist ~ sqrt(n), nprobe rising so
# the probed fraction (nprobe/cells) shrinks while absolute recall holds.
IVF_SCALED = {1: (8, 2), 10: (25, 3), 100: (80, 4)}


def _scaled_embeddings_orth(spark, base_dir: str, mult: int):
    """Embeddings replicated `mult`x under a PER-COPY deterministic sign-flip
    mask (diagonal +/-1 = an orthogonal transform): within-copy cosines are
    preserved EXACTLY, so the true near-dup pair set grows linearly with
    mult, while cross-copy cosines scramble to ~0 — bench._scaled_embeddings
    replicates vectors identically, which would hand cosine_near_dup_pairs a
    quadratic TRUE output (every copy-twin is a planted dup: the same
    phantom-super-linear trap _scaled_docs' token masking avoids). Mask
    wt(rep, d) = +1 iff the 60-bit md5 prefix of 'rep|d' is even — the same
    portable hash family as operators/similarity._srp_weights. Synthesis is
    localCheckpoint'ed OUTSIDE the timed region."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.core.io import read_table

    emb = read_table(spark, base_dir, "embeddings").select("vec_id", "embedding")
    if mult > 1:
        rep = spark.range(mult).select(F.col("id").alias("rep"))
        masked = F.expr(
            "transform(embedding, (x, d) -> CASE WHEN "
            "conv(substring(md5(concat(rep, '|', d)), 1, 15), 16, 10) % 2 = 0 "
            "THEN x ELSE -x END)"
        )
        emb = emb.crossJoin(rep).select(
            (F.col("vec_id") * mult + F.col("rep")).alias("vec_id"),
            masked.alias("embedding"),
        )
    return emb.localCheckpoint(eager=True)


def _zone_report_thunk(spark, ev):
    """zone_report over a scaled events frame: same base derivation as the
    registry query (week/month from ts, zone = user % 10) feeding the
    groupingSets builder — the multi-join report flagship."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.pipelines.zone_report import build_zone_report
    from hadoop_data_lake_spark.queries.events_queries import EVENT_TYPES

    base = ev.select(
        F.weekofyear("ts").alias("week"),
        F.month("ts").alias("month"),
        (F.col("user_id") % 10).alias("zone_id"),
        "event_type",
        "ts",
        F.col("user_id").alias("user"),
        F.col("event_id").alias("uid"),
    )
    return lambda: build_zone_report(base, EVENT_TYPES)


def _hits_distributed_thunk(edges):
    """The hits_hubs_authorities fallback shape (two mutual-reinforcement
    rounds, integer rescale, TakeOrdered top-10 per side) over a scaled
    (src, dst) frame — mirrors queries/tpch_queries.hits_hubs_authorities'
    distributed loop so the probe measures the exact above-cap plan."""
    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.operators.graph import broadcast_bounded_state
    from hadoop_data_lake_spark.queries.tpch_queries import _hits_top_sides

    def run():
        e = edges.select(
            F.col("src").alias("c"), F.col("dst").alias("s")
        ).localCheckpoint(eager=True)
        n_c, n_s = e.agg(
            F.countDistinct("c").alias("n_c"), F.countDistinct("s").alias("n_s")
        ).first()

        def rescale(df, n_rows):
            df = df.localCheckpoint(eager=True)
            mx = df.agg(F.max("v").alias("m"))
            scaled = df.crossJoin(F.broadcast(mx)).select(
                df.columns[0], F.expr("v * 1000000 div m").alias("v")
            )
            return broadcast_bounded_state(scaled, n_rows)

        a = rescale(e.groupBy("s").agg(F.count("*").cast("long").alias("v")), n_s)
        h = rescale(e.join(a, "s").groupBy("c").agg(F.sum("v").alias("v")), n_c)
        a = rescale(e.join(h, "c").groupBy("s").agg(F.sum("v").alias("v")), n_s)
        h = rescale(e.join(a, "s").groupBy("c").agg(F.sum("v").alias("v")), n_c)
        return _hits_top_sides(h, a)

    return run


def main() -> None:
    only = set(sys.argv[1:])  # optional op-name filter: probe just these
    spark = get_spark("scale-probe-100x")
    # This probe characterizes the DISTRIBUTED paths' scaling curves; the
    # r11 general-graph driver tier is a bounded-size fast path that by
    # design stops firing above its caps, so leaving it on would splice
    # two regimes into one curve (driver tier at 1x, distributed at 100x).
    from hadoop_data_lake_spark.operators import graph as G

    G.GENERAL_DRIVER_TIER_ENABLED = False
    out: dict[str, dict] = {}
    for mult in MULTS:
        docs = bench._scaled_docs(spark, BASE, mult)
        ev = bench._scaled_events(spark, BASE, mult)
        edges = bench._scaled_edges(spark, BASE, mult)
        emb = _scaled_embeddings_orth(spark, BASE, mult)
        # Assemble only the flagships (the full tier would re-time
        # everything; this probe extends exactly the named curves).
        from hadoop_data_lake_spark.operators import dedup as DD
        from hadoop_data_lake_spark.operators import similarity as SIM
        from hadoop_data_lake_spark.queries import northstar_queries as NSQ
        from hadoop_data_lake_spark.operators.graph import pagerank_intexact
        from hadoop_data_lake_spark.operators.windows import sessionize
        from pyspark.sql import functions as F

        ops = {
            "minhash_lsh_pairs": lambda: DD.minhash_lsh_pairs(
                docs, "doc_id", "text", k=3, num_hashes=16, bands=4, threshold=0.3
            ),
            "pagerank_10r": lambda: pagerank_intexact(edges, iters=10),
            # r14: the HITS DISTRIBUTED loop (tiers are pinned off in
            # this probe) — the r14 fused driver tier bows out above
            # 4M edges, so this curve is the 100 TB path: per-round
            # join + agg + scalar rescale over the bipartite purchase
            # graph. src>=0 / dst<0 in _scaled_edges keeps the sides
            # disjoint, exactly the hits caller's shape.
            "hits_2r_distributed": _hits_distributed_thunk(edges),
            "sessionize_events": lambda: sessionize(
                ev, ["user_id"], "ts", gap_seconds=1800
            )
            .groupBy("user_id", "session_id")
            .count(),
            "zone_report": _zone_report_thunk(spark, ev),
            # r14 (VERDICT r13 item 8): the full cluster op — minhash
            # pairs into two-star connected components. The costliest
            # recurring non-deliberate bench query previously had no
            # 100x point; CC is O(log n) rounds, so the curve should
            # track minhash_lsh_pairs plus a near-constant round count.
            "dedup_clusters": lambda: G.dedup_clusters(
                DD.minhash_lsh_pairs(
                    docs, "doc_id", "text",
                    k=3, num_hashes=16, bands=4, threshold=0.3,
                ).select("doc_a", "doc_b")
            ),
            # r10 addition: the SRP-checkpoint near-dup path (the control
            # re-baseline restructured it). FIXED (8x8) LSH parameters
            # saturate their 8*256-bucket space as n grows — unrelated
            # pairs collide in ~B/2^R ~ 3% of cases, a QUADRATIC term with
            # a small constant that this curve makes visible (measured
            # r100 ~ 101x) — so the probe carries both curves: the fixed
            # default (saturation evidence) and the production answer,
            # (bands, bits) scaled with log n to hold per-bucket occupancy
            # roughly constant while keeping banded recall >= 98% at the
            # 0.95 threshold (B up with R: recall = 1-(1-p^R)^B, p=.899).
            # r15 (VERDICT r14 item 6): the two most expensive recurring
            # non-control bench queries, pre-profiled structurally sound
            # in r14 but missing a 100x point. Both run over the scaled
            # docs corpus.
            #
            # decontaminate_minhash_cross: %13 split of the SCALED corpus
            # (the graded query's own split rule), so the probe side grows
            # linearly with the corpus — the adversarial case for the
            # broadcast-probe-index design (probe index ~ n/13 docs).
            "decontaminate_cross": lambda: DD.minhash_cross_pairs(
                docs.where(F.col("doc_id") % 13 != 0),
                docs.where(F.col("doc_id") % 13 == 0),
                "doc_id", "text",
                k=3, num_hashes=16, bands=4, threshold=0.3,
            ),
            # perplexity_filter: the graded plan verbatim (frame-level
            # core, queries/northstar_queries.perplexity_filter_frame)
            # over the scaled corpus + a deterministic 4-language label
            # (the base corpus's lang column doesn't survive scaling; the
            # label only drives the per-language percentile fan-out, so a
            # fixed-cardinality synthetic label preserves the plan shape).
            "perplexity_filter": lambda: NSQ.perplexity_filter_frame(
                docs.select(
                    "doc_id", "text",
                    F.element_at(
                        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
                        (F.col("doc_id") % 4 + 1).cast("int"),
                    ).alias("lang"),
                )
            ),
            "cosine_near_dup": lambda: SIM.cosine_near_dup_pairs(
                emb, threshold=0.95
            ),
            "cosine_near_dup_scaledlsh": (
                lambda B=LSH_SCALED[mult][0], R=LSH_SCALED[mult][1]:
                SIM.cosine_near_dup_pairs(
                    emb, threshold=0.95, num_bands=B, bits_per_band=R
                )
            ),
            # r11: the scale law promoted into the operator API
            # (similarity.scaled_srp_params via auto_scale=True) — this row
            # must track cosine_near_dup_scaledlsh, not the fixed curve
            "cosine_near_dup_auto": lambda: SIM.cosine_near_dup_pairs(
                emb, threshold=0.95, auto_scale=True
            ),
            # SRP top-k: query set is every 50th vector (a fixed fraction
            # of the corpus, like the registry's _query_set), so fixed
            # buckets make total candidate work quadratic — the scaled
            # variant holds per-bucket occupancy flat.
            "srp_int_topk": lambda: SIM.srp_int_topk(
                emb, emb.where(F.col("vec_id") % 50 == 0), k=5,
                num_tables=4, bits_per_table=8, dim=64,
            ),
            "srp_int_topk_scaledlsh": (
                lambda T=TOPK_SCALED[mult][0], B=TOPK_SCALED[mult][1]:
                SIM.srp_int_topk(
                    emb, emb.where(F.col("vec_id") % 50 == 0), k=5,
                    num_tables=T, bits_per_table=B, dim=64,
                )
            ),
            # the production top-k scale path: learned-centroid IVF with
            # nlist ~ sqrt(n) (see IVF_SCALED derivation above)
            "ivf_topk_scaled": (
                lambda C=IVF_SCALED[mult][0], P=IVF_SCALED[mult][1]:
                SIM.ivf_kmeans_topk(
                    emb, emb.where(F.col("vec_id") % 50 == 0), k=5,
                    n_cells=C, nprobe=P,
                )
            ),
            # r11: scaled_ivf_params via auto_scale=True — tracks the row
            # above (same nlist ~ sqrt(n)/10, log-n nprobe law)
            "ivf_topk_auto": lambda: SIM.ivf_kmeans_topk(
                emb, emb.where(F.col("vec_id") % 50 == 0), k=5,
                auto_scale=True,
            ),
        }
        for name, thunk in ops.items():
            if only and name not in only:
                continue
            best, rows = None, 0
            for _rep in range(2):
                load0 = os.getloadavg()[0]
                t0 = time.perf_counter()
                rows = thunk().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                print(
                    f"# {name} {mult}x: {dt:.3f}s ({rows} rows, load {load0:.2f})",
                    file=sys.stderr,
                )
            out.setdefault(name, {})[f"t{mult}x"] = round(best, 3)
        for f in (docs, ev, edges, emb):
            f.unpersist()
    for name, pts in out.items():
        if pts.get("t1x"):
            pts["r10"] = round(pts["t10x"] / pts["t1x"], 2)
            pts["r100"] = round(pts["t100x"] / pts["t1x"], 2)
    print(json.dumps({"base": BASE, "mults": MULTS, "ops": out}, indent=1))


if __name__ == "__main__":
    main()
