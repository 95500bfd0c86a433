"""Iterative graph operators: connected components for dedup clustering.

A dedup pipeline ends by collapsing near-duplicate PAIRS (minhash/simhash/
cosine edges) into CLUSTERS and electing one representative per cluster —
that's connected components. Spark has no built-in; this is the standard
small-label-propagation loop on DataFrames:

    label(v) := min(label(v), min(label(u) for u adjacent))  until fixpoint

Each iteration is one shuffle (groupBy on vertex). Convergence is detected
with an aggregate count of changed labels. `localCheckpoint` truncates the
lineage each round — without it the plan doubles per iteration and the
driver dies long before the data does. Iterations are bounded by the graph
diameter, which for dedup clusters is tiny (near-dup clusters are dense);
`max_iter` guards pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation hit max_iter with labels still changing."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is undirected input (each pair once is fine). Vertices appear in
    the output iff they appear in some edge.

    Min-label propagation needs up to effective-diameter iterations; if the
    loop exhausts `max_iter` with labels still moving the result would be
    silently WRONG (components split). strict=True (default) raises
    ConvergenceError instead; strict=False returns the partial labels for
    callers that genuinely want bounded-effort clustering.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once; self-loops drop out of min-propagation naturally.
    # localCheckpoint: `sym` is joined TWICE PER ITERATION — without
    # truncation the whole upstream pair pipeline (e.g. the minhash LSH
    # candidate generation) re-executes every round. The edge list is tiny
    # relative to the corpus, so materializing it is the cheap side of the
    # trade (measured 7.2s -> ~3s on dedup_clusters_minhash at sf0.1).
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iter):
        # candidate label for v: min over neighbors' current labels
        neighbor_min = (
            sym.join(labels.withColumnsRenamed({"v": "b", "comp": "n_comp"}), on="b")
            .groupBy("a")
            .agg(F.min("n_comp").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min.withColumnRenamed("a", "v"), on="v", how="left")
            .select(
                "v",
                F.least(F.col("comp"), F.coalesce(F.col("n_min"), F.col("comp"))).alias("comp"),
                (F.col("n_min") < F.col("comp")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.where(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    if changed != 0 and strict:
        raise ConvergenceError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (component diameter exceeds the bound); raise max_iter "
            "or pass strict=False for best-effort labels"
        )
    return labels.select(F.col("v").alias("vertex"), F.col("comp").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Collapse near-dup pairs into clusters: (doc, cluster_rep, cluster_size).

    cluster_rep = min doc id in the component (deterministic election)."""
    comp = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, on="component")
        .select(
            F.col("vertex").alias("doc"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(vertex, rank) by power iteration over a directed edge list.

    Spark-first shape: each iteration is one equi-join (edge src -> current
    rank) + one aggregation on dst — the distributed sparse mat-vec. Dangling
    mass (sinks with no out-edges) is redistributed uniformly, so ranks sum
    to 1 every iteration. Ranks are localCheckpoint-ed per round: without
    lineage truncation round N re-executes rounds 1..N-1 (the same lesson as
    connected_components). Convergence is an L1-delta driver check (one tiny
    agg per round — the k-means mini-state pattern).

    At 100 TB the join shuffles on src and the agg on dst; pre-partitioning
    the edge list by src keeps the per-iteration shuffle to the rank table
    (|V| rows), not the edges.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges+degree are reused every iteration: materialize once
    contrib_base = e.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contribs = (
            contrib_base.join(ranks, F.col("src") == F.col("v"))
            .select("dst", (F.col("rank") / F.col("deg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("in_mass"))
        )
        # dangling mass = 1 - mass that flowed along edges
        flowed = (
            ranks.join(out_deg, F.col("v") == F.col("src"), "left_semi")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        dangling = 1.0 - flowed
        new_ranks = (
            nodes.join(contribs, F.col("v") == F.col("dst"), "left")
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            ranks.select("v", F.col("rank").alias("old"))
            .join(new_ranks, "v")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta <= tol:
            break
    return ranks.select(F.col("v").alias("vertex"), "rank")


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list.

    The standard distributed formulation: canonicalize each edge to
    (lo, hi), dedup, then enumerate each triangle exactly once as the
    ordered wedge a<b<c closed by edge (a, c) — two equi-joins, no theta
    join. Per-vertex counts come from exploding each found triangle to its
    three corners. At 100 TB the cost driver is wedge count (sum deg^2);
    pre-filtering high-degree hub vertices (or the degree-ordered variant)
    bounds it — documented trade, not needed at this corpus's density.
    """
    lo, hi = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    # localCheckpoint: `e` feeds THREE join branches; without truncation the
    # whole upstream edge derivation (e.g. a co-activity self-join over the
    # fact table) re-executes per branch — measured 6 scans, 0 reused
    # exchanges. The canonical edge list is the small side of that trade
    # (same reasoning as connected_components above).
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e_ab = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e_bc = e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    e_ac = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tris = e_ab.join(e_bc, "tb").join(e_ac, ["ta", "tc"])
    corners = tris.select(
        F.explode(F.array("ta", "tb", "tc")).alias("vertex")
    )
    return corners.groupBy("vertex").agg(F.count("*").alias("n_triangles"))
