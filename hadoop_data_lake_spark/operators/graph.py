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
