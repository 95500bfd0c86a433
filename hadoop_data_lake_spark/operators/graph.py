"""Iterative graph operators: connected components for dedup clustering.

A dedup pipeline ends by collapsing near-duplicate PAIRS (minhash/simhash/
cosine edges) into CLUSTERS and electing one representative per cluster —
that's connected components. Spark has no built-in; `connected_components`
implements the alternating large-star / small-star algorithm (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC 2014), the same family GraphFrames uses:

    large-star(u): hook every neighbor v > u onto min(N(u) ∪ {u})
    small-star(u): hook every neighbor v < u (and u itself) onto that min

Each operation preserves connectivity, and the alternation converges to a
star forest whose centers are the per-component minimum ids in O(log n)
rounds — versus O(component diameter) for naive min-label propagation,
which stalls on chain-shaped components (span-overlap graphs, transitive
near-dup chains). Each round is two shuffles (a groupBy and a join per
star step). `localCheckpoint` truncates the lineage each round — without
it the plan doubles per iteration and the driver dies long before the
data does. `max_iter` still bounds the loop; 20 covers n ≈ 2^20 at the
proven O(log² n) worst case and far more in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation hit max_iter with labels still changing."""


# Per-vertex iteration state (ranks, labels, frontiers, survivor sets) is
# localCheckpoint-ed every round, and a checkpointed frame scans as
# `Scan ExistingRDD` with NO size statistics — Catalyst therefore can't
# pick it as the broadcast side, and every round's state-x-edges join
# falls back to a SortMergeJoin that re-shuffles the (much larger) edge
# list. Measured on pagerank_det at sf0.1: both sides exchanged, 10
# edge-list shuffles for 10 rounds. When the driver already knows the
# vertex count, hint the broadcast explicitly below this cap; beyond it
# (1e9-vertex graphs at 100 TB) the co-partitioned shuffle formulation
# stands unchanged. 1M rows of (long, long[, long]) is ~24-48 MB — well
# inside executor broadcast budgets, far above every bench graph.
BROADCAST_STATE_MAX_ROWS = 1_000_000

# Row counts alone are blind to row WIDTH: 1M rows of (long, long) is
# ~16 MB, but 1M rows of (long, string-label, array-state) could be
# multi-GB — same row cap, 100x the broadcast. The byte cap below is a
# second gate computed as rows x a conservative per-schema width estimate
# (driver-side, no job); a state frame broadcasts only when it passes
# BOTH caps, so the row-cap semantics every existing caller was tested
# under can only narrow, never widen.
BROADCAST_STATE_MAX_BYTES = 64 * 1024 * 1024

# conservative on-wire width estimates per Spark SQL type; complex /
# variable-length types get deliberately pessimistic defaults because a
# too-small estimate ships an oversized broadcast while a too-large one
# merely falls back to the (always-correct) shuffle formulation.
_FIXED_TYPE_BYTES = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "float": 4,
    "date": 4,
    "long": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def _est_row_bytes(schema) -> int:
    """Pessimistic per-row byte estimate for a broadcast-candidate schema."""
    total = 0
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in _FIXED_TYPE_BYTES:
            total += _FIXED_TYPE_BYTES[t]
        elif t == "decimal":
            total += 16
        elif t == "string":
            total += 48  # id-ish labels in practice; pessimistic for keys
        else:
            # array / map / struct / binary: unbounded payloads have no
            # business inside per-vertex iteration state; price them so a
            # few such columns push a large frame over the byte cap.
            total += 256
    return max(total, 8)

# Driver-collect budget for the layered-graph fast path's per-sink
# out-degree histogram (pagerank_intexact): (sink, src_degree, count)
# triples. 500k rows ~ 15 MB collected — the same order as the ANN probe
# sets and shard plans the driver already holds; beyond it the recurrence
# still runs over the histogram, just distributed (the middle tier).
LAYERED_HIST_MAX_ROWS = 500_000
# general-graph driver tier (round 11): a NON-layered graph whose whole
# edge list fits the driver budget (vocab-bounded word co-occurrence
# graphs — TextRank at ANY corpus scale — small dimension graphs) runs
# all `iters` rounds in exact Python integer arithmetic after ONE collect
# of the already-checkpointed edges: zero per-round Spark jobs instead of
# iters x (join + agg + scalar) — on local[32] that is ~0.35-0.4 s of
# fixed job overhead per round, ~3.5 s for the standard 10 rounds. The
# node cap is checked first (free byproduct of the flags aggregate) so
# big graphs never pay the edge-count job; both caps measured, never
# assumed, and the distributed loop above them is unchanged. Bit-identical
# by construction (the recurrence is integer div/sums, order-independent);
# pinned by tests/test_round11_fixes.py.
GENERAL_DRIVER_MAX_NODES = 200_000
GENERAL_DRIVER_MAX_EDGES = 500_000
GENERAL_DRIVER_TIER_ENABLED = True

# numpy driver tier (round 12): HITS-style recurrences whose per-round
# work is a gather + integer bincount are ~1000x cheaper per edge than
# the pure-Python dict loops above, so they earn a wider edge cap. The
# budget is BYTES, not dict ops: one Arrow collect of (long, long) edges
# is 16 B/edge -> 4M edges = 64 MB on the driver, the same order as the
# broadcast byte budget. Above it the distributed loop stands unchanged
# (the customer x supplier purchase graph saturates at |C| x |S| but
# GROWS with the corpus until then — this tier covers the bench scales
# and bows out exactly where a 1000-executor cluster would want the
# shuffle formulation anyway).
NUMPY_DRIVER_MAX_EDGES = 4_000_000

# Escape hatch for tests (and for callers that want the general loop's
# plan shape regardless of structure): disables BOTH layered tiers.
LAYERED_FAST_PATH_ENABLED = True


def broadcast_bounded_state(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint a bounded per-vertex state frame (see note above).

    Public entry point for query code that checkpoints per-round state
    (e.g. the HITS rescale in queries/tpch_queries.py): checkpointed
    frames scan as ExistingRDD with no stats, so Catalyst can't pick
    them as the broadcast side on its own. Broadcasts only when the
    caller-supplied row count passes the row cap AND the estimated byte
    size (rows x schema width) passes the byte cap; otherwise returns
    the frame unchanged and the shuffle formulation stands.
    """
    if n_rows is None or n_rows < 0 or n_rows > BROADCAST_STATE_MAX_ROWS:
        return df
    if n_rows * _est_row_bytes(df.schema) > BROADCAST_STATE_MAX_BYTES:
        return df
    return F.broadcast(df)


# internal alias kept for the call sites below
_bcast_state = broadcast_bounded_state


def _cc_driver_labels(raw: DataFrame, return_edges: bool = False):
    """Union-find core of the CC driver tier: (vertex -> min reachable
    id) dict over the collected (u, v) pairs, or ``None`` to decline
    (tier disabled upstream; edge count over ``GENERAL_DRIVER_MAX_EDGES``;
    empty input — the distributed path's empty-frame shape is already
    cheap; or u/v are not one shared integral/string type, the types
    whose Spark ordering provably matches Python's — UTF-8 byte order
    preserves code-point order).

    Exactness: union always attaches the larger root under the smaller,
    so every tree's root is the minimum id of its set (singleton base
    case; preserved by each union and by path compression) — the root IS
    `min reachable vertex`, the star loop's fixed point. Duplicates,
    reversed duplicates and self-loops collapse harmlessly.

    ``return_edges=True`` additionally hands back the collected edge
    rows, so a caller that needs a PER-PAIR pass over the same bounded
    pair list (cluster_safe_split_audit's leak audit, r16) folds it into
    this one collect instead of collecting the checkpoint again.
    """
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    ut, vt = raw.schema["u"].dataType, raw.schema["v"].dataType
    orderable = (ByteType, ShortType, IntegerType, LongType, StringType)
    if ut != vt or not isinstance(ut, orderable):
        return None
    n_edges = raw.count()  # cheap: raw is an eager localCheckpoint
    if n_edges == 0 or n_edges > GENERAL_DRIVER_MAX_EDGES:
        return None

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    rows = raw.collect()
    for row in rows:
        u, v = row[0], row[1]
        if u is None or v is None:
            # NULL ids are not orderable against ints/strings in Python —
            # decline (ADVICE r15) so null-carrying pair frames keep the
            # distributed loop's semantics instead of a TypeError.
            return None
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    labels = {x: find(x) for x in parent}
    return (labels, rows) if return_edges else labels


def _cc_driver(raw: DataFrame):
    """Driver tier for `connected_components`: the union-find labels as a
    (vertex, component) DataFrame, or ``None`` when the core declines."""
    from pyspark.sql.types import StructField, StructType

    labels = _cc_driver_labels(raw)
    if labels is None:
        return None
    import pandas as pd

    ut = raw.schema["u"].dataType
    # Arrow path: the row-based createDataFrame pays a fixed ~0.3-0.5 s
    # per call (pickled-row parallelize) vs ~0.17 s for one pandas batch
    # (r15 profile); at the 500k-edge cap the vertex list can reach ~1M
    # rows where the difference is larger still.
    out = pd.DataFrame(
        {
            "vertex": list(labels),
            "component": list(labels.values()),
        }
    )
    return raw.sparkSession.createDataFrame(
        out,
        StructType(
            [StructField("vertex", ut), StructField("component", ut)]
        ),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is undirected input (each pair once is fine; duplicates,
    reversed duplicates, and self-loops are tolerated). Vertices appear in
    the output iff they appear in some edge.

    Alternating large-star / small-star (see module docstring): converges
    in O(log n) rounds regardless of component diameter. If the loop
    exhausts `max_iter` with the edge set still moving the result would be
    silently WRONG (components split). strict=True (default) raises
    ConvergenceError instead; strict=False returns the partial labels for
    callers that genuinely want bounded-effort clustering. `max_iter` /
    `strict` govern the DISTRIBUTED loop only: the r15 driver tier (see
    below) computes the exact fixed point directly, so under the cap it
    returns converged labels regardless of the iteration budget.
    """
    # ONE eager checkpoint of the raw edge list: everything downstream
    # (vertex set, canonical edges, the iteration) derives from the
    # materialized frame, so the upstream pair pipeline (e.g. the minhash
    # LSH candidate generation) executes exactly once — deriving verts and
    # e as separate checkpoints of the un-materialized input ran it twice
    # (measured +1.4s on dedup_clusters_minhash at sf0.1).
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    # DRIVER TIER (round 15): near-dup pair sets are tiny relative to the
    # corpus that produced them (253 pairs at sf0.1 for the minhash
    # family), but the distributed star loop pays 3 shuffles + a
    # fingerprint aggregate PER ROUND plus the verts/canonical-edge
    # exchanges — fixed Spark overhead, not data cost (r14 profile:
    # 0.85 s of dedup_clusters_minhash's 3.0 s). Under the edge cap, one
    # collect of the checkpointed pairs (the count is ~free post-
    # checkpoint, and the upstream pair pipeline ran exactly once at the
    # checkpoint) + exact union-find with min-root election returns the
    # identical (vertex, component = min reachable id) labeling — set
    # semantics, engine-independent, pinned by test against the star
    # loop. Over the cap, or for mixed/unorderable id types, the
    # distributed loop below stands unchanged.
    if GENERAL_DRIVER_TIER_ENABLED:
        labels = _cc_driver(raw)
        if labels is not None:
            return labels
    return _cc_distributed(raw, max_iter=max_iter, strict=strict)


def _cc_distributed(raw: DataFrame, max_iter: int, strict: bool) -> DataFrame:
    """The alternating large-star/small-star loop over an ALREADY
    eagerly-checkpointed (u, v) pair frame — factored out (r16, ADVICE
    r15) so `dedup_clusters`' driver-tier decline path can run it
    directly on its own checkpoint instead of re-entering
    `connected_components` (which would re-checkpoint the materialized
    frame and re-run the tier gate: one extra materialization job plus
    an extra count per over-cap call)."""
    # every input vertex, kept aside so isolated (self-loop-only) vertices
    # still label themselves in the output.
    verts = (
        raw.select(F.col("u").alias("vertex"))
        .unionByName(raw.select(F.col("v").alias("vertex")))
        .distinct()
    )
    # canonical directed edges larger -> smaller, no self-loops; own
    # checkpoint because the loop re-reads it every round.
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _fingerprint(df: DataFrame) -> tuple:
        # one tiny driver agg per round: (row count, order-independent hash
        # sum). Equality across rounds == the star steps are at their fixed
        # point (collision odds are 2^-64-scale — negligible).
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: long-sum of 2^63-scale hashes overflows ANSI mode
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    from pyspark.sql import Window

    # Both star steps are WINDOW-MIN formulations, not groupBy+join: a
    # whole-partition min (no orderBy => no sort) gives each row its
    # neighborhood minimum in ONE exchange, and the star emission is then a
    # pure per-row map — 3 shuffles/round total (sym window, large window,
    # closing distinct) versus 6 for the agg+join draft (measured ~1.7x
    # faster end-to-end on dedup_clusters_minhash at sf0.1).
    w = Window.partitionBy("u")
    converged = e.isEmpty()
    prev = None if converged else _fingerprint(e)
    for _ in range(max_iter):
        if converged:
            break
        # ---- large-star: for each u, hook every strictly-larger neighbor
        # onto m = min(N(u) ∪ {u}). Output edges keep the larger->smaller
        # orientation because v > u >= m. Cross-group duplicate edges are
        # tolerated here; the small-star distinct closes the round.
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        large = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # ---- small-star: edges all point larger -> smaller; for each u,
        # hook every smaller neighbor AND u itself onto m = min(N(u)).
        # Per input row (u, v, m): emit (v, m) — except the row attaining
        # the min itself (v == m), which instead emits (u, m). One output
        # edge per input row, no join, no second pass.
        small = (
            large.withColumn("m", F.min("v").over(w))
            .select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("m").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        e = small.localCheckpoint(eager=True)
        cur = _fingerprint(e)
        converged = cur == prev
        prev = cur
    if not converged and strict:
        raise ConvergenceError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations; raise max_iter or pass strict=False for best-effort "
            "labels"
        )
    # at the fixed point `e` is a star forest larger->root; roots and
    # isolated vertices default to themselves. min() collapses the (only
    # partially hooked) multi-parent case strict=False can leave behind.
    labels = e.groupBy("u").agg(F.min("v").alias("parent"))
    return verts.join(
        labels, verts["vertex"] == labels["u"], "left"
    ).select(
        "vertex",
        F.coalesce(F.col("parent"), F.col("vertex")).alias("component"),
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Collapse near-dup pairs into clusters: (doc, cluster_rep, cluster_size).

    cluster_rep = min doc id in the component (deterministic election)."""
    raw = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).localCheckpoint(eager=True)
    # DRIVER TIER (round 15): when the CC union-find tier fires, the
    # sizes aggregate + join fold into the same driver pass — one local
    # frame out instead of two more small Spark jobs per call.
    if GENERAL_DRIVER_TIER_ENABLED:
        labels = _cc_driver_labels(raw)
        if labels is not None:
            from collections import Counter

            from pyspark.sql.types import LongType, StructField, StructType

            import pandas as pd

            sizes_d = Counter(labels.values())
            ut = raw.schema["u"].dataType
            out = pd.DataFrame(
                {
                    "doc": list(labels),
                    "cluster_rep": list(labels.values()),
                    "cluster_size": [sizes_d[c] for c in labels.values()],
                }
            )
            return raw.sparkSession.createDataFrame(
                out,
                StructType(
                    [
                        StructField("doc", ut),
                        StructField("cluster_rep", ut),
                        StructField("cluster_size", LongType()),
                    ]
                ),
            )
    # raw is already an eager checkpoint and the tier gate above already
    # declined — run the star loop on it directly (r16, ADVICE r15):
    # re-entering connected_components would checkpoint the checkpoint
    # and probe the tier a second time.
    comp = _cc_distributed(raw, max_iter=max_iter, strict=True)
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
    if n == 0:
        # empty edge set (r9 empty-corpus axis): no vertices, no ranks
        return nodes.select(
            F.col("v").alias("vertex"), F.lit(None).cast("double").alias("rank")
        )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges+degree are reused every iteration: materialize once
    contrib_base = e.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contribs = (
            contrib_base.join(_bcast_state(ranks, n), F.col("src") == F.col("v"))
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
            .join(_bcast_state(new_ranks, n), "v")
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


def pagerank_intexact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    scale: int = 10**12,
    damping_pct: int = 85,
    deg_col: str | None = None,
) -> DataFrame:
    """(node, rank_units): power iteration in FIXED-POINT integer arithmetic.

    Float PageRank (`pagerank` above) is rows-only at the correctness gate:
    each iteration sums float contributions, and float addition is not
    associative, so two engines (or two partitionings) legitimately differ
    in the low bits. This variant keeps every quantity a bigint multiple of
    1/scale:

        r0      = scale div n                  (per node)
        contrib = r div out_deg                (per edge, integer div)
        r'      = (15 * (scale div n)) div 100
                  + (85 * (in_sum + dang div n)) div 100

    Integer addition IS associative — partition order cannot change any
    result — and an external SQL engine replays the whole iteration exactly
    (oracle: the same recurrence unrolled as chained CTEs). The truncation
    the integer divisions introduce is deterministic and bounded by
    n*iters/scale total mass, irrelevant for ranking at scale=1e12.

    Shapes per iteration (round-6 tightening — identical integer results,
    fewer exchanges; localCheckpoint does NOT preserve partitioning
    metadata in this Spark version — Scan ExistingRDD reports unknown
    partitioning — so the win comes from restructuring, not exchange
    reuse): the contribution join ships only NON-dangling ranks (a
    dangling node by definition contributes no edge mass — its rank
    enters through the scalar dangling sum — and in a bipartite purchase
    graph that halves the shuffled rank volume), the per-node update is
    a UNION, not a join: nodes with in-edges get their new rank straight
    from the dst-grouped aggregate (whose rows carry the static
    `dst_dang` flag as a grouping key), nodes with zero in-degree (a
    static, checkpointed set; never dangling since they appear as edge
    sources) get the closed-form s=0 rank from the broadcast dangling
    scalar. Per round: the edges-x-ranks join + one groupBy(dst) + a
    one-row filter-aggregate — the previous shape also paid a
    SortMergeJoin against the full node list and re-aggregated
    out-degrees for an anti-join every round. localCheckpoint per round
    so round N never re-executes rounds 1..N-1.

    LAYERED graphs (source and sink sets disjoint — bipartite purchase
    graphs) take a structural fast path: the recurrence collapses onto
    the iteration-invariant per-sink out-degree histogram and runs
    driver-side in exact integer arithmetic (bit-identical results, ONE
    distributed edge pass instead of `iters`); see the inline note.
    """
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if deg_col is not None:
        # Round 13: callers that build their edge list through a
        # src-partitioned exchange anyway (pagerank_det fuses
        # repartition(src) + local dedup + a window count into ONE
        # shuffle) pass the out-degree along each edge row — the operator
        # then skips its own groupBy(src) aggregation AND every
        # out-degree join (hist_df, contrib_base read `deg` straight off
        # the edge). Contract: deg_col must equal the edge multiset's
        # per-src row count, or ranks are silently wrong (pinned by the
        # bit-identity test against the self-computed path). Costs
        # +8 B/edge in the checkpoint; callers with skewed hub sources
        # should keep deg_col=None — the fused window needs every edge
        # of a src on one task, the agg+join shape does not.
        cols.append(F.col(deg_col).cast("long").alias("deg"))
    e = edges.select(*cols).localCheckpoint(eager=True)
    # ONE per-node flags frame (dang = no out-edges; has_in = appears as a
    # destination), checkpointed once. Every driver scalar the operator
    # needs — n, the dangling count, and the layered-structure test — then
    # comes from a SINGLE aggregate job instead of three separate counts
    # (n / n_dang / n_zero; driver-ADVICE r10: non-layered graphs paid two
    # extra detection jobs per call), and the static zero-in-degree set
    # (appear only as sources => have out-edges => never dangling; their
    # per-round rank is closed-form, s = 0) becomes a cheap filter over
    # the materialized frame instead of its own checkpointed anti-join.
    # Round 12: built with ONE shuffle — a side-tagged union aggregated by
    # node (max/min of the tag recover has_out/has_in) — instead of
    # distinct + two stats-less joins, which cost three exchanges and a
    # SortMergeJoin pair per call (profiled 0.65 s of pagerank_det's
    # scaffolding at sf0.1).
    flags = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("s"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("s")))
        .groupBy("node")
        .agg(F.max("s").alias("mx"), F.min("s").alias("mn"))
        .select(
            "node",
            (F.col("mx") == 0).alias("dang"),  # never a source
            (F.col("mn") == 0).alias("has_in"),  # appears as a destination
        )
        .localCheckpoint(eager=True)
    )
    stats = flags.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("dang")).alias("n_dang"),
        # nodes with BOTH in- and out-edges: any such node breaks the
        # layered (pure-source / pure-sink) structure
        F.count_if(F.col("has_in") & ~F.col("dang")).alias("n_mid"),
    ).first()
    n, n_dang, n_mid = stats["n"], stats["n_dang"], stats["n_mid"]
    zero_in = flags.where(~F.col("has_in")).select("node")
    nodes_f = flags.select("node", "dang")
    if deg_col is None:
        # out_deg derives from the checkpointed e (Scan ExistingRDD, no
        # stats), so Catalyst's INITIAL plan SMJ-shuffles every join
        # against it (AQE usually converts it at runtime, so the measured
        # win is the skipped pre-conversion exchange only: A/B best-of-4
        # 2.378 vs 2.491 s on pagerank_det/sf0.1, consistent across
        # reps). Its row count is bounded by n (one row per distinct
        # source), known free from the flags aggregate — hint it through
        # the byte-aware cap; the same hint on triangle_count's wedge
        # joins measured FLAT (AQE's runtime conversion already covered
        # it) and was rejected, see BENCH_NOTES round 12. Over-cap graphs
        # keep the shuffle formulation.
        out_deg = _bcast_state(
            e.groupBy("src").agg(F.count("*").alias("deg")), n
        )
        e_deg = e.join(out_deg, "src")
    else:
        e_deg = e  # deg rides every edge row: no aggregate, no join
    if n == 0:
        # empty edge set (r9 empty-corpus axis): no vertices, no ranks —
        # zero rows, same as the oracle's unrolled CTEs over empty verts
        return nodes_f.select(
            "node", F.lit(None).cast("long").alias("rank_units")
        )
    base = (100 - damping_pct) * (scale // n) // 100

    # LAYERED fast path — src set and dst set disjoint (bipartite
    # source->sink purchase graphs, label->item graphs): then every node
    # is either a pure source (zero in-degree, never dangling: its rank is
    # the same closed-form scalar every round) or a pure sink (all
    # dangling: its in-mass depends on sources only through that scalar),
    # so the whole recurrence collapses onto the per-sink histogram of
    # source out-degrees: rank_sink = base + d%*(sum_deg cnt*(R div deg)
    # + dsum div n) div 100. The histogram is iteration-invariant; when it
    # fits the driver budget the 10 rounds run driver-side in exact Python
    # integer arithmetic (the kmeans mini-state pattern — bit-identical to
    # the distributed loop because bigint div/sums are order-independent)
    # and the distributed work drops to ONE pass over the edges. Detected
    # structurally (no node has both in- and out-edges: n_mid == 0, a
    # free byproduct of the single flags aggregate); self-loops or chains
    # fall through to the general loop below. An over-budget histogram
    # (1e9-sink graphs at 100 TB) takes the MIDDLE tier instead: the same
    # recurrence runs distributed over the checkpointed histogram frame —
    # each round scans (sink, deg, cnt) triples, never the edge list,
    # which at 100 TB is the difference between re-reading ~1e9 histogram
    # rows and ~1e12 edges per round. All three tiers are bit-identical
    # (integer arithmetic; pinned by test).
    if LAYERED_FAST_PATH_ENABLED and iters >= 1 and n_mid == 0 and n_dang > 0:
        hist_df = (
            e_deg.groupBy("dst", "deg")
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        n_hist = hist_df.count()
        if n_hist <= LAYERED_HIST_MAX_ROWS:
            # driver tier: exact Python ints, zero per-round jobs
            from collections import defaultdict

            sink_hist: dict[object, list[tuple[int, int]]] = defaultdict(list)
            for r in hist_df.collect():
                sink_hist[r["dst"]].append((r["deg"], r["cnt"]))
            r_src = scale // n  # uniform source rank (round 0 init)
            dsum = n_dang * (scale // n)  # sinks all start at init rank
            sink_rank: dict[object, int] = {}
            for _ in range(iters):
                d_per = dsum // n
                new_dsum = 0
                for s, dl in sink_hist.items():
                    v = base + (
                        damping_pct
                        * (sum(c * (r_src // dg) for dg, c in dl) + d_per)
                    ) // 100
                    sink_rank[s] = v
                    new_dsum += v
                r_src = base + (damping_pct * d_per) // 100
                dsum = new_dsum
            from pyspark.sql.types import LongType, StructField, StructType

            import pandas as pd

            # Arrow path (r15): the row-based createDataFrame pays a fixed
            # ~0.3-0.5 s per call vs ~0.17 s for one pandas batch.
            sinks_df = e.sparkSession.createDataFrame(
                pd.DataFrame(
                    {
                        "node": list(sink_rank),
                        "rank_units": list(sink_rank.values()),
                    }
                ),
                StructType(
                    [
                        StructField("node", nodes_f.schema["node"].dataType),
                        StructField("rank_units", LongType()),
                    ]
                ),
            )
            return sinks_df.unionByName(
                zero_in.select(
                    "node", F.lit(r_src).cast("long").alias("rank_units")
                )
            )
        # distributed-histogram tier: one aggregation over the
        # histogram per round + a one-row dsum collect; r_src stays a
        # driver scalar (it is uniform across sources by construction)
        r_src = scale // n
        dsum = n_dang * (scale // n)
        sinks_ranked = None
        for _ in range(iters):
            d_per = dsum // n
            # bigint-safe without dprod, MULTI-EDGE INCLUDED (driver-
            # ADVICE r10): duplicate edges can push cnt past the source
            # count, but deg counts the same duplicates, so for one
            # (dst, deg) cell cnt <= deg * n_deg (n_deg = sources with
            # that out-degree) and cnt * (r_src div deg)
            # <= n_deg * r_src; summed over deg cells the per-sink f is
            # <= n * r_src <= scale (r_src <= ~scale/n every round) —
            # total rank mass, twelve orders under the bigint ceiling,
            # with or without edge multiplicity.
            sinks_ranked = (
                hist_df.groupBy("dst")
                .agg(
                    F.sum(F.expr(f"cnt * ({r_src} div deg)")).alias("f")
                )
                .select(
                    F.col("dst").alias("node"),
                    (
                        F.lit(base)
                        + F.expr(f"({damping_pct} * (f + {d_per})) div 100")
                    ).alias("rank_units"),
                )
                .localCheckpoint(eager=True)
            )
            dsum = sinks_ranked.agg(
                F.coalesce(F.sum("rank_units"), F.lit(0))
            ).first()[0]
            r_src = base + (damping_pct * d_per) // 100
        return sinks_ranked.unionByName(
            zero_in.select(
                "node", F.lit(r_src).cast("long").alias("rank_units")
            )
        )

    # GENERAL-GRAPH DRIVER TIER — the non-layered analogue of the layered
    # driver tier above: when the node count (free from the flags
    # aggregate) and the edge count (one cheap count over the checkpointed
    # RDD, only attempted under the node cap) both fit the driver budget,
    # collect the raw edge list ONCE and run every round in Python ints.
    # The recurrence below is exactly the distributed loop's: per round,
    # contributions rank div deg summed per destination, the dangling mass
    # entering every node as dsum div n, zero-in-degree nodes getting the
    # closed-form rank. Integer div/sums are order-independent, so the
    # result is bit-identical to the distributed loop (pinned by test).
    # At 100 TB this tier is for graphs whose SIZE does not scale with the
    # corpus — word co-occurrence graphs are vocabulary-bounded — while
    # corpus-scaled graphs (purchase/web graphs) fail the caps and take
    # the distributed loop unchanged.
    if (
        GENERAL_DRIVER_TIER_ENABLED
        and iters >= 1
        and n <= GENERAL_DRIVER_MAX_NODES
        and e.count() <= GENERAL_DRIVER_MAX_EDGES
    ):
        from collections import defaultdict

        out_deg_d: dict[object, int] = defaultdict(int)
        in_edges: dict[object, list] = defaultdict(list)
        src_set = set()
        dst_set = set()
        for r in e.select("src", "dst").collect():
            s, d = r["src"], r["dst"]
            out_deg_d[s] += 1
            in_edges[d].append(s)
            src_set.add(s)
            dst_set.add(d)
        all_nodes = src_set | dst_set
        dang_nodes = all_nodes - src_set  # no out-edges
        rank = {v: scale // n for v in all_nodes}
        for _ in range(iters):
            dsum = sum(rank[v] for v in dang_nodes)
            d_per = dsum // n
            new_rank = {}
            for v in all_nodes:
                if v in dst_set:
                    s_in = sum(
                        rank[u] // out_deg_d[u] for u in in_edges[v]
                    )
                    new_rank[v] = base + (damping_pct * (s_in + d_per)) // 100
                else:
                    new_rank[v] = base + (damping_pct * d_per) // 100
            rank = new_rank
        from pyspark.sql.types import LongType, StructField, StructType

        import pandas as pd

        # Arrow path (r15): same fixed-cost argument as the layered tier.
        return e.sparkSession.createDataFrame(
            pd.DataFrame(
                {"node": list(rank), "rank_units": list(rank.values())}
            ),
            StructType(
                [
                    StructField("node", nodes_f.schema["node"].dataType),
                    StructField("rank_units", LongType()),
                ]
            ),
        )

    # general distributed loop
    # per-edge static metadata: source out-degree + whether the TARGET is
    # dangling (no out-edges) — carried through the dst aggregation so the
    # new ranks frame needs no join to recover the flag. dst_dang comes
    # from the already-checkpointed flags frame (dang = never-a-source =
    # the old out_deg-left-join has_out-IS-NULL, one join instead of two
    # and shared by both deg paths); broadcast under the same n-row bound.
    contrib_base = (
        e_deg.join(
            _bcast_state(
                flags.select(
                    F.col("node").alias("dst"), F.col("dang").alias("dst_dang")
                ),
                n,
            ),
            "dst",
        )
        .select("src", "dst", "deg", "dst_dang")
        .localCheckpoint(eager=True)
    )

    ranks = nodes_f.withColumn("rank", F.lit(scale // n)).localCheckpoint(eager=True)
    for _ in range(iters):
        in_sum = (
            contrib_base.join(
                _bcast_state(ranks.where(~F.col("dang")), n),
                F.col("src") == F.col("node"),
            )
            .select(F.col("dst"), F.col("dst_dang"), F.expr("rank div deg").alias("c"))
            .groupBy("dst", "dst_dang")
            .agg(F.sum("c").alias("s"))
        )
        dang = ranks.where("dang").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("dsum")
        )
        new_rank = F.lit(base) + F.expr(
            f"({damping_pct} * (coalesce(s, cast(0 as bigint))"
            f" + (dsum div {n}))) div 100"
        )
        ranks = (
            in_sum.crossJoin(F.broadcast(dang))
            .select(
                F.col("dst").alias("node"),
                F.col("dst_dang").alias("dang"),
                new_rank.alias("rank"),
            )
            .unionByName(
                zero_in.crossJoin(F.broadcast(dang)).select(
                    "node",
                    F.lit(False).alias("dang"),
                    (
                        F.lit(base)
                        + F.expr(f"({damping_pct} * (dsum div {n})) div 100")
                    ).alias("rank"),
                )
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("rank").alias("rank_units"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """(node, hop): minimum hop count from any seed, breadth-first, over an
    UNDIRECTED edge list, bounded at max_hops.

    The canonical distributed frontier expansion: hop k's frontier is the
    neighbors of hop k-1's frontier minus everything already visited — one
    equi-join plus one anti-join per level, all on the node key. Because
    every level is a set operation on integer ids the result is exactly
    replayable, and the fixed level count unrolls into chained SQL CTEs for
    the oracle (no recursive-CTE path-explosion risk on cyclic graphs).

    At 100 TB the frontier join shuffles on the node key both sides; the
    visited set stays partitioned the same way, so each level reuses one
    exchange. Frontiers are localCheckpoint-ed per level (lineage doubles
    otherwise, as in connected_components).
    """
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = (
        e0.unionByName(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = seeds.select(F.col(seed_col).alias("node")).distinct().localCheckpoint(
        eager=True
    )
    # vertex count bounds frontier AND visited at every level: one driver
    # scalar unlocks the state broadcast (see _bcast_state note) so the
    # per-level joins ship the frontier, never re-shuffle the edge list
    n_verts = sym.select("s").distinct().count()
    visited = frontier
    out = frontier.withColumn("hop", F.lit(0))
    for k in range(1, max_hops + 1):
        nxt = (
            sym.join(_bcast_state(frontier, n_verts), sym["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(_bcast_state(visited, n_verts), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt.withColumn("hop", F.lit(k)))
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return out


def kcore_peel(
    edges: DataFrame,
    k: int,
    peels: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, deg) surviving EXACTLY `peels` rounds of k-core peeling over
    an undirected edge list: each round drops every node with degree < k,
    then every edge touching a dropped node. Fixed-round semantics (not
    run-to-convergence) keep the result a pure function of (edges, k,
    peels) that an external engine replays by unrolling the rounds — the
    bfs_hops/pagerank_det contract. If the peeling has converged within
    the budget the output IS the exact k-core (checkable: one more peel is
    a fixed point); otherwise it's the standard bounded-round
    over-approximation. Each round: one degree aggregation + two
    semi-joins, all on the node key; frames are localCheckpoint-ed so
    round N never re-executes rounds 1..N-1."""
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = (
        e0.where(F.col("s") != F.col("d"))
        .select(F.least("s", "d").alias("s"), F.greatest("s", "d").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # initial vertex count bounds every round's survivor set: one driver
    # scalar unlocks the state broadcast for all `peels` rounds
    n_verts = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .count()
    )
    for _ in range(peels):
        deg = (
            e.select(F.col("s").alias("node"))
            .unionByName(e.select(F.col("d").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        # checkpoint the survivor set once per round: it feeds BOTH
        # semi-joins (uncheckpointed, the degree aggregation runs twice)
        keep = (
            deg.where(F.col("deg") >= k).select("node").localCheckpoint(eager=True)
        )
        e = (
            e.join(
                _bcast_state(keep.withColumnRenamed("node", "s"), n_verts),
                "s",
                "left_semi",
            )
            .join(
                _bcast_state(keep.withColumnRenamed("node", "d"), n_verts),
                "d",
                "left_semi",
            )
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
    final_deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return final_deg.where(F.col("deg") >= k)


def lpa_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 4,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007)
    over an undirected weighted graph: (vertex, community).

    Every vertex starts as its own label; each round ALL vertices adopt,
    simultaneously from the previous round's labels, the label with the
    highest incident weight sum among their neighbors — ties broken by
    label ascending, which (with integer weights) makes every round, and
    therefore the fixed-`iters` outcome, exactly replayable by an external
    SQL engine (the pagerank_intexact unrolled-CTE precedent). Isolated
    or degree-tied vertices keep deterministic labels; no RNG, no
    vertex-ordering dependence (the classic asynchronous LPA is
    order-dependent by design — the synchronous variant trades possible
    label oscillation for reproducibility, which a data-lake operator
    needs more).

    100 TB shape: one shuffle per round (message tally on vertex id),
    labels localCheckpoint-ed each round so lineage stays O(1); rounds
    are fixed, not data-dependent.
    """
    w = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"), w.alias("w"))
        .unionByName(
            edges.select(
                F.col(dst).alias("s"), F.col(src).alias("d"), w.alias("w")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("s").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    n_verts = labels.count()  # bounded driver scalar: enables the state broadcast

    # GENERAL-DRIVER TIER (round 11, the pagerank_intexact pattern): a
    # dimension-bounded graph — brand/category co-occurrence graphs stay
    # (dim x dim) at ANY corpus scale because the caller pre-aggregates
    # co-occurrence counts into the edge weight — runs all rounds in
    # Python after ONE collect of the checkpointed symmetrized edges.
    # The recurrence is integer weight sums + (score desc, label asc)
    # argmax: order-independent, so bit-identical to the distributed loop
    # (pinned by test). Corpus-scaled graphs fail the measured caps and
    # take the loop below unchanged.
    if (
        GENERAL_DRIVER_TIER_ENABLED
        and iters >= 1
        and n_verts <= GENERAL_DRIVER_MAX_NODES
        and e.count() <= GENERAL_DRIVER_MAX_EDGES
    ):
        from collections import defaultdict

        edge_rows = [(r["s"], r["d"], r["w"]) for r in e.collect()]
        label = {s: s for s, _, _ in edge_rows}
        for _ in range(iters):
            # per-group sums mirror SQL SUM null semantics exactly: null
            # weights are skipped, but a group whose weights are ALL null
            # keeps a None score (not 0) so the argmax below can rank it
            # the way the distributed topk does (desc => nulls LAST).
            tally: dict[object, dict[object, object]] = defaultdict(dict)
            for s, d, wt in edge_rows:
                lb = label[d]
                grp = tally[s]
                if lb not in grp:
                    grp[lb] = wt  # may be None — the SQL "sum of nulls"
                elif wt is not None:
                    grp[lb] = (grp[lb] or 0) + wt
            label = {
                v: min(
                    scores.items(),
                    key=lambda kv: (kv[1] is None, -(kv[1] or 0), kv[0]),
                )[0]
                for v, scores in tally.items()
            }
        csize: dict[object, int] = defaultdict(int)
        for lb in label.values():
            csize[lb] += 1
        from pyspark.sql.types import LongType, StructField, StructType

        import pandas as pd

        vt = e.schema["s"].dataType
        # Arrow path (r15): same fixed-cost argument as the pagerank tiers.
        return e.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "vertex": list(label),
                    "community": list(label.values()),
                    "community_size": [csize[lb] for lb in label.values()],
                }
            ),
            StructType(
                [
                    StructField("vertex", vt),
                    StructField("community", vt),
                    StructField("community_size", LongType()),
                ]
            ),
        )

    from hadoop_data_lake_spark.operators.windows import topk_per_group

    for _ in range(iters):
        msgs = e.join(
            _bcast_state(labels.select(F.col("vertex").alias("d"), "label"), n_verts),
            "d",
        ).select(F.col("s").alias("vertex"), "label", "w")
        tally = msgs.groupBy("vertex", "label").agg(F.sum("w").alias("score"))
        new = topk_per_group(
            tally,
            ["vertex"],
            [F.col("score").desc(), F.col("label").asc()],
            k=1,
        ).select("vertex", F.col("label").alias("new_label"))
        labels = (
            labels.join(_bcast_state(new, n_verts), "vertex", "left")
            .select(
                "vertex",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    return labels.join(sizes, "label").select(
        "vertex", F.col("label").alias("community"), "community_size"
    )


def _hits_numpy_rounds(hub_i, auth_i, n_h: int, n_a: int, rounds: int, scale: int):
    """The shared numpy HITS recurrence (one kernel, two tiers): exact
    int64 bincount rounds over index-encoded DISTINCT edges. The
    bit-identity proof lives on `hits_scaled_driver` (every aggregate is
    a sum of non-negative ints <= scale, so per-node sums stay < 2^53 —
    float64 bincount accumulation is exact — and the rescale numerator
    stays < 2^63); callers must have checked that envelope already."""
    import numpy as np

    def _rescale(v):
        return (v * scale) // v.max()

    def _agg(idx, w, n):
        return np.bincount(
            idx, weights=w.astype(np.float64), minlength=n
        ).astype(np.int64)

    a = _rescale(np.bincount(auth_i, minlength=n_a).astype(np.int64))
    h = _rescale(_agg(hub_i, a[auth_i], n_h))
    for _ in range(rounds - 1):
        a = _rescale(_agg(auth_i, h[hub_i], n_a))
        h = _rescale(_agg(hub_i, a[auth_i], n_h))
    return h, a


def hits_topk_sides_driver(
    e: DataFrame,
    hub_col: str,
    auth_col: str,
    rounds: int = 2,
    k: int = 10,
    scale: int = 1_000_000,
    n_edges_bound: int | None = None,
):
    """Fused driver tier (round 14) for top-k HITS
    (queries/tpch_queries.hits_hubs_authorities): collect the RAW —
    possibly duplicated — edge projection ONCE, dedupe pairs in numpy,
    run the shared integer recurrence, and return ONLY the 2k result
    rows as a ``(side, node, score)`` DataFrame (``'hub'`` rows first,
    each side ordered score desc / node asc — the `_hits_top_sides`
    contract). The caller thereby skips the distinct exchange, the edge
    checkpoint, the countDistinct cap job AND the two per-node score
    frames (r13 profile at sf0.1: edge build 1.06 s + counts 0.24 s +
    per-node shaping 0.69 s of a 2.4 s query).

    ``n_edges_bound`` must be a SOUND upper bound on the collected row
    count, obtainable without executing the join — e.g. the fact-side
    row count when the join key is the other side's primary key (an
    inner join on a unique key cannot multiply fact rows). The edge-count
    cap (``NUMPY_DRIVER_MAX_EDGES`` — itself a byte budget at 16 B/edge,
    see the constant) and the exactness envelope are checked against the
    bound (conservative: the deduped edge count is <= the bound); a
    defensive post-collect recheck routes to ``None`` if the promise was
    broken.
    No node cap is needed: unlike `hits_scaled_driver`, no per-node
    Spark frame is ever built (numpy holds <= 2 * |E| node slots, and
    only 2k rows go back through createDataFrame).

    Returns ``None`` when any cap fails — callers fall back to the r12
    two-frame tier / the distributed loop unchanged. Both node columns
    must share one INTEGRAL Spark type (the unioned ``node`` column's
    type; non-integral node ids decline to the fallback rather than
    crash in the numpy index encoding — ADVICE r14).
    """
    if not GENERAL_DRIVER_TIER_ENABLED:
        return None
    if rounds < 1 or k < 1 or scale > 1_000_000:
        return None  # the <2^53 / <2^63 exactness chain is sized to 1e6
    if n_edges_bound is None or n_edges_bound > NUMPY_DRIVER_MAX_EDGES:
        return None
    if (
        scale * n_edges_bound >= 2**53
        or scale * scale * n_edges_bound >= 2**63
    ):
        return None
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    if (
        e.schema[hub_col].dataType != e.schema[auth_col].dataType
        or not isinstance(e.schema[hub_col].dataType, integral)
    ):
        return None
    import numpy as np

    pdf = e.toPandas()
    n_raw = len(pdf)
    if n_raw == 0 or n_raw > n_edges_bound:
        return None  # empty, or the caller's bound was not sound
    hub_u, hub_i = np.unique(pdf[hub_col].to_numpy(), return_inverse=True)
    auth_u, auth_i = np.unique(pdf[auth_col].to_numpy(), return_inverse=True)
    # pair dedupe == SQL DISTINCT: encode (hub, auth) as one int64 —
    # hub_i < 2*|E| and len(auth_u) <= |E| <= 4e6, so the product stays
    # far under 2^63.
    code = np.unique(hub_i.astype(np.int64) * len(auth_u) + auth_i)
    hub_i = code // len(auth_u)
    auth_i = code % len(auth_u)
    h, a = _hits_numpy_rounds(hub_i, auth_i, len(hub_u), len(auth_u), rounds, scale)

    def _topk(nodes, v):
        # (score desc, node asc) — np.lexsort's LAST key is primary;
        # -v cannot overflow (0 <= v <= scale).
        order = np.lexsort((nodes, -v))[:k]
        return [(int(nodes[j]), int(v[j])) for j in order]

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    import pandas as pd

    hub_top = _topk(hub_u, h)
    auth_top = _topk(auth_u, a)
    # Arrow path even for 2k rows: the row-based createDataFrame pays a
    # fixed ~0.3-0.5 s per call (schema verification + pickled-row
    # parallelize job) vs ~0.17 s via one pandas/Arrow batch (r15 profile).
    out = pd.DataFrame(
        {
            "side": ["hub"] * len(hub_top) + ["auth"] * len(auth_top),
            "node": [n for n, _ in hub_top] + [n for n, _ in auth_top],
            "score": [s for _, s in hub_top] + [s for _, s in auth_top],
        }
    )
    return e.sparkSession.createDataFrame(
        out,
        StructType(
            [
                StructField("side", StringType()),
                StructField("node", e.schema[hub_col].dataType),
                StructField("score", LongType()),
            ]
        ),
    )


def pagerank_layered_driver(
    e: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    scale: int = 10**12,
    damping_pct: int = 85,
    n_edges_bound: int | None = None,
):
    """Fused driver tier (round 15) for LAYERED fixed-point PageRank
    (queries/tpch_queries.pagerank_det) — the pagerank analogue of
    `hits_topk_sides_driver`: collect the RAW, possibly duplicated edge
    projection ONCE (Arrow), then pair-dedup, out-degrees, the layered
    structure test, the per-sink out-degree histogram AND all `iters`
    rounds run in numpy/driver integers. The caller thereby skips the
    entire distributed edge build (repartition + dropDuplicates + degree
    window), the flags union-aggregate, the histogram groupBy and their
    eager checkpoints (r15 profile at sf0.1: raw-join collect 0.35 s +
    numpy dedup/degree 0.13 s vs 2.0 s for the full distributed-build
    query whose per-round arithmetic ALREADY ran on the driver).

    Bit-identity with `pagerank_intexact`'s layered tiers: the recurrence
    below is literally the layered driver tier's —

        r_src' = base + (damping_pct * d_per) // 100
        sink'  = base + (damping_pct * (sum(cnt * (r_src // deg)) + d_per)) // 100

    over the iteration-invariant (sink, deg, cnt) histogram, where every
    quantity is a non-negative integer and total rank mass never exceeds
    `scale` (mass is conserved up to deterministic truncation), so per-cell
    products and per-sink sums stay < 2^53 — float64 bincount accumulation
    is exact — and `damping_pct * (f + d_per)` stays far under 2^63.
    Pinned by tests against both distributed tiers on random bipartite
    multigraphs.

    ``n_edges_bound`` must be a SOUND upper bound on the collected row
    count obtainable without executing the join (the
    `hits_topk_sides_driver` contract — e.g. the fact-side row count when
    the join key is the other side's primary key); a defensive
    post-collect recheck declines if the promise was broken.

    Returns ``None`` (caller falls back to the distributed build +
    `pagerank_intexact` unchanged) when: the tier is disabled, a cap or
    the exactness envelope fails, node columns are not one shared
    integral type, the collected edge list is empty, or the graph is NOT
    layered (some node appears on both sides — the general loop's
    semantics, which this tier does not replicate).
    """
    if not GENERAL_DRIVER_TIER_ENABLED:
        return None
    if iters < 1 or scale > 10**12 or not 0 < damping_pct < 100:
        return None  # the <2^53 mass envelope is sized to scale <= 1e12
    if n_edges_bound is None or n_edges_bound > NUMPY_DRIVER_MAX_EDGES:
        return None
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    if (
        e.schema[src].dataType != e.schema[dst].dataType
        or not isinstance(e.schema[src].dataType, integral)
    ):
        return None
    import numpy as np

    pdf = e.toPandas()
    n_raw = len(pdf)
    if n_raw == 0 or n_raw > n_edges_bound:
        return None  # empty, or the caller's bound was not sound
    if pdf[src].isna().any() or pdf[dst].isna().any():
        # nullable integral + actual NULLs arrives as float64+NaN and the
        # final astype would fabricate garbage node ids — decline (ADVICE
        # r15); the distributed path keeps NULL as a node key.
        return None
    src_u, src_i = np.unique(pdf[src].to_numpy(), return_inverse=True)
    dst_u, dst_i = np.unique(pdf[dst].to_numpy(), return_inverse=True)
    # layered structure test (== the operator's n_mid == 0): no node may
    # appear as both a source and a destination.
    if np.intersect1d(src_u, dst_u, assume_unique=True).size:
        return None
    # pair dedupe == dropDuplicates([src, dst]): same encoding bound as
    # hits_topk_sides_driver (indices <= |E| <= 4e6, product << 2^63).
    code = np.unique(src_i.astype(np.int64) * len(dst_u) + dst_i)
    src_i = code // len(dst_u)
    dst_i = code % len(dst_u)
    deg = np.bincount(src_i, minlength=len(src_u)).astype(np.int64)

    n = len(src_u) + len(dst_u)
    n_dang = len(dst_u)  # every sink is dangling in a layered graph
    base = (100 - damping_pct) * (scale // n) // 100
    # iteration-invariant (sink, deg) histogram: cnt = #edges into that
    # sink from sources of that out-degree (deg <= |E|, so the encode
    # stays far under 2^63 at the 4M edge cap).
    dg = deg[src_i]
    stride = int(dg.max()) + 1
    hcode, hcnt = np.unique(
        dst_i.astype(np.int64) * stride + dg, return_counts=True
    )
    h_dst = (hcode // stride).astype(np.int64)
    h_deg = (hcode % stride).astype(np.int64)
    hcnt = hcnt.astype(np.int64)

    r_src = scale // n
    dsum = n_dang * (scale // n)
    sink_rank = None
    for _ in range(iters):
        d_per = dsum // n
        # per-cell cnt * (r_src div deg) <= per-sink mass <= total mass
        # <= scale <= 1e12 < 2^53: exact in float64 accumulation.
        cell = hcnt * (r_src // h_deg)
        f = np.bincount(
            h_dst, weights=cell.astype(np.float64), minlength=n_dang
        ).astype(np.int64)
        sink_rank = base + (damping_pct * (f + d_per)) // 100
        dsum = int(sink_rank.sum())
        r_src = base + (damping_pct * d_per) // 100

    from pyspark.sql.types import StructField, StructType

    import pandas as pd

    # Arrow path: |V| result rows (all sinks + all sources) make the
    # row-based createDataFrame measurable (~0.47 s vs ~0.19 s for 16k
    # rows, r15 profile) — ship one pandas frame instead.
    np_dtype = {
        ByteType: np.int8,
        ShortType: np.int16,
        IntegerType: np.int32,
        LongType: np.int64,
    }[type(e.schema[src].dataType)]
    out = pd.DataFrame(
        {
            "node": np.concatenate([dst_u, src_u]).astype(np_dtype, copy=False),
            "rank_units": np.concatenate(
                [
                    sink_rank.astype(np.int64, copy=False),
                    np.full(len(src_u), r_src, dtype=np.int64),
                ]
            ),
        }
    )
    return e.sparkSession.createDataFrame(
        out,
        StructType(
            [
                StructField("node", e.schema[src].dataType),
                StructField("rank_units", LongType()),
            ]
        ),
    )


def hits_scaled_driver(
    e: DataFrame,
    hub_col: str,
    auth_col: str,
    n_hubs: int,
    n_auths: int,
    rounds: int = 2,
    scale: int = 1_000_000,
    n_edges: int | None = None,
):
    """Driver tier (round 12) for the integer-rescaled HITS fixed point
    (queries/tpch_queries.hits_hubs_authorities): when the bipartite
    graph fits the driver budget, collect the checkpointed edge list
    ONCE (Arrow) and run every mutual-reinforcement round as a numpy
    gather + bincount in exact integer arithmetic — zero per-round Spark
    jobs instead of rounds x 2 x (join + agg + scalar max). Returns
    ``(hub_scores, auth_scores)`` DataFrames with columns
    ``(hub_col, 'v')`` / ``(auth_col, 'v')`` — the same shape the
    distributed loop's final score frames carry, so the caller's top-k
    shaping is shared verbatim by both paths — or ``None`` when any cap
    fails (the distributed loop then stands unchanged).

    Bit-identity argument (pinned by tests/test_round12_fixes.py):
    every aggregate is a sum of non-negative ints <= `scale`, so a
    per-node sum is <= scale * n_edges <= 1e6 * 4e6 = 4e12 < 2^53 —
    np.bincount's float64 accumulation is therefore EXACT (every addend
    and partial sum is a representable integer), hence order-independent
    like the distributed integer hash aggregate; the rescale numerator
    v * scale <= 4e18 < 2^63-1 never overflows int64, and floor-div of
    non-negative ints equals SQL `div`.
    """
    if not GENERAL_DRIVER_TIER_ENABLED:
        return None
    if rounds < 1 or scale > 1_000_000:
        return None  # the <2^53 / <2^63 exactness chain is sized to 1e6
    if n_hubs + n_auths > GENERAL_DRIVER_MAX_NODES:
        return None
    # callers that already know |E| (folded into their flags aggregate)
    # pass it in so the cap check costs zero extra jobs; otherwise it is
    # counted here, and only under the node cap (the r11 gate order).
    n_e = e.count() if n_edges is None else n_edges
    if n_e > NUMPY_DRIVER_MAX_EDGES:
        return None
    # Tie the exactness envelope to the ACTUAL edge count, not only the
    # mutable module cap (driver-ADVICE r12): bincount's float64 sums are
    # exact only while scale*|E| < 2^53, and the rescale numerator fits
    # int64 only while scale^2*|E| < 2^63 (v <= scale*|E|); numpy wraps
    # int64 silently, so a future NUMPY_DRIVER_MAX_EDGES raise must not
    # be able to outrun the proof — the guard travels with the function.
    if scale * n_e >= 2**53 or scale * scale * n_e >= 2**63:
        return None
    import numpy as np

    pdf = e.toPandas()
    if len(pdf) == 0:
        return None
    hub_u, hub_i = np.unique(pdf[hub_col].to_numpy(), return_inverse=True)
    auth_u, auth_i = np.unique(pdf[auth_col].to_numpy(), return_inverse=True)
    h, a = _hits_numpy_rounds(hub_i, auth_i, len(hub_u), len(auth_u), rounds, scale)

    from pyspark.sql.types import LongType, StructField, StructType

    import pandas as pd

    # Arrow path (r16, completing the r15 conversion): the row-based
    # createDataFrame pays ~0.3-0.5 s fixed per call vs ~0.13-0.19 s for
    # one pandas batch — and this tier returns TWO frames per call.
    spark = e.sparkSession
    h_df = spark.createDataFrame(
        pd.DataFrame({hub_col: hub_u, "v": h}),
        StructType(
            [
                StructField(hub_col, e.schema[hub_col].dataType),
                StructField("v", LongType()),
            ]
        ),
    )
    a_df = spark.createDataFrame(
        pd.DataFrame({auth_col: auth_u, "v": a}),
        StructType(
            [
                StructField(auth_col, e.schema[auth_col].dataType),
                StructField("v", LongType()),
            ]
        ),
    )
    return h_df, a_df
