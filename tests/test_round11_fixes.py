"""Regression tests for the round-11 fixes (VERDICT r10 items + ADVICE r10).

- operators/graph.broadcast_bounded_state: the state-broadcast cap is now
  byte-aware (rows x estimated schema width) in ADDITION to the 1M row cap,
  so a wide-state algorithm (string labels, array payloads) can't ship a
  multi-GB broadcast that a narrow (long, long) rank frame of the same row
  count would legitimately pass.
- pagerank_intexact: layered detection collapsed into the single flags
  aggregate (one driver job instead of three), and the distributed
  histogram tier's bigint bound is proven for MULTI-edge inputs (cnt can
  exceed the source count, but deg scales with it, so per-sink mass stays
  <= scale) — pinned here by a duplicate-edge three-tier equality test.
- minhash_cross_pairs: the probe-side (broadcast-small) frames derived
  from the checkpointed inv_r carry explicit F.broadcast hints; pinned so
  a refactor can't silently demote the candidate/verify joins to SMJ.
- tools/degenerate_sweep: --plans now builds the table-derived corpora
  (where empty_facts lives) even under --events-only.
"""

import pytest
from pyspark.sql import functions as F


def test_est_row_bytes_widths():
    import hadoop_data_lake_spark.operators.graph as G
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    narrow = StructType(
        [StructField("node", LongType()), StructField("rank", LongType())]
    )
    wide = StructType(
        [
            StructField("node", LongType()),
            StructField("label", StringType()),
            StructField("payload", ArrayType(LongType())),
        ]
    )
    assert G._est_row_bytes(narrow) == 16
    # complex columns are priced pessimistically (>= 256 each)
    assert G._est_row_bytes(wide) >= 8 + 48 + 256


def test_broadcast_state_byte_cap_blocks_wide_state(spark):
    """A state frame under the ROW cap but over the BYTE cap must NOT get
    the broadcast hint; the same row count with a narrow schema must."""
    import hadoop_data_lake_spark.operators.graph as G

    narrow = spark.createDataFrame([(1, 2)], "node long, rank long")
    wide = narrow.withColumn("payload", F.array(F.lit(1), F.lit(2))).withColumn(
        "label", F.lit("x")
    )
    n_rows = 900_000  # under BROADCAST_STATE_MAX_ROWS
    assert n_rows <= G.BROADCAST_STATE_MAX_ROWS
    # narrow: 900k x 16B = ~14 MB — broadcasts (hint returns a NEW frame)
    assert G.broadcast_bounded_state(narrow, n_rows) is not narrow
    # wide: 900k x >=312B = ~280 MB — over the 64 MB byte cap, unchanged
    assert G.broadcast_bounded_state(wide, n_rows) is wide
    # row cap still binds first regardless of width
    assert G.broadcast_bounded_state(narrow, G.BROADCAST_STATE_MAX_ROWS + 1) is narrow
    # unknown / negative counts never broadcast
    assert G.broadcast_bounded_state(narrow, None) is narrow
    assert G.broadcast_bounded_state(narrow, -1) is narrow


def test_pagerank_layered_multiedge_tiers_match(spark):
    """Duplicate (multi-)edges: all three pagerank_intexact tiers must stay
    bit-identical. The histogram tiers count EDGE rows (cnt can exceed the
    distinct source count) while out-degree counts the same duplicates, so
    contributions — and the bigint mass bound — are consistent across
    driver / distributed-histogram / general-loop formulations."""
    import hadoop_data_lake_spark.operators.graph as G

    # bipartite with heavy multiplicity: customer c buys item -(c%3)-1
    # between 1 and 4 times
    rows = []
    for c in range(20):
        rows += [(c, -(c % 3) - 1)] * (1 + c % 4)
    rows += [(5, -2), (5, -2), (5, -2)]  # extra parallel edges
    edges = spark.createDataFrame(rows, "src long, dst long")

    def run():
        return {
            (r["node"], r["rank_units"])
            for r in G.pagerank_intexact(edges, iters=5).collect()
        }

    old_cap, old_on = G.LAYERED_HIST_MAX_ROWS, G.LAYERED_FAST_PATH_ENABLED
    try:
        driver_t = run()
        G.LAYERED_HIST_MAX_ROWS = -1
        mid_t = run()
        G.LAYERED_FAST_PATH_ENABLED = False
        general_t = run()
    finally:
        G.LAYERED_HIST_MAX_ROWS, G.LAYERED_FAST_PATH_ENABLED = old_cap, old_on
    assert driver_t == mid_t == general_t
    assert len(driver_t) == 23  # 20 sources + 3 sinks


def test_pagerank_detection_adds_zero_jobs(spark):
    """Layered detection must be FREE on non-layered graphs (the r10 shape
    ran two extra count jobs on every call): with the fast path enabled vs
    disabled, a chain graph (non-layered, takes the general loop either
    way) must run exactly the same number of driver jobs — the structural
    test is a byproduct of the single flags aggregate that computes n."""
    import hadoop_data_lake_spark.operators.graph as G

    chain = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(enabled):
        old = G.LAYERED_FAST_PATH_ENABLED
        G.LAYERED_FAST_PATH_ENABLED = enabled
        try:
            # job ids are monotonically increasing; counting LIST LENGTH
            # breaks late in a long suite once the UI evicts retained jobs
            before = max(tracker.getJobIdsForGroup(None) or [0])
            G.pagerank_intexact(chain, iters=2)
            return max(tracker.getJobIdsForGroup(None) or [0]) - before
        finally:
            G.LAYERED_FAST_PATH_ENABLED = old

    warm = jobs_for(True)  # warm up partitions/AQE once
    assert jobs_for(True) == jobs_for(False), warm


def test_minhash_cross_probe_side_broadcasts(spark):
    """The three probe-side joins in minhash_cross_pairs are explicitly
    broadcast-hinted (checkpointed frames carry no stats, so without the
    hints Catalyst would SMJ-shuffle the corpus side per join)."""
    from hadoop_data_lake_spark.operators.dedup import minhash_cross_pairs

    left = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(30)],
        "doc_id long, body string",
    )
    right = spark.createDataFrame(
        [(100, "the quick brown fox 3 jumps over the lazy dog")],
        "doc_id long, body string",
    )
    df = minhash_cross_pairs(left, right, "doc_id", "body", threshold=0.3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # and the operator still finds the planted cross-corpus duplicate
    hits = {(r["doc_left"], r["doc_right"]) for r in df.collect()}
    assert (3, 100) in hits


def test_degenerate_sweep_plans_mode_builds_table_cases(spark):
    """--plans + --events-only used to KeyError on cases['empty_facts'];
    build_cases must include the table-derived corpora whenever the plan
    probe will run."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from degenerate_sweep import build_cases

    cases, events_cases = build_cases(spark, events_only=True, plans_mode=True)
    assert "empty_facts" in cases
    assert "empty_facts" not in events_cases
    cases2, _ = build_cases(spark, events_only=True, plans_mode=False)
    assert "empty_facts" not in cases2


def test_scaled_params_law():
    """similarity.scaled_srp_params / scaled_ivf_params — the measured ANN
    scale law (tools/scale_probe_100x.py LSH_SCALED / IVF_SCALED) as an
    API. At the graded corpus size the law lands exactly on the shipped
    registry defaults; at every size the derived (bands, bits) must hold
    the banded recall bound >= 98% at the 0.95 threshold and keep the
    collision term bands/2^bits under the 1x default's."""
    import math

    from hadoop_data_lake_spark.operators.similarity import (
        scaled_ivf_params,
        scaled_srp_params,
    )

    # graded scale (sf0.01 embeddings corpus, n = 500): exactly the
    # registry defaults
    assert scaled_srp_params(500) == (8, 8)
    assert scaled_ivf_params(500) == (8, 2)
    # the measured probe anchors (LSH_SCALED / IVF_SCALED at 10x/100x of
    # the n=500 base): same occupancy regime as the hand-tuned values
    assert scaled_srp_params(5000) == (12, 12)  # hand: (12, 12)
    assert scaled_srp_params(50000) == (18, 15)  # hand: (24, 16)
    assert scaled_ivf_params(5000) == (24, 3)  # hand: (25, 3)
    assert scaled_ivf_params(50000) == (75, 4)  # hand: (80, 4)

    p = 1 - math.acos(0.95) / math.pi
    base_collision = 8 / 2**8
    for n in (100, 6_000, 60_000, 600_000, 6_000_000, 10**9):
        bands, bits = scaled_srp_params(n)
        recall = 1 - (1 - p**bits) ** bands
        assert recall >= 0.98, (n, bands, bits, recall)
        assert bands / 2**bits <= base_collision, (n, bands, bits)
        n_cells, nprobe = scaled_ivf_params(n)
        assert 1 <= nprobe <= n_cells
    # monotone bucket growth: bigger corpora never get fewer bits/cells
    bits_seq = [scaled_srp_params(10**e)[1] for e in range(2, 10)]
    assert bits_seq == sorted(bits_seq)
    cells_seq = [scaled_ivf_params(10**e)[0] for e in range(2, 10)]
    assert cells_seq == sorted(cells_seq)


def test_auto_scale_is_opt_in_and_value_consistent(spark):
    """auto_scale=True must (a) not change the default code path (opt-in),
    (b) produce exactly the pairs the explicit scaled parameters produce,
    and (c) still find planted near-duplicates."""
    import numpy as np
    from hadoop_data_lake_spark.operators.similarity import (
        cosine_near_dup_pairs,
        ivf_kmeans_topk,
        scaled_srp_params,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i < 5:  # plant a near-dup twin (tiny perturbation)
            w = v + 0.01 * rng.standard_normal(64)
            w = w / np.linalg.norm(w)
            rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    n = df.count()
    bands, bits = scaled_srp_params(n)
    explicit = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            df, threshold=0.95, num_bands=bands, bits_per_band=bits
        ).collect()
    }
    auto = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.95, auto_scale=True).collect()
    }
    assert auto == explicit
    planted = {(i, 1000 + i) for i in range(5)}
    assert planted <= auto

    out = ivf_kmeans_topk(
        df, df.where("vec_id < 3"), k=2, auto_scale=True
    ).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    assert all(1 <= r["rnk"] <= 2 for r in out)


def test_ivf_scan_budget_knob(spark):
    """scan_budget is the measured multi-probe recall lever (VERDICT r10
    item 7): nprobe = ceil(budget * n_cells). At budget 1.0 every cell is
    probed, so IVF must return EXACTLY the brute-force top-k (same scoring
    and tie-break); at a partial budget recall must be monotone in the
    budget on a clustered corpus."""
    import numpy as np
    from hadoop_data_lake_spark.operators.similarity import (
        brute_force_topk,
        ivf_kmeans_topk,
        scaled_ivf_params,
    )

    # parameter arithmetic
    for n in (5_000, 600_000):
        cells, _ = scaled_ivf_params(n)
        assert scaled_ivf_params(n, scan_budget=1.0) == (cells, cells)
        _, p24 = scaled_ivf_params(n, scan_budget=0.24)
        assert 1 <= p24 <= cells and p24 >= 0.24 * cells
    # graded default path unchanged by the knob's existence
    assert scaled_ivf_params(500) == (8, 2)

    # clustered corpus: 8 well-separated centers, 30 points each
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 64)) * 10
    rows = []
    for i in range(240):
        v = centers[i % 8] + 0.1 * rng.standard_normal(64)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 8")

    truth = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in brute_force_topk(df, q, k=3).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ivf_kmeans_topk(
            df, q, k=3, auto_scale=True, scan_budget=1.0
        ).collect()
    }
    assert full == truth

    def recall(budget):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_kmeans_topk(
                df, q, k=3, auto_scale=True, scan_budget=budget
            ).collect()
        }
        return len(got & {(a, b) for a, b, _ in truth}) / len(truth)

    r_small, r_big = recall(0.13), recall(0.5)
    assert r_small <= r_big <= 1.0
    # on a tightly clustered corpus one probed cell already holds the
    # query's whole cluster — even the minimal budget clears 0.9
    assert r_small >= 0.9


def test_stale_ladder_excludes_rows_only():
    """VERDICT r10 item 3: the re-grade ladder must never schedule a
    rows-only query (no DuckDB oracle -> the driver row is guaranteed
    `no_oracle`, a wasted slot). ann_ivf_kmeans is the regression case —
    graded twice (r2, r10) for no value hash, and re-dated again by the
    r11 auto_scale change, so without the filter it WOULD be on the
    ladder."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from backlog_report import stale_ladder

    from hadoop_data_lake_spark.queries.registry import REGISTRY

    assert REGISTRY["ann_ivf_kmeans"].oracle is None  # fixture sanity
    ladder = stale_ladder()
    names = {name for _, name, _ in ladder}
    assert "ann_ivf_kmeans" not in names
    for name in names:
        assert REGISTRY[name].oracle is not None, name


def test_hits_uses_public_broadcast_helper():
    """queries/tpch_queries must not reach into the private _bcast_state
    (ADVICE r10) and must not re-count state frames per rescale."""
    import inspect

    from hadoop_data_lake_spark.queries import tpch_queries as T

    src = inspect.getsource(T.hits_hubs_authorities)
    assert "_bcast_state" not in src
    assert "broadcast_bounded_state" in src
    assert "df.count()" not in src


def test_bench_calm_box_gate(monkeypatch):
    """VERDICT r10 item 5: the calm-box discipline lives in bench.py itself.
    Calm box -> no wait; loaded box -> bounded wait that times out and
    proceeds (never blocks the driver forever), with a self-describing
    record either way."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    bench = importlib.import_module("bench")

    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.1, 0.1, 0.1))
    rec = bench.wait_for_calm_box()
    assert rec["load_at_start"] == 0.1 and not rec["timed_out"]
    assert rec["waited_s"] < 1.0

    monkeypatch.setenv("SPARK_GRAFT_CALM_LOAD", "2.0")
    monkeypatch.setenv("SPARK_GRAFT_CALM_WAIT_S", "0.2")
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    # monotonic advances past max_wait after the first poll loop check
    ticks = iter([0.0, 0.0, 0.5, 0.5])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(ticks))
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.0, 9.0, 9.0))
    rec = bench.wait_for_calm_box()
    assert rec["timed_out"] and rec["load_at_invoke"] == 9.0
    assert sleeps  # it did wait before giving up


def _pr_both_tiers(spark, rows, iters=4):
    """Run pagerank_intexact with the general driver tier ON vs OFF on the
    same edge list; return the two sorted (node, rank_units) lists."""
    import hadoop_data_lake_spark.operators.graph as G

    out = []
    for enabled in (True, False):
        orig = G.GENERAL_DRIVER_TIER_ENABLED
        G.GENERAL_DRIVER_TIER_ENABLED = enabled
        try:
            e = spark.createDataFrame(rows, "src int, dst int")
            got = sorted(
                (r["node"], r["rank_units"])
                for r in G.pagerank_intexact(e, iters=iters).collect()
            )
        finally:
            G.GENERAL_DRIVER_TIER_ENABLED = orig
        out.append(got)
    return out


def test_general_driver_tier_bit_identical(spark):
    """Round-11 general-graph driver tier: byte-for-byte the distributed
    loop's integer recurrence, on a graph with every structural feature the
    loop handles — dangling nodes (5 has no out-edge), zero-in-degree
    nodes (1 is never a destination), duplicate (multi-)edges, a cycle,
    and a self-referential cluster. Non-layered (node 2 has both in- and
    out-edges) so the layered tiers never intercept."""
    rows = [
        (1, 2), (2, 3), (3, 2),          # cycle w/ mid nodes
        (2, 5), (4, 5), (4, 5),          # dangling sink 5, dup edge
        (3, 4), (1, 4),
    ]
    fast, dist = _pr_both_tiers(spark, rows)
    assert fast == dist
    assert len(fast) == 5
    # mass sanity: total rank stays ~scale (integer truncation only)
    assert abs(sum(r for _, r in fast) - 10**12) < 10**7


def test_general_driver_tier_caps_route_to_distributed(spark):
    """Above either measured cap the operator must take the distributed
    loop (no collect of an unbounded edge list). Forced by dropping the
    caps to zero; equality of values is what the other test pins."""
    import hadoop_data_lake_spark.operators.graph as G

    e = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    orig_n, orig_m = G.GENERAL_DRIVER_MAX_NODES, G.GENERAL_DRIVER_MAX_EDGES
    G.GENERAL_DRIVER_MAX_NODES = 0
    try:
        df = G.pagerank_intexact(e, iters=1)
        # the distributed loop returns the ranks frame selected from the
        # iterated localCheckpoint — a Scan ExistingRDD, not a local
        # createDataFrame; cheap structural probe:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan
    finally:
        G.GENERAL_DRIVER_MAX_NODES = orig_n
        G.GENERAL_DRIVER_MAX_EDGES = orig_m


def test_lpa_driver_tier_bit_identical(spark):
    """Round-11 LPA driver tier: same (score desc, label asc) synchronous
    recurrence as the distributed loop, string labels + integer weights,
    including a weight-tied pair (the tie-break path) and an isolated
    2-clique."""
    import hadoop_data_lake_spark.operators.graph as G

    rows = [
        ("a", "b", 3), ("b", "c", 3),      # tie at b: labels a vs c
        ("c", "d", 5), ("a", "d", 1),
        ("x", "y", 2),                      # separate component
    ]
    out = []
    for enabled in (True, False):
        orig = G.GENERAL_DRIVER_TIER_ENABLED
        G.GENERAL_DRIVER_TIER_ENABLED = enabled
        try:
            e = spark.createDataFrame(
                rows, "brand_a string, brand_b string, n_orders long"
            )
            got = sorted(
                map(
                    tuple,
                    G.lpa_communities(
                        e,
                        src="brand_a",
                        dst="brand_b",
                        weight="n_orders",
                        iters=4,
                    ).collect(),
                )
            )
        finally:
            G.GENERAL_DRIVER_TIER_ENABLED = orig
        out.append(got)
    fast, dist = out
    assert fast == dist
    assert len(fast) == 6


def test_lpa_driver_tier_caps_route_to_distributed(spark):
    """Above either measured cap lpa_communities must take the distributed
    loop (no collect of an unbounded edge list) — same probe as the
    pagerank cap test: the distributed loop's labels frame is an iterated
    localCheckpoint (Scan ExistingRDD), never a local createDataFrame."""
    import hadoop_data_lake_spark.operators.graph as G

    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2)], "brand_a string, brand_b string, w long"
    )
    orig = G.GENERAL_DRIVER_MAX_NODES
    G.GENERAL_DRIVER_MAX_NODES = 0
    try:
        df = G.lpa_communities(e, src="brand_a", dst="brand_b", weight="w", iters=1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan
    finally:
        G.GENERAL_DRIVER_MAX_NODES = orig


def test_driver_tier_property_random_graphs(spark):
    """Property harness for the r11 driver tiers: on random small digraphs
    (dangling nodes, self-referential pairs, duplicate edges, multiple
    components all arise naturally), pagerank_intexact and lpa_communities
    must return BIT-identical results with the tier on vs off. Seeded
    stdlib RNG, a handful of draws, one Spark pipeline per draw — the
    hypothesis float strategies are avoided per tests/test_properties.py's
    container note, and graph shapes need structured randomness anyway."""
    import random

    import hadoop_data_lake_spark.operators.graph as G

    rng = random.Random(0xC0FFEE)
    for draw in range(4):
        n = rng.randint(2, 14)
        m = rng.randint(1, 28)
        rows = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1)) for _ in range(m)
        ]
        rows = [(s, d) for s, d in rows if s != d] or [(0, 1)]
        out_pr, out_lpa = [], []
        for enabled in (True, False):
            orig = G.GENERAL_DRIVER_TIER_ENABLED
            G.GENERAL_DRIVER_TIER_ENABLED = enabled
            try:
                e = spark.createDataFrame(rows, "src int, dst int")
                out_pr.append(
                    sorted(
                        (r["node"], r["rank_units"])
                        for r in G.pagerank_intexact(e, iters=3).collect()
                    )
                )
                ew = spark.createDataFrame(
                    [(s, d, 1 + (s + d) % 3) for s, d in rows],
                    "src int, dst int, w long",
                )
                out_lpa.append(
                    sorted(
                        map(
                            tuple,
                            G.lpa_communities(
                                ew, src="src", dst="dst", weight="w", iters=3
                            ).collect(),
                        )
                    )
                )
            finally:
                G.GENERAL_DRIVER_TIER_ENABLED = orig
        assert out_pr[0] == out_pr[1], (draw, rows)
        assert out_lpa[0] == out_lpa[1], (draw, rows)
