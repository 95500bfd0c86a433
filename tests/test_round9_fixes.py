"""Regression tests for the round-9 fixes (driver ADVICE r8):

1. rolling_zscore_anomaly overflow band — the advisor noted the n*s2
   product (decimal(18,0) x decimal(38,0), capped at decimal(38,0))
   errors under ANSI once n*s2 >= 1e38 while the DuckDB oracle's hugeint
   tops out at ~1.7e38, so the engines could diverge (error vs result)
   in that narrow band. The band is unreachable under the documented
   operational envelope (24 h window of <= 1e7 events at <= 1e6 cents,
   events_queries.py rolling_zscore_anomaly comment); this test computes
   the worst-case magnitude of EVERY intermediate from that envelope
   with Python ints (overflow-immune) and asserts >= 10 orders of
   headroom below the 1e38 ceiling — the bound is machine-checked, not
   prose (same closure pattern as pca_power_iterate, VERDICT r7 item 4).
2. backlog_report._parse_blocks — now ast-based. The old line scanner
   counted \"\"\" and ''' naively per line, so a ''' inside a
   \"\"\"-docstring mis-toggled the in-string state and could mis-date
   blocks in the --stale re-grade ladder (it over-marked 7 queries
   stale at round-9 start). The ast parser must key every top-level
   def/class/assignment, span decorators, keep column-0 SQL inside a
   string constant out of phantom blocks, and survive the
   mixed-triple-quote shapes that broke the scanner.
3. bench.py streaming reps — `min(2, reps)` silently reverted streams
   to single-rep timing under SPARK_GRAFT_BENCH_REPS=1, the exact noise
   mode best-of-2 exists to prevent. Streams are now pinned at 2.
4. degenerate_sweep target selection — every query now runs against
   every corpus (selection by the tables a query actually READS, via
   fail-fast PATH_NOT_FOUND on the events-only corpora), and the
   missing-file skip no longer applies to the table-based corpora where
   every table is present, so a genuine missing-table regression counts
   as a crash there.
"""

import pytest


# ---------------------------------------------------------------------------
# 1. rolling_zscore_anomaly: the ANSI-vs-hugeint divergence band is
#    unreachable under the documented envelope
# ---------------------------------------------------------------------------

# Operational envelope documented in events_queries.rolling_zscore_anomaly:
# a user's trailing 24 h RANGE window holds at most ~1e7 events (100+/sec
# sustained per user) and |value| <= 1e4 currency units = 1e6 cents.
ENVELOPE_MAX_WINDOW_ROWS = 10**7
ENVELOPE_MAX_ABS_CENTS = 10**6

SPARK_DECIMAL38_CEILING = 10**38  # ANSI decimal(38,0) overflow point
DUCKDB_HUGEINT_CEILING = 17 * 10**37  # ~1.7e38: where the oracle errors too


def test_rolling_zscore_divergence_band_unreachable_under_envelope():
    n = ENVELOPE_MAX_WINDOW_ROWS
    vc = ENVELOPE_MAX_ABS_CENTS
    # Worst-case magnitudes of every intermediate the query materializes,
    # computed with arbitrary-precision ints:
    s1 = n * vc  # bigint window sum (also must fit decimal(19,0))
    s2 = n * vc * vc  # sum of dprod(vc, vc)
    intermediates = {
        "s1": s1,
        "s1_squared": s1 * s1,
        "s2": s2,
        "n_times_s2": n * s2,  # the ADVICE-flagged product
        "var_int": n * s2 + s1 * s1,  # |n*s2 - s1^2| <= this
        "dev": vc * n + s1,  # |vc*n - s1| <= this
        "four_dev_sq": 4 * (vc * n + s1) ** 2,
        "nine_var": 9 * (n * s2 + s1 * s1),
    }
    assert s1 < 10**19, "s1 must fit the decimal(19,0) cast"
    for name, mag in intermediates.items():
        # >= 10 orders of headroom below BOTH ceilings: the band where
        # Spark errors but DuckDB still answers cannot be entered.
        assert mag * 10**10 < SPARK_DECIMAL38_CEILING, (
            f"{name} worst case {mag:.3e} is within 10 orders of the "
            f"decimal(38) ceiling — the divergence band is reachable"
        )
    assert SPARK_DECIMAL38_CEILING < DUCKDB_HUGEINT_CEILING


def test_rolling_zscore_envelope_matches_documentation():
    """The envelope constants above are only meaningful while the query's
    in-code documentation still claims the same bounds — fail if the
    comment drifts away from what this test checks."""
    import inspect

    import hadoop_data_lake_spark.queries.events_queries as EV

    src = inspect.getsource(EV.rolling_zscore_anomaly)
    assert "1e7 events" in src and "1e6 cents" in src, (
        "rolling_zscore_anomaly no longer documents the 1e7-events/"
        "1e6-cents envelope this test derives its bounds from — update "
        "both together"
    )


# ---------------------------------------------------------------------------
# 2. backlog_report._parse_blocks: ast-exact block extents
# ---------------------------------------------------------------------------

_MIXED_QUOTES_MODULE = (
    "import os\n"
    "\n"
    "def alpha():\n"
    '    """doc with a stray \'\'\' inside"""\n'
    "    return 1\n"
    "\n"
    'BETA_SQL = """\n'
    "SELECT 1\n"
    "FROM t\n"
    '"""\n'
    "\n"
    "@staticmethod\n"
    "def gamma():\n"
    "    return 2\n"
    "\n"
    "DELTA: int = 3\n"
)


def test_parse_blocks_survives_mixed_triple_quotes():
    from tools.backlog_report import _parse_blocks

    blocks = _parse_blocks(_MIXED_QUOTES_MODULE)
    assert set(blocks) == {"alpha", "BETA_SQL", "gamma", "DELTA"}
    # The stray ''' inside alpha's """-docstring must not leak state: the
    # column-0 SQL lines belong to BETA_SQL, not to a phantom block and
    # not to alpha.
    assert "SELECT 1" in blocks["BETA_SQL"]
    assert "SELECT 1" not in blocks["alpha"]
    assert blocks["alpha"].startswith("def alpha")
    # Decorators are part of the block (a decorator edit re-dates it).
    assert blocks["gamma"].startswith("@staticmethod")
    assert blocks["DELTA"] == "DELTA: int = 3"


def test_parse_blocks_block_identity_is_stable_under_comment_gaps():
    """Inter-block comments/blank lines belong to no block: adding a
    comment BETWEEN two functions must not re-date either of them."""
    from tools.backlog_report import _parse_blocks

    before = "def a():\n    return 1\n\ndef b():\n    return 2\n"
    after = "def a():\n    return 1\n\n# a new comment\n\ndef b():\n    return 2\n"
    assert _parse_blocks(before) == _parse_blocks(after)


# ---------------------------------------------------------------------------
# 3. bench.py: stream queries always get best-of-2
# ---------------------------------------------------------------------------

def test_bench_stream_reps_pinned_at_two():
    """SPARK_GRAFT_BENCH_REPS=1 must NOT revert streams to single-rep
    timing (driver-ADVICE r8). The rep-count expression is pinned: no
    `min(2, reps)` reintroduction."""
    import re

    src = open("bench.py").read()
    m = re.search(r"n_reps = (.+?) if name\.startswith\(\"stream_\"\)", src)
    assert m, "bench.py stream rep-count expression not found"
    assert m.group(1).strip() == "2", m.group(1)


# ---------------------------------------------------------------------------
# 4. degenerate_sweep: missing-file skip is events-corpora-only and the
#    module-based target filter is gone
# ---------------------------------------------------------------------------

def test_degenerate_sweep_skip_is_events_only():
    src = open("tools/degenerate_sweep.py").read()
    assert "cname in events_cases" in src, (
        "the PATH_NOT_FOUND skip must be gated on the events-only corpora"
    )
    assert "ev_targets" not in src, (
        "the defining-module target filter is back — selection must be by "
        "the tables a query actually reads"
    )


# ---------------------------------------------------------------------------
# 5. backlog_report cross-module stale attribution (round-9): a rewrite of
#    an operators/ or functions/ block must re-date the queries calling it
# ---------------------------------------------------------------------------

def test_import_maps_resolve_symbols_and_module_aliases():
    from tools.backlog_report import _import_maps

    maps = _import_maps([
        "hadoop_data_lake_spark/queries/events_queries.py",
        "hadoop_data_lake_spark/queries/northstar_queries.py",
    ])
    # direct-symbol import (inside a function body — ast.walk must see it)
    assert maps["hadoop_data_lake_spark/queries/events_queries.py"].get(
        "to_units"
    ) == ("hadoop_data_lake_spark/functions/fixedpoint.py", "to_units")
    # module-alias import: `from ...operators import dedup as DD`
    assert maps["hadoop_data_lake_spark/queries/northstar_queries.py"].get(
        "DD"
    ) == ("hadoop_data_lake_spark/operators/dedup.py", None)


def test_package_modules_exclude_core_and_registry():
    from tools.backlog_report import _package_modules

    mods = _package_modules()
    assert mods, "package module walk must find operators/functions"
    assert not any("/core/" in p for p in mods), (
        "core/ must stay out of the hop: read_table is imported by every "
        "query, so a core edit would re-date the whole registry at once"
    )
    assert not any(p.endswith("registry.py") for p in mods)
    assert any(p.endswith("operators/dedup.py") for p in mods)
    assert any(p.endswith("functions/fixedpoint.py") for p in mods)


# ---------------------------------------------------------------------------
# 6. empty-input guards (r9 empty-corpus axis): iterative operators must
#    return empty stable-schema frames, never divide or index by zero
# ---------------------------------------------------------------------------

def test_pagerank_variants_empty_edges(spark):
    from hadoop_data_lake_spark.operators.graph import pagerank, pagerank_intexact

    e = spark.createDataFrame([], "src long, dst long")
    out_f = pagerank(e, max_iter=3)
    assert out_f.columns == ["vertex", "rank"] and out_f.count() == 0
    out_i = pagerank_intexact(e, iters=3)
    assert out_i.columns == ["node", "rank_units"] and out_i.count() == 0


def test_kmeans_and_pq_empty_corpus(spark):
    import numpy as np

    from hadoop_data_lake_spark.operators.similarity import (
        ivf_kmeans_topk,
        kmeans_fit_assign,
        pq_train,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    centers, assigned = kmeans_fit_assign(emb, k=4, max_iter=2)
    assert len(centers) == 0 and assigned.count() == 0
    assert "cell" in assigned.columns

    books = pq_train(emb, m=8, nbits=4, dim=64)
    assert books.shape == (8, 16, 8) and not np.any(books)

    out = ivf_kmeans_topk(emb, emb, k=5, n_cells=4, max_iter=2)
    assert out.columns == ["query_id", "neighbor_id", "sim_r", "rnk"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# 7. plan_audit FACT-RESCAN check (r9 scan-multiplicity campaign)
# ---------------------------------------------------------------------------

_FAKE_PLAN = "\n".join(
    [
        "*(1) Project [a]",
        "+- FileScan parquet [a] ... Location: InMemoryFileIndex(1 paths)[file:/d/events.parquet]",
        "+- FileScan parquet [a] ... Location: InMemoryFileIndex(1 paths)[file:/d/events.parquet]",
        "+- FileScan parquet [a] ... Location: InMemoryFileIndex(1 paths)[file:/d/events.parquet]",
        "+- FileScan parquet [a] ... Location: InMemoryFileIndex(1 paths)[file:/d/events.parquet]",
        "+- FileScan parquet [b] ... Location: InMemoryFileIndex(1 paths)[file:/d/nation.parquet]",
        "+- FileScan parquet [b] ... Location: InMemoryFileIndex(1 paths)[file:/d/nation.parquet]",
        "+- FileScan parquet [c] ... Location: InMemoryFileIndex(1 paths)[file:/d/orders.parquet]",
        "   events.parquet mentioned on an unrelated plan line must not count",
    ]
)


def test_fact_rescans_counts_only_filescan_lines():
    from tools.plan_audit import fact_rescans

    r = fact_rescans(_FAKE_PLAN)
    assert r == {"events": 4}, r  # nation is a dim; orders appears once


def test_fact_rescan_allowlist_empty():
    """r10: every exemption is closed — the control-freeze family fell at
    the control re-baseline (index-frame checkpoints), the multi-layer
    report through the shared operators, and the two snapshot sims by
    checkpointing the single projected base their simulated old/new
    snapshots derive from. A future entry must be a named, reviewed
    addition, not a leftover."""
    from tools.plan_audit import FACT_RESCAN_ALLOW

    assert FACT_RESCAN_ALLOW == set()
