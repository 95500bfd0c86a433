"""Span-level corpus operators for training-data preparation.

- span_dedup_corpus: cross-document exact span deduplication — the practical
  approximation of exact substring dedup ("Deduplicating Training Data Makes
  Language Models Better", Lee et al. 2022: their suffix-array pass removes
  repeated spans; at pipeline scale the standard relaxation is fixed-width
  token windows, which needs only hash joins). Every occurrence of a span
  except its first (smallest (doc_id, span_idx)) is dropped, and documents
  are reassembled from their surviving spans.

- token_budget_truncate: per-source token accounting under a fixed per-doc
  token budget — the bookkeeping stage a mixture builder runs before
  packing: how many tokens each source contributes once every doc is capped.

Both are pure built-in column ops (split/slice/explode/hash-agg): JVM-side,
shuffle-bounded by span/doc keys, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_spans(df: DataFrame, id_col: str, text_col: str, width: int) -> DataFrame:
    """(id, span_idx, span_text) — consecutive non-overlapping `width`-word
    windows per document (last span may be shorter).

    The token array is bound to a column referenced twice in the downstream
    projection (lambda + size), so CollapseProject does not inline the
    split() into the transform lambda — HOF lambda bodies re-evaluate
    non-lambda subexpressions per element, which would make this O(len^2)
    per doc (same pitfall as functions/text.shingles).

    NULL text coalesces to '' (one empty span) so Spark and the DuckDB
    oracle agree on row counts — posexplode_outer over split(NULL) would
    emit a (null, null) span row the SQL's unnest(range(len(NULL))) drops
    (ADVICE r3)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("w"),
    )
    spans = toks.select(
        "doc",
        F.size("w").alias("n_words"),
        F.expr(
            f"transform(sequence(0, cast(ceil(size(w) / {width}.0) as int) - 1), "
            f"i -> array_join(slice(w, i * {width} + 1, {width}), ' '))"
        ).alias("spans"),
    )
    return spans.select(
        "doc", F.posexplode_outer("spans").alias("span_idx", "span_text")
    )


def span_dedup_corpus(
    df: DataFrame, id_col: str, text_col: str, width: int = 5
) -> DataFrame:
    """Cross-document span dedup: a span survives only at its globally first
    occurrence (lexicographically smallest (doc_id, span_idx)).

    Single-pass plan: the span stream is evaluated ONCE — a row_number
    window keyed on span_text flags each occurrence's global rank, then one
    hash aggregation per doc rebuilds the text from rank-1 spans
    (collect_list skips the NULLed-out losers). Exactly two shuffles
    (span_text, then doc), no self-join. An earlier agg-argmin + semi-join
    draft was rejected by plan audit: its three branches re-executed the
    tokenize/explode subtree three times (alias-differing subtrees get no
    ReusedExchange) — three corpus scans at 100 TB. Window groups here are
    per-span (tiny), so the window sort that loses to hash-agg argmin on
    heavy groups (the nearest_city case) is immaterial.

    Output: one row per input doc with span-level kept/total counts and the
    reassembled text ('' when every span was a repeat).
    """
    from pyspark.sql import Window

    occ = doc_spans(df, id_col, text_col, width)
    w = Window.partitionBy("span_text").orderBy("doc", "span_idx")
    flagged = occ.withColumn("rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("span_idx", "span_text")
                            )
                        )
                    ),
                    lambda s: s["span_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            F.col("doc").alias(id_col), "n_spans", "n_kept", "clean_text"
        )
    )


def token_budget_truncate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    budget: int,
) -> DataFrame:
    """Per-source token accounting under a per-document token cap.

    Every doc keeps at most `budget` leading tokens; the rollup reports, per
    source: docs, raw tokens, tokens surviving the cap, and how many docs
    were actually truncated. Single scan, map-side partial agg, one shuffle
    on the (low-cardinality) source key.
    """
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.size(F.split(text_col, " ")).alias("n_tokens"),
    ).withColumn("n_kept", F.least(F.col("n_tokens"), F.lit(budget)))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_kept").alias("kept_tokens"),
            F.sum((F.col("n_tokens") > budget).cast("long")).alias("n_truncated"),
        )
    )
