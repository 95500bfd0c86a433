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
    per doc (same pitfall as functions/text.shingles)."""
    toks = df.select(F.col(id_col).alias("doc"), F.split(text_col, " ").alias("w"))
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

    Winner selection is a hash aggregation (min over a (doc, idx) struct per
    span key) + semi-join back — one shuffle on span_text and one on the
    composite key, no window sort (the same argmin-by-agg plan shape that
    beat row_number in nearest_city). Output: one row per input doc with the
    span-level kept/total counts and the reassembled text ('' when every
    span was a repeat).
    """
    occ = doc_spans(df, id_col, text_col, width)

    winners = occ.groupBy("span_text").agg(
        F.min(F.struct("doc", "span_idx")).alias("first_occ")
    )
    kept = occ.join(
        winners.select(
            F.col("first_occ.doc").alias("doc"),
            F.col("first_occ.span_idx").alias("span_idx"),
            "span_text",
        ),
        ["doc", "span_idx", "span_text"],
        "left_semi",
    )
    kept_per_doc = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span_text"))),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = occ.groupBy("doc").agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        totals.join(kept_per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
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
