"""Span-level corpus operators: cross-doc span dedup, token budgets."""

import pytest

from hadoop_data_lake_spark.operators.spans import (
    doc_spans,
    span_dedup_corpus,
    token_budget_truncate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1: two spans; its first span recurs verbatim in docs 2 and 3.
        (1, "a b c d e f g h i j"),
        (2, "a b c d e x y z w v"),
        (3, "p q r s t a b c d e"),
        (4, "unique words only here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_spans_window_shape(corpus):
    occ = doc_spans(corpus, "doc_id", "text", width=5).collect()
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r["doc"], []).append((r["span_idx"], r["span_text"]))
    assert sorted(by_doc[1]) == [(0, "a b c d e"), (1, "f g h i j")]
    assert sorted(by_doc[4]) == [(0, "unique words only here now")]


def test_span_dedup_keeps_first_occurrence_only(corpus):
    out = {r["doc_id"]: r for r in span_dedup_corpus(corpus, "doc_id", "text", width=5).collect()}
    # doc 1 owns the first occurrence of 'a b c d e' -> keeps everything
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "a b c d e f g h i j"
    # doc 2's first span is a repeat -> dropped; second span survives
    assert out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "x y z w v"
    # doc 3 repeats the span at span_idx 1 -> only its first span survives
    assert out[3]["n_kept"] == 1
    assert out[3]["clean_text"] == "p q r s t"
    # untouched doc
    assert out[4]["n_kept"] == 1 and out[4]["clean_text"] == "unique words only here now"
    # every input doc appears exactly once, even if fully deduped away
    assert len(out) == 4


def test_span_dedup_fully_duplicated_doc_yields_empty_text(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup_corpus(df, "doc_id", "text", width=5).collect()}
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""


def test_span_dedup_null_text_counts_one_empty_span(spark):
    """NULL text coalesces to '' (ADVICE r3): the doc still appears, with
    exactly one (empty) span — matching the DuckDB oracle's row count
    instead of emitting a (null, null) span row the SQL would drop."""
    rows = [(1, "a b c d e"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup_corpus(df, "doc_id", "text", width=5).collect()}
    assert len(out) == 2
    assert out[2]["n_spans"] == 1 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == ""


def test_token_budget_truncate_accounting(spark):
    rows = [
        (1, "one two three four", "web"),
        (2, "one two", "web"),
        (3, "a b c d e f", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in token_budget_truncate(df, "doc_id", "text", "source", budget=3).collect()}
    assert out["web"]["n_docs"] == 2
    assert out["web"]["total_tokens"] == 6
    assert out["web"]["kept_tokens"] == 5       # 3 capped + 2 uncapped
    assert out["web"]["n_truncated"] == 1
    assert out["books"]["kept_tokens"] == 3 and out["books"]["n_truncated"] == 1
