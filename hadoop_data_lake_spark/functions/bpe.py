"""Distributed byte-pair-encoding (BPE) tokenizer training.

The standard subword pipeline: start from characters, repeatedly merge the
most frequent adjacent symbol pair. The scale problem is the pair-count
step — at 100 TB that's a full-corpus aggregation per merge — so the
Spark-first shape is:

1. pre-aggregate the corpus to a WORD FREQUENCY table once (BPE counts are
   word-internal, so words collapse to (word, count) — typically 10^5-10^6
   distinct words for 10^11 tokens: the classic trick that makes BPE
   training corpus-size-independent after one scan);
2. each merge round counts adjacent pairs over the (distinct-word,
   count) table — a cheap explode + weighted sum — takes the argmax on the
   driver (one tiny row: the mini-state pattern), and applies the merge to
   the word symbol arrays executor-side;
3. ties break lexicographically, so the learned merge sequence is
   deterministic for a given corpus.

Training yields the merge list (the tokenizer model); `bpe_segment`
applies it to text. Both are pure-Python-per-word inside Arrow-batched
pandas UDFs (word-level work is tiny and data-parallel; the corpus-level
aggregations stay JVM-side).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace-split text — the one full-corpus scan."""
    return (
        docs.select(F.explode_outer(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_word(symbols: list, pair: tuple) -> list:
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges; returns the ordered merge list.

    Each round shuffles only the distinct-word table (pair explode +
    weighted count), never the corpus. localCheckpoint per round truncates
    the re-applied merge lineage (the connected-components lesson)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    words = (
        word_frequencies(docs, text_col)
        .withColumn(
            "syms",
            F.concat(
                F.split(F.col("word"), ""),
                F.array(F.lit(end_of_word)),
            ),
        )
        .select("syms", "cnt")
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            words.select(
                F.explode_outer(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                "cnt",
            )
            .where(F.col("p").isNotNull())
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = (pairs[0]["p"]["a"], pairs[0]["p"]["b"])
        merges.append(best)

        @pandas_udf(ArrayType(StringType()))
        def apply_merge(s: pd.Series) -> pd.Series:
            return s.map(lambda syms: _merge_word(list(syms), best))

        words = words.select(
            apply_merge(F.col("syms")).alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize text with a trained merge list: (id, tokens array<string>,
    n_tokens). Merges apply in training order per word — the standard BPE
    segmenter — inside one Arrow-batched pandas UDF pass."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    merge_list = list(merges)

    @pandas_udf(ArrayType(StringType()))
    def segment(texts: pd.Series) -> pd.Series:
        def seg_word(word: str) -> list:
            syms = list(word) + [end_of_word]
            for pair in merge_list:
                if len(syms) < 2:
                    break
                syms = _merge_word(syms, pair)
            return syms

        return texts.map(
            lambda t: [
                tok for w in (t or "").split(" ") if w for tok in seg_word(w)
            ]
        )

    out = docs.select(
        F.col(id_col),
        segment(F.col(text_col)).alias("tokens"),
    )
    return out.withColumn("n_tokens", F.size("tokens"))
