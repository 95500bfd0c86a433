"""Distributed BPE training/segmentation vs a serial reference
implementation (functions/bpe.py)."""

from collections import Counter

import pyspark.sql.functions as F
import pytest

from hadoop_data_lake_spark.functions.bpe import bpe_segment, bpe_train, _merge_word

CORPUS = "low low low lower lower newest newest newest newest widest"


def _serial_bpe(text: str, num_merges: int):
    """Textbook serial BPE on a word-frequency dict."""
    freqs = Counter(text.split())
    words = {tuple(list(w) + ["</w>"]): c for w, c in freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # same tie-break as the distributed trainer: count desc, pair asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {
            tuple(_merge_word(list(s), best)): c for s, c in words.items()
        }
    return merges


def test_bpe_train_matches_serial_reference(spark):
    docs = spark.createDataFrame([(1, CORPUS)], "doc_id long, text string")
    got = bpe_train(docs, num_merges=8)
    assert got == _serial_bpe(CORPUS, 8)
    # ('w','e') is the unique top pair: it occurs in both 'lower' (x2) and
    # 'newest' (x4) = 6, beating the 5-count ties (es/st/lo/ow)
    assert got[0] == ("w", "e")


def test_bpe_train_partitioning_invariant(spark):
    rows = [(i, CORPUS) for i in range(20)]
    a = bpe_train(spark.createDataFrame(rows, "doc_id long, text string"), num_merges=5)
    b = bpe_train(
        spark.createDataFrame(rows, "doc_id long, text string").repartition(7),
        num_merges=5,
    )
    assert a == b


def test_bpe_segment_roundtrip(spark):
    docs = spark.createDataFrame([(1, CORPUS)], "doc_id long, text string")
    merges = bpe_train(docs, num_merges=8)
    seg = bpe_segment(docs, merges).collect()[0]
    # tokens reassemble to the original text (</w> marks word ends)
    rebuilt = "".join(seg["tokens"]).replace("</w>", " ").strip()
    assert rebuilt == CORPUS
    assert seg["n_tokens"] == len(seg["tokens"])
    # merged symbols actually appear (not pure characters)
    assert any(len(t.replace("</w>", "")) > 1 for t in seg["tokens"])
