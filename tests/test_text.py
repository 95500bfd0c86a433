"""Text analysis scalar layer: tokens, shingles, language ID, quality."""

import math

import pyspark.sql.functions as F

from hadoop_data_lake_spark.functions.text import (
    lang_id,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col(F.col("t")).alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b c", token_count) == 3
    assert _one(spark, "single", token_count) == 1


def test_shingles_short_text_falls_back_to_whole(spark):
    assert _one(spark, "a b", lambda c: shingles(c, 3)) == ["a b"]
    assert _one(spark, "a b c d", lambda c: shingles(c, 3)) == ["a b c", "b c d"]
    # distinct: repeated shingles collapse
    assert _one(spark, "x x x x", lambda c: shingles(c, 3)) == ["x x x"]


def test_lang_id(spark):
    assert _one(spark, "the cat is on the mat and happy", lang_id) == "en"
    assert _one(spark, "der hund ist gut und treu", lang_id) == "de"
    assert _one(spark, "el perro es grande y fuerte", lang_id) == "es"
    assert _one(spark, "xyzzy plugh qwerty", lang_id) == "und"
    # 'la de' tie between es and fr resolves lexicographically -> es
    assert _one(spark, "la de", lang_id) == "es"


def test_quality_score_bounds_and_monotonicity(spark):
    low = _one(spark, "spam spam spam spam", quality_score)
    high = _one(spark, "the quick brown fox is one of a kind and jumps", quality_score)
    assert 0.0 <= low <= 1.0 and 0.0 <= high <= 1.0
    assert high > low


def test_stopword_ratio(spark):
    assert math.isclose(_one(spark, "the fox", stopword_ratio), 0.5)
    assert _one(spark, "fox wolf", stopword_ratio) == 0.0


def test_quality_gopher_filters_rules(spark):
    """Planted docs on both sides of each rule boundary."""
    from hadoop_data_lake_spark.queries import northstar_queries as NS
    import hadoop_data_lake_spark.core.io as io

    # 48 words: unique content words interleaved with stopwords -> every
    # 2-gram distinct, stopword-rich, clean digits
    good = " ".join(f"the word{i}" for i in range(24))
    short = "tiny doc"                                    # fails word count
    digits = " ".join(["123456789"] * 50)                 # fails digits + stopwords
    spam = " ".join(["buy"] * 60)                         # fails repetition
    docs = spark.createDataFrame(
        [(1, good, "en", "s", len(good)), (2, short, "en", "s", len(short)),
         (3, digits, "en", "s", len(digits)), (4, spam, "en", "s", len(spam))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = io.read_table
    try:
        io.read_table = lambda sp, sf, name, validate=True: docs
        NS.read_table = io.read_table
        out = {r["doc_id"]: r for r in NS.quality_gopher_filters(spark, "ignored").collect()}
    finally:
        io.read_table = orig
        NS.read_table = orig
    assert out[1]["keep"] is True and out[1]["ok_repetition"] is True
    assert out[2]["keep"] is False and out[2]["ok_word_count"] is False
    assert out[3]["keep"] is False and out[3]["ok_digit_ratio"] is False
    assert out[4]["keep"] is False and out[4]["ok_repetition"] is False
    assert out[4]["dup_2gram_ratio"] > 0.9


def test_pii_redact_counts_and_rewrite(spark):
    """doc_id 77 gets an email (77%7==0) AND a phone (77%11==0); the md5
    must reflect both substitutions."""
    from hadoop_data_lake_spark.queries import northstar_queries as NS
    import hashlib
    import hadoop_data_lake_spark.core.io as io

    docs = spark.createDataFrame(
        [(77, "hello world", "en", "s", 11), (5, "plain text", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = io.read_table
    try:
        io.read_table = lambda sp, sf, name, validate=True: docs
        NS.read_table = io.read_table
        out = {r["doc_id"]: r for r in NS.pii_redact(spark, "ignored").collect()}
    finally:
        io.read_table = orig
        NS.read_table = orig
    assert out[77]["n_emails"] == 1 and out[77]["n_phones"] == 1
    expected = hashlib.md5(b"hello world contact [EMAIL] call [PHONE]").hexdigest()
    assert out[77]["redacted_md5"] == expected
    assert out[5]["n_emails"] == 0 and out[5]["n_phones"] == 0
    assert out[5]["redacted_md5"] == hashlib.md5(b"plain text").hexdigest()


def test_decontaminate_finds_planted_overlap(spark):
    """Doc 97*2=194 is a probe (id % 97 == 0); doc 7 copies 5 of its words
    -> >= 2 shared 3-grams; doc 8 shares nothing."""
    from hadoop_data_lake_spark.queries import northstar_queries as NS
    import hadoop_data_lake_spark.core.io as io

    probe = "alpha beta gamma delta epsilon zeta eta theta"
    leak = "alpha beta gamma delta epsilon unrelated words here"
    clean = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(194, probe, "en", "s", 1), (7, leak, "en", "s", 1), (8, clean, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = io.read_table
    try:
        io.read_table = lambda sp, sf, name, validate=True: docs
        NS.read_table = io.read_table
        rows = NS.decontaminate_ngram_overlap(spark, "ignored").collect()
    finally:
        io.read_table = orig
        NS.read_table = orig
    got = {(r["doc_id"], r["probe_id"]): r["n_shared"] for r in rows}
    assert got == {(7, 194): 3}  # 3 shared 3-grams from the 5-word overlap


def test_source_mix_rebalance_hits_target(spark):
    """Kept counts per domain approach the smallest domain's size; decisions
    are deterministic across reruns."""
    from hadoop_data_lake_spark.queries.northstar_queries import source_mix_rebalance

    out = source_mix_rebalance(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    kept = {}
    totals = {}
    for r in rows:
        totals[r["domain"]] = totals.get(r["domain"], 0) + 1
        if r["keep"]:
            kept[r["domain"]] = kept.get(r["domain"], 0) + 1
    min_n = min(totals.values())
    # every domain's kept count lands near the target (hash-threshold
    # sampling binomial tolerance), and the smallest keeps ~everything
    for dom, n in totals.items():
        assert kept[dom] <= n
        assert abs(kept[dom] - min_n) <= max(5, 0.35 * min_n)
    again = {(r["doc_id"], r["keep"]) for r in source_mix_rebalance(spark, "/root/testdata/sf0.01").collect()}
    assert again == {(r["doc_id"], r["keep"]) for r in rows}


def test_approx_top_k_overlaps_exact(spark):
    import pyspark.sql.functions as F

    from hadoop_data_lake_spark.core.io import read_table
    from hadoop_data_lake_spark.queries.northstar_queries import (
        token_heavy_hitters_approx,
    )
    from tests.conftest import SF_DIR

    approx = {r["token"] for r in token_heavy_hitters_approx(spark, SF_DIR).collect()}
    toks = (
        read_table(spark, SF_DIR, "documents")
        .select(F.explode_outer(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    exact = [
        r["tok"]
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
        .collect()
    ]
    # the sketch must recover at least 80% of the true top-20 (in practice
    # it is exact on this vocabulary size)
    assert len(approx & set(exact)) >= 16


def test_kneser_ney_probabilities_sum_to_one_per_prefix(spark):
    """Interpolated KN is a proper distribution: for every prefix w1,
    sum over observed w2 of P(w2|w1) plus the continuation mass assigned
    to UNOBSERVED successors... restricted to the closed vocab here, the
    sum over ALL vocab successors equals 1. Verify on a tiny corpus by
    direct enumeration."""
    import itertools
    from collections import Counter

    corpus = ["a b a c a b", "b a b c"]
    bigrams = []
    for doc in corpus:
        t = doc.split()
        bigrams += list(zip(t, t[1:]))
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1p_fwd = Counter(w1 for w1, _ in set(bigrams))
    n1p_bwd = Counter(w2 for _, w2 in set(bigrams))
    b_total = len(set(bigrams))
    vocab = sorted({w for doc in corpus for w in doc.split()})
    d = 0.75
    for w1 in c1:
        total = 0.0
        for w2 in vocab:
            total += max(c12[(w1, w2)] - d, 0.0) / c1[w1] + (
                d * n1p_fwd[w1] / c1[w1]
            ) * (n1p_bwd[w2] / b_total)
        # sums to 1 iff continuation distribution is normalized over the
        # closed vocab: sum n1p_bwd = b_total by construction.
        assert abs(total - 1.0) < 1e-9, (w1, total)


def test_kneser_ney_query_scores_every_multiword_doc(spark):
    from hadoop_data_lake_spark.queries.northstar_queries import doc_lm_kneser_ney

    out = doc_lm_kneser_ney(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    assert all(r["kn_entropy_bits"] is not None and r["kn_entropy_bits"] > 0 for r in out)
