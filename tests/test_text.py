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
