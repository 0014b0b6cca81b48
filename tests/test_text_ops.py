"""Planted-value tests for the pure-Column text-analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.operators.text import repetition_signals


def _signals(spark, text, n=2):
    df = spark.createDataFrame([(text,)], "text string")
    rep = repetition_signals(F.col("text"), n=n)
    row = df.select(
        F.round(rep["dup_ngram_frac"], 6).alias("dup"),
        F.round(rep["top_token_frac"], 6).alias("top"),
    ).first()
    return row.dup, row.top


def test_degenerate_repetition(spark):
    # 5 identical tokens: bigrams = 4, distinct = 1 → dup 3/4; top 5/5
    dup, top = _signals(spark, "a a a a a")
    assert (dup, top) == (0.75, 1.0)


def test_unique_tokens(spark):
    dup, top = _signals(spark, "one two three four")
    assert (dup, top) == (0.0, 0.25)


def test_templated_text_scores_between(spark):
    # "x y" repeated 3 times: 5 bigrams, distinct {x y, y x} → dup 3/5
    dup, top = _signals(spark, "x y x y x y")
    assert (dup, top) == (0.6, 0.5)


def test_short_and_empty(spark):
    assert _signals(spark, "solo") == (0.0, 1.0)
    assert _signals(spark, "   ") == (0.0, 0.0)
