"""PII redaction, benchmark decontamination, and mixture sampling tests.

Oracles are plain Python (``re`` over the same patterns, set-based n-gram
overlap, exact mixture arithmetic) — independent of both Spark and DuckDB,
so a shared transcription bug cannot hide. All three operators must be
deterministic and partitioning-invariant.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators.decontam import decontaminate, word_ngrams
from datavalidation_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
from datavalidation_spark.operators.sampling import hash_rank, sample_mixture


# ---------------------------------------------------------------- PII

PII_DOC = (
    "reach me at jane.doe+spam@corp.example.io or 555-867-5309 "
    "ssn 987-65-4321 host 192.168.1.254 done"
)


def test_pii_counts_and_redaction_match_python_re(spark):
    rows = [
        ("a", PII_DOC),
        ("b", "no pii here at all"),
        ("c", "two mails: x@y.co and z@w.org plus ip 8.8.8.8"),
        ("d", ""),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    c = pii_counts(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c[k].alias(f"n_{k}") for k, _, _ in PII_PATTERNS],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    for rid, text in rows:
        red = text
        for kind, pat, token in PII_PATTERNS:
            assert out[rid][f"n_{kind}"] == len(re.findall(pat, text)), (
                rid,
                kind,
            )
            red = re.sub(pat, token.replace("\\", "\\\\"), red)
        assert out[rid]["red"] == red, rid


def test_pii_redaction_is_idempotent(spark):
    df = spark.createDataFrame([("a", PII_DOC)], "id string, text string")
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert once.first()["t"] == twice.first()["t"]
    assert "[EMAIL]" in once.first()["t"]
    assert "[SSN]" in once.first()["t"]
    assert "[PHONE]" in once.first()["t"]
    assert "[IPV4]" in once.first()["t"]


# ------------------------------------------------------- decontamination


def _py_ngrams(text, n):
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame([("one two three",)], "text string")
    got = df.select(word_ngrams(F.col("text"), 4).alias("g")).first()["g"]
    assert got == []
    got3 = df.select(word_ngrams(F.col("text"), 3).alias("g")).first()["g"]
    assert got3 == ["one two three"]


def test_decontaminate_matches_python_overlap(spark):
    bench_rows = [(100, "the quick brown fox jumps over the lazy dog")]
    train_rows = [
        (1, "a quick brown fox jumps over everything else entirely"),
        (2, "totally unrelated text with no overlap whatsoever here"),
        (3, "the quick brown fox jumps over the lazy dog again"),
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    n = 4
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, bench, n=n).collect()
    }
    bench_grams = set().union(
        *(_py_ngrams(t, n) for _, t in bench_rows)
    )
    for doc_id, text in train_rows:
        hits = len(_py_ngrams(text, n) & bench_grams)
        assert got[doc_id] == (hits, hits > 0), doc_id
    assert got[3][1] and not got[2][1]


def test_decontaminate_partitioning_invariant(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[((F.col("id") * 7 + i) % 23).cast("string") for i in range(12)],
        ).alias("text"),
    )
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    a = sorted(map(tuple, decontaminate(train, bench, n=4).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(
                train.repartition(7), bench.coalesce(1), n=4
            ).collect(),
        )
    )
    assert a == b and len(a) == 190


# ------------------------------------------------------ mixture sampling


def _py_hash_rank(key, salt):
    return int(
        hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8], 16
    )


def test_sample_mixture_matches_python_arithmetic(spark):
    rows = [(i, ["a", "b", "c", "drop"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    targets = {"a": 0.6, "b": 0.3, "c": 0.1}
    got = {
        r["doc_id"]
        for r in sample_mixture(
            df, "stratum", targets, key_col="doc_id", salt="s"
        ).collect()
    }
    counts = {s: sum(1 for _, x in rows if x == s) for s in targets}
    n_out = min(counts[s] / targets[s] for s in targets)
    expect = set()
    for doc_id, s in rows:
        if s not in targets:
            continue
        keep = min(1.0, n_out * targets[s] / counts[s])
        if _py_hash_rank(doc_id, "s") < int(keep * 4294967296.0):
            expect.add(doc_id)
    assert got == expect
    # 'drop' stratum has zero weight: nothing from it survives
    assert all(rows[d][1] != "drop" for d in got)


def test_sample_mixture_binding_stratum_keeps_everything(spark):
    # stratum 'b' is the binding one (count/target smallest): keep = 1.0
    rows = [(i, "a") for i in range(300)] + [(i + 1000, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = sample_mixture(
        df, "stratum", {"a": 0.5, "b": 0.5}, key_col="doc_id", salt="x"
    )
    kept_b = out.where(F.col("stratum") == "b").count()
    assert kept_b == 10
    # and the mixture lands near the target: a ≈ b
    kept_a = out.where(F.col("stratum") == "a").count()
    assert 3 <= kept_a <= 25  # Binomial(300, 10/300): mean 10


def test_hash_rank_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    got = {
        r["k"]: r["hr"]
        for r in df.select(
            "k", hash_rank(F.col("k"), "salt").alias("hr")
        ).collect()
    }
    for k in range(50):
        assert got[k] == _py_hash_rank(k, "salt")


def test_contaminated_spans_islands(spark):
    """Span-level decontamination: overlapping hit grams merge into one
    range, disjoint hits stay separate, and offsets are exact (1-based
    inclusive token positions) vs a hand-computed expectation."""
    from datavalidation_spark.operators.decontam import contaminated_spans

    bench = spark.createDataFrame(
        [(100, "aa bb cc dd"), (101, "bb cc dd ee"), (102, "xx yy zz ww")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # tokens:       1  2  3  4  5  6  7  8  9 10 11 12 13
            (1, "aa bb cc dd ee q1 q2 q3 q4 xx yy zz ww"),
            #   hits at s=1 ("aa bb cc dd") and s=2 ("bb cc dd ee")
            #   -> merged island covering tokens 1..5;
            #   hit at s=10 ("xx yy zz ww") -> separate island 10..13
            (2, "no contamination in this document at all today friends"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_len"])
        for r in contaminated_spans(train, bench, n=4).collect()
    }
    assert rows == {(1, 1): (5, 5), (1, 10): (13, 4)}


def test_contaminated_spans_adjacent_merge_boundary(spark):
    """Two hits exactly n apart touch (prev covers s..s+n-1, next starts at
    s+n) -> one island; n+1 apart -> a 1-token gap -> two islands."""
    from datavalidation_spark.operators.decontam import contaminated_spans

    bench = spark.createDataFrame(
        [(100, "aa bb"), (101, "cc dd"), (102, "ee ff")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # n=2: hit at s=1 covers 1-2; "cc dd" at s=3 covers 3-4 (touching)
            (1, "aa bb cc dd q1 q2"),
            # hit at s=1 covers 1-2; "ee ff" at s=4 covers 4-5 (gap at 3)
            (2, "aa bb q1 ee ff q2"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in contaminated_spans(train, bench, n=2).collect()
    }
    assert got == {(1, 1, 4), (2, 1, 2), (2, 4, 5)}
