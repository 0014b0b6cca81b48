"""TF-IDF / BM25 operators (operators/tfidf.py) against hand-computed
expectations on a micro-fixture, plus shape/determinism properties.

Contract-level parity vs the DuckDB transcription is covered by
test_entry_contract.py (tfidf_topterms, bm25_search rows)."""

from __future__ import annotations

import math

import pytest

from datavalidation_spark.operators.tfidf import bm25_scores, term_counts, tfidf_top_terms

DOCS = [
    (0, "cat dog cat"),          # cat x2, dog x1
    (1, "dog bird"),
    (2, "cat fish fish fish"),
    (3, ""),                     # empty: contributes to N, no terms
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _idf_smooth(n, df):
    return math.log((1 + n) / (1 + df)) + 1.0


def test_term_counts(docs_df):
    rows = {(r.doc_id, r.term): r.tf for r in term_counts(docs_df).collect()}
    assert rows == {
        (0, "cat"): 2, (0, "dog"): 1,
        (1, "dog"): 1, (1, "bird"): 1,
        (2, "cat"): 1, (2, "fish"): 3,
    }


def test_tfidf_hand_checked(docs_df):
    out = {
        (r.doc_id, r.term): (r.tfidf, r.rank)
        for r in tfidf_top_terms(docs_df, k=2).collect()
    }
    n = 4  # empty doc counts toward N
    exp_fish = round(3 * _idf_smooth(n, 1), 6)
    exp_cat0 = round(2 * _idf_smooth(n, 2), 6)
    assert out[(2, "fish")] == (exp_fish, 1)
    assert out[(0, "cat")] == (exp_cat0, 1)
    # doc 1: dog and bird both tf=1; bird (df=1) out-scores dog (df=2)
    assert out[(1, "bird")][1] == 1
    assert out[(1, "dog")][1] == 2
    # k=2 cap holds and empty doc emits nothing
    assert all(rank <= 2 for _, rank in out.values())
    assert not any(d == 3 for d, _ in out)


def test_tfidf_tie_breaks_on_term(spark):
    df = spark.createDataFrame([(0, "b a")], "doc_id long, text string")
    ranks = {r.term: r.rank for r in tfidf_top_terms(df, k=2).collect()}
    assert ranks == {"a": 1, "b": 2}  # equal tfidf -> lexicographic


def test_bm25_planted_best_match(spark):
    rows = [(i, "filler words only here") for i in range(10)]
    rows.append((100, "spark join window spark"))   # all three query terms
    rows.append((101, "spark filler"))              # one query term
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_scores(df, ["spark", "join", "window"], top_n=5).collect()
    assert [r.doc_id for r in out[:2]] == [100, 101]
    assert out[0].n_matched == 3 and out[1].n_matched == 1
    assert out[0].rank == 1 and out[0].bm25 > out[1].bm25 > 0
    # only matching docs are returned at all
    assert {r.doc_id for r in out} == {100, 101}


def test_bm25_top_n_bound_and_order(spark):
    rows = [(i, "spark " * (i + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_scores(df, ["spark"], top_n=7).collect()
    assert len(out) == 7
    assert [r.rank for r in out] == list(range(1, 8))
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
