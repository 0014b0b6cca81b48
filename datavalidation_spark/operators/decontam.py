"""Benchmark decontamination: flag training documents sharing word n-grams
with an evaluation corpus.

Standard LLM-pipeline hygiene (the GPT-3/PaLM "13-gram overlap" family):
any training document that contains an n-gram also present in a held-out
benchmark is contaminated and must be dropped or audited. The reference
engine has no such operator (its notion of cross-row comparison is
per-vessel remark matching); this is part of the LLM-data-pipeline tier.

Scale shape (the part that matters at 100 TB):

* the benchmark side is SMALL (eval suites are MBs against a 100 TB corpus)
  — its distinct n-grams are broadcast, so the training corpus joins
  map-side with NO shuffle of document text;
* the training side explodes to (doc_id, gram) but the broadcast hash join
  filters to HITS immediately — only matching (doc_id, gram) rows reach the
  aggregation shuffle, and contamination is rare by construction;
* the final per-doc verdict joins ids-only against the (tiny) hit counts —
  AQE broadcasts it.

Tokenization matches ``operators.text.tokens`` (lowercased whitespace
split), so the gram definition is shared with the jaccard/winnowing dedup
family and the DuckDB oracle transcription.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datavalidation_spark.operators.text import tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) of ``text``; empty array when
    the document has fewer than ``n`` tokens. The ``when`` guard matters:
    Spark's ``sequence(1, 0)`` generates a DESCENDING sequence rather than
    an empty one."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination verdict against ``benchmark``.

    Returns one row per ``docs`` row: (id, n_hits = number of distinct
    n-grams shared with any benchmark document, contaminated = n_hits > 0).
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.col("n_hits").isNotNull().alias("contaminated"),
        )
    )
