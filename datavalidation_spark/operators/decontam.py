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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datavalidation_spark.operators.text import tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) of ``text``; empty array when
    the document has fewer than ``n`` tokens."""
    return F.array_distinct(word_ngrams_seq(text, n))


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


def word_ngrams_seq(text: Column, n: int) -> Column:
    """All word n-grams of ``text`` in POSITION ORDER (not deduplicated):
    element i (0-based) is the gram starting at token i+1 — the single gram
    builder (:func:`word_ngrams` is its array_distinct). The ``when`` guard
    matters: Spark's ``sequence(1, 0)`` generates a DESCENDING sequence
    rather than an empty one."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Excisable contaminated TOKEN RANGES per document (span-level
    decontamination): a token position is contaminated when any word
    n-gram covering it also occurs in ``benchmark``; maximal contiguous
    contaminated regions are returned as (id, span_start, span_end,
    span_len), 1-based inclusive token offsets. Production pipelines excise
    these ranges instead of dropping whole documents.

    Scale shape: benchmark grams broadcast (map-side join, no text
    shuffle); only HIT positions — rare by construction — reach the
    per-document island window, so the one shuffle is over the tiny hit
    set. Island merge: hits at starts s1 < s2 cover overlapping/adjacent
    token intervals iff s2 <= s1 + n, the classic gaps-and-islands
    break-flag + running-sum (same pattern as sessionize_events).
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.posexplode(word_ngrams_seq(F.col(text_col), n)).alias("_p", "gram"),
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "gram").select(
        id_col, (F.col("_p") + 1).cast("long").alias("s")
    )
    w = Window.partitionBy(id_col).orderBy("s")
    # first row of a doc: lag is NULL -> otherwise(0); the running sum then
    # starts that doc's island ids at 0, which grouping is indifferent to
    brk = F.when(
        F.col("s") - F.lag("s").over(w) > n, F.lit(1)
    ).otherwise(F.lit(0))
    islands = (
        hits.withColumn(
            "_isl",
            F.sum(brk).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "_isl")
        .agg(
            F.min("s").alias("span_start"),
            (F.max("s") + n - 1).alias("span_end"),
        )
    )
    return islands.select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
    )
