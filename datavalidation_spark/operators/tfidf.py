"""Corpus relevance scoring — TF-IDF top terms and BM25 ranking.

Classic training-data-pipeline operators the reference has no analog for
(it validates rows; a curation pipeline also has to *rank* them): per-doc
salient terms for topic clustering / near-dup triage, and BM25 retrieval
for query-driven corpus subsetting.

100-TB shape:
* one explode + one ``groupBy(doc_id, term)`` — map-side combined, the
  token stream never shuffles raw; only (doc, term, tf) rows do;
* document frequency via a window over ``term`` on the already-aggregated
  tf rows (no second scan of the corpus, no vocabulary broadcast —
  web-scale vocab does not fit on the driver);
* corpus-level scalars (N docs, avg doc length) ride in via a broadcast
  cross join of a 1-row aggregate;
* top-k per doc / per query is a rank window, never a driver sort.

Formulas (public, standard): smooth idf ``ln((1+N)/(1+df)) + 1``
(sklearn's TfidfTransformer default) and Robertson/Sparck-Jones BM25 idf
``ln(1 + (N - df + 0.5)/(df + 0.5))`` with k1/b term saturation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.operators.text import tokens


def term_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf) — whitespace-lowercase tokens, one row per distinct
    term per doc. The explode fans out to the token stream but the partial
    aggregation combines map-side, so only distinct (doc, term) rows shuffle."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _with_corpus_stats(tf: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    """Attach df(term) via a term-window and N via a broadcast scalar."""
    n_docs = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    wt = Window.partitionBy("term")
    return tf.withColumn("df", F.count(F.lit(1)).over(wt)).crossJoin(F.broadcast(n_docs))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by smooth TF-IDF.

    Returns (doc_id, term, tf, tfidf, rank); ties break lexicographically
    on term so results are deterministic and oracle-comparable."""
    tf = term_counts(docs, text_col, id_col)
    scored = _with_corpus_stats(tf, docs, id_col).withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df"))) + F.lit(1.0)),
            6,
        ),
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Top-n documents by BM25 against a bag of query terms.

    The query is a small literal list (isin filter — pushed below the
    aggregation so only matching tokens survive the explode), but df/N/avg
    length are computed over the FULL corpus, as BM25 requires."""
    tf_all = term_counts(docs, text_col, id_col)
    # per-doc length and corpus avg length from the tf rows (no rescan)
    doclen = tf_all.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    wt = Window.partitionBy("term")
    matched = (
        tf_all.withColumn("df", F.count(F.lit(1)).over(wt))
        .where(F.col("term").isin(*query_terms))
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_doc = matched.groupBy("doc_id").agg(
        F.round(F.sum(idf * sat), 6).alias("bm25"),
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition partial
    # top-n merged on the driver, NOT a single-partition global sort window;
    # the rank window then runs over <= top_n rows only
    top = per_doc.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_n)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "bm25", "n_matched", "rank"
    )
