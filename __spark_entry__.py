"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation run on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2, checked against DuckDB at sf0.01.

All aggregates are explicitly aliased AND cast/rounded identically on both
sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.rules.core import annotate, violations
from datavalidation_spark.rules.documents import ALLOWED_LANGS, document_rules

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry — flagship: full document-rule catalog + per-source verdicts
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Validate the sf0.001 documents corpus; per-source verdict summary."""
    docs = _t(spark, SF0001, "documents")
    ann = annotate(docs, document_rules(), out="_v")
    return (
        ann.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.size("_v")).alias("violation_count"),
            F.sum((F.size("_v") > 0).cast("long")).alias("violating_rows"),
        )
        .withColumn("passed", F.col("violation_count") == 0)
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_doc_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar rule catalog compiled to one vectorized projection (SURVEY §2.7)."""
    docs = _t(spark, sf_dir, "documents")
    return violations(docs, document_rules(), ["doc_id"]).select(
        "doc_id", "rule_id", "severity"
    )


def q_doc_source_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition pass/fail verdicts (north_rule), source as partition."""
    docs = _t(spark, sf_dir, "documents")
    ann = annotate(docs, document_rules(), out="_v")
    return (
        ann.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.size("_v")).cast("bigint").alias("violation_count"),
            F.sum((F.size("_v") > 0).cast("long")).cast("bigint").alias("violating_rows"),
        )
        .withColumn("passed", F.col("violation_count") == 0)
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-agg with map-side combine over the big fact (SURVEY A1/A4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sum_base_price_cents"
            ),
            # price·(1-disc) lives on a 4-dp grid (2dp × 2dp)
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("bigint")
            ).alias("sum_disc_price_e4"),
            F.sum(F.round(F.col("l_discount") * 100).cast("bigint")).alias(
                "sum_disc_cents"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_broadcast_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact ⟕ broadcast dim with coalesce defaults (SURVEY J1/J3)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment", "c_acctbal")),
        orders.o_custkey == cust.c_custkey,
        "left",
    )
    return joined.groupBy(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("mktsegment")
    ).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "sum_totalprice_cents"
        ),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "sum_acctbal_cents"
        ),
    )


def q_lag_continuity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 continuity per group, partition-correct (SURVEY W1/W2 — fixes the
    reference's cross-group shift bug, distance_validation.py:59-65)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn("prev_value", F.lag("value").over(w))
    # deltas are on a 2-decimal grid → scale to integer cents so the sum is
    # exact and summation-order independent (cross-engine deterministic)
    delta_cents = F.round(F.abs(F.col("value") - F.col("prev_value")) * 100).cast(
        "bigint"
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.abs(F.col("value") - F.col("prev_value")) > 150).cast("long")
        ).alias("big_jumps"),
        F.sum(delta_cents).alias("sum_abs_delta_cents"),
    )


def q_trailing_window_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored trailing-30 baseline with min-10 gate — the reference's
    signature aggregate (SURVEY A2, me_consumption_validation.py:63-71):
    last 30 non-null rows of each group (anchored at group max ts), averaged,
    NULL unless ≥10 samples."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.where(F.col("value").isNotNull()).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.where(F.col("rn") <= 30)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
        .withColumn(
            "trailing_avg",
            F.when(
                F.col("n_samples") >= 10,
                F.round(
                    F.col("sum_value_cents") / F.col("n_samples") / 100.0, 4
                ),
            ),
        )
    )


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile (SURVEY A8) with exact variants so the
    DuckDB oracle hashes identically (sketch variants live in engine.profile)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("text_nulls"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("n_chars").cast("bigint").alias("min_n_chars"),
        F.max("n_chars").cast("bigint").alias("max_n_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_n_chars"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keep-list: canonical doc per distinct text hash
    (hash-groupBy dedup; SURVEY A6 / training-pipeline dedup)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def q_semi_join_dedup_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi + distinct dim scan (SURVEY S5/J2,
    boiler_consumption_validation.py:21-31)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return (
        supp.join(
            li.select("l_suppkey").distinct(),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .distinct()
    )


def q_anti_join_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check via anti-join (SURVEY J6): events.user_id vs the
    customer key space — dangling users are violations."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.select("user_id")
        .distinct()
        .join(
            F.broadcast(cust.select(F.col("c_custkey").alias("user_id"))),
            "user_id",
            "left_anti",
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_rule_violations": q_doc_rule_violations,
    "doc_source_verdicts": q_doc_source_verdicts,
    "pricing_summary": q_pricing_summary,
    "broadcast_join_enrich": q_broadcast_join_enrich,
    "lag_continuity_events": q_lag_continuity_events,
    "trailing_window_baseline": q_trailing_window_baseline,
    "profile_documents": q_profile_documents,
    "dedup_exact": q_dedup_exact,
    "semi_join_dedup_dim": q_semi_join_dedup_dim,
    "anti_join_referential": q_anti_join_referential,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


_LANGS_SQL = ", ".join(f"'{l}'" for l in ALLOWED_LANGS)

_DOC_RULES_SQL_PREDICATES = [
    ("DOC-TEXT-MISS", "text IS NULL OR length(text) = 0"),
    ("DOC-NCHARS-RANGE", "n_chars IS NULL OR n_chars < 1 OR n_chars > 1000000"),
    ("DOC-NCHARS-NEG", "n_chars < 0"),
    (
        "DOC-NCHARS-MISMATCH",
        "text IS NOT NULL AND n_chars IS NOT NULL AND n_chars <> length(text)",
    ),
    ("DOC-LANG-ENUM", f"lang IS NULL OR lang NOT IN ({_LANGS_SQL})"),
]

_DOC_VIOLATIONS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, '{rid}' AS rule_id, 'error' AS severity FROM documents WHERE {pred}"
    for rid, pred in _DOC_RULES_SQL_PREDICATES
)

_DOC_FIRE_COUNT = " + ".join(
    f"(CASE WHEN {pred} THEN 1 ELSE 0 END)" for _, pred in _DOC_RULES_SQL_PREDICATES
)


def oracle_sql() -> dict[str, str]:
    return {
        "doc_rule_violations": _DOC_VIOLATIONS_SQL,
        "doc_source_verdicts": f"""
            SELECT source,
                   count(*) AS row_count,
                   CAST(sum({_DOC_FIRE_COUNT}) AS BIGINT) AS violation_count,
                   CAST(sum(CASE WHEN ({_DOC_FIRE_COUNT}) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS violating_rows,
                   CAST(sum({_DOC_FIRE_COUNT}) AS BIGINT) = 0 AS passed
            FROM documents GROUP BY source
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_base_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
                   CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                       AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "broadcast_join_enrich": """
            SELECT coalesce(c_mktsegment, 'UNKNOWN') AS mktsegment,
                   count(*) AS order_count,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_totalprice_cents,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS sum_acctbal_cents
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "lag_continuity_events": """
            WITH d AS (
              SELECT user_id, value,
                     lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS prev_value
              FROM events
            )
            SELECT user_id,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN abs(value - prev_value) > 150 THEN 1 ELSE 0 END)
                        AS BIGINT) AS big_jumps,
                   CAST(sum(CAST(round(abs(value - prev_value) * 100) AS BIGINT))
                        AS BIGINT) AS sum_abs_delta_cents
            FROM d GROUP BY user_id
        """,
        "trailing_window_baseline": """
            WITH ranked AS (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE value IS NOT NULL
            )
            SELECT user_id,
                   count(*) AS n_samples,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   CASE WHEN count(*) >= 10
                        THEN round(CAST(sum(CAST(round(value * 100) AS BIGINT))
                                        AS DOUBLE) / count(*) / 100.0, 4)
                   END AS trailing_avg
            FROM ranked WHERE rn <= 30 GROUP BY user_id
        """,
        "profile_documents": """
            SELECT count(*) AS n_rows,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS text_nulls,
                   count(DISTINCT lang) AS lang_distinct,
                   count(DISTINCT source) AS source_distinct,
                   CAST(min(n_chars) AS BIGINT) AS min_n_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_n_chars,
                   round(avg(n_chars), 4) AS avg_n_chars
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash,
                   min(doc_id) AS keep_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "semi_join_dedup_dim": """
            SELECT DISTINCT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
            FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
        """,
        "anti_join_referential": """
            SELECT DISTINCT user_id FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM customer)
        """,
    }
