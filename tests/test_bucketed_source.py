"""Bucketed source/sink (sources/bucketed.py): the co-located join must
not shuffle — asserted on the physical plan, not just the results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.sources.bucketed import (
    colocated_join,
    read_bucketed,
    write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(0, 2_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("media_ref"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    assets = spark.range(0, 97).select(
        F.col("id").alias("media_ref"),
        F.concat(F.lit("asset-"), F.col("id")).alias("asset_name"),
    )
    write_bucketed(
        docs, "b_docs", ["media_ref"], n_buckets=N_BUCKETS,
        sort_cols=["media_ref"], path=str(base / "docs"),
    )
    write_bucketed(
        assets, "b_assets", ["media_ref"], n_buckets=N_BUCKETS,
        sort_cols=["media_ref"], path=str(base / "assets"),
    )
    yield "b_docs", "b_assets"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_assets")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path: broadcast would hide the exchange question
    with_conf = spark.conf
    prev = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, ["media_ref"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sortBy at write time also removes the per-bucket Sort
        assert joined.count() == 2_000
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles(spark, bucketed_tables):
    """Control: the same join over raw parquet (no bucket metadata) DOES
    exchange — proving the absence above comes from bucketing."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ldf = read_bucketed(spark, left)
        rdf = read_bucketed(spark, right)
        raw_l = spark.read.parquet(ldf.inputFiles()[0].rsplit("/", 1)[0])
        raw_r = spark.read.parquet(rdf.inputFiles()[0].rsplit("/", 1)[0])
        plan = (
            raw_l.join(raw_r, "media_ref")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_results_match_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        colocated_join(spark, left, right, ["media_ref"])
        .groupBy("asset_name").count()
    )
    ldf = read_bucketed(spark, left)
    rdf = read_bucketed(spark, right)
    exp = ldf.join(rdf, "media_ref").groupBy("asset_name").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
