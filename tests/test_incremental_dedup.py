"""Incremental ingest dedup against the persisted bucketed digest index:
correctness of new/seen verdicts AND the scale contract — the index side
is scanned in place (no Exchange), only the incoming batch shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators.dedup import (
    build_digest_index,
    incremental_dedup,
    update_digest_index,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "gamma delta"),
            (3, "alpha beta"),  # dup of 1 → keeper 1
            (4, "epsilon zeta"),
        ],
        "doc_id long, text string",
    )


def test_incremental_dedup_verdicts_and_index_update(spark, corpus, tmp_path):
    build_digest_index(
        corpus, "t_digest_idx", n_buckets=4, path=str(tmp_path / "idx")
    )
    try:
        batch = spark.createDataFrame(
            [
                (10, "alpha beta"),  # seen → keeper 1
                (11, "eta theta"),  # new
                (12, "gamma delta"),  # seen → keeper 2
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.is_new, r.keeper_id)
            for r in incremental_dedup(spark, batch, "t_digest_idx").collect()
        }
        assert got == {10: (False, 1), 11: (True, None), 12: (False, 2)}

        # fold the batch into the index via the safe protocol (anti-join
        # keeps the one-row-per-digest invariant even though the batch
        # contains already-indexed content); re-ingest sees everything
        update_digest_index(spark, batch, "t_digest_idx", n_buckets=4)
        again = incremental_dedup(spark, batch, "t_digest_idx").collect()
        assert len(again) == 3  # still exactly one verdict row per doc
        assert all(not r.is_new for r in again)
        verdicts = {r.doc_id: r.keeper_id for r in again}
        assert verdicts == {10: 1, 11: 11, 12: 2}  # old keepers kept
        # the index holds exactly one row per distinct digest
        idx = spark.table("t_digest_idx")
        assert idx.count() == idx.select("digest").distinct().count() == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS t_digest_idx")


def test_incremental_dedup_index_side_never_shuffles(spark, corpus, tmp_path):
    build_digest_index(
        corpus, "t_digest_idx2", n_buckets=4, path=str(tmp_path / "idx2")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        )
        plan = (
            incremental_dedup(spark, batch, "t_digest_idx2")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly ONE exchange — the incoming batch moving to the index's
        # bucket layout; the index scan itself is bucketed (in place)
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_digest_idx2")
