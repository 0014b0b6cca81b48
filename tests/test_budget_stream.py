"""Streaming≡batch equivalence for token-budget admission: cross-batch
per-domain quota state == the batch prefix rule — including a quota
exhausted exactly at a micro-batch boundary (a stateless per-batch check
would grant the next batch a fresh budget)."""

from __future__ import annotations

import hashlib
import os
import random
import time

from pyspark.sql import functions as F

from datavalidation_spark.operators.sampling import sample_token_budget
from datavalidation_spark.streaming.budget_stream import token_budget_stream

BUDGETS = {"a": 700, "b": 300}


def _rank(doc_id: int) -> int:
    return int(hashlib.md5(f"budget|{doc_id}".encode()).hexdigest()[:8], 16)


def _run_stream(spark, tmp_path, batches, budgets, default=0):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    schema = "doc_id long, lang string, n_tokens int, rank long"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{in_dir}/b{i}"
        )
        time.sleep(1.1)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/b*/")
    )
    out_dir = str(tmp_path / "out")
    q = (
        token_budget_stream(
            src,
            budgets,
            default_budget=default,
            n_tokens=F.col("n_tokens"),
            order_col="rank",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def test_budget_stream_equals_batch_on_rank_ordered_ingest(spark, tmp_path):
    rng = random.Random(11)
    rows = [
        (i, ["a", "b"][i % 2], rng.randint(5, 40), _rank(i)) for i in range(200)
    ]
    # rank-ordered ingest, 3 micro-batches
    ordered = sorted(rows, key=lambda r: (r[3], r[0]))
    batches = [ordered[:70], ordered[70:140], ordered[140:]]
    got = _run_stream(spark, tmp_path, batches, BUDGETS)
    admitted = {r.doc_id: r.cum_tokens for r in got.collect() if r.admitted}

    docs = spark.createDataFrame(
        [(i, d, t) for i, d, t, _ in rows], "doc_id long, lang string, n_tokens int"
    )
    expected = {
        r.doc_id: r.cum_tokens
        for r in sample_token_budget(
            docs, BUDGETS, n_tokens=F.col("n_tokens"), salt="budget"
        ).collect()
    }
    assert admitted == expected
    # every input row got a ledger verdict
    assert got.count() == 200


def test_budget_stream_quota_survives_boundary(spark, tmp_path):
    """Domain 'x' budget 50 is exhausted by batch 0 (3 docs x 20 admits
    only 2); batch 1 docs must be rejected even though a per-batch check
    would admit them."""
    b0 = [(1, "x", 20, 1), (2, "x", 20, 2), (3, "x", 20, 3)]
    b1 = [(4, "x", 20, 4), (5, "x", 5, 5)]
    got = {
        r.doc_id: (r.admitted, r.cum_tokens)
        for r in _run_stream(
            spark, tmp_path, [b0, b1], {"x": 50}
        ).collect()
    }
    assert got[1] == (True, 20) and got[2] == (True, 40)
    assert got[3] == (False, 60)
    # fresh-budget bug would admit doc 4 (20 <= 50) and doc 5
    assert got[4] == (False, 80) and got[5] == (False, 85)


def test_budget_stream_null_tokens_do_not_poison_state(spark, tmp_path):
    """A NULL token count counts as 0 (batch parity) — it must not NaN the
    running sum or crash the int state update."""
    b0 = [(1, "x", 20, 1), (2, "x", None, 2), (3, "x", 20, 3)]
    got = {
        r.doc_id: (r.admitted, r.cum_tokens, r.n_tokens)
        for r in _run_stream(spark, tmp_path, [b0], {"x": 50}).collect()
    }
    assert got[1] == (True, 20, 20)
    assert got[2] == (True, 20, 0)  # null → 0 tokens, sum unchanged
    assert got[3] == (True, 40, 20)
