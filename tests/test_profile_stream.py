"""Incremental streaming profile: per-batch t-digest + mergeable stats
partials fold (at read) into the same profile one batch pass would give."""

from __future__ import annotations

import os
import time

import numpy as np
from pyspark.sql import functions as F

from datavalidation_spark.streaming.profile_stream import (
    read_profile,
    run_profile_stream,
)

COLS = ["l_quantity", "l_extendedprice"]
QS = [0.25, 0.5, 0.75]


def test_streamed_profile_matches_batch(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", *COLS
    )
    # exact batch truth
    exact = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.min(c).cast("double").alias(f"{c}__min") for c in COLS],
        *[F.max(c).cast("double").alias(f"{c}__max") for c in COLS],
        *[
            F.percentile(F.col(c), F.array(*[F.lit(q) for q in QS])).alias(f"{c}__qx")
            for c in COLS
        ],
    ).first()

    # 3 id-sliced files → 3 micro-batches
    keys = sorted(r[0] for r in li.select("l_orderkey").distinct().collect())
    c1, c2 = keys[len(keys) // 3], keys[2 * len(keys) // 3]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    slices = [
        li.where(F.col("l_orderkey") <= c1),
        li.where((F.col("l_orderkey") > c1) & (F.col("l_orderkey") <= c2)),
        li.where(F.col("l_orderkey") > c2),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{in_dir}/batch{i}")
        time.sleep(1.1)

    src = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/batch*/")
    )
    sink = str(tmp_path / "sink")
    q = run_profile_stream(src, COLS, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    prof = read_profile(spark, sink, QS).set_index("column")
    assert sorted(prof.index) == sorted(COLS)
    for c in COLS:
        row = prof.loc[c]
        assert row["n_rows"] == exact["n_rows"]
        assert row["min_val"] == exact[f"{c}__min"]
        assert row["max_val"] == exact[f"{c}__max"]
        span = exact[f"{c}__max"] - exact[f"{c}__min"]
        for q_, ex in zip(QS, exact[f"{c}__qx"]):
            est = row[f"q{q_}"]
            assert est is not None and abs(est - ex) <= 0.05 * span, (
                f"{c} q{q_}: digest {est} vs exact {ex}"
            )
    # ≥3 batches recorded, each with one partial per column
    raw = spark.read.parquet(sink)
    assert raw.select("batch_id").distinct().count() == 3
    assert raw.count() == 3 * len(COLS)
