"""Stateful-streaming equivalence: applyInPandasWithState lag continuity
across micro-batches == one batch lag window — INCLUDING the pairs that
straddle a batch boundary (the pair the reference's batch slicing skips,
fuel_rob_validation.py:91-94)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.streaming.stateful import lag_continuity_stream

MAX_JUMP = 150.0


def _batch_expected(spark, events):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.withColumn("prev_value", F.lag("value").over(w))
    return (
        d.where(
            F.col("prev_value").isNotNull()
            & (F.abs(F.col("value") - F.col("prev_value")) > MAX_JUMP)
        )
        .select("user_id", "event_id")
        .collect()
    )


def test_stateful_lag_equals_batch_window(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts", "value"
    )
    expected = sorted(tuple(r) for r in _batch_expected(spark, events))
    assert expected, "fixture should contain jumps"

    # split the input into 3 time-ordered files → 3 micro-batches, so some
    # (prev, cur) pairs straddle batch boundaries and require state
    all_ts = sorted(r[0] for r in events.select("ts").collect())
    c1, c2 = all_ts[len(all_ts) // 3], all_ts[2 * len(all_ts) // 3]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    parts = [
        events.where(F.col("ts") <= F.lit(c1)),
        events.where((F.col("ts") > F.lit(c1)) & (F.col("ts") <= F.lit(c2))),
        events.where(F.col("ts") > F.lit(c2)),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{in_dir}/batch{i}")
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )
    out_dir = str(tmp_path / "out")
    q = (
        lag_continuity_stream(src, max_jump=MAX_JUMP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir).select("user_id", "event_id").collect()
    )
    assert got == expected


def test_stateful_lag_catches_planted_boundary_jump(spark, tmp_path):
    """A violating pair that STRADDLES a micro-batch boundary is caught —
    the case a stateless per-batch lag (and the reference's batch slicing)
    misses by construction."""
    import datetime as dt

    rows = [
        # batch 0: user 7 ends at value 10.0
        (7, 1, dt.datetime(2024, 1, 1, 0, 0), 5.0),
        (7, 2, dt.datetime(2024, 1, 1, 0, 1), 10.0),
        # batch 1: first row jumps to 900 → LAG-JUMP only visible via state
        (7, 3, dt.datetime(2024, 1, 1, 0, 2), 900.0),
        (7, 4, dt.datetime(2024, 1, 1, 0, 3), 905.0),
    ]
    schema = "user_id long, event_id long, ts timestamp, value double"
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(rows[:2], schema).coalesce(1).write.parquet(
        f"{in_dir}/batch0"
    )
    time.sleep(1.1)
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.parquet(
        f"{in_dir}/batch1"
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )
    out_dir = str(tmp_path / "out")
    q = (
        lag_continuity_stream(src, max_jump=MAX_JUMP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1
    assert (got[0].event_id, got[0].prev_value, got[0].value) == (3, 10.0, 900.0)
