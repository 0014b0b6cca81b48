"""Streaming sessionization (streaming/sessions_stream.py): planted
sessions emit exactly once with correct bounds, and the streaming output
matches the batch gaps-and-islands sessionizer on real events data split
across micro-batches."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

from datavalidation_spark.operators.temporal import sessionize
from datavalidation_spark.streaming.sessions_stream import session_stats_stream


def _run_stream(spark, tmp_path, parts, schema, gap="30 minutes"):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{in_dir}/batch{i}")
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )
    out_dir = str(tmp_path / "out")
    q = (
        session_stats_stream(src, gap=gap, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def test_planted_sessions_across_batches(spark, tmp_path):
    """Two sessions for user 1 whose second session straddles a micro-batch
    boundary; a far-future sentinel in the last batch flushes everything."""
    t = lambda m: datetime(2024, 1, 1, 12, m)
    rows1 = [(1, 100, t(0)), (1, 101, t(10))]
    rows2 = [(1, 102, t(50)), (1, 103, t(55)),
             (9, 999, datetime(2024, 2, 1))]  # sentinel advances watermark
    schema = "user_id long, event_id long, ts timestamp"
    out = _run_stream(
        spark, tmp_path,
        [spark.createDataFrame(rows1, schema), spark.createDataFrame(rows2, schema)],
        schema,
    )
    got = {
        (r.user_id, r.first_id): (r.n_events, r.session_start.minute)
        for r in out.where(F.col("user_id") == 1).collect()
    }
    assert got == {(1, 100): (2, 0), (1, 102): (2, 50)}


def test_streaming_matches_batch_sessionizer(spark, tmp_path, sf001):
    events = sf001["events"].select("user_id", "event_id", "ts")
    all_ts = sorted(r[0] for r in events.select("ts").collect())
    c1, c2 = all_ts[len(all_ts) // 3], all_ts[2 * len(all_ts) // 3]
    parts = [
        events.where(F.col("ts") <= F.lit(c1)),
        events.where((F.col("ts") > F.lit(c1)) & (F.col("ts") <= F.lit(c2))),
        events.where(F.col("ts") > F.lit(c2)),
    ]
    out = _run_stream(spark, tmp_path, parts, events.schema)

    # append mode emits only sessions CLOSED by the final watermark
    # (last event + gap < max event time); mirror that cut on the batch side
    batch = (
        sessionize(events, "user_id", "ts", gap_sec=1800)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_id"),
            F.max("ts").alias("last_ts"),
        )
    )
    max_ts = events.agg(F.max("ts")).first()[0]
    closed = batch.where(
        F.col("last_ts") + F.make_dt_interval(mins=F.lit(30)) < F.lit(max_ts)
    )
    a = sorted((r.user_id, r.first_id, r.n_events) for r in out.collect())
    b = sorted((r.user_id, r.first_id, r.n_events) for r in closed.collect())
    assert a == b and len(a) > 0
