"""Streaming uniqueness equivalence: cross-batch duplicate flagging via
applyInPandasWithState == one batch digest group-by — INCLUDING duplicates
whose original arrived in an EARLIER micro-batch (invisible to any per-batch
group-by)."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from datavalidation_spark.operators.dedup import canonical_digest
from datavalidation_spark.streaming.dedup_stream import (
    dedup_stream,
    duplicate_flag_stream,
)

SCHEMA = "doc_id long, text string, event_ts timestamp"
TS = dt.datetime(2024, 1, 1, 0, 0)


def _rows():
    """30 docs; texts t0..t19 unique, then planted copies:
    21<-1 (same batch), 22<-2 (next batch), 23<-3 (two batches later),
    24<-21 (copy of a copy: original is still doc 1)."""
    rows = [(i, f"text number {i} lorem ipsum", TS) for i in range(20)]
    rows += [
        (21, "text number 1 lorem ipsum", TS),
        (22, "text number 2 lorem ipsum", TS),
        (23, "TEXT  NUMBER 3   LOREM IPSUM", TS),  # canonical-equal to doc 3
        (24, "text number 1 lorem ipsum", TS),
    ]
    return rows


def _batch_expected(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    w = df.withColumn("digest", canonical_digest(F.col("text")))
    firsts = w.groupBy("digest").agg(F.min("doc_id").alias("first_doc_id"))
    return sorted(
        (r.doc_id, r.first_doc_id)
        for r in w.join(firsts, "digest")
        .where(F.col("doc_id") != F.col("first_doc_id"))
        .collect()
    )


def _write_batches(spark, tmp_path, batches):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/batch{i}"
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )


def _run(stream_out, tmp_path):
    out_dir = str(tmp_path / "out")
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    return out_dir


def test_duplicate_flags_equal_batch_groupby(spark, tmp_path):
    rows = _rows()
    expected = _batch_expected(spark, rows)
    assert len(expected) == 4, "fixture plants 4 duplicates"

    # id-ordered thirds → originals precede copies across batches
    batches = [rows[:10], rows[10:22], rows[22:]]
    src = _write_batches(spark, tmp_path, batches)
    out = _run(duplicate_flag_stream(src), tmp_path)
    got = sorted(
        (r.doc_id, r.first_doc_id)
        for r in spark.read.parquet(out).select("doc_id", "first_doc_id").collect()
    )
    assert got == expected
    rules = {r.rule_id for r in spark.read.parquet(out).collect()}
    assert rules == {"DOC-UNIQUE-STREAM"}


def test_duplicate_flag_crosses_batch_boundary(spark, tmp_path):
    """Original in batch 0, copy in batch 1: only group state can pair them."""
    b0 = [(1, "the quick brown fox jumps", TS)]
    b1 = [(2, "the quick brown fox jumps", TS), (3, "something else entirely", TS)]
    src = _write_batches(spark, tmp_path, [b0, b1])
    out = _run(duplicate_flag_stream(src), tmp_path)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert (got[0].doc_id, got[0].first_doc_id) == (2, 1)


def test_dedup_stream_drops_later_copies(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first occurrence per digest
    and drops copies arriving later inside the watermark horizon."""
    rows = _rows()
    batches = [rows[:10], rows[10:22], rows[22:]]
    src = _write_batches(spark, tmp_path, batches)
    out = _run(
        dedup_stream(src, watermark_delay="1 hour").select("doc_id", "digest"),
        tmp_path,
    )
    survivors = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert survivors == sorted(range(20)), "exactly the 20 originals survive"
