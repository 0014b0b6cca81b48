"""Streaming decontamination ≡ batch decontamination, with the training
corpus split across micro-batches (contamination is per-doc vs a static
benchmark, so batch split must not change any verdict)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from datavalidation_spark.operators.decontam import decontaminate
from datavalidation_spark.streaming.decontam_stream import (
    decontam_stream_writer,
)

SCHEMA = "doc_id long, text string"


def _corpus():
    bench = [(1000 + i, f"secret eval question {i} about spark shuffles") for i in range(5)]
    train = [
        (1, "totally clean document about something else entirely here"),
        (2, "contains secret eval question 2 about spark shuffles verbatim"),
        (3, "another clean one with plenty of ordinary words inside"),
        (4, "secret eval question 4 about spark shuffles appears here too"),
        (5, "clean again nothing shared with the benchmark at all"),
        (6, "ends with secret eval question 0 about spark shuffles"),
    ]
    return bench, train


def test_stream_equals_batch(spark, tmp_path):
    bench_rows, train_rows = _corpus()
    bench = spark.createDataFrame(bench_rows, SCHEMA)
    train = spark.createDataFrame(train_rows, SCHEMA)

    expected = sorted(
        map(tuple, decontaminate(train, bench, n=4).collect())
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # split train across three micro-batches
    for i, chunk in enumerate([train_rows[:2], train_rows[2:4], train_rows[4:]]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/batch{i}"
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/batch*/")
    )
    out = str(tmp_path / "out")
    q = decontam_stream_writer(
        stream, bench, out, str(tmp_path / "ckpt"), n=4
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert sorted(
        map(tuple, got.select("doc_id", "n_hits", "contaminated").collect())
    ) == expected
    # ≥2 distinct micro-batches actually processed
    assert got.select("batch_id").distinct().count() >= 2
    # the planted contaminated/clean split is what we think it is
    flags = {r["doc_id"]: r["contaminated"] for r in got.collect()}
    assert flags[2] and flags[4] and flags[6]
    assert not (flags[1] or flags[3] or flags[5])


def test_stream_resume_processes_remaining(spark, tmp_path):
    """Kill-and-resume: a second start with the same checkpoint only
    processes unseen files and never duplicates verdicts."""
    bench_rows, train_rows = _corpus()
    bench = spark.createDataFrame(bench_rows, SCHEMA)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(train_rows[:3], SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/batch0"
    )

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir + "/batch*/")
        )
        return decontam_stream_writer(
            stream, bench, str(tmp_path / "out"), str(tmp_path / "ckpt"), n=4
        )

    q = start()
    q.awaitTermination(300)
    time.sleep(1.1)
    spark.createDataFrame(train_rows[3:], SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/batch1"
    )
    q2 = start()
    q2.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == len(train_rows)  # no dup verdicts across restarts
    assert got.select("doc_id").distinct().count() == len(train_rows)
