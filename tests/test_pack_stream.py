"""Streaming≡batch equivalence for sequence packing: applyInPandasWithState
packing across doc_id-ordered micro-batches == one batch pack_sequences
pass — including packs that straddle a micro-batch boundary (the pack a
stateless per-batch packer would close early and double-number)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from datavalidation_spark.operators.packing import pack_sequences
from datavalidation_spark.streaming.pack_stream import pack_stream

CAP = 50


def _docs(spark, n=120):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 90 + 5).cast("int")),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
            " ",
        ).alias("text"),
    )


def _run_stream(spark, tmp_path, docs, splits, n_buckets):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    lo = None
    for i, hi in enumerate(splits + [None]):
        part = docs
        if lo is not None:
            part = part.where(F.col("doc_id") >= lo)
        if hi is not None:
            part = part.where(F.col("doc_id") < hi)
        part.coalesce(1).write.parquet(f"{in_dir}/batch{i}")
        time.sleep(1.1)  # distinct mtimes → deterministic file order
        lo = hi
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )
    out_dir = str(tmp_path / "out")
    q = (
        pack_stream(src, capacity=CAP, n_buckets=n_buckets)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def test_pack_stream_equals_batch(spark, tmp_path):
    """3 doc_id-ordered micro-batches == one batch pack over the union."""
    docs = _docs(spark).localCheckpoint()
    expected = sorted(
        map(tuple, pack_sequences(docs, capacity=CAP, n_buckets=4).collect())
    )
    got = sorted(
        map(tuple, _run_stream(spark, tmp_path, docs, [40, 80], 4).collect())
    )
    assert got == expected


def test_pack_stream_pack_straddles_boundary(spark, tmp_path):
    """A pack opened in batch 0 keeps filling in batch 1: with 1 bucket and
    10-token docs (capacity 50), docs 2–4 (batch 1) land in the SAME pack
    opened by docs 0–1 (batch 0) at offsets 20/30/40 — a stateless packer
    would restart pack_id at 0/offset 0 for batch 1."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(6)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in _run_stream(spark, tmp_path, docs, [2], 1).collect()
    }
    assert [(out[i].pack_id, out[i].pack_offset) for i in range(6)] == [
        (0, 0),
        (0, 10),
        (0, 20),  # crosses the micro-batch boundary into the open pack
        (0, 30),
        (0, 40),  # fills the pack exactly (40+10 == capacity)
        (1, 0),  # 50+10 > 50 → new pack
    ]


def test_pack_stream_resumes_across_restart(spark, tmp_path):
    """The open pack survives a full query RESTART (state-store recovery
    from checkpoint), not just a micro-batch boundary: batch written after
    the first availableNow run completes lands in the pack the first run
    left open."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(6)], "doc_id long, text string"
    )
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)

    def run_once():
        src = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(in_dir + "/b*/")
        )
        q = (
            pack_stream(src, capacity=CAP, n_buckets=1)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    docs.where("doc_id < 3").coalesce(1).write.parquet(f"{in_dir}/b0")
    run_once()  # first query: docs 0-2 → pack 0, fill 30
    docs.where("doc_id >= 3").coalesce(1).write.parquet(f"{in_dir}/b1")
    run_once()  # restarted query recovers (pack_id=0, fill=30) from ckpt
    out = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert [(out[i].pack_id, out[i].pack_offset) for i in range(6)] == [
        (0, 0), (0, 10), (0, 20),
        (0, 30), (0, 40),  # continue the recovered open pack
        (1, 0),
    ]
