"""Streaming CDC apply (streaming/upsert_stream.py): per-batch MERGE into a
manifest-log table — final state equals the batch merge of the same
changesets, replays are no-ops, and every batch is a time-travel snapshot."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from datavalidation_spark.engine.acid import ManifestLog
from datavalidation_spark.streaming.upsert_stream import (
    apply_cdc_batch,
    applied_batches,
    cdc_sink,
)

SCHEMA = "id long, v string, _deleted boolean"

BATCHES = [
    # batch 0: initial inserts
    [(1, "a", False), (2, "b", False), (3, "c", False)],
    # batch 1: update 2, insert 4
    [(2, "B", False), (4, "d", False)],
    # batch 2: delete 1, update 4
    [(1, None, True), (4, "D", False)],
]
FINAL = {2: "B", 3: "c", 4: "D"}


def _stream(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/batch{i}"
        )
        time.sleep(1.1)
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/batch*/")
    )


def test_cdc_stream_final_state_and_lineage(spark, tmp_path):
    root = str(tmp_path / "log")
    q = cdc_sink(
        _stream(spark, tmp_path), root, "t", ["id"],
        delete_col="_deleted", checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    log = ManifestLog(root)
    got = {r.id: r.v for r in log.read(spark, "t").collect()}
    assert got == FINAL
    # one snapshot per micro-batch, each time-travelable
    snaps = [
        (seq, meta) for seq, meta in log.snapshots() if meta.get("cdc_table") == "t"
    ]
    assert [m["cdc_batch_id"] for _, m in snaps] == [0, 1, 2]
    states = [
        {r.id: r.v for r in log.read_at(spark, "t", seq).collect()}
        for seq, _ in snaps
    ]
    assert states[0] == {1: "a", 2: "b", 3: "c"}
    assert states[1] == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert states[2] == FINAL


def test_replayed_batch_is_noop(spark, tmp_path):
    root = str(tmp_path / "log")
    log = ManifestLog(root)
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    assert apply_cdc_batch(log, "t", b0, 0, ["id"], delete_col="_deleted")
    assert apply_cdc_batch(log, "t", b1, 1, ["id"], delete_col="_deleted")
    before = {r.id: r.v for r in log.read(spark, "t").collect()}
    n_snaps = len(log.snapshots())
    # crash-replay of batch 1: must not double-apply or commit
    assert not apply_cdc_batch(log, "t", b1, 1, ["id"], delete_col="_deleted")
    assert {r.id: r.v for r in log.read(spark, "t").collect()} == before
    assert len(log.snapshots()) == n_snaps
    assert applied_batches(log, "t") == {0, 1}


def test_streaming_equals_batch_merge(spark, tmp_path):
    """CDC-applied state == folding the same changesets with the batch
    merge_upsert."""
    from datavalidation_spark.engine.reconcile import merge_upsert

    root = str(tmp_path / "log")
    log = ManifestLog(root)
    for i, rows in enumerate(BATCHES):
        apply_cdc_batch(
            log, "t", spark.createDataFrame(rows, SCHEMA), i,
            ["id"], delete_col="_deleted",
        )
    folded = spark.createDataFrame(BATCHES[0], SCHEMA).where(~F.col("_deleted")).select("id", "v")
    for rows in BATCHES[1:]:
        folded = merge_upsert(
            folded, spark.createDataFrame(rows, SCHEMA), ["id"],
            delete_col="_deleted",
        )
    assert {r.id: r.v for r in log.read(spark, "t").collect()} == {
        r.id: r.v for r in folded.collect()
    }
