"""Streaming benchmark decontamination: per-micro-batch n-gram overlap
verdicts against a STATIC eval-set gram index.

Contamination is a property of a single document versus a fixed benchmark —
no cross-batch state is required (unlike uniqueness, where the duplicate's
original may live in an earlier batch). That makes the exact streaming twin
of ``operators.decontam.decontaminate`` a stateless per-batch application:
``foreachBatch`` re-runs the batch operator on each micro-batch, so the
streaming and batch verdicts are identical row-for-row by construction
(pytest-verified with the corpus split across micro-batches).

Why foreachBatch and not a streaming aggregation: the operator's hit count
is a groupBy over doc_id, and a doc_id-keyed streaming aggregation would
hold unbounded state (every doc ever seen) for a value that is fully
determined within the document's own batch. foreachBatch keeps state at
zero and lets the batch operator's scale shape (broadcast gram index, only
hit rows shuffle) apply unchanged inside each micro-batch.

The benchmark gram index is computed ONCE from the static benchmark
DataFrame and reused across batches (persisted; it is broadcast into each
micro-batch join — eval suites are MBs against a 100 TB/day stream).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datavalidation_spark.operators.decontam import decontaminate


def decontam_stream_writer(
    stream_df: DataFrame,
    benchmark: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start a stream writing per-document contamination verdicts to
    parquet at ``out_path``. Returns the StreamingQuery (caller awaits)."""
    bench = benchmark.persist()

    def _do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            (
                decontaminate(
                    batch_df, bench, n=n, id_col=id_col, text_col=text_col
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out_path)
            )

    writer = (
        stream_df.writeStream.foreachBatch(_do_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
