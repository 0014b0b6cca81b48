"""Incremental column profiling under Structured Streaming.

The batch profiler (``engine/profiling.py``, north_star's per-column stats
clause) computes count / nulls / min / max / HLL cardinality / quantile
sketches in one pass. Streaming cannot re-scan history, so the streaming
profile exploits the one property every sketch here was chosen for:
**mergeability**. Each micro-batch contributes partial rows — per-column
count/nulls/min/max plus a t-digest of the batch (``operators/tdigest.py``,
the Dunning-Ertl merging digest) — appended to a parquet sink keyed by
batch id; ``read_profile`` folds all partials into the running profile at
read time. State never lives in the stream: the sink IS the state, which is
what makes the profile resumable for free (checkpoint + append sink).

100 TB shape: partials are O(columns · compression) bytes per batch
regardless of batch rows; the read-side fold is O(batches) rows through the
same ``merge_digest_rows`` fan-in the batch path uses, so a year of
micro-batches still merges in one small job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datavalidation_spark.operators.tdigest import TDigest, partition_digests

PROFILE_SINK_SCHEMA = (
    "batch_id long, column string, digest binary, n long, "
    "n_rows long, n_nulls long, min_val double, max_val double"
)


def batch_profile_partials(df: DataFrame, columns: list[str]) -> DataFrame:
    """One partial row per column for ONE (micro-)batch: merged t-digest +
    the trivially-mergeable exact stats. Digest rows come from the same
    ``partition_digests`` mapInPandas the batch path uses (one digest per
    partition), folded to one row per column here so the sink stays tiny."""
    digs = partition_digests(df, columns)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        d = TDigest.from_bytes(pdf["digest"].iloc[0])
        for b in pdf["digest"].iloc[1:]:
            d.merge(TDigest.from_bytes(b))
        return pd.DataFrame(
            {
                "column": [pdf["column"].iloc[0]],
                "digest": [d.to_bytes()],
                "n": [int(pdf["n"].sum())],
            }
        )

    one = digs.groupBy("column").applyInPandas(
        fold, "column string, digest binary, n long"
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls") for c in columns],
        *[F.min(c).cast("double").alias(f"{c}__min") for c in columns],
        *[F.max(c).cast("double").alias(f"{c}__max") for c in columns],
    ).select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__min").alias("min_val"),
                        F.col(f"{c}__max").alias("max_val"),
                    )
                    for c in columns
                ]
            )
        ).alias("s"),
    ).select("n_rows", "s.*")
    return one.join(stats, "column")


def run_profile_stream(
    stream_df: DataFrame,
    columns: list[str],
    sink_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """foreachBatch: append one partial row per column per micro-batch.

    foreachBatch (not a streaming agg) because the digest fold is a custom
    mergeable aggregate; the sink append + checkpoint give exactly-once
    batch ids, so re-processing after a crash overwrites nothing and
    ``read_profile``'s fold stays correct."""

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        batch_profile_partials(batch_df, columns).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    w = stream_df.writeStream.foreachBatch(emit).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_profile(
    spark: SparkSession, sink_dir: str, qs: list[float]
) -> pd.DataFrame:
    """Fold every recorded partial into the running profile: per column —
    n_rows, n_nulls, min, max, and t-digest quantile estimates for ``qs``.

    Duplicate batch ids (a foreachBatch retry that appended before the
    crash) are collapsed to one partial per (batch_id, column) before the
    fold, restoring exactly-once semantics on an at-least-once sink."""
    rows = (
        spark.read.parquet(sink_dir)
        .dropDuplicates(["batch_id", "column"])
        .collect()
    )
    out = []
    by_col: dict[str, list] = {}
    for r in rows:
        by_col.setdefault(r["column"], []).append(r)
    for col, parts in sorted(by_col.items()):
        d = TDigest.from_bytes(parts[0]["digest"])
        for p in parts[1:]:
            d.merge(TDigest.from_bytes(p["digest"]))
        mins = [p["min_val"] for p in parts if p["min_val"] is not None]
        maxs = [p["max_val"] for p in parts if p["max_val"] is not None]
        rec = {
            "column": col,
            "n_rows": int(sum(p["n_rows"] for p in parts)),
            "n_nulls": int(sum(p["n_nulls"] for p in parts)),
            "min_val": float(np.min(mins)) if mins else None,
            "max_val": float(np.max(maxs)) if maxs else None,
        }
        for q, est in zip(qs, d.quantiles(qs)):
            rec[f"q{q}"] = est
        out.append(rec)
    return pd.DataFrame(out)
