"""Streaming sessionization — Spark's native ``session_window`` aggregate
with watermark-driven finalization.

Batch twin: ``operators/temporal.py::sessionize`` (gaps-and-islands; its
unit tests already cross-check the two session structures on static data).
This module is the streaming production path: state is one open session
per key (merged as events arrive), and a session is emitted exactly once,
when the event-time watermark passes its close (last event + gap) —
append-mode semantics, so downstream sinks see each session as an
immutable fact.

The 100-TB/continuous story: state size is O(open sessions), not O(rows
seen); the watermark bounds both state retention and late-data wait. Late
events inside the watermark merge sessions retroactively (two open
sessions bridged by a late event collapse into one before emission) —
the gaps-and-islands batch pass gets this for free by sorting, streaming
gets it from session-window state merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    src: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    id_col: str = "event_id",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates over a stream: (key, session_start,
    session_end, n_events, first/last id, optional exact cents sum).
    ``session_end`` is the session-window close (last event + gap)."""
    # event-time watermarks require TimestampType — NTZ sources are cast
    # (session-tz semantics are irrelevant here: gaps and watermark deltas
    # are differences, which the offset cancels out of)
    if "ntz" in src.schema[ts].dataType.typeName():
        src = src.withColumn(ts, F.col(ts).cast("timestamp"))
    w = src.withWatermark(ts, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias(
                "value_cents"
            )
        )
    return (
        w.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("sw"))
        .agg(*aggs)
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            *[c for c in ["n_events", "first_id", "last_id"]],
            *(["value_cents"] if value_col is not None else []),
        )
    )
