"""Streaming uniqueness: cross-batch exact-duplicate detection.

The batch engine's uniqueness check (``operators/dedup.py::exact_duplicates``,
reference analog: the doc_id/primary-key uniqueness the validators assume of
their Postgres source) is a digest group-by over the whole table. In
streaming, a duplicate can arrive in a LATER micro-batch than its original —
the pair no per-batch group-by can see. This module provides both streaming
shapes Spark offers, plus the validation-flavored one the engine needs:

* ``dedup_stream``           — drop duplicates, bounded state via
                               ``dropDuplicatesWithinWatermark`` (the standard
                               ingestion-dedup topology: state TTL = the
                               watermark delay, so 100 TB/day ingest holds
                               hours of digests, not the corpus).
* ``duplicate_flag_stream``  — KEEP every row but emit a violation row for
                               each doc whose canonical digest was already
                               seen in this or any earlier micro-batch
                               (``applyInPandasWithState`` keyed by digest;
                               state = first-seen doc id, one long + one
                               string per distinct digest). This is the
                               streaming twin of the batch uniqueness
                               violation table, and the streaming≡batch
                               equivalence is pytest-verified with the input
                               split across micro-batches.

State sizing at scale: state per key is ~40 bytes (first doc_id + bookkeeping);
keys = distinct digests seen. For unbounded retention that is O(corpus) — on a
real deployment pair this with RocksDB state store and a state TTL chosen per
the dedup horizon, exactly like the watermark variant. The operator itself
shuffles only (digest, doc_id) — the text payload never enters the state
store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datavalidation_spark.operators.dedup import canonical_digest

DUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("digest", StringType()),
        StructField("first_doc_id", LongType()),
        StructField("rule_id", StringType()),
    ]
)

# state = the first doc id observed for this digest (across micro-batches)
DUP_STATE_SCHEMA = StructType([StructField("first_doc_id", LongType())])


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "event_ts",
    *,
    watermark_delay: str | None = "1 hour",
) -> DataFrame:
    """First occurrence of each canonical digest survives; later copies drop.

    With ``watermark_delay`` set (the production shape) the digest state is
    evicted once the watermark passes it, bounding state to the dedup
    horizon; pass ``None`` for exact unbounded dedup on small test streams.
    """
    tagged = stream_df.withColumn("digest", canonical_digest(F.col(text_col)))
    if watermark_delay is not None:
        return tagged.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    return tagged.dropDuplicates(["digest"])


def _dup_flag_fn(id_col: str):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (digest,) = key
        first = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].tolist()
            for doc_id in ids:
                if first is None:
                    first = int(doc_id)  # first sighting ever: not a dup
                    continue
                out.append((int(doc_id), digest, first, "DOC-UNIQUE-STREAM"))
        if first is not None:  # a state-only invocation carries no rows
            state.update((int(first),))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in DUP_OUT_SCHEMA.fields])

    return fn


def duplicate_flag_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One violation row per duplicate doc (original excluded), across
    micro-batch boundaries. Within a batch the original is the smallest doc
    id — identical to the batch ``exact_duplicates`` window ordering — and
    across batches it is the first arrival, so streaming≡batch equivalence
    is exact when micro-batches preserve per-digest id order (same ordering
    contract as ``lag_continuity_stream``; a file source reading id-ordered
    files satisfies it)."""
    tagged = stream_df.select(
        F.col(id_col).alias("doc_id"), canonical_digest(F.col(text_col)).alias("digest")
    )
    return tagged.groupBy("digest").applyInPandasWithState(
        _dup_flag_fn("doc_id"),
        outputStructType=DUP_OUT_SCHEMA,
        stateStructType=DUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
