"""Streaming sequence packing: cross-batch stateful greedy first-fit via
``applyInPandasWithState``.

The batch operator (``operators/packing.py::pack_sequences``) packs each
md5-hash bucket in one pass. In streaming ingestion, a bucket's open pack
straddles micro-batch boundaries — a stateless per-batch pack would close
every pack at each boundary and re-emit ``pack_id`` 0, wasting capacity
and colliding ids. This operator keeps ``(pack_id, fill)`` per bucket in
group state, so a document arriving in batch N+1 keeps filling the pack
opened in batch N.

Semantics: docs are packed in arrival order (doc_id-sorted within each
micro-batch). When micro-batches arrive in doc_id order per bucket — true
for an append-only ingest keyed by monotonically increasing ids — the
result is IDENTICAL to the batch operator on the union of all batches
(pytest-verified, including a pack that straddles the boundary).

State size: two ints per bucket; bucket count scales with corpus size
(``default_buckets``), so state is millions of rows at 100 TB — trivially
within state-store budget, and each key's state is O(1) regardless of how
many docs ever passed through it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from datavalidation_spark.operators.sampling import hash_rank
from datavalidation_spark.operators.text import token_count_ws

PACK_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", IntegerType()),
        StructField("pack_id", IntegerType()),
        StructField("pack_offset", IntegerType()),
        StructField("eff_tokens", IntegerType()),
        StructField("truncated", BooleanType()),
    ]
)

# state = the bucket's open pack: (pack_id, fill) carried across batches
PACK_STATE_SCHEMA = StructType(
    [StructField("pack_id", IntegerType()), StructField("fill", IntegerType())]
)


def _pack_fn(capacity: int):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            pack_id, fill = state.get
        else:
            pack_id, fill = -1, capacity + 1  # force a new pack on row 1
        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values("doc_id", kind="mergesort")
        out_pack, out_off, out_eff = [], [], []
        toks = rows["n_tokens"].to_numpy()
        for t in toks:
            eff = min(int(t), capacity)
            if fill + eff > capacity:
                pack_id += 1
                fill = 0
            out_pack.append(pack_id)
            out_off.append(fill)
            out_eff.append(eff)
            fill += eff
        state.update((int(pack_id), int(fill)))
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"].to_numpy(),
                "bucket": bucket,
                "pack_id": out_pack,
                "pack_offset": out_off,
                "eff_tokens": out_eff,
                "truncated": toks > capacity,
            }
        )

    return fn


def pack_stream(
    stream_df: DataFrame,
    capacity: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Streaming pack assignments — same row contract as the batch
    ``pack_sequences`` (``doc_id, bucket, pack_id, pack_offset,
    eff_tokens, truncated``); packs stay open across micro-batches."""
    if n_tokens is None:
        n_tokens = token_count_ws(F.col(text_col))
    base = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("int").alias("n_tokens"),
        F.pmod(hash_rank(F.col(id_col), salt=seed), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    return base.groupBy("bucket").applyInPandasWithState(
        _pack_fn(capacity),
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
