"""Custom stateful streaming operator: cross-batch lag continuity via
``applyInPandasWithState``.

The batch engine checks lag continuity with a window (``W1``/``W2``,
``rules/maritime.py::fuel_rob_context``). In streaming, a lag crosses
micro-batch boundaries — exactly the pair the reference's batch slicing
silently skips (``fuel_rob_validation.py:91-94``, documented divergence in
SURVEY §7.4). This operator keeps the last observed value per key in
**group state**, so the first row of every new micro-batch is compared
against the tail of the previous one: no cross-batch pair is ever missed.

Semantics: for each key ordered by (ts, id), emit a violation row whenever
``|value − prev_value| > max_jump``. Equivalent batch query: a lag window —
the streaming≡batch equivalence is pytest-verified with the input split
across micro-batches.

Ordering contract: micro-batches must arrive in event order per key (true
for a file source with ``maxFilesPerTrigger`` reading time-ordered files,
and for Kafka partitions keyed by the group key). Out-of-order *within* a
batch is handled (rows are sorted before the scan); out-of-order *across*
batches needs a watermark-delayed reorder buffer upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LAG_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("prev_value", DoubleType()),
        StructField("rule_id", StringType()),
    ]
)

# state = the last observed value per key (carried across micro-batches)
LAG_STATE_SCHEMA = StructType([StructField("last_value", DoubleType())])


def _lag_fn(ts_col: str, id_col: str, val_col: str, max_jump: float):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last = state.get[0] if state.exists else None
        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values([ts_col, id_col], kind="mergesort")
        vals = rows[val_col].to_numpy(dtype=np.float64)
        prev = np.concatenate(
            [[np.nan if last is None else last], vals[:-1]]
        )
        mask = ~np.isnan(prev) & ~np.isnan(vals) & (np.abs(vals - prev) > max_jump)
        state.update((float(vals[-1]),))
        if mask.any():
            yield pd.DataFrame(
                {
                    "user_id": np.full(int(mask.sum()), user_id, dtype=np.int64),
                    "event_id": rows[id_col].to_numpy(dtype=np.int64)[mask],
                    "value": vals[mask],
                    "prev_value": prev[mask],
                    "rule_id": "LAG-JUMP",
                }
            )

    return fn


def lag_continuity_stream(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    max_jump: float = 150.0,
) -> DataFrame:
    """Violation stream for cross-batch lag jumps (stateful, Arrow-batched;
    state size = one double per key, so 10^9 keys ≈ a few GB across the
    cluster's state stores — scale-safe)."""
    return stream_df.groupBy(key_col).applyInPandasWithState(
        _lag_fn(ts_col, id_col, val_col, max_jump),
        outputStructType=LAG_OUT_SCHEMA,
        stateStructType=LAG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
