"""Streaming token-budget admission: cross-batch per-domain quota state via
``applyInPandasWithState``.

The batch operator (``operators/sampling.py::sample_token_budget``) keeps a
domain's md5-rank-ordered prefix of documents until its token budget is
exhausted. In ingestion, the quota must survive micro-batch boundaries — a
stateless per-batch check would grant every batch a fresh budget. This
operator keeps the domain's running INCLUSIVE token sum in group state and
applies the same prefix rule: a document is admitted iff the running sum
up to and including it is within budget; once any document pushes the sum
over, every later document of that domain is rejected (the sum only
grows), exactly like the batch rule.

Semantics: admission in arrival order (doc_id-sorted within each
micro-batch). When batches arrive in md5-rank order per domain, the
admitted set is IDENTICAL to the batch operator (pytest-verified). Every
row is emitted with its verdict — the stream doubles as a quota ledger.

State size: one long per domain — trivially bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datavalidation_spark.operators.text import token_count_ws

BUDGET_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("domain", StringType()),
        StructField("n_tokens", LongType()),
        StructField("cum_tokens", LongType()),
        StructField("admitted", BooleanType()),
    ]
)

# state = the domain's running inclusive token sum across all seen docs
BUDGET_STATE_SCHEMA = StructType([StructField("cum", LongType())])


def _budget_fn(budgets: dict[str, int], default_budget: int):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (domain,) = key
        budget = budgets.get(domain, default_budget)
        cum = state.get[0] if state.exists else 0
        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values(["_ord", "doc_id"], kind="mergesort")
        # NULL token counts arrive as NaN (pandas widens LongType); they
        # count as 0 — matching the batch operator's window-sum null skip —
        # and must not poison the running sum or the int state update
        toks = (
            pd.to_numeric(rows["n_tokens"], errors="coerce")
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        cums = cum + toks.cumsum()
        state.update((int(cums[-1]),))
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"].to_numpy(),
                "domain": domain,
                "n_tokens": toks,
                "cum_tokens": cums,
                "admitted": cums <= budget,
            }
        )

    return fn


def token_budget_stream(
    stream_df: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    n_tokens: Column | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Admission verdicts for a document stream under per-domain token
    budgets; the quota persists across micro-batches (and query restarts,
    via the state store). ``order_col`` fixes the within-batch visit order
    (defaults to ``doc_id``) — pass the batch operator's md5 rank to make a
    rank-ordered ingest reproduce ``sample_token_budget`` exactly."""
    if n_tokens is None:
        n_tokens = token_count_ws(F.col(text_col))
    base = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(domain_col).cast("string").alias("domain"),
        n_tokens.cast("long").alias("n_tokens"),
        (F.col(order_col) if order_col else F.col(id_col)).alias("_ord"),
    )
    return base.groupBy("domain").applyInPandasWithState(
        _budget_fn(budgets, default_budget),
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
