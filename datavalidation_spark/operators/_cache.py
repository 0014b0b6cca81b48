"""Release persisted intermediates when their consumer plan is dropped.

Several operators persist a small intermediate (simhash signatures, the IVF
normalized corpus) that is read by more than one downstream job of the SAME
returned plan. ``unpersist()`` cannot run inside the operator — the caller
has not materialized the plan yet — and without a release path every call in
a long-lived session accumulates cached blocks forever (ADVICE r4).

``release_with(result, cached)`` ties the cached DataFrame's lifetime to the
returned plan object: when the caller drops the result DataFrame (the bench
loop, a one-shot pipeline stage), CPython's refcount finalizer unpersists the
intermediate; while the caller holds the result, the cache stays valid for
re-collection and for executor-loss recompute. Lineage is intact either way —
unpersist only drops blocks, never correctness.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _safe_unpersist(cached: DataFrame) -> None:
    try:
        cached.unpersist()
    except Exception:  # noqa: BLE001 — interpreter/JVM may be shutting down
        pass


def release_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each ``cached`` DataFrame when ``result`` is garbage
    collected. Returns ``result`` for chaining."""
    for c in cached:
        weakref.finalize(result, _safe_unpersist, c)
    return result
