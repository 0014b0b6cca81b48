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
    collected. Returns ``result`` for chaining.

    CALLER CONTRACT: the lifetime hook rides on the exact ``result``
    OBJECT. Deriving from it and dropping it (``op(...).select(...)``)
    garbage-collects the carrier at plan-build time and unpersists the
    intermediate BEFORE the derived query runs — the cache then never
    materializes and the operator silently recomputes its shared subtree.
    When you derive, transfer the hook with :func:`carry_release`::

        res = simhash_pairs(...)
        return carry_release(res, res.select("id_a", "id_b"))
    """
    fins = [weakref.finalize(result, _safe_unpersist, c) for c in cached]
    # record (finalizer, cached) so carry_release can move the hook to a
    # derived plan; the attribute also keeps `cached` strongly referenced
    # exactly as long as `result` lives
    existing = getattr(result, "_release_hooks", [])
    result._release_hooks = existing + list(zip(fins, cached))
    return result


def carry_release(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move ``src``'s cache-release hooks onto ``dst`` — for the
    derive-and-drop pattern (``dst = src.select(...)``; ``src`` is about to
    go out of scope). Returns ``dst``."""
    hooks = getattr(src, "_release_hooks", [])
    for fin, cached in hooks:
        fin.detach()  # src's death must no longer unpersist
        release_with(dst, cached)
    src._release_hooks = []
    return dst
