"""Functional-dependency and denial-constraint validation.

The reference validates rows one at a time against per-column domain rules
(`me_consumption_validation.py`, `speed_validation.py`, ...); a declarative
constraint engine at 100 TB also needs CROSS-ROW consistency checks — the
classic data-quality constraint families:

* **Functional dependency (FD)** ``lhs -> rhs``: every group of rows agreeing
  on the ``lhs`` columns must agree on the ``rhs`` columns. A violation is an
  ``lhs`` group observed with >= 2 distinct ``rhs`` variants (e.g. the same
  vessel name mapped to two vessel types — the exact inconsistency the
  reference's per-vessel N+1 lookups silently paper over by taking the first
  row, `speed_validation.py:49-53`).
* **Conditional FD (CFD)**: the same, restricted to rows matching a
  ``condition`` predicate (FD holds only on a subset, e.g. only for
  ``event = 'NOON AT SEA'`` rows).

Scale design — this is deliberately NOT ``groupBy(lhs).agg(countDistinct(rhs))``:
Spark plans multi-column ``count(distinct ...)`` via an Expand (row
multiplication) and the distinct set for a hot ``lhs`` key concentrates on one
reducer. Instead the check runs as two map-side-combinable hash aggregations:

  1. ``groupBy(lhs + rhs).count()`` — partial counts combine map-side, so a
     hot ``lhs`` key arrives at the reducers pre-collapsed to one row per
     (map partition x variant);
  2. ``groupBy(lhs)`` over the tiny variant table — counts variants and sums
     rows; the input is already one row per distinct (lhs, rhs), bounded by
     the domain, not the corpus.

Both shuffles combine map-side; no Expand, no per-key distinct sets, skew-safe
by construction. At 10^12 rows the scan dominates, as it should.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fd_violations(
    df: DataFrame,
    lhs: list[str],
    rhs: list[str],
    condition: Column | None = None,
) -> DataFrame:
    """Violation rows for the (conditional) functional dependency lhs -> rhs.

    Returns one row per violated ``lhs`` group:
    ``(*lhs, n_rows, n_variants, min_<c>/max_<c> for each rhs column)`` —
    ``n_rows`` counts the rows participating in the violation, ``n_variants``
    the distinct rhs combinations observed, and the min/max columns bound the
    conflicting values (a deterministic, order-free "show me two conflicting
    examples"). Rows with a NULL in any lhs column are excluded (an FD says
    nothing about an undefined key); NULL rhs values participate as a variant
    (a mix of NULL and non-NULL *is* an inconsistency).
    """
    if not lhs or not rhs:
        raise ValueError("fd_violations needs non-empty lhs and rhs")
    scoped = df
    if condition is not None:
        scoped = scoped.where(condition)
    for c in lhs:
        scoped = scoped.where(F.col(c).isNotNull())

    variants = scoped.groupBy(*lhs, *rhs).agg(
        F.count(F.lit(1)).alias("_n_rows_variant")
    )
    bounds = []
    for c in rhs:
        bounds.append(F.min(c).alias(f"min_{c}"))
        bounds.append(F.max(c).alias(f"max_{c}"))
    return (
        variants.groupBy(*lhs)
        .agg(
            F.sum("_n_rows_variant").alias("n_rows"),
            F.count(F.lit(1)).alias("n_variants"),
            *bounds,
        )
        .where(F.col("n_variants") >= 2)
    )


def fd_holds(
    df: DataFrame,
    lhs: list[str],
    rhs: list[str],
    condition: Column | None = None,
) -> bool:
    """True iff the (conditional) FD lhs -> rhs holds exactly on ``df``.

    Early-exits via ``isEmpty`` (Spark runs the minimum number of partitions
    needed to find one row), so a grossly violated FD answers without a full
    scan of the aggregate output.
    """
    return fd_violations(df, lhs, rhs, condition=condition).isEmpty()
