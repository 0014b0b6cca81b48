"""Snapshot reconciliation — table diff between two versions of a dataset.

A validation engine that records per-partition lineage (engine/audit.py)
also needs the inverse tool: given two snapshots of the same table (before/
after a migration, two replicas, engine A vs engine B), report WHAT changed
— per row: ADDED / REMOVED / CHANGED — without shipping either table to the
driver.

Scale design (100 TB): two tiers.

* ``partition_digests`` — one order-insensitive digest row per partition
  (count + sum of row fingerprints). Comparing two snapshots costs one
  map-side-combinable aggregation per side and a join of #partitions rows:
  identical partitions are proven identical WITHOUT a row-level join, so a
  typical incremental diff touches only the few diverging partitions.
* ``table_diff`` — row-level reconciliation via a single full-outer join on
  the key columns, comparing a null-safe fingerprint of the non-key columns.
  Run it on everything, or (the intended 100-TB flow) only on partitions
  whose digests diverged.

Fingerprints use ``xxhash64`` over the compared columns — engine-internal
on purpose (never exposed in contract outputs; the `snapshot_diff` oracle
compares column values directly, which is the same predicate).

``merge_upsert`` is the write-side inverse: apply a changeset (updates +
inserts + deletes) to a snapshot with SQL MERGE semantics, planned so the
big target is anti-joined against the small changeset's keys (broadcast
when it fits) and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(cols: list[str]):
    # null-safe: hash the value and a presence bit per column, so
    # (NULL, "x") never collides with ("x", NULL)
    parts = []
    for c in cols:
        parts.append(F.col(c).isNull().cast("int"))
        parts.append(F.col(c))
    return F.xxhash64(*parts)


def partition_digests(
    df: DataFrame,
    partition_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """One row per partition: (partition, n_rows, digest). The digest is an
    order-insensitive sum of row fingerprints in decimal(38,0) (full-range
    int64 hashes overflow a bigint sum after ~2 rows). Equal digests + equal
    counts ⇒ partitions equal up to hash collision (~2⁻⁶⁴ per row pair)."""
    return df.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_fingerprint(compare_cols).cast("decimal(38,0)")).alias("digest"),
    )


def diverging_partitions(
    a: DataFrame,
    b: DataFrame,
    partition_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Partitions whose digests differ between snapshots ``a`` and ``b``
    (including partitions present on only one side). The cheap first tier:
    row-level diff only what this returns."""
    da = partition_digests(a, partition_col, compare_cols)
    db = partition_digests(b, partition_col, compare_cols)
    joined = da.alias("a").join(
        db.alias("b"), on="partition", how="full_outer"
    )
    return joined.where(
        ~(
            F.col("a.n_rows").eqNullSafe(F.col("b.n_rows"))
            & F.col("a.digest").eqNullSafe(F.col("b.digest"))
        )
    ).select(
        "partition",
        F.col("a.n_rows").alias("n_rows_a"),
        F.col("b.n_rows").alias("n_rows_b"),
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """SQL MERGE semantics without a table format: upsert ``source`` into
    ``target`` by key — matched keys take the source row (update), unmatched
    source rows insert, and if ``delete_col`` names a boolean column in
    ``source``, rows where it is true delete the matching target key instead.

    Planned as ONE left-anti join (target keys not present in source) plus a
    union with the surviving source rows — no full-outer join, no window.
    The anti join broadcasts when the source fits (Catalyst static estimate
    + AQE), which is the common case: a changeset is small relative to the
    100-TB target, so the target is never shuffled at all. Source keys must
    be unique (run the uniqueness engine on the changeset first).
    """
    if not key_cols:
        raise ValueError("merge_upsert needs key columns")
    out_cols = target.columns
    keys = source.select(*key_cols)
    untouched = target.join(keys, on=key_cols, how="left_anti")
    surviving = source
    if delete_col is not None:
        surviving = surviving.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    return untouched.unionByName(surviving.select(*out_cols))


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level reconciliation of snapshot ``b`` against snapshot ``a``.

    Returns (*key_cols, status) with status ∈ {ADDED, REMOVED, CHANGED[,
    UNCHANGED]}: ADDED = key only in ``b``, REMOVED = key only in ``a``,
    CHANGED = key in both with any compared column differing (null-safe).
    Keys must be unique per side (it IS the uniqueness engine's job to
    establish that first). One full-outer shuffle join on the keys; the
    fingerprint comparison is a single long per side, so wide tables
    compare as cheaply as narrow ones."""
    if not key_cols:
        raise ValueError("table_diff needs key columns")
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in key_cols]
    fa = a.select(*key_cols, _fingerprint(compare_cols).alias("_fp_a"))
    fb = b.select(*key_cols, _fingerprint(compare_cols).alias("_fp_b"))
    joined = fa.join(fb, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("_fp_a").isNull(), F.lit("ADDED"))
        .when(F.col("_fp_b").isNull(), F.lit("REMOVED"))
        .when(F.col("_fp_a") != F.col("_fp_b"), F.lit("CHANGED"))
        .otherwise(F.lit("UNCHANGED"))
    )
    out = joined.select(*key_cols, status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "UNCHANGED")
    return out
