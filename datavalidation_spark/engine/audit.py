"""Audit table + partition-grain checkpoint/resume (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Layout (parquet here; the write path is format-agnostic — swap ``parquet``
for ``iceberg``/``delta`` in production for ACID commits):

    <audit_dir>/verdicts/    one row per (run_id, part_id): lineage + metrics,
                             appended per completed partition batch
    <audit_dir>/violations/  violation rows, partitioned by part_id

Resume = anti-join the input's partition ids against already-recorded
verdicts for the same (rule_version, snapshot_id) — an application-level
partition filter (SURVEY.md §4 "custom rules actually needed" (b)), so a
killed job never recomputes a validated partition.

Lineage columns per verdict: run_id, rule_version, snapshot_id (caller-
provided source snapshot, e.g. Iceberg snapshot-id), input_manifest (source
path), validated_at.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datavalidation_spark.engine.validate import ValidationResult, validate_documents


class AuditLog:
    def __init__(self, audit_dir: str):
        self.audit_dir = audit_dir
        self.verdicts_path = os.path.join(audit_dir, "verdicts")
        self.violations_path = os.path.join(audit_dir, "violations")

    def _verdicts_exist(self, spark: SparkSession) -> bool:
        try:
            spark.read.parquet(self.verdicts_path).limit(1).collect()
            return True
        except Exception:
            return False

    def validated_partitions(
        self, spark: SparkSession, rule_version: str, snapshot_id: str
    ) -> DataFrame | None:
        """part_ids already validated for this (rule_version, snapshot)."""
        if not self._verdicts_exist(spark):
            return None
        v = spark.read.parquet(self.verdicts_path)
        return (
            v.where(
                (F.col("rule_version") == rule_version)
                & (F.col("snapshot_id") == snapshot_id)
            )
            .select("part_id")
            .distinct()
        )

    def record(
        self,
        result: ValidationResult,
        run_id: str,
        rule_version: str,
        snapshot_id: str,
        input_manifest: str,
        run_ts: float | None = None,
    ) -> None:
        """Append verdicts (with lineage) and violations. Violations are
        written partitioned by part_id so resume reads prune by directory."""
        ts = run_ts if run_ts is not None else time.time()
        verdicts = result.verdicts.withColumns(
            {
                "run_id": F.lit(run_id),
                "rule_version": F.lit(rule_version),
                "snapshot_id": F.lit(snapshot_id),
                "input_manifest": F.lit(input_manifest),
                "validated_at": F.lit(ts),
            }
        )
        result.violations.write.mode("append").partitionBy("part_id").parquet(
            self.violations_path
        )
        verdicts.write.mode("append").parquet(self.verdicts_path)


def write_report(
    violations: DataFrame, path: str, fmt: str = "csv", coalesce: int | None = 1
) -> None:
    """Human-facing violation report (reference S9: ``all_results.to_csv``
    download, ``streamlit_app.py:150-151``) — csv/parquet/json sink.

    ``coalesce=1`` mirrors the single-file download artifact; pass None to
    keep the natural partitioning for big reports.
    """
    df = violations.coalesce(coalesce) if coalesce else violations
    df.write.mode("overwrite").option("header", "true").format(fmt).save(path)


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    audit_dir: str,
    run_id: str,
    rule_version: str = "v1",
    snapshot_id: str = "snap0",
    input_manifest: str = "",
    asset_catalog: DataFrame | None = None,
    partition_col: str = "part_id",
    only_partitions: list | None = None,
) -> int:
    """Validate only partitions not yet recorded; append to audit.

    Returns the number of partitions validated this run (0 = nothing to do).
    The pending-partition filter is a broadcast anti-join on part_id → Spark
    prunes the skipped partitions at the scan when the input is partitioned
    by part_id (partition pruning on the pushed-down IN-set).

    Uniqueness remains GLOBAL across resumes: the dup scan always covers the
    full ``docs`` table (doc_id column only), so a duplicate pair straddling
    a validated/pending boundary is flagged in whichever partition is
    pending. ``only_partitions`` caps this run to a partition subset
    (operational throttle; also how tests simulate a mid-job kill).
    """
    audit = AuditLog(audit_dir)
    done = audit.validated_partitions(spark, rule_version, snapshot_id)
    pending = docs
    if done is not None:
        pending = docs.join(F.broadcast(done), partition_col, "left_anti")
    if only_partitions is not None:
        pending = pending.where(F.col(partition_col).isin(only_partitions))

    n_pending = pending.select(partition_col).distinct().count()
    if n_pending == 0:
        return 0

    result = validate_documents(
        pending,
        asset_catalog=asset_catalog,
        partition_col=partition_col,
        unique_scope=docs,
    )
    audit.record(result, run_id, rule_version, snapshot_id, input_manifest)
    return n_pending
