"""Audit table + partition-grain checkpoint/resume (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Layout (default backend = Iceberg-style atomic manifest commits,
``engine/acid.py`` — swap for a real Iceberg/Delta catalog in production
behind the same AuditLog interface):

    <audit_dir>/verdicts/    one row per (run_id, part_id): lineage + metrics
    <audit_dir>/violations/  violation rows (+ run_id)
    <audit_dir>/_commits/    atomic commit manifests (manifest backend)

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
    """Audit sink with two backends:

    * ``backend="manifest"`` (default) — Iceberg-style atomic commits via
      :class:`~datavalidation_spark.engine.acid.ManifestLog`: verdicts AND
      violations of a run become visible in ONE filesystem-atomic step, so a
      mid-record crash can never leave violations without their verdicts
      (ADVICE r1 atomicity fix).
    * ``backend="parquet"`` — plain append dirs (round-1 layout, kept for
      compatibility). Verdicts are written LAST (resume-safe ordering) and
      :meth:`read_violations` reconciles against recorded verdicts so
      orphaned rows from a crash are filtered at read time instead of
      double-counting after the resume re-validates.
    """

    def __init__(
        self, audit_dir: str, backend: str = "manifest", compact_every: int = 64
    ):
        from datavalidation_spark.engine.acid import ManifestLog

        if backend not in ("manifest", "parquet"):
            raise ValueError(f"unknown audit backend: {backend}")
        self.audit_dir = audit_dir
        self.backend = backend
        self.compact_every = compact_every
        self.verdicts_path = os.path.join(audit_dir, "verdicts")
        self.violations_path = os.path.join(audit_dir, "violations")
        self.manifest = ManifestLog(audit_dir)

    def _read_verdicts(self, spark: SparkSession) -> DataFrame | None:
        if self.backend == "manifest":
            return self.manifest.read(spark, "verdicts")
        try:
            df = spark.read.parquet(self.verdicts_path)
            df.limit(1).collect()
            return df
        except Exception:
            return None

    def validated_partitions(
        self, spark: SparkSession, rule_version: str, snapshot_id: str
    ) -> DataFrame | None:
        """part_ids already validated for this (rule_version, snapshot)."""
        v = self._read_verdicts(spark)
        if v is None:
            return None
        return (
            v.where(
                (F.col("rule_version") == rule_version)
                & (F.col("snapshot_id") == snapshot_id)
            )
            .select("part_id")
            .distinct()
        )

    def read_violations(self, spark: SparkSession) -> DataFrame | None:
        """Committed violation rows, consistent with verdicts.

        Manifest backend: trivially consistent (atomic commits). Parquet
        backend: semi-join on (run_id, part_id) pairs present in verdicts —
        rows from a run that crashed before its verdict write are dropped,
        so reports never double-count after resume."""
        if self.backend == "manifest":
            return self.manifest.read(spark, "violations")
        try:
            # mergeSchema: a round-1 dir appended to by upgraded code holds
            # files with AND without run_id — plain reads take the schema
            # from ONE sampled footer (nondeterministic across sessions);
            # merging guarantees run_id surfaces whenever any file has it,
            # with legacy rows as NULL handled per-row below
            viol = spark.read.option("mergeSchema", "true").parquet(
                self.violations_path
            )
            viol.limit(1).collect()
        except Exception:
            return None
        verd = self._read_verdicts(spark)
        if verd is None:
            return viol.limit(0)
        if "run_id" not in viol.columns:
            # all-legacy (round-1) violations parquet carries no run_id
            # column — reconcile on part_id alone so pre-existing audit
            # dirs stay readable (ADVICE r2 low #2).
            return viol.join(
                F.broadcast(verd.select("part_id").distinct()),
                ["part_id"],
                "left_semi",
            )
        # MIXED dirs (legacy files + post-upgrade appends): schema inference
        # takes run_id from a sampled new footer and legacy rows surface
        # with run_id NULL — a (run_id, part_id) semi-join would silently
        # drop every pre-upgrade violation, so reconcile per ROW: NULL
        # run_id rows on part_id alone, stamped rows on the full key.
        modern = viol.where(F.col("run_id").isNotNull()).join(
            F.broadcast(verd.select("run_id", "part_id").distinct()),
            ["run_id", "part_id"],
            "left_semi",
        )
        legacy = viol.where(F.col("run_id").isNull()).join(
            F.broadcast(verd.select("part_id").distinct()),
            ["part_id"],
            "left_semi",
        )
        return modern.unionByName(legacy)

    def record(
        self,
        result: ValidationResult,
        run_id: str,
        rule_version: str,
        snapshot_id: str,
        input_manifest: str,
        run_ts: float | None = None,
    ) -> None:
        """Record verdicts (with lineage) and violations for one run."""
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
        violations = result.violations.withColumn("run_id", F.lit(run_id))
        if self.backend == "manifest":
            self.manifest.commit(
                {"violations": violations, "verdicts": verdicts},
                meta={
                    "run_id": run_id,
                    "rule_version": rule_version,
                    "snapshot_id": snapshot_id,
                    "input_manifest": input_manifest,
                    "validated_at": ts,
                },
            )
            # keep metadata reads O(1) for long-lived audit tables: fold
            # accumulated commit files into a checkpoint once enough pile up
            if (
                self.compact_every
                and len(self.manifest._commit_seqs()) >= self.compact_every
            ):
                self.manifest.compact()
            return
        violations.write.mode("append").partitionBy("part_id").parquet(
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
    backend: str = "manifest",
    extra_rules: list | None = None,
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
    audit = AuditLog(audit_dir, backend=backend)
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
        extra_rules=extra_rules,
        partition_col=partition_col,
        unique_scope=docs,
    )
    audit.record(result, run_id, rule_version, snapshot_id, input_manifest)
    return n_pending
