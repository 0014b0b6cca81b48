"""Audit/resume + report-sink tests (SURVEY.md §5.4 determinism/resume)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.datagen import synth_asset_catalog, synth_documents
from datavalidation_spark.engine.audit import AuditLog, run_resumable, write_report
from datavalidation_spark.engine.validate import validate_documents


def test_kill_and_resume_identical_audit(spark, tmp_path):
    """Half-run + resume produces the same verdicts as one full run."""
    docs = synth_documents(spark, 2000, dirty=True, n_parts=8, n_assets=500)
    cat = synth_asset_catalog(spark, 500)

    # interrupted: first run killed after partitions 0-3 (same full input!)
    d1 = str(tmp_path / "interrupted")
    run_resumable(
        spark, docs, d1, run_id="r1", asset_catalog=cat,
        only_partitions=[0, 1, 2, 3],
    )
    n2 = run_resumable(spark, docs, d1, run_id="r2", asset_catalog=cat)
    assert n2 == 4
    assert run_resumable(spark, docs, d1, run_id="r3", asset_catalog=cat) == 0

    # uninterrupted control
    d2 = str(tmp_path / "full")
    run_resumable(spark, docs, d2, run_id="rX", asset_catalog=cat)

    v1 = spark.read.parquet(d1 + "/verdicts")
    v2 = spark.read.parquet(d2 + "/verdicts")
    key = ["part_id", "row_count", "violation_count", "violating_rows", "passed"]
    assert sorted(tuple(r) for r in v1.select(*key).collect()) == sorted(
        tuple(r) for r in v2.select(*key).collect()
    )
    # lineage columns present
    assert {"run_id", "rule_version", "snapshot_id", "input_manifest", "validated_at"} <= set(v1.columns)

    # violation rows identical too (modulo which run wrote them)
    viol1 = spark.read.parquet(d1 + "/violations").select("doc_id", "rule_id")
    viol2 = spark.read.parquet(d2 + "/violations").select("doc_id", "rule_id")
    assert sorted(map(tuple, viol1.collect())) == sorted(map(tuple, viol2.collect()))


def test_rule_version_bump_revalidates(spark, tmp_path):
    docs = synth_documents(spark, 500, dirty=True, n_parts=4)
    d = str(tmp_path / "audit")
    assert run_resumable(spark, docs, d, run_id="a", rule_version="v1") == 4
    assert run_resumable(spark, docs, d, run_id="b", rule_version="v1") == 0
    # new rule version → all partitions pending again
    assert run_resumable(spark, docs, d, run_id="c", rule_version="v2") == 4


def test_csv_report_sink(spark, tmp_path):
    docs = synth_documents(spark, 1000, dirty=True)
    res = validate_documents(docs, check_unique=False)
    p = str(tmp_path / "report_csv")
    write_report(res.violations, p, fmt="csv")
    back = spark.read.option("header", "true").csv(p)
    assert back.count() == res.violations.count()
    assert set(back.columns) == set(res.violations.columns)
