"""ACID audit-sink tests: atomic visibility, crash consistency, and the
parquet-backend read-time reconciliation (ADVICE r1 atomicity item)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from datavalidation_spark.datagen import synth_documents
from datavalidation_spark.engine.acid import ManifestLog
from datavalidation_spark.engine.audit import AuditLog, run_resumable
from datavalidation_spark.engine.validate import validate_documents


def test_manifest_commit_is_atomic(spark, tmp_path):
    """Staged-but-uncommitted data files are invisible; a commit publishes
    every table of the transaction at once."""
    log = ManifestLog(str(tmp_path / "m"))
    df = spark.range(10).withColumn("v", F.col("id") * 2)

    # stage WITHOUT committing (simulates a crash mid-record)
    log._stage("t1", df)
    assert log.read(spark, "t1") is None

    # now a real two-table commit
    seq = log.commit({"t1": df, "t2": df.limit(3)})
    assert seq == 1
    assert log.read(spark, "t1").count() == 10
    assert log.read(spark, "t2").count() == 3

    # second commit appends
    log.commit({"t1": df.limit(5)})
    assert log.read(spark, "t1").count() == 15


def test_resume_on_manifest_backend(spark, tmp_path):
    """The audit contract (N/2, N/2, 0) holds on the ACID path."""
    docs = synth_documents(spark, 1000, dirty=True, n_parts=8)
    d = str(tmp_path / "audit")
    assert (
        run_resumable(spark, docs, d, run_id="r1", only_partitions=[0, 1, 2, 3]) == 4
    )
    assert run_resumable(spark, docs, d, run_id="r2") == 4
    assert run_resumable(spark, docs, d, run_id="r3") == 0

    audit = AuditLog(d)
    verd = audit.manifest.read(spark, "verdicts")
    assert verd.select("part_id").distinct().count() == 8
    viol = audit.read_violations(spark)
    # every violation's partition has a verdict (atomic by construction)
    orphans = viol.join(
        verd.select("part_id").distinct(), "part_id", "left_anti"
    ).count()
    assert orphans == 0


def test_crashed_record_is_invisible_and_resume_does_not_double_count(
    spark, tmp_path
):
    """Crash between staging and commit: the partial run is invisible, the
    resume re-validates, and violation counts match an uninterrupted run."""
    docs = synth_documents(spark, 1000, dirty=True, n_parts=8)
    d = str(tmp_path / "audit")
    audit = AuditLog(d)

    # run 1 validates half and CRASHES before commit: stage only
    sub = docs.where(F.col("part_id") < 4)
    res = validate_documents(sub, unique_scope=docs)
    audit.manifest._stage("violations", res.violations.withColumn("run_id", F.lit("r1")))
    audit.manifest._stage("verdicts", res.verdicts.withColumn("run_id", F.lit("r1")))
    assert audit.validated_partitions(spark, "v1", "snap0") is None

    # resume validates everything (nothing was committed)
    assert run_resumable(spark, docs, d, run_id="r2") == 8

    control = validate_documents(docs)
    got = audit.read_violations(spark)
    assert got.count() == control.violations.count()
    assert sorted(
        tuple(r) for r in got.select("doc_id", "rule_id").collect()
    ) == sorted(tuple(r) for r in control.violations.select("doc_id", "rule_id").collect())


def test_parquet_backend_reconciles_orphan_violations(spark, tmp_path):
    """Legacy append backend: violations written without verdicts (crash
    between the two writes) are filtered out by read_violations."""
    docs = synth_documents(spark, 500, dirty=True, n_parts=4)
    d = str(tmp_path / "audit")
    audit = AuditLog(d, backend="parquet")

    # crash simulation: violations of r0 land, verdicts never do
    res = validate_documents(docs)
    res.violations.withColumn("run_id", F.lit("r0")).write.mode("append").partitionBy(
        "part_id"
    ).parquet(audit.violations_path)
    assert audit.read_violations(spark).count() == 0  # no verdicts yet

    # clean re-run records both; reconciled view sees exactly one copy
    assert run_resumable(spark, docs, d, run_id="r1", backend="parquet") == 4
    got = audit.read_violations(spark)
    assert got.count() == res.violations.count()
    assert got.select("run_id").distinct().collect()[0][0] == "r1"


def test_torn_commit_file_is_skipped_not_fatal(spark, tmp_path):
    """A zero-length / partial commit json (possible only in dirs written by
    pre-link versions) is quarantined at read time instead of raising
    JSONDecodeError forever (ADVICE r2 medium)."""
    log = ManifestLog(str(tmp_path / "m"))
    df = spark.range(5)
    log.commit({"t": df})
    # plant a torn commit between two good ones
    with open(os.path.join(log.commits_dir, "00000002.json"), "w") as f:
        f.write('{"tables": {"t": [')  # truncated mid-write
    log.commit({"t": df.limit(2)})
    assert log.read(spark, "t").count() == 7
    # and commit() still works after the torn file exists
    log.commit({"t": df.limit(1)})
    assert log.read(spark, "t").count() == 8


def test_manifest_compaction_bounds_metadata(spark, tmp_path):
    """1,000 commits compact to ONE checkpoint file; reads see identical
    data before and after, and later commits append past the checkpoint."""
    log = ManifestLog(str(tmp_path / "m"))
    data_dir = tmp_path / "m" / "t"
    os.makedirs(data_dir, exist_ok=True)
    # publish 1,000 commits at the file level (Spark writes would dominate
    # the test); each references one real (touched) data file
    df = spark.range(4).withColumn("v", F.col("id") * 10)
    df.coalesce(1).write.parquet(str(tmp_path / "seed"))
    seed = glob.glob(str(tmp_path / "seed" / "*.parquet"))[0]
    paths = []
    for i in range(1000):
        p = str(data_dir / f"f{i:04d}.parquet")
        os.link(seed, p)
        paths.append(p)
        log._publish({"tables": {"t": [p]}, "meta": {}})
    assert len(log._commit_seqs()) == 1000
    before = sorted(log.committed_files("t"))

    top = log.compact()
    assert top == 1000
    assert len(log._commit_seqs()) == 0  # all folded
    assert len(log._checkpoints()) == 1  # into O(1) metadata
    assert sorted(log.committed_files("t")) == before

    # appends continue past the checkpoint; second compact folds them too
    log.commit({"t": df.limit(2)})
    log.compact()
    assert len(log._checkpoints()) == 1 and len(log._commit_seqs()) == 0
    # one full read at the end (1,000-file parquet scans dominate test time)
    assert log.read(spark, "t").count() == 4 * 1000 + 2


def test_parquet_backend_mixed_legacy_and_modern_rows(spark, tmp_path):
    """A round-1 dir (no run_id) later appended to by upgraded code: legacy
    rows surface with run_id NULL and must reconcile on part_id alone while
    stamped rows use the full (run_id, part_id) key — neither set dropped."""
    docs = synth_documents(spark, 500, dirty=True, n_parts=4)
    d = str(tmp_path / "audit")
    audit = AuditLog(d, backend="parquet")
    res = validate_documents(docs)

    # legacy write: violations WITHOUT run_id + verdicts for those partitions
    res.violations.write.mode("append").partitionBy("part_id").parquet(
        audit.violations_path
    )
    import pyspark.sql.functions as SF

    res.verdicts.withColumns(
        {"run_id": SF.lit("legacy"), "rule_version": SF.lit("v0"),
         "snapshot_id": SF.lit("snap0"), "input_manifest": SF.lit(""),
         "validated_at": SF.lit(0.0)}
    ).write.mode("append").parquet(audit.verdicts_path)

    # modern append on the upgraded code path
    audit.record(res, "r1", "v1", "snap0", "")

    got = audit.read_violations(spark)
    n = res.violations.count()
    assert got.count() == 2 * n  # legacy copy + modern copy both visible
    assert got.where(F.col("run_id").isNull()).count() == n
    assert got.where(F.col("run_id") == "r1").count() == n


def test_audit_auto_compaction(spark, tmp_path):
    """AuditLog folds commit metadata automatically once compact_every
    commits accumulate; reads stay identical across the fold."""
    docs = synth_documents(spark, 400, dirty=True, n_parts=4)
    d = str(tmp_path / "audit")
    audit = AuditLog(d, compact_every=3)
    for i in range(4):
        res = validate_documents(
            docs.where(F.col("part_id") == i), unique_scope=docs
        )
        audit.record(res, f"r{i}", "v1", "snap0", "")
    # 4 commits, threshold 3 → at least one fold happened
    assert len(audit.manifest._checkpoints()) >= 1
    assert len(audit.manifest._commit_seqs()) < 4
    control = validate_documents(docs)
    assert audit.read_violations(spark).count() == control.violations.count()


def test_concurrent_commit_seq_race(spark, tmp_path):
    """Losing an O_EXCL race retries the next sequence (optimistic cc)."""
    log = ManifestLog(str(tmp_path / "m"))
    df = spark.range(3)
    s1 = log.commit({"t": df})
    # squat the next sequence number to force a retry
    os.makedirs(log.commits_dir, exist_ok=True)
    with open(os.path.join(log.commits_dir, f"{s1 + 1:08d}.json"), "w") as f:
        f.write('{"tables": {}}')
    s2 = log.commit({"t": df})
    assert s2 == s1 + 2
    assert len(glob.glob(os.path.join(log.commits_dir, "*.json"))) == 3


def _file_commit(log, name, path, data_dir):
    """Publish one file-level commit referencing a real (touched) file."""
    os.makedirs(data_dir, exist_ok=True)
    open(path, "a").close()
    return log._publish({"tables": {name: [path]}, "meta": {}})


def test_reader_race_compaction_between_listings(spark, tmp_path):
    """ADVICE r3 (medium): a compaction finishing ENTIRELY between the
    reader's checkpoint listing and its commit listing leaves nothing to
    vanish mid-read — before the fix the reader silently returned an empty
    snapshot (no checkpoint existed at first list time, all commits deleted
    by second list time). The fix detects the moved checkpoint head,
    raises _Vanished internally, and retries with a consistent snapshot."""
    root = str(tmp_path / "m")
    log = ManifestLog(root)
    data_dir = str(tmp_path / "m" / "t")
    paths = [os.path.join(data_dir, f"f{i}.parquet") for i in range(5)]
    for p in paths:
        _file_commit(log, "t", p, data_dir)
    assert len(log._checkpoints()) == 0

    compactor = ManifestLog(root)  # separate handle, same directory
    real_commit_seqs = log._commit_seqs
    fired = {"n": 0}

    def racing_commit_seqs():
        # fire a full compaction the FIRST time the reader enumerates
        # commits — i.e. after it has already listed checkpoints (none)
        if fired["n"] == 0:
            fired["n"] += 1
            compactor.compact()
        return real_commit_seqs()

    log._commit_seqs = racing_commit_seqs
    files = log.committed_files("t")
    assert sorted(files) == sorted(paths)  # not [] — retry saw the checkpoint
    assert fired["n"] == 1


def test_crashed_compaction_does_not_duplicate_entries(spark, tmp_path):
    """ADVICE r3 (low): a compaction that crashed between checkpoint publish
    and commit deletion leaves stale commits with seq <= the checkpoint
    floor; the next compact must not duplicate their files' entries."""
    import json as _json

    root = str(tmp_path / "m")
    log = ManifestLog(root)
    data_dir = str(tmp_path / "m" / "t")
    paths = [os.path.join(data_dir, f"f{i}.parquet") for i in range(3)]
    for p in paths:
        _file_commit(log, "t", p, data_dir)
    top = log.compact()
    assert top == 3
    # simulate the crash: resurrect a folded commit (seq 1 <= floor 3)
    with open(os.path.join(log.commits_dir, "00000001.json"), "w") as f:
        f.write(_json.dumps({"tables": {"t": [paths[0]]}, "meta": {}}))
    log.compact()
    (_, ckpt_path), = log._checkpoints()
    with open(ckpt_path) as f:
        entries = _json.load(f)["tables"]["t"]
    assert len(entries) == len(set(entries)) == 3
    assert sorted(log.committed_files("t")) == sorted(paths)


def test_compact_sweeps_stale_tmp_files(spark, tmp_path):
    """ADVICE r3 (low): orphan _tmp-* files from a crash between fsync and
    unlink are garbage-collected by compact(); fresh tmps are left alone."""
    root = str(tmp_path / "m")
    log = ManifestLog(root)
    data_dir = str(tmp_path / "m" / "t")
    _file_commit(log, "t", os.path.join(data_dir, "f0.parquet"), data_dir)
    _file_commit(log, "t", os.path.join(data_dir, "f1.parquet"), data_dir)
    stale = os.path.join(log.commits_dir, "_tmp-deadbeef")
    fresh = os.path.join(log.commits_dir, "_tmp-cafebabe")
    open(stale, "w").close()
    open(fresh, "w").close()
    os.utime(stale, (0, 0))  # ancient mtime → eligible for sweep
    log.compact()
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # age-gated: in-flight tmp untouched
