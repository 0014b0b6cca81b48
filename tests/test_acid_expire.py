"""expire_snapshots (engine/acid.py): history truncation + vacuum. Kept
snapshots must reconstruct exactly; expired reads must raise; data files no
kept snapshot references must be GONE from disk; current reads unaffected."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.engine.acid import ManifestLog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_expire_truncates_history_and_vacuums(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 5)})
    s2 = log.commit({"t": _df(spark, 100, 103)}, replace=True)  # hides s1
    s3 = log.commit({"t": _df(spark, 200, 202)})
    s4 = log.commit({"t": _df(spark, 300, 301)})
    s1_files = set(log.committed_files_at("t", s1))
    assert s1_files, "s1 must reference data files before expiry"

    res = log.expire_snapshots(before_seq=s3)
    # s1 unreachable; s2 collapses into the synthetic base
    assert res["expired_snapshots"] == 1
    assert res["deleted_files"] >= 1

    # current read unaffected
    assert _ids(log.read(spark, "t")) == [100, 101, 102, 200, 201, 300]
    # kept snapshots reconstruct exactly
    assert _ids(log.read_at(spark, "t", s2)) == [100, 101, 102]
    assert _ids(log.read_at(spark, "t", s3)) == [100, 101, 102, 200, 201]
    assert _ids(log.read_at(spark, "t", s4)) == [100, 101, 102, 200, 201, 300]
    # expired snapshot raises (below the history floor)
    with pytest.raises(ValueError):
        log.committed_files_at("t", s1)
    # vacuum: s1's files (replaced at s2, unreferenced by any kept state)
    # are physically gone
    assert all(not os.path.exists(f) for f in s1_files)


def test_expire_keeps_files_shared_with_kept_snapshots(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 5)})       # appended, never replaced
    s2 = log.commit({"t": _df(spark, 10, 12)})
    s3 = log.commit({"t": _df(spark, 20, 21)})
    res = log.expire_snapshots(before_seq=s3)
    # s1/s2 files are still part of every kept state (append-only table):
    # nothing may be deleted
    assert res["deleted_files"] == 0
    assert _ids(log.read(spark, "t")) == [0, 1, 2, 3, 4, 10, 11, 20]
    assert _ids(log.read_at(spark, "t", s2)) == [0, 1, 2, 3, 4, 10, 11]
    with pytest.raises(ValueError):
        log.committed_files_at("t", s1)


def test_expire_noop_cases(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    assert log.expire_snapshots(10) == {
        "expired_snapshots": 0, "deleted_files": 0,
    }
    s1 = log.commit({"t": _df(spark, 0, 3)})
    assert log.expire_snapshots(before_seq=s1) == {
        "expired_snapshots": 0, "deleted_files": 0,
    }
    assert _ids(log.read(spark, "t")) == [0, 1, 2]


def test_commit_and_compact_after_expire(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 3)})
    s2 = log.commit({"t": _df(spark, 10, 12)}, replace=True)
    s3 = log.commit({"t": _df(spark, 20, 21)})
    log.expire_snapshots(before_seq=s3)
    s4 = log.commit({"t": _df(spark, 30, 31)})
    log.compact()
    assert _ids(log.read(spark, "t")) == [10, 11, 20, 30]
    assert _ids(log.read_at(spark, "t", s2)) == [10, 11]
    assert _ids(log.read_at(spark, "t", s4)) == [10, 11, 20, 30]
