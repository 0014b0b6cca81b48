"""Time-travel reads over the manifest log (engine/acid.py read_at /
snapshots): per-commit granularity must survive checkpoint compaction."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.engine.acid import ManifestLog


def _commit_range(log, spark, lo, hi, meta=None):
    df = spark.range(lo, hi).withColumn("v", F.col("id") * 2)
    return log.commit({"t": df}, meta=meta)


def test_read_at_each_commit(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = _commit_range(log, spark, 0, 10)
    s2 = _commit_range(log, spark, 10, 15)
    s3 = _commit_range(log, spark, 15, 18)
    assert [log.read_at(spark, "t", s).count() for s in (s1, s2, s3)] == [
        10, 15, 18,
    ]
    # current read == read at the latest snapshot
    assert log.read(spark, "t").count() == 18
    # before the first commit there is nothing
    assert log.read_at(spark, "t", 0) is None


def test_history_survives_compaction(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    seqs = [_commit_range(log, spark, i * 5, (i + 1) * 5) for i in range(4)]
    top = log.compact()
    assert top == seqs[-1]
    # all commit files folded away, yet every historic state reconstructs
    for i, s in enumerate(seqs):
        assert log.read_at(spark, "t", s).count() == (i + 1) * 5
    # and keeps working through a SECOND fold with new commits on top
    s5 = _commit_range(log, spark, 20, 30)
    log.compact()
    assert log.read_at(spark, "t", seqs[1]).count() == 10
    assert log.read_at(spark, "t", s5).count() == 30


def test_snapshots_listing_with_meta(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = _commit_range(log, spark, 0, 5, meta={"run": "a"})
    s2 = _commit_range(log, spark, 5, 9, meta={"run": "b"})
    log.compact()
    s3 = _commit_range(log, spark, 9, 12, meta={"run": "c"})
    snaps = dict(log.snapshots())
    assert list(snaps) == [s1, s2, s3]
    assert [m["run"] for m in snaps.values()] == ["a", "b", "c"]


def test_legacy_checkpoint_without_history(spark, tmp_path):
    """A pre-history checkpoint loses granularity below its floor: reads at
    or above the floor work (whole fold), below it raise ValueError."""
    log = ManifestLog(str(tmp_path / "m"))
    _commit_range(log, spark, 0, 5)
    s2 = _commit_range(log, spark, 5, 9)
    top = log.compact()
    # strip the history section to simulate a legacy checkpoint
    path = os.path.join(log.commits_dir, f"_checkpoint-{top:08d}.json")
    doc = json.load(open(path))
    doc.pop("history")
    os.unlink(path)
    with open(path, "w") as f:
        json.dump(doc, f)

    assert log.read_at(spark, "t", s2).count() == 9
    with pytest.raises(ValueError, match="predates"):
        log.committed_files_at("t", s2 - 1)
    # and the next compaction re-wraps the fold as one synthetic snapshot,
    # carrying the granularity loss forward as history_floor
    _commit_range(log, spark, 9, 11)
    log.compact()
    assert log.read_at(spark, "t", s2).count() == 9
    with pytest.raises(ValueError, match="predates"):
        log.committed_files_at("t", s2 - 1)
