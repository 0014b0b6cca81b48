"""Overwrite-snapshot (replace) semantics on the manifest log — the write
shape CDC upsert needs: each commit publishes the FULL new state of a table
and hides older files from current reads, while time travel still reaches
every historic snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.engine.acid import ManifestLog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def test_replace_hides_older_files(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 10)})
    log.commit({"t": _df(spark, 100, 105)}, replace=True)
    ids = sorted(r.id for r in log.read(spark, "t").collect())
    assert ids == list(range(100, 105))


def test_append_after_replace_unions(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 10)})
    log.commit({"t": _df(spark, 100, 105)}, replace=True)
    log.commit({"t": _df(spark, 200, 202)})  # plain append on top
    ids = sorted(r.id for r in log.read(spark, "t").collect())
    assert ids == list(range(100, 105)) + [200, 201]


def test_replace_is_per_table(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 5), "u": _df(spark, 0, 3)})
    log.commit({"t": _df(spark, 10, 12)}, replace=True)
    assert log.read(spark, "t").count() == 2
    assert log.read(spark, "u").count() == 3  # untouched table unaffected


def test_replace_survives_compaction_and_time_travel(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 10)})
    s2 = log.commit({"t": _df(spark, 100, 105)}, replace=True)
    s3 = log.commit({"t": _df(spark, 200, 202)})
    top = log.compact()
    assert top == s3
    # current read folds replace into the checkpoint
    ids = sorted(r.id for r in log.read(spark, "t").collect())
    assert ids == list(range(100, 105)) + [200, 201]
    # time travel reaches the pre-replace state (replaced files stay on disk)
    assert sorted(r.id for r in log.read_at(spark, "t", s1).collect()) == list(
        range(10)
    )
    assert sorted(r.id for r in log.read_at(spark, "t", s2).collect()) == list(
        range(100, 105)
    )
    # a second compaction must not resurrect replaced files
    log.commit({"t": _df(spark, 300, 301)})
    log.compact()
    ids = sorted(r.id for r in log.read(spark, "t").collect())
    assert ids == list(range(100, 105)) + [200, 201, 300]
