"""Count-min sketch (operators/cms.py): exactness at no-collision widths,
the structural no-underestimate guarantee under forced collisions, and
slice-mergeability (the 100-TB fan-in property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.operators.cms import cms_build, cms_estimate


def _items(spark):
    # planted frequencies: token i appears (i+1)*3 times, i in 0..9
    rows = [(f"tok{i}",) for i in range(10) for _ in range((i + 1) * 3)]
    return spark.createDataFrame(rows, "term string")


def test_exact_at_wide_width(spark):
    df = _items(spark)
    sketch = cms_build(df, "term", depth=4, width=4096)
    keys = df.select("term").distinct()
    est = {r.term: r.cms_est for r in
           cms_estimate(sketch, keys, "term", depth=4, width=4096).collect()}
    assert est == {f"tok{i}": (i + 1) * 3 for i in range(10)}


def test_never_underestimates_under_collisions(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 50).cast("string").alias("term")
    )
    exact = {r.term: r.c for r in
             df.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()}
    # width 16 forces heavy collisions; the min-over-rows estimate must
    # still never drop below the true count for ANY key
    sketch = cms_build(df, "term", depth=3, width=16)
    est = {r.term: r.cms_est for r in
           cms_estimate(sketch, df.select("term").distinct(), "term",
                        depth=3, width=16).collect()}
    assert all(est[t] >= exact[t] for t in exact)
    assert any(est[t] > exact[t] for t in exact)  # collisions really happened


def test_sketch_merges_across_slices(spark):
    """Sketch(full) == groupBy-sum of Sketch(first half) U Sketch(second
    half) — the property that lets every partition/executor build
    independently and a tiny fan-in merge finish the job."""
    df = spark.range(0, 1000).select((F.col("id") % 37).cast("string").alias("term"))
    a = cms_build(df.where(F.col("term").cast("int") < 20), "term", width=64)
    b = cms_build(df.where(F.col("term").cast("int") >= 20), "term", width=64)
    merged = (
        a.unionByName(b).groupBy("d", "cell").agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(df, "term", width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_absent_key_bounded_by_total(spark):
    df = _items(spark)
    sketch = cms_build(df, "term", depth=4, width=4096)
    probe = spark.createDataFrame([("never-seen",)], "term string")
    est = cms_estimate(sketch, probe, "term", depth=4, width=4096).collect()
    assert 0 <= est[0].cms_est <= df.count()


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "term string, w long"
    )
    sketch = cms_build(df, "term", width=1024, weight_col="w")
    est = {r.term: r.cms_est for r in
           cms_estimate(sketch, df.select("term").distinct(), "term",
                        width=1024).collect()}
    assert est == {"a": 12, "b": 1}
