"""Layout optimization (sources/layout.py): Z-order bit math, and pyarrow-
footer evidence that the rewritten files actually prune."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datavalidation_spark.sources.layout import (
    file_stats,
    optimize_layout,
    pruned_fraction,
    with_z_column,
    z_value,
)


def test_z_value_bit_math(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a int, b int"
    )
    out = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", z_value(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    # interleave: a gets even bit positions, b odd
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    # a=3 (0b11) -> bits 0,2 ; b=5 (0b101) -> bits 1,5 -> 0b100111 = 39
    assert out[(3, 5)] == 0b100111


def test_z_locality(spark):
    """Points close in (a, b) must be close in z more often than far points:
    sort by z and check neighbors differ by a small box on average."""
    n = 256
    df = spark.range(n).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("int").alias("b")
    )
    rows = (
        with_z_column(df, ["a", "b"])
        .orderBy("_z")
        .collect()
    )
    jumps = [
        abs(rows[i + 1].a - rows[i].a) + abs(rows[i + 1].b - rows[i].b)
        for i in range(len(rows) - 1)
    ]
    # Z-curve neighbor distance averages ~O(1); a random order averages
    # ~(16+16)/3 ≈ 10.7 on this grid
    assert sum(jumps) / len(jumps) < 4.0


def _mk_events(spark, n=20_000):
    # two independent uniform columns — the multi-column pruning case
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("x"),
        (F.xxhash64("id", F.lit(2)) % 1000).alias("y"),
    )


def test_range_layout_prunes_leading_col(spark, tmp_path):
    df = _mk_events(spark)
    p = os.path.join(str(tmp_path), "range")
    optimize_layout(df, p, ["x"], mode="range", n_files=8)
    stats = file_stats(p, ["x"])
    assert len(stats) >= 6
    # point predicate on x skips all but ~1 file
    assert pruned_fraction(stats, "x", 0) >= 0.75
    # round trip: nothing lost
    assert spark.read.parquet(p).count() == df.count()


def test_zorder_layout_prunes_both_cols(spark, tmp_path):
    df = _mk_events(spark)
    base = os.path.join(str(tmp_path), "plain")
    zp = os.path.join(str(tmp_path), "zorder")
    # baseline: hash-shuffled files — every file spans the full range
    df.repartition(16).write.parquet(base)
    # 16 files → top 4 z-bits → a 4x4 grid: each column gets 4 strips, so a
    # point predicate on EITHER column can prune ~3/4 of files
    optimize_layout(df, zp, ["x", "y"], mode="zorder", n_files=16)

    # probe off the median (rank-boundary points touch two strips by
    # construction; mid-strip points are the representative case)
    for col in ("x", "y"):
        plain = pruned_fraction(file_stats(base, [col]), col, -500)
        zed = pruned_fraction(file_stats(zp, [col]), col, -500)
        assert plain == 0.0, f"baseline unexpectedly clustered on {col}"
        assert zed >= 0.5, f"zorder prunes only {zed:.0%} of files on {col}"
    assert spark.read.parquet(zp).count() == df.count()


def test_zorder_hot_cell_splits_files_with_cap(spark, tmp_path):
    """A tie-dominated column collapses most rows into one z-cell (ties share
    one percent_rank); max_records_per_file at least splits that cell's
    output into multiple files so scan parallelism survives."""
    n = 8_000
    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        # 90% of rows carry the same (x, y) — one hot cell by construction
        F.when(F.col("id") % 10 == 0, F.col("id") % 97).otherwise(F.lit(7)).alias("x"),
        F.when(F.col("id") % 10 == 0, F.col("id") % 89).otherwise(F.lit(3)).alias("y"),
    )
    p = os.path.join(str(tmp_path), "hot")
    optimize_layout(df, p, ["x", "y"], mode="zorder", n_files=8,
                    max_records_per_file=1_000)
    stats = file_stats(p, ["x"])
    assert sum(s["rows"] for s in stats) == n
    # the hot cell (~7,200 rows) must span >= 7 files of <= 1,000 rows
    assert max(s["rows"] for s in stats) <= 1_000
    assert len(stats) >= 8
