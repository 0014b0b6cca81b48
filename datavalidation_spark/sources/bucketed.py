"""Bucketed-table source/sink — co-located joins without a shuffle.

At 100 TB the dominant cost of the referential check (doc.media_ref ⋈
asset_catalog) and of any fact⋈fact join is the exchange of both sides on
the join key. When the same join runs repeatedly (every validation run,
every rule version), pre-bucketing both tables on that key amortizes the
shuffle into the write: Spark records bucket metadata in the catalog, and a
join of two tables bucketed on the join key with the same bucket count
reads co-located buckets directly — ``explain`` shows a SortMergeJoin with
NO Exchange on either side (``spark.sql.sources.bucketing.enabled``, on by
default; ``bucketedScan`` in the formatted plan).

Spark-native mechanics, no Hive required: ``DataFrameWriter.bucketBy``
+ ``saveAsTable`` against the built-in session catalog. Bucket files are
plain parquet named ``*_NNNNN.c000`` with the bucket id in the filename —
readable by any engine, the bucketing metadata just makes Spark skip the
exchange.

Kept out of the driver contract deliberately: writing catalog tables is a
side effect per call; plan-shape guarantees (no Exchange, one bucketedScan
per side) are asserted in tests/test_bucketed_source.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    catalog table. ``sort_cols`` additionally removes the per-bucket Sort
    from downstream sort-merge joins on those columns."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table`` — a
    raw ``spark.read.parquet`` of the same files would lose the bucketing
    and reintroduce the exchange)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both sides
    bucketed on ``on`` with equal bucket counts, the physical plan is a
    SortMergeJoin over bucketed scans — zero Exchange operators."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
