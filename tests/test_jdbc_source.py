"""JDBC source adapter tests against the embedded Derby that ships with
Spark — a real database round trip with pushdown and partitioned reads
(reference boundary parity: database.py's Postgres reads)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    try:
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("double").alias("v"),
        )
        write_jdbc(df, url, "t_events", driver=DRIVER)
    except Exception as e:  # pragma: no cover — driver not on classpath
        pytest.skip(f"embedded Derby unavailable: {e}")
    return url


def test_jdbc_roundtrip_and_filter_pushdown(spark, derby_url):
    df = read_jdbc(spark, derby_url, "t_events", driver=DRIVER).where(
        F.col("k") >= 90
    ).select("k")
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate reached the JDBC scan, not a post-scan Filter
    assert "PushedFilters" in plan and "GreaterThanOrEqual(K,90)" in plan.replace(
        "k", "K"
    )


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    df = read_jdbc(
        spark,
        derby_url,
        "t_events",
        driver=DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    total = df.agg(F.sum("k")).collect()[0][0]
    assert total == sum(range(100))
