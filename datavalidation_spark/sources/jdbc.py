"""JDBC source adapter — the reference's one real I/O boundary re-expressed
Spark-first.

The reference reads everything through a single psycopg2/SQLAlchemy Postgres
connection (``database.py:14-18``) and issues one query per vessel
(``me_consumption_validation.py:32-41`` — the N+1 pattern). Spark's JDBC
source replaces both: ONE logical scan with

* **filter + column pushdown** — Catalyst pushes `WHERE` predicates and the
  projected column set into the remote SQL (visible as ``PushedFilters`` /
  ``ReadSchema`` in ``explain``), so the database ships only what the plan
  needs;
* **partitioned parallel reads** — ``partition_column/lower/upper/num``
  split the table into range predicates executed by concurrent executors
  (the 100-TB story: the scan parallelism is the cluster's, not one
  connection's);
* **fetchsize** — batches rows per round trip instead of row-at-a-time.

No driver jars beyond what the runtime ships are assumed; callers pass the
JDBC url + driver class for their database (tests use the embedded Derby
that ships with Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Declarative JDBC scan. ``table`` may be a table name or a derived
    subquery alias (``"(SELECT ...) t"``) — pushdown applies to both.

    When ``partition_column`` (+ bounds + ``num_partitions``) is given the
    read is split into parallel range scans; otherwise it is a single
    partition (fine for dimension-sized tables, wrong for facts)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    mode: str = "error",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Batch JDBC sink (executemany-style batching per partition)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
