"""Snapshot reconciliation (engine/reconcile.py): planted add/remove/change
fixtures, digest-tier partition pruning, null-safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.engine.reconcile import (
    diverging_partitions,
    partition_digests,
    table_diff,
)


def _snapshots(spark):
    a = spark.createDataFrame(
        [
            (1, "x", 1.0),
            (2, "y", 2.0),
            (3, "z", None),   # NULL value — must not count as changed
            (4, "w", 4.0),    # will be removed in b
        ],
        "id int, name string, score double",
    )
    b = spark.createDataFrame(
        [
            (1, "x", 1.0),     # unchanged
            (2, "y", 99.0),    # changed
            (3, "z", None),    # unchanged (NULL == NULL null-safely)
            (5, "v", 5.0),     # added
        ],
        "id int, name string, score double",
    )
    return a, b


def test_table_diff_planted(spark):
    a, b = _snapshots(spark)
    out = {r.id: r.status for r in table_diff(a, b, ["id"]).collect()}
    assert out == {2: "CHANGED", 4: "REMOVED", 5: "ADDED"}


def test_table_diff_include_unchanged(spark):
    a, b = _snapshots(spark)
    out = {
        r.id: r.status
        for r in table_diff(a, b, ["id"], include_unchanged=True).collect()
    }
    assert out[1] == "UNCHANGED"
    assert out[3] == "UNCHANGED"
    assert len(out) == 5


def test_null_presence_not_confused_with_value(spark):
    # (NULL, "x") vs ("x", NULL) must be CHANGED — the presence bits keep
    # the fingerprint from collapsing shifted nulls
    a = spark.createDataFrame([(1, None, "x")], "id int, u string, v string")
    b = spark.createDataFrame([(1, "x", None)], "id int, u string, v string")
    out = table_diff(a, b, ["id"]).collect()
    assert [(r.id, r.status) for r in out] == [(1, "CHANGED")]


def test_partition_digests_and_pruning(spark):
    a = spark.createDataFrame(
        [(p, i, float(i)) for p in range(4) for i in range(10)],
        "part int, id int, score double",
    )
    # b: partition 2 has one changed row; partition 3 lost a row; 0/1 equal
    b = a.withColumn(
        "score",
        F.when(
            (F.col("part") == 2) & (F.col("id") == 5), 999.0
        ).otherwise(F.col("score")),
    ).where(~((F.col("part") == 3) & (F.col("id") == 9)))

    d = partition_digests(a, "part", ["id", "score"])
    assert d.count() == 4
    div = diverging_partitions(a, b, "part", ["id", "score"]).collect()
    assert sorted(r.partition for r in div) == [2, 3]
    n = {r.partition: (r.n_rows_a, r.n_rows_b) for r in div}
    assert n[2] == (10, 10)  # same count, different digest
    assert n[3] == (10, 9)


def test_digest_order_insensitive(spark):
    a = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0)], "part int, id int, score double"
    )
    b = spark.createDataFrame(
        [(0, 2, 2.0), (0, 1, 1.0)], "part int, id int, score double"
    )
    assert diverging_partitions(a, b, "part", ["id", "score"]).count() == 0


def test_merge_upsert_planted(spark):
    from datavalidation_spark.engine.reconcile import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    changeset = spark.createDataFrame(
        [
            (2, "B", False),   # update
            (4, "d", False),   # insert
            (3, None, True),   # delete
        ],
        "id int, v string, _deleted boolean",
    )
    out = {
        r.id: r.v
        for r in merge_upsert(
            target, changeset, ["id"], delete_col="_deleted"
        ).collect()
    }
    assert out == {1: "a", 2: "B", 4: "d"}


def test_merge_then_diff_roundtrip(spark):
    """merge_upsert and table_diff are inverses over the same changeset:
    diffing the merged snapshot against the original reports exactly the
    changeset's intent."""
    from datavalidation_spark.engine.reconcile import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    changeset = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id int, v string, _deleted boolean",
    )
    merged = merge_upsert(target, changeset, ["id"], delete_col="_deleted")
    diff = {r.id: r.status for r in table_diff(target, merged, ["id"]).collect()}
    assert diff == {2: "CHANGED", 3: "REMOVED", 4: "ADDED"}


def test_merge_upsert_no_delete_col(spark):
    from datavalidation_spark.engine.reconcile import merge_upsert

    target = spark.createDataFrame([(1, "a")], "id int, v string")
    source = spark.createDataFrame([(1, "A"), (2, "b")], "id int, v string")
    out = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: "A", 2: "b"}


def test_key_required(spark):
    a, b = _snapshots(spark)
    try:
        table_diff(a, b, [])
        assert False, "expected ValueError"
    except ValueError:
        pass
