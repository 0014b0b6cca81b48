"""As-of join + sessionization (operators/temporal.py): hand-checked
micro-fixtures, tolerance semantics, and a cross-check of the gaps-and-
islands sessionizer against Spark's own ``session_window`` aggregate.

Contract-level parity vs DuckDB (including its native ASOF JOIN as the
oracle) is covered by test_entry_contract.py."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators.temporal import asof_join, session_stats, sessionize


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, _ts(0), 100.0),
        (1, _ts(10), 110.0),
        (2, _ts(5), 200.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, rate double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (0, 1, _ts(0)),    # exact-ts match -> inclusive (rate 100)
        (1, 1, _ts(9)),    # between marks -> rate 100
        (2, 1, _ts(11)),   # after second mark -> rate 110
        (3, 2, _ts(4)),    # before any mark for user 2 -> null
        (4, 3, _ts(30)),   # user with no marks at all -> null
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_asof_backward_hand_checked(trades, quotes):
    got = {
        r.event_id: r.rate
        for r in asof_join(trades, quotes, "user_id").collect()
    }
    assert got == {0: 100.0, 1: 100.0, 2: 110.0, 3: None, 4: None}


def test_asof_tolerance_nulls_stale(trades, quotes):
    got = {
        r.event_id: r.rate
        for r in asof_join(
            trades, quotes, "user_id", tolerance_sec=120
        ).collect()
    }
    # event 1 is 9 min after its match -> stale; events 0 (0s) and 2 (60s) fresh
    assert got == {0: 100.0, 1: None, 2: 110.0, 3: None, 4: None}


def test_asof_rejects_column_clash(spark, quotes):
    left = spark.createDataFrame([(1, _ts(1), 5.0)], "user_id long, ts timestamp, rate double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, quotes, "user_id")


def test_sessionize_hand_checked(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(45)),   # gap 35 min -> 2 sessions
        (2, _ts(0)),                               # single event -> 1 session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.ts.minute): r.session_id
        for r in sessionize(df, gap_sec=1800).collect()
    }
    assert got == {(1, 0): 1, (1, 10): 1, (1, 45): 2, (2, 0): 1}


def test_sessionize_boundary_is_strict(spark):
    # gap EXACTLY gap_sec does not split; one microsecond more does
    rows = [
        (1, datetime(2024, 1, 1, 12, 0, 0)),
        (1, datetime(2024, 1, 1, 12, 30, 0)),
        (1, datetime(2024, 1, 1, 13, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sids = [r.session_id for r in sessionize(df, gap_sec=1800).orderBy("ts").collect()]
    assert sids == [1, 1, 2]


def test_sessionize_matches_builtin_session_window(spark, sf001):
    """Same session structure as Spark's session_window aggregate: session
    count and per-session event counts agree on real events data."""
    ev = sf001["events"]
    ours = (
        sessionize(ev, "user_id", "ts", gap_sec=1800)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    theirs = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = sorted((r.user_id, r.n) for r in ours.collect())
    b = sorted((r.user_id, r.n) for r in theirs.collect())
    assert a == b


def test_range_join_hand_checked(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts(0)),            # == start -> included
            (1, 1, _ts(30)),           # inside
            (2, 1, datetime(2024, 1, 1, 13, 0)),  # == end -> excluded
            (3, 2, _ts(30)),           # other key -> excluded
        ],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, 1, _ts(0), datetime(2024, 1, 1, 13, 0))],
        "interval_id long, user_id long, start timestamp, end timestamp",
    )
    from datavalidation_spark.operators.temporal import range_join

    got = sorted(
        r.event_id for r in range_join(events, iv, "user_id").collect()
    )
    assert got == [0, 1]


def test_range_join_matches_theta_join_small_buckets(spark, sf001):
    """Bucket blocking (forced multi-bucket explode via a 60 s width) must
    reproduce the plain range-predicate join exactly, duplicates included."""
    from datavalidation_spark.operators.temporal import range_join

    ev = sf001["events"]
    iv = ev.where(F.col("event_id") % 31 == 0).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.make_dt_interval(mins=F.lit(45))).alias("end"),
    )
    fast = range_join(ev, iv, "user_id", bucket_width_sec=60)
    slow = ev.join(iv, ["user_id"]).where(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    a = sorted((r.interval_id, r.event_id) for r in fast.collect())
    b = sorted((r.interval_id, r.event_id) for r in slow.collect())
    assert a == b and len(a) > 0


def test_session_stats_values(spark):
    rows = [
        (1, _ts(0), 1.25),
        (1, _ts(5), 2.50),
        (1, _ts(59), 4.00),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        r.session_id: (r.n_events, r.value_cents)
        for r in session_stats(df, value_col="value").collect()
    }
    assert out == {1: (2, 375), 2: (1, 400)}
