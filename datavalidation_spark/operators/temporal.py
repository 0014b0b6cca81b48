"""Temporal operators Spark's join menu lacks — as-of join and
sessionization — expressed as single-shuffle window plans.

* ``asof_join`` — for each left row, the most recent right row for the same
  key at or before its timestamp (``direction='backward'``, the market-data
  / slowly-changing-dimension join). Spark has no ASOF JOIN; the naive
  translations are a theta join (quadratic) or a per-key ``applyInPandas``
  (Python in the hot path). The distributed-native plan used here: UNION
  both sides tagged, one window partitioned by key ordered by
  ``(ts, side)`` carrying ``last(value, ignorenulls=True)`` forward, then
  keep the left rows. ONE shuffle on the key, running-state window (no
  re-sort per row), left-join semantics (no prior right row → nulls),
  optional staleness ``tolerance_sec``. Right-before-left at equal ts makes
  the match inclusive, mirroring DuckDB's ``ASOF JOIN`` (``l.ts >= r.ts``)
  which oracles it in the driver gate.

* ``sessionize`` — gaps-and-islands session assignment: a new session
  starts when the gap to the previous event of the same key exceeds
  ``gap_sec``. ``lag`` + running ``sum`` over one key-ordered window —
  again one shuffle; the cumulative trick is streaming-legal (Spark's own
  ``session_window`` agg uses the same state shape; tests cross-check
  against it).

At 100 TB both plans shuffle each row exactly once on the entity key, and
partial windows spill per key group — no driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward as-of join: left enriched with the latest right values whose
    ``right_ts`` <= ``left_ts`` per ``key``.

    ``value_cols`` defaults to every right column except the key and
    timestamp; they must not collide with left column names. With
    ``tolerance_sec``, matches older than the tolerance are nulled out
    (stale quote suppression)."""
    vals = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    clash = set(vals) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    l_tag = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tag = right.select(
        key, F.col(right_ts).alias("_ats"), *vals
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = {v: F.last(v, ignorenulls=True).over(w) for v in vals}
    rts = F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w)

    out = u.withColumn("_rts", rts)
    for v in vals:
        out = out.withColumn(v, carried[v])
    if tolerance_sec is not None:
        # interval arithmetic: legal for TIMESTAMP and TIMESTAMP_NTZ alike
        # (unix_micros rejects NTZ, and NTZ->TS casts drag session-tz
        # semantics into what is a pure difference)
        fresh = (F.col("_ats") - F.col("_rts")) <= F.make_dt_interval(
            secs=F.lit(float(tolerance_sec))
        )
        for v in vals:
            out = out.withColumn(v, F.when(fresh, F.col(v)))
    return out.where(F.col("_side") == 1).select(*left.columns, *vals)


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    *,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_width_sec: int = 3600,
) -> DataFrame:
    """Point-in-interval join: each event row matched to every interval of
    the same key with ``start <= ts < end``.

    Spark plans ``l.key = r.key AND l.ts BETWEEN r.start AND r.end`` as an
    equi-join on key with the range as a post-filter — fine until one key
    holds many intervals; with no equi-key at all it degenerates to
    BroadcastNestedLoopJoin. The scale path here is bucket blocking: time
    is cut into ``bucket_width_sec`` buckets, each interval explodes to the
    buckets it covers, events map to exactly ONE bucket, and the join is a
    plain equi-join on (key, bucket) + exact range filter. Shuffle volume
    is rows + intervals×(span/width) — tune ``bucket_width_sec`` to the
    typical interval span so the explode factor stays O(1). No duplicate
    elimination is needed: an event's single bucket meets each interval at
    most once.

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ; bucket ids derive from
    calendar fields (whole seconds — monotone, so truncation never loses a
    containment), not unix_micros, so no tz semantics leak in."""

    def bucket_of(c):
        epoch_s = (
            F.datediff(c.cast("date"), F.to_date(F.lit("2000-01-01"))).cast("bigint")
            * 86400
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        )
        return F.floor(epoch_s / bucket_width_sec).cast("bigint")

    ev = events.withColumn("_bkt", bucket_of(F.col(ts)))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(bucket_of(F.col(start)), bucket_of(F.col(end)))),
    )
    return (
        ev.join(iv, [key, "_bkt"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_bkt")
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    *,
    gap_sec: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index: a row starts a new session when it is
    the key's first event or follows the previous one by more than
    ``gap_sec``. ``session_col`` is the 1-based index within the key (a
    globally unique id is ``concat(key, '-', session_col)``)."""
    w = Window.partitionBy(key).orderBy(ts)
    # interval comparison, not unix_micros: NTZ-safe, microsecond-exact
    gap = F.col(ts) - F.lag(ts).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > F.make_dt_interval(secs=F.lit(float(gap_sec)))),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # two projections: a window function can't nest inside another window's
    # aggregate; same partitioning/order, so both run off one sort+shuffle
    return (
        events.withColumn("_new_sess", new_sess)
        .withColumn(session_col, F.sum("_new_sess").over(cum))
        .drop("_new_sess")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    *,
    gap_sec: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates over ``sessionize`` output: bounds, event
    count, optional exact value sum (cents — parallel float sums don't
    round-trip across engines)."""
    s = sessionize(events, key, ts, gap_sec=gap_sec)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("value_cents")
        )
    return s.groupBy(key, "session_id").agg(*aggs)
