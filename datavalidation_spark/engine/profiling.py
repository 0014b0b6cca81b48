"""Single-pass column profiling (SURVEY.md A8; north_star: per-column stats —
null rate, min/max, cardinality via HyperLogLog, approx quantiles).

One ``df.agg(...)`` pass computes everything: Spark's HLL++
(``approx_count_distinct``) and quantile sketch (``percentile_approx``,
Greenwald-Khanna) are partial-aggregatable, so the whole profile is a single
map-side-combining job with one tiny shuffle — the scan cost dominates, as it
should at 100 TB.

For the north_star's named t-digest quantiles, see
``operators/tdigest.py`` — a mergeable t-digest with the same
partial-aggregate shape (one digest per partition, driver merges the tiny
survivors); ``percentile_approx`` here remains the built-in default since
it runs fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType
from pyspark.sql.window import Window


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with
    (column, count, null_count, null_rate, approx_distinct, min, max, q25,
    q50, q75). Non-numeric columns get NULL quantiles; min/max as strings.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [c for c in df.columns if not c.startswith("_")]

    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(col).alias(f"{c}__distinct"))
        if isinstance(fields[c], NumericType):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max"))
            aggs.append(
                F.percentile_approx(col, [0.25, 0.5, 0.75]).alias(f"{c}__q")
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"{c}__smin"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__smax"))

    row: Row = df.agg(*aggs).collect()[0]  # one row — driver-side melt is O(#cols)
    return _melt_profile(df, cols, fields, row)


def _melt_profile(df: DataFrame, cols, fields, row: Row) -> DataFrame:
    total = row["_total"]
    out = []
    for c in cols:
        numeric = isinstance(fields[c], NumericType)
        q = row[f"{c}__q"] if numeric else None
        out.append(
            Row(
                column=c,
                count=total,
                null_count=row[f"{c}__nulls"],
                null_rate=(row[f"{c}__nulls"] / total) if total else None,
                approx_distinct=row[f"{c}__distinct"],
                min_num=row[f"{c}__min"] if numeric else None,
                max_num=row[f"{c}__max"] if numeric else None,
                min_str=None if numeric else row[f"{c}__smin"],
                max_str=None if numeric else row[f"{c}__smax"],
                q25=q[0] if q else None,
                q50=q[1] if q else None,
                q75=q[2] if q else None,
            )
        )
    return df.sparkSession.createDataFrame(out)


def exact_numeric_percentiles(
    df: DataFrame,
    cols: list[str],
    qs: list[float],
    n_parts: int | None = None,
    use_builtin: bool = False,
) -> DataFrame:
    """Exact percentiles for numeric columns as a DISTRIBUTED plan —
    ``(column, n_rows, n_valid, n_distinct, null_cnt, min_num, max_num,
    qx array<double>)``, one row per requested column (present even when the
    column is all-NULL; ``qx`` NULL then).

    Why not ``F.percentile``: the builtin buffers every distinct value in
    an OpenHashMap whose merge + sort runs in the ONE final reduce task —
    measured 14.4 s at sf1.0 (l_extendedprice: 4.56M distinct values
    sorted single-threaded) while the whole rest of the profile took ~6 s.
    Here the sort is a range-repartition: value counts are range-
    partitioned on (column, v), per-partition totals give each partition's
    global rank offset (a tiny second aggregate), a per-partition window
    adds local cumulative counts, and each target rank ⌊q·(n−1)⌋ /
    ⌈q·(n−1)⌉ is picked with a conditional max — every stage distributed,
    no single-task sort anywhere (guide §2: the same work, shuffled wider).

    Interpolation matches the builtin's formula
    ``lo·(⌈r⌉−r) + hi·(r−⌊r⌋)`` (value when ⌊r⌋=⌈r⌉). Bit-identical
    output is NOT guaranteed (float algebra order differs at ulp scale);
    callers use these values for tolerance verdicts, not hashed output.
    """
    from pyspark import StorageLevel

    from datavalidation_spark.operators._cache import release_with

    spark = df.sparkSession
    n = n_parts or spark.sparkContext.defaultParallelism
    if use_builtin:
        # Small-input path (caller derives the choice from input SIZE):
        # below a few tens of MB the distributed plan's extra stages cost
        # more than the single-task sort they remove — the builtin
        # F.percentile one-pass aggregate wins there. Same output schema
        # and values; ``n_distinct`` is NOT computed on this path (0 —
        # small-input callers that need it use their own countDistinct).
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            col = F.col(c).cast("double")
            aggs += [
                F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
                F.percentile(
                    col, F.array(*[F.lit(float(q)) for q in qs])
                ).alias(f"{c}__qx"),
                F.min(col).alias(f"{c}__min"),
                F.max(col).alias(f"{c}__max"),
            ]
        one = df.agg(*aggs)
        melted = one.select(
            "_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(f"{c}__nulls").alias("null_cnt"),
                            F.col(f"{c}__qx").alias("qx"),
                            F.col(f"{c}__min").alias("min_num"),
                            F.col(f"{c}__max").alias("max_num"),
                        )
                        for c in cols
                    ]
                )
            ).alias("s"),
        ).select("_n", "s.*")
        return melted.select(
            "column",
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_n") - F.col("null_cnt")).cast("long").alias("n_valid"),
            F.lit(0).cast("long").alias("n_distinct"),
            F.col("null_cnt").cast("long").alias("null_cnt"),
            "min_num",
            "max_num",
            "qx",
        )
    structs = F.array(
        *[
            F.struct(F.lit(c).alias("column"), F.col(c).cast("double").alias("v"))
            for c in cols
        ]
    )
    vc = (
        df.select(F.explode(structs).alias("p"))
        .select("p.column", "p.v")
        .groupBy("column", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nulls = vc.where(F.col("v").isNull()).select(
        "column", F.col("cnt").alias("null_cnt")
    )
    nn = vc.where(F.col("v").isNotNull())
    # Range-partition the distinct values. MUST be persisted: the rank
    # offsets and the local cumulative window are two consumers, and an
    # unpersisted repartitionByRange re-SAMPLES its boundaries per
    # evaluation — two consumers can see two different partitionings (and
    # spark_partition_id values), silently corrupting the global ranks
    # (observed: offsets from one partitioning, local sums from another).
    ranged = (
        nn.repartitionByRange(n, "column", "v")
        .sortWithinPartitions("column", "v")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    psum = ranged.groupBy("pid", "column").agg(F.sum("cnt").alias("pcnt"))
    woff = (
        Window.partitionBy("column")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psum.select(
        "pid", "column", F.coalesce(F.sum("pcnt").over(woff), F.lit(0)).alias("off")
    )
    wloc = Window.partitionBy("pid", "column").orderBy("v")
    loc = ranged.withColumn("lcum", F.sum("cnt").over(wloc))
    cum = (
        loc.join(offsets, ["pid", "column"])
        .withColumn("cum", F.col("off") + F.col("lcum"))
    )
    totals = psum.groupBy("column").agg(F.sum("pcnt").alias("n_valid"))
    stats = ranged.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.min("v").alias("min_num"),
        F.max("v").alias("max_num"),
    )
    jj = cum.join(totals, "column")
    aggs = [F.first("n_valid").alias("n_valid")]
    for i, q in enumerate(qs):
        rq = F.lit(float(q)) * (F.col("n_valid") - 1).cast("double")
        lo, hi = F.floor(rq), F.ceil(rq)
        covers_lo = (F.col("cum") - F.col("cnt") <= lo) & (lo < F.col("cum"))
        covers_hi = (F.col("cum") - F.col("cnt") <= hi) & (hi < F.col("cum"))
        aggs += [
            F.max(F.when(covers_lo, F.col("v"))).alias(f"_lo{i}"),
            F.max(F.when(covers_hi, F.col("v"))).alias(f"_hi{i}"),
        ]
    picked = jj.groupBy("column").agg(*aggs)
    vals = []
    for i, q in enumerate(qs):
        rq = F.lit(float(q)) * (F.col("n_valid") - 1).cast("double")
        lo, hi = F.floor(rq), F.ceil(rq)
        vals.append(
            F.when(lo == hi, F.col(f"_lo{i}")).otherwise(
                F.col(f"_lo{i}") * (hi.cast("double") - rq)
                + F.col(f"_hi{i}") * (rq - lo.cast("double"))
            )
        )
    scaffold = spark.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in cols])).alias("column")
    )
    out = (
        scaffold.join(picked, "column", "left")
        .join(stats, "column", "left")
        .join(nulls, "column", "left")
        .select(
            "column",
            (F.coalesce("n_valid", F.lit(0)) + F.coalesce("null_cnt", F.lit(0)))
            .cast("long")
            .alias("n_rows"),
            F.coalesce("n_valid", F.lit(0)).cast("long").alias("n_valid"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("null_cnt", F.lit(0)).cast("long").alias("null_cnt"),
            "min_num",
            "max_num",
            F.when(F.col("n_valid") >= 1, F.array(*vals)).alias("qx"),
        )
    )
    return release_with(out, vc, ranged)


def profile_with_bounds(
    df: DataFrame,
    columns: list[str],
    rel_tol: float = 0.05,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch-vs-exact profile in ONE aggregation pass: per column, exact
    stats (count / nulls / distinct / min / max) PLUS tolerance verdicts for
    the sketches — ``hll_ok`` (HLL++ cardinality within ``rel_tol`` of the
    exact distinct count) and ``q_ok`` (each GK approximate quantile inside
    [min, max] and within ``rel_tol``·range of the exact percentile).

    The exact scalars are engine-portable (a DuckDB oracle reproduces them
    value-for-value) and the booleans turn sketch accuracy into a hard
    oracle gate: the oracle asserts TRUE, so a drifting sketch goes red
    (VERDICT r1 gap #7 — no more rows-only sketch query).

    ``rsd=0.02`` maps to HLL++ precision p=12 (4K registers): expected
    relative error ~1.6% — ~3σ of headroom against the 5% gate. Measured
    HLL agg cost on this host scales ~linearly with register count
    (p13 ≈ 0.68 s/column vs p12 ≈ 0.43 s/column vs p11 ≈ 0.26 s/column at
    600k rows), so precision is sized to the gate, not maximized: observed
    error on the driver tables is ≤2.0% at p12 (deterministic — HLL has no
    RNG), and p=13/14 buys headroom the 5% gate does not need at 2-4× the
    dominant per-row cost of the profile.
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    fields = {f.name: f.dataType for f in df.schema.fields}
    # two passes on purpose: mixing N countDistinct with sketch/percentile
    # aggregates in ONE agg makes Catalyst Expand the input N+1× and feed the
    # multiplied rows to EVERY aggregate (measured ~10× slower at sf0.1);
    # a distinct-only agg keeps the Expand away from the sketch pass.
    from pyspark import StorageLevel

    # both passes are materialized inside this function, so persist the
    # input across them (released before returning): otherwise the
    # scan/shuffle feeding the profile runs twice, and on this host a
    # repartition shuffle is the dominant variance source (episodic
    # virtual-disk throttling: 20-90 s stalls at ~0% CPU steal). Callers
    # should pass a column-pruned df so the cache holds only the profiled
    # columns.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    numeric_cols = [c for c in columns if isinstance(fields[c], NumericType)]
    other_cols = [c for c in columns if c not in numeric_cols]
    # concurrent jobs over the SAME persisted input (VERDICT r4 #4 — a
    # serial shape pays their sum):
    #   J1 sketches (HLL + nulls + GK approximate quantiles; no
    #      countDistinct, so no Expand),
    #   J2 exact distinct for NON-numeric columns only (numeric exact
    #      distincts fall out of J3's value-count table for free; isolated
    #      because mixing countDistinct with other aggregates makes
    #      Catalyst Expand the input N+1x — measured ~10x slower),
    #   J3 exact numeric stats — distinct/min/max/percentiles — via the
    #      distributed value-count plan (exact_numeric_percentiles above;
    #      replaces the F.percentile aggregate whose single-task final
    #      merge-sort of millions of distinct values was 14.4 s of the
    #      16.7 s query at sf1.0).
    from concurrent.futures import ThreadPoolExecutor

    def _hll_aggs():
        out = [F.count(F.lit(1)).alias("_total")]
        for c in columns:
            col = F.col(c)
            out += [
                F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
                F.approx_count_distinct(col, rsd).alias(f"{c}__hll"),
            ]
        for c in numeric_cols:
            out.append(
                F.percentile_approx(F.col(c), [0.25, 0.5, 0.75]).alias(f"{c}__qs")
            )
        return out

    def _sketch_job():
        return df.agg(*_hll_aggs()).collect()[0].asDict()

    # Scale-adaptive exact path (r6): on few-partition (small) inputs the
    # distributed value-count percentile plan's extra stages cost more
    # than the single-task sort they remove — measured 2.3 s builtin vs
    # 3.9 s distributed at sf0.1, and 8 s vs 15.8 s the other way at
    # sf1.0. Partition count is proportional to input size here (the
    # callers feed split-scan inputs), so it is the size signal.
    small = (
        df.rdd.getNumPartitions() * 3
        < 2 * df.sparkSession.sparkContext.defaultParallelism
    )

    def _distinct_job(cols_: list[str]):
        if not cols_:
            return {}
        r = df.agg(
            *[F.countDistinct(F.col(c)).alias(f"{c}__exact_d") for c in cols_]
        ).collect()[0]
        return r.asDict()

    def _numeric_exact():
        if not numeric_cols:
            return {}
        rows = exact_numeric_percentiles(
            df, numeric_cols, [0.25, 0.5, 0.75], use_builtin=small
        ).collect()
        out: dict = {}
        for r in rows:
            c = r["column"]
            if not small:
                out[f"{c}__exact_d"] = r["n_distinct"]
            out[f"{c}__min"] = r["min_num"]
            out[f"{c}__max"] = r["max_num"]
            out[f"{c}__qx"] = r["qx"]
        return out

    # big inputs: numeric distincts fall out of the value-count table, so
    # the countDistinct job covers only non-numeric columns; small inputs
    # keep countDistinct for every column (builtin percentile path has no
    # value-count table)
    distinct_cols = columns if small else other_cols
    jobs = [_sketch_job, lambda: _distinct_job(distinct_cols), _numeric_exact]

    # FAIR scheduling is between POOLS, not between jobs in one pool (the
    # default pool is internally FIFO) — each concurrent job takes its own
    # on-demand pool so its tasks round-robin instead of queuing behind the
    # first job's full-width stage (review r5; requires the session's
    # spark.scheduler.mode=FAIR, set in session.get_spark).
    sc = df.sparkSession.sparkContext

    def _pooled(i, fn):
        def run():
            sc.setLocalProperty("spark.scheduler.pool", f"profile-{i}")
            try:
                return fn()
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)

        return run

    try:
        with ThreadPoolExecutor(len(jobs)) as pool:
            futs = [pool.submit(_pooled(i, j)) for i, j in enumerate(jobs)]
            rows = [f.result() for f in futs]
    finally:
        # a failing agg job (bad column, executor loss) must not leak the
        # cached input into session storage for the session's lifetime
        df.unpersist()
    row: dict = {}
    for r in rows:
        row.update(r)
    total = row["_total"]
    out = []
    for c in columns:
        numeric = isinstance(fields[c], NumericType)
        exact_d = row[f"{c}__exact_d"]
        hll_ok = abs(row[f"{c}__hll"] - exact_d) <= rel_tol * max(exact_d, 1)
        if numeric:
            lo, hi = row[f"{c}__min"], row[f"{c}__max"]
            qs_arr, qx_arr = row[f"{c}__qs"], row[f"{c}__qx"]
            if lo is None or hi is None or qs_arr is None or qx_arr is None:
                # all-NULL numeric column: no values for the sketch to get
                # wrong — mirror the non-numeric branch (ADVICE r2 low #3)
                q_ok = True
            else:
                span = max(hi - lo, 1e-9)
                q_ok = all(
                    lo <= qs <= hi and abs(qs - qx) <= rel_tol * span
                    for qs, qx in zip(qs_arr, qx_arr)
                )
        else:
            lo = hi = None
            q_ok = True
        out.append(
            (
                c,
                total,
                row[f"{c}__nulls"],
                exact_d,
                round(lo, 6) if lo is not None else None,
                round(hi, 6) if hi is not None else None,
                bool(hll_ok),
                bool(q_ok),
            )
        )
    schema = StructType(
        [
            StructField("column", StringType()),
            StructField("n_rows", LongType()),
            StructField("null_count", LongType()),
            StructField("exact_distinct", LongType()),
            StructField("min_num", DoubleType()),
            StructField("max_num", DoubleType()),
            StructField("hll_ok", BooleanType()),
            StructField("q_ok", BooleanType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)
