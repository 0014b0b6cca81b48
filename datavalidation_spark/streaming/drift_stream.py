"""Streaming distribution drift: two-sample KS/PSI over WINDOWED histograms
(the north_star's drift clause, verbatim), as Structured Streaming.

Shape:

* ``windowed_histograms`` — the ONLY stateful streaming piece: watermarked
  event-time windows → fixed-bound bucketize → count per (window, group,
  feature, bucket). Bin bounds are FIXED and supplied by the caller (taken
  from the reference/training histogram) — exactly how production drift
  monitors work, and the reason this aggregation is streaming-legal: no
  second pass over the window to learn min/max.
* ``drift_from_histograms`` — pure batch Column ops: observed window
  histograms vs the reference histogram → KS statistic (max |ΔCDF|) and
  PSI per (window, group, feature). Runs inside ``foreachBatch`` (Spark
  does not allow chaining a second aggregation + sort over a streaming agg
  in append mode) or over any batch histogram table.
* ``reference_histogram`` — build the baseline from a batch DataFrame with
  the same bucketize expression, so streaming and reference binning are
  identical by construction.

Both halves are plain DataFrame transforms, so the SAME code paths run on
batch inputs — the streaming≡batch equivalence test relies on that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-bound uniform bucket in [0, n_bins-1]; out-of-range values
    clamp into the edge bins (drifted mass beyond the training range must
    COUNT as drift, not vanish)."""
    if hi <= lo:
        return F.lit(0)
    raw = F.floor((value - F.lit(lo)) / F.lit(hi - lo) * n_bins).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def _long_form(
    df: DataFrame,
    group_col: str,
    bounds: dict[str, tuple[float, float]],
    n_bins: int,
) -> DataFrame:
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                _bucket(F.col(c).cast("double"), lo, hi, n_bins).alias("bucket"),
                F.col(c).cast("double").alias("_v"),
            )
            for c, (lo, hi) in bounds.items()
        ]
    )
    return (
        df.select(group_col, *([] if "window" not in df.columns else ["window"]),
                  F.explode(pairs).alias("fb"))
        .where(F.col("fb._v").isNotNull() & ~F.isnan("fb._v"))
        .select(group_col, *([] if "window" not in df.columns else ["window"]),
                "fb.feature", "fb.bucket")
    )


def reference_histogram(
    df: DataFrame,
    group_col: str,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
) -> DataFrame:
    """Baseline histogram from the training batch:
    (group, feature, bucket, ref_count)."""
    return (
        _long_form(df, group_col, bounds, n_bins)
        .groupBy(group_col, "feature", "bucket")
        .agg(F.count(F.lit(1)).alias("ref_count"))
    )


def windowed_histograms(
    stream_df: DataFrame,
    ts_col: str,
    group_col: str,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked event-time-windowed histogram stream:
    (window, group, feature, bucket, obs_count). Streaming-legal single
    aggregation; also runs on a batch DataFrame unchanged."""
    wm = stream_df.withWatermark(ts_col, watermark) if stream_df.isStreaming else stream_df
    tagged = wm.withColumn("window", F.window(ts_col, window_duration))
    return (
        _long_form(tagged, group_col, bounds, n_bins)
        .groupBy("window", group_col, "feature", "bucket")
        .agg(F.count(F.lit(1)).alias("obs_count"))
    )


def keyed_histograms(
    df: DataFrame,
    window_col: str,
    group_col: str,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
) -> DataFrame:
    """Batch variant of :func:`windowed_histograms` with a caller-supplied
    window KEY column of any type (e.g. ⌊epoch/7d⌋ — an engine-portable
    integer, unlike the event-time window struct, so DuckDB oracles can
    reproduce it without timezone semantics in play)."""
    tagged = df if window_col == "window" else df.withColumn(
        "window", F.col(window_col)
    )
    return (
        _long_form(tagged, group_col, bounds, n_bins)
        .groupBy("window", group_col, "feature", "bucket")
        .agg(F.count(F.lit(1)).alias("obs_count"))
    )


def drift_from_histograms(
    hist: DataFrame,
    ref: DataFrame,
    group_col: str,
    n_bins: int = 10,
    psi_floor: float = 5e-4,
) -> DataFrame:
    """KS + PSI per (window, group, feature) from observed window histograms
    vs the reference histogram (same conventions as engine.drift's batch
    ``binned_drift``: max-|ΔCDF| KS, floored-proportion PSI).

    Pure batch ops — run inside ``foreachBatch`` or over a histogram table.
    Missing buckets on either side are treated as zero counts via a dense
    (window, group, feature) × bucket scaffold, so the CDFs stay aligned.
    """
    keys = hist.select("window", group_col, "feature").distinct()
    buckets = hist.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bucket")
    )
    scaffold = keys.crossJoin(F.broadcast(buckets))
    dense = (
        scaffold.join(hist, ["window", group_col, "feature", "bucket"], "left")
        .join(ref, [group_col, "feature", "bucket"], "left")
        .select(
            "window",
            group_col,
            "feature",
            "bucket",
            F.coalesce("obs_count", F.lit(0)).alias("obs_count"),
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        )
    )
    w_tot = Window.partitionBy("window", group_col, "feature")
    w_cum = w_tot.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    floor = F.lit(psi_floor)
    enr = (
        dense.withColumn("tot_obs", F.sum("obs_count").over(w_tot))
        .withColumn("tot_ref", F.sum("ref_count").over(w_tot))
        .where((F.col("tot_obs") > 0) & (F.col("tot_ref") > 0))
        .withColumn("cdf_obs", F.sum("obs_count").over(w_cum) / F.col("tot_obs"))
        .withColumn("cdf_ref", F.sum("ref_count").over(w_cum) / F.col("tot_ref"))
        .withColumn("p", F.greatest(F.col("obs_count") / F.col("tot_obs"), floor))
        .withColumn("q", F.greatest(F.col("ref_count") / F.col("tot_ref"), floor))
    )
    return enr.groupBy("window", group_col, "feature").agg(
        F.max(F.abs(F.col("cdf_obs") - F.col("cdf_ref"))).alias("ks_stat"),
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.max("tot_obs").alias("n_obs"),
        F.max("tot_ref").alias("n_ref"),
    )


def run_drift_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema,
    ts_col: str,
    group_col: str,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
):
    """File stream → watermarked windowed HISTOGRAM rows appended to a
    parquet sink (exactly-once via checkpoint); drift is computed at READ
    time from the reconstructed full histograms (``read_drift_sink``).

    Output mode is UPDATE: each micro-batch emits the new CUMULATIVE total
    of every (window, group, feature, bucket) it touched (append mode would
    emit a window only after the watermark closes it — under an
    ``availableNow`` drain the final windows would never surface, and an
    alert that waits out the watermark is late by construction). Because
    update-mode emissions carry key totals, taking the latest row per
    BUCKET reconstructs the complete window histogram across any number of
    micro-batches.

    Computing KS/PSI inside ``foreachBatch`` from ``batch_df`` alone would
    be WRONG once a window spans micro-batches: the batch holds only the
    touched buckets, so totals/CDFs would be built from a partial histogram
    (a 5-late-row second batch turned a no-drift window into KS=1.0 in the
    repro that motivated this design)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    hists = windowed_histograms(
        src, ts_col, group_col, bounds, n_bins, window_duration, watermark
    )

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "feature",
            "bucket",
            "obs_count",
            F.lit(batch_id).alias("batch_id"),
        ).write.mode("append").parquet(output_dir)

    return (
        hists.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )


def read_drift_sink(
    spark,
    output_dir: str,
    ref: DataFrame,
    group_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Drift per (window, group, feature) from the histogram sink: latest
    emission per BUCKET (max batch_id — update-mode rows are cumulative key
    totals) reconstructs each window's full histogram, then KS/PSI against
    the reference histogram ``ref`` (from :func:`reference_histogram`)."""
    raw = spark.read.parquet(output_dir)
    w = Window.partitionBy(
        "window_start", group_col, "feature", "bucket"
    ).orderBy(F.desc("batch_id"))
    hist = (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("window_start").alias("window"),
            group_col,
            "feature",
            "bucket",
            "obs_count",
        )
    )
    return drift_from_histograms(hist, ref, group_col, n_bins).withColumnRenamed(
        "window", "window_start"
    )
