"""Streaming windowed-histogram drift: planted-drift detection and
streaming≡batch equivalence (the same transforms run on both)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datavalidation_spark.streaming.drift_stream import (
    drift_from_histograms,
    reference_histogram,
    windowed_histograms,
)

BOUNDS = {"value": (0.0, 100.0)}


@pytest.fixture(scope="module")
def frames(spark):
    """Reference batch ~N(50,5) clipped into [0,100]; live data with two
    1-minute windows — the first matches the reference, the second is
    shifted by +30 (planted drift)."""
    rng = np.random.default_rng(11)
    ref = pd.DataFrame(
        {
            "g": np.repeat(["A", "B"], 2000),
            "value": np.clip(rng.normal(50, 5, 4000), 0, 100),
        }
    )
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for w, shift in ((0, 0.0), (1, 30.0)):
        for g in ("A", "B"):
            vals = np.clip(rng.normal(50 + shift, 5, 1000), 0, 100)
            for i, v in enumerate(vals):
                rows.append(
                    dict(
                        g=g,
                        ts=base + pd.Timedelta(minutes=w, seconds=i % 55),
                        value=float(v),
                    )
                )
    live = pd.DataFrame(rows)
    return spark.createDataFrame(ref), spark.createDataFrame(live)


def test_windowed_drift_flags_planted_window(spark, frames):
    ref_df, live_df = frames
    ref = reference_histogram(ref_df, "g", BOUNDS)
    hists = windowed_histograms(live_df, "ts", "g", BOUNDS)  # batch path
    res = drift_from_histograms(hists, ref, "g").collect()
    by = {(r.window.start.minute, r.g): r for r in res}
    for g in ("A", "B"):
        assert by[(0, g)].ks_stat < 0.15, by[(0, g)]   # window 0: no drift
        assert by[(0, g)].psi < 0.25
        assert by[(1, g)].ks_stat > 0.8, by[(1, g)]    # window 1: +6 sigma shift
        assert by[(1, g)].psi > 1.0
        assert by[(1, g)].n_obs == 1000 and by[(1, g)].n_ref == 2000


def test_out_of_range_mass_counts_as_drift(spark, frames):
    """Values beyond the training bounds clamp into edge bins — drifted
    mass outside the reference range must register, not vanish."""
    ref_df, _ = frames
    ref = reference_histogram(ref_df, "g", BOUNDS)
    rows = [("A", pd.Timestamp("2024-01-01 00:00:01"), 500.0)] * 200
    far = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ts", "value"]))
    res = drift_from_histograms(
        windowed_histograms(far, "ts", "g", BOUNDS), ref, "g"
    ).collect()
    assert len(res) == 1 and res[0].ks_stat > 0.95


def test_stream_matches_batch(spark, tmp_path, frames):
    """availableNow file stream produces exactly the batch drift rows."""
    from datavalidation_spark.streaming.drift_stream import (
        read_drift_sink,
        run_drift_stream,
    )

    ref_df, live_df = frames
    in_dir, out_dir, ck_dir = (
        str(tmp_path / d) for d in ("in", "out", "ck")
    )
    live_df.write.parquet(in_dir)
    stored = spark.read.parquet(in_dir)

    q = run_drift_stream(
        spark, in_dir, ck_dir, out_dir, stored.schema,
        ts_col="ts", group_col="g", bounds=BOUNDS,
    )
    q.awaitTermination(120)

    ref = reference_histogram(ref_df, "g", BOUNDS)
    got = {
        (r.window_start, r.g, r.feature): (round(r.ks_stat, 6), round(r.psi, 6))
        for r in read_drift_sink(spark, out_dir, ref, "g").collect()
    }
    want = {
        (r.window.start, r.g, r.feature): (round(r.ks_stat, 6), round(r.psi, 6))
        for r in drift_from_histograms(
            windowed_histograms(stored, "ts", "g", BOUNDS), ref, "g"
        ).collect()
    }
    assert got == want and len(want) == 4


def test_late_rows_across_micro_batches_do_not_corrupt_window(spark, tmp_path, frames):
    """The code-review repro: a window filled in batch 1 then touched by a
    handful of late rows in batch 2 must NOT be recomputed from the second
    batch's partial histogram (that read KS=1.0 on a no-drift window).
    maxFilesPerTrigger=1 forces one micro-batch per input file."""
    from datavalidation_spark.streaming.drift_stream import (
        read_drift_sink,
        run_drift_stream,
    )

    ref_df, _ = frames
    rng = np.random.default_rng(21)
    base = pd.Timestamp("2024-01-01 00:00:00")
    bulk = pd.DataFrame(
        dict(
            g="A",
            ts=[base + pd.Timedelta(seconds=i % 55) for i in range(1000)],
            value=np.clip(rng.normal(50, 5, 1000), 0, 100),
        )
    )
    late = pd.DataFrame(
        dict(
            g="A",
            # late by ARRIVAL (second file/micro-batch), same event-time window
            ts=[base + pd.Timedelta(seconds=30 + i) for i in range(5)],
            value=np.clip(rng.normal(50, 5, 5), 0, 100),
        )
    )
    in_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(bulk).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(in_dir)
    stored = spark.read.parquet(in_dir)

    src_schema = stored.schema
    # force 2 micro-batches: one file each
    from datavalidation_spark.streaming.drift_stream import windowed_histograms as wh

    src = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    hists = wh(src, "ts", "g", BOUNDS)

    def emit(batch_df, batch_id):
        batch_df.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "g",
            "feature",
            "bucket",
            "obs_count",
            F.lit(batch_id).alias("batch_id"),
        ).write.mode("append").parquet(out_dir)

    q = (
        hists.writeStream.foreachBatch(emit)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(120)

    # sanity: the sink really saw >1 micro-batch
    n_batches = spark.read.parquet(out_dir).select("batch_id").distinct().count()
    assert n_batches >= 2

    ref = reference_histogram(ref_df, "g", BOUNDS)
    got = read_drift_sink(spark, out_dir, ref, "g").collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_obs == 1005          # full window, not the 5-row partial
    assert r.ks_stat < 0.15, r      # in-distribution window stays quiet
    want = drift_from_histograms(
        windowed_histograms(stored, "ts", "g", BOUNDS), ref, "g"
    ).collect()[0]
    assert round(r.ks_stat, 6) == round(want.ks_stat, 6)
    assert round(r.psi, 6) == round(want.psi, 6)
