"""Context assembly for the maritime rule catalog: broadcast dim joins +
anchored trailing-window baselines (SURVEY.md §2.3/§2.4).

Replaces the reference's driver-side lookups (``streamlit_app.py:76-82``),
N+1 point queries (``speed_validation.py:49-53``) and per-row recomputation
of trailing averages (``me_consumption_validation.py:123`` calls
``calculate_avg_consumption`` inside the row loop → O(rows·30)) with:
three broadcast hash joins + two anchored window aggregates computed ONCE
per group and joined back — O(rows), one shuffle per baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.rules.core import hull_performance_factor, nullif_empty_float


def anchored_trailing_avg(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    hours_col: str,
    *,
    window_rows: int = 30,
    min_samples: int = 10,
    drop_null_values: bool = True,
    out_col: str = "trailing_avg",
) -> DataFrame:
    """The reference's signature aggregate (SURVEY A2,
    ``me_consumption_validation.py:63-71``): ONE scalar per group — the
    sum(value)/sum(hours) of the group's last ``window_rows`` rows (anchored
    at the group's max order value, NOT per-row rolling), gated on
    ≥``min_samples`` rows and sum(hours)>0.

    ``drop_null_values=True`` mirrors the ME variant (null consumption rows
    excluded *before* the tail-30); ``False`` mirrors the AE variant
    (``ae_consumption_validation.py:26-31``: tail-30 of ALL rows, count gate
    includes null-consumption rows, sums skip nulls).

    Returns (group_cols..., out_col) — join back on the group key.
    """
    base = df
    if drop_null_values:
        base = base.where(F.col(value_col).isNotNull())
    for g in group_cols:
        base = base.where(F.col(g).isNotNull())

    w = Window.partitionBy(*group_cols).orderBy(F.desc(order_col))
    ranked = base.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.where(F.col("_rn") <= window_rows)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(value_col).alias("_sum_v"),
            F.sum(hours_col).alias("_sum_h"),
        )
        .select(
            *group_cols,
            F.when(
                (F.col("_n") >= min_samples) & (F.col("_sum_h") > 0),
                F.col("_sum_v") / F.col("_sum_h"),
            ).alias(out_col),
        )
    )


def assemble_perf_context(
    perf: DataFrame,
    particulars: DataFrame | None = None,
    coefficients: DataFrame | None = None,
    hull: DataFrame | None = None,
    machinery: DataFrame | None = None,
) -> DataFrame:
    """perf summary + every context column the rule catalog needs.

    Joins are all broadcast (dims are tiny relative to the fact); baselines
    are anchored window aggregates joined back on the group key.
    """
    df = perf

    if particulars is not None:
        df = df.join(
            F.broadcast(particulars.select("vessel_name", "vessel_type")),
            "vessel_name",
            "left",
        )
    else:
        df = df.withColumn("vessel_type", F.lit(None).cast("string"))
    # speed rules default missing type to 'unknown' (speed_validation.py:49-53)
    # while ME rules keep NULL (streamlit_app.py:74-75) — both exposed
    df = df.withColumn(
        "vessel_type_speed", F.coalesce("vessel_type", F.lit("unknown"))
    )

    if coefficients is not None:
        df = df.join(
            F.broadcast(
                coefficients.select(
                    "vessel_name",
                    "consp_speed1",
                    "consp_disp1",
                    "consp_speed2",
                    "consp_disp2",
                    "consp_intercept",
                    F.lit(True).alias("has_coefficients"),
                )
            ),
            "vessel_name",
            "left",
        ).withColumn("has_coefficients", F.coalesce("has_coefficients", F.lit(False)))
    else:
        df = df.withColumn("has_coefficients", F.lit(False))
        for c in ["consp_speed1", "consp_disp1", "consp_speed2", "consp_disp2", "consp_intercept"]:
            df = df.withColumn(c, F.lit(None).cast("double"))

    hull_pct = F.lit(None).cast("double")
    if hull is not None:
        df = df.join(
            F.broadcast(
                hull.select("vessel_name", "hull_rough_power_loss_pct_ed")
            ),
            "vessel_name",
            "left",
        )
        hull_pct = F.col("hull_rough_power_loss_pct_ed")
    df = df.withColumn("hull_factor", hull_performance_factor(hull_pct))

    if machinery is not None:
        # NULLIF('')::float + dedup (boiler_consumption_validation.py:21-31);
        # deterministic pick (min) where the reference takes an unspecified
        # first row of the GROUP BY
        mcr = (
            machinery.select(
                F.col("Vessel_Name").alias("vessel_name"),
                nullif_empty_float(F.col("ME_1_MCR_kW")).alias("mcr_kw"),
            )
            .groupBy("vessel_name")
            .agg(F.min("mcr_kw").alias("mcr_kw"))
        )
        df = df.join(F.broadcast(mcr), "vessel_name", "left")
    else:
        df = df.withColumn("mcr_kw", F.lit(None).cast("double"))

    # ME baseline: per (vessel, load_type), null-consumption rows dropped first
    me_base = anchored_trailing_avg(
        perf,
        ["vessel_name", "load_type"],
        "reportdate",
        "actual_me_consumption",
        "steaming_time_hrs",
        drop_null_values=True,
        out_col="me_hist_avg",
    )
    df = df.join(me_base, ["vessel_name", "load_type"], "left")

    # AE baseline: per vessel, tail-30 of ALL rows (ae_consumption_validation.py:26-31)
    ae_base = anchored_trailing_avg(
        perf,
        ["vessel_name"],
        "reportdate",
        "aux_engine_consumption",
        "total_ae_running_hours",
        drop_null_values=False,
        out_col="ae_hist_avg",
    )
    df = df.join(ae_base, ["vessel_name"], "left")

    return df
