"""The full reference rule catalog (SURVEY.md §2.7) as declarative rules.

Every rule reproduces the live validators' predicate and remark string
verbatim (citations per rule). Apply over ``assemble_perf_context(...)``
output for the perf-summary families, or raw ``sf_consumption_logs`` for
distance / fuel-ROB (those need the lag context added by
``distance_context`` / ``fuel_rob_context`` below).

Intentional divergences from the reference (documented, SURVEY.md §7.4):
- lag windows partition by vessel (the reference's ``shift()`` leaks across
  vessels, ``distance_validation.py:59-65``, and its batch slicing skips
  cross-batch pairs, ``fuel_rob_validation.py:91-94``);
- Python banker's rounding vs Spark half-up in ROB-BAL — identical on the
  2-dp value grid the data lives on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.rules.core import (
    Rule,
    expected_consumption,
    haversine_km,
    in_range,
    nv,
    within_pct,
)

AT_SEA = "NOON AT SEA"
MANEUVERING = "END OF SEA PASSAGE"
IN_PORT = "NOON AT PORT"
FUEL_TYPES = ("HSFO", "LSMGO", "ULSFO", "VLSFO", "MDO", "LNG")


def _power_based_max(power: Column, hours: Column, factor: float) -> Column:
    """``factor*p*h/1e6`` if p,h non-null and p>0 else NULL
    (me_consumption_validation.py:88-89)."""
    return F.when(
        power.isNotNull() & hours.isNotNull() & (power > 0),
        F.lit(factor) * power * hours / F.lit(1_000_000.0),
    )


# ---------------------------------------------------------------------------
# ME consumption (me_consumption_validation.py:92-155)
# ---------------------------------------------------------------------------


def me_rules() -> list[Rule]:
    c = F.col("actual_me_consumption")
    p = F.col("actual_me_power")
    rpm = F.col("me_rpm")
    hours = F.col("steaming_time_hrs")
    has_c = c.isNotNull()
    max_allowed = _power_based_max(p, hours, 250.0)
    type_max = F.when(F.col("vessel_type") == "CONTAINER", F.lit(300.0)).otherwise(
        F.lit(50.0)
    )
    expected = expected_consumption(
        F.col("consp_speed1"),
        F.col("consp_disp1"),
        F.col("consp_speed2"),
        F.col("consp_disp2"),
        F.col("consp_intercept"),
        F.col("observed_speed"),
        F.col("displacement"),
        F.col("hull_factor"),
    )
    return [
        Rule(
            "ME-MISS",
            violation=c.isNull(),
            remark="ME Consumption data is missing",  # :148-149
        ),
        Rule(
            "ME-RANGE",
            violation=~in_range(c, 0, 50),
            remark="ME Consumption out of range",  # :105-106
            where=has_c,
        ),
        Rule(
            "ME-POWER",
            # `if max_allowed_consumption and ...` — Python falsy-zero skip
            violation=max_allowed.isNotNull() & (max_allowed != 0) & (c > max_allowed),
            remark="ME Consumption too high for the Reported power",  # :109-111
            where=has_c,
        ),
        Rule(
            "ME-ZERO-UW",
            violation=rpm.isNotNull() & (rpm > 0) & (c == 0),
            remark="ME Consumption cannot be zero when underway",  # :114-115
            where=has_c,
        ),
        Rule(
            "ME-TYPEMAX",
            violation=c > type_max,
            remark=F.format_string(
                "ME Consumption too high for %s vessel",
                F.coalesce(F.col("vessel_type"), F.lit("None")),
            ),  # :118-120 (None-rendering parity for unmatched dims)
            where=has_c,
        ),
        Rule(
            "ME-HIST",
            violation=F.col("me_hist_avg").isNotNull()
            & ~within_pct(c, F.col("me_hist_avg"), 0.8, 1.2),
            remark=F.format_string(
                "ME Consumption outside typical range of %s condition",
                F.coalesce(F.col("load_type"), F.lit("None")),
            ),  # :123-128
            where=has_c,
        ),
        Rule(
            "ME-EXPECT",
            # NaN speed/displacement → expected NULL → within_pct False → fires,
            # matching pandas NaN-propagation (:131-146)
            violation=~within_pct(c, expected, 0.8, 1.2),
            remark="ME Consumption not aligned with speed consumption table (including hull performance)",
            where=has_c
            & F.col("has_coefficients")
            & F.col("steaming_time_hrs").isNotNull()
            & (F.col("steaming_time_hrs") > 0),
        ),
        Rule(
            "ME-NEG",
            violation=c < 0,
            remark="ME Consumption cannot be negative",  # :152-153
            where=has_c,
        ),
    ]


# ---------------------------------------------------------------------------
# AE consumption (ae_consumption_validation.py:56-98)
# ---------------------------------------------------------------------------


def ae_rules() -> list[Rule]:
    c = F.col("aux_engine_consumption")
    p = F.col("avg_ae_power")
    hours = F.col("total_ae_running_hours")
    has_c = c.isNotNull()
    max_allowed = _power_based_max(p, hours, 300.0)
    return [
        Rule("AE-MISS", violation=c.isNull(), remark="AE Consumption data is missing"),
        Rule(
            "AE-RANGE",
            violation=~in_range(c, 0, 50),
            remark="AE Consumption out of range",
            where=has_c,
        ),
        Rule(
            "AE-POWER",
            violation=max_allowed.isNotNull() & (max_allowed != 0) & (c > max_allowed),
            remark="AE Consumption too high for the Reported power",
            where=has_c,
        ),
        Rule(
            "AE-ZERO-GEN",
            violation=p.isNotNull() & (p > 0) & (c == 0),
            remark="AE Consumption cannot be zero when generating power",
            where=has_c,
        ),
        Rule(
            "AE-HIST",
            violation=F.col("ae_hist_avg").isNotNull()
            & ~within_pct(c, F.col("ae_hist_avg"), 0.8, 1.2),
            remark="AE Consumption outside typical range",
            where=has_c,
        ),
        Rule(
            "AE-ZERO-TOT",
            violation=c == 0,
            remark="Total AE Consumption cannot be zero without Shaft Generator",
            where=has_c,
        ),
        Rule(
            "AE-NEG",
            violation=c < 0,
            remark="AE Consumption cannot be negative",
            where=has_c,
        ),
    ]


# ---------------------------------------------------------------------------
# Boiler (boiler_consumption_validation.py:46-71)
# ---------------------------------------------------------------------------


def boiler_rules() -> list[Rule]:
    c = F.col("boiler_consumption")
    has_c = c.isNotNull()
    me_load = F.when(
        F.col("actual_me_power").isNotNull()
        & F.col("mcr_kw").isNotNull()
        & (F.col("mcr_kw") != 0),
        F.col("actual_me_power") * 100.0 / F.col("mcr_kw"),
    )
    return [
        Rule(
            "BLR-MISS", violation=c.isNull(), remark="Boiler Consumption data is missing"
        ),
        Rule(
            "BLR-RANGE",
            violation=~in_range(c, 0, 100),
            remark="Boiler Consumption out of range",
            where=has_c,
        ),
        Rule(
            "BLR-CARGO",
            violation=c < 0,  # cargo_heating hardcoded 0 (:57-60)
            remark="Boiler Consumption cannot be less than Cargo Heating Consumption",
            where=has_c,
        ),
        Rule(
            "BLR-SEALOAD",
            violation=(F.col("event") == AT_SEA)
            & F.col("mcr_kw").isNotNull()
            & me_load.isNotNull()
            & (me_load > 40)
            & (c > 0),
            remark="Warning: Boiler Consumption expected to be zero at high ME Load during sea passage",
            where=has_c,
            severity="warning",
        ),
    ]


# ---------------------------------------------------------------------------
# Speed (speed_validation.py:58-122)
# ---------------------------------------------------------------------------


def speed_rules() -> list[Rule]:
    speed = F.col("observed_speed")
    event = F.col("event")
    vt = F.col("vessel_type_speed")  # 'unknown' default (:49-53)
    hours = F.col("steaming_time_hrs")
    dist = F.col("observed_distance")
    rpm = F.col("me_rpm")
    run = F.col("steaming_time_hrs")  # ME_RUN_HOURS aliases the same column (:8-9)
    cons = F.col("actual_me_consumption")

    # applicability (:65-66): skip entirely when not at sea AND speed null
    applicable = ~((event != AT_SEA) | event.isNull()) | speed.isNotNull()
    has_speed = applicable & speed.isNotNull()

    expected = F.when(hours == 0, F.lit(0.0)).otherwise(dist / hours)
    ratio = speed / expected

    return [
        Rule(
            "SPD-NEG",
            violation=speed < 0,
            remark="Observed Speed cannot be negative",
            where=has_speed,
        ),
        Rule(
            "SPD-LOW-SEA",
            violation=(event == AT_SEA) & (speed <= 5),
            remark="Unusually low speed for sea passage",
            where=has_speed,
        ),
        Rule(
            "SPD-MANEUV",
            violation=(event == MANEUVERING) & ~in_range(speed, 2, 5),
            remark="Unusual speed for maneuvering",
            where=has_speed,
        ),
        Rule(
            "SPD-PORT",
            violation=(event == IN_PORT) & (speed != 0),
            remark="Speed should be zero when in port",
            where=has_speed,
        ),
        Rule(
            "SPD-TYPEMAX-C",
            violation=(vt == "container") & (speed > 35),
            remark="Speed too high for container vessel",  # lowercase compare (:94)
            where=has_speed,
        ),
        Rule(
            "SPD-TYPEMAX-NC",
            violation=(vt != "container") & (speed > 20),
            remark="Speed too high for non-container vessel",
            where=has_speed,
        ),
        Rule(
            "SPD-DIST-ZERO",
            violation=(hours == 0) & (dist != 0),
            remark="Observed distance is non-zero but steaming hours is zero",
            where=has_speed & hours.isNotNull() & dist.isNotNull(),
        ),
        Rule(
            "SPD-RATIO",
            violation=(expected != 0) & ~in_range(ratio, 0.9, 1.1),
            remark="Observed Speed not aligned with distance and time",
            where=has_speed & hours.isNotNull() & dist.isNotNull(),
        ),
        Rule(
            "SPD-INCONSIST",
            violation=(speed > 0)
            & (nv(rpm == 0) | nv(run == 0) | nv(cons == 0)),
            remark="Inconsistent data: Speed > 0 but engine parameters indicate no movement",
            where=has_speed,
        ),
        Rule(
            "SPD-MISS-SEA",
            violation=(event == AT_SEA) & speed.isNull(),
            remark="Speed data is missing for NOON AT SEA event",
            where=applicable,
        ),
    ]


# ---------------------------------------------------------------------------
# Slip (slip_validation.py:75-114)
# ---------------------------------------------------------------------------


def slip_rules() -> list[Rule]:
    slip = F.col("slip_pct")
    event = F.col("event")
    obs = F.col("observed_distance")
    eng = F.col("engine_distance")
    has_slip = slip.isNotNull()
    has_dists = obs.isNotNull() & eng.isNotNull()
    dist_nonpos = (obs <= 0) | (eng <= 0)
    return [
        Rule(
            "SLP-RANGE",
            violation=~in_range(slip, -50, 50),
            remark="ValidationError: Slip percentage out of typical range (-50 to 50)",
            where=has_slip,
        ),
        Rule(
            "SLP-NOT-SEA",
            violation=(event != AT_SEA) | event.isNull(),
            remark="ValidationError: Slip should only be calculated during sea passage",
            where=has_slip,
        ),
        Rule(
            "SLP-WARN",
            violation=slip > 30,
            remark="Warning: High slip percentage. Check Observed Distance and Engine Distance",
            where=has_slip,
            severity="warning",
        ),
        Rule(
            "SLP-MISS",
            violation=slip.isNull(),
            remark="ValidationError: Slip percentage is missing",
        ),
        Rule(
            "SLP-DIST-POS",
            violation=dist_nonpos,
            remark="ValidationError: Observed or Engine Distance should be greater than zero",
            where=has_dists,
        ),
        Rule(
            "SLP-ENG-LT-OBS",
            violation=~dist_nonpos & (eng < obs),  # elif chain (:108-112)
            remark="ValidationError: Engine Distance is less than Observed Distance",
            where=has_dists,
        ),
    ]


def perf_summary_rules() -> list[Rule]:
    """All rule families over the assembled perf context."""
    return me_rules() + ae_rules() + boiler_rules() + speed_rules() + slip_rules()


# ---------------------------------------------------------------------------
# Distance (distance_validation.py:56-104) — needs lag context
# ---------------------------------------------------------------------------


def distance_context(logs: DataFrame) -> DataFrame:
    """Add ``calc_distance`` = haversine to the previous report *of the same
    vessel* (partition-correct; the reference's shift leaks across vessels)."""
    w = Window.partitionBy("VESSEL_NAME").orderBy("REPORT_DATE")
    return logs.withColumn(
        "calc_distance",
        haversine_km(
            F.lag("LATITUDE").over(w),
            F.lag("LONGITUDE").over(w),
            F.col("LATITUDE"),
            F.col("LONGITUDE"),
        ),
    )


def distance_rules() -> list[Rule]:
    obs = F.col("OBSERVERD_DISTANCE")  # schema-correct misspelling
    steaming = F.col("STEAMING_TIME_HRS")
    calc = F.col("calc_distance")
    return [
        Rule("DST-NEG", violation=obs < 0, remark="Observed Distance is negative"),
        Rule("DST-MAX", violation=obs > 500, remark="Observed Distance too high"),
        Rule(
            "DST-ZERO-STEAM",
            violation=(obs == 0) & (steaming > 0),
            remark="Observed Distance is zero when steaming",
        ),
        Rule(
            # ~(mask) semantics: NULL calc (first report) or NULL obs → fires,
            # matching the pandas ~ of a NaN comparison (:71-74)
            "DST-ALIGN",
            violation=~nv((F.lit(0.9) * calc <= obs) & (obs <= F.lit(1.1) * calc)),
            remark="Observed Distance not aligned with calculated distance",
        ),
    ]


# ---------------------------------------------------------------------------
# Fuel ROB (fuel_rob_validation.py:58-81) — six fuels, one lag window
# ---------------------------------------------------------------------------


def fuel_rob_context(logs: DataFrame) -> DataFrame:
    """Null-fill numerics (fetch does fillna(0), :44-45) and add prev-ROB lag
    columns for all six fuels over ONE window (one shuffle+sort)."""
    numeric_cols = [
        f for f in logs.columns
        if f.startswith(("ROB_", "BUNKERED_QTY_", "TOTAL_CONSUMPTION_"))
    ]
    df = logs.na.fill(0.0, numeric_cols)
    w = Window.partitionBy("VESSEL_NAME").orderBy("REPORT_DATE")
    for fuel in FUEL_TYPES:
        df = df.withColumn(f"_prev_rob_{fuel}", F.lag(f"ROB_{fuel}").over(w))
    return df


def fuel_rob_rules() -> list[Rule]:
    rules = []
    for fuel in FUEL_TYPES:
        prev = F.coalesce(F.col(f"_prev_rob_{fuel}"), F.lit(0.0))
        rob = F.round(F.col(f"ROB_{fuel}"), 2)
        calc = F.round(
            prev + F.col(f"BUNKERED_QTY_{fuel}") - F.col(f"TOTAL_CONSUMPTION_{fuel}"), 2
        )
        rules.append(
            Rule(
                f"ROB-BAL-{fuel}",
                violation=calc != rob,
                remark=F.format_string(
                    f"{fuel} ROB validation failed. Calculated: %.2f, Actual: %.2f, Difference: %.2f",
                    calc,
                    rob,
                    F.abs(rob - calc),
                ),
                # first report per vessel has no predecessor → skipped (i>=1 loop)
                where=F.col(f"_prev_rob_{fuel}").isNotNull(),
            )
        )
    return rules
