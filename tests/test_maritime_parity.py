"""Rule-parity tests: the Spark catalog vs a per-row pandas transcription of
the reference validators, over seeded fixtures with planted violations
(SURVEY.md §5.1). Fixtures round-trip through parquet so pandas NaN becomes
SQL NULL (matching the Postgres source the reference reads)."""

from __future__ import annotations

import numpy as np
import pytest

from datavalidation_spark.datagen import maritime_fixtures
from datavalidation_spark.engine.context import assemble_perf_context
from datavalidation_spark.rules.core import violations
from datavalidation_spark.rules.maritime import (
    distance_context,
    distance_rules,
    fuel_rob_context,
    fuel_rob_rules,
    perf_summary_rules,
)
from tests.reference_oracle import (
    oracle_distance,
    oracle_fuel_rob,
    oracle_perf_summary,
)


@pytest.fixture(scope="module")
def fixtures():
    t = maritime_fixtures(seed=42, n_vessels=6, days=60)
    perf = t["vessel_performance_summary"]
    logs = t["sf_consumption_logs"]

    # --- plant targeted violations (seeded, deterministic) -----------------
    def set_cell(df, vessel, day_idx, col, value):
        idx = df.index[df["vessel_name" if "vessel_name" in df else "VESSEL_NAME"] == vessel][day_idx]
        df.loc[idx, col] = value

    set_cell(perf, "VESSEL_00", 5, "actual_me_consumption", np.nan)   # ME-MISS
    set_cell(perf, "VESSEL_00", 6, "actual_me_consumption", -3.0)    # ME-NEG/RANGE
    set_cell(perf, "VESSEL_01", 7, "actual_me_consumption", 75.0)    # ME-RANGE/TYPEMAX
    set_cell(perf, "VESSEL_01", 8, "actual_me_consumption", 0.0)     # ME-ZERO-UW
    set_cell(perf, "VESSEL_01", 8, "me_rpm", 80.0)
    set_cell(perf, "VESSEL_02", 9, "aux_engine_consumption", -1.0)   # AE-NEG
    set_cell(perf, "VESSEL_02", 10, "aux_engine_consumption", 60.0)  # AE-RANGE
    set_cell(perf, "VESSEL_02", 11, "aux_engine_consumption", 0.0)   # AE-ZERO-*
    set_cell(perf, "VESSEL_03", 12, "boiler_consumption", -0.5)      # BLR-CARGO/RANGE
    set_cell(perf, "VESSEL_03", 13, "boiler_consumption", 150.0)     # BLR-RANGE
    set_cell(perf, "VESSEL_00", 14, "observed_speed", -2.0)          # SPD-NEG
    set_cell(perf, "VESSEL_04", 15, "observed_speed", 25.0)          # SPD-TYPEMAX
    set_cell(perf, "VESSEL_02", 16, "slip_pct", 60.0)                # SLP-RANGE
    set_cell(perf, "VESSEL_02", 17, "slip_pct", 35.0)                # SLP-WARN
    set_cell(perf, "VESSEL_03", 18, "engine_distance", 1.0)          # SLP-ENG-LT-OBS
    set_cell(perf, "VESSEL_03", 19, "observed_distance", -10.0)      # SLP-DIST-POS
    # a port row with nonzero speed (SPD-PORT)
    port_rows = perf.index[
        (perf["vessel_name"] == "VESSEL_05") & (perf["event"] == "NOON AT PORT")
    ]
    if len(port_rows):
        perf.loc[port_rows[0], "observed_speed"] = 5.0

    set_cell(logs, "VESSEL_00", 3, "OBSERVERD_DISTANCE", -5.0)       # DST-NEG
    set_cell(logs, "VESSEL_01", 4, "OBSERVERD_DISTANCE", 900.0)      # DST-MAX
    set_cell(logs, "VESSEL_02", 5, "OBSERVERD_DISTANCE", 0.0)        # DST-ZERO-STEAM
    # ROB perturbations → known ROB-BAL violations
    set_cell(logs, "VESSEL_03", 6, "ROB_HSFO",
             logs.loc[logs.index[logs["VESSEL_NAME"] == "VESSEL_03"][6], "ROB_HSFO"] + 5.0)
    set_cell(logs, "VESSEL_04", 7, "BUNKERED_QTY_VLSFO", 10.0)

    return t


@pytest.fixture(scope="module")
def spark_tables(spark, fixtures, tmp_path_factory):
    """Round-trip through parquet: NaN→NULL, schema as Postgres would give."""
    base = tmp_path_factory.mktemp("maritime")
    out = {}
    for name, df in fixtures.items():
        p = str(base / f"{name}.parquet")
        df.to_parquet(p, index=False, coerce_timestamps="us")
        out[name] = spark.read.parquet(p)
    return out


def _spark_violation_set(df):
    return {
        (r.vessel_name, r.reportdate.isoformat(), r.remarks) for r in df.collect()
    }


def test_perf_summary_parity(spark, fixtures, spark_tables):
    ctx = assemble_perf_context(
        spark_tables["vessel_performance_summary"],
        spark_tables["vessel_particulars"],
        spark_tables["vessel_performance_coefficients"],
        spark_tables["hull_performance_six_months"],
        spark_tables["machinery_particulars"],
    )
    got = _spark_violation_set(
        violations(ctx, perf_summary_rules(), ["vessel_name", "reportdate"])
    )
    want = oracle_perf_summary(fixtures)
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
        f"(|want|={len(want)} |got|={len(got)})"
    )
    assert len(want) > 100  # fixtures actually exercise the catalog


def test_distance_parity(spark, fixtures, spark_tables):
    ctx = distance_context(spark_tables["sf_consumption_logs"])
    got = {
        (r.VESSEL_NAME, r.REPORT_DATE.isoformat(), r.remarks)
        for r in violations(ctx, distance_rules(), ["VESSEL_NAME", "REPORT_DATE"]).collect()
    }
    want = oracle_distance(fixtures["sf_consumption_logs"])
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    assert len(want) > 0


def test_fuel_rob_parity(spark, fixtures, spark_tables):
    ctx = fuel_rob_context(spark_tables["sf_consumption_logs"])
    got = {
        (r.VESSEL_NAME, r.REPORT_DATE.isoformat(), r.remarks)
        for r in violations(ctx, fuel_rob_rules(), ["VESSEL_NAME", "REPORT_DATE"]).collect()
    }
    want = oracle_fuel_rob(fixtures["sf_consumption_logs"])
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    # the two perturbations produce downstream violations
    assert len(want) >= 3
