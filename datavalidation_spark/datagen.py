"""Deterministic synthetic data for tests and benchmarks.

Two families:

1. **Interleaved text+media documents** (the engine's target data model per
   BASELINE.json ``input_hint``): ``(doc_id string, spans array<struct<
   kind,text,media_ref,offset>>, part_id int)`` plus an ``asset_catalog``
   dimension. Generated *inside Spark* from ``spark.range`` with
   ``xxhash64``-seeded expressions — fully distributed, O(0) driver memory,
   so the same generator produces the 10^12-doc shape on a real cluster.
   The "dirty" variant plants a known rate of each violation class
   (bogus kind, broken offset monotonicity, text/media_ref mutual-exclusion
   breaks, duplicate doc_id, dangling media_ref) — all deterministic
   functions of (doc id, seed), never RNG state.

2. **Reference-shaped maritime fixtures** (FIXTURES.md §3) for rule-parity
   unit tests: small seeded numpy/pandas frames matching the schemas the
   reference validators consume (``vessel_performance_summary`` et al.,
   reference ``validators/me_consumption_validation.py:6-17``,
   ``fuel_rob_validation.py:7-30``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("text", "image", "audio", "video")

# Planted violation rates (1-in-N spans / docs). Primes so classes don't
# systematically coincide.
DUP_DOC_MOD = 1000        # ~0.1% duplicate doc_id (FIXTURES.md §1)
BAD_KIND_MOD = 997
BAD_OFFSET_MOD = 499
MUTEX_MOD = 811
DANGLING_MOD = 101        # ~1% of media spans dangle (FIXTURES.md §2)


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 63-bit stream from xxhash64."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_parts: int = 32,
    n_assets: int = 10_000,
    dirty: bool = True,
    skew: bool = False,
    max_spans: int = 8,
) -> DataFrame:
    """Interleaved-document table, generated distributed.

    ``skew=True`` funnels ~30% of docs into part_id 0 (FIXTURES.md §4's
    skewed variant) to exercise salting/AQE paths.
    """
    df = spark.range(n_docs).withColumnRenamed("id", "_i")
    h_doc = _h(seed, F.col("_i"))

    # duplicate doc_id: doc i occasionally reuses doc (i-1)'s id
    base_id = F.col("_i")
    if dirty:
        base_id = F.when(
            (F.col("_i") > 0) & (h_doc % DUP_DOC_MOD == 0), F.col("_i") - 1
        ).otherwise(F.col("_i"))
    doc_id = F.format_string("doc%012d", base_id)

    n_spans = (_h(seed + 1, F.col("_i")) % max_spans + 1).cast("int")

    if skew:
        part_id = F.when(h_doc % 10 < 3, F.lit(0)).otherwise(
            (_h(seed + 2, F.col("_i")) % n_parts).cast("int")
        )
    else:
        part_id = (_h(seed + 2, F.col("_i")) % n_parts).cast("int")

    # Per-span fields as a lambda over sequence(0, n_spans-1). All randomness
    # = xxhash64(doc index, span index, seed) → reproducible at any scale.
    def span(i: F.Column) -> F.Column:
        r = F.abs(F.xxhash64(F.lit(seed + 3), F.col("_i"), i))
        is_mutex = F.lit(dirty) & (r % MUTEX_MOD == 0)
        kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (r % 4 + 1).cast("int"))
        if dirty:
            # mutex plants are forced to text spans (carrying a media_ref below)
            kind = (
                F.when(r % BAD_KIND_MOD == 0, F.lit("bogus"))
                .when(is_mutex, F.lit("text"))
                .otherwise(kind)
            )
        is_text = kind == "text"
        words = (r % 12 + 3).cast("int")
        text_val = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), words - 1),
                lambda w: F.concat(
                    F.lit("tok"),
                    (F.abs(F.xxhash64(F.lit(seed + 4), F.col("_i"), i, w)) % 5000).cast("string"),
                ),
            ),
        )
        ref_n = r % n_assets
        if dirty:
            # dangling reference: point past the catalog
            ref_n = F.when(r % DANGLING_MOD == 0, r % n_assets + n_assets).otherwise(ref_n)
        media_val = F.format_string("asset_%08d", ref_n)

        text_col = F.when(is_text, text_val)
        media_col = F.when(~is_text, media_val)
        if dirty:
            # mutual-exclusion break: text span that ALSO carries a media_ref
            media_col = F.when(is_mutex, media_val).otherwise(media_col)

        offset = i * 10 + (r % 5).cast("int")
        if dirty:
            # monotonicity break: drop this span's offset below its predecessor
            offset = F.when((r % BAD_OFFSET_MOD == 0) & (i > 0), i * 10 - 25).otherwise(offset)

        return F.struct(
            kind.alias("kind"),
            text_col.alias("text"),
            media_col.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)

    return df.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        part_id.alias("part_id"),
    )


def synth_asset_catalog(
    spark: SparkSession, n_assets: int = 10_000, seed: int = 42
) -> DataFrame:
    """Asset dimension keyed by media_ref (FIXTURES.md §2)."""
    df = spark.range(n_assets)
    r = _h(seed + 9, F.col("id"))
    return df.select(
        F.format_string("asset_%08d", F.col("id")).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (r % 3 + 1).cast("int"),
        ).alias("media_type"),
        (r % 10_000_000 + 1024).cast("bigint").alias("size_bytes"),
    )


# ---------------------------------------------------------------------------
# Reference-shaped maritime fixtures (pandas; unit-test scale)
# ---------------------------------------------------------------------------

EVENTS = ("NOON AT SEA", "END OF SEA PASSAGE", "NOON AT PORT")
LOAD_TYPES = ("laden", "ballast")
FUEL_TYPES = ("HSFO", "LSMGO", "ULSFO", "VLSFO", "MDO", "LNG")


def maritime_fixtures(
    seed: int = 42, n_vessels: int = 6, days: int = 60
) -> dict[str, pd.DataFrame]:
    """Seeded fixtures matching the reference's six-table schema
    (FIXTURES.md §3). Mostly-clean data with enough natural spread that each
    rule family has both passing and failing rows; parity tests additionally
    plant targeted violations on top.
    """
    rng = np.random.default_rng(seed)
    vessels = [f"VESSEL_{i:02d}" for i in range(n_vessels)]
    dates = pd.date_range("2024-01-01", periods=days, freq="D")

    rows = []
    for vi, v in enumerate(vessels):
        power = 8000 + 500 * vi
        for d in dates:
            at_sea = rng.random() < 0.7
            event = "NOON AT SEA" if at_sea else str(rng.choice(EVENTS[1:]))
            speed = float(np.round(rng.normal(13, 1.5), 2)) if at_sea else 0.0
            hours = 24.0 if at_sea else 0.0
            rows.append(
                {
                    "vessel_name": v,
                    "vessel_imo": f"9{vi:06d}",
                    "reportdate": d,
                    "event": event,
                    "load_type": str(rng.choice(LOAD_TYPES)),
                    "actual_me_consumption": float(np.round(rng.normal(25, 3), 2)) if at_sea else 0.0,
                    "actual_me_power": power * (0.8 if at_sea else 0.0),
                    "me_rpm": 80.0 if at_sea else 0.0,
                    "steaming_time_hrs": hours,
                    "observed_speed": speed,
                    "displacement": float(np.round(rng.normal(50000, 2000), 0)),
                    "aux_engine_consumption": float(np.round(rng.normal(3, 0.5), 2)),
                    "avg_ae_power": 600.0,
                    "total_ae_running_hours": 24.0,
                    "boiler_consumption": float(np.round(abs(rng.normal(1, 0.4)), 2)),
                    "slip_pct": float(np.round(rng.normal(5, 3), 2)) if at_sea else np.nan,
                    "observed_distance": float(np.round(speed * hours, 1)),
                    "engine_distance": float(np.round(speed * hours * 1.05, 1)),
                    "me_load_pct": 80.0,
                }
            )
    perf = pd.DataFrame(rows)

    particulars = pd.DataFrame(
        {
            # mixed-case vessel types on purpose (SURVEY.md §1.3)
            "vessel_name": vessels[: n_vessels - 1],  # one vessel absent → join default path
            "vessel_type": [
                ("CONTAINER" if i % 3 == 0 else ("container" if i % 3 == 1 else "BULK"))
                for i in range(n_vessels - 1)
            ],
        }
    )

    coefficients = pd.DataFrame(
        {
            "vessel_name": vessels[: n_vessels - 1],
            "consp_speed1": rng.normal(0.5, 0.05, n_vessels - 1),
            "consp_disp1": rng.normal(1e-4, 1e-5, n_vessels - 1),
            "consp_speed2": rng.normal(0.05, 0.005, n_vessels - 1),
            "consp_disp2": rng.normal(1e-9, 1e-10, n_vessels - 1),
            "consp_intercept": rng.normal(5, 0.5, n_vessels - 1),
        }
    )

    hull = pd.DataFrame(
        {
            "vessel_name": vessels[: n_vessels - 2],
            "hull_rough_power_loss_pct_ed": rng.uniform(0, 15, n_vessels - 2),
        }
    )

    machinery = pd.DataFrame(
        {
            "Vessel_Name": vessels,
            # string-typed numeric incl. empty (ref boiler_consumption_validation.py:25)
            "ME_1_MCR_kW": [""] + [str(10000 + 1000 * i) for i in range(n_vessels - 1)],
        }
    )

    # sf_consumption_logs: lat/lon walks + consistent ROB balances
    logs = []
    for vi, v in enumerate(vessels):
        lat, lon = 1.0 + vi, 103.0 + vi
        rob = {f: float(1000 + 100 * vi) for f in FUEL_TYPES}
        for d in dates:
            hours = 24.0
            speed = float(np.round(rng.normal(13, 1.5), 2))
            dist_km = speed * 1.852 * hours
            bearing = rng.uniform(0, 2 * np.pi)
            lat += (dist_km / 111.0) * np.sin(bearing) * 0.2
            lon += (dist_km / 111.0) * np.cos(bearing) * 0.2
            row = {
                "VESSEL_NAME": v,
                "REPORT_DATE": d,
                "LATITUDE": float(np.round(lat, 5)),
                "LONGITUDE": float(np.round(lon, 5)),
                "OBSERVERD_DISTANCE": float(np.round(speed * hours, 1)),
                "STEAMING_TIME_HRS": hours,
                "ME_CONSUMPTION": float(np.round(rng.normal(25, 3), 2)),
                "SPEED": speed,
                "DISPLACEMENT": float(np.round(rng.normal(50000, 2000), 0)),
                "WINDFORCE": float(rng.integers(0, 9)),
                "VESSEL_ACTIVITY": "SAILING",
                "LOAD_TYPE": str(rng.choice(LOAD_TYPES)),
            }
            for f in FUEL_TYPES:
                cons = float(np.round(abs(rng.normal(2, 0.5)), 2))
                bunk = float(np.round(rng.choice([0.0, 0.0, 0.0, 50.0]), 2))
                new_rob = round(rob[f] + bunk - cons, 2)
                row[f"ROB_{f}"] = new_rob
                row[f"BUNKERED_QTY_{f}"] = bunk
                row[f"TOTAL_CONSUMPTION_{f}"] = cons
                rob[f] = new_rob
            logs.append(row)
    sf_logs = pd.DataFrame(logs)

    return {
        "vessel_performance_summary": perf,
        "vessel_particulars": particulars,
        "vessel_performance_coefficients": coefficients,
        "hull_performance_six_months": hull,
        "machinery_particulars": machinery,
        "sf_consumption_logs": sf_logs,
    }
