"""Property-based tests (hypothesis) — SURVEY.md §5.3.

Each property generates data driver-side and evaluates the compiled rules in
ONE Spark job per example; examples are kept small and few (a Spark round
trip per example), with determinism doing the heavy lifting.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datavalidation_spark.engine.spans import span_rules
from datavalidation_spark.rules.core import annotate, violations
from datavalidation_spark.rules.maritime import fuel_rob_context, fuel_rob_rules, me_rules

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

maybe_float = st.one_of(
    st.none(),
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
)


@SET
@given(
    rows=st.lists(
        st.tuples(maybe_float, maybe_float, maybe_float, maybe_float),
        min_size=1,
        max_size=25,
    )
)
def test_me_rules_never_throw_on_nulls(spark, rows):
    """Null-injection invariance: any mix of NULLs evaluates cleanly, and
    ME-MISS fires exactly on NULL consumption (the reference's pd.notna
    guards as a law, not an accident)."""
    pdf = pd.DataFrame(
        rows,
        columns=["actual_me_consumption", "actual_me_power", "me_rpm", "steaming_time_hrs"],
    )
    pdf["vessel_name"] = [f"V{i}" for i in range(len(pdf))]
    pdf["reportdate"] = pd.Timestamp("2024-01-01")
    pdf["load_type"] = "laden"
    pdf["observed_speed"] = 10.0
    pdf["displacement"] = 50000.0
    df = spark.createDataFrame(pdf).withColumns(
        {
            "vessel_type": F.lit(None).cast("string"),
            "has_coefficients": F.lit(False),
            "consp_speed1": F.lit(None).cast("double"),
            "consp_disp1": F.lit(None).cast("double"),
            "consp_speed2": F.lit(None).cast("double"),
            "consp_disp2": F.lit(None).cast("double"),
            "consp_intercept": F.lit(None).cast("double"),
            "hull_factor": F.lit(1.0),
            "me_hist_avg": F.lit(None).cast("double"),
        }
    )
    out = violations(df, me_rules(), ["vessel_name"]).collect()  # must not raise
    miss = {r.vessel_name for r in out if r.rule_id == "ME-MISS"}
    want_miss = {
        f"V{i}" for i, (c, *_rest) in enumerate(rows) if c is None or (isinstance(c, float) and math.isnan(c))
    }
    assert miss == want_miss


@SET
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=12, unique=True),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_offset_monotonicity_property(spark, offsets, seed):
    """Sorted offsets always pass SPAN-OFFSET-MONO; any non-sorted
    permutation always fires it."""
    rng = random.Random(seed)
    inc = sorted(offsets)
    shuffled = inc[:]
    while shuffled == inc:
        rng.shuffle(shuffled)

    def doc(doc_id, offs):
        return (doc_id, [("text", f"t{o}", None, o) for o in offs], 0)

    df = spark.createDataFrame(
        [doc("sorted", inc), doc("shuffled", shuffled)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, part_id int",
    )
    fired = {
        r.doc_id
        for r in violations(df, span_rules(), ["doc_id"]).collect()
        if r.rule_id == "SPAN-OFFSET-MONO"
    }
    assert fired == {"shuffled"}


@SET
@given(
    n=st.integers(min_value=3, max_value=15),
    perturb_idx=st.integers(min_value=1, max_value=14),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_rob_balance_round_trip(spark, n, perturb_idx, seed):
    """A consistent ROB series yields zero violations; perturbing one ROB
    cell yields exactly the violations at that row and the next (the balance
    breaks on both sides of the edit) for that fuel only."""
    perturb_idx = min(perturb_idx, n - 1)
    rng = random.Random(seed)
    dates = pd.date_range("2024-01-01", periods=n)
    rob = 1000.0
    rows = []
    for d in dates:
        cons = round(rng.uniform(0.5, 5.0), 2)
        bunk = round(rng.choice([0.0, 0.0, 25.0]), 2)
        rob = round(rob + bunk - cons, 2)
        row = {"VESSEL_NAME": "V0", "REPORT_DATE": d}
        for fuel in ["HSFO", "LSMGO", "ULSFO", "VLSFO", "MDO", "LNG"]:
            row[f"ROB_{fuel}"] = rob
            row[f"BUNKERED_QTY_{fuel}"] = bunk
            row[f"TOTAL_CONSUMPTION_{fuel}"] = cons
        rows.append(row)
    clean = pd.DataFrame(rows)

    def run(pdf):
        df = spark.createDataFrame(pdf)
        ctx = fuel_rob_context(df)
        return violations(ctx, fuel_rob_rules(), ["VESSEL_NAME", "REPORT_DATE"]).collect()

    assert run(clean) == []

    dirty = clean.copy()
    dirty.loc[perturb_idx, "ROB_HSFO"] = dirty.loc[perturb_idx, "ROB_HSFO"] + 7.77
    out = run(dirty)
    assert all(r.rule_id == "ROB-BAL-HSFO" for r in out)
    got_dates = sorted(r.REPORT_DATE for r in out)
    want_dates = sorted(
        pd.Timestamp(dates[i]).to_pydatetime()
        for i in ([perturb_idx] if perturb_idx == n - 1 else [perturb_idx, perturb_idx + 1])
    )
    assert got_dates == want_dates


def test_date_math_helpers(spark):
    """F12 interval helpers: explicit-cutoff day arithmetic, NULL-safe,
    inclusive window bounds (the reference's now()-anchored 3-month filter
    with a reproducible cutoff)."""
    from datavalidation_spark.rules.core import age_days, within_days

    rows = [
        ("2024-01-01 10:00:00", 31, False),   # outside a 30-day window
        ("2024-01-02 23:59:59", 30, True),    # boundary day inclusive
        ("2024-02-01 00:00:01", 0, True),     # same-day
        (None, None, False),                  # NULL ts never passes
    ]
    df = spark.createDataFrame(
        [(ts,) for ts, _, _ in rows], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    cutoff = F.lit("2024-02-01").cast("timestamp")
    got = df.select(
        age_days(F.col("ts"), cutoff).alias("age"),
        within_days(F.col("ts"), cutoff, 30).alias("ok"),
    ).collect()
    for (ts, want_age, want_ok), r in zip(rows, got):
        assert r.age == want_age, (ts, r.age)
        assert r.ok is want_ok, (ts, r.ok)
    # future timestamps (beyond cutoff) are not "within" the window
    fut = spark.createDataFrame([("2024-02-05 00:00:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    assert fut.select(within_days(F.col("ts"), cutoff, 30).alias("ok")).collect()[0].ok is False


# --- winnowing guarantee (Schleimer et al. 03, theorem 1) -------------------

_words = st.sampled_from(
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
     "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
)


@SET
@given(
    shared=st.lists(_words, min_size=7, max_size=15),   # >= w + k - 1 at k=w=4
    pre_a=st.lists(_words, min_size=0, max_size=6),
    suf_a=st.lists(_words, min_size=0, max_size=6),
    pre_b=st.lists(_words, min_size=0, max_size=6),
    suf_b=st.lists(_words, min_size=0, max_size=6),
)
def test_winnow_guarantee_property(spark, shared, pre_a, suf_a, pre_b, suf_b):
    """Any two docs sharing a token run of length >= w + k - 1 share at
    least one winnowing fingerprint, regardless of surrounding context —
    the fingerprinting guarantee the pair join relies on."""
    from datavalidation_spark.operators.dedup import winnow_fingerprints

    doc_a = " ".join(pre_a + shared + suf_a)
    doc_b = " ".join(pre_b + shared + suf_b)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")
    fps = winnow_fingerprints(df, k=4, w=4).toPandas()
    a = set(fps[fps.id == 1].fp)
    b = set(fps[fps.id == 2].fp)
    assert a & b, f"no shared fingerprint for shared run of {len(shared)} tokens"


@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_bounds_partition_the_rank_space(weights):
    """For ANY positive weights: bounds are monotone non-decreasing, end
    exactly at 2^32 (total coverage), and each interval's width is within
    one rank unit of its normalized share (no silent share corruption)."""
    from datavalidation_spark.operators.sampling import split_bounds

    named = {f"s{i}": w for i, w in enumerate(weights)}
    bounds = split_bounds(named)
    uppers = [b for _, b in bounds]
    assert uppers == sorted(uppers)
    assert uppers[-1] == 2**32
    total = sum(weights)
    prev = 0
    for (_, ub), w in zip(bounds, weights):
        width = ub - prev
        assert width >= 0
        # width tracks the normalized share up to accumulated float+int
        # truncation (< 2 rank units per boundary, clamp on the last)
        if ub != 2**32:
            assert abs(width - (w / total) * 2**32) < 4
        prev = ub
