"""Expectation suites (engine/expectations.py): per-kind verdicts on a
planted micro-fixture, one-agg-pass property, spec validation."""

from __future__ import annotations

import pytest

from datavalidation_spark.engine.expectations import run_expectations


@pytest.fixture(scope="module")
def fixture(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 20.0, "a"),
            (3, None, "b"),
            (3, 40.0, "zzz"),  # duplicate id 3; 'zzz' outside the enum
        ],
        "id int, score double, tag string",
    )


def test_all_kinds(spark, fixture):
    suite = [
        {"name": "n", "kind": "row_count_between", "lo": 4, "hi": 4},
        {"name": "nulls", "kind": "null_rate_at_most", "column": "score",
         "threshold": 0.25},
        {"name": "nulls-strict", "kind": "null_rate_at_most",
         "column": "score", "threshold": 0.1},
        {"name": "min", "kind": "min_at_least", "column": "score",
         "threshold": 10.0},
        {"name": "max", "kind": "max_at_most", "column": "score",
         "threshold": 30.0},
        {"name": "mean", "kind": "mean_between", "column": "score",
         "lo": 20.0, "hi": 30.0},
        {"name": "uniq", "kind": "unique", "column": "id"},
        {"name": "enum", "kind": "in_set", "column": "tag",
         "values": ["a", "b"]},
    ]
    out = {r.expectation: r for r in run_expectations(fixture, suite).collect()}
    assert out["n"].ok and out["n"].observed == 4.0
    assert out["nulls"].ok and out["nulls"].observed == 0.25
    assert not out["nulls-strict"].ok
    assert out["min"].ok and out["min"].observed == 10.0
    assert not out["max"].ok and out["max"].observed == 40.0
    # mean over non-null scores = (10+20+40)/3
    assert out["mean"].ok and abs(out["mean"].observed - 70.0 / 3) < 1e-6
    assert not out["uniq"].ok and out["uniq"].observed == 1.0
    assert not out["enum"].ok and out["enum"].observed == 0.25


def test_null_counts_as_out_of_set(spark):
    df = spark.createDataFrame([(1, None)], "id int, tag string")
    out = run_expectations(
        df, [{"kind": "in_set", "column": "tag", "values": ["a"]}]
    ).collect()[0]
    assert not out.ok and out.observed == 1.0


def test_single_scan_plan(spark, fixture):
    """The whole suite compiles to ONE aggregation over ONE scan (the
    design point) — asserted on the plan of the internal agg, distinct-free
    suites stay Expand-free."""
    from datavalidation_spark.engine.expectations import _agg_expr

    suite = [
        {"kind": "row_count_between", "lo": 0, "hi": 10},
        {"kind": "min_at_least", "column": "score", "threshold": 0.0},
        {"kind": "mean_between", "column": "score", "lo": 0, "hi": 100},
        {"kind": "null_rate_at_most", "column": "score", "threshold": 1.0},
    ]
    agg = fixture.agg(*[_agg_expr(s, i) for i, s in enumerate(suite)])
    plan = agg._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("Scan") == 1
    assert "Expand" not in plan


def test_spec_validation(spark, fixture):
    with pytest.raises(ValueError):
        run_expectations(fixture, [])
    with pytest.raises(ValueError):
        run_expectations(fixture, [{"kind": "bogus"}])
    with pytest.raises(ValueError):
        run_expectations(fixture, [{"kind": "min_at_least", "column": "score"}])


def test_unique_ignores_nulls(spark):
    """ADVICE r4: 'unique' follows the GE / SQL UNIQUE convention — NULLs
    are not duplicates of each other. Real duplicates still fail."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "id int"
    )
    out = run_expectations(df, [{"kind": "unique", "column": "id"}]).collect()[0]
    assert out.ok and out.observed == 0.0
    dup = spark.createDataFrame([(1,), (1,), (None,)], "id int")
    out = run_expectations(dup, [{"kind": "unique", "column": "id"}]).collect()[0]
    assert not out.ok and out.observed == 1.0
