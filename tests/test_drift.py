"""Statistical-tier tests: binned KS/PSI scale path vs numpy, per-group
applyInPandas parity path, planted drift/change-point detection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datavalidation_spark.engine.drift import (
    binned_drift,
    binned_mutual_information,
    changepoints_per_group,
    isolation_scores,
    ks_2samp_numpy,
    lof_scores,
    pelt_changepoints,
    run_advanced_checks,
)


def _drifted_frame(seed=42, n=400):
    rng = np.random.default_rng(seed)
    rows = []
    for g in ["A", "B"]:
        for i in range(n):
            split = 0 if i < n // 2 else 1
            # feature f1 drifts in group A's test half; f2 never drifts
            f1 = rng.normal(10 + (5 if (g == "A" and split) else 0), 1)
            f2 = rng.normal(50, 3)
            rows.append(dict(g=g, split=split, i=i, f1=f1, f2=f2))
    return pd.DataFrame(rows)


def test_binned_drift_detects_planted_shift(spark):
    pdf = _drifted_frame()
    df = spark.createDataFrame(pdf)
    res = binned_drift(df, "g", "split", ["f1", "f2"], n_bins=10).collect()
    by = {(r.g, r.feature): r for r in res}
    assert by[("A", "f1")].ks_stat > 0.8          # planted 5σ shift
    assert by[("A", "f1")].psi > 1.0
    assert by[("A", "f1")].ks_pvalue_approx < 0.01
    assert by[("B", "f1")].ks_stat < 0.2          # no shift
    assert by[("A", "f2")].ks_stat < 0.2
    assert by[("B", "f2")].psi < 0.25             # below "moderate drift"
    assert by[("B", "f1")].psi < 0.25


def test_ks_numpy_matches_reference_values():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 300)
    b = rng.normal(0.5, 1, 300)
    d, p = ks_2samp_numpy(a, b)
    assert 0.15 < d < 0.4 and p < 0.01
    d2, p2 = ks_2samp_numpy(a, rng.normal(0, 1, 300))
    assert p2 > 0.05


def test_lof_flags_planted_outlier():
    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (100, 3))
    X[7] = [15, 15, 15]
    s = lof_scores(X, n_neighbors=20)
    assert np.argmax(s) == 7


def test_isolation_scores_flag_planted_outlier():
    """Level-synchronous vectorized iForest: the planted far-out point gets
    the top score, results are deterministic, and inliers score lower."""
    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (200, 3))
    X[13] = [12, -12, 12]
    s = isolation_scores(X)
    assert np.argmax(s) == 13 and s[13] > 0.6
    assert float(np.median(s)) < 0.55
    assert np.array_equal(isolation_scores(X), s)  # seeded → bit-identical
    # degenerate inputs don't crash
    assert len(isolation_scores(np.zeros((0, 2)))) == 0
    assert len(isolation_scores(np.ones((3, 2)))) == 3


def test_changepoints_per_group_distributed(spark):
    """Planted two-step series per group: the distributed PELT operator
    recovers exactly [n//3, (2n)//3] for every group (the construction the
    advanced_changepoint oracle relies on)."""
    rows = []
    for g, n in [("a", 30), ("b", 67), ("c", 133)]:
        p1, p2 = n // 3, (2 * n) // 3
        for i in range(n):
            eid = i * 131 + hash(g) % 977
            val = 10.0 * ((i >= p1) + (i >= p2)) + ((eid * 7) % 5) / 100.0
            rows.append(dict(g=g, ts=i, event_id=eid, value=val))
    df = spark.createDataFrame(pd.DataFrame(rows))
    res = {
        r.group_key: (r.n, list(r.breakpoints))
        for r in changepoints_per_group(df, "g", "value", ["ts", "event_id"]).collect()
    }
    for g, n in [("a", 30), ("b", 67), ("c", 133)]:
        assert res[g] == (n, [n // 3, (2 * n) // 3])


def test_pelt_finds_level_shift():
    y = np.concatenate([np.zeros(50), np.full(50, 5.0)]) + np.random.default_rng(2).normal(0, 0.3, 100)
    bps = pelt_changepoints(y, penalty=1.0)
    assert any(abs(b - 50) <= 2 for b in bps)


def test_binned_mi_orders_dependence():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 500)
    y_dep = 2 * x + rng.normal(0, 0.1, 500)
    y_ind = rng.normal(0, 1, 500)
    assert binned_mutual_information(x, y_dep) > binned_mutual_information(x, y_ind) + 0.5


def test_run_advanced_checks_end_to_end(spark):
    rng = np.random.default_rng(4)
    rows = []
    for v in ["V1", "V2"]:
        dates = pd.date_range("2024-01-01", periods=60)
        for i, d in enumerate(dates):
            drifted = v == "V1" and i >= 30
            rows.append(
                dict(
                    VESSEL_NAME=v,
                    REPORT_DATE=d,
                    ME_CONSUMPTION=float(rng.normal(25 + (10 if drifted else 0), 1)),
                    SPEED=float(rng.normal(13, 1)),
                    DISPLACEMENT=float(rng.normal(50000, 100)),
                    WINDFORCE=float(rng.integers(0, 8)),
                )
            )
    df = spark.createDataFrame(pd.DataFrame(rows))
    res = run_advanced_checks(df).toPandas()
    drift = res[(res.check == "drift") & (res.group_key == "V1") & (res.feature == "ME_CONSUMPTION")]
    assert len(drift) == 1 and bool(drift.flagged.iloc[0])
    no_drift = res[(res.check == "drift") & (res.group_key == "V2") & (res.feature == "ME_CONSUMPTION")]
    assert len(no_drift) == 1 and not bool(no_drift.flagged.iloc[0])
    cp = res[(res.check == "change_point") & (res.group_key == "V1") & (res.feature == "ME_CONSUMPTION")]
    # the shift sits at the train/test boundary → test half is flat; V1's
    # drifted mean is constant within test, so no change point expected there
    assert len(cp) == 1
    assert (res.check == "anomaly").any()
    assert (res.check == "relationship").any()


def test_advanced_checks_deterministic(spark):
    pdf = _drifted_frame()
    pdf["REPORT_DATE"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf["i"], unit="D")
    df = spark.createDataFrame(pdf)
    r1 = run_advanced_checks(df, group_col="g", features=["f1", "f2"]).toPandas()
    r2 = run_advanced_checks(df, group_col="g", features=["f1", "f2"]).toPandas()
    key = ["group_key", "check", "feature"]
    pd.testing.assert_frame_equal(
        r1.sort_values(key).reset_index(drop=True),
        r2.sort_values(key).reset_index(drop=True),
    )
