"""Opt-in parity for the sklearn-preferred anomaly path (VERDICT r4 #7).

This container ships no sklearn, so the deterministic numpy LOF/iForest is
the tested default; ``prefer_sklearn=True`` (the default on production
images that carry sklearn) switches ``advanced_checks_fn`` to
LocalOutlierFactor / IsolationForest. These tests run ONLY where sklearn is
importable — a CI image with sklearn installed exercises the branch and
asserts the contract both implementations must share:

* DETECTION agreement, not score equality: sklearn's LOF uses the same
  reachability definition but different tie-breaking, and its iForest is a
  different RNG stream — raw scores are expected to diverge. What must
  agree is the flag DECISION on signal that clears the contamination
  quantile by a wide margin (the planted-outlier shape the recall gate
  uses: 500+ vs a 0–9.9 base, >50x the IQR).
* The driver-facing ``q_advanced_anomaly`` surface pins
  ``prefer_sklearn=False`` (its oracle is a frozen numpy fixture), so gate
  greenness is image-independent; ``q_advanced_anomaly_recall`` leaves the
  sklearn preference on and gates detection quality on whichever
  implementation the image provides.

Documented divergence bound (applies where sklearn IS present): on planted
extremes ≥10 IQR from the median, both ensembles flag the planted index
(asserted here); within ±1 neighbor-count of the contamination boundary,
flag sets may differ — callers needing bit-stable output across images must
pass ``prefer_sklearn=False`` as the contract queries do.
"""

from __future__ import annotations

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")


def _planted(n: int = 200, seed: int = 7) -> tuple[np.ndarray, int]:
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 9.9, size=(n, 1))
    planted = n - 1
    x[planted] = 500.0
    return x, planted


def test_numpy_and_sklearn_lof_agree_on_planted_outlier():
    from sklearn.neighbors import LocalOutlierFactor

    from datavalidation_spark.engine.drift import lof_scores

    x, planted = _planted()
    ours = lof_scores(x)
    skl = -LocalOutlierFactor(n_neighbors=20).fit(x).negative_outlier_factor_
    # both must rank the planted extreme at the very top
    assert int(np.argmax(ours)) == planted
    assert int(np.argmax(skl)) == planted
    # and the decision at the 10% contamination quantile must agree on it
    assert ours[planted] >= np.quantile(ours, 0.9)
    assert skl[planted] >= np.quantile(skl, 0.9)


def test_numpy_and_sklearn_iforest_agree_on_planted_outlier():
    from sklearn.ensemble import IsolationForest

    from datavalidation_spark.engine.drift import isolation_scores

    x, planted = _planted()
    ours = isolation_scores(x)
    clf = IsolationForest(random_state=42).fit(x)
    skl = -clf.score_samples(x)  # higher = more anomalous, like ours
    assert int(np.argmax(ours)) == planted
    assert int(np.argmax(skl)) == planted
    assert ours[planted] >= np.quantile(ours, 0.9)
    assert skl[planted] >= np.quantile(skl, 0.9)


def test_ensemble_paths_flag_planted_row_identically(spark):
    """End-to-end: the grouped ensemble must flag the planted last-row
    outlier under BOTH prefer_sklearn settings (the recall-gate contract)."""
    import pandas as pd

    from datavalidation_spark.engine.drift import run_advanced_checks

    rows = []
    for g in range(4):
        for i in range(60):
            feat = 500.0 + g if i == 59 else (i * 7 % 100) / 10.0
            rows.append((str(g), i, feat))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "ts", "feat"])
    )
    for prefer in (False, True):
        res = run_advanced_checks(
            df,
            group_col="g",
            ts_col="ts",
            features=["feat"],
            order_cols=["ts"],
            prefer_scipy=False,
            prefer_sklearn=prefer,
            checks={"anomaly"},
        ).collect()
        by_key = {r.group_key: r for r in res}
        for g in range(4):
            r = by_key[str(g)]
            # test half = rows 30..59; planted row 59 → index 29
            assert 29 in list(r.indices), (prefer, g, r.indices)
