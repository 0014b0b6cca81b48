"""Statistical / drift tier (SURVEY.md §2.8, reference
``validators/advanced_validation.py``).

Two execution paths, mirroring the reference's capabilities:

* **Scale path (pure Column ops)**: two-sample KS statistic and PSI computed
  from *binned* histograms — one groupBy over (group, feature, bucket), no
  Python. This is what runs at 10^12 rows (north_star: "distribution-drift
  via two-sample KS/PSI over windowed histograms").
* **Parity path (grouped pandas UDFs)**: per-group ``applyInPandas`` running
  the reference's exact recipe — temporal median split, mean-impute, robust
  scale, anomaly ensemble (LOF + isolation forest), exact two-sample KS,
  PELT change-point, binned mutual information. scipy/sklearn/ruptures are
  used when importable; otherwise deterministic numpy implementations with
  the same contracts (documented deltas: PELT cost l2 vs rbf; MI binned vs
  kNN-estimated).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Scale path: binned KS + PSI in pure expressions
# ---------------------------------------------------------------------------


def binned_drift(
    df: DataFrame,
    group_col: str,
    split_col: str,
    feature_cols: list[str],
    n_bins: int = 10,
) -> DataFrame:
    """Per (group, feature): KS statistic + PSI between split=0 (train) and
    split=1 (test) from ``n_bins`` uniform bins.

    One pass: per-group per-feature min/max → bucketize → count per
    (group, feature, split, bucket) → cumulative sums → D = max |ΔCDF|,
    PSI = Σ (p−q)·ln(p/q) with ε-smoothing. Two shuffles total regardless of
    feature count (features are unpivoted into rows, not separate jobs).
    """
    # long form: (group, split, feature, value)
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("feature"), F.col(c).cast("double").alias("value"))
            for c in feature_cols
        ]
    )
    long = (
        df.select(group_col, split_col, F.explode(pairs).alias("fv"))
        .select(group_col, split_col, "fv.feature", "fv.value")
        .where(F.col("value").isNotNull() & ~F.isnan("value"))
    )

    bounds = long.groupBy(group_col, "feature").agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    binned = (
        long.join(bounds, [group_col, "feature"])
        .withColumn(
            "bucket",
            F.when(
                F.col("_hi") == F.col("_lo"), F.lit(0)
            ).otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("_lo"))
                        / (F.col("_hi") - F.col("_lo"))
                        * n_bins
                    ).cast("int"),
                    F.lit(n_bins - 1),
                )
            ),
        )
        .groupBy(group_col, "feature", "bucket")
        .agg(
            F.sum(F.when(F.col(split_col) == 0, 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col(split_col) == 1, 1).otherwise(0)).alias("n_test"),
        )
    )
    # per-feature totals + cumulative distribution over buckets — tiny
    # (groups × features × bins rows), computed with a window over bucket
    from pyspark.sql.window import Window

    w_tot = Window.partitionBy(group_col, "feature")
    w_cum = w_tot.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # PSI convention: floor proportions (not additive smoothing — that
    # inflates PSI when many bins are near-empty)
    floor = F.lit(5e-4)
    enriched = (
        binned.withColumn("tot_train", F.sum("n_train").over(w_tot))
        .withColumn("tot_test", F.sum("n_test").over(w_tot))
        .withColumn("cdf_train", F.sum("n_train").over(w_cum) / F.col("tot_train"))
        .withColumn("cdf_test", F.sum("n_test").over(w_cum) / F.col("tot_test"))
        .withColumn("p", F.greatest(F.col("n_train") / F.col("tot_train"), floor))
        .withColumn("q", F.greatest(F.col("n_test") / F.col("tot_test"), floor))
    )
    return enriched.groupBy(group_col, "feature").agg(
        F.max(F.abs(F.col("cdf_train") - F.col("cdf_test"))).alias("ks_stat"),
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.max("tot_train").alias("n_train"),
        F.max("tot_test").alias("n_test"),
    ).withColumn(
        # asymptotic two-sample KS p-value (Smirnov), vectorized Column math:
        # p ≈ 2·exp(−2λ²) first-term bound, λ = D·sqrt(n1·n2/(n1+n2))
        "ks_pvalue_approx",
        F.least(
            F.lit(1.0),
            2.0
            * F.exp(
                -2.0
                * F.pow(
                    F.col("ks_stat")
                    * F.sqrt(
                        F.col("n_train")
                        * F.col("n_test")
                        / (F.col("n_train") + F.col("n_test"))
                    ),
                    2,
                )
            ),
        ),
    )


# ---------------------------------------------------------------------------
# numpy fallbacks for the parity path
# ---------------------------------------------------------------------------


def ks_2samp_numpy(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """Two-sample KS statistic + asymptotic p-value (Kolmogorov series).

    Matches scipy's method='asymp'; scipy (when importable) is preferred in
    ``run_advanced_checks`` for exact parity at small n.
    """
    a = np.sort(a)
    b = np.sort(b)
    n1, n2 = len(a), len(b)
    if n1 == 0 or n2 == 0:
        return 0.0, 1.0
    both = np.concatenate([a, b])
    cdf1 = np.searchsorted(a, both, side="right") / n1
    cdf2 = np.searchsorted(b, both, side="right") / n2
    d = float(np.max(np.abs(cdf1 - cdf2)))
    en = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(en) + 0.12 + 0.11 / math.sqrt(en)) * d
    p = 2.0 * sum((-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam) for k in range(1, 101))
    return d, float(min(max(p, 0.0), 1.0))


def lof_scores(X: np.ndarray, n_neighbors: int = 20, chunk: int = 1024) -> np.ndarray:
    """Local Outlier Factor (brute-force kNN, chunked). Higher = more
    outlying. Mirrors sklearn's definition (reachability-distance based).

    Distances are computed ``chunk`` query rows at a time so peak memory is
    O(chunk·n), never the n×n matrix — a 100k-row group costs ~800 MB per
    slice instead of 80 GB (VERDICT r1 "what's wrong" #5)."""
    n = len(X)
    k = min(n_neighbors, n - 1)
    if k < 1:
        return np.ones(n)
    sq = (X**2).sum(axis=1)
    knn_idx = np.empty((n, k), dtype=np.int64)
    knn_dist = np.empty((n, k), dtype=np.float64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = sq[s:e, None] + sq[None, :] - 2.0 * (X[s:e] @ X.T)
        np.maximum(d2, 0.0, out=d2)
        d = np.sqrt(d2)
        d[np.arange(s, e) - s, np.arange(s, e)] = np.inf  # self
        idx = np.argpartition(d, k - 1, axis=1)[:, :k]
        part = d[np.arange(e - s)[:, None], idx]
        order = np.argsort(part, axis=1, kind="stable")
        knn_idx[s:e] = idx[np.arange(e - s)[:, None], order]
        knn_dist[s:e] = part[np.arange(e - s)[:, None], order]
    kdist = knn_dist[:, -1]  # distance to k-th NN
    reach = np.maximum(knn_dist, kdist[knn_idx])
    lrd = 1.0 / (reach.mean(axis=1) + 1e-12)
    return lrd[knn_idx].mean(axis=1) / (lrd + 1e-12)


def _c_factor(sz: np.ndarray) -> np.ndarray:
    """Average unsuccessful-BST path length c(n), vectorized; 0 for n ≤ 1."""
    sz = np.asarray(sz, dtype=float)
    out = np.zeros_like(sz)
    ok = sz > 1
    s = sz[ok]
    out[ok] = 2.0 * (np.log(s - 1) + 0.5772156649) - 2.0 * (s - 1) / s
    return out


_IFOREST_DRAW_CACHE: dict[tuple, tuple] = {}


def _iforest_draws(
    seed: int, n: int, m: int, n_trees: int, sub: int, limit: int
) -> tuple[np.ndarray, list[np.ndarray], list[np.ndarray]]:
    """(samp, per-level feats, per-level split fractions) for
    :func:`isolation_scores` — the exact draw sequence the inline code
    consumed, memoized on the shape key so same-shaped groups share it.
    Bounded: one entry is O(n_trees·2^limit·limit) ≈ a few MB; keep 8."""
    key = (seed, n, m, n_trees, sub, limit)
    hit = _IFOREST_DRAW_CACHE.get(key)
    if hit is not None:
        return hit
    rng = np.random.default_rng(seed)
    samp = np.stack([rng.choice(n, sub, replace=False) for _ in range(n_trees)])
    K = 1 << (limit + 1)
    feats: list[np.ndarray] = []
    us: list[np.ndarray] = []
    for _ in range(limit + 1):
        feats.append(rng.integers(0, m, size=n_trees * K))
        us.append(rng.random(n_trees * K))
    if len(_IFOREST_DRAW_CACHE) >= 8:
        _IFOREST_DRAW_CACHE.clear()
    _IFOREST_DRAW_CACHE[key] = (samp, feats, us)
    return samp, feats, us


def isolation_scores(
    X: np.ndarray, n_trees: int = 100, max_samples: int = 256, seed: int = 42
) -> np.ndarray:
    """Isolation-forest anomaly score in numpy (deterministic, seeded).

    Standard iForest semantics: per tree, random axis-parallel splits over a
    subsample; every point gets the path length of the node it lands in;
    score = 2^(−E[h]/c(sub)). Higher = more anomalous. Used when sklearn is
    unavailable.

    Level-synchronous and vectorized across ALL trees at once: per depth
    level, node statistics (sample count, per-node min/max of the split
    feature) come from ``np.bincount`` / ``np.{minimum,maximum}.at`` over
    (tree, node) keys, and every point advances one level in one vectorized
    step. ~``limit`` (≈8) numpy passes total, replacing the per-node Python
    stack walk that made this the single most expensive operator in round 2
    (VERDICT r2 what's-wrong #2: 39.5 s at sf0.1, ~98% here).
    """
    n, m = X.shape
    sub = min(max_samples, n)
    if n == 0:
        return np.zeros(0)
    limit = int(np.ceil(np.log2(max(sub, 2))))
    T = n_trees
    K = 1 << (limit + 1)  # heap-node id bound per tree

    # Every random draw below is a fixed-size function of (seed, n, m, T,
    # sub, limit) — independent of the DATA — so the whole stream (subsample
    # indices + per-level feature picks and split fractions) is cached and
    # shared across groups of the same shape (r6). A 15k-group corpus has a
    # few dozen distinct group sizes; regenerating ~2M PCG draws per group
    # was ~60% of the ensemble's per-group cost. Values are bit-identical
    # to drawing inline: same generator, same call sequence, level draws
    # are prefixes the early-converged run simply leaves unused.
    samp, feats, us = _iforest_draws(seed, n, m, T, sub, limit)
    tree_pt = np.repeat(np.arange(T), n)          # flattened (T, n)
    pt = np.tile(np.arange(n), T)
    node_pt = np.zeros(T * n, dtype=np.int64)
    act_pt = np.ones(T * n, dtype=bool)
    tree_sm = np.repeat(np.arange(T), sub)
    sm_x = samp.reshape(-1)                       # data index of each sample entry
    node_sm = np.zeros(T * sub, dtype=np.int64)
    act_sm = np.ones(T * sub, dtype=bool)
    depths = np.zeros(n)

    for d in range(limit + 1):
        if not act_pt.any():
            break
        k_sm = tree_sm[act_sm] * K + node_sm[act_sm]
        counts = np.bincount(k_sm, minlength=T * K)
        k_pt = tree_pt[act_pt] * K + node_pt[act_pt]
        # one rng draw per possible (tree, node) key keeps the stream
        # deterministic regardless of which nodes are live
        feat = feats[d]
        u = us[d]
        lo = np.full(T * K, np.inf)
        hi = np.full(T * K, -np.inf)
        vals_sm = X[sm_x[act_sm], feat[k_sm]]
        np.minimum.at(lo, k_sm, vals_sm)
        np.maximum.at(hi, k_sm, vals_sm)
        terminal = (counts <= 1) | (lo == hi) | (d == limit)
        # settle points whose node is terminal at this level
        t_mask = terminal[k_pt]
        settled = pt[act_pt][t_mask]
        np.add.at(depths, settled, d + _c_factor(counts[k_pt][t_mask]))
        # advance the rest one level: left = 2i+1, right = 2i+2
        # (empty nodes have lo=+inf/hi=−inf → NaN split; they are terminal
        # and never dereferenced)
        with np.errstate(invalid="ignore"):
            split = lo + u * (hi - lo)
        go_pt = np.where(act_pt)[0][~t_mask]
        side_pt = (X[pt[go_pt], feat[k_pt][~t_mask]] >= split[k_pt][~t_mask]).astype(np.int64)
        node_pt[go_pt] = 2 * node_pt[go_pt] + 1 + side_pt
        act_pt[np.where(act_pt)[0][t_mask]] = False
        sm_term = terminal[k_sm]
        go_sm = np.where(act_sm)[0][~sm_term]
        side_sm = (X[sm_x[go_sm], feat[k_sm][~sm_term]] >= split[k_sm][~sm_term]).astype(np.int64)
        node_sm[go_sm] = 2 * node_sm[go_sm] + 1 + side_sm
        act_sm[np.where(act_sm)[0][sm_term]] = False

    avg_depth = depths / T
    c_sub = float(_c_factor(np.array([sub]))[0])
    return 2.0 ** (-avg_depth / (c_sub + 1e-12))


def pelt_changepoints(y: np.ndarray, penalty: float = 1.0, min_size: int = 2) -> list[int]:
    """PELT with piecewise-constant L2 cost (O(n²) worst case, linear with
    pruning — fine per group). The reference uses ruptures' rbf model
    (``advanced_validation.py:99-108``); ruptures is preferred when
    importable, this is the numpy fallback (model delta documented)."""
    n = len(y)
    if n < 2 * min_size:
        return []
    y = np.asarray(y, dtype=float)
    cs = np.concatenate([[0.0], np.cumsum(y)])
    cs2 = np.concatenate([[0.0], np.cumsum(y * y)])

    fcost = np.full(n + 1, np.inf)
    fcost[0] = -penalty
    last = np.zeros(n + 1, dtype=int)
    cands = np.array([0], dtype=np.int64)
    for t in range(min_size, n + 1):
        # vectorized segment costs for every candidate start at once
        # (the per-candidate python loop was the sf0.1 hot spot: O(n²)
        # python calls → O(n) numpy sweeps)
        ok = cands[t - cands >= min_size]
        if len(ok) == 0:
            continue
        seg_cost = cs2[t] - cs2[ok] - (cs[t] - cs[ok]) ** 2 / (t - ok)
        totals = fcost[ok] + seg_cost + penalty
        i = int(np.argmin(totals))
        fcost[t] = totals[i]
        last[t] = ok[i]
        all_cost = cs2[t] - cs2[cands] - (cs[t] - cs[cands]) ** 2 / (t - cands)
        keep = cands[fcost[cands] + all_cost <= fcost[t]]
        cands = np.unique(np.append(keep, t - min_size + 1))
        cands = cands[cands <= t]
    bps = []
    t = n
    while t > 0:
        s = last[t]
        if s == 0:
            break
        bps.append(s)
        t = s
    return sorted(bps)


def binned_mutual_information(x: np.ndarray, y: np.ndarray, bins: int = 10) -> float:
    """MI between x and uniformly-binned y (reference: KBinsDiscretizer(10,
    'uniform') + mutual_info_regression, ``advanced_validation.py:177-200``;
    fallback estimator is histogram-based).

    Binning is the explicit engine-portable formula
    ``min(floor((v−lo)/(hi−lo)·bins), bins−1)`` rather than
    ``np.histogram2d`` — identical IEEE expression order to the DuckDB
    oracle's SQL, so the 2-D histogram (and hence the MI) is reproducible
    bit-for-bit cross-engine (np.histogram2d places edges via linspace,
    which can differ by 1 ulp at bin boundaries)."""
    ok = ~(np.isnan(x) | np.isnan(y))
    x, y = x[ok], y[ok]
    if len(x) < 4:
        return 0.0

    def dig(v: np.ndarray) -> np.ndarray:
        lo, hi = v.min(), v.max()
        if hi == lo:
            return np.zeros(len(v), dtype=np.int64)
        b = np.floor((v - lo) / (hi - lo) * bins).astype(np.int64)
        return np.minimum(b, bins - 1)

    joint = np.zeros((bins, bins))
    np.add.at(joint, (dig(x), dig(y)), 1.0)
    p = joint / joint.sum()
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    nz = p > 0
    return float((p[nz] * np.log(p[nz] / (px @ py)[nz])).sum())


# ---------------------------------------------------------------------------
# Parity path: per-group applyInPandas
# ---------------------------------------------------------------------------

ADVANCED_RESULT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("check", StringType()),      # anomaly | drift | change_point | relationship
        StructField("feature", StringType()),
        StructField("ts", StringType()),          # ISO date of the finding (if any)
        StructField("value", DoubleType()),       # p-value / MI / score
        StructField("flagged", BooleanType()),
        StructField("indices", ArrayType(IntegerType())),
    ]
)

DEFAULT_FEATURES = ["ME_CONSUMPTION", "SPEED", "DISPLACEMENT", "WINDFORCE"]


def advanced_checks_fn(
    group_col: str,
    ts_col: str,
    features: list[str],
    drift_p: float = 0.05,
    contamination: float = 0.1,
    seed: int = 42,
    order_cols: list[str] | None = None,
    prefer_scipy: bool = True,
    prefer_sklearn: bool = True,
    anomaly_max_rows: int = 4096,
    checks: frozenset[str] | set[str] = frozenset(
        {"anomaly", "drift", "change_point", "relationship"}
    ),
):
    """Build the grouped-map function reproducing EP3
    (``advanced_validation.py:25-123``): temporal median split → train/test
    preprocess (no leakage) → anomaly ensemble on test → KS drift
    train-vs-test → change points on test → MI on train.

    ``order_cols`` makes the temporal split deterministic under timestamp
    ties (Spark hands groups in arbitrary row order; a plain sort on ts is
    not a total order). ``prefer_scipy=False`` pins the numpy KS p-value
    (Kolmogorov series) so the result is engine-portable for oracle checks
    regardless of what libs the cluster image carries.
    ``anomaly_max_rows`` caps the O(n²) LOF / iForest ensemble input with a
    deterministic evenly-spaced subsample — the drift/changepoint/MI checks
    still see the full group (they are linear), so only the anomaly check
    degrades gracefully on pathologically large groups. ``checks`` selects
    which check families run (a drift-only caller skips the expensive
    ensemble entirely).

    ``prefer_sklearn`` uses sklearn's LocalOutlierFactor / IsolationForest
    for the ensemble when importable (reference parity,
    ``advanced_validation.py:125-148``); this container does not ship
    sklearn, so the deterministic numpy implementations are the tested
    default — the flag matters on production images. Divergence bound
    (tests/test_sklearn_parity.py, opt-in where sklearn exists): both
    implementations must FLAG planted extremes ≥10 IQR out and rank them
    top-1; raw scores and near-boundary flags (±1 neighbor of the
    contamination quantile) may differ — callers needing bit-stable output
    across images pass ``prefer_sklearn=False``, as the hard-oracled
    ``q_advanced_anomaly`` does; ``q_advanced_anomaly_recall`` leaves the
    preference on and gates detection quality on whichever implementation
    the image provides."""

    if prefer_scipy:
        try:  # exact-parity lib when present
            from scipy.stats import ks_2samp as _scipy_ks  # type: ignore
        except ImportError:
            _scipy_ks = None
    else:
        _scipy_ks = None
    _skl_lof = _skl_iso = _rpt = None
    if prefer_sklearn:
        try:  # reference-parity libs when present (not in this container)
            from sklearn.ensemble import IsolationForest as _skl_iso  # type: ignore
            from sklearn.neighbors import LocalOutlierFactor as _skl_lof  # type: ignore
        except ImportError:
            _skl_lof = _skl_iso = None
        try:  # reference's change-point lib (Pelt model='rbf'); fallback: l2
            import ruptures as _rpt  # type: ignore
        except ImportError:
            _rpt = None
    sort_cols = list(order_cols) if order_cols else [ts_col]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[group_col].iloc[0])
        out: list[dict] = []
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        feats = [f for f in features if f in pdf.columns]
        if len(pdf) < 8 or not feats:
            return pd.DataFrame(columns=[f.name for f in ADVANCED_RESULT_SCHEMA.fields])

        mid = len(pdf) // 2
        train, test = pdf.iloc[:mid].copy(), pdf.iloc[mid:].copy()
        for part in (train, test):  # mean-impute per split (no leakage, M1/M2)
            for f_ in feats:
                part[f_] = part[f_].fillna(part[f_].mean())

        # robust scale on train stats (median/IQR — M1)
        med = train[feats].median()
        iqr = (train[feats].quantile(0.75) - train[feats].quantile(0.25)).replace(0, 1.0)
        Xtr = ((train[feats] - med) / iqr).to_numpy(dtype=float)
        Xte = ((test[feats] - med) / iqr).to_numpy(dtype=float)
        Xte = np.nan_to_num(Xte)
        Xtr = np.nan_to_num(Xtr)

        # M3: anomaly ensemble (LOF ∪ isolation forest) on test
        if "anomaly" in checks and len(Xte) > 3:
            if len(Xte) > anomaly_max_rows:  # deterministic evenly-spaced cap
                sel = np.linspace(0, len(Xte) - 1, anomaly_max_rows).astype(int)
            else:
                sel = np.arange(len(Xte))
            Xa = Xte[sel]
            if _skl_lof is not None and _skl_iso is not None and len(Xa) > 20:
                # reference-exact ensemble (advanced_validation.py:125-148)
                lof_flag = (
                    _skl_lof(n_neighbors=20, contamination=contamination)
                    .fit_predict(Xa) == -1
                )
                iso_flag = (
                    _skl_iso(contamination=contamination, random_state=seed)
                    .fit_predict(Xa) == -1
                )
            else:
                lof = lof_scores(Xa, n_neighbors=min(20, len(Xa) - 1))
                iso = isolation_scores(Xa, seed=seed)
                k = max(1, int(len(Xa) * contamination))
                lof_flag = lof >= np.partition(lof, -k)[-k]
                iso_flag = iso >= np.partition(iso, -k)[-k]
            flags = lof_flag | iso_flag
            idxs = [int(sel[i]) for i in np.where(flags)[0]]
            out.append(
                dict(
                    group_key=key, check="anomaly", feature=",".join(feats),
                    ts=str(test[ts_col].iloc[-1]), value=float(flags.sum()),
                    flagged=bool(flags.any()), indices=idxs,
                )
            )

        # M4: per-feature two-sample KS drift
        for f_ in feats if "drift" in checks else []:
            a = train[f_].dropna().to_numpy(dtype=float)
            b = test[f_].dropna().to_numpy(dtype=float)
            if len(a) < 3 or len(b) < 3:
                continue
            if _scipy_ks is not None:
                stat, p = _scipy_ks(a, b)
            else:
                stat, p = ks_2samp_numpy(a, b)
            out.append(
                dict(
                    group_key=key, check="drift", feature=f_,
                    ts=str(test[ts_col].iloc[-1]), value=float(p),
                    flagged=bool(p < drift_p), indices=[],
                )
            )

        # M5: change points on test (first 3 features, as the reference)
        for f_ in feats[:3] if "change_point" in checks else []:
            series = test[f_].to_numpy(dtype=float)
            if _rpt is not None and len(series) >= 4:
                # reference-exact: ruptures Pelt rbf, pen=1
                # (advanced_validation.py:99-108); predict() emits 1-based
                # segment ENDS incl. n — drop the trailing n to keep the
                # same "interior boundaries" meaning as the l2 fallback
                bps = _rpt.Pelt(model="rbf").fit(series).predict(pen=1.0)[:-1]
            else:
                bps = pelt_changepoints(series, penalty=1.0)
            out.append(
                dict(
                    group_key=key, check="change_point", feature=f_,
                    ts=str(test[ts_col].iloc[-1]), value=float(len(bps)),
                    flagged=bool(bps), indices=[int(b) for b in bps],
                )
            )

        # M6: mutual information of predictors vs first feature, on train
        target = feats[0]
        for f_ in feats[1:4] if "relationship" in checks else []:
            mi = binned_mutual_information(
                train[f_].to_numpy(dtype=float), train[target].to_numpy(dtype=float)
            )
            out.append(
                dict(
                    group_key=key, check="relationship", feature=f_,
                    ts=None, value=float(mi), flagged=False, indices=[],
                )
            )
        return pd.DataFrame(out, columns=[f.name for f in ADVANCED_RESULT_SCHEMA.fields])

    return fn


def run_advanced_checks(
    df: DataFrame,
    group_col: str = "VESSEL_NAME",
    ts_col: str = "REPORT_DATE",
    features: list[str] | None = None,
    n_partitions: int | None = None,
    **kw,
) -> DataFrame:
    """EP3 as ONE distributed job: single scan + groupBy().applyInPandas —
    the reference issues one SQL query per vessel (S7) and loops.

    The input is explicitly hash-repartitioned on ``group_col`` first:
    HashPartitioning(group, N) satisfies the grouped-map's required
    distribution, so no second exchange is added — and because the
    partition count is user-specified, AQE's size-based coalescing leaves
    it alone. Without this, AQE sees a few MB of shuffle bytes and
    coalesces the Python-worker stage down to 1-2 tasks, serializing a
    CPU-bound (not byte-bound) stage — measured 2 tasks on local[8] at
    sf0.1, the main reason advanced checks cost 39.5 s in round 2."""
    feats = features or DEFAULT_FEATURES
    fn = advanced_checks_fn(group_col, ts_col, feats, **kw)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Same many-small-groups shape as changepoints_per_group below (r6):
    # grouped-map applyInPandas pays per-GROUP Arrow/schema overhead, which
    # at 10^4+ groups of ~10^2 rows dominates the actual per-group numpy
    # work. Repartition on (group, lit(0)) — user-specified, so AQE never
    # coalesces the CPU-bound stage, and textually distinct from any
    # upstream hash partitioning so Catalyst cannot elide it — then ONE
    # mapInPandas per partition with a pandas groupby inside; fn still
    # sorts each group internally, so no partition-level sort is needed.
    # Only the columns the check function reads cross the Python boundary
    # (guide §4.1).
    order_cols = kw.get("order_cols") or [ts_col]
    needed = list(dict.fromkeys([group_col, ts_col, *order_cols, *feats]))
    part = df.select(*needed).repartition(n, F.col(group_col), F.lit(0))

    def gen(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        outs = []
        # visit groups in size order: the iforest draw cache (above) is
        # keyed on group shape, so same-sized groups arriving consecutively
        # share one generated stream instead of thrashing the 8-entry cache
        groups = sorted(
            pdf.groupby(group_col, sort=False, dropna=False),
            key=lambda kv: len(kv[1]),
        )
        for _, g in groups:
            r = fn(g.reset_index(drop=True))
            if len(r):
                outs.append(r)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return part.mapInPandas(gen, ADVANCED_RESULT_SCHEMA)


CHANGEPOINT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("n", IntegerType()),
        StructField("breakpoints", ArrayType(IntegerType())),
    ]
)


def changepoints_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str],
    penalty: float = 1.0,
    min_size: int = 2,
    n_partitions: int | None = None,
) -> DataFrame:
    """PELT change-point detection per group over the full ordered series
    (M5 as a standalone distributed operator — ``run_advanced_checks`` runs
    it on the test half only). One row per group: (group_key, n,
    breakpoints = sorted segment-start indices, 0-based, root excluded).

    Many-small-groups shape (10³+ groups of ~10² rows): grouped-map
    ``applyInPandas`` pays per-GROUP Arrow/schema overhead (~3 ms/group —
    measured 4.4 s for 1,500 groups whose actual PELT work is 0.45 s).
    Instead: explicit hash-repartition on the group key (also defeats AQE
    size-based coalescing of the CPU-bound stage) + sortWithinPartitions so
    groups arrive contiguous and pre-ordered, then ONE ``mapInPandas`` per
    partition with a pandas groupby inside — per-group overhead becomes a
    dict lookup. Partition contents are concatenated in memory; bounded by
    Spark's partition sizing, same envelope as any grouped-map."""

    def gen(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        rows = []
        # partition is sorted by (group, *order_cols): groups are contiguous
        # and each group's rows are already in series order
        for key, g in pdf.groupby(group_col, sort=False):
            y = g[value_col].to_numpy(dtype=float)
            bps = pelt_changepoints(y, penalty=penalty, min_size=min_size)
            rows.append((str(key), len(y), [int(b) for b in bps]))
        yield pd.DataFrame(rows, columns=["group_key", "n", "breakpoints"])

    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Repartition on (group, lit(0)), not (group): when the input is already
    # hash-partitioned on the group key (e.g. it came out of a window over
    # the same key), Catalyst ELIDES a plain repartition(n, group) as
    # redundant — leaving only the upstream ENSURE_REQUIREMENTS exchange,
    # which AQE's size-based coalescing happily folds to 1 task, serializing
    # this CPU-bound stage (measured: all 1,500 sf0.1 groups in one task,
    # 5 s of serial PELT). The extra literal key makes the partitioning
    # expression distinct (so the user-specified, never-coalesced exchange
    # survives) while still co-locating every row of a group.
    part = df.repartition(n, F.col(group_col), F.lit(0)).sortWithinPartitions(
        group_col, *order_cols
    )
    return part.select(group_col, *order_cols, value_col).mapInPandas(
        gen, CHANGEPOINT_SCHEMA
    )
