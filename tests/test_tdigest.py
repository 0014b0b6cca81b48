"""t-digest quantile sketch: accuracy vs exact percentiles, merge
consistency, serde, and the distributed partial-aggregation paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators.tdigest import (
    TDigest,
    merge_digest_rows,
    partition_digests,
    tdigest_quantiles,
)


def test_tdigest_rank_accuracy():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, 200_000)
    d = TDigest(100).add(x)
    assert len(d.means) <= 2 * 100  # O(δ) memory
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999):
        est = d.quantile(q)
        rank_err = abs((x <= est).mean() - q)
        assert rank_err < 0.005, (q, rank_err)


def test_tdigest_merge_matches_whole():
    rng = np.random.default_rng(8)
    x = rng.exponential(2.0, 100_000)
    whole = TDigest(100).add(x)
    parts = TDigest(100)
    for chunk in np.array_split(x, 7):
        parts.merge(TDigest(100).add(chunk))
    for q in (0.1, 0.5, 0.9, 0.99):
        rank_err = abs((x <= parts.quantile(q)).mean() - q)
        assert rank_err < 0.005, (q, rank_err)
        assert abs(parts.quantile(q) - whole.quantile(q)) < 0.15


def test_tdigest_serde_and_edges():
    d = TDigest(100).add(np.arange(1000, dtype=float))
    rt = TDigest.from_bytes(d.to_bytes())
    assert rt.quantile(0.5) == d.quantile(0.5)
    assert TDigest().quantile(0.5) is None
    assert TDigest().add(np.array([np.nan, np.nan])).quantile(0.1) is None
    assert TDigest().add(np.array([42.0])).quantile(0.99) == 42.0


@pytest.fixture(scope="module")
def skewed_df(spark):
    return (
        spark.range(100_000)
        .repartition(16)
        .select(
            (F.pow(F.rand(3), 3.0) * 1000).alias("a"),
            (F.randn(4) * 10 + 50).alias("b"),
        )
        .localCheckpoint()
    )


def test_partition_digests_shape(spark, skewed_df):
    digs = partition_digests(skewed_df, ["a", "b"]).collect()
    # one row per (partition, column)
    assert len(digs) == 16 * 2
    assert all(len(bytes(r.digest)) < 8192 for r in digs)  # tiny sketches
    assert sum(r.n for r in digs if r.column == "a") == 100_000


def test_tdigest_quantiles_distributed_accuracy(spark, skewed_df):
    qs = [0.1, 0.5, 0.9, 0.99]
    got = tdigest_quantiles(skewed_df, ["a", "b"], qs)
    pdf = skewed_df.toPandas()
    for c in ("a", "b"):
        vals = pdf[c].to_numpy()
        for q in qs:
            rank_err = abs((vals <= got[c][q]).mean() - q)
            assert rank_err < 0.01, (c, q, rank_err)


def test_merge_digest_rows_fan_in(spark, skewed_df):
    qs = [0.5, 0.99]
    direct = tdigest_quantiles(skewed_df, ["a"], qs)
    fanned = tdigest_quantiles(skewed_df, ["a"], qs, fan_in=4)
    digs = merge_digest_rows(partition_digests(skewed_df, ["a"]), fan_in=4)
    assert digs.count() <= 4
    pdf_a = skewed_df.select("a").toPandas()["a"].to_numpy()
    for q in qs:
        for est in (direct["a"][q], fanned["a"][q]):
            assert abs((pdf_a <= est).mean() - q) < 0.01
