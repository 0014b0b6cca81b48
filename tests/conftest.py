from __future__ import annotations

import pytest

from datavalidation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("datavalidation-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf001(spark):
    """sf0.001 testdata tables dict."""
    base = "/root/testdata/sf0.001"
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{base}/{n}.parquet") for n in names}
