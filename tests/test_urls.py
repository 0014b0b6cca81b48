"""URL/domain operators: host parsing, registered-domain heuristic, and the
deterministic per-domain cap (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.operators.urls import (
    domain_cap,
    registered_domain,
    strip_www,
    url_host,
)


def test_host_and_registered_domain(spark):
    cases = [
        ("https://www.Example.COM/path?q=1#f", "example.com"),
        ("http://sub.shop.example.co.uk/x", "example.co.uk"),   # 2nd-level suffix
        ("https://cdn.media.net:8443/obj/1", "media.net"),
        ("ftp://files.archive.org/a", "archive.org"),
        ("https://localhost/x", "localhost"),                   # single label
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["d"]
        for r in df.select(
            registered_domain(strip_www(url_host(F.col("url")))).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_strip_www_only_leading_label(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("wwwx.example.com",), ("a.www.example.com",)],
        "h string",
    )
    got = [r["s"] for r in df.select(strip_www(F.col("h")).alias("s")).collect()]
    assert got == ["example.com", "wwwx.example.com", "a.www.example.com"]


def test_domain_cap_binds_and_is_partition_invariant(spark):
    rows = [
        (i, f"https://www.site{i % 3}.example{i % 3}.com/p/{i}") for i in range(60)
    ] + [(100 + i, "no scheme here") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_cap(df, "url", 7, key_col="doc_id", salt="t")
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r["domain"], []).append(r)
    # three real domains capped at 7; unparseable rows all kept under NULL
    # with a NULL rank (they bypass the rank shuffle entirely)
    for d, rs in by_dom.items():
        if d is None:
            assert len(rs) == 4
            assert all(r["domain_rank"] is None for r in rs)
        else:
            assert len(rs) == 7
            assert sorted(r["domain_rank"] for r in rs) == list(range(1, 8))
    # deterministic wrt partitioning
    again = domain_cap(df.repartition(13), "url", 7, key_col="doc_id", salt="t")
    assert sorted((r["doc_id"], r["domain_rank"]) for r in again.collect()) == sorted(
        (r["doc_id"], r["domain_rank"]) for r in out.collect()
    )
