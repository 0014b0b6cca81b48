"""Connected-components dedup clustering + deterministic sampling tests.

Cluster oracle = a plain Python union-find over the same edge list; sampling
oracle = recomputing the md5 rank in Python. Both operators must be invariant
to input partitioning (the class of batch-edge bug the reference's chunked
loops had, SURVEY §5.5).
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators.clusters import (
    connected_components,
    dedup_cluster_assignments,
)
from datavalidation_spark.operators.sampling import (
    sample_fraction,
    sample_stratified,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _cc_spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["rep"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_two_components_and_chain(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)]
    got = _cc_spark(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_long_path_converges_logarithmically(spark):
    # a 64-node path is the adversarial case for naive min-propagation
    # (O(n) rounds); alternating star must close it in O(log^2 n) << 25
    edges = [(i, i + 1) for i in range(64)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        expect = _union_find(edges)
        got = _cc_spark(spark, edges)
        assert got == expect


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    got = {r["id"]: r["rep"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_partitioning_invariance(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {r["id"]: r["rep"] for r in connected_components(df).collect()}
    b = {
        r["id"]: r["rep"]
        for r in connected_components(df.repartition(13)).collect()
    }
    assert a == b


def test_cluster_assignments(spark):
    df = spark.createDataFrame(
        [(5, 6), (6, 7), (1, 2)], "id_a long, id_b long"
    )
    rows = {
        r["id"]: r for r in dedup_cluster_assignments(df).collect()
    }
    assert rows[5]["rep"] == 5 and rows[5]["is_keeper"]
    assert rows[6]["rep"] == 5 and not rows[6]["is_keeper"]
    assert rows[7]["cluster_size"] == 3
    assert rows[1]["cluster_size"] == 2 and rows[2]["rep"] == 1


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _py_rank(key, salt=""):
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8], 16)


def test_sample_fraction_matches_python_oracle(spark, sf001):
    docs = sf001["documents"]
    got = {
        r["doc_id"] for r in sample_fraction(docs, 0.25, salt="s").collect()
    }
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expect = {
        i for i in ids if _py_rank(i, "s") < int(0.25 * 4294967296)
    }
    assert got == expect
    # deterministic wrt partitioning
    got2 = {
        r["doc_id"]
        for r in sample_fraction(docs.repartition(11), 0.25, salt="s").collect()
    }
    assert got2 == got


def test_sample_stratified_exact_k_and_determinism(spark, sf001):
    docs = sf001["documents"]
    out = sample_stratified(docs, "lang", 5, salt="x").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    counts = docs.groupBy("lang").count().collect()
    for row in counts:
        assert len(by_lang.get(row["lang"], [])) == min(5, row["count"])
    # the winners are exactly the k smallest hash ranks per stratum
    ids = docs.select("doc_id", "lang").collect()
    for lang, rows in by_lang.items():
        stratum = sorted(
            (_py_rank(r["doc_id"], "x"), r["doc_id"])
            for r in ids
            if r["lang"] == lang
        )[:5]
        assert sorted(r["doc_id"] for r in rows) == sorted(
            i for _, i in stratum
        )
    # partitioning invariance
    out2 = sample_stratified(docs.repartition(17), "lang", 5, salt="x").collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in out2) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in out
    )


def test_sample_stratified_prefilter_preserves_winners(spark, sf001):
    docs = sf001["documents"]
    plain = sample_stratified(docs, "lang", 3, salt="p").collect()
    thin = sample_stratified(
        docs, "lang", 3, salt="p", prefilter=True
    ).collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in plain) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in thin
    )


# ---------------------------------------------------------------------------
# token-budget sampling
# ---------------------------------------------------------------------------


def _tb_naive(rows, budgets, default=0):
    """Serial oracle: per domain, rank order, inclusive prefix <= budget."""
    ranked = sorted(
        rows,
        key=lambda r: (
            int(hashlib.md5(f"budget|{r[0]}".encode()).hexdigest()[:8], 16),
            r[0],
        ),
    )
    cum: dict[str, int] = {}
    kept = {}
    for doc_id, dom, tok in ranked:
        cum[dom] = cum.get(dom, 0) + tok
        if cum[dom] <= budgets.get(dom, default):
            kept[doc_id] = cum[dom]
    return kept


def test_sample_token_budget_matches_naive(spark):
    from datavalidation_spark.operators.sampling import sample_token_budget

    rng = random.Random(7)
    rows = [
        (i, ["a", "b", "c"][i % 3], rng.randint(1, 40)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    got = {
        r.doc_id: r.cum_tokens
        for r in sample_token_budget(
            df,
            {"a": 900, "b": 400},
            default_budget=150,
            n_tokens=F.col("n_tokens"),
            # few buckets → many docs per bucket AND many buckets per
            # domain: both halves of the decomposition carry weight
            n_rank_buckets=16,
        ).collect()
    }
    assert got == _tb_naive(rows, {"a": 900, "b": 400}, default=150)
    assert got, "budgets should keep something"


def test_sample_token_budget_edges(spark):
    from datavalidation_spark.operators.sampling import sample_token_budget

    df = spark.createDataFrame(
        [(i, "x", 10) for i in range(20)], "doc_id long, lang string, n_tokens int"
    )
    # budget 0 → nothing; budget >= total → everything, cum audit correct
    assert (
        sample_token_budget(df, {}, default_budget=0, n_tokens=F.col("n_tokens")).count()
        == 0
    )
    allkept = sample_token_budget(
        df, {"x": 10_000}, n_tokens=F.col("n_tokens")
    ).collect()
    assert len(allkept) == 20
    assert max(r.cum_tokens for r in allkept) == 200


def test_sample_token_budget_null_domain_and_null_tokens(spark):
    """NULL domains fall under default_budget (not silently dropped);
    NULL token counts count as 0 and never poison the running sum."""
    from datavalidation_spark.operators.sampling import sample_token_budget

    df = spark.createDataFrame(
        [(1, None, 10), (2, None, None), (3, "a", 10), (4, None, 10)],
        "doc_id long, lang string, n_tokens int",
    )
    got = {
        r.doc_id: r.cum_tokens
        for r in sample_token_budget(
            df, {"a": 5}, default_budget=100, n_tokens=F.col("n_tokens")
        ).collect()
    }
    # domain 'a' budget 5 < 10 → doc 3 dropped; all NULL-domain rows kept
    # under default 100; doc 2's NULL tokens contribute 0 to the sum
    assert set(got) == {1, 2, 4}
    assert sum(
        10 if i != 2 else 0 for i in (1, 2, 4)
    ) == max(got.values()) == 20


def test_sample_token_budget_bucket_count_validation(spark):
    from datavalidation_spark.operators.sampling import sample_token_budget

    df = spark.createDataFrame(
        [(i, "x", 10) for i in range(30)], "doc_id long, lang string, n_tokens int"
    )
    with pytest.raises(ValueError):
        sample_token_budget(df, {"x": 100}, n_tokens=F.col("n_tokens"),
                            n_rank_buckets=0)
    # non-power-of-two rounds UP (4000 → 4096) and 1 bucket degenerates to
    # the naive cumsum — both must agree with the power-of-two path
    a = sample_token_budget(df, {"x": 150}, n_tokens=F.col("n_tokens"),
                            n_rank_buckets=4000).collect()
    b = sample_token_budget(df, {"x": 150}, n_tokens=F.col("n_tokens"),
                            n_rank_buckets=1).collect()
    c = sample_token_budget(df, {"x": 150}, n_tokens=F.col("n_tokens"),
                            n_rank_buckets=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) == sorted(map(tuple, c))
    assert len(a) == 15


def test_assign_split_total_coverage_and_determinism(spark, sf001):
    from datavalidation_spark.operators.sampling import assign_split, split_bounds

    docs = sf001["documents"]
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(docs, w, key_col="doc_id", salt="s")
    n = docs.count()
    by = {r["split"]: r["n"] for r in
          out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # every row assigned, all three splits non-empty at corpus size
    assert sum(by.values()) == n
    assert set(by) == {"train", "val", "test"}
    assert by["train"] > by["val"] and by["train"] > by["test"]
    # partition-layout invariance: same doc → same split on any layout
    a = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.repartition(13), w, key_col="doc_id", salt="s")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # bounds arithmetic: monotone, ends exactly at 2^32
    bounds = split_bounds(w)
    assert [x[1] for x in bounds] == sorted(x[1] for x in bounds)
    assert bounds[-1][1] == 2**32


def test_assign_split_normalizes_and_rejects_bad_weights(spark):
    from datavalidation_spark.operators.sampling import assign_split, split_bounds

    df = spark.range(100).select(F.col("id").cast("string").alias("doc_id"))
    # weights in arbitrary units normalize to shares
    got = assign_split(df, {"a": 3, "b": 1}, key_col="doc_id")
    counts = {r["split"]: r["n"] for r in
              got.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("a", 0) > counts.get("b", 0)
    with pytest.raises(ValueError):
        split_bounds({})
    with pytest.raises(ValueError):
        split_bounds({"a": 0.0})


def test_token_histogram_counts_and_topk_cut(spark):
    from datavalidation_spark.operators.text import token_histogram

    df = spark.createDataFrame(
        [("a b b c",), ("  B  a ",), ("",), (None,), ("c a",)], "text string"
    )
    full = {r["token"]: r["n"] for r in token_histogram(df).collect()}
    assert full == {"a": 3, "b": 3, "c": 2}
    # top-k ties broken by token asc: k=1 keeps 'a' (a and b tie at 3)
    top1 = token_histogram(df, k=1).collect()
    assert [(r["token"], r["n"]) for r in top1] == [("a", 3)]


def test_assign_split_null_key_gets_last_split(spark):
    from datavalidation_spark.operators.sampling import assign_split

    df = spark.createDataFrame([("a",), (None,)], "doc_id string")
    got = {r["doc_id"]: r["split"] for r in
           assign_split(df, {"train": 0.9, "test": 0.1}, key_col="doc_id").collect()}
    # NULL rank falls through every interval to the otherwise-branch (last
    # split) — total coverage, matching a SQL CASE ... ELSE replay
    assert got[None] == "test"
    assert got["a"] in {"train", "test"}


def test_split_bounds_rejects_negative_weight(spark):
    from datavalidation_spark.operators.sampling import split_bounds

    with pytest.raises(ValueError, match="must be > 0"):
        split_bounds({"a": -0.5, "b": 1.5})
    with pytest.raises(ValueError, match="must be > 0"):
        split_bounds({"a": float("nan"), "b": 1.0})
