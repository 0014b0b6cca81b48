"""FD / CFD constraint checks (engine/constraints.py) on hand-built
micro-fixtures with known pass/fail rows — the reference-style test shape
(SURVEY §5: planted expectations, exact assertions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.engine.constraints import fd_holds, fd_violations


def _fixture(spark):
    rows = [
        # key 1: consistent (3 rows, 1 variant)
        (1, "a", "x"), (1, "a", "y"), (1, "a", "x"),
        # key 2: violated (2 variants: b, B)
        (2, "b", "x"), (2, "B", "x"),
        # key 3: NULL vs non-NULL rhs IS a violation (2 variants)
        (3, "c", "x"), (3, None, "x"),
        # NULL lhs: excluded entirely, even though values differ
        (None, "d", "x"), (None, "e", "x"),
        # key 4: violated only outside the cond='x' subset
        (4, "f", "x"), (4, "g", "y"),
    ]
    return spark.createDataFrame(rows, "k int, v string, cond string")


def test_fd_violations_planted(spark):
    df = _fixture(spark)
    out = fd_violations(df, ["k"], ["v"]).orderBy("k").collect()
    assert [(r.k, r.n_rows, r.n_variants) for r in out] == [
        (2, 2, 2),
        (3, 2, 2),
        (4, 2, 2),
    ]
    r2 = out[0]
    assert (r2.min_v, r2.max_v) == ("B", "b")
    # NULL rhs participates as a variant but never wins min/max
    r3 = out[1]
    assert (r3.min_v, r3.max_v) == ("c", "c")


def test_cfd_condition_restricts_scope(spark):
    df = _fixture(spark)
    out = fd_violations(
        df, ["k"], ["v"], condition=F.col("cond") == "x"
    ).orderBy("k").collect()
    # key 4's conflict lives in cond='y'; inside cond='x' only keys 2, 3 fail
    assert [r.k for r in out] == [2, 3]


def test_fd_holds(spark):
    clean = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    assert fd_holds(clean, ["k"], ["v"])
    assert not fd_holds(_fixture(spark), ["k"], ["v"])


def test_multi_column_lhs_rhs(spark):
    rows = [
        (1, 10, "a", "p"),
        (1, 10, "a", "p"),
        (1, 11, "a", "p"),   # different lhs tuple — no conflict
        (2, 20, "a", "p"),
        (2, 20, "a", "q"),   # rhs tuple differs in second col only
    ]
    df = spark.createDataFrame(rows, "k1 int, k2 int, v1 string, v2 string")
    out = fd_violations(df, ["k1", "k2"], ["v1", "v2"]).collect()
    assert [(r.k1, r.k2, r.n_rows, r.n_variants) for r in out] == [(2, 20, 2, 2)]
    assert (out[0].min_v2, out[0].max_v2) == ("p", "q")


def test_fd_plan_shape(spark):
    """Scale contract: the FD check must plan as two hash aggregations with
    NO Expand (the countDistinct rewrite's row-multiplication) and no
    per-key distinct collection — that is the whole point of the
    groupBy(lhs+rhs)-then-groupBy(lhs) formulation."""
    df = _fixture(spark)
    plan = (
        fd_violations(df, ["k"], ["v"])
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "Expand" not in plan
    # two phases x (partial + final); string min/max buffers are variable
    # length so phase 2 may legitimately plan as SortAggregate — what
    # matters is two-phase (map-side combined) aggregation, not the
    # physical operator family
    import re

    assert len(re.findall(r"(?:Hash|Sort|ObjectHash)Aggregate", plan)) >= 4
    assert "partial_count" in plan  # map-side combine on phase 1


def test_empty_args_rejected(spark):
    df = _fixture(spark)
    for lhs, rhs in ([], ["v"]), (["k"], []):
        try:
            fd_violations(df, lhs, rhs)
            assert False, "expected ValueError"
        except ValueError:
            pass
