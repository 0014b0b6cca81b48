"""Schema validation (engine/schema.py): canonical type names, verdict rows,
and the no-job property."""

from __future__ import annotations

from pyspark.sql import types as T

from datavalidation_spark.engine.schema import (
    canonical_type,
    schema_ok,
    schema_violations,
)


def test_canonical_types():
    assert canonical_type(T.LongType()) == "int64"
    assert canonical_type(T.FloatType()) == "float32"
    assert canonical_type(T.ArrayType(T.StringType())) == "list<string>"
    assert canonical_type(T.DecimalType(12, 2)) == "decimal(12,2)"
    assert (
        canonical_type(
            T.StructType([T.StructField("a", T.IntegerType())])
        )
        == "struct<a:int32>"
    )
    assert (
        canonical_type(T.MapType(T.StringType(), T.DoubleType()))
        == "map<string,float64>"
    )


def test_verdicts_planted(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0)], "id long, name string, score double"
    )
    expected = [
        ("id", "int64"),          # OK
        ("name", "int32"),        # TYPE_MISMATCH
        ("missing_col", "bool"),  # MISSING
        # score uncatalogued -> UNEXPECTED
    ]
    out = {r.column: r for r in schema_violations(df, expected).collect()}
    assert out["id"].status == "OK"
    assert out["name"].status == "TYPE_MISMATCH"
    assert (out["name"].expected_type, out["name"].actual_type) == (
        "int32", "string",
    )
    assert out["missing_col"].status == "MISSING"
    assert out["missing_col"].actual_type is None
    assert out["score"].status == "UNEXPECTED"
    assert out["score"].expected_type is None
    assert len(out) == 4


def test_schema_ok(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    assert schema_ok(df, [("id", "int64"), ("name", "string")])
    assert not schema_ok(df, [("id", "int64")])  # unexpected name col
    assert not schema_ok(df, [("id", "int32"), ("name", "string")])


def test_duplicate_catalog_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    try:
        schema_violations(df, [("id", "int64"), ("id", "int64")])
        assert False, "expected ValueError"
    except ValueError:
        pass
