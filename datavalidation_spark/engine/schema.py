"""Schema validation — the north_star's "schema + constraint validation"
first half, explicit.

The reference assumes its Postgres tables have the right columns and crashes
on KeyError when they don't (`streamlit_app.py:84-105` indexes rows by name
with no guard); a validation engine for third-party Iceberg tables must make
schema conformance a CHECK, not an assumption. ``schema_violations`` compares
a DataFrame's actual schema against an expected column catalog and emits one
verdict row per column: OK / TYPE_MISMATCH / MISSING / UNEXPECTED.

Pure metadata — no job is launched; the result is a tiny local DataFrame.
At 100 TB that matters: schema checks gate the run BEFORE any scan is paid,
and per-file schema drift inside a table is surfaced by Spark's own parquet
schema merge long before row-level rules fire.

Types are compared on CANONICAL names (int32/int64/float32/float64/string/
bool/timestamp/date/binary, list<...>, struct, map) so the expected catalog
is engine-portable — the same catalog validates in DuckDB or any other
engine with a 10-line mapping (see the `schema_check` oracle in
`__spark_entry__.py` for the DuckDB transcription).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SIMPLE = {
    T.ByteType: "int8",
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float32",
    T.DoubleType: "float64",
    T.StringType: "string",
    T.BooleanType: "bool",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
    T.DateType: "date",
    T.BinaryType: "binary",
}


def canonical_type(dt: T.DataType) -> str:
    """Engine-neutral type name for a Spark DataType."""
    for cls, name in _SIMPLE.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canonical_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canonical_type(dt.keyType)},{canonical_type(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canonical_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def schema_violations(
    df: DataFrame,
    expected: list[tuple[str, str]],
    spark: SparkSession | None = None,
) -> DataFrame:
    """One verdict row per column name in (expected ∪ actual).

    ``expected`` is a list of (column_name, canonical_type). Output columns:
    (column, status, expected_type, actual_type) with status one of
    OK / TYPE_MISMATCH / MISSING (expected, absent) / UNEXPECTED (present,
    not in the catalog). Name match is exact (Spark's resolution may be
    case-insensitive, but a validation catalog should not be).
    """
    spark = spark or df.sparkSession
    actual = {f.name: canonical_type(f.dataType) for f in df.schema.fields}
    exp = dict(expected)
    if len(exp) != len(expected):
        raise ValueError("duplicate column names in expected catalog")
    rows = []
    for name, etype in expected:
        atype = actual.get(name)
        if atype is None:
            rows.append((name, "MISSING", etype, None))
        elif atype != etype:
            rows.append((name, "TYPE_MISMATCH", etype, atype))
        else:
            rows.append((name, "OK", etype, atype))
    for name in df.schema.fieldNames():
        if name not in exp:
            rows.append((name, "UNEXPECTED", None, actual[name]))
    return spark.createDataFrame(
        rows, "column string, status string, expected_type string, actual_type string"
    )


def schema_ok(df: DataFrame, expected: list[tuple[str, str]]) -> bool:
    """True iff every expected column is present with the expected type and
    no unexpected columns exist. Driver-side — no job."""
    actual = {f.name: canonical_type(f.dataType) for f in df.schema.fields}
    return actual == dict(expected)
