"""Single-pass column profiling (SURVEY.md A8; north_star: per-column stats —
null rate, min/max, cardinality via HyperLogLog, approx quantiles).

One ``df.agg(...)`` pass computes everything: Spark's HLL++
(``approx_count_distinct``) and quantile sketch (``percentile_approx``,
Greenwald-Khanna) are partial-aggregatable, so the whole profile is a single
map-side-combining job with one tiny shuffle — the scan cost dominates, as it
should at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with
    (column, count, null_count, null_rate, approx_distinct, min, max, q25,
    q50, q75). Non-numeric columns get NULL quantiles; min/max as strings.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [c for c in df.columns if not c.startswith("_")]

    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(col).alias(f"{c}__distinct"))
        if isinstance(fields[c], NumericType):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max"))
            aggs.append(
                F.percentile_approx(col, [0.25, 0.5, 0.75]).alias(f"{c}__q")
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"{c}__smin"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__smax"))

    row: Row = df.agg(*aggs).collect()[0]  # one row — driver-side melt is O(#cols)
    total = row["_total"]
    out = []
    for c in cols:
        numeric = isinstance(fields[c], NumericType)
        q = row[f"{c}__q"] if numeric else None
        out.append(
            Row(
                column=c,
                count=total,
                null_count=row[f"{c}__nulls"],
                null_rate=(row[f"{c}__nulls"] / total) if total else None,
                approx_distinct=row[f"{c}__distinct"],
                min_num=row[f"{c}__min"] if numeric else None,
                max_num=row[f"{c}__max"] if numeric else None,
                min_str=None if numeric else row[f"{c}__smin"],
                max_str=None if numeric else row[f"{c}__smax"],
                q25=q[0] if q else None,
                q50=q[1] if q else None,
                q75=q[2] if q else None,
            )
        )
    return df.sparkSession.createDataFrame(out)
