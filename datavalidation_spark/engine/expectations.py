"""Expectation suites — table-level assertions in one aggregation pass.

The rule catalog (`rules/`) validates ROWS; an expectation suite asserts
TABLE-level facts (the Great Expectations shape): row counts, null rates,
bounds, uniqueness, set membership. Each expectation compiles to one
aggregate expression, the whole suite runs as ONE ``df.agg`` job (map-side
combined, one row to the driver), and the result is one verdict row per
expectation: (expectation, column, observed, ok).

Supported kinds (spec = dict):

* ``row_count_between``: lo <= count(*) <= hi                (observed: count)
* ``null_rate_at_most``: null fraction of column <= threshold
* ``min_at_least`` / ``max_at_most``: bound on column extremes
* ``mean_between``: lo <= avg(column) <= hi
* ``unique``: no duplicate values in column (observed: duplicate count;
  exact count-distinct — Catalyst plans the single distinct aggregate with
  one Expand, acceptable for a verification gate; use the HLL profile for
  monitoring at scale)
* ``in_set``: fraction of column values outside ``values`` == 0

A FAILED expectation is a row with ok=false, not an exception — suites feed
dashboards and gates, both of which want the full verdict vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REQUIRED = {
    "row_count_between": {"lo", "hi"},
    "null_rate_at_most": {"column", "threshold"},
    "min_at_least": {"column", "threshold"},
    "max_at_most": {"column", "threshold"},
    "mean_between": {"column", "lo", "hi"},
    "unique": {"column"},
    "in_set": {"column", "values"},
}


def _agg_expr(spec: dict, i: int) -> list[Column]:
    kind = spec["kind"]
    c = F.col(spec["column"]) if "column" in spec else None
    n = F.count(F.lit(1))
    if kind == "row_count_between":
        obs = n.cast("double")
    elif kind == "null_rate_at_most":
        obs = F.sum(c.isNull().cast("long")) / n
    elif kind == "min_at_least":
        obs = F.min(c).cast("double")
    elif kind == "max_at_most":
        obs = F.max(c).cast("double")
    elif kind == "mean_between":
        obs = F.avg(c)
    elif kind == "unique":
        # duplicates among NON-NULL values: count(c) ignores NULLs exactly
        # like count_distinct(c) does, matching the Great Expectations /
        # SQL UNIQUE convention (NULLs are not duplicates of each other).
        # The old form used count(*) and reported every NULL as a duplicate
        # (ADVICE r4). Pair with null_rate_at_most to also reject NULLs.
        obs = (F.count(c) - F.count_distinct(c)).cast("double")
    elif kind == "in_set":
        vals = [F.lit(v) for v in spec["values"]]
        obs = F.sum((~c.isin(*vals) | c.isNull()).cast("long")) / n
    else:
        raise ValueError(f"unknown expectation kind {kind!r}")
    return obs.alias(f"_e{i}")


def _verdict(spec: dict, observed: float | None) -> bool:
    kind = spec["kind"]
    if observed is None:
        return False
    if kind == "row_count_between":
        return spec["lo"] <= observed <= spec["hi"]
    if kind == "null_rate_at_most":
        return observed <= spec["threshold"]
    if kind == "min_at_least":
        return observed >= spec["threshold"]
    if kind == "max_at_most":
        return observed <= spec["threshold"]
    if kind == "mean_between":
        return spec["lo"] <= observed <= spec["hi"]
    if kind == "unique":
        return observed == 0
    if kind == "in_set":
        return observed == 0
    raise ValueError(kind)


def run_expectations(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """One verdict row per expectation; the whole suite is ONE agg job."""
    if not expectations:
        raise ValueError("empty expectation suite")
    for spec in expectations:
        kind = spec.get("kind")
        if kind not in _REQUIRED:
            raise ValueError(f"unknown expectation kind {kind!r}")
        missing = _REQUIRED[kind] - set(spec)
        if missing:
            raise ValueError(f"{spec.get('name', kind)}: missing {sorted(missing)}")
    row = df.agg(
        *[_agg_expr(s, i) for i, s in enumerate(expectations)]
    ).collect()[0]
    out = []
    for i, spec in enumerate(expectations):
        obs = row[f"_e{i}"]
        obs_f = float(obs) if obs is not None else None
        out.append(
            (
                spec.get("name", spec["kind"]),
                spec.get("column"),
                round(obs_f, 6) if obs_f is not None else None,
                bool(_verdict(spec, obs_f)),
            )
        )
    return df.sparkSession.createDataFrame(
        out, "expectation string, column string, observed double, ok boolean"
    )
