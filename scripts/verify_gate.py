#!/usr/bin/env python
"""Replay the driver's correctness gate locally, from a fresh process.

Runs every ``queries()`` entry in ``__spark_entry__.py`` at the given SF dir
and compares against its ``oracle_sql()`` in DuckDB on row count, sorted
column names, and order-insensitive values (floats rounded to 6 dp, NaN ≡
NULL) — the same comparison the grading driver applies.

Usage (from anywhere; a fresh interpreter is the point):

    PYTHONPATH=/root/repo python /root/repo/scripts/verify_gate.py \
        [sf_dir] [query ...]

    sf_dir   defaults to /root/testdata/sf0.01
    query    optional names to restrict to (default: all)

PYTHONPATH must include the repo so Spark's Python WORKERS can import
datavalidation_spark for the pandas-UDF queries (driver-side sys.path alone
does not propagate to workers). Exit code 0 iff every checked row matches.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def _row_key(row: tuple) -> tuple:
    """None-safe sort key: plain tuple sorting raises TypeError when rows
    tie on leading columns and differ at a NULL vs non-NULL value."""
    return tuple(
        (v is None, "" if v is None else type(v).__name__, 0 if v is None else v)
        for v in row
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if args and ("/" in args[0] or os.sep in args[0]):
        # path-shaped first arg: it IS the sf_dir — a typo'd path must be a
        # hard error, not silently reinterpreted as a query filter that
        # matches nothing and exits green
        if not os.path.isdir(args[0]):
            print(f"sf_dir does not exist: {args[0]}")
            return 2
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - queries.keys()
    if unknown:
        # a typo'd query name must be a hard error, not a silently-empty
        # filter that prints 'failures: none' and exits 0 (ADVICE r5)
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    t0 = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(_norm(r[c]) for c in scols) for r in sdf.collect()),
                key=_row_key,
            )
            if name not in oracles:
                print(f"  {name}: rows-only ({len(srows)} rows, no oracle)")
                continue
            otable = con.execute(oracles[name]).fetch_arrow_table()
            orows_raw = otable.to_pylist()
            # column names from the ARROW SCHEMA, not the first row: on an
            # empty result the former scols fallback made any column-name
            # mismatch vacuously pass (ADVICE r5)
            ocols = sorted(otable.column_names)
            orows = sorted(
                (tuple(_norm(r[c]) for c in ocols) for r in orows_raw),
                key=_row_key,
            )
            ok = scols == ocols and srows == orows
            status = "ok" if ok else "MISMATCH"
            if not ok:
                failures.append(name)
                detail = (
                    f" spark={len(srows)} oracle={len(orows)}"
                    f" cols_match={scols == ocols}"
                )
            else:
                detail = f" ({len(srows)} rows)"
            print(f"  {name}: {status}{detail}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"  {name}: ERROR {str(exc)[:160]}")
    n = len(only) if only else len(queries)
    print(
        f"gate: {n} queries in {time.time() - t0:.0f}s, "
        f"failures: {failures or 'none'}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
