#!/usr/bin/env python
"""Regenerate the advanced_anomaly derived-fixture oracle (FIXTURES.md §6).

The LOF ∪ iForest ensemble (engine/drift.py) is seeded and deterministic per
group: applyInPandas always feeds WHOLE groups, the RNG seed derives from the
group key, and the numpy math is order-fixed by the (ts, event_id) sort. So
its flag surface over the driver's frozen sf0.01 events table is a constant —
recomputable any time with this script, and frozen as a VALUES literal the
DuckDB oracle replays (the ensemble itself is not SQL-expressible).

Determinism is VERIFIED here, not assumed: the projection is computed twice
under different parallelism + input partitioning and must match exactly
before the fixture is written.

Output: tests/fixtures/anomaly_oracle_sf001.json
        [[group_key, check, feature, flagged, n_flagged, indices_csv], ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "tests", "fixtures", "anomaly_oracle_sf001.json")


def _run(cores: int, repartition: int) -> list[list]:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from datavalidation_spark.session import get_spark

    spark = get_spark(
        f"gen-anomaly-fixture-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = entry.q_advanced_anomaly(spark, SF_DIR)
    if repartition:
        df = df.repartition(repartition)
    rows = [
        [r.group_key, r.check, r.feature, bool(r.flagged), int(r.n_flagged), r.indices_csv]
        for r in df.collect()
    ]
    spark.stop()
    return sorted(rows)


def main() -> None:
    a = _run(cores=8, repartition=0)
    b = _run(cores=32, repartition=7)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y]
        raise SystemExit(f"ensemble output NOT partition-invariant: {diff[:5]}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(a, f, indent=0)
    print(f"wrote {len(a)} rows to {OUT} (verified identical at 8 and 32 cores)")


if __name__ == "__main__":
    main()
