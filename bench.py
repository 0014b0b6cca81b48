#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line.

Headline metric: validated docs/sec on the synthetic interleaved-document
table (BASELINE.json metric), at a document count scaled to the SF of
$SPARK_GRAFT_SF_DIR. Also times every driver-contract query at that SF.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)

Scaling-efficiency evidence (BASELINE.md): run this twice —
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare docs/sec (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOCS_PER_SF = 2_000_000  # docs at SF 1.0 → 200k at sf0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_docs = max(int(DOCS_PER_SF * sf), 10_000)

    from datavalidation_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from datavalidation_spark.datagen import synth_asset_catalog, synth_documents
    from datavalidation_spark.engine.validate import validate_documents

    # --- headline: full validation over the interleaved table -------------
    # Materialize input first so generation cost is excluded from the metric.
    docs = synth_documents(spark, n_docs, dirty=True, n_parts=cpus * 4).cache()
    catalog = synth_asset_catalog(spark, 10_000).cache()
    docs.count()
    catalog.count()

    def run_validation():
        res = validate_documents(docs, asset_catalog=catalog)
        # persist: the verdict aggregation reuses the violation rows instead
        # of recomputing the whole rule DAG (cache-manager subtree match)
        res.violations.persist()
        n_violations = res.violations.count()
        verd = res.verdicts.collect()
        res.violations.unpersist()
        return n_violations, verd

    run_validation()  # warmup: JIT + codegen compile, excluded from metric
    t0 = time.perf_counter()
    n_violations, verd = run_validation()
    elapsed = time.perf_counter() - t0
    docs_per_sec = n_docs / elapsed

    # release the headline inputs BEFORE the query loop: the cached
    # interleaved docs (spans arrays, ~GBs at sf0.1) otherwise sit in
    # executor storage for every contract query and evict/thrash the queries'
    # own caches (measured: maritime_catalog 7s isolated vs 40s with the
    # docs cache resident)
    docs.unpersist()
    catalog.unpersist()
    spark.sparkContext._jvm.System.gc()

    # --- per-query timings at the bench SF (1 warmup + 1 timed) -----------
    q_times: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        fn(spark, sf_dir).collect()
        # driver GC between queries: ContextCleaner only releases finished
        # queries' broadcast/shuffle/cache blocks after a driver GC — without
        # this, blocks accumulate across the contract queries and later ones
        # degrade several-fold (same fix as scripts/scaling_bench.py)
        spark.sparkContext._jvm.System.gc()
        t = time.perf_counter()
        fn(spark, sf_dir).collect()
        q_times[name] = round(time.perf_counter() - t, 3)

    print(
        json.dumps(
            {
                "metric": "validated_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": q_times,
                "sf": sf,
                "n_docs": n_docs,
                "validate_sec": round(elapsed, 3),
                "n_violations": n_violations,
                "n_partitions": len(verd),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
