"""End-to-end training-data pipeline: the full curation chain a user of
this engine runs — quality/lang gate → exact dedup → benchmark
decontamination → deterministic sampling → sequence packing → shard
shuffle → ordered shard write — composed from the public operators, with
conservation invariants the per-operator tests can't see (every surviving
doc lands in exactly one shard slot; every dropped doc is absent for the
right reason; the whole chain is a pure function of its inputs)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datavalidation_spark.operators.decontam import decontaminate
from datavalidation_spark.operators.dedup import canonical_digest
from datavalidation_spark.operators.packing import (
    pack_sequences,
    shard_packs,
    write_training_shards,
)
from datavalidation_spark.operators.sampling import sample_fraction
from datavalidation_spark.operators.text import quality_score, token_count_ws

CAP = 64


def test_training_pipeline_end_to_end(spark, sf001, tmp_path):
    docs = sf001["documents"]
    n_input = docs.count()

    # 1. quality/lang gate + exact dedup (keep smallest doc_id per digest)
    w = Window.partitionBy("digest").orderBy("doc_id")
    gated = (
        docs.select(
            "doc_id",
            "text",
            "lang",
            token_count_ws(F.col("text")).alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
            canonical_digest(F.col("text")).alias("digest"),
        )
        .where((F.col("lang") == "en") & (F.col("n_tokens") >= 10))
        .withColumn("dup_rank", F.row_number().over(w))
        .where(F.col("dup_rank") == 1)
        .drop("dup_rank")
    )

    # 2. decontaminate against a planted 3-doc benchmark (their own text)
    bench = docs.orderBy("doc_id").limit(3).select("doc_id", "text")
    verdicts = decontaminate(gated, bench, n=8)
    clean = gated.join(
        verdicts.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )

    # 3. deterministic sample
    sampled = sample_fraction(clean, 0.9, salt="e2e").localCheckpoint()
    kept_ids = {r.doc_id for r in sampled.select("doc_id").collect()}
    assert 0 < len(kept_ids) < n_input

    # planted-contamination check: the 3 benchmark docs never survive
    bench_ids = {r.doc_id for r in bench.collect()}
    assert not (bench_ids & kept_ids)

    # 4-6. pack → shard → write
    packed = pack_sequences(sampled, capacity=CAP, n_buckets=8).localCheckpoint()
    shards = shard_packs(packed, capacity=CAP, n_shards=4).localCheckpoint()
    out = write_training_shards(sampled, packed, shards, str(tmp_path / "out"))

    # conservation: every sampled doc appears in the artifact exactly once
    written = []
    for d in sorted(glob.glob(out + "/shard=*")):
        pdf = pq.read_table(d).to_pandas()
        key = list(zip(pdf["pos_in_shard"], pdf["pack_offset"]))
        assert key == sorted(key), f"unsorted shard {d}"
        written.extend(pdf["doc_id"].tolist())
    assert sorted(written) == sorted(kept_ids)

    # pack capacity invariant holds through the composition
    overfull = (
        packed.groupBy("bucket", "pack_id")
        .agg(F.sum("eff_tokens").alias("fill"))
        .where(F.col("fill") > CAP)
        .count()
    )
    assert overfull == 0

    # determinism: re-running the assignment chain reproduces shard slots
    packed2 = pack_sequences(sampled, capacity=CAP, n_buckets=8)
    shards2 = shard_packs(packed2, capacity=CAP, n_shards=4)
    assert sorted(map(tuple, shards.collect())) == sorted(
        map(tuple, shards2.collect())
    )
