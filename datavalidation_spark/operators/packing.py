"""Sequence packing — greedy first-fit of documents into fixed token-capacity
training sequences.

Beyond-reference training-pipeline operator (SURVEY §2.9b). A pretraining
pipeline's last step converts the filtered corpus into fixed-length training
sequences; packing several short documents into one sequence recovers the
padding waste of one-doc-per-sequence batching (Kosec et al., "Packing:
Towards 2x NLP BERT Acceleration", arXiv:2107.02027 — public algorithm).

100-TB shape
------------
Globally optimal bin packing is a serial problem, so the scalable
formulation hash-buckets documents with the portable md5 hash
(:func:`~datavalidation_spark.operators.sampling.hash_rank`) and packs
greedily WITHIN each bucket in deterministic ``doc_id`` order:

* only ``(doc_id, n_tokens, bucket)`` integers are shuffled — never text;
* ``n_buckets`` scales with corpus size so docs/bucket stays bounded
  (one pandas group per bucket, millions of buckets at 100 TB);
* the result is a pure function of ``(corpus, capacity, n_buckets, seed)``
  — re-runnable, resumable, and oracle-checkable (the DuckDB twin is a
  recursive CTE over the same ordering).

Packing rule (shared verbatim with the oracle): docs are visited in
``doc_id`` order within a bucket; ``eff = min(n_tokens, capacity)`` (an
over-long doc is truncated to one full sequence); a doc opens a new pack
when it is the bucket's first or when ``fill + eff > capacity``; its
``pack_offset`` is the fill before it was placed.
"""

from __future__ import annotations

import math
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_rank
from .text import token_count_ws

_OUT_SCHEMA = (
    "doc_id bigint, bucket int, pack_id int, pack_offset int, "
    "eff_tokens int, truncated boolean"
)


def default_buckets(n_docs: int, docs_per_bucket: int = 4096) -> int:
    """Bucket count proportional to corpus size — keeps the per-bucket
    pandas group bounded regardless of scale (VERDICT r3 #7 pattern)."""
    return max(1, math.ceil(n_docs / docs_per_bucket))


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Assign every document to a (bucket, pack_id, pack_offset) slot.

    Returns one row per doc: ``doc_id, bucket, pack_id, pack_offset,
    eff_tokens, truncated``. ``pack_id`` is bucket-local (the global pack
    key is ``(bucket, pack_id)``).
    """
    if n_tokens is None:
        n_tokens = token_count_ws(F.col(text_col))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("int").alias("n_tokens"),
        F.pmod(hash_rank(F.col(id_col), salt=seed), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )

    # applyInPandas would also work; mapInPandas over a hash-partitioned,
    # (bucket, doc_id)-sorted frame avoids the per-group invocation overhead
    # when buckets are small (same rationale as engine/drift.py's many-small-
    # groups changepoint path). Partition by bucket so each bucket lands
    # whole inside one partition; Arrow may still SPLIT a bucket across
    # consecutive batches, so packing state (bucket, pack_id, fill) is
    # carried across batch boundaries within the partition iterator.
    part = base.repartition("bucket").sortWithinPartitions("bucket", "doc_id")

    def _pack_partition(pdfs: Iterable[pd.DataFrame]):
        cur_bucket, pack_id, fill = None, -1, capacity + 1
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            buckets = pdf["bucket"].to_numpy()
            toks = pdf["n_tokens"].to_numpy()
            out_pack, out_off, out_eff = [], [], []
            for b, t in zip(buckets, toks):
                if b != cur_bucket:
                    cur_bucket, pack_id, fill = b, -1, capacity + 1
                eff = min(int(t), capacity)
                if fill + eff > capacity:
                    pack_id += 1
                    fill = 0
                out_pack.append(pack_id)
                out_off.append(fill)
                out_eff.append(eff)
                fill += eff
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "bucket": buckets,
                    "pack_id": out_pack,
                    "pack_offset": out_off,
                    "eff_tokens": out_eff,
                    "truncated": toks > capacity,
                }
            )

    return part.mapInPandas(_pack_partition, schema=_OUT_SCHEMA)


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-pack fill statistics — the padding-waste report a training run
    cares about: docs per pack, used tokens, fill ratio."""
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("eff_tokens").alias("used_tokens"),
            F.max(F.col("truncated").cast("int")).cast("boolean").alias("any_truncated"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("used_tokens") / F.lit(float(capacity)), 6)
        )
    )


def shard_packs(
    packed: DataFrame,
    capacity: int,
    n_shards: int = 64,
    seed: str = "shard",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding of packed sequences — the
    write-side of training-data prep: each pack gets a pseudo-random shard
    (portable md5 hash of its key) and a position within that shard
    (md5-rank order), i.e. the global shuffle a training run needs without
    ever doing a global sort.

    100-TB shape: the shuffle is ONE hash repartition by shard; the
    position is a per-shard window (each shard sorts independently — no
    single-partition global window). Rows here are pack-level (orders of
    magnitude fewer than docs), and shard count scales with corpus size so
    per-shard sorts stay bounded.
    """
    key = F.concat_ws(":", F.col("bucket"), F.col("pack_id"))
    stats = pack_stats(packed, capacity).withColumn(
        "rank", hash_rank(key, salt=seed)
    )
    shard = F.pmod(F.col("rank"), F.lit(n_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy("rank", "bucket", "pack_id")
    return (
        stats.withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select(
            "bucket",
            "pack_id",
            "n_docs",
            "used_tokens",
            "fill_ratio",
            "shard",
            "pos_in_shard",
        )
    )


def write_training_shards(
    docs: DataFrame,
    packed: DataFrame,
    shards: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_records_per_file: int = 0,
) -> str:
    """Materialize the final training artifact: a parquet directory
    partitioned by ``shard``, each shard's rows stored in consumption order
    (``pos_in_shard`` of the pack, then ``pack_offset`` within the pack) so
    a training reader streams a shard file sequentially with no sort.

    100-TB shape: document text travels exactly TWO shuffles — once into
    the assignment join (hash by doc_id) and once into shard grouping —
    which is the minimum for an assign-then-regroup on different keys; the
    assignment side itself (packed ⋈ shards) shuffles only int columns.
    Ordering is sortWithinPartitions — a per-task sort, never a global
    one; file sizes are bounded with ``maxRecordsPerFile`` instead of more
    partitions, so shard count (and the reader's addressing scheme) stays
    decoupled from file sizing.
    """
    asg = packed.join(
        shards.select("bucket", "pack_id", "shard", "pos_in_shard"),
        ["bucket", "pack_id"],
    )
    rows = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).join(asg, "doc_id")
    writer = (
        rows.repartition("shard")
        .sortWithinPartitions("shard", "pos_in_shard", "pack_offset")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(out_dir)
    return out_dir
