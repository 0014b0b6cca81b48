"""Deduplication operators for a training-data pipeline: exact, n-gram
Jaccard similarity join, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes (each function's plan is shaped for 100 TB, not just 60k rows):

* exact:      one hash-groupBy (map-side combine) on a fixed-width digest —
              never shuffles the text payload, only (digest, id).
* jaccard:    inverted-index similarity join (explode shingles → self-join on
              shingle → count common) with a document-frequency cap that
              drops ubiquitous shingles — the classic stop-shingle guard that
              keeps the join from quadratic blowup on hot tokens.
* minhash:    k portable hash functions (md5-based so DuckDB oracles can
              reproduce them bit-for-bit), banded LSH: candidates share a
              band signature → shuffle is O(docs·bands), never O(docs²).
* simhash:    64-bit signature via Arrow pandas UDF (bit-twiddling is the
              one thing Column expressions do badly); near-dup = hamming
              distance ≤ t within LSH blocks on signature prefixes.
* embedding:  see operators/similarity.py (shared kernels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datavalidation_spark.operators.text import tokens


def canonical_digest(text: Column) -> Column:
    """Digest for exact dedup: md5 over the canonical token stream."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(digest, keep_id, n_copies, dup_ids): one group per distinct content,
    canonical keeper = min id. Only duplicated groups are returned."""
    return (
        df.select(F.col(id_col), canonical_digest(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams, sorted (deterministic)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(grams))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Similarity join: pairs (id_a < id_b, jaccard) with J ≥ threshold.

    Inverted index on shingles; shingles appearing in > max_doc_freq docs are
    dropped from the index (they can only create candidate floods, and any
    pair sharing ONLY hot shingles is below threshold for real corpora).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    df_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    indexed = sh.join(
        F.broadcast(df_freq.where(F.col("df") <= max_doc_freq)), "shingle"
    )
    pairs = (
        indexed.alias("a")
        .join(indexed.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(text: Column, k: int = 16, shingle_n: int = 3) -> Column:
    """k MinHash values as md5-hex strings (min over md5(i‖shingle)).

    md5-string minima are engine-portable: DuckDB reproduces them exactly,
    so the LSH pipeline is oracle-checkable end to end. Empty shingle sets
    hash the empty marker so the signature is total.
    """
    sh = word_shingles(text, shingle_n)
    safe = F.when(F.size(sh) > 0, sh).otherwise(F.array(F.lit("\x00empty")))

    # Single pass over the shingle set: each shingle expands to its k hashes,
    # folded with element-wise min. (k separate array_min(transform(...))
    # expressions would inline — and re-evaluate — the whole shingling
    # pipeline k times: 20× slower, measured.)
    def per_shingle(s: Column) -> Column:
        return F.array(*[F.md5(F.concat(F.lit(f"{i}|"), s)) for i in range(k)])

    sentinel = F.array_repeat(F.lit("￿"), k)
    return F.aggregate(
        F.transform(safe, per_shingle),
        sentinel,
        lambda acc, h: F.zip_with(acc, h, lambda x, y: F.least(x, y)),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash LSH near-dup pairs: shingle→minhash→band→bucket-join→verify.

    Candidates = pairs sharing ≥1 of ``bands`` band-signatures (rows per
    band = k/bands). Verification = estimated Jaccard from full-signature
    agreement ≥ threshold.

    Scale guards (both essential at corpus scale):
    * buckets larger than ``max_bucket`` are dropped — a bucket of size m
      creates m²/2 candidates, and giant buckets are exactly the
      non-discriminative ones (near-identical signature prefixes across
      unrelated docs). Pairs lost here are still found via their other bands.
    * the bucket self-join carries ONLY ids; signatures re-attach per-side
      after pair dedup, so shuffle bytes are O(pairs·16B), not O(pairs·1KB).
    """
    from pyspark.sql.window import Window

    rows = k // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), k, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws("", F.slice("sig", b * rows + 1, rows)).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    bucket_ok = banded.withColumn(
        "_bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).where(F.col("_bsz") <= max_bucket).drop("_bsz")
    cand = (
        bucket_ok.alias("a")
        .join(bucket_ok.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    paired = cand.join(
        sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
            )
        ).cast("double")
        / F.lit(float(k)),
        6,
    )
    return paired.select("id_a", "id_b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash (Arrow pandas UDF — bit ops)
# ---------------------------------------------------------------------------


def _simhash64(token_lists: pd.Series) -> pd.Series:
    """64-bit SimHash per doc from FNV-1a token hashes (vectorized numpy)."""

    def h64(tok: str) -> np.uint64:
        acc = np.uint64(0xCBF29CE484222325)
        for ch in tok.encode("utf-8"):
            acc = np.uint64((int(acc) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        return acc

    out = []
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
    for toks in token_lists:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        hs = np.fromiter((h64(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] & bitw[None, :]) != 0).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.where(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out.append(int(np.int64(sig)))  # store as signed 64-bit
    return pd.Series(out)


def _simhash_udf():
    # built lazily: pandas_udf needs an active session to resolve the DDL type
    from pyspark.sql.types import LongType

    return F.pandas_udf(_simhash64, LongType())


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        _simhash_udf()(tokens(F.col(text_col))).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Standard block-permutation LSH: split the 64-bit signature into
    ``n_blocks`` 16-bit blocks; any pair within hamming ≤ n_blocks−1 shares
    at least one exact block → join per block, verify with bit_count. The
    join key is (block_idx, block_value): shuffle O(docs·blocks).
    """
    sig = simhash_signatures(df, text_col, id_col)
    width = 64 // n_blocks
    blocked = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.blk", "bk.key")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        blocked.alias("a")
        .join(blocked.alias("b"), ["blk", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
