"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk``       — exact brute-force top-k: the correctness baseline.
  Dot products are pure Column math (``zip_with`` + ``aggregate``); the
  quadratic join is the cost you pay for exactness — only for eval sets.
* ``lsh_topk``          — random-hyperplane LSH buckets + exact rerank inside
  buckets (multi-probe over ``n_tables`` independent tables): the scale path,
  shuffle O(rows·tables), never O(rows²).
* ``ivf_topk``          — IVF-style: k-means-lite centroids (seeded sample,
  one refinement pass), probe the ``n_probe`` nearest cells. Centroids are
  broadcast; the quadratic term becomes rows·centroids.

Embedding-cosine *near-duplicate* detection = ``cosine_pairs`` with a
threshold — used by the dedup suite.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def normalized(df: DataFrame, vec_col: str = "embedding", out: str = "nvec") -> DataFrame:
    """Unit-normalize (double precision) so cosine = dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out, F.transform(v, lambda x: x / _norm(v)))


def cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact near-dup pairs with cosine ≥ threshold (brute force)."""
    n = normalized(df, vec_col).select(F.col(id_col).alias("id"), "nvec")
    return (
        n.alias("a")
        .join(n.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(_dot(F.col("a.nvec"), F.col("b.nvec")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query (query set broadcast against the
    corpus scan — ONE pass over the corpus regardless of |queries|)."""
    q = normalized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("nvec").alias("qvec")
    )
    c = normalized(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("nvec").alias("cvec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Signature = bit-string of sign(v·h) per hyperplane (Column math)."""
    bits = []
    for h in planes:
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in h]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets, exact rerank in-bucket.

    Recall grows with n_tables (independent probes unioned before rerank).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, n_tables, seed)

    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        n = normalized(df, vec_col)
        tagged = n.select(
            F.col(id_col).alias(id_alias),
            F.col("nvec").alias(vec_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            _bucket_expr(F.col("nvec"), planes[t]).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        )
        return tagged.select(id_alias, vec_alias, "tb.table", "tb.bucket")

    qb = with_buckets(queries, "query_id", "qvec")
    cb = with_buckets(corpus, "neighbor_id", "cvec")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF: assign corpus rows to nearest of n_cells centroids (sampled then
    one Lloyd refinement — deterministic), probe n_probe cells per query."""
    n = normalized(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), "nvec")
    sample = np.array(
        [r.nvec for r in n.orderBy(F.xxhash64("neighbor_id", F.lit(seed))).limit(n_cells).collect()]
    )
    # one refinement pass (distributed): assign → mean per cell
    def assign_expr(centroids: np.ndarray, vec: str) -> Column:
        sims = [
            F.aggregate(
                F.zip_with(F.col(vec), F.array(*[F.lit(float(x)) for x in c]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
        arr = F.array(*[F.struct(s.alias("sim"), F.lit(i).alias("cell")) for i, s in enumerate(sims)])
        return F.array_max(arr)["cell"]

    assigned = n.withColumn("cell", assign_expr(sample, "nvec"))
    means = (
        assigned.groupBy("cell")
        .agg(*[F.avg(F.col("nvec")[i]).alias(f"m{i}") for i in range(sample.shape[1])])
        .collect()
    )
    refined = sample.copy()
    for r in means:
        v = np.array([r[f"m{i}"] for i in range(sample.shape[1])])
        nv = np.linalg.norm(v)
        if nv > 0:
            refined[r.cell] = v / nv

    corpus_cells = n.withColumn("cell", assign_expr(refined, "nvec"))
    q = normalized(queries, vec_col).select(F.col(id_col).alias("query_id"), F.col("nvec").alias("qvec"))
    # per query: the n_probe nearest cells
    probe_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(F.col("qvec"), F.array(*[F.lit(float(x)) for x in c]), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(refined)
        ]
    )
    q_cells = q.withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(probe_structs)), 1, n_probe),
                lambda s: s["cell"],
            )
        ),
    )
    scored = q_cells.join(corpus_cells, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qvec"), F.col("nvec")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
