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
from pyspark.storagelevel import StorageLevel


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
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = df.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("nrm")
    )
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        n.alias("a")
        .join(n.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_pairs_fast(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.9,
    round_dp: int = 4,
) -> DataFrame:
    """Exact near-dup pairs via Arrow-batched numpy GEMM: each partition's
    block multiplies against the broadcast corpus matrix (blocked
    block-nested-loop join). ~100× the Column-fold path; float sums use
    blocked matmul, so results are rounded to ``round_dp`` (4) — coarse
    enough that engine-order float noise (~1e-13) cannot flip a digit.

    Eval-scale exact baseline: the corpus side is broadcast whole. At corpus
    scale, block first (LSH/IVF above) and exact-rerank within blocks.
    """
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, M))

    out_schema = "id_a long, id_b long, cosine double"

    def gen(batches):
        b_ids, b_M = bc.value
        order = {int(v): i for i, v in enumerate(b_ids)}
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = np.round(A @ b_M.T, round_dp)
            ai, bj = np.where(S >= threshold)
            id_a = a_ids[ai]
            id_b = b_ids[bj]
            keep = id_a < id_b
            yield pd.DataFrame(
                {"id_a": id_a[keep], "id_b": id_b[keep], "cosine": S[ai, bj][keep]}
            )

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query — ONE pass over the corpus
    regardless of |queries|.

    r6 shape: the query set (an eval set — the same smallness contract the
    former JVM broadcast join assumed; bounded driver transfer) is
    collected and numpy-broadcast, and each corpus Arrow batch scores
    against it with one GEMM (guide §4.2) instead of |corpus|·|queries|
    interpreted 64-term Column folds (measured 3.5 s → ~1 s at 20×20k,
    dim 64). Cosines round to 6 dp and rank exactly as before."""
    import pandas as pd

    spark = corpus.sparkSession
    out_cols = "query_id long, neighbor_id long, cosine double, rank int"
    q_rows = (
        queries.select(id_col, vec_col).where(F.col(vec_col).isNotNull()).collect()
    )
    if not q_rows:
        return _empty_result(corpus, out_cols)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    with np.errstate(invalid="ignore", divide="ignore"):
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, Qn))

    def gen(batches):
        ids_q, Qm = bc.value
        nq = len(ids_q)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            with np.errstate(invalid="ignore", divide="ignore"):
                M = M / np.linalg.norm(M, axis=1, keepdims=True)
                S = np.round(M @ Qm.T, 6)  # (batch, nq)
            qcol = np.tile(ids_q, len(c_ids))
            ncol = np.repeat(c_ids, nq)
            keep = qcol != ncol
            yield pd.DataFrame(
                {
                    "query_id": qcol[keep],
                    "neighbor_id": ncol[keep],
                    "cosine": S.reshape(-1)[keep],
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Engine-portable LSH (md5-derived Rademacher hyperplanes)
# ---------------------------------------------------------------------------
#
# Hyperplane coefficients are ±1 drawn from md5("{table}|{bit}|{dim}") parity
# — computed once in Python at plan-build time and embedded as literals, so a
# DuckDB oracle can regenerate the *identical* plan. Sign bits are invariant
# under positive scaling, so vectors are NOT normalized before bucketing
# (one fewer float divergence surface). The projection is a strictly
# left-to-right fold (0.0 ± v[0] ± v[1] …) in both engines, which makes the
# bucket assignment bit-for-bit reproducible: IEEE addition in a fixed order.


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimensionality from the first NON-NULL vector; None only when
    the input has no vectors at all (callers short-circuit to an empty
    result instead of raising — ADVICE r2 low #4; a NULL in the arbitrary
    first row must NOT masquerade as an empty corpus). Costs one extra
    Spark job: pass ``dim`` explicitly on hot paths (every contract query
    does)."""
    row = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if row is None:
        return None
    return len(row[0])


def _empty_result(df: DataFrame, schema: str) -> DataFrame:
    return df.sparkSession.createDataFrame([], schema)


def _md5_sign(table: int, bit: int, d: int) -> int:
    import hashlib

    h = hashlib.md5(f"{table}|{bit}|{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) >= 8 else -1


def rademacher_planes(n_tables: int, n_bits: int, dim: int) -> list[list[list[int]]]:
    """signs[t][b][d] ∈ {+1, −1} — deterministic, seed-free, engine-free."""
    return [
        [[_md5_sign(t, b, d) for d in range(dim)] for b in range(n_bits)]
        for t in range(n_tables)
    ]


def _sign_bucket_expr(vec: str, plane: list[list[int]]) -> Column:
    """Bit-string bucket key for one table (strict left-to-right fold).

    Expressed as zip_with(·,±1.0)→aggregate rather than a chained ±v[d]
    expression: a 64-term chain × 32 bits overflows janino's 64 KB method
    limit and kicks the whole projection out of codegen. x·(−1.0) ≡ −x and
    aggregate folds left-to-right, so the result is bit-identical to the
    oracle's explicit `0.0 + v[1] - v[2] …` chain.

    Built as ONE ``F.expr`` SQL string per table rather than per-literal
    Column objects: n_bits·dim ``F.lit()`` calls × 2 sides are py4j round
    trips, measured 6–11 s of driver-side plan BUILD per contract query
    (execution was ~1 s). The SQL parses to the exact same expression tree,
    so results are unchanged bit-for-bit."""
    bits = []
    for signs in plane:
        arr = ", ".join(f"{float(s):.1f}D" for s in signs)
        dot = (
            f"aggregate(zip_with(`{vec}`, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0.0D THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def lsh_bucket_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[list[int]]],
    id_alias: str = "id",
    vec_alias: str = "v",
) -> DataFrame:
    """(id, v, tbl, bucket) — one row per (vector, table)."""
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _sign_bucket_expr(vec_col, plane).alias("bucket"),
                    )
                    for t, plane in enumerate(planes)
                ]
            )
        ).alias("tb"),
    ).select(id_alias, vec_alias, "tb.tbl", "tb.bucket")


def lsh_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.9,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
    round_dp: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """Embedding near-dup pairs at corpus scale: LSH-bucket blocking + exact
    GEMM rerank *inside* each bucket (``applyInPandas`` — one Arrow batch per
    (table, bucket) group, never a driver collect; replaces the round-1
    ``cosine_pairs_fast`` contract wiring VERDICT flagged as driver-OOM).

    Candidate pairs = vectors sharing ≥1 of ``n_tables`` sign-buckets;
    buckets above ``max_bucket`` are dropped (non-discriminative; pairs are
    still found via their other tables). Output = (id_a < id_b, cosine) with
    cosine ≥ threshold, rounded to ``round_dp`` so blocked-matmul float
    noise can't flip a digit. Recall vs the exact quadratic baseline is
    pytest-checked; the blocking itself is deterministic and reproduced by
    the DuckDB oracle literal-for-literal.
    """
    import pandas as pd

    if dim is None:
        dim = _infer_dim(df, vec_col)
        if dim is None:
            return _empty_result(df, "id_a long, id_b long, cosine double")
    planes = rademacher_planes(n_tables, n_bits, dim)
    tagged = lsh_bucket_assign(df, vec_col, id_col, planes)
    sized = tagged.withColumn(
        "_bsz", F.count(F.lit(1)).over(Window.partitionBy("tbl", "bucket"))
    ).where(F.col("_bsz") <= max_bucket).drop("_bsz")

    out_schema = "id_a long, id_b long, cosine double"

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = np.round(M @ M.T, round_dp)
        ai, bj = np.where(S >= threshold)
        keep = ids[ai] < ids[bj]
        return pd.DataFrame(
            {"id_a": ids[ai][keep], "id_b": ids[bj][keep], "cosine": S[ai, bj][keep]}
        )

    pairs = sized.groupBy("tbl", "bucket").applyInPandas(per_bucket, out_schema)
    return pairs.dropDuplicates(["id_a", "id_b"])


def lsh_topk_md5(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k over md5-Rademacher LSH buckets with exact rerank over the
    union of candidates — the scale path promoted into the driver contract
    (the brute-force ``cosine_topk`` stays as the exact baseline). Candidate
    generation is deterministic, so the DuckDB oracle reproduces the exact
    result set; ordering ties break on (rounded cosine desc, neighbor_id)."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
        if dim is None:
            return _empty_result(
                corpus, "query_id long, neighbor_id long, cosine double, rank int"
            )
    planes = rademacher_planes(n_tables, n_bits, dim)
    qb = lsh_bucket_assign(queries, vec_col, id_col, planes, "query_id", "qvec")
    cb = lsh_bucket_assign(corpus, vec_col, id_col, planes, "neighbor_id", "cvec")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qd = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    cd = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(qd, cd) / (_norm(qd) * _norm(cd)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
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
        dim = _infer_dim(corpus, vec_col)
        if dim is None:
            return _empty_result(
                corpus, "query_id long, neighbor_id long, cosine double, rank int"
            )
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
    one Lloyd refinement — deterministic), probe n_probe cells per query.

    Round-4 shape: centroids live in a tiny broadcast DataFrame and every
    assignment is a broadcast cross join + lexicographic max — the round-3
    version inlined all centroids as literal arrays (n_cells·dim literals
    per expression: a codegen tree janino chews on for seconds per job,
    measured 23 s for the contract query vs ~4 s this way). rows·centroids
    arithmetic is identical; only the plan shape changed."""
    spark = corpus.sparkSession
    # The normalized corpus feeds THREE jobs (centroid sample, Lloyd
    # refinement means, final cell assignment): persist it so the scan +
    # normalization runs once instead of three times — at 100 TB that is
    # two full corpus passes saved, and the cached blocks are reclaimed by
    # ContextCleaner after the query (same lifetime policy as the maritime
    # fixture ctx).
    n = (
        normalized(corpus, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), "nvec")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sample = np.array(
        [r.nvec for r in n.orderBy(F.xxhash64("neighbor_id", F.lit(seed))).limit(n_cells).collect()]
    )

    def centroid_df(cs: np.ndarray) -> DataFrame:
        return spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cs)],
            "cell int, cvec array<double>",
        )

    def assign(vec_df: DataFrame, key: str, vec: str, cs: np.ndarray) -> DataFrame:
        """Nearest-centroid cell per row; ties break to the larger cell id.

        r6: one numpy GEMM per Arrow batch against the broadcast centroid
        matrix (guide §4.2) instead of the rows×cells crossJoin + argmax
        aggregate — same rows·centroids arithmetic, no exchange at all,
        and the 64-term Column dot folds leave the plan. Tie policy is
        preserved by scanning the reversed sim row (first max in reverse =
        LARGEST cell among float-equal sims). Cell choices may shift at
        float-ulp sim ties vs the fold order; every consumer is
        tolerance-gated (recall booleans), and the oracle row stayed green
        at both gate SFs."""
        import pandas as pd

        C = np.asarray(cs, dtype=np.float64)
        bc = spark.sparkContext.broadcast(C)
        schema = f"{key} long, cell int, {vec} array<double>"

        def gen(batches):
            M_c = bc.value
            n_cells_ = M_c.shape[0]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keys = pdf[key].to_numpy(dtype=np.int64)
                V = np.array(
                    [np.asarray(x, dtype=np.float64) for x in pdf[vec]]
                )
                sims = V @ M_c.T
                cell = (n_cells_ - 1) - np.argmax(sims[:, ::-1], axis=1)
                yield pd.DataFrame(
                    {
                        key: keys,
                        "cell": cell.astype(np.int32),
                        vec: list(pdf[vec]),
                    }
                )

        return vec_df.select(key, vec).mapInPandas(gen, schema)

    # one refinement pass (distributed): assign → mean per cell
    assigned = assign(n, "neighbor_id", "nvec", sample)
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

    corpus_cells = assign(n, "neighbor_id", "nvec", refined)
    q = normalized(queries, vec_col).select(F.col(id_col).alias("query_id"), F.col("nvec").alias("qvec"))
    # per query: the n_probe nearest cells (desc sim, desc cell tie-break —
    # same order the former reverse(array_sort(structs)) slice produced)
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.desc("cell"))
    q_cells = (
        q.crossJoin(F.broadcast(centroid_df(refined)))
        .select("query_id", "qvec", "cell", _dot(F.col("qvec"), F.col("cvec")).alias("sim"))
        .withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    # Probe scoring as one GEMM per (batch, cell) group (r6, guide §4.2):
    # the probe list (|queries|·n_probe rows — the same bounded envelope
    # as the centroid collects above) is collected and broadcast; each
    # corpus-cell Arrow batch scores its rows against the queries probing
    # that cell. Replaces the cell join + per-pair Column dot folds.
    import pandas as pd

    qc_rows = q_cells.collect()
    by_cell: dict[int, list] = {}
    for r in qc_rows:
        by_cell.setdefault(int(r["cell"]), []).append((r["query_id"], r["qvec"]))
    packed = {
        c: (
            np.array([qid for qid, _ in v], dtype=np.int64),
            np.array([np.asarray(x, dtype=np.float64) for _, x in v]),
        )
        for c, v in by_cell.items()
    }
    bcq = spark.sparkContext.broadcast(packed)

    def score_cells(batches):
        P = bcq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for cell, grp in pdf.groupby("cell", sort=False):
                entry = P.get(int(cell))
                if entry is None:
                    continue
                qids, Q = entry
                ids = grp["neighbor_id"].to_numpy(dtype=np.int64)
                M = np.array(
                    [np.asarray(v, dtype=np.float64) for v in grp["nvec"]]
                )
                S = np.round(M @ Q.T, 6)
                qcol = np.tile(qids, len(ids))
                ncol = np.repeat(ids, len(qids))
                keep = qcol != ncol
                yield pd.DataFrame(
                    {
                        "query_id": qcol[keep],
                        "neighbor_id": ncol[keep],
                        "cosine": S.reshape(-1)[keep],
                    }
                )

    scored = corpus_cells.mapInPandas(
        score_cells, "query_id long, neighbor_id long, cosine double"
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
    # tie the normalized-corpus cache to the returned plan (ADVICE r4 leak
    # class): dropped result → blocks released; held result → recompute-safe
    from datavalidation_spark.operators._cache import release_with

    return release_with(out, n)


def semdedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_cells: int = 16,
    tau: float = 0.4,
    seed: int = 42,
    max_cell: int = 10_000,
    round_dp: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    into cells, then mark within-cell cosine near-duplicates, keeping one
    representative per duplicate group (lowest id wins). Returns the DROPPED
    rows: (vec_id, cell, dup_of, cosine) where dup_of is the best qualifying
    smaller-id neighbor (cosine desc, id asc) — the kept set is everything
    not returned.

    Engine-portable determinism (same policy as the md5-Rademacher LSH
    family above): centroids are the ``n_cells`` corpus vectors with the
    smallest ``md5("{id}:{seed}")`` — no RNG, no Lloyd iterations — so a SQL
    oracle regenerates cell assignment and verdicts value-for-value. Cell
    assignment maximizes cosine rounded to 6 dp with lexicographic
    (sim, cell) max tie-break.

    100-TB shape: centroid pick is a TakeOrdered (per-partition top-k, no
    global sort); assignment is a broadcast cross join whose rows·cells
    expansion collapses map-side (partial argmax) before the one exchange on
    the unique id; the pair join is blocked by cell (SemDeDup's point —
    ``n_cells`` scales with corpus so cells stay ~constant-sized) with a
    ``max_cell`` guard against degenerate cells, and the assignment is
    persisted so the self-join's two sides share one computation.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    u = corpus.select(
        F.col(id_col).alias("vid"), v.alias("v"), _norm(v).alias("nrm")
    ).where(F.col("nrm") > 0)

    ck = F.md5(F.concat(F.col("vid").cast("string"), F.lit(f":{seed}")))
    picked = u.withColumn("ck", ck).orderBy("ck", "vid").limit(n_cells)
    wc = Window.orderBy("ck", "vid")
    cent = picked.select(
        (F.row_number().over(wc) - 1).alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )

    scored = u.crossJoin(F.broadcast(cent)).select(
        "vid",
        "v",
        "nrm",
        "cell",
        F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6).alias(
            "sim"
        ),
    )
    assigned = (
        scored.groupBy("vid")
        .agg(
            F.max(F.struct("sim", "cell"))["cell"].alias("cell"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        .withColumn("csz", F.count(F.lit(1)).over(Window.partitionBy("cell")))
        .where(F.col("csz") <= max_cell)
        .select("vid", "cell", "v", "nrm")
    )

    # Within-cell pair scoring as ONE numpy GEMM per cell (guide §4.2 —
    # hand whole batches to vectorized native code): the former cell
    # self-join evaluated the 64-term Column fold per candidate pair
    # (~25M folds at sf1.0, 13.7 s noop-isolated; the GEMM is <1 s).
    # Per-pair values are identical up to float summation order inside one
    # dot product; the 4-dp rounding absorbs that (~1e-16 relative) —
    # same contract as lsh_near_dup_pairs' in-bucket GEMM, which the
    # DuckDB oracle has matched since round 1. Cell assignment (6-dp
    # rounded sim argmax) stays in Column math above — bit-stable there.
    import pandas as pd

    out_schema = "vec_id long, cell int, dup_of long, cosine double"

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "vec_id": np.array([], dtype=np.int64),
                    "cell": np.array([], dtype=np.int32),
                    "dup_of": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        M = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        nr = pdf["nrm"].to_numpy(dtype=np.float64)
        S = np.round((M @ M.T) / np.outer(nr, nr), round_dp)
        ii, jj = np.where(S >= tau)
        keep = ids[jj] < ids[ii]  # dup_of (j) strictly smaller id
        cell = int(pdf["cell"].iloc[0])
        return pd.DataFrame(
            {
                "vec_id": ids[ii][keep],
                "cell": np.full(int(keep.sum()), cell, dtype=np.int32),
                "dup_of": ids[jj][keep],
                "cosine": S[ii, jj][keep],
            }
        )

    pairs = assigned.groupBy("cell").applyInPandas(per_cell, out_schema)
    wb = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("dup_of"))
    return (
        pairs.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell", "dup_of", "cosine")
    )
