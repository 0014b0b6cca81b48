"""Deterministic corpus sampling: hash-fraction and stratified top-k.

Training-data pipelines constantly rebalance corpora (cap an over-represented
language/source, downsample boilerplate-heavy domains). Doing it with
``DataFrame.sample`` is non-reproducible across runs/partitionings; these
operators derive the sampling decision from a portable md5 hash of the row
key, so the SAME rows are kept on any cluster size, any partitioning, any
engine (DuckDB reproduces the hash bit-for-bit — the decisions are
oracle-checkable), and reruns of a resumable pipeline see a stable sample.

Scale shape:

* ``sample_fraction`` is a pure filter — codegen, no shuffle, pushes through
  scans like any predicate.
* ``sample_stratified`` ranks within strata: one shuffle keyed by stratum.
  With FEW hot strata at corpus scale that key is skewed; pass
  ``prefilter=True`` to thin hot strata before the shuffle with a
  hash-threshold pre-filter derived from real per-stratum counts —
  rank order IS the hash, so the filter keeps a superset of the winners
  whenever ≥ k rows survive, which a Chernoff bound makes near-certain
  (see ``sample_stratified``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_rank(key: Column, salt: str = "") -> Column:
    """Deterministic uniform rank in [0, 2^32) from md5(salt|key).

    Engine-portable: DuckDB gets the identical value via
    ``('0x' || substr(md5(salt || '|' || CAST(key AS VARCHAR)), 1, 8))::BIGINT``.
    """
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
    )


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row iff hash_rank(key) < fraction·2^32 — a deterministic
    Bernoulli(fraction) sample that is reproducible across runs, partition
    layouts and engines. Pure filter: no shuffle, survives pushdown."""
    threshold = int(fraction * 4294967296.0)
    return df.where(hash_rank(F.col(key_col), salt) < F.lit(threshold))


def sample_stratified(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "",
    *,
    prefilter: bool = False,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller): the rows with the ``n`` smallest hash ranks, ties broken by
    key. Adds ``sample_rank`` (1-based position within the stratum).

    ``prefilter=True`` thins hot strata before the rank shuffle: a first
    pass counts rows per stratum (map-side-combinable agg; the result is
    #strata rows, broadcast back), then strata with count > 8n drop rows
    with hash_rank ≥ 2^32·8n/count. The cut keeps a superset of the
    winners whenever ≥ n rows survive it; survivors per hot stratum are
    Binomial(count, 8n/count) with mean 8n, so the chance of < n
    survivors is Chernoff-bounded by e^{-3n} — negligible for any real
    cap, and strata at or below 8n are never filtered at all. Turns the
    skewed-stratum shuffle from O(stratum) into O(n) expected rows."""
    ranked = df.withColumn("_hr", hash_rank(F.col(key_col), salt))
    if prefilter:
        counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_cnt"))
        cut = F.when(
            F.col("_cnt") > 8 * n_per_stratum,
            (F.lit(4294967296.0) * 8 * n_per_stratum / F.col("_cnt")).cast(
                "long"
            ),
        ).otherwise(F.lit(1 << 32))
        ranked = (
            ranked.join(F.broadcast(counts), stratum_col)
            .where(F.col("_hr") < cut)
            .drop("_cnt")
        )
    w = Window.partitionBy(stratum_col).orderBy("_hr", key_col)
    return (
        ranked.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
        .drop("_hr")
    )


def sample_mixture(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Downsample to a target mixture: ``targets`` maps stratum value →
    desired share of the OUTPUT corpus (domain/language rebalancing — the
    standard pretraining-mix operation). Never upsamples: the achievable
    output size is N_out = min_s(count_s / target_s); each stratum keeps
    the deterministic hash-fraction ``N_out · target_s / count_s`` of its
    rows (the binding stratum keeps everything). Strata absent from
    ``targets`` are dropped — they have zero weight in the mix.

    Fully declarative, no driver collect: the per-stratum counts are a
    map-side-combinable agg producing #strata rows; the binding ratio is a
    scalar agg over that; both broadcast back onto the corpus as join-free
    literals via a tiny cross/broadcast join, and the keep decision is the
    same portable md5 threshold as ``sample_fraction`` — identical rows
    survive on any partitioning, any cluster size, any engine. The keep
    fraction is computed with a fixed IEEE expression order
    (``least(1.0, (min_ratio * target) / count)``) so the DuckDB oracle
    reproduces the exact threshold bit-for-bit.
    """
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{stratum_col} string, _tgt double",
    )
    counts = (
        df.join(F.broadcast(tgt), stratum_col)
        .groupBy(stratum_col, "_tgt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    binding = counts.agg(
        F.min(F.col("_cnt") / F.col("_tgt")).alias("_nout")
    )
    plan = (
        counts.crossJoin(F.broadcast(binding))
        .select(
            stratum_col,
            F.least(
                F.lit(1.0), F.col("_nout") * F.col("_tgt") / F.col("_cnt")
            ).alias("_keep"),
        )
    )
    return (
        df.join(F.broadcast(plan), stratum_col)
        .where(
            hash_rank(F.col(key_col), salt)
            < F.floor(F.col("_keep") * F.lit(4294967296.0))
        )
        .drop("_keep")
    )


def sample_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "lang",
    key_col: str = "doc_id",
    n_tokens: Column | None = None,
    salt: str = "budget",
    default_budget: int = 0,
    n_rank_buckets: int = 4096,
) -> DataFrame:
    """Token-budget sampling: per domain, keep documents in deterministic
    md5-rank order until the domain's TOKEN budget is exhausted ("sample
    50B tokens of code, 20B of forums" — the unit a pretraining mixture is
    actually specified in, vs the row-count mixtures of
    :func:`sample_mixture`).

    Semantics (shared verbatim with the oracle): within a domain, order by
    ``(hash_rank(key), key)``; keep a doc iff the running INCLUSIVE token
    sum up to it is <= the domain budget (prefix rule — one over-budget doc
    blocks everything after it in rank order, so the kept set is a pure
    function of the corpus and budgets).

    100-TB shape: a naive per-domain ordered cumsum is one window partition
    per domain — a single reducer sorting 10^11 rows for a hot domain.
    Instead the rank space is cut into ``n_rank_buckets`` fixed slices
    (rank >> 20 for 4096): (1) a bucket-level token-sum aggregation
    (map-side combined; output is |domains|x4096 rows) gives each bucket
    its exclusive prefix ``cum_before`` via a window over the TINY bucket
    table; (2) the only row-level window runs per (domain, rank-bucket) —
    each partition is ~1/4096 of a domain, bounded and skew-free because
    ranks are uniform md5 hashes. Total: one tiny aggregation shuffle + one
    bounded window shuffle; equality with the naive cumsum is exact because
    bucket id is monotone in rank. Cost caveat: the input is SCANNED TWICE
    (the bucket-sum aggregation and the join+window are separate passes
    over ``df``) — pre-persist the input, or feed a cheap projected scan,
    when the second pass matters.

    NULL handling: a NULL domain falls under ``default_budget`` (grouped
    internally via a sentinel so the join keeps the rows); NULL token
    counts count as 0 (the row is admitted if the running sum allows,
    matching the window-sum null-skip and the streaming twin).

    Returns the kept rows plus ``cum_tokens`` (the inclusive running sum —
    auditable against the budget).
    """
    if n_tokens is None:
        from .text import token_count_ws

        n_tokens = token_count_ws(F.col("text"))
    if n_rank_buckets < 1:
        raise ValueError(f"n_rank_buckets must be >= 1, got {n_rank_buckets}")
    budget_expr = F.lit(default_budget)
    for dom, b in budgets.items():
        budget_expr = F.when(F.col(domain_col) == dom, F.lit(b)).otherwise(
            budget_expr
        )
    base = (
        df.withColumn("_tok", F.coalesce(n_tokens.cast("long"), F.lit(0)))
        .withColumn("_rank", hash_rank(F.col(key_col), salt))
        # null-safe internal grouping key: NULL domains must ride the join
        # (they fall under default_budget), so they group under a sentinel
        .withColumn(
            "_dom", F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00"))
        )
    )
    # 2^32 rank space >> (32-bits); non-power-of-two bucket counts round UP
    # so per-bucket partitions never exceed what the caller sized for
    bits = min((n_rank_buckets - 1).bit_length(), 32) if n_rank_buckets > 1 else 0
    shift = 32 - bits
    base = base.withColumn("_rb", F.shiftright("_rank", shift).cast("int"))

    bucket_sums = base.groupBy("_dom", "_rb").agg(F.sum("_tok").alias("_btok"))
    wb = Window.partitionBy("_dom").orderBy("_rb")
    cum_before = bucket_sums.withColumn(
        "_cum_before", F.coalesce(F.sum("_btok").over(wb), F.lit(0)) - F.col("_btok")
    ).select("_dom", "_rb", "_cum_before")

    wr = Window.partitionBy("_dom", "_rb").orderBy("_rank", key_col)
    out = (
        base.join(F.broadcast(cum_before), ["_dom", "_rb"])
        .withColumn("_cum_in", F.sum("_tok").over(wr))
        .withColumn("cum_tokens", F.col("_cum_before") + F.col("_cum_in"))
        .where(F.col("cum_tokens") <= budget_expr)
        .drop("_tok", "_rank", "_rb", "_btok", "_cum_before", "_cum_in", "_dom")
    )
    return out


def split_bounds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, cumulative upper bound in the 2^32 rank space) per split, in
    ``weights`` order. Shared by :func:`assign_split` and external oracles so
    the float→int boundary arithmetic is computed in exactly one place."""
    if not weights:
        raise ValueError("weights must be non-empty")
    for n, w in weights.items():
        # each weight individually positive and finite: a negative weight
        # would silently empty its own and earlier splits (negative bound),
        # and NaN would corrupt every downstream bound
        if not (float(w) > 0.0):
            raise ValueError(f"split weight {n!r} must be > 0, got {w!r}")
    total = float(sum(weights.values()))
    cum, out = 0.0, []
    for n, w in weights.items():
        cum += w / total
        out.append((n, min(int(cum * 4294967296.0), 4294967296)))
    # clamp the last interval so float rounding can never leave a row out
    out[-1] = (out[-1][0], 4294967296)
    return out


def assign_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds ``out`` = the split name
    whose cumulative hash-rank interval contains md5(salt|key).

    ``weights`` maps split name → share (normalized; insertion order fixes
    the interval layout, so pass an ordered dict and keep it stable — the
    SAME doc lands in the same split on any cluster size, partitioning,
    engine, or rerun, which is what makes eval splits trustworthy: a
    re-shuffled ingest can never leak a training doc into the held-out set.
    Pure projection — no shuffle, no UDF; the decision column costs one md5
    per row inside codegen.
    """
    if out in df.columns:
        raise ValueError(
            f"input already has a {out!r} column — pass a different `out` "
            "name (withColumn would silently clobber it)"
        )
    rank = hash_rank(F.col(key_col), salt)
    # chained whens in ascending bound order: first matching interval wins.
    # NULL keys produce a NULL rank (every `<` is NULL) and fall to the
    # otherwise-branch — the LAST split — so total coverage holds even for
    # degenerate keys, matching a SQL CASE ... ELSE replay of the bounds.
    bounds = split_bounds(weights)
    expr = None
    for n, b in bounds[:-1]:
        cond = rank < F.lit(b)
        expr = F.when(cond, F.lit(n)) if expr is None else expr.when(cond, F.lit(n))
    last = F.lit(bounds[-1][0])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))
