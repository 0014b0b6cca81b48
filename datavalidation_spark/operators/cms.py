"""Count-min sketch — heavy-hitter / frequency estimation as a mergeable
sketch in pure Column ops (no UDF, no driver state).

Why a sketch when ``groupBy(token).count()`` is already scalable: at
web scale the distinct-key set itself is the problem — an exact top-k over
10^11 distinct tokens shuffles every (token, partial-count) pair. The CMS
shuffles at most ``depth x width`` CELLS per map partition (map-side
combine collapses rows into cells first), a fixed few-KB budget per
partition regardless of key cardinality, and the merged sketch answers any
point query afterwards.

Shape (Cormode & Muthukrishnan 2005, public): ``depth`` independent hash
rows of ``width`` cells; increment one cell per row per item; a point
estimate is the MIN over rows — never an underestimate, overestimates by
at most eps*N (eps ~ e/width) with probability 1 - (1/2)^depth.

Spark mapping: cell ids are ``pmod(xxhash64(key, seed+row), width)``
Column expressions; the sketch is the sparse (d, cell, cnt) aggregation of
an exploded per-row struct array — ONE shuffle, partially aggregated
map-side into <= depth*width cells. Merging sketches built on disjoint
slices is the same groupBy-sum, which a unit test asserts directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, d: int, width: int, seed: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed + d)), F.lit(width))


def cms_build(
    items: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse sketch rows (d, cell, cnt) — at most depth*width of them.
    ``weight_col`` supports weighted counts (e.g. bytes per doc)."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cell(key, d, width, seed).alias("cell")
            )
            for d in range(depth)
        ]
    )
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        items.select(F.explode(cells).alias("dc"), w.alias("_w"))
        .groupBy("dc.d", "dc.cell")
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Point estimates for every row of ``keys``: min over the sketch rows'
    cells (absent sparse cells count 0). Broadcast the probe side — the
    sketch may be wide but key sets for lookup are small; for large key
    sets the (d, cell) equi-join shuffles fine either way."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(key, d, width, seed).alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc"),
    ).select(key_col, "dc.d", "dc.cell")
    joined = probes.join(sketch, ["d", "cell"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cms_est"))
