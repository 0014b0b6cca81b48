"""Data-layout optimization: cluster parquet files so scans can skip.

At 100 TB the cheapest scan is the one that never happens: parquet footers
carry per-row-group min/max statistics, and both Spark's reader and Iceberg's
manifest pruning skip files/row-groups whose stats exclude the predicate.
Those stats are only selective if the data is CLUSTERED — a randomly-ordered
table has every file spanning the whole value range, so nothing skips.

Two clustering modes:

* ``range`` — ``repartitionByRange`` + ``sortWithinPartitions`` on the given
  columns: perfect skipping on the leading column (files own disjoint
  ranges), nothing for the others. Right for one dominant filter column.
* ``zorder`` — sort by the Morton (Z-order) interleaving of the columns'
  rank spaces: every file owns a small HYPER-RECTANGLE of the value space,
  so point/range predicates on ANY of the clustered columns skip most
  files. Right for multi-column filter workloads (the classic
  OPTIMIZE ... ZORDER BY).

The Z-value is computed entirely in Column expressions (shift/or bit
spreading — no UDF): each column is first rank-normalized to 21 bits via
``percent_rank`` (ranks, not raw values, so skew cannot collapse the curve),
then bit-interleaved. 2 or 3 columns supported (2×21 = 42 bits, 3×21 = 63
bits — fits an int64).

``file_stats`` reads the written parquet footers with pyarrow and returns
per-file min/max per column — the evidence that skipping WOULD happen,
asserted in tests rather than claimed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BITS = 21


def _spread_bits(v: Column, stride: int) -> Column:
    """Spread the low 21 bits of ``v`` so consecutive bits land ``stride``
    apart (stride 2 → Morton for 2 cols, 3 → for 3). Plain shift/or loop —
    21 terms, all JVM-side, folded by codegen into one expression."""
    out = F.lit(0).cast("long")
    for i in range(_BITS):
        bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit, i * stride))
    return out


def z_value(*cols: Column) -> Column:
    """Morton interleave of 2-3 rank columns (each already in [0, 2^21))."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("z_value interleaves 2 or 3 columns")
    stride = len(cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        out = out.bitwiseOR(F.shiftleft(_spread_bits(c.cast("long"), stride), j))
    return out


def with_z_column(
    df: DataFrame, cols: list[str], out_col: str = "_z"
) -> DataFrame:
    """Rank-normalize each column to 21 bits and attach the Z-value.

    ``percent_rank`` runs in an un-partitioned window per column —
    acceptable because the rank pass is one sort of (column) pairs, and at
    real scale you would substitute a sampled CDF (approx quantiles as
    spline knots); the interleave itself is embarrassingly parallel.
    NULLs rank first (Spark default), so they cluster together — which is
    what a null-heavy filter wants anyway.
    """
    ranked = df
    rank_cols = []
    for c in cols:
        r = F.percent_rank().over(Window.orderBy(F.col(c)))
        rc = f"_rank_{c}"
        ranked = ranked.withColumn(
            rc, (r * ((1 << _BITS) - 1)).cast("long")
        )
        rank_cols.append(rc)
    z = z_value(*[F.col(rc) for rc in rank_cols])
    return ranked.withColumn(out_col, z).drop(*rank_cols)


def optimize_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    mode: str = "range",
    n_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` to ``path`` clustered for scan-pruning on ``cols``.

    ``zorder`` caveats: the cell count rounds n_files UP to a power of two
    (2^ceil(log2(n_files)) directories), and reading the path back surfaces
    ``_zcell`` as an extra partition column (droppable). Cells are
    equal-POPULATION boxes because the z-value interleaves percent_rank
    spaces — the only cell-skew source is heavy TIES on the clustered
    columns (ties share one rank, hence one cell). Such a hot cell is
    written by a single task; pass ``max_records_per_file`` to at least
    split its output into multiple files so scan parallelism survives
    (the write-side straggler remains — pick different clustering columns
    if a value dominates)."""
    writer_opts = (
        {"maxRecordsPerFile": str(max_records_per_file)}
        if max_records_per_file
        else {}
    )
    if mode == "range":
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
        out.write.options(**writer_opts).mode("overwrite").parquet(path)
    elif mode == "zorder":
        zed = with_z_column(df, cols)
        # Align file boundaries to Z-CELLS (the top ceil(log2(n_files))
        # bits of the z-value) BY CONSTRUCTION: one output directory per
        # cell, so every file's min/max box is a sub-box of exactly one
        # cell. The earlier repartitionByRange(cell, _z) approach let the
        # range exchange's SAMPLED boundaries land mid-cell; the straddling
        # file's box then widened to the union of two cells and pruning
        # measurably (and nondeterministically) halved. Directory-per-cell
        # is also the production layout: engines prune on the partition
        # value before ever reading a footer. The hash repartition on the
        # cell id colocates each cell; a hash collision only means one
        # writer task emits two (still single-cell) files.
        total_bits = _BITS * len(cols)
        cell_bits = max(1, (n_files - 1).bit_length())
        cell = F.shiftright(F.col("_z"), total_bits - cell_bits)
        out = (
            zed.withColumn("_zcell", cell)
            .repartition(n_files, F.col("_zcell"))
            .sortWithinPartitions("_zcell", "_z")
            .drop("_z")
        )
        out.write.options(**writer_opts).mode("overwrite").partitionBy(
            "_zcell"
        ).parquet(path)
    else:
        raise ValueError(f"unknown layout mode {mode!r}")


def file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max for ``cols`` from the footers (pyarrow) —
    the pruning evidence: a predicate outside [min, max] skips the file."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    # recursive: covers both flat layouts (range mode) and the zorder
    # mode's directory-per-cell layout
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        lo: dict = {}
        hi: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                s = col.statistics
                if s.min is not None:
                    lo[name] = min(lo.get(name, s.min), s.min)
                if s.max is not None:
                    hi[name] = max(hi.get(name, s.max), s.max)
        out.append(
            {
                "file": os.path.basename(f),
                "rows": md.num_rows,
                **{f"min_{c}": lo.get(c) for c in cols},
                **{f"max_{c}": hi.get(c) for c in cols},
            }
        )
    return out


def pruned_fraction(stats: list[dict], col: str, value) -> float:
    """Fraction of files a point predicate ``col = value`` can skip, given
    ``file_stats`` output — the number the layout is optimizing."""
    files = [s for s in stats if s[f"min_{col}"] is not None]
    if not files:
        return 0.0
    skipped = sum(
        1 for s in files if not (s[f"min_{col}"] <= value <= s[f"max_{col}"])
    )
    return skipped / len(files)
