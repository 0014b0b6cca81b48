"""Streaming CDC apply: upsert a change stream into a manifest-log table.

The batch pair ``engine/reconcile.py::merge_upsert`` (MERGE semantics) +
``engine/acid.py::ManifestLog`` (atomic snapshot commits with
overwrite-replace) composes into a streaming CDC sink: every micro-batch of
changes (updates / inserts / optional delete flags) is merged against the
current snapshot and the merged result is committed as a NEW overwrite
snapshot in one atomic step.

Exactly-once without a transaction coordinator: Structured Streaming
re-delivers a micro-batch whose ``foreachBatch`` ran but whose checkpoint
write was lost (crash in between). The sink records ``cdc_batch_id`` in
each commit's meta and SKIPS a batch id it has already committed — replays
become no-ops, so the table state is exactly-once even though delivery is
at-least-once. (The standard foreachBatch idempotence contract, same as
Delta's ``txnVersion``/``txnAppId``.)

Time travel comes free: every micro-batch is a manifest snapshot, so
``log.read_at`` reconstructs the table as of any batch — per-batch lineage
for a CDC feed, matching the north_star's per-partition lineage clause on
the write path.

100 TB notes: merge_upsert anti-joins the big snapshot against the small
changeset's keys (broadcast when it fits), so per-batch cost is one pass
over the snapshot + one commit. For huge targets, partition the table and
merge only partitions the changeset touches (diverging_partitions gives
exactly that set); the full-snapshot rewrite here is the simplest correct
shape and the one the contract tests pin down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from datavalidation_spark.engine.acid import ManifestLog
from datavalidation_spark.engine.reconcile import merge_upsert


def applied_batches(log: ManifestLog, table: str) -> set[int]:
    """Batch ids already committed for ``table`` (from snapshot meta).

    Reads both live per-commit metadata and the per-table ``cdc_applied``
    union that ``expire_snapshots`` folds into its boundary entry — so the
    exactly-once replay guard survives snapshot expiry."""
    out: set[int] = set()
    for _, meta in log.snapshots():
        if meta.get("cdc_table") == table and "cdc_batch_id" in meta:
            out.add(int(meta["cdc_batch_id"]))
        for b in meta.get("cdc_applied", {}).get(table, []):
            out.add(int(b))
    return out


def apply_cdc_batch(
    log: ManifestLog,
    table: str,
    changes: DataFrame,
    batch_id: int,
    key_cols: list[str],
    delete_col: str | None = None,
) -> bool:
    """Merge one micro-batch of changes into ``table``; False if this
    batch id was already applied (replay after a crash — no-op)."""
    if batch_id in applied_batches(log, table):
        return False
    spark = changes.sparkSession
    out_cols = [c for c in changes.columns if c != delete_col]
    current = log.read(spark, table)
    if current is None:
        from pyspark.sql import functions as F

        merged = changes
        if delete_col is not None:
            merged = merged.where(~F.coalesce(F.col(delete_col), F.lit(False)))
        merged = merged.select(*out_cols)
    else:
        merged = merge_upsert(current, changes, key_cols, delete_col=delete_col)
    # localCheckpoint BEFORE staging: the merged plan reads the files the
    # replace commit is about to supersede — materialize first so the write
    # never races its own input (and the lineage does not re-read the old
    # snapshot through the manifest during the staged write).
    merged = merged.localCheckpoint(eager=True)
    log.commit(
        {table: merged},
        meta={"cdc_table": table, "cdc_batch_id": int(batch_id)},
        replace=True,
    )
    return True


def cdc_sink(
    changes: DataFrame,
    log_root: str,
    table: str,
    key_cols: list[str],
    *,
    delete_col: str | None = None,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start the streaming query applying ``changes`` to ``table``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            ManifestLog(log_root), table, batch_df, batch_id,
            key_cols, delete_col=delete_col,
        )

    w = changes.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
