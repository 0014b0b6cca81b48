"""Referential-integrity checks (SURVEY.md J6).

Reference analog: "present in dim?" lookups with defaults
(``streamlit_app.py:76-82``, ``boiler_consumption_validation.py:23-30``).
Target: every ``media_ref`` in the documents table must exist in the asset
catalog.

Scale shape: extract the distinct referenced keys FIRST (map-side partial
distinct inside the aggregate), so the anti-join runs on |distinct refs| not
|spans|; the catalog side is broadcast when small, else a shuffle hash join
that AQE will skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referenced_media(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Distinct (doc_id, media_ref) pairs from media spans — explode is
    confined to the two columns actually needed (nested-schema pruning keeps
    the scan narrow)."""
    # direct nested-field extraction (spans.media_ref) instead of a HOF over
    # the whole struct — keeps parquet nested-schema pruning effective, so
    # this scan reads ONLY the media_ref leaf column
    refs = F.filter(F.col(f"{spans_col}.media_ref"), lambda r: r.isNotNull())
    return df.select("doc_id", F.explode(refs).alias("media_ref")).distinct()


def dangling_media_refs(
    docs: DataFrame,
    asset_catalog: DataFrame,
    spans_col: str = "spans",
    broadcast_catalog: bool = True,
) -> DataFrame:
    """Violation rows REF-DANGLING: media_refs absent from the catalog."""
    refs = referenced_media(docs, spans_col)
    catalog = asset_catalog.select("media_ref")
    if broadcast_catalog:
        catalog = F.broadcast(catalog)
    return refs.join(catalog, "media_ref", "left_anti").select(
        "doc_id",
        F.lit("REF-DANGLING").alias("rule_id"),
        F.lit("error").alias("severity"),
        F.format_string("media_ref %s not found in asset catalog", "media_ref").alias(
            "remarks"
        ),
    )
