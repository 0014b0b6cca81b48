"""Multimodal plumbing + Structured-Streaming validation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.datagen import synth_documents
from datavalidation_spark.engine.spans import span_rules
from datavalidation_spark.engine.validate import validate_documents
from datavalidation_spark.operators.multimodal import (
    FakeDecoder,
    extract_features,
    frame_sample_plan,
    synth_media,
)
from datavalidation_spark.streaming.validate_stream import run_file_stream


def test_extract_features_batch_plumbing(spark):
    media = synth_media(spark, 200)
    feats = extract_features(media, FakeDecoder(dim=8))
    rows = feats.collect()
    assert len(rows) == 200
    ok = [r for r in rows if r.decode_ok == "ok"]
    assert len(ok) == 200
    assert all(len(r.feature) == 8 for r in ok)
    assert all(0.0 <= x < 1.0 for r in ok for x in r.feature)
    # deterministic: same payload → same feature
    again = {r.media_ref: r.feature for r in extract_features(media, FakeDecoder(dim=8)).collect()}
    assert all(again[r.media_ref] == r.feature for r in rows)


def test_extract_features_error_isolation(spark):
    media = synth_media(spark, 50).withColumn(
        "payload",
        F.when(F.col("media_ref") == "asset_00000007", F.lit(b"")).otherwise(
            F.col("payload")
        ),
    )
    rows = extract_features(media).collect()
    bad = [r for r in rows if r.decode_ok != "ok"]
    assert len(bad) == 1 and bad[0].media_ref == "asset_00000007"
    assert bad[0].feature is None
    assert len([r for r in rows if r.decode_ok == "ok"]) == 49


def test_frame_sampling(spark):
    # real pixel resize is covered in test_codecs.py::test_resize_images_real_pixels
    media = synth_media(spark, 100)
    plan = frame_sample_plan(media, every_n=10).collect()
    assert len(plan) > 0
    for r in plan:
        assert list(r.frame_indices) == list(range(0, max(r.frame_indices) + 1, 10))


def test_streaming_matches_batch(spark, tmp_path):
    """availableNow file stream produces exactly the batch violation set."""
    docs = synth_documents(spark, 2000, dirty=True)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    docs.write.parquet(in_dir)

    stored = spark.read.parquet(in_dir)
    q = run_file_stream(spark, in_dir, ck_dir, out_dir, stored.schema)
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.rule_id)
        for r in spark.read.parquet(out_dir).select("doc_id", "rule_id").collect()
    }
    want = {
        (r.doc_id, r.rule_id)
        for r in validate_documents(stored, check_unique=False)
        .violations.select("doc_id", "rule_id")
        .collect()
    }
    assert got == want and len(want) > 0
