"""Real-codec tests: BMP/WAV round trips (pure stdlib), nearest-neighbor
resize, deterministic features, and the Spark decode/resize paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datavalidation_spark.operators import codecs


def test_bmp_round_trip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 4)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = codecs.decode_bmp(codecs.encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"not a bitmap at all")


def test_wav_round_trip_exact():
    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    back, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_resize_nearest_shapes_and_identity():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = codecs.resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    # identity resize is exact
    assert np.array_equal(codecs.resize_nearest(px, 2, 2), px)
    # each upsampled quadrant replicates the source pixel
    assert np.array_equal(up[:2, :2], np.broadcast_to(px[0, 0], (2, 2, 3)))


def test_features_deterministic_and_bounded():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    f1 = codecs.image_features(px, dim=8)
    f2 = codecs.image_features(px, dim=8)
    assert np.array_equal(f1, f2) and f1.shape == (8,)
    assert ((f1 >= 0) & (f1 <= 1)).all()
    wav = (np.sin(np.arange(500) / 10) * 10000).astype(np.int16)
    a = codecs.audio_features(wav, dim=8)
    assert a.shape == (8,) and ((a >= 0) & (a <= 1)).all()


def test_stdlib_decoder_end_to_end_spark(spark):
    from datavalidation_spark.operators.multimodal import (
        StdlibDecoder,
        extract_features,
        synth_media_real,
    )

    media = synth_media_real(spark, 20)
    feats = extract_features(media, decoder=StdlibDecoder(dim=8))
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r.decode_ok == "ok" for r in rows), [
        r.decode_ok for r in rows if r.decode_ok != "ok"
    ]
    assert all(len(r.feature) == 8 for r in rows)
    # determinism: second run bit-identical
    again = {r.media_ref: r.feature for r in extract_features(
        media, decoder=StdlibDecoder(dim=8)).collect()}
    for r in rows:
        assert again[r.media_ref] == r.feature


def test_resize_images_real_pixels(spark):
    from datavalidation_spark.operators.multimodal import (
        resize_images,
        synth_media_real,
    )

    media = synth_media_real(spark, 10)
    resized = resize_images(media, 8, 6)
    rows = resized.where(F.col("media_type") == "image/bmp").collect()
    assert rows, "expected image rows"
    for r in rows:
        assert (r.width, r.height) == (8, 6)
        px = codecs.decode_bmp(bytes(r.payload))
        assert px.shape == (6, 8, 3)
    # audio rows pass through with payload intact
    audio = resized.where(F.col("media_type") == "audio/wav").collect()
    orig = {
        r.media_ref: bytes(r.payload)
        for r in media.where(F.col("media_type") == "audio/wav").collect()
    }
    for r in audio:
        assert bytes(r.payload) == orig[r.media_ref]
