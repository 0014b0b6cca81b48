"""Multimodal column operators: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing, UDF
signatures — is real and tested. The codec layer has two tiers:
``StdlibDecoder`` REALLY decodes image/bmp + audio/wav (pure stdlib,
operators/codecs.py — decode → pixels/PCM → resize/features → re-encode,
end to end); formats that need external libraries (JPEG/MP4) stay behind
the same ``Decoder`` interface (swap in Pillow/torchaudio/PyAV in
production; ``FakeDecoder`` remains the deterministic test stand-in).

Scale shape: ``mapInPandas`` streams Arrow batches, so executor-Python peak
memory is one batch of payloads, not one partition. Media tables should set
``spark.sql.files.maxPartitionBytes`` down (payloads are wide) and
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound batch bytes:
records/batch × mean payload must fit the Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),   # image/png, audio/wav, ...
        StructField("payload", BinaryType()),       # opaque encoded bytes
        StructField("width", IntegerType()),        # typed metadata (images)
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),  # (audio)
        StructField("n_frames", IntegerType()),     # (video)
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),
        StructField("payload_bytes", IntegerType()),
        StructField("payload_sha1", StringType()),
        StructField("feature", ArrayType(FloatType())),  # decoded feature vec
        StructField("decode_ok", StringType()),          # ok | error:<msg>
    ]
)


class Decoder:
    """Codec interface. Production: Pillow / soundfile / PyAV per type."""

    def decode(self, media_type: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "no media codecs in this environment — plug a real Decoder"
        )


@dataclass
class FakeDecoder(Decoder):
    """Deterministic stand-in: 'decodes' bytes into a fixed-dim feature by
    hashing payload windows. Lets every pipeline stage run + be tested."""

    dim: int = 8

    def decode(self, media_type: str, payload: bytes) -> np.ndarray:
        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.dim * 4) // len(h) + 1))[: self.dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0


@dataclass
class StdlibDecoder(Decoder):
    """REAL decoder for the formats the standard library can parse —
    image/bmp (struct) and audio/wav (wave) — via operators/codecs.py;
    features are deterministic block-mean / windowed-RMS vectors. Formats
    needing external codecs (JPEG, MP4) raise, exactly as a production
    decoder would for an unregistered type. Closes the round-1 codec stub
    for image+audio end to end."""

    dim: int = 8

    def decode(self, media_type: str, payload: bytes) -> np.ndarray:
        from datavalidation_spark.operators import codecs

        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        if media_type == "image/bmp":
            return codecs.image_features(codecs.decode_bmp(payload), self.dim)
        if media_type == "audio/wav":
            samples, _rate = codecs.decode_wav(payload)
            return codecs.audio_features(samples, self.dim)
        raise ValueError(f"no stdlib codec for {media_type}")


def synth_media_real(spark, n: int, seed: int = 42) -> DataFrame:
    """Media table with REAL encoded payloads: valid 24-bit BMPs and PCM
    WAVs generated deterministically per id (mapInPandas — the encode step
    runs distributed, one Arrow batch at a time)."""
    from datavalidation_spark.operators import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                if i % 2 == 0:
                    w, h = int(rng.integers(4, 33)), int(rng.integers(4, 33))
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    rows.append(
                        dict(
                            media_ref=f"asset_{i:08d}", media_type="image/bmp",
                            payload=codecs.encode_bmp(px), width=w, height=h,
                            sample_rate=None, n_frames=None,
                        )
                    )
                else:
                    rate = 16_000
                    nsamp = int(rng.integers(100, 2000))
                    samples = (
                        np.sin(np.arange(nsamp) * (2 * np.pi * 440 / rate)) * 12000
                    ).astype(np.int16)
                    rows.append(
                        dict(
                            media_ref=f"asset_{i:08d}", media_type="audio/wav",
                            payload=codecs.encode_wav(samples, rate), width=None,
                            height=None, sample_rate=rate, n_frames=nsamp,
                        )
                    )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode BMP → nearest-neighbor resample → re-encode
    (mapInPandas; non-image rows pass through untouched). The round-1
    ``resize_stub`` kept only the metadata math — this is the pixel path."""
    from datavalidation_spark.operators import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if mtype == "image/bmp" and payload:
                    px = codecs.resize_nearest(codecs.decode_bmp(payload), width, height)
                    out_payload.append(codecs.encode_bmp(px))
                    out_w.append(width)
                    out_h.append(height)
                else:
                    out_payload.append(payload)
                    out_w.append(pdf["width"].iloc[len(out_w)])
                    out_h.append(pdf["height"].iloc[len(out_h)])
            res = pdf.copy()
            res["payload"] = out_payload
            res["width"] = pd.array(out_w, dtype="Int32")
            res["height"] = pd.array(out_h, dtype="Int32")
            yield res

    return media.mapInPandas(run, media.schema)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table (payload = seeded bytes)."""
    base = spark.range(n)
    r = F.abs(F.xxhash64(F.lit(seed), F.col("id")))
    kinds = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    return base.select(
        F.format_string("asset_%08d", F.col("id")).alias("media_ref"),
        F.element_at(kinds, (r % 3 + 1).cast("int")).alias("media_type"),
        # payload: deterministic pseudo-bytes from repeated sha-domain strings
        F.encode(
            F.repeat(F.concat(F.lit("blob"), r.cast("string")), (r % 50 + 2).cast("int")),
            "utf-8",
        ).alias("payload"),
        (r % 1920 + 16).cast("int").alias("width"),
        (r % 1080 + 16).cast("int").alias("height"),
        F.when(r % 3 == 1, F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(r % 3 == 2, (r % 300 + 1).cast("int")).alias("n_frames"),
    )


def extract_features(
    media: DataFrame, decoder: Decoder | None = None, dim: int = 8
) -> DataFrame:
    """Decode + feature-extract each payload via mapInPandas.

    Errors never kill the job: per-record decode failures are recorded in
    ``decode_ok`` (mirrors the reference's exception→remark conversion,
    ``me_consumption_validation.py:143-146``)."""
    dec = decoder or FakeDecoder(dim=dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                try:
                    feats.append([float(x) for x in dec.decode(mtype, payload)])
                    status.append("ok")
                except Exception as e:  # noqa: BLE001 — error → record, not crash
                    feats.append(None)
                    status.append(f"error:{e}")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "payload_sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(b).hexdigest() if b else None
                    ),
                    "feature": feats,
                    "decode_ok": status,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: which frame indices to decode per asset —
    pure Column math (sequence stepped by every_n); the decode is the stub."""
    return media.where(F.col("media_type") == "video/mp4").select(
        "media_ref",
        F.sequence(
            F.lit(0), F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(every_n)
        ).alias("frame_indices"),
    )
