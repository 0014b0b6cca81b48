"""Multimodal column operators: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing, UDF
signatures — is real and tested; the codec step itself is stubbed behind
``Decoder`` implementations because no image/audio libraries exist in this
container (swap ``FakeDecoder`` for a Pillow/torchaudio/PyAV-backed one in
production; the interface is the contract).

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


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: metadata math is real (aspect, scale factors); pixel
    resample is the stubbed codec step (payload passed through unchanged)."""
    return media.withColumns(
        {
            "target_width": F.lit(width),
            "target_height": F.lit(height),
            "scale_x": F.round(F.lit(width) / F.col("width"), 6),
            "scale_y": F.round(F.lit(height) / F.col("height"), 6),
        }
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: which frame indices to decode per asset —
    pure Column math (sequence stepped by every_n); the decode is the stub."""
    return media.where(F.col("media_type") == "video/mp4").select(
        "media_ref",
        F.sequence(
            F.lit(0), F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(every_n)
        ).alias("frame_indices"),
    )
