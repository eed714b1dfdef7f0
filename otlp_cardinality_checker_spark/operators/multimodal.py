"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as `binary` columns
with typed metadata; decode/feature-extraction runs as Arrow-batched pandas
UDFs over `mapInPandas`. The decode kernels themselves are STUBBED here
(the container has no image/audio libraries): `decode_stub=True` produces a
deterministic fake feature vector from the bytes, and `decode_stub=False`
raises NotImplementedError at evaluation time — the Spark-side plumbing
(schema, batch iteration, partition sizing) is real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

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
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 131 + j * 17) % 256) for j in range(64 + i % 64))
        rows.append(
            (
                f"media_{i:05d}",
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    modality
                ],
                64 + i % 512 if modality != "audio" else None,
                48 + i % 256 if modality != "audio" else None,
                1000 + i * 33 if modality != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, n_features: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real deployments replace `_fake_features` with an actual decoder
    (PIL/librosa/ffmpeg); the UDF signature, batch shape, and output schema
    are exactly what that swap needs.
    """

    def _fake_features(payload: bytes, k: int) -> list[float]:
        if payload is None:
            return [0.0] * k
        acc = [0] * k
        for j, b in enumerate(payload):
            acc[j % k] = (acc[j % k] + b) & 0xFFFF
        return [a / 65535.0 for a in acc]

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries "
                    "not present in this container"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": pdf["payload"].map(
                        lambda p: _fake_features(p, n_features)
                    ),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def modality_stats(features: DataFrame) -> DataFrame:
    return features.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("avg_f0"),
    )


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing for image rows: same MEDIA_SCHEMA out, metadata
    updated to the target dimensions. The pixel kernel is stubbed (no
    image libraries in this container): the stub deterministically
    re-samples the payload bytes to the target byte budget, which
    preserves exactly what the real PIL/opencv swap needs — per-row bytes
    in, transformed bytes out, Arrow-batched, non-image rows passed
    through untouched."""

    budget = max(width * height // 64, 16)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resizing requires PIL/opencv, not present "
                    "in this container"
                )

            def _resize(row):
                p = row["payload"]
                # `not p` also covers b'': indexing an empty payload would
                # IndexError, and there is nothing to resample anyway
                if row["modality"] != "image" or not p:
                    return p
                return bytes(p[(j * len(p)) // budget] for j in range(budget))

            out = pdf.copy()
            out["payload"] = pdf.apply(_resize, axis=1)
            # only rows whose bytes were actually produced get the new
            # dimensions — metadata must never claim a resize that the
            # payload pass-through skipped
            is_img = (out["modality"] == "image") & out["payload"].map(
                lambda p: bool(p)
            )
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_SCHEMA])

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing for video rows: each video explodes into
    one row per sampled timestamp (0, every_ms, 2*every_ms, ... <=
    duration_ms). The frame decode is stubbed as a deterministic payload
    slice; the row-multiplying mapInPandas shape (one input batch -> many
    output rows) is exactly the real ffmpeg-swap contract. Non-video rows
    produce no frames."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                # NULL duration arrives as NaN (truthy!) in a float64
                # column — pd.isna first, or int(NaN) kills the task
                if (
                    r["modality"] != "video"
                    or pd.isna(r["duration_ms"])
                    or not r["duration_ms"]
                ):
                    continue
                p = r["payload"] or b""
                n = int(r["duration_ms"]) // every_ms + 1
                for k in range(n):
                    lo = (k * len(p)) // max(n, 1)
                    hi = ((k + 1) * len(p)) // max(n, 1)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": k,
                            "ts_ms": k * every_ms,
                            "frame_payload": p[lo:hi],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
