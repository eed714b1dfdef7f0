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


def _batch_buffer(payloads: list[bytes]):
    """Concatenate a batch's payloads into ONE numpy byte buffer.

    Returns (buf uint8[total], lens int64[rows], starts int64[rows]) — the
    shape every vectorized kernel below works from: per-byte work happens
    in numpy over the whole Arrow batch at once, and the only Python-level
    loops left are O(rows), never O(bytes).
    """
    import numpy as np

    lens = np.fromiter(
        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
    )
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else lens
    return buf, lens, starts


def extract_features(
    media: DataFrame, n_features: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real deployments replace the stub kernel with an actual decoder
    (PIL/librosa/ffmpeg); the UDF signature, batch shape, and output schema
    are exactly what that swap needs. The stub is batch-vectorized
    (np.bincount over the concatenated batch buffer) so the plumbing
    benchmark reflects Arrow-batch reality, not per-row Python: feature
    bucket c of row r = (sum of payload bytes at positions == c mod k)
    & 0xFFFF, scaled to [0, 1].
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        k = n_features
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries "
                    "not present in this container"
                )
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            n_rows = len(payloads)
            buf, lens, starts = _batch_buffer(payloads)
            if buf.size:
                row_id = np.repeat(np.arange(n_rows), lens)
                pos = np.arange(buf.size) - np.repeat(starts, lens)
                # one bincount for the whole batch: bucket = row*k + pos%k
                sums = np.bincount(
                    row_id * k + (pos % k),
                    weights=buf,
                    minlength=n_rows * k,
                ).astype(np.int64)
            else:
                sums = np.zeros(n_rows * k, dtype=np.int64)
            feats = ((sums & 0xFFFF) / 65535.0).reshape(n_rows, k)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": lens,
                    "features": feats.tolist(),
                }
            )

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
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resizing requires PIL/opencv, not present "
                    "in this container"
                )
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            buf, lens, starts = _batch_buffer(payloads)
            # empty payloads stay untouched (nothing to resample); the
            # gather below indexes only rows with lens > 0
            sel = np.flatnonzero((pdf["modality"] == "image") & (lens > 0))
            if sel.size:
                # one 2-D gather for every image in the batch: column j of
                # row r samples byte (j * len_r) // budget of payload r
                j = np.arange(budget, dtype=np.int64)
                idx = (
                    starts[sel][:, None]
                    + (j[None, :] * lens[sel][:, None]) // budget
                )
                sampled = buf[idx]  # (n_images, budget) uint8
            out = pdf.copy()
            new_payloads = list(pdf["payload"])
            for row_pos, r in enumerate(sel):
                new_payloads[r] = sampled[row_pos].tobytes()
            out["payload"] = new_payloads
            # only rows whose bytes were actually produced get the new
            # dimensions — metadata must never claim a resize that the
            # payload pass-through skipped
            out.loc[sel, "width"] = width
            out.loc[sel, "height"] = height
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
        import numpy as np
        import pandas as pd

        cols = [f.name for f in FRAME_SCHEMA]
        for pdf in it:
            # NULL duration arrives as NaN (truthy!) in a float64 column —
            # fillna(0) first, or int(NaN) kills the task
            dur = pdf["duration_ms"].fillna(0).to_numpy(dtype=np.int64)
            sel = np.flatnonzero((pdf["modality"] == "video") & (dur > 0))
            if not sel.size:
                yield pd.DataFrame([], columns=cols)
                continue
            payloads = [
                pdf["payload"].iloc[r] or b"" for r in sel
            ]
            buf, lens, starts = _batch_buffer(payloads)
            n = dur[sel] // every_ms + 1  # frames per selected video
            total = int(n.sum())
            # vectorized explode: video v contributes frames 0..n[v]-1
            vid = np.repeat(np.arange(sel.size), n)
            frame_idx = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(n)[:-1])), n
            )
            lo = starts[vid] + (frame_idx * lens[vid]) // n[vid]
            hi = starts[vid] + ((frame_idx + 1) * lens[vid]) // n[vid]
            media_ids = pdf["media_id"].to_numpy()[sel][vid]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "ts_ms": (frame_idx * every_ms).astype(np.int32),
                    # O(frames) bytes-object creation — the arithmetic
                    # above (offsets, explode) is all batch-vectorized
                    "frame_payload": [
                        buf[a:b].tobytes() for a, b in zip(lo, hi)
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
