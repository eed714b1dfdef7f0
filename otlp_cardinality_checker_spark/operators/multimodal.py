"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as `binary` columns
with typed metadata; decode/feature-extraction runs as Arrow-batched pandas
UDFs over `mapInPandas`.

Decode status by modality: **image/png, image/gif (animated), image/jpeg
(baseline, the first LOSSY format), audio/wav, and video rawvideo-AVI all
decode FOR REAL** via the pure-stdlib codecs in ``functions/png.py``
(zlib + struct + numpy unfilter), ``functions/gif.py`` (real
variable-width LZW inflate + palette mapping), ``functions/jpeg.py``
(canonical Huffman + dequant + vectorized IDCT + YCbCr), ``functions/
wav.py`` (RIFF/PCM), and ``functions/avi.py`` (RIFF/AVI with bottom-up
BGR24 DIB frames) — pass ``decode_stub=False`` and those payloads yield
actual pixels/samples (real luminance/amplitude features, real
nearest-neighbor resize + re-encode).  Remaining lossy codecs (MP3,
H.264 …) stay stubbed — they need libraries this container lacks:
``decode_stub=True`` produces a deterministic fake from the bytes, and
``decode_stub=False`` on an undecodable payload raises
NotImplementedError at evaluation time.  The Spark-side plumbing
(schema, batch iteration, partition sizing) is identical either way.
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
    LongType,
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


def synthetic_png_media(spark, n: int = 48) -> DataFrame:
    """REAL PNG media table with closed-form pixels.

    Image i is an (h, w) grayscale gradient with
    ``lum(y, x) = (a*x + b*y + c) % 256`` where a, b, c, w, h derive
    deterministically from i — so an engine WITHOUT a PNG decoder (the
    DuckDB oracle) can recompute every pixel from the formula while Spark
    recovers them by actually decoding the bytes.  Exact-integer agreement
    between the two is end-to-end proof the codec is correct.
    """
    from ..functions.png import encode_png

    import numpy as np

    rows = []
    for i in range(n):
        w = 8 + (i * 3) % 17
        h = 6 + (i * 5) % 13
        a = 1 + i % 7
        b = 2 + i % 5
        c = (i * 11) % 256
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        lum = ((a * xs + b * ys + c) % 256).astype(np.uint8)
        rows.append(
            (f"png_{i:05d}", "image", "image/png", w, h, None,
             encode_png(lum))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_px", LongType(), False),
        StructField("sum_lum", LongType(), False),
        StructField("min_lum", IntegerType(), False),
        StructField("max_lum", IntegerType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def png_pixel_stats(media: DataFrame) -> DataFrame:
    """Exact per-image pixel statistics from a REAL PNG decode.

    All-integer outputs (sums, extrema, and a position-weighted checksum
    ``sum(lum * (y*width + x)) % 1_000_000_007`` that catches transposed /
    shifted pixels) so a decoder-less oracle can verify them bit-exactly
    from the closed-form pixel definition.  Arrow-batched mapInPandas; the
    per-image decode is numpy-vectorized, the Python loop is O(rows).
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.png import decode_png

        cols = [f.name for f in PNG_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(payload)
                h, w = px.shape[:2]
                lum = px.reshape(h, w, -1).mean(axis=2).astype(np.int64)
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                out.append(
                    (
                        media_id, w, h, h * w, int(lum.sum()),
                        int(lum.min()), int(lum.max()),
                        int((lum * pos).sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(F.col("mime_type") == "image/png").mapInPandas(
        batches, schema=PNG_STATS_SCHEMA
    )


def synthetic_wav_media(spark, n: int = 40) -> DataFrame:
    """REAL WAV media table with closed-form PCM samples.

    Clip i has ``n_samples = 256 + (i*37) % 512`` mono 16-bit samples with
    ``s(t) = ((a*t + b) % 65536) - 32768`` where a, b derive from i — so a
    decoder-less oracle (DuckDB) recomputes every sample from the formula
    while Spark recovers them by parsing the RIFF bytes.  Sample rate
    8000 + 1000*(i % 5); duration_ms follows from n_samples and rate.
    """
    from ..functions.wav import encode_wav

    import numpy as np

    rows = []
    for i in range(n):
        n_samples = 256 + (i * 37) % 512
        a = 3 + i % 11
        b = (i * 97) % 65536
        rate = 8000 + 1000 * (i % 5)
        t = np.arange(n_samples, dtype=np.int64)
        s = ((a * t + b) % 65536 - 32768).astype(np.int16)
        rows.append(
            (
                f"wav_{i:05d}", "audio", "audio/wav", None, None,
                int(n_samples * 1000 // rate), encode_wav(s, rate),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_s", LongType(), False),
        StructField("min_s", IntegerType(), False),
        StructField("max_s", IntegerType(), False),
        StructField("zero_crossings", LongType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def wav_sample_stats(media: DataFrame) -> DataFrame:
    """Exact per-clip PCM statistics from a REAL WAV decode.

    All-integer outputs so a decoder-less oracle verifies them bit-exactly
    from the closed-form sample definition: sum/min/max of samples, sign
    zero-crossing count (s[t-1]*s[t] < 0), and the positional checksum
    ``sum((s + 32768) * (t + 1))`` (non-negative, exact in BIGINT — no
    modulo, so no cross-engine sign-of-% pitfalls).
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.wav import decode_wav

        cols = [f.name for f in WAV_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(payload)
                s = samples[:, 0].astype(np.int64)  # mono fixtures
                t = np.arange(s.size, dtype=np.int64)
                zc = int(((s[:-1] * s[1:]) < 0).sum()) if s.size > 1 else 0
                out.append(
                    (
                        media_id, rate, s.size, int(s.sum()),
                        int(s.min()), int(s.max()), zc,
                        int(((s + 32768) * (t + 1)).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(F.col("mime_type") == "audio/wav").mapInPandas(
        batches, schema=WAV_STATS_SCHEMA
    )


def synthetic_avi_media(spark, n: int = 24) -> DataFrame:
    """REAL rawvideo-AVI media table with closed-form pixels.

    Video i has ``n_frames = 3 + i%4`` BGR frames of ``w = 8 + (i%3)*3``
    (deliberately including widths whose 3-byte rows need DIB stride
    padding) by ``h = 6 + (i%4)*2`` with channel value
    ``v(f, y, x, c) = (a*x + b*y + 7*f + 11*c + d) % 256`` — so a
    parser-less oracle recomputes every byte from the formula while Spark
    recovers them by actually walking the RIFF container.
    """
    from ..functions.avi import encode_avi

    import numpy as np

    rows = []
    for i in range(n):
        w = 8 + (i % 3) * 3
        h = 6 + (i % 4) * 2
        nf = 3 + i % 4
        a, b, d = 1 + i % 5, 2 + i % 3, (i * 13) % 256
        f = np.arange(nf, dtype=np.int64)[:, None, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None, None]
        x = np.arange(w, dtype=np.int64)[None, None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, None, :]
        frames = ((a * x + b * y + 7 * f + 11 * c + d) % 256).astype(
            np.uint8
        )
        us = 33333 + i * 100
        rows.append(
            (
                f"avi_{i:05d}", "video", "video/x-msvideo", w, h,
                int(nf * us // 1000), encode_avi(frames, us),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AVI_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("us_per_frame", IntegerType(), False),
        StructField("sum_v", LongType(), False),
        StructField("min_v", IntegerType(), False),
        StructField("max_v", IntegerType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def avi_frame_stats(media: DataFrame) -> DataFrame:
    """Exact per-video pixel statistics from a REAL AVI container parse.

    All-integer outputs over every (frame, y, x, channel) byte — sum,
    extrema, and the positional checksum
    ``sum(v * (((f*h + y)*w + x)*3 + c + 1))`` that catches frame-order,
    row-order (bottom-up DIB!), and stride-padding mistakes bit-exactly
    against the closed-form oracle.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.avi import decode_avi

        cols = [f.name for f in AVI_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, us = decode_avi(payload)
                nf, h, w, _ = frames.shape
                v = frames.astype(np.int64)
                pos = np.arange(v.size, dtype=np.int64).reshape(v.shape)
                out.append(
                    (
                        media_id, nf, w, h, int(us), int(v.sum()),
                        int(v.min()), int(v.max()),
                        int((v * (pos + 1)).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(
        F.col("mime_type") == "video/x-msvideo"
    ).mapInPandas(batches, schema=AVI_STATS_SCHEMA)


def synthetic_gif_media(spark, n: int = 24) -> DataFrame:
    """REAL animated-GIF media table with closed-form pixels.

    GIF i has ``nf = 2 + i%3`` frames of ``w = 10 + (i%3)*5`` by
    ``h = 8 + (i%4)*3`` whose palette *index* at (f, y, x) is
    ``(a*x + b*y + 5*f + d) % 256`` and whose 256-entry palette maps
    index j, channel c to ``(p*j + 11*c + r) % 256`` — so the decoded
    RGB value collapses to the single closed form
    ``v = (p*(a*x + b*y + 5*f + d) + 11*c + r) % 256`` that a
    decoder-less oracle recomputes while Spark actually inflates the LZW
    bitstream.  Unlike AVI/WAV/PNG-stored rows, these payloads are
    genuinely *compressed* (variable-width LZW), so bit-exact agreement
    additionally proves a real decompressor.
    """
    from ..functions.gif import encode_gif

    import numpy as np

    rows = []
    for i in range(n):
        w = 10 + (i % 3) * 5
        h = 8 + (i % 4) * 3
        nf = 2 + i % 3
        a, b, d = 1 + i % 5, 2 + i % 3, (i * 19) % 256
        p, r = 3 + i % 4, (i * 17) % 256
        f = np.arange(nf, dtype=np.int64)[:, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None]
        x = np.arange(w, dtype=np.int64)[None, None, :]
        idx = ((a * x + b * y + 5 * f + d) % 256).astype(np.uint8)
        j = np.arange(256, dtype=np.int64)[:, None]
        c = np.arange(3, dtype=np.int64)[None, :]
        pal = ((p * j + 11 * c + r) % 256).astype(np.uint8)
        delay_cs = 4 + i % 6
        rows.append(
            (
                f"gif_{i:05d}", "image", "image/gif", w, h,
                int(nf * delay_cs * 10), encode_gif(idx, pal, delay_cs),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


GIF_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("delay_cs", IntegerType(), False),
        StructField("sum_v", LongType(), False),
        StructField("min_v", IntegerType(), False),
        StructField("max_v", IntegerType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def gif_frame_stats(media: DataFrame) -> DataFrame:
    """Exact RGB pixel statistics from a REAL GIF decode (LZW inflate +
    palette mapping).  Same all-integer stat shape as
    :func:`avi_frame_stats`; ``pos_checksum`` runs over the decoded RGB
    tensor ``(frame, y, x, channel)`` so palette mapping, frame order,
    and the LZW bitstream itself are all pinned bit-exactly.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.gif import decode_gif

        cols = [f.name for f in GIF_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, palette, delay_cs = decode_gif(payload)
                nf, h, w = frames.shape
                v = palette[frames].astype(np.int64)  # (nf, h, w, 3) RGB
                pos = np.arange(v.size, dtype=np.int64).reshape(v.shape)
                out.append(
                    (
                        media_id, nf, w, h, int(delay_cs), int(v.sum()),
                        int(v.min()), int(v.max()),
                        int((v * (pos + 1)).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(
        F.col("mime_type") == "image/gif"
    ).mapInPandas(batches, schema=GIF_STATS_SCHEMA)


def synthetic_jpeg_media(spark, n: int = 40) -> DataFrame:
    """REAL baseline-JPEG media table with closed-form DECODED pixels.

    JPEG is lossy, so the trick that makes a decoder-less oracle possible
    is solid 8x8 tiles: image i is a mosaic of uniform tiles with
    ``v(i, by, bx) = (17*i + 31*bx + 57*by) % 256``, and a uniform block
    survives the whole quantize/dequantize/IDCT pipeline as the CLOSED
    FORM ``solid_tile_decoded_value(v, q00)`` (functions/jpeg.py) — plain
    arithmetic DuckDB can evaluate with no codec.  Quality cycles
    {35, 50, 75, 90} (q=50 puts every odd v-128 exactly on a quantizer
    tie — the hardest rounding case) and every third image uses restart
    markers, so DRI/RSTn resync is oracle-covered too.
    """
    from ..functions.jpeg import encode_jpeg

    import numpy as np

    rows = []
    for i in range(n):
        bw = 2 + (i * 3) % 5
        bh = 2 + (i * 5) % 4
        quality = (35, 50, 75, 90)[i % 4]
        ri = 2 if i % 3 == 0 else 0
        tiles = (
            17 * i
            + 31 * np.arange(bw, dtype=np.int64)[None, :]
            + 57 * np.arange(bh, dtype=np.int64)[:, None]
        ) % 256
        px = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1).astype(
            np.uint8
        )
        rows.append(
            (f"jpg_{i:05d}", "image", "image/jpeg", bw * 8, bh * 8, None,
             encode_jpeg(px, quality=quality, restart_interval=ri))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg_color_media(spark, n: int = 24) -> DataFrame:
    """RGB 4:4:4 twin of :func:`synthetic_jpeg_media`: per-tile
    ``r = (29i+31bx+57by) % 256, g = (7i+11bx+43by) % 256,
    b = (3i+53bx+19by) % 256`` — the oracle repeats RGB->YCbCr, the
    per-channel DC pipeline (luma + chroma quant tables), and YCbCr->RGB
    in exact SQL arithmetic."""
    from ..functions.jpeg import encode_jpeg

    import numpy as np

    rows = []
    for i in range(n):
        bw = 2 + (i * 3) % 4
        bh = 2 + i % 3
        quality = (35, 50, 75, 90)[i % 4]
        bxs = np.arange(bw, dtype=np.int64)[None, :]
        bys = np.arange(bh, dtype=np.int64)[:, None]
        chans = [
            (29 * i + 31 * bxs + 57 * bys) % 256,
            (7 * i + 11 * bxs + 43 * bys) % 256,
            (3 * i + 53 * bxs + 19 * bys) % 256,
        ]
        px = np.stack(
            [np.repeat(np.repeat(c, 8, axis=0), 8, axis=1) for c in chans],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            (f"jpc_{i:05d}", "image", "image/jpeg", bw * 8, bh * 8, None,
             encode_jpeg(px, quality=quality))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg_progressive_media(spark, n: int = 24) -> DataFrame:
    """Progressive (SOF2) twin of :func:`synthetic_jpeg_color_media`:
    identical tile content and quality ladder, encoded with the full
    spectral-selection + successive-approximation scan script (restart
    markers on every third image).  A progressive stream carries the SAME
    quantized coefficients as the baseline stream, so the SAME closed-form
    oracle verifies the whole multi-scan decode path."""
    from ..functions.jpeg import encode_jpeg

    import numpy as np

    rows = []
    for i in range(n):
        bw = 2 + (i * 3) % 4
        bh = 2 + i % 3
        quality = (35, 50, 75, 90)[i % 4]
        ri = 2 if i % 3 == 0 else 0
        bxs = np.arange(bw, dtype=np.int64)[None, :]
        bys = np.arange(bh, dtype=np.int64)[:, None]
        chans = [
            (29 * i + 31 * bxs + 57 * bys) % 256,
            (7 * i + 11 * bxs + 43 * bys) % 256,
            (3 * i + 53 * bxs + 19 * bys) % 256,
        ]
        px = np.stack(
            [np.repeat(np.repeat(c, 8, axis=0), 8, axis=1) for c in chans],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            (f"jpp_{i:05d}", "image", "image/jpeg", bw * 8, bh * 8, None,
             encode_jpeg(px, quality=quality, progressive=True,
                         restart_interval=ri))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg420_media(spark, n: int = 24) -> DataFrame:
    """4:2:0 twin of :func:`synthetic_jpeg_color_media`: the same per-tile
    RGB formulas but on 16x16 tiles (one full MCU each), encoded with
    2x2-luma subsampling and MCU-level restart markers on every third
    image.  A uniform 16x16 tile stays uniform through the box-filter
    chroma downsample, so the SAME per-channel closed form verifies the
    whole subsampled pipeline (including replicate upsample)."""
    from ..functions.jpeg import encode_jpeg

    import numpy as np

    rows = []
    for i in range(n):
        bw = 2 + (i * 3) % 4
        bh = 2 + i % 3
        quality = (35, 50, 75, 90)[i % 4]
        ri = 1 if i % 3 == 0 else 0
        bxs = np.arange(bw, dtype=np.int64)[None, :]
        bys = np.arange(bh, dtype=np.int64)[:, None]
        chans = [
            (29 * i + 31 * bxs + 57 * bys) % 256,
            (7 * i + 11 * bxs + 43 * bys) % 256,
            (3 * i + 53 * bxs + 19 * bys) % 256,
        ]
        px = np.stack(
            [np.repeat(np.repeat(c, 16, axis=0), 16, axis=1) for c in chans],
            axis=-1,
        ).astype(np.uint8)
        rows.append(
            (f"j20_{i:05d}", "image", "image/jpeg", bw * 16, bh * 16, None,
             encode_jpeg(px, quality=quality, subsampling="420",
                         restart_interval=ri))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def jpeg_tile_stats(media: DataFrame) -> DataFrame:
    """Exact grayscale pixel stats from a REAL baseline-JPEG decode
    (Huffman + dequant + IDCT).  Same all-integer shape as
    :func:`png_pixel_stats`; bit-exact match against the solid-tile
    closed-form oracle proves the whole lossy pipeline."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.jpeg import decode_jpeg

        cols = [f.name for f in PNG_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_jpeg(payload)
                if px.ndim != 2:
                    raise ValueError("expected grayscale fixture")
                h, w = px.shape
                lum = px.astype(np.int64)
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                out.append(
                    (
                        media_id, w, h, h * w, int(lum.sum()),
                        int(lum.min()), int(lum.max()),
                        int((lum * pos).sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(
        F.col("mime_type") == "image/jpeg"
    ).mapInPandas(batches, schema=PNG_STATS_SCHEMA)


JPEG_COLOR_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_px", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def jpeg_color_tile_stats(media: DataFrame) -> DataFrame:
    """Exact RGB stats from a REAL color JPEG decode; ``pos_checksum``
    weights channels (r + 2g + 3b) by pixel position so channel swaps,
    transposes, and chroma mix-ups all break the hash."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.jpeg import decode_jpeg

        cols = [f.name for f in JPEG_COLOR_STATS_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_jpeg(payload).astype(np.int64)
                if px.ndim != 3:
                    raise ValueError("expected RGB fixture")
                h, w = px.shape[:2]
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                mix = px[..., 0] + 2 * px[..., 1] + 3 * px[..., 2]
                out.append(
                    (
                        media_id, w, h, h * w,
                        int(px[..., 0].sum()), int(px[..., 1].sum()),
                        int(px[..., 2].sum()),
                        int((mix * pos).sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(
        F.col("mime_type") == "image/jpeg"
    ).mapInPandas(batches, schema=JPEG_COLOR_STATS_SCHEMA)


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

    With ``decode_stub=False``, **PNG, GIF, baseline JPEG, WAV, and
    rawvideo-AVI payloads decode for real** (stdlib codecs under
    `functions/`): features = the n_features-bucket normalized luminance
    (or amplitude) histogram of the actual pixels/samples.  Other formats
    raise NotImplementedError (those codecs need libraries this container
    lacks) — filter on mime_type first.  With ``decode_stub=True`` the
    deterministic fake kernel runs instead, batch-vectorized (np.bincount
    over the concatenated batch buffer) so the plumbing benchmark reflects
    Arrow-batch reality, not per-row Python: feature bucket c of row r =
    (sum of payload bytes at positions == c mod k) & 0xFFFF, scaled [0,1].
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        k = n_features
        for pdf in it:
            if not decode_stub:
                from ..functions.avi import decode_avi, is_avi
                from ..functions.gif import decode_gif, is_gif
                from ..functions.jpeg import decode_jpeg, is_jpeg
                from ..functions.png import decode_png, is_png
                from ..functions.wav import decode_wav, is_wav

                rows = []
                for media_id, modality, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"]
                ):
                    payload = payload if payload is not None else b""
                    if is_png(payload):
                        px = decode_png(payload)
                        lum = px.reshape(
                            px.shape[0], px.shape[1], -1
                        ).mean(axis=2)
                        hist = np.histogram(
                            lum, bins=k, range=(0.0, 256.0)
                        )[0] / max(lum.size, 1)
                    elif is_wav(payload):
                        samples, _rate = decode_wav(payload)
                        amp = samples.astype(np.float64).ravel()
                        hist = np.histogram(
                            amp, bins=k, range=(-32768.0, 32768.0)
                        )[0] / max(amp.size, 1)
                    elif is_avi(payload):
                        frames, _us = decode_avi(payload)
                        lum = frames.astype(np.float64).mean(axis=3)
                        hist = np.histogram(
                            lum, bins=k, range=(0.0, 256.0)
                        )[0] / max(lum.size, 1)
                    elif is_gif(payload):
                        frames, palette, _delay = decode_gif(payload)
                        lum = palette[frames].astype(np.float64).mean(axis=3)
                        hist = np.histogram(
                            lum, bins=k, range=(0.0, 256.0)
                        )[0] / max(lum.size, 1)
                    elif is_jpeg(payload):
                        px = decode_jpeg(payload)
                        lum = px.reshape(
                            px.shape[0], px.shape[1], -1
                        ).astype(np.float64).mean(axis=2)
                        hist = np.histogram(
                            lum, bins=k, range=(0.0, 256.0)
                        )[0] / max(lum.size, 1)
                    else:
                        raise NotImplementedError(
                            "real decode is implemented for PNG, GIF, JPEG, "
                            "WAV, and rawvideo AVI; got an undecodable "
                            f"{modality} payload"
                        )
                    rows.append(
                        (media_id, modality, len(payload),
                         hist.astype(np.float64).tolist())
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "modality", "n_bytes", "features"],
                )
                continue
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
    updated to the target dimensions.

    ``decode_stub=False``: PNG rows get a REAL resize — stdlib decode,
    nearest-neighbor resample, PNG re-encode (`functions/png.py`); image
    rows that are not PNG raise NotImplementedError, non-image rows pass
    through untouched.  ``decode_stub=True``: the deterministic stub
    re-samples the payload bytes to the target byte budget, preserving
    exactly what a PIL/opencv swap needs — per-row bytes in, transformed
    bytes out, Arrow-batched."""

    budget = max(width * height // 64, 16)

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                from ..functions.png import (
                    decode_png,
                    encode_png,
                    is_png,
                    resize_nearest,
                )

                out = pdf.copy()
                new_payloads = list(pdf["payload"])
                resized = []
                for r, (modality, payload) in enumerate(
                    zip(pdf["modality"], pdf["payload"])
                ):
                    if modality != "image" or not payload:
                        continue
                    if not is_png(payload):
                        raise NotImplementedError(
                            "real resize is implemented for PNG only"
                        )
                    px = decode_png(payload)
                    new_payloads[r] = encode_png(
                        resize_nearest(px, width, height)
                    )
                    resized.append(r)
                out["payload"] = new_payloads
                out.loc[resized, "width"] = width
                out.loc[resized, "height"] = height
                yield pd.DataFrame(
                    out, columns=[f.name for f in MEDIA_SCHEMA]
                )
                continue
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


SAMPLED_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("sum_v", LongType(), False),
        StructField("min_v", IntegerType(), False),
        StructField("max_v", IntegerType(), False),
        StructField("pos_checksum", LongType(), False),
    ]
)


def avi_sampled_frame_stats(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode the AVI container and keep every
    ``every_n``-th frame (0, every_n, 2*every_n, ...), emitting exact
    integer pixel stats per sampled frame — the row-multiplying
    mapInPandas shape of :func:`sample_frames`, but over actually-decoded
    video.  ``ts_ms`` is the frame's presentation time
    ``frame_idx * us_per_frame // 1000``; ``pos_checksum`` is the
    within-frame positional checksum ``sum(v * (((y*w + x)*3 + c) + 1))``
    that pins row order, stride handling, and channel order bit-exactly.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.avi import decode_avi

        cols = [f.name for f in SAMPLED_FRAME_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, us = decode_avi(payload)
                nf, h, w, _ = frames.shape
                idx = np.arange(0, nf, every_n, dtype=np.int64)
                v = frames[idx].astype(np.int64)
                flat = v.reshape(idx.size, -1)
                pos = np.arange(flat.shape[1], dtype=np.int64)[None, :]
                for k, fi in enumerate(idx):
                    out.append(
                        (
                            media_id, int(fi), int(fi * us // 1000),
                            int(flat[k].sum()), int(flat[k].min()),
                            int(flat[k].max()),
                            int((flat[k] * (pos[0] + 1)).sum()),
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return media.where(
        F.col("mime_type") == "video/x-msvideo"
    ).mapInPandas(batches, schema=SAMPLED_FRAME_SCHEMA)


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


def synthetic_png_ahash_media(spark, n: int = 48) -> DataFrame:
    """REAL PNG fixture for the perceptual-hash family, with planted
    near-duplicates.

    Every image is an ``(a*x + b*y + c) % 256`` grayscale gradient (the
    closed form the decoder-less DuckDB oracle can recompute, exactly as
    in :func:`synthetic_png_media`), and every fourth image (``i % 4 ==
    3``) reuses the previous image's geometry and gradient with ``c + 1``
    — a +1 luminance shift with wraparound at 255.  Away from wrap
    points that shift leaves every "sample > mean" comparison unchanged
    (both sides move by the same amount), so the pair's average-hash
    Hamming distance is 0 or a few wrap-flipped bits: a planted
    perceptual near-duplicate that is NOT a byte-exact duplicate.
    """
    from ..functions.png import encode_png

    import numpy as np

    def params(i: int) -> tuple[int, int, int, int, int]:
        if i % 4 == 3:
            w, h, a, b, c = params(i - 1)
            return w, h, a, b, (c + 1) % 256
        return (
            8 + (i * 3) % 17,
            6 + (i * 5) % 13,
            1 + i % 7,
            2 + i % 5,
            (i * 29) % 256,
        )

    rows = []
    for i in range(n):
        w, h, a, b, c = params(i)
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        lum = ((a * xs + b * ys + c) % 256).astype(np.uint8)
        rows.append(
            (f"pah_{i:05d}", "image", "image/png", w, h, None,
             encode_png(lum))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("ahash_hi", LongType(), False),
        StructField("ahash_lo", LongType(), False),
        StructField("n_bright", IntegerType(), False),
    ]
)


def image_ahash(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) perceptual signature from a REAL PNG
    decode — the classic perceptual-dedup primitive (public aHash/pHash
    family; e.g. the LAION-style image-dedup pipelines), defined here in
    engine-neutral EXACT integer arithmetic so a decoder-less oracle can
    recompute it:

    - sample an 8x8 grid: ``s(gy, gx) = lum(floor(gy*h/8), floor(gx*w/8))``
      (nearest-neighbor downsample — no fractional averaging, so every
      sampled value is a decoded pixel, exact in integers);
    - bit ``b = gy*8 + gx`` is set iff ``64 * s > sum(all 64 samples)``
      (strict — ties are dark; multiplying through by 64 keeps the
      mean comparison integer-exact);
    - the 64 bits are packed as TWO 32-bit halves in BIGINT columns
      (``ahash_hi`` = bits 32..63, ``ahash_lo`` = bits 0..31): both
      engines overflow on ``1 << 63`` in signed 64-bit, halves never do.

    Scale shape: one Arrow-batched mapInPandas pass over the payload
    bytes (numpy-vectorized decode + grid gather per image, Python loop
    O(rows)); output is 6 narrow columns — the binary payload never
    reaches a shuffle.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..functions.png import decode_png

        gy, gx = np.meshgrid(
            np.arange(8, dtype=np.int64),
            np.arange(8, dtype=np.int64),
            indexing="ij",
        )
        bit = gy * 8 + gx
        # shift counts are clamped BEFORE the where(): numpy evaluates
        # both branches, and a negative / >=64 shift is undefined
        weights_hi = np.where(
            bit >= 32, np.int64(1) << np.maximum(bit - 32, 0), np.int64(0)
        )
        weights_lo = np.where(
            bit < 32, np.int64(1) << np.minimum(bit, 31), np.int64(0)
        )
        cols = [f.name for f in AHASH_SCHEMA]
        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(payload)
                h, w = px.shape[:2]
                lum = px.reshape(h, w, -1).mean(axis=2).astype(np.int64)
                s = lum[(gy * h) // 8, (gx * w) // 8]
                bright = 64 * s > s.sum()
                out.append(
                    (
                        media_id, w, h,
                        int((weights_hi * bright).sum()),
                        int((weights_lo * bright).sum()),
                        int(bright.sum()),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return media.where(F.col("mime_type") == "image/png").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


def image_near_dups(
    media: DataFrame, max_hamming: int = 3, max_block_df: int | None = 100_000
) -> DataFrame:
    """Perceptual image near-duplicates: all PNG pairs whose 64-bit aHash
    signatures differ in at most ``max_hamming`` bits.

    Same complete-by-pigeonhole block join as
    :func:`..dedup.simhash_hamming_pairs` (Manku/Jain/Das Sarma, WWW'07):
    with ``max_hamming = 3`` the 64 bits split into 4 x 16-bit blocks —
    two signatures within distance 3 MUST agree exactly on at least one
    block, so an equi-join on (block index, block value) never misses a
    true pair, and the verify step (two XOR + popcount over the packed
    halves, whole-stage codegen) drops the false candidates.  Blocks are
    carved from the two 32-bit halves, so no 64-bit packing is ever
    materialized.  ``max_block_df`` caps degenerate blocks exactly like
    the SimHash variant (flat images share whole blocks; a corpus of
    millions of near-black thumbnails would otherwise make one bucket
    the corpus).

    Scale shape: decode once (mapInPandas), then signatures-only from
    there — a 4-way block explode on 6 narrow columns, an equi-join whose
    bucket sizes are block-collision counts, and a codegen verify.
    Nothing downstream of the decode touches payload bytes.

    Output: media_a, media_b (media_a < media_b), hamming.
    """
    assert max_hamming <= 3, "4 x 16-bit blocks cover Hamming <= 3"
    sigs = image_ahash(media).select("media_id", "ahash_hi", "ahash_lo")
    blocks = sigs.select(
        "media_id",
        "ahash_hi",
        "ahash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("blk"),
                    F.expr("shiftrightunsigned(ahash_hi, 16)").alias("val"),
                ),
                F.struct(
                    F.lit(1).alias("blk"),
                    F.expr("ahash_hi & 65535").alias("val"),
                ),
                F.struct(
                    F.lit(2).alias("blk"),
                    F.expr("shiftrightunsigned(ahash_lo, 16)").alias("val"),
                ),
                F.struct(
                    F.lit(3).alias("blk"),
                    F.expr("ahash_lo & 65535").alias("val"),
                ),
            )
        ).alias("bb"),
    ).select(
        "media_id", "ahash_hi", "ahash_lo",
        F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"),
    )
    if max_block_df is not None:
        hot = (
            blocks.groupBy("blk", "val")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_block_df)
            .select("blk", "val")
        )
        blocks = blocks.join(F.broadcast(hot), ["blk", "val"], "left_anti")
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["blk", "val"])
        .where(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.ahash_hi").alias("_ha"),
            F.col("a.ahash_lo").alias("_la"),
            F.col("b.ahash_hi").alias("_hb"),
            F.col("b.ahash_lo").alias("_lb"),
        )
        .dropDuplicates(["media_a", "media_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.expr("_ha ^ _hb")) + F.bit_count(F.expr("_la ^ _lb")),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )
