"""Multimodal-decode scale soak: real codec throughput + memory envelope.

The PNG/GIF/JPEG/WAV/AVI real-decode paths are oracle-verified at 24-48
fixture rows; this is the scale evidence, built like soak_dedup/soak_ann:
a deterministic mixed-format media corpus is **encoded IN SPARK workers**
(mapInPandas over a range — the encode side is distributed too), written
to parquet, then every real-decode operator runs over it end-to-end:

* avi_frame_stats / gif_frame_stats / wav_sample_stats / jpeg_tile_stats
  — exact integer stats through real container walks / LZW inflate /
  PCM parse / Huffman+IDCT (JPEG rows use the solid-tile closed form,
  the only exact handle a lossy codec offers),
* extract_features(decode_stub=False) — mixed-format dispatch over all
  five codecs in one pass.

Correctness inside the soak: every payload's pixels/samples derive from
the same closed forms as the oracle fixtures (parameterized by row id),
so the soak recomputes the expected `sum_v` for a deterministic row
sample in numpy and asserts exact equality — a decode error at ANY scale
position fails loudly, not statistically.

Prints one JSON line with per-family wall, rows/s, decoded-payload MB/s,
peak RSS, and spill metrics. Usage: python scripts/soak_media.py [--n N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def _media_row(i: int):
    """One deterministic media row; modality cycles by id.  Pixel/sample
    values reuse the closed-form families of the oracle fixtures
    (multimodal.synthetic_*_media), re-parameterized by id so every row
    differs.  Returns (media_id, modality, mime, w, h, duration_ms,
    payload, expected_sum_v)."""
    import numpy as np

    from otlp_cardinality_checker_spark.functions.avi import encode_avi
    from otlp_cardinality_checker_spark.functions.gif import encode_gif
    from otlp_cardinality_checker_spark.functions.png import encode_png
    from otlp_cardinality_checker_spark.functions.wav import encode_wav

    kind = i % 5
    if kind == 4:  # JPEG: solid 8x8 tiles, v = (17*i + 31*bx + 57*by) % 256
        from otlp_cardinality_checker_spark.functions.jpeg import (
            encode_jpeg,
            quality_scale,
            solid_tile_decoded_value,
            BASE_Q_LUMA,
        )

        bw, bh = 3 + i % 5, 3 + (i * 2) % 4
        quality = (35, 50, 75, 90)[i % 4]
        ri = 2 if i % 3 == 0 else 0
        q00 = int(quality_scale(BASE_Q_LUMA, quality)[0])
        tiles = (
            17 * i
            + 31 * np.arange(bw, dtype=np.int64)[None, :]
            + 57 * np.arange(bh, dtype=np.int64)[:, None]
        ) % 256
        px = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1).astype(
            np.uint8
        )
        exp = 64 * sum(
            solid_tile_decoded_value(int(v), q00) for v in tiles.ravel()
        )
        # every second JPEG is progressive (SOF2): same quantized
        # coefficients, same closed-form expectation, different wire path
        return (f"m{i:07d}", "image", "image/jpeg", bw * 8, bh * 8, None,
                encode_jpeg(px, quality=quality, restart_interval=ri,
                            progressive=i % 2 == 1),
                int(exp))
    if kind == 0:  # PNG: lum = (a*x + b*y + c) % 256
        w, h = 48 + i % 33, 32 + i % 17
        a, b, c = 1 + i % 7, 2 + i % 5, (i * 11) % 256
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        lum = ((a * xs + b * ys + c) % 256).astype(np.uint8)
        return (f"m{i:07d}", "image", "image/png", w, h, None,
                encode_png(lum), int(lum.sum()))
    if kind == 1:  # GIF: v = (p*(a*x+b*y+5*f+d) + 11*c + r) % 256
        w, h, nf = 24 + i % 17, 16 + i % 13, 2 + i % 3
        a, b, d = 1 + i % 5, 2 + i % 3, (i * 19) % 256
        p, r = 3 + i % 4, (i * 17) % 256
        f = np.arange(nf, dtype=np.int64)[:, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None]
        x = np.arange(w, dtype=np.int64)[None, None, :]
        idx = ((a * x + b * y + 5 * f + d) % 256).astype(np.uint8)
        j = np.arange(256, dtype=np.int64)[:, None]
        c = np.arange(3, dtype=np.int64)[None, :]
        pal = ((p * j + 11 * c + r) % 256).astype(np.uint8)
        exp = int((pal.astype(np.int64)[idx]).sum())
        return (f"m{i:07d}", "image", "image/gif", w, h,
                int(nf * 40), encode_gif(idx, pal, 4), exp)
    if kind == 2:  # WAV: s = (a*t + b) % 65536 - 32768
        n = 2048 + (i * 37) % 2048
        a, b = 3 + i % 11, (i * 97) % 65536
        t = np.arange(n, dtype=np.int64)
        s = ((a * t + b) % 65536 - 32768).astype(np.int16)
        return (f"m{i:07d}", "audio", "audio/wav", None, None,
                int(n * 1000 // 16000), encode_wav(s, 16000),
                int(s.astype(np.int64).sum()))
    # AVI: v = (a*x + b*y + 7*f + 11*c + d) % 256
    w, h, nf = 32 + (i % 3) * 3, 24 + (i % 4) * 2, 3 + i % 3
    a, b, d = 1 + i % 5, 2 + i % 3, (i * 13) % 256
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    fr = ((a * x + b * y + 7 * f + 11 * c + d) % 256).astype(np.uint8)
    return (f"m{i:07d}", "video", "video/x-msvideo", w, h,
            int(nf * 33), encode_avi(fr, 33333), int(fr.astype(np.int64).sum()))


def ensure_media(spark, n: int, path: str) -> None:
    """Distributed encode: every worker builds its ids' payloads."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    if (Path(path) / "_SUCCESS").exists():
        return
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("modality", StringType(), False),
            StructField("mime_type", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", IntegerType(), True),
            StructField("payload", BinaryType(), True),
            StructField("expected_sum_v", LongType(), False),
        ]
    )

    def batches(it):
        import pandas as pd

        cols = [f.name for f in schema]
        for pdf in it:
            yield pd.DataFrame(
                [_media_row(int(i)) for i in pdf["id"]], columns=cols
            )

    (
        spark.range(n).repartition(64)
        .mapInPandas(batches, schema=schema)
        .write.mode("overwrite").parquet(path)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from soak_common import RssSampler, stage_metrics

    from otlp_cardinality_checker_spark.operators.multimodal import (
        avi_frame_stats,
        extract_features,
        gif_frame_stats,
        jpeg_tile_stats,
        wav_sample_stats,
    )
    from otlp_cardinality_checker_spark.session import get_spark

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(
        app_name="soak-media",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    # v2: JPEG family added (kind = i % 5) — new corpus layout
    path = str((Path(".data") / f"soak_media_v2_n{args.n}").resolve())
    t0 = time.time()
    ensure_media(spark, args.n, path)
    encode_sec = round(time.time() - t0, 1)
    media = spark.read.parquet(path)
    total_bytes = media.agg(
        F.sum(F.length("payload")).alias("b")
    ).collect()[0]["b"]

    sampler = RssSampler()
    sampler.start()
    out: dict = {
        "metric": "media_soak", "n_media": args.n, "cores": args.cores,
        "driver_heap": heap, "encode_sec": encode_sec,
        "corpus_mb": round(total_bytes / 1e6, 1),
    }

    # per-family real decode + closed-form sum check (exact, not sampled
    # on the Spark side: EVERY row's sum_v is compared to its planted
    # expected_sum_v; mismatches counted distributed, must be zero)
    for label, fn, mime in (
        ("avi", avi_frame_stats, "video/x-msvideo"),
        ("gif", gif_frame_stats, "image/gif"),
        ("wav", wav_sample_stats, "audio/wav"),
        ("jpeg", jpeg_tile_stats, "image/jpeg"),
    ):
        fam = media.where(F.col("mime_type") == mime)
        n_rows = fam.count()
        fam_bytes = fam.agg(F.sum(F.length("payload")).alias("b")).collect()[0]["b"]
        t0 = time.time()
        stats = fn(media)
        sum_col = {"wav": "sum_s", "jpeg": "sum_lum"}.get(label, "sum_v")
        mismatches = (
            stats.join(
                media.select("media_id", "expected_sum_v"), "media_id"
            )
            .where(F.col(sum_col) != F.col("expected_sum_v"))
            .count()
        )
        wall = time.time() - t0
        if mismatches:
            raise SystemExit(
                f"{label}: {mismatches} decoded sums != closed form"
            )
        out[f"{label}_rows"] = n_rows
        out[f"{label}_sec"] = round(wall, 1)
        out[f"{label}_rows_per_sec"] = round(n_rows / wall, 1)
        out[f"{label}_decode_mb_per_sec"] = round(fam_bytes / 1e6 / wall, 1)

    # mixed-format single-pass dispatch (PNG rows included here)
    t0 = time.time()
    n_feat = extract_features(media, n_features=8, decode_stub=False).count()
    wall = time.time() - t0
    out["features_rows"] = n_feat
    out["features_sec"] = round(wall, 1)
    out["features_rows_per_sec"] = round(n_feat / wall, 1)
    out["features_decode_mb_per_sec"] = round(total_bytes / 1e6 / wall, 1)

    sampler.stop()
    out["jvm_peak_rss_gb"] = round(sampler.peak_kb / 1024 / 1024, 2)
    try:
        out.update(stage_metrics())
    except Exception as e:  # noqa: BLE001 — UI scrape is best-effort
        out["stage_metrics_error"] = str(e)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
