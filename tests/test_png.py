"""PNG codec correctness: golden pixels, all five filter types, roundtrip,
and the real (non-stub) multimodal decode paths."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from otlp_cardinality_checker_spark.functions.png import (
    PngError,
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _manual_png(width, height, color, scanlines: bytes) -> bytes:
    """Hand-assemble a PNG from pre-filtered scanline bytes."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_roundtrip_gray_and_rgb_and_rgba():
    rng = np.random.default_rng(7)
    for shape in [(5, 9), (6, 4, 3), (3, 7, 4), (2, 2, 2)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(px))
        want = px if px.ndim == 3 else px[:, :, None]
        assert got.shape == want.shape
        assert (got == want).all()


def test_golden_known_pixels():
    px = np.array([[0, 128], [255, 64]], dtype=np.uint8)
    data = encode_png(px)
    assert is_png(data)
    out = decode_png(data)
    assert out.tolist() == [[[0], [128]], [[255], [64]]]


def test_all_filter_types_match_reference_unfilter():
    """Hand-filter a known image with each filter type and check the
    decoder recovers the original pixels (RGB so bpp=3 offsets matter)."""
    rng = np.random.default_rng(11)
    h, w, c = 6, 5, 3
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.int32)
    flat = px.reshape(h, w * c)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return cc

    scan = bytearray()
    filters = [0, 1, 2, 3, 4, 1]
    for y in range(h):
        f = filters[y]
        scan.append(f)
        prev = flat[y - 1] if y else np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            left = flat[y][x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            raw = flat[y][x]
            if f == 0:
                v = raw
            elif f == 1:
                v = raw - left
            elif f == 2:
                v = raw - up
            elif f == 3:
                v = raw - (left + up) // 2
            else:
                v = raw - paeth(left, up, ul)
            scan.append(v % 256)
    data = _manual_png(w, h, 2, bytes(scan))
    out = decode_png(data)
    assert (out == px.astype(np.uint8).reshape(h, w, c)).all()


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    # 16-bit depth is unsupported
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = sig + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
    with pytest.raises(PngError):
        decode_png(bad)


def test_resize_nearest_semantics():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 1)
    # each source pixel becomes a 2x2 block
    assert (up[0:2, 0:2, 0] == 0).all()
    assert (up[6:8, 6:8, 0] == 15).all()


def test_synthetic_png_media_decodes_to_formula(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        synthetic_png_media,
    )

    rows = synthetic_png_media(spark, 6).collect()
    for i, r in enumerate(rows):
        px = decode_png(bytes(r.payload))
        a, b, c = 1 + i % 7, 2 + i % 5, (i * 11) % 256
        ys = np.arange(r.height)[:, None]
        xs = np.arange(r.width)[None, :]
        want = ((a * xs + b * ys + c) % 256).astype(np.uint8)
        assert (px[:, :, 0] == want).all()


def test_extract_features_real_path_histogram(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        extract_features,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, 8)
    feats = extract_features(media, n_features=8, decode_stub=False).collect()
    assert len(feats) == 8
    by_id = {r.media_id: r for r in feats}
    for i in range(8):
        r = by_id[f"png_{i:05d}"]
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram
        # cross-check bucket counts against a direct numpy decode
        px = decode_png(bytes(media.collect()[i].payload))
        lum = px.reshape(px.shape[0], px.shape[1], -1).mean(axis=2)
        want = np.histogram(lum, bins=8, range=(0.0, 256.0))[0] / lum.size
        assert np.allclose(np.array(r.features), want, atol=1e-6)


def test_resize_images_real_path_roundtrip(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        resize_images,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, 5)
    out = resize_images(media, width=10, height=7, decode_stub=False).collect()
    originals = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in out:
        assert (r.width, r.height) == (10, 7)
        px = decode_png(bytes(r.payload))
        assert px.shape == (7, 10, 1)
        # pixel-exact nearest-neighbor of the decoded original
        want = resize_nearest(decode_png(originals[r.media_id]), 10, 7)
        assert (px == want).all()


def test_real_path_rejects_non_png(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        extract_features(
            synthetic_media(spark, 3), decode_stub=False
        ).collect()


def test_png_pixel_stats_matches_direct_decode(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        png_pixel_stats,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, 12)
    got = {r.media_id: r for r in png_pixel_stats(media).collect()}
    assert len(got) == 12
    for src in media.collect():
        px = decode_png(bytes(src.payload))[:, :, 0].astype(np.int64)
        r = got[src.media_id]
        assert r.n_px == px.size
        assert r.sum_lum == int(px.sum())
        assert r.min_lum == int(px.min())
        assert r.max_lum == int(px.max())
        pos = np.arange(px.size).reshape(px.shape)
        assert r.pos_checksum == int((px * pos).sum() % 1_000_000_007)
