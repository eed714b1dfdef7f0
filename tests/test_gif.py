"""GIF/LZW codec correctness: real variable-width LZW compression
roundtrips, container parsing, and the non-stub decode paths."""

from __future__ import annotations

import numpy as np
import pytest

from otlp_cardinality_checker_spark.functions.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
)


def test_lzw_roundtrip_exercises_width_growth_and_resets():
    """256-symbol random data pushes the code width to 12 bits and forces
    table-full CLEAR resets; run-heavy data exercises the KwKwK case."""
    rng = np.random.default_rng(11)
    rand = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    out = _lzw_decode(_lzw_encode(rand, 8), 8, len(rand))
    assert out.tobytes() == rand

    runs = (b"\x00" * 500 + b"\x01" * 500) * 10
    enc = _lzw_encode(runs, 2)
    assert len(enc) < len(runs) // 4  # genuinely compressed
    assert _lzw_decode(enc, 2, len(runs)).tobytes() == runs


def test_lzw_end_code_width_boundary():
    """Regression pin (found by hypothesis): the decoder adds one more
    table entry after the FINAL data code than the encoder does; when
    that add lands exactly on 2^width the decoder bumps and reads END at
    width+1, so the encoder must mirror the bump.  This 14-symbol stream
    puts the final add exactly at table size 16 == 2^4."""
    data = bytes([3, 1, 3, 3, 0, 2, 2, 2, 0, 3, 1, 2, 0, 2])
    out = _lzw_decode(_lzw_encode(data, 2), 2, len(data))
    assert out.tobytes() == data


def test_lzw_rejects_truncation_and_overrun():
    data = b"abcabcabc" * 50
    enc = _lzw_encode(data, 8)
    with pytest.raises(GifError):
        _lzw_decode(enc[: len(enc) // 2], 8, len(data))
    with pytest.raises(GifError):
        _lzw_decode(enc, 8, len(data) - 10)  # more pixels than frame


def test_gif_roundtrip_multi_frame_random_palette():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(3, 50, 61), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    data = encode_gif(frames, pal, delay_cs=7)
    assert is_gif(data)
    f2, p2, delay = decode_gif(data)
    assert delay == 7
    assert (f2 == frames).all()
    assert (p2 == pal).all()


def test_gif_roundtrip_small_palette():
    bw = (np.indices((2, 9, 9)).sum(0) % 2).astype(np.uint8)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    f2, p2, _ = decode_gif(encode_gif(bw, pal2))
    assert (f2 == bw).all() and p2.shape == (2, 3)


def test_gif_rejects_garbage_and_unsupported():
    with pytest.raises(GifError):
        decode_gif(b"not a gif at all" * 4)
    assert not is_gif(b"GIF90a" + b"\x00" * 20)
    frames = np.zeros((1, 4, 4), dtype=np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)
    data = bytearray(encode_gif(frames, pal))
    img = data.index(0x2C, 13)  # image descriptor
    data[img + 9] |= 0x40  # interlace flag
    with pytest.raises(GifError):
        decode_gif(bytes(data))
    with pytest.raises(GifError):
        encode_gif(frames, np.zeros((3, 3), dtype=np.uint8))  # non-pow2
    with pytest.raises(GifError):
        encode_gif(np.full((1, 4, 4), 9, dtype=np.uint8), pal)  # idx >= k


def test_synthetic_gif_media_decodes_to_formula(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        synthetic_gif_media,
    )

    rows = synthetic_gif_media(spark, 8).collect()
    for i, row in enumerate(rows):
        frames, pal, delay = decode_gif(bytes(row.payload))
        w = 10 + (i % 3) * 5
        h = 8 + (i % 4) * 3
        nf = 2 + i % 3
        a, b, d = 1 + i % 5, 2 + i % 3, (i * 19) % 256
        p, r = 3 + i % 4, (i * 17) % 256
        assert delay == 4 + i % 6
        assert frames.shape == (nf, h, w)
        f = np.arange(nf, dtype=np.int64)[:, None, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None, None]
        x = np.arange(w, dtype=np.int64)[None, None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, None, :]
        want = (p * (a * x + b * y + 5 * f + d) + 11 * c + r) % 256
        assert (pal[frames] == want).all()


def test_gif_frame_stats_matches_direct_decode(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        gif_frame_stats,
        synthetic_gif_media,
    )

    media = synthetic_gif_media(spark, 10)
    got = {r.media_id: r for r in gif_frame_stats(media).collect()}
    assert len(got) == 10
    for src in media.collect():
        frames, pal, delay = decode_gif(bytes(src.payload))
        v = pal[frames].astype(np.int64)
        r = got[src.media_id]
        nf, h, w = frames.shape
        assert (r.n_frames, r.width, r.height) == (nf, w, h)
        assert r.delay_cs == delay
        assert r.sum_v == int(v.sum())
        assert (r.min_v, r.max_v) == (int(v.min()), int(v.max()))
        pos = np.arange(v.size, dtype=np.int64).reshape(v.shape)
        assert r.pos_checksum == int((v * (pos + 1)).sum())


def test_extract_features_real_path_handles_gif(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        extract_features,
        synthetic_gif_media,
    )

    media = synthetic_gif_media(spark, 6)
    feats = extract_features(media, n_features=8, decode_stub=False).collect()
    assert len(feats) == 6
    for r in feats:
        assert abs(sum(r.features) - 1.0) < 1e-6
        assert r.modality == "image"
