"""Rawvideo-AVI codec correctness: roundtrip, container parsing, and the
real (non-stub) video decode paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from otlp_cardinality_checker_spark.functions.avi import (
    AviError,
    decode_avi,
    encode_avi,
    is_avi,
)


def test_roundtrip_padded_and_unpadded_strides():
    rng = np.random.default_rng(7)
    # w=8 -> 24-byte rows, already aligned; w=11 -> 33-byte rows, padded to 36
    for w in (8, 11):
        frames = rng.integers(0, 256, size=(5, 6, w, 3), dtype=np.uint8)
        out, us = decode_avi(encode_avi(frames, 33333))
        assert us == 33333
        assert out.shape == frames.shape
        assert (out == frames).all()


def test_decoder_row_order_is_bottom_up():
    """The stored DIB rows are bottom-up; a decoder that forgets to flip
    returns the frame upside down."""
    frame = np.zeros((4, 8, 3), dtype=np.uint8)
    frame[0, :, :] = 200  # top scanline bright
    data = encode_avi(frame[None], 40000)
    # last stride-sized run inside the 00db chunk must hold the TOP row
    stride = 8 * 3
    movi = data.index(b"00db") + 8
    stored_last_row = data[movi + 3 * stride : movi + 4 * stride]
    assert set(stored_last_row) == {200}
    out, _ = decode_avi(data)
    assert (out[0] == frame).all()


def test_decoder_skips_junk_chunks_and_rec_lists():
    """Real muxers emit JUNK padding and wrap frames in 'rec ' LISTs; the
    walker must skip/descend through both."""
    frames = np.arange(2 * 4 * 8 * 3, dtype=np.uint8).reshape(2, 4, 8, 3) % 256
    base = encode_avi(frames, 40000)
    # split base: RIFF header(12) + hdrl LIST + movi LIST
    hdrl_size = struct.unpack("<I", base[16:20])[0]
    hdrl_end = 12 + 8 + hdrl_size + (hdrl_size & 1)
    hdrl = base[12:hdrl_end]
    movi = base[hdrl_end:]
    junk = b"JUNK" + struct.pack("<I", 7) + b"paddingX"[:7] + b"\x00"
    # rewrap each 00db frame chunk in its own 'rec ' LIST
    movi_body = movi[12:]  # past LIST+size+'movi'
    rec_body = b""
    off = 0
    while off + 8 <= len(movi_body):
        size = struct.unpack("<I", movi_body[off + 4 : off + 8])[0]
        chunk = movi_body[off : off + 8 + size + (size & 1)]
        rec = b"rec " + chunk
        rec_body += b"LIST" + struct.pack("<I", len(rec)) + rec
        off += 8 + size + (size & 1)
    new_movi_inner = b"movi" + rec_body
    new_movi = b"LIST" + struct.pack("<I", len(new_movi_inner)) + new_movi_inner
    riff_body = b"AVI " + hdrl + junk + new_movi
    crafted = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    out, us = decode_avi(crafted)
    assert us == 40000
    assert (out == frames).all()


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(AviError):
        decode_avi(b"definitely not a movie" * 4)
    assert not is_avi(b"RIFFxxxxWAVE" + b"\x00" * 60)
    # compressed stream (non-zero biCompression) must be refused
    frames = np.zeros((1, 4, 8, 3), dtype=np.uint8)
    data = bytearray(encode_avi(frames, 40000))
    strf = data.index(b"strf") + 8  # BITMAPINFOHEADER start
    data[strf + 16 : strf + 20] = struct.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(AviError):
        decode_avi(bytes(data))
    # truncated frame chunk
    data2 = bytearray(encode_avi(frames, 40000))
    db = data2.index(b"00db") + 4
    size = struct.unpack("<I", data2[db : db + 4])[0]
    data2[db : db + 4] = struct.pack("<I", size - 4)
    with pytest.raises(AviError):
        decode_avi(bytes(data2[:-4]))


def test_synthetic_avi_media_decodes_to_formula(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        synthetic_avi_media,
    )

    rows = synthetic_avi_media(spark, 8).collect()
    for i, r in enumerate(rows):
        frames, us = decode_avi(bytes(r.payload))
        w = 8 + (i % 3) * 3
        h = 6 + (i % 4) * 2
        nf = 3 + i % 4
        a, b, d = 1 + i % 5, 2 + i % 3, (i * 13) % 256
        f = np.arange(nf, dtype=np.int64)[:, None, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None, None]
        x = np.arange(w, dtype=np.int64)[None, None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, None, :]
        want = ((a * x + b * y + 7 * f + 11 * c + d) % 256).astype(np.uint8)
        assert us == 33333 + i * 100
        assert frames.shape == (nf, h, w, 3)
        assert (frames == want).all()
        assert r.duration_ms == nf * us // 1000


def test_avi_frame_stats_matches_direct_decode(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        avi_frame_stats,
        synthetic_avi_media,
    )

    media = synthetic_avi_media(spark, 10)
    got = {r.media_id: r for r in avi_frame_stats(media).collect()}
    assert len(got) == 10
    for src in media.collect():
        frames, us = decode_avi(bytes(src.payload))
        v = frames.astype(np.int64)
        r = got[src.media_id]
        nf, h, w, _ = frames.shape
        assert (r.n_frames, r.width, r.height) == (nf, w, h)
        assert r.us_per_frame == us
        assert r.sum_v == int(v.sum())
        assert (r.min_v, r.max_v) == (int(v.min()), int(v.max()))
        pos = np.arange(v.size, dtype=np.int64).reshape(v.shape)
        assert r.pos_checksum == int((v * (pos + 1)).sum())


def test_avi_sampled_frame_stats_matches_direct_decode(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        avi_sampled_frame_stats,
        synthetic_avi_media,
    )

    media = synthetic_avi_media(spark, 8)
    got = {
        (r.media_id, r.frame_idx): r
        for r in avi_sampled_frame_stats(media, every_n=2).collect()
    }
    n_expected = 0
    for src in media.collect():
        frames, us = decode_avi(bytes(src.payload))
        for fi in range(0, frames.shape[0], 2):
            n_expected += 1
            v = frames[fi].astype(np.int64).ravel()
            r = got[(src.media_id, fi)]
            assert r.ts_ms == fi * us // 1000
            assert r.sum_v == int(v.sum())
            assert (r.min_v, r.max_v) == (int(v.min()), int(v.max()))
            pos = np.arange(v.size, dtype=np.int64)
            assert r.pos_checksum == int((v * (pos + 1)).sum())
    assert len(got) == n_expected


def test_extract_features_real_path_handles_avi(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        extract_features,
        synthetic_avi_media,
    )

    media = synthetic_avi_media(spark, 6)
    feats = extract_features(media, n_features=8, decode_stub=False).collect()
    assert len(feats) == 6
    for r in feats:
        assert abs(sum(r.features) - 1.0) < 1e-6
        assert r.modality == "video"
