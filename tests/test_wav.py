"""WAV/PCM codec correctness: roundtrip, chunk parsing, and the real
(non-stub) audio decode paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from otlp_cardinality_checker_spark.functions.wav import (
    WavError,
    decode_wav,
    encode_wav,
    is_wav,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000
    assert out.shape == (777, 1)
    assert (out[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and out.shape == (300, 2)
    assert (out == stereo).all()


def test_decoder_skips_extra_chunks_and_word_alignment():
    """A LIST chunk with an ODD size sits between fmt and data; the parser
    must skip it word-aligned and still find the samples."""
    samples = np.array([1, -2, 3], dtype=np.int16)
    base = encode_wav(samples, 8000)
    fmt_chunk = base[12:36]  # 'fmt ' + size + 16 bytes
    data_chunk = base[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    riff_body = b"WAVE" + fmt_chunk + extra + data_chunk
    crafted = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    out, rate = decode_wav(crafted)
    assert rate == 8000 and (out[:, 0] == samples).all()


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(WavError):
        decode_wav(b"not audio" * 10)
    assert not is_wav(b"RIFFxxxx????" + b"\x00" * 60)
    # 8-bit PCM unsupported
    samples = np.zeros(10, dtype=np.int16)
    data = bytearray(encode_wav(samples, 8000))
    data[34] = 8  # bits-per-sample field
    with pytest.raises(WavError):
        decode_wav(bytes(data))


def test_synthetic_wav_media_decodes_to_formula(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        synthetic_wav_media,
    )

    rows = synthetic_wav_media(spark, 6).collect()
    for i, r in enumerate(rows):
        samples, rate = decode_wav(bytes(r.payload))
        n = 256 + (i * 37) % 512
        a, b = 3 + i % 11, (i * 97) % 65536
        t = np.arange(n, dtype=np.int64)
        want = ((a * t + b) % 65536 - 32768).astype(np.int16)
        assert rate == 8000 + 1000 * (i % 5)
        assert (samples[:, 0] == want).all()
        assert r.duration_ms == n * 1000 // rate


def test_wav_sample_stats_matches_direct_decode(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        synthetic_wav_media,
        wav_sample_stats,
    )

    media = synthetic_wav_media(spark, 10)
    got = {r.media_id: r for r in wav_sample_stats(media).collect()}
    assert len(got) == 10
    for src in media.collect():
        s = decode_wav(bytes(src.payload))[0][:, 0].astype(np.int64)
        r = got[src.media_id]
        assert r.n_samples == s.size
        assert r.sum_s == int(s.sum())
        assert (r.min_s, r.max_s) == (int(s.min()), int(s.max()))
        assert r.zero_crossings == int(((s[:-1] * s[1:]) < 0).sum())
        t = np.arange(s.size, dtype=np.int64)
        assert r.pos_checksum == int(((s + 32768) * (t + 1)).sum())


def test_extract_features_real_path_handles_wav(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        extract_features,
        synthetic_wav_media,
    )

    media = synthetic_wav_media(spark, 6)
    feats = extract_features(media, n_features=8, decode_stub=False).collect()
    assert len(feats) == 6
    for r in feats:
        assert abs(sum(r.features) - 1.0) < 1e-6
        assert r.modality == "audio"
