# Perceptual average-hash (aHash) over REAL PNG decode + the
# complete-by-pigeonhole Hamming block join (operators/multimodal.py).
#
# The closed-form twin below recomputes every signature WITHOUT the PNG
# codec (straight from the gradient formula the fixture encodes), so
# Spark-side agreement is end-to-end proof that decode -> 8x8 sample ->
# integer mean comparison -> bit packing are all exact.
from __future__ import annotations

import itertools

import numpy as np
import pytest


def _closed_form_params(i: int) -> tuple[int, int, int, int, int]:
    if i % 4 == 3:
        w, h, a, b, c = _closed_form_params(i - 1)
        return w, h, a, b, (c + 1) % 256
    return 8 + (i * 3) % 17, 6 + (i * 5) % 13, 1 + i % 7, 2 + i % 5, (i * 29) % 256


def _closed_form_ahash(i: int) -> tuple[int, int, int]:
    """(hi, lo, n_bright) from the gradient formula — NO decoding."""
    w, h, a, b, c = _closed_form_params(i)
    gy, gx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    s = (a * ((gx * w) // 8) + b * ((gy * h) // 8) + c) % 256
    bright = 64 * s > s.sum()
    bit = gy * 8 + gx
    hi = int(sum(1 << (bb - 32) for bb, br in zip(bit.ravel(), bright.ravel()) if br and bb >= 32))
    lo = int(sum(1 << bb for bb, br in zip(bit.ravel(), bright.ravel()) if br and bb < 32))
    return hi, lo, int(bright.sum())


def test_ahash_matches_closed_form(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        image_ahash,
        synthetic_png_ahash_media,
    )

    got = {
        r["media_id"]: (r["ahash_hi"], r["ahash_lo"], r["n_bright"])
        for r in image_ahash(synthetic_png_ahash_media(spark, 48)).collect()
    }
    assert len(got) == 48
    for i in range(48):
        assert got[f"pah_{i:05d}"] == _closed_form_ahash(i), i
        hi, lo, nb = got[f"pah_{i:05d}"]
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32
        assert bin(hi).count("1") + bin(lo).count("1") == nb


def test_planted_near_dups_are_close():
    # The +1-luminance copies flip a bit only where a sampled pixel wraps
    # 255 -> 0 (or the mean comparison crosses a tie); across the fixture
    # every planted pair must stay within a small Hamming distance, and
    # at least one pair must be hash-identical (hamming 0).
    dists = []
    for i in range(3, 48, 4):
        ha, la, _ = _closed_form_ahash(i - 1)
        hb, lb, _ = _closed_form_ahash(i)
        dists.append(bin(ha ^ hb).count("1") + bin(la ^ lb).count("1"))
    assert min(dists) == 0
    assert max(dists) <= 3


def test_block_join_equals_brute_force(spark):
    # Completeness: the scalable 4x16-bit block join returns EXACTLY the
    # pair set a brute-force O(n^2) scan over the signatures finds.
    from otlp_cardinality_checker_spark.operators.multimodal import (
        image_near_dups,
        synthetic_png_ahash_media,
    )

    media = synthetic_png_ahash_media(spark, 48)
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in image_near_dups(media, 3).collect()
    }
    sigs = {f"pah_{i:05d}": _closed_form_ahash(i)[:2] for i in range(48)}
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        d = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
            sigs[a][1] ^ sigs[b][1]
        ).count("1")
        if d <= 3:
            want[(a, b)] = d
    assert got == want
    assert len(want) > 0


def test_block_df_cap_drops_degenerate_blocks(spark):
    # A cap of 0 drops EVERY block -> no candidate survives; the default
    # (100k) keeps them all at fixture scale.
    from otlp_cardinality_checker_spark.operators.multimodal import (
        image_near_dups,
        synthetic_png_ahash_media,
    )

    media = synthetic_png_ahash_media(spark, 16)
    assert image_near_dups(media, 3, max_block_df=0).count() == 0
    assert image_near_dups(media, 3, max_block_df=None).count() == image_near_dups(
        media, 3
    ).count()


def test_max_hamming_above_block_design_rejected(spark):
    from otlp_cardinality_checker_spark.operators.multimodal import (
        image_near_dups,
        synthetic_png_ahash_media,
    )

    with pytest.raises(AssertionError):
        image_near_dups(synthetic_png_ahash_media(spark, 4), 4)
