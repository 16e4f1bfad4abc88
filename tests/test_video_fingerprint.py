"""operators/multimodal.video_fingerprint (j59) — perceptual contract:
the fingerprint follows LUMA trends (within-frame dHash bits + sampled
frame-delta bits), so it is invariant to uniform brightness scaling,
distinguishes different clips, matches a hand-computed known answer,
and degenerates safely (1 frame -> spatial bits only)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from scopus_spark.operators.avi import encode_avi
from scopus_spark.operators.multimodal import video_fingerprint


def _media(spark, clips: dict[int, np.ndarray]):
    rows = [
        (mid, bytearray(encode_avi(fr.astype(np.uint8))))
        for mid, fr in clips.items()
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "payload"])
    df = spark.createDataFrame(pdf, "media_id long, payload binary")
    return df.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/x-msvideo").alias("mime"),
            F.lit(2).alias("width"),
            F.lit(2).alias("height"),
        ).alias("meta"),
    )


def _fp(spark, clips, every_n=2):
    return {
        r.media_id: (r.n_frames, r.n_sampled, r.vhash)
        for r in video_fingerprint(
            _media(spark, clips), every_n=every_n
        ).collect()
    }


def _gray_frames(levels: list[int]) -> np.ndarray:
    """One 2x2 frame per level; within each frame the 4 pixels are
    level, level+1, level+2, level+3 (a strictly rising luma ramp)."""
    out = np.zeros((len(levels), 2, 2, 3), dtype=np.uint8)
    for t, lv in enumerate(levels):
        ramp = np.array([lv, lv + 1, lv + 2, lv + 3]).reshape(2, 2)
        out[t] = np.repeat(ramp[..., None], 3, axis=2)
    return out


def test_known_answer_gray_ramps(spark):
    """Gray frames with rising in-frame ramps: every spatial bit is set
    (luma strictly rises across the 4 pixels); temporal bits follow the
    sampled frames' level sequence."""
    # frames 0..5, sampled (every 2nd) -> frames 0, 2, 4 = levels 10, 50, 30
    out = _fp(spark, {1: _gray_frames([10, 90, 50, 20, 30, 60])})
    n_frames, n_sampled, vhash = out[1]
    assert (n_frames, n_sampled) == (6, 3)
    # gray pixel luma == gray level (299+587+114 = 1000): frame j ramp
    # l, l+1, l+2, l+3 -> all 3 spatial bits set for j = 0, 1, 2
    want = 0
    for j in range(3):
        want |= 0b111 << (4 * j)
    # totals: 4*10+6, 4*50+6, 4*30+6 -> rose at j=1 (bit 3), fell at j=2
    want |= 1 << 3
    assert vhash == want


def test_brightness_invariance_and_discrimination(spark):
    base = _gray_frames([10, 0, 50, 0, 30, 0, 70, 0])
    brighter = _gray_frames([30, 0, 70, 0, 50, 0, 90, 0])  # +20 uniform
    other = _gray_frames([70, 0, 30, 0, 50, 0, 10, 0])  # reversed trend
    out = _fp(spark, {1: base, 2: brighter, 3: other})
    assert out[1][2] == out[2][2] != 0  # uniform shift preserves the fp
    assert out[1][2] != out[3][2]  # different trend sequence differs


def test_single_frame_has_spatial_bits_only(spark):
    out = _fp(spark, {1: _gray_frames([40])})
    n_frames, n_sampled, vhash = out[1]
    assert (n_frames, n_sampled) == (1, 1)
    assert vhash == 0b111  # rising ramp: 3 spatial bits, no temporal


def test_matches_pure_python_reference(spark):
    """Cross-check the Spark path against an independent reference
    implementation on deterministic pseudo-random frames."""
    rng = np.random.RandomState(59)
    clips = {
        mid: rng.randint(0, 256, size=(rng.randint(1, 40), 2, 2, 3))
        for mid in range(1, 6)
    }
    out = _fp(spark, clips)
    for mid, fr in clips.items():
        sampled = fr[::2][:15]
        luma = (
            299 * sampled[..., 0].astype(np.int64)
            + 587 * sampled[..., 1].astype(np.int64)
            + 114 * sampled[..., 2].astype(np.int64)
        ) // 1000
        flat = luma.reshape(luma.shape[0], 4)
        want = 0
        for j in range(flat.shape[0]):
            for b in range(3):
                if flat[j, b] < flat[j, b + 1]:
                    want |= 1 << (4 * j + b)
            if j >= 1 and flat[j].sum() > flat[j - 1].sum():
                want |= 1 << (4 * j - 1)
        assert out[mid] == (fr.shape[0], (fr.shape[0] + 1) // 2, want)
