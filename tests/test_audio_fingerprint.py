"""operators/multimodal.audio_fingerprint (j54) — perceptual contract:
the fingerprint follows band-energy TRENDS, so it is invariant to
volume scaling and to mild noise, distinguishes different signals, and
short clips (< 2 frames) map to fp 0 without error."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from scopus_spark.operators.multimodal import audio_fingerprint
from scopus_spark.operators.wav import encode_wav


def _media(spark, clips: dict[int, np.ndarray]):
    rows = [(mid, bytearray(encode_wav(v.astype(np.int16)))) for mid, v in clips.items()]
    pdf = pd.DataFrame(rows, columns=["media_id", "payload"])
    return spark.createDataFrame(pdf, "media_id long, payload binary")


def _fp(spark, clips):
    return {
        r.media_id: (r.n_frames, r.fp)
        for r in audio_fingerprint(_media(spark, clips)).collect()
    }


def _tone(freq_steps: list[int], frame=64) -> np.ndarray:
    """A deterministic multi-frame signal whose per-frame amplitude
    follows freq_steps (one amplitude level per frame)."""
    rng = np.arange(frame)
    return np.concatenate(
        [((np.sin(rng / (2 + (a % 5))) * a * 100)).astype(np.int64) for a in freq_steps]
    ).clip(-32768, 32767)


def test_volume_invariance_and_discrimination(spark):
    base = _tone([1, 5, 2, 9, 3, 8, 1, 7, 4, 6, 2, 9, 5, 3, 8, 1])
    half = (base * 0.5).astype(np.int64)  # same trends, half volume
    other = _tone([9, 1, 8, 2, 7, 3, 6, 4, 5, 1, 9, 2, 8, 3, 7, 4])
    out = _fp(spark, {1: base, 2: half, 3: other})
    assert out[1][1] == out[2][1] != 0  # scaling preserves the fp
    assert out[1][1] != out[3][1]  # different trend sequence differs


def test_short_clip_yields_zero_fp(spark):
    out = _fp(spark, {1: np.arange(70)})  # 1 complete frame only
    assert out[1] == (1, 0)


def test_frame_count_drops_incomplete_tail(spark):
    out = _fp(spark, {1: np.arange(64 * 3 + 10)})
    assert out[1][0] == 3
