"""D55: energy-based audio silence trim / voice-activity segmentation
over binary WAV columns — planted-structure exact, zero shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.multimodal import (
    audio_activity,
    decode_audio,
    encode_wav_pcm16,
    synth_wav_assets,
)


def test_pcm16_encode_decode_roundtrip():
    samples = [0.0, 0.5, -0.5, 0.25, -1.0, 1.0]
    rate, got = decode_audio(encode_wav_pcm16(samples, rate=16000))
    assert rate == 16000
    assert len(got) == len(samples)
    for a, b in zip(samples, got):
        assert abs(a - b) < 1e-3


def _wav_of_frames(frames, frame_len=160):
    # frames: list of 'S' (silence) / 'A' (active)
    samples = []
    for f in frames:
        if f == "S":
            samples += [0.0] * frame_len
        else:
            samples += [0.5 if i % 2 == 0 else -0.5
                        for i in range(frame_len)]
    return encode_wav_pcm16(samples)


def test_trim_points_and_mid_silence(spark):
    df = spark.createDataFrame(
        [
            Row(asset_id=0, content=_wav_of_frames("SSAASAS")),
            Row(asset_id=1, content=_wav_of_frames("AAA")),
            Row(asset_id=2, content=_wav_of_frames("SSSS")),  # silent
        ]
    )
    out = {r["asset_id"]: r.asDict() for r in audio_activity(df).collect()}
    # mid-frame silence is neither lead nor trail, and not active
    assert out[0]["lead_silence"] == 2 and out[0]["trail_silence"] == 1
    assert out[0]["active_frames"] == 3 and out[0]["n_frames"] == 7
    assert out[0]["speech_ratio"] == 0.4285  # floor(3/7 * 1e4) / 1e4
    assert out[1]["lead_silence"] == 0 and out[1]["trail_silence"] == 0
    assert out[1]["speech_ratio"] == 1.0
    # fully silent: the "drop me" signature
    assert out[2]["lead_silence"] == 4 and out[2]["trail_silence"] == 4
    assert out[2]["active_frames"] == 0 and out[2]["speech_ratio"] == 0.0


def test_partial_trailing_frame_counts(spark):
    # 160 active + 40 active samples -> 2 frames at frame_len=160
    samples = [0.5 if i % 2 == 0 else -0.5 for i in range(200)]
    df = spark.createDataFrame(
        [Row(asset_id=0, content=encode_wav_pcm16(samples))]
    )
    (r,) = audio_activity(df).collect()
    assert r["n_frames"] == 2 and r["active_frames"] == 2


def test_planted_structure_matches_id_arithmetic(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") < 120)
    )
    got = {
        r["asset_id"]: (
            r["n_frames"], r["lead_silence"], r["trail_silence"],
            r["active_frames"],
        )
        for r in audio_activity(synth_wav_assets(docs)).collect()
    }
    for i in got:
        lead, active, trail = i % 5, 3 + (i // 5) % 4, (i // 20) % 3
        assert got[i] == (lead + active + trail, lead, trail, active)
    assert len(got) == 120


def test_validation(spark):
    df = spark.createDataFrame(
        [Row(asset_id=0, content=_wav_of_frames("A"))]
    )
    with pytest.raises(ValueError, match="frame_len"):
        audio_activity(df, frame_len=0)
    with pytest.raises(ValueError, match="threshold"):
        audio_activity(df, threshold=-1.0)


def test_plan_zero_shuffles(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    out = audio_activity(synth_wav_assets(docs))
    p = out._jdf.queryExecution().executedPlan().toString()
    # synth + activity are both mapInPandas projections — no Exchange
    assert "Exchange" not in p, p
