"""Real WAV codec tier (operators/multimodal.py:decode_wav): stdlib
round-trips pin the decode math; the Spark-side query parity is covered by
the wav_audio_features oracle row."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from hnsw_spark.operators.multimodal import (
    decode_audio,
    decode_wav,
    synthetic_wav_media,
    wav_audio_features,
)


def _wav_bytes(samples: np.ndarray, sr: int, n_ch: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_decode_wav_int16_roundtrip():
    pcm = np.array([-32768, -1, 0, 1, 256, 32767], dtype="<i2")
    wave_f, sr = decode_wav(_wav_bytes(pcm, 8000))
    assert sr == 8000
    assert wave_f.dtype == np.float32
    # float32 holds any int16/32768 exactly, so the round-trip is lossless
    back = np.rint(wave_f.astype(np.float64) * 32768.0).astype(np.int64)
    assert back.tolist() == pcm.astype(np.int64).tolist()


def test_decode_wav_stereo_mono_average():
    left = np.array([1000, 2000], dtype="<i2")
    right = np.array([3000, 4000], dtype="<i2")
    interleaved = np.empty(4, dtype="<i2")
    interleaved[0::2], interleaved[1::2] = left, right
    wave_f, _ = decode_wav(_wav_bytes(interleaved, 16000, n_ch=2))
    expect = (left.astype(np.float64) + right) / 2.0 / 32768.0
    np.testing.assert_allclose(wave_f, expect.astype(np.float32), rtol=0, atol=0)


def test_decode_wav_8bit_unsigned():
    pcm8 = np.array([0, 128, 255], dtype=np.uint8)
    wave_f, _ = decode_wav(_wav_bytes(pcm8, 8000, width=1))
    np.testing.assert_allclose(
        wave_f, np.array([-1.0, 0.0, 127 / 128], dtype=np.float32)
    )


def test_decode_audio_dispatches_riff():
    pcm = np.arange(16, dtype="<i2")
    payload = _wav_bytes(pcm, 8000)
    out = decode_audio(payload, sample_rate=8000)
    assert len(out) == 16  # real decode: frame count, not the stub's sr·1s


def test_decode_wav_rejects_unknown_width():
    pcm = np.zeros(4, dtype="<i2")
    raw = bytearray(_wav_bytes(pcm, 8000))
    with pytest.raises(Exception):
        decode_wav(bytes(raw[:10]))  # truncated container


def test_wav_features_spark_parity(spark):
    media = synthetic_wav_media(spark, count=4, sample_rate=8000, n_samples=512)
    rows = {r["media_id"]: r for r in wav_audio_features(media).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    local = {
        r["media_id"]: r["payload"] for r in media.select("media_id", "payload").collect()
    }
    for mid, payload in local.items():
        wave_f, sr = decode_wav(bytes(payload))
        assert rows[mid]["sample_rate"] == sr == 8000
        assert rows[mid]["n_samples"] == len(wave_f) == 512
        pcm = np.rint(wave_f.astype(np.float64) * 32768.0).astype(np.int64)
        assert rows[mid]["pcm16_sum"] == int(pcm.sum())
        assert len(rows[mid]["embedding"]) == 64
