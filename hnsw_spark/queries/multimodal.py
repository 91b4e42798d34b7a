"""Multimodal query surface: the image decode → feature-extract pipeline and
video frame sampling over a deterministic synthetic media table.

The codec layer is a clearly-labeled stub (the container has no image/audio
libraries, see operators/multimodal.py) whose byte stream is deliberately
SQL-reproducible, so the image/audio feature queries carry REAL value
oracles (decode checksums recomputed by DuckDB from the payload bytes) on
top of the dim/unit-norm invariants.  Only the scene-cut query stays
rows-only (its per-frame feature distances go through the float feature
extractor, which SQL can't reproduce).  The Spark-side plumbing being
exercised — binary columns with typed metadata, Arrow-batched mapInPandas
decode, fixed-schema feature rows feeding the ANN/dedup operators — is the
real, scale-relevant part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.functions.similarity import l2_norm
from hnsw_spark.operators.multimodal import (
    audio_features,
    frame_sample,
    image_features,
    synthetic_media,
)
from hnsw_spark.operators.evaluation import dquant
from hnsw_spark.registry import query

N_MEDIA = 64


# The stub codec's byte stream is SQL-reproducible by design (operators/
# multimodal.py:_byte_stream): pixel/sample k = (payload[k mod 64] + 31k)
# mod 256, and the fixture payload is md5('media'||i) bytes repeated 4x —
# so the oracle recomputes the exact decode checksums from first
# principles, upgrading these from rows-only to hash-matched value checks
# of the whole decode → feature plumbing (dim, unit norm, checksum).
_IMG_SQL = f"""
WITH m AS (
  SELECT range::BIGINT AS media_id, md5('media' || range::VARCHAR) AS h
  FROM range({N_MEDIA})
), px AS (
  SELECT media_id,
         SUM((('0x' || substr(h, 2*(k.k % 16)+1, 2))::BIGINT + 31*k.k) % 256)::BIGINT
           AS byte_sum
  FROM m, (SELECT unnest(generate_series(0, 12*16*3 - 1))::BIGINT AS k) k
  GROUP BY media_id
)
SELECT media_id, 64::INT AS dim, 10000::BIGINT AS norm_fp,
       16::INT AS width, 12::INT AS height, byte_sum
FROM px
"""


@query("multimodal_image_features", _IMG_SQL)
def multimodal_image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract 64 synthetic images via Arrow-batched
    mapInPandas; emits (media_id, dim, norm, width, height, byte_sum) — the
    embedding column itself feeds knn_exact/build_ivf_index unchanged
    (tested in tests/test_streaming_multimodal.py).  The oracle recomputes
    byte_sum (the exact decoded-pixel checksum) from the payload bytes."""
    media = synthetic_media(spark, count=N_MEDIA, kind="image")
    feats = image_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        dquant(l2_norm("embedding"), 4).alias("norm_fp"),
        "width",
        "height",
        "byte_sum",
    )


_AUDIO_N, _AUDIO_SR = 32, 16000
_AUDIO_SQL = f"""
WITH m AS (
  SELECT range::BIGINT AS media_id, md5('media' || range::VARCHAR) AS h
  FROM range({_AUDIO_N})
), px AS (
  SELECT media_id,
         SUM((('0x' || substr(h, 2*(k.k % 16)+1, 2))::BIGINT + 31*k.k) % 256)::BIGINT
           AS pcm_sum
  FROM m, (SELECT unnest(generate_series(0, {_AUDIO_SR} - 1))::BIGINT AS k) k
  GROUP BY media_id
)
SELECT media_id, 64::INT AS dim, 10000::BIGINT AS norm_fp,
       {_AUDIO_SR}::INT AS sample_rate, pcm_sum
FROM px
"""


@query("multimodal_audio_features", _AUDIO_SQL)
def multimodal_audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract synthetic audio (frame RMS, zero-crossing
    rate, FFT band energies) via Arrow-batched mapInPandas.  The oracle
    recomputes pcm_sum (the wave re-quantized to 8-bit PCM and summed
    exactly) from the payload bytes."""
    media = synthetic_media(spark, count=_AUDIO_N, kind="audio")
    feats = audio_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        dquant(l2_norm("embedding"), 4).alias("norm_fp"),
        "sample_rate",
        "pcm_sum",
    )


_FS_COUNT, _FS_FRAMES, _FS_EVERY = 16, 100, 10


@query(
    "multimodal_frame_sample",
    f"""
SELECT m.media_id, f.frame_idx::INT AS frame_idx
FROM (SELECT range::BIGINT AS media_id FROM range({_FS_COUNT})) m,
     (SELECT unnest(generate_series(0, {_FS_FRAMES - 1}, {_FS_EVERY})) AS frame_idx) f
""",
)
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every-10th-frame expansion over synthetic video
    rows.  Pure relational sequence/explode plumbing, so unlike the stubbed
    decode stages it IS SQL-expressible: the DuckDB generate_series oracle
    checks the expansion exactly (fixed n_frames=100 per fixture row)."""
    media = synthetic_media(spark, count=_FS_COUNT, kind="video")
    return frame_sample(media, every_n=_FS_EVERY)


_SC_N = 8
_SC_SQL = f"""
SELECT m.media_id, f.frame_idx::INT AS frame_idx
FROM (SELECT range::BIGINT AS media_id FROM range({_SC_N})) m,
     (SELECT unnest([40, 80]) AS frame_idx) f
"""


@query("multimodal_scene_cuts", _SC_SQL)
def multimodal_scene_cuts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection: sampled frames → per-frame features (stubbed
    decode, scene-structured fake) → window-lag euclidean distance per media
    → cut rows.  The detection layer (window + Catalyst kernel) is entirely
    real Spark; the fake decoder plants scene boundaries every 40 frames, so
    the detector must find cuts at EXACTLY sampled frames 40 and 80 for each
    of the {_SC_N} videos — which is what the oracle pins (the float ``dist``
    itself goes through the feature extractor and stays SQL-inexpressible,
    so it is asserted in tests/test_streaming_multimodal.py instead)."""
    from hnsw_spark.operators.multimodal import frame_features, scene_cuts

    media = synthetic_media(spark, count=_SC_N, kind="video")
    feats = frame_features(media, every_n=10)
    return scene_cuts(feats, threshold=0.05).select("media_id", "frame_idx")


_WAV_N, _WAV_SR, _WAV_SAMPLES = 16, 8000, 8000

# Real-codec tier: the payloads are genuine RIFF/WAVE containers (stdlib
# ``wave`` writer) that decode_wav must actually parse — but their int16
# samples are the same SQL-reproducible md5 byte stream scaled to
# (v−128)·256, so the decode-integrity checksum (exact sum of the raw
# int16 samples) is still recomputable by DuckDB from first principles.
_WAV_SQL = f"""
WITH m AS (
  SELECT range::BIGINT AS media_id, md5('wav' || range::VARCHAR) AS h
  FROM range({_WAV_N})
), px AS (
  SELECT media_id,
         SUM((((('0x' || substr(h, 2*(k.k % 16)+1, 2))::BIGINT + 31*k.k) % 256)
              - 128) * 256)::BIGINT AS pcm16_sum
  FROM m, (SELECT unnest(generate_series(0, {_WAV_SAMPLES} - 1))::BIGINT AS k) k
  GROUP BY media_id
)
SELECT media_id, 64::INT AS dim, 10000::BIGINT AS norm_fp,
       {_WAV_SR}::INT AS sample_rate, {_WAV_SAMPLES}::INT AS n_samples,
       pcm16_sum
FROM px
"""


@query("wav_audio_features", _WAV_SQL)
def wav_audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (VERDICT r4 stretch #8): the fixture payloads are
    actual WAV files — 44-byte RIFF header plus 16-bit mono PCM — and the
    Arrow-batched mapInPandas stage parses the container with the stdlib
    ``wave`` module (operators/multimodal.py:decode_wav), converts to
    float32 mono, and runs the same feature kernel as the stub tier.  The
    oracle recomputes pcm16_sum (exact raw-sample checksum) plus the
    header-derived sample_rate/n_samples, so a decode that misparsed the
    container (wrong offset, wrong endianness, header bytes read as
    samples) hash-fails the row."""
    from hnsw_spark.operators.multimodal import (
        synthetic_wav_media,
        wav_audio_features,
    )

    media = synthetic_wav_media(
        spark, count=_WAV_N, sample_rate=_WAV_SR, n_samples=_WAV_SAMPLES
    )
    feats = wav_audio_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        dquant(l2_norm("embedding"), 4).alias("norm_fp"),
        "sample_rate",
        "n_samples",
        "pcm16_sum",
    )


_PPM_N, _PPM_W, _PPM_H = 16, 16, 12

# Real-codec image tier: payloads are genuine binary-PPM (P6) containers —
# ASCII header with a planted comment line, then raw RGB bytes — that
# decode_ppm must actually tokenize and parse; but pixel byte k is the same
# SQL-reproducible md5 byte stream, so the decode-integrity checksum (exact
# raw RGB byte sum) is recomputable by DuckDB from first principles.
_PPM_SQL = f"""
WITH m AS (
  SELECT range::BIGINT AS media_id, md5('ppm' || range::VARCHAR) AS h
  FROM range({_PPM_N})
), px AS (
  SELECT media_id,
         SUM((('0x' || substr(h, 2*(k.k % 16)+1, 2))::BIGINT + 31*k.k) % 256)
           ::BIGINT AS pixel_sum
  FROM m, (SELECT unnest(generate_series(0, {_PPM_W * _PPM_H * 3} - 1))::BIGINT AS k) k
  GROUP BY media_id
)
SELECT media_id, 64::INT AS dim, 10000::BIGINT AS norm_fp,
       {_PPM_W}::INT AS width, {_PPM_H}::INT AS height, pixel_sum
FROM px
"""


@query("ppm_image_features", _PPM_SQL)
def ppm_image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (the image counterpart to ``wav_audio_features``):
    the fixture payloads are actual binary-PPM files — tokenized ASCII
    header (with a comment line the parser must skip) plus raw RGB
    raster — and the Arrow-batched mapInPandas stage parses the container
    with numpy alone (operators/multimodal.py:decode_ppm), reads width and
    height from the HEADER, and runs the same feature kernel as the stub
    tier.  The oracle recomputes pixel_sum (exact raw RGB byte checksum)
    plus the header-derived dimensions, so a decode that misparsed the
    header (comment not skipped, wrong raster offset, wrong shape) would
    hash-fail the row."""
    from hnsw_spark.operators.multimodal import (
        ppm_image_features,
        synthetic_ppm_media,
    )

    media = synthetic_ppm_media(
        spark, count=_PPM_N, width=_PPM_W, height=_PPM_H
    )
    feats = ppm_image_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        dquant(l2_norm("embedding"), 4).alias("norm_fp"),
        "width",
        "height",
        "pixel_sum",
    )
