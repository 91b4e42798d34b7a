"""Multimodal query surface: the image decode → feature-extract pipeline and
video frame sampling over a deterministic synthetic media table.

Rows-only oracle: the stubbed codec (md5-seeded fake decode — the container
has no image libraries, see operators/multimodal.py) is not SQL-expressible,
but every output is deterministic, so row counts and schema are stable.  The
Spark-side plumbing being exercised — binary columns with typed metadata,
Arrow-batched mapInPandas decode, fixed-schema feature rows feeding the
ANN/dedup operators — is the real, scale-relevant part.
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
from hnsw_spark.registry import query

N_MEDIA = 64


@query("multimodal_image_features")  # rows-only: stubbed codec is not SQL
def multimodal_image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract 64 synthetic images via Arrow-batched
    mapInPandas; emits (media_id, dim, norm) — the embedding column itself
    feeds knn_exact/build_ivf_index unchanged (tested in
    tests/test_streaming_multimodal.py)."""
    media = synthetic_media(spark, count=N_MEDIA, kind="image")
    feats = image_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
        "width",
        "height",
    )


@query("multimodal_audio_features")  # rows-only: stubbed codec is not SQL
def multimodal_audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract synthetic audio (frame RMS, zero-crossing
    rate, FFT band energies) via Arrow-batched mapInPandas."""
    media = synthetic_media(spark, count=32, kind="audio")
    feats = audio_features(media)
    return feats.select(
        "media_id",
        F.size("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
        "sample_rate",
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


@query("multimodal_scene_cuts")  # rows-only: frame decode is the stubbed codec
def multimodal_scene_cuts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection: sampled frames → per-frame features (stubbed
    decode, scene-structured fake) → window-lag euclidean distance per media
    → cut rows.  The detection layer (window + Catalyst kernel) is entirely
    real Spark; the fake decoder plants scene boundaries every 40 frames, so
    cuts land at sampled frames 40 and 80 for each of the 8 videos."""
    from hnsw_spark.operators.multimodal import frame_features, scene_cuts

    media = synthetic_media(spark, count=8, kind="video")
    feats = frame_features(media, every_n=10)
    return scene_cuts(feats, threshold=0.05)
