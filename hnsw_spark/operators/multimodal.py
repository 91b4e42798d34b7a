"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media payloads are opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages that emit fixed-schema feature rows.  The Spark-side
plumbing — schemas, batch iteration, partition-parallel decode, feature
vectors feeding the ANN/dedup operators — is real and tested.

The codec layer is STUBBED: this container has no image/audio libraries, so
``decode_image``/``decode_audio`` try Pillow/soundfile and otherwise fall
back to a clearly-marked deterministic fake decoder (md5-seeded pixels) so
every downstream stage exercises realistic shapes.  Swap ``_fake_decode*``
for real codecs in production; signatures stay identical.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 64


def _byte_stream(payload: bytes, n: int) -> np.ndarray:
    """The stub codec's pixel/sample generator: position k yields
    ``(payload[k mod len] + 31·k) mod 256``.  Chosen over an RNG because it
    is (a) deterministic per payload, (b) full-range with no short period,
    and (c) reproducible in ANSI SQL from the payload bytes — which makes
    the decode plumbing ORACLE-CHECKABLE (the DuckDB gate recomputes the
    exact byte sums), not just rows-only."""
    pb = np.frombuffer(payload, dtype=np.uint8)
    return (np.resize(pb, n).astype(np.int64) + 31 * np.arange(n)) % 256


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE (no codec in container): payload-derived uint8
    HxWx3 via the SQL-reproducible byte stream."""
    return (
        _byte_stream(payload, height * width * 3)
        .astype(np.uint8)
        .reshape(height, width, 3)
    )


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary netpbm ``P6`` payloads — the one
    raster container parseable with numpy alone (no codec library):
    ASCII header (magic, width, height, maxval, ``#`` comments allowed)
    followed by height·width·3 raw RGB bytes.  Returns uint8 (H, W, 3).
    Maxval must be ≤ 255 (the single-byte-per-sample variant)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: whitespace-separated fields, '#' to EOL is
    # comment; exactly 4 fields (magic, w, h, maxval), then ONE whitespace
    # byte, then the raster
    fields: list[bytes] = []
    i = 0
    while len(fields) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # the single whitespace separating header from raster
    w, h, maxval = int(fields[1]), int(fields[2]), int(fields[3])
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return raster.reshape(h, w, 3)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    if payload[:2] == b"P6":
        return decode_ppm(payload)  # real container, real decode
    try:  # pragma: no cover - Pillow absent in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        return _fake_decode_image(payload, width, height)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resize (no codec needed — this part is real)."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h - 1, out_h)
    xs = np.linspace(0, w - 1, out_w)
    y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy, wx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    a = img[y0][:, x0].astype(np.float64)
    b = img[y0][:, x1].astype(np.float64)
    c = img[y1][:, x0].astype(np.float64)
    d = img[y1][:, x1].astype(np.float64)
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx)


def _image_feature(img: np.ndarray) -> np.ndarray:
    """Feature extraction over decoded pixels: 4x4 grid of per-channel means
    + global stats, L2-normalized → FEATURE_DIM floats."""
    small = resize_bilinear(img, 8, 8) / 255.0
    grid = small.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3)).ravel()  # 48
    stats = np.array(
        [small.mean(), small.std(), small.min(), small.max()]
    )
    feat = np.concatenate([grid, stats, np.zeros(FEATURE_DIM - 52)])
    n = np.linalg.norm(feat)
    return (feat / n if n > 0 else feat).astype(np.float32)


def image_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, embedding ARRAY<FLOAT>, width, height).

    Arrow-batched partition-parallel decode; output feeds knn_exact /
    build_ivf_index / embedding_neardup unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, sums = [], []
            for row in pdf.itertuples():
                img = decode_image(row.payload, int(row.width), int(row.height))
                feats.append(_image_feature(img))
                # decode checksum: exact pixel sum — pipelines use this to
                # validate decode integrity, and the SQL oracle recomputes
                # it from the payload bytes (see _byte_stream)
                sums.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "embedding": feats,
                    "width": pdf["width"].to_numpy(),
                    "height": pdf["height"].to_numpy(),
                    "byte_sum": sums,
                }
            )

    cols = df.select("media_id", "payload", "width", "height")
    return cols.mapInPandas(
        run,
        schema=(
            "media_id long, embedding array<float>, width int, height int,"
            " byte_sum long"
        ),
    )


def _fake_decode_audio(payload: bytes, sample_rate: int, seconds: float = 1.0) -> np.ndarray:
    """DETERMINISTIC FAKE (no codec in container): payload-derived float32
    mono waveform in [-1, 1] at ``sample_rate``, from the SQL-reproducible
    byte stream (sample = byte/255·2 − 1)."""
    n = max(1, int(sample_rate * seconds))
    return (
        _byte_stream(payload, n).astype(np.float32) / 255.0 * 2.0 - 1.0
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for RIFF/WAVE payloads via the stdlib ``wave``
    module (no external codec needed): parses the container, reads the PCM
    frames, converts to float32 mono in [-1, 1).  Supports the 8/16/32-bit
    integer PCM encodings ``wave`` itself supports; multi-channel input is
    averaged to mono.  Returns (waveform, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 1:  # 8-bit WAV PCM is unsigned
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data.astype(np.float32), sr


def decode_audio(payload: bytes, sample_rate: int) -> np.ndarray:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)[0]  # real container, real decode
    try:  # pragma: no cover - soundfile absent in this container
        import io

        import soundfile as sf

        data, _ = sf.read(io.BytesIO(payload), dtype="float32", always_2d=False)
        return data if data.ndim == 1 else data.mean(axis=1)
    except ImportError:
        return _fake_decode_audio(payload, sample_rate)


def _audio_feature(wave: np.ndarray, sample_rate: int) -> np.ndarray:
    """Feature extraction over a decoded waveform: per-frame RMS energy (32
    frames), zero-crossing rate, and coarse FFT band energies, L2-normalized
    → FEATURE_DIM floats.  Pure numpy — this part is real."""
    n = len(wave)
    frames = np.array_split(wave.astype(np.float64), 32)
    rms = np.array([np.sqrt((f * f).mean()) if len(f) else 0.0 for f in frames])
    zcr = float(np.mean(np.abs(np.diff(np.signbit(wave))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(wave.astype(np.float64)))
    bands = np.array([b.mean() if len(b) else 0.0 for b in np.array_split(spec, 28)])
    bands = bands / max(bands.max(), 1e-30)
    stats = np.array([wave.mean(), wave.std(), zcr, n / max(sample_rate, 1)])
    feat = np.concatenate([rms, bands, stats])[:FEATURE_DIM]
    feat = np.pad(feat, (0, FEATURE_DIM - len(feat)))
    nrm = np.linalg.norm(feat)
    return (feat / nrm if nrm > 0 else feat).astype(np.float32)


def audio_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, embedding ARRAY<FLOAT>, sample_rate) via
    Arrow-batched partition-parallel decode; output feeds the ANN/dedup
    operators unchanged (same contract as image_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, sums = [], []
            for row in pdf.itertuples():
                wave = decode_audio(row.payload, int(row.sample_rate))
                feats.append(_audio_feature(wave, int(row.sample_rate)))
                # decode checksum: the wave re-quantized to its 8-bit PCM
                # levels and summed exactly — SQL-reproducible from the
                # payload bytes (see _byte_stream)
                pcm = np.rint((wave.astype(np.float64) + 1.0) / 2.0 * 255.0)
                sums.append(int(pcm.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "embedding": feats,
                    "sample_rate": pdf["sample_rate"].to_numpy(),
                    "pcm_sum": sums,
                }
            )

    cols = df.select("media_id", "payload", "sample_rate")
    return cols.mapInPandas(
        run,
        schema=(
            "media_id long, embedding array<float>, sample_rate int,"
            " pcm_sum long"
        ),
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one (media_id, frame_idx) row per kept frame.
    Pure relational expansion — the decode of each kept frame is the stubbed
    codec above; the sampling plumbing is exact."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def _fake_decode_frame(
    payload: bytes, width: int, height: int, frame_idx: int, scene_len: int = 40
) -> np.ndarray:
    """DETERMINISTIC FAKE frame decode (no video codec in container): frames
    share a scene base image for ``scene_len`` consecutive frames (small
    per-frame jitter), and the base changes at each scene boundary — so the
    scene-cut DETECTOR downstream has realistic structure to find."""
    scene = int(frame_idx) // scene_len
    seed = int.from_bytes(
        hashlib.md5(payload + scene.to_bytes(4, "little")).digest()[:8], "little"
    )
    base = np.random.default_rng(seed).integers(
        0, 256, size=(height, width, 3), dtype=np.int16
    )
    jitter = np.random.default_rng(seed ^ (int(frame_idx) + 1)).integers(
        -3, 4, size=base.shape, dtype=np.int16
    )
    return np.clip(base + jitter, 0, 255).astype(np.uint8)


def frame_features(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Sampled video frames → per-frame feature vectors:
    (media_id, frame_idx, embedding).  The frame expansion is the exact
    ``frame_sample`` plumbing; decode is the stubbed codec; feature
    extraction reuses the image path so frame embeddings feed the same
    ANN/dedup/scene operators."""
    frames = frame_sample(df, every_n).join(
        df.select("media_id", "payload", "width", "height"), "media_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _image_feature(
                    _fake_decode_frame(
                        row.payload, int(row.width), int(row.height),
                        int(row.frame_idx),
                    )
                )
                for row in pdf.itertuples()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "frame_idx": pdf["frame_idx"].to_numpy(),
                    "embedding": feats,
                }
            )

    return frames.select("media_id", "frame_idx", "payload", "width", "height").mapInPandas(
        run, schema="media_id long, frame_idx int, embedding array<float>"
    )


def scene_cuts(frame_feats: DataFrame, threshold: float = 0.05) -> DataFrame:
    """Scene-change detection over per-frame features: a cut is a sampled
    frame whose feature distance to the PREVIOUS sampled frame exceeds
    ``threshold`` → (media_id, frame_idx, dist).

    This layer is entirely real Spark (no codec): one window per media
    ordered by frame_idx, a lag, and a Catalyst euclidean kernel — the same
    shuffle-once-per-key shape as the sessionization and as-of operators, so
    it scales to any frame count per video."""
    from pyspark.sql import Window

    from hnsw_spark.functions.similarity import euclidean_distance

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    with_prev = frame_feats.withColumn(
        "_prev", F.lag("embedding").over(w)
    ).filter(F.col("_prev").isNotNull())
    scored = with_prev.withColumn(
        "dist", euclidean_distance("embedding", "_prev")
    )
    return scored.filter(F.col("dist") > threshold).select(
        "media_id", "frame_idx", "dist"
    )


def synthetic_media(spark, count: int = 20, kind: str = "image") -> DataFrame:
    """Deterministic fixture media table (payload = md5-derived bytes)."""
    rows = []
    for i in range(count):
        payload = hashlib.md5(f"media{i}".encode()).digest() * 4
        rows.append((i, kind, bytearray(payload), "application/x-fake", 16, 12, 100, 16000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_wav_media(
    spark, count: int = 16, sample_rate: int = 8000, n_samples: int = 8000
) -> DataFrame:
    """Fixture media table whose payloads are REAL RIFF/WAVE files (stdlib
    ``wave`` writer, 16-bit mono PCM) — the real-codec counterpart to the
    stub fixtures above.  Sample k of media i is the SQL-reproducible
    md5 byte stream value scaled to int16 ((v−128)·256, v from
    ``_byte_stream`` over md5('wav{i}')·4), so the decode→checksum path
    stays oracle-checkable even though the payload is a genuine container
    that ``decode_wav`` must parse."""
    import io
    import wave as wavmod

    rows = []
    for i in range(count):
        seed_bytes = hashlib.md5(f"wav{i}".encode()).digest() * 4
        v = _byte_stream(seed_bytes, n_samples)
        pcm = ((v - 128) * 256).astype("<i2")
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        rows.append(
            (
                i,
                "audio",
                bytearray(buf.getvalue()),
                "audio/wav",
                0,
                0,
                0,
                sample_rate,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_ppm_media(
    spark, count: int = 16, width: int = 16, height: int = 12
) -> DataFrame:
    """Fixture media table whose payloads are REAL binary-PPM (P6) files —
    the real-codec image counterpart to ``synthetic_wav_media``.  Pixel
    byte k of media i is the SQL-reproducible md5 byte stream over
    md5('ppm{i}')·4, so the decode→checksum path stays oracle-checkable
    even though the payload is a genuine container ``decode_ppm`` must
    parse (header tokenizing included: a ``#`` comment line is planted in
    every header)."""
    rows = []
    for i in range(count):
        seed_bytes = hashlib.md5(f"ppm{i}".encode()).digest() * 4
        px = _byte_stream(seed_bytes, height * width * 3).astype(np.uint8)
        header = f"P6\n# synthetic fixture {i}\n{width} {height}\n255\n"
        payload = header.encode("ascii") + px.tobytes()
        rows.append(
            (i, "image", bytearray(payload), "image/x-portable-pixmap",
             width, height, 0, 0)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def ppm_image_features(df: DataFrame) -> DataFrame:
    """media table with P6 payloads → (media_id, embedding ARRAY<FLOAT>,
    width, height, pixel_sum) via Arrow-batched partition-parallel REAL
    decode (``decode_ppm``): the container header is tokenized (width and
    height come from the HEADER, not the metadata columns, so a misparse
    surfaces), the raster is read at the computed offset, features come
    from the same ``_image_feature`` kernel as the stub tier, and
    ``pixel_sum`` is the exact sum of the raw RGB bytes — the decode-
    integrity checksum an oracle can recompute."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, ws, hs, sums = [], [], [], []
            for row in pdf.itertuples():
                img = decode_ppm(row.payload)
                feats.append(_image_feature(img))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "embedding": feats,
                    "width": ws,
                    "height": hs,
                    "pixel_sum": sums,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, embedding array<float>, width int, height int,"
            " pixel_sum long"
        ),
    )


def wav_audio_features(df: DataFrame) -> DataFrame:
    """media table with RIFF/WAVE payloads → (media_id, embedding
    ARRAY<FLOAT>, sample_rate, n_samples, pcm16_sum) via Arrow-batched
    partition-parallel REAL decode (``decode_wav``): the container header
    is parsed, PCM frames are read and converted to float32 mono, features
    come from the same ``_audio_feature`` kernel as the stub tier, and
    ``pcm16_sum`` is the exact sum of the raw int16 samples — the decode-
    integrity checksum an oracle can recompute."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, srs, counts, sums = [], [], [], []
            for row in pdf.itertuples():
                wave, sr = decode_wav(row.payload)
                feats.append(_audio_feature(wave, sr))
                srs.append(sr)
                counts.append(len(wave))
                pcm = np.rint(wave.astype(np.float64) * 32768.0)
                sums.append(int(pcm.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "embedding": feats,
                    "sample_rate": srs,
                    "n_samples": counts,
                    "pcm16_sum": sums,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, embedding array<float>, sample_rate int,"
            " n_samples int, pcm16_sum long"
        ),
    )
