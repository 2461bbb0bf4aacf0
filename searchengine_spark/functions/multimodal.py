"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-friendly
layout, Arrow-batched UDF signatures, deterministic fake feature extractors —
while the actual media decoding is STUBBED (the image/audio codec libraries
are not in this container). Swap ``_decode_image_stub`` for a real decoder
(PIL/libvips/ffmpeg) without touching any Spark code: the mapInPandas batch
shapes and output schemas stay identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def synthetic_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.RandomState(int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.bytes(256 + int(i) % 512)
                rows.append((int(i), kind, payload, f"x-fake/{kind}",
                             64 + int(i) % 128 if kind != "audio" else None,
                             48 + int(i) % 96 if kind != "audio" else None,
                             1000 + int(i) * 7 if kind != "image" else None))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic pixels from payload hash.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))``. Raises for
    clearly-invalid input exactly like a real decoder would.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for null/streamed payloads")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).randint(0, 256, size=(height or 8, width or 8, 3), dtype=np.uint8)


def image_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode → extract per-image features (mean RGB, luma histogram-8).

    mapInPandas keeps batches of binary payloads off the JVM heap and lets
    the decode run vectorized per batch. Output schema is fixed/typed so the
    result is a normal columnar table downstream.
    """
    out_schema = ("media_id long, mean_r double, mean_g double, mean_b double, "
                  "luma_hist array<double>")

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image_stub(r.payload, r.width, r.height).astype(np.float64)
                mean = img.mean(axis=(0, 1))
                luma = img @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                rows.append((r.media_id, *mean.round(6).tolist(),
                             (hist / hist.sum()).round(6).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "mean_r", "mean_g", "mean_b", "luma_hist"])

    return df.filter(F.col("kind") == "image").mapInPandas(gen, schema=out_schema)


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit binary (raw RGB). Stubbed
    decode, real resize math + schema."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image_stub(r.payload, r.width, r.height)
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[ys][:, xs]
                rows.append((r.media_id, out_w, out_h, small.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    return df.filter(F.col("kind") == "image").mapInPandas(
        gen, schema="media_id long, width int, height int, payload binary")


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms) rows
    via built-in sequence/explode — the decode of each frame is the stubbed
    part; the fan-out plumbing (one row per sampled frame) is real."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (df.filter(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ts_ms")))


def _decode_audio_stub(payload: bytes, duration_ms: int, rate: int = 8000) -> np.ndarray:
    """STUB PCM decoder: deterministic float32 samples from payload hash.
    Real implementation: ffmpeg/soundfile → mono float PCM."""
    if payload is None:
        raise NotImplementedError("real decoder required for null/streamed payloads")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "big")
    n = max(1, int((duration_ms or 1000) * rate / 1000))
    return np.random.RandomState(seed).uniform(-1, 1, size=n).astype(np.float32)


def audio_features(df: DataFrame, window_ms: int = 250, rate: int = 8000) -> DataFrame:
    """Decode → windowed RMS energy + zero-crossing rate per audio row.

    One output row per (media_id, window). The window fan-out and the
    feature math are real; only the PCM decode is stubbed."""
    win = max(1, int(window_ms * rate / 1000))

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = _decode_audio_stub(r.payload, r.duration_ms, rate)
                n_w = len(pcm) // win
                if n_w == 0:
                    continue
                w = pcm[: n_w * win].reshape(n_w, win)
                rms = np.sqrt((w ** 2).mean(axis=1))
                zcr = (np.diff(np.signbit(w), axis=1) != 0).mean(axis=1)
                for j in range(n_w):
                    rows.append((r.media_id, j * window_ms,
                                 round(float(rms[j]), 6), round(float(zcr[j]), 6)))
            yield pd.DataFrame(rows, columns=["media_id", "window_start_ms", "rms", "zcr"])

    return df.filter(F.col("kind") == "audio").mapInPandas(
        gen, schema="media_id long, window_start_ms int, rms double, zcr double")
