"""Regenerate the committed multimodal oracle tables.

The multimodal stub decoders are seeded-deterministic pure functions of the
synthetic media table (n=48), independent of scale factor — so their full
value-hash oracle is a committed expected table. This script recomputes it
with plain numpy/pandas (no Spark, no imports from the engine package) so
the oracle is an independent reimplementation, mirroring:

- searchengine_spark/functions/multimodal.py synthetic_media_df (payload =
  RandomState(media_id).bytes(...)), _decode_image_stub (pixels seeded from
  sha256(payload)[:4]), image_features (mean RGB + luma histogram-8),
  _decode_audio_stub (PCM seeded from sha256(payload)[4:8]) and
  audio_features at window_ms=500 — the exact parameters
  __spark_entry__._q_multimodal_features/_q_multimodal_audio use.

Run from the repo root:  python tests/data/make_expected_multimodal.py
"""
import hashlib
import os

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))


def main(n: int = 48) -> None:
    rows_f, rows_a = [], []
    for i in range(n):
        rng = np.random.RandomState(i)
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(256 + i % 512)
        width = 64 + i % 128 if kind != "audio" else None
        height = 48 + i % 96 if kind != "audio" else None
        duration_ms = 1000 + i * 7 if kind != "image" else None
        if kind == "image":
            seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
            img = np.random.RandomState(seed).randint(
                0, 256, size=(height or 8, width or 8, 3), dtype=np.uint8
            ).astype(np.float64)
            mean = img.mean(axis=(0, 1))
            luma = img @ np.array([0.299, 0.587, 0.114])
            hist, _ = np.histogram(luma, bins=8, range=(0, 256))
            hist = (hist / hist.sum()).round(6)
            rows_f.append((i, *mean.round(6).tolist(), *hist.tolist()))
        elif kind == "audio":
            rate, window_ms = 8000, 500
            seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "big")
            n_samp = max(1, int((duration_ms or 1000) * rate / 1000))
            pcm = np.random.RandomState(seed).uniform(-1, 1, size=n_samp).astype(np.float32)
            win = max(1, int(window_ms * rate / 1000))
            n_w = len(pcm) // win
            if n_w:
                w = pcm[: n_w * win].reshape(n_w, win)
                rms = np.sqrt((w ** 2).mean(axis=1))
                zcr = (np.diff(np.signbit(w), axis=1) != 0).mean(axis=1)
                for j in range(n_w):
                    rows_a.append((i, j * window_ms,
                                   round(float(rms[j]), 6), round(float(zcr[j]), 6)))

    feats = pd.DataFrame(rows_f, columns=["media_id", "mean_r", "mean_g", "mean_b",
                                          *[f"luma_h{k}" for k in range(8)]])
    audio = pd.DataFrame(rows_a, columns=["media_id", "window_start_ms", "rms", "zcr"])
    feats["media_id"] = feats["media_id"].astype("int64")
    audio["media_id"] = audio["media_id"].astype("int64")
    audio["window_start_ms"] = audio["window_start_ms"].astype("int32")
    feats.to_parquet(os.path.join(HERE, "expected_multimodal_features.parquet"), index=False)
    audio.to_parquet(os.path.join(HERE, "expected_multimodal_audio.parquet"), index=False)
    print(f"features: {feats.shape}  audio: {audio.shape}")


def main_real(n: int = 32) -> None:
    """Expected features over the REALLY-ENCODED media table
    (synthetic_real_media_df): recomputed here straight from the
    closed-form SOURCE arrays — never through the engine's PNG/WAV
    codecs — so a bug in either encode or decode breaks the value hash
    (a round-trip golden gate, mirroring multimodal.py
    _real_image_array/_real_audio_pcm16 and the feature math of
    image_features/audio_features at window_ms=500)."""
    rows_f, rows_a = [], []
    for i in range(n):
        if i % 2 == 0:  # image rows
            h, w = 16 + (i % 5) * 4, 20 + (i % 7) * 4
            y, x, c = np.ogrid[:h, :w, :3]
            img = ((x * 3 + y * 5 + c * 7 + i * 11) % 256).astype(
                np.uint8).astype(np.float64)
            mean = img.mean(axis=(0, 1))
            luma = img @ np.array([0.299, 0.587, 0.114])
            hist, _ = np.histogram(luma, bins=8, range=(0, 256))
            hist = (hist / hist.sum()).round(6)
            rows_f.append((i, *mean.round(6).tolist(), *hist.tolist()))
        else:  # audio rows
            rate, window_ms = 8000, 500
            n_samp = 4000 + (i % 5) * 2000
            t = np.arange(n_samp)
            f = 110 + i * 13
            sine = np.round(12000 * np.sin(2 * np.pi * f * t / rate))
            saw = ((t * (i + 1)) % 7 - 3) * 100
            pcm = ((sine + saw).astype(np.int16)
                   .astype(np.float32) / 32768.0)
            win = max(1, int(window_ms * rate / 1000))
            n_w = len(pcm) // win
            w_ = pcm[: n_w * win].reshape(n_w, win)
            rms = np.sqrt((w_ ** 2).mean(axis=1))
            zcr = (np.diff(np.signbit(w_), axis=1) != 0).mean(axis=1)
            for j in range(n_w):
                rows_a.append((i, j * window_ms,
                               round(float(rms[j]), 6),
                               round(float(zcr[j]), 6)))
    feats = pd.DataFrame(rows_f, columns=["media_id", "mean_r", "mean_g",
                                          "mean_b",
                                          *[f"luma_h{k}" for k in range(8)]])
    audio = pd.DataFrame(rows_a, columns=["media_id", "window_start_ms",
                                          "rms", "zcr"])
    feats["media_id"] = feats["media_id"].astype("int64")
    audio["media_id"] = audio["media_id"].astype("int64")
    audio["window_start_ms"] = audio["window_start_ms"].astype("int32")
    feats.to_parquet(os.path.join(HERE, "expected_multimodal_png.parquet"),
                     index=False)
    audio.to_parquet(os.path.join(HERE, "expected_multimodal_wav.parquet"),
                     index=False)
    print(f"png: {feats.shape}  wav: {audio.shape}")


if __name__ == "__main__":
    main()
    main_real()
