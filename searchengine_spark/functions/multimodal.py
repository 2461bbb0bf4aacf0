"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partition-friendly layout, Arrow-batched
UDF signatures — is real and tested, and so is the decode for the two
public container formats implemented here from their specs with stdlib
zlib + numpy only:

- PNG (RFC 2083): chunk parse, zlib inflate, per-scanline unfilter
  (None/Sub/Up/Average/Paeth), color types 0/2/6 at bit depth 8 →
  ``png_decode``/``png_encode``;
- WAV (RIFF/WAVE): fmt/data chunk parse, PCM 8/16-bit, any channel count
  mono-ized → ``wav_decode``/``wav_encode``.

Payloads are dispatched on magic bytes: real PNG/WAV bytes decode for
real; anything else falls back to the seeded-deterministic fake decoder
(the fixture path — exotic codecs like JPEG/MP4 would need external
libraries and keep the swap-in contract: replace ``_decode_image_fake``
without touching any Spark code, the mapInPandas batch shapes and output
schemas stay identical).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal RGB8 PNG writer (one IDAT, non-interlaced). ``filter_type``
    selects the per-scanline filter (0-4) so the decoder's unfilter paths
    are testable; 0 (None) is the default fast path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w, _ = img.shape
    bpp = 3
    raw = img.astype(np.int32)
    lines = []
    prev = np.zeros((w, bpp), dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        if filter_type == 0:
            flt = cur
        elif filter_type == 1:   # Sub
            left = np.vstack([np.zeros((1, bpp), np.int32), cur[:-1]])
            flt = (cur - left) % 256
        elif filter_type == 2:   # Up
            flt = (cur - prev) % 256
        elif filter_type == 3:   # Average
            left = np.vstack([np.zeros((1, bpp), np.int32), cur[:-1]])
            flt = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:   # Paeth
            left = np.vstack([np.zeros((1, bpp), np.int32), cur[:-1]])
            ul = np.vstack([np.zeros((1, bpp), np.int32), prev[:-1]])
            flt = (cur - _paeth(left, prev, ul)) % 256
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + flt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8, no interlace
    idat = zlib.compress(b"".join(lines), 6)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over a scanline."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(data: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8. Pure stdlib-zlib + numpy implementation of
    the spec's critical path: bit depth 8, color types 0 (gray → RGB),
    2 (RGB), 6 (RGBA → alpha dropped), non-interlaced, all five scanline
    filters. Raises ValueError on anything else (a real pipeline routes
    those rows to a quarantine sink, it doesn't crash the job)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_MAGIC), None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2, 6) or ilace != 0 \
                    or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={ilace})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, w, ch), dtype=np.int32)
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        rf = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32).reshape(w, ch)
        if rf == 0:
            cur = line
        elif rf == 2:  # Up — vectorized
            cur = (line + prev) % 256
        elif rf in (1, 3, 4):  # left-dependent: scan across the line
            cur = np.zeros_like(line)
            for x in range(w):
                left = cur[x - 1] if x else np.zeros(ch, np.int32)
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(ch, np.int32)
                if rf == 1:
                    pred = left
                elif rf == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter byte {rf}")
        out[y] = cur
        prev = cur
    out = out.astype(np.uint8)
    if ch == 1:
        return np.repeat(out, 3, axis=2)
    return out[:, :, :3]


def wav_encode(pcm16: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE writer."""
    body = np.ascontiguousarray(pcm16, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(data: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE → (mono float32 in [-1, 1), sample_rate). PCM 8/16-bit,
    any channel count (channels average to mono). ValueError otherwise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, n_ch, body = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            afmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH",
                                                         chunk[:16])
            if afmt != 1:
                raise ValueError(f"unsupported WAV format {afmt} (PCM only)")
        elif tag == b"data":
            body = chunk
    if rate is None or body is None:
        raise ValueError("truncated WAV (no fmt/data)")
    if bits == 16:
        pcm = np.frombuffer(body, "<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        pcm = (np.frombuffer(body, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_ch > 1:
        pcm = pcm[: len(pcm) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return pcm.astype(np.float32), int(rate)

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


def _decode_image_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake pixels from the payload hash — the fixture path
    for payloads in codecs this container can't decode (JPEG etc.)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).randint(
        0, 256, size=(height or 8, width or 8, 3), dtype=np.uint8)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Magic-byte dispatch: PNG decodes for real (``png_decode``);
    unrecognized payloads take the deterministic fake path."""
    if payload is None:
        raise ValueError("null image payload — nothing to decode")
    if bytes(payload).startswith(_PNG_MAGIC):
        return png_decode(bytes(payload))
    return _decode_image_fake(payload, width, height)


_decode_image_stub = _decode_image  # back-compat alias (pre-r4 name)


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
                img = _decode_image(r.payload, r.width, r.height).astype(np.float64)
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
                img = _decode_image(r.payload, r.width, r.height)
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


def _decode_audio_fake(payload: bytes, duration_ms: int,
                       rate: int = 8000) -> np.ndarray:
    """Deterministic fake float32 PCM from the payload hash — the fixture
    path for codecs this container can't decode (MP3/OGG etc.)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "big")
    n = max(1, int((duration_ms or 1000) * rate / 1000))
    return np.random.RandomState(seed).uniform(-1, 1, size=n).astype(np.float32)


def _decode_audio(payload: bytes, duration_ms: int,
                  rate: int = 8000) -> "tuple[np.ndarray, int]":
    """Magic-byte dispatch: RIFF/WAVE decodes for real (``wav_decode``,
    returning the FILE's sample rate); unrecognized payloads take the
    deterministic fake path at the assumed ``rate``."""
    if payload is None:
        raise ValueError("null audio payload — nothing to decode")
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return wav_decode(b)
    return _decode_audio_fake(payload, duration_ms, rate), rate


_decode_audio_stub = _decode_audio_fake  # back-compat alias (pre-r4 name)


def audio_features(df: DataFrame, window_ms: int = 250, rate: int = 8000) -> DataFrame:
    """Decode → windowed RMS energy + zero-crossing rate per audio row.

    One output row per (media_id, window). Real WAV payloads decode at
    the FILE's sample rate; fake-codec payloads use the assumed ``rate``.
    """
    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm, r_rate = _decode_audio(r.payload, r.duration_ms, rate)
                win = max(1, int(window_ms * r_rate / 1000))
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


def _real_image_array(i: int) -> np.ndarray:
    """Closed-form deterministic RGB image for media_id ``i`` (no RNG —
    the committed oracle recomputes these pixels independently)."""
    h, w = 16 + (i % 5) * 4, 20 + (i % 7) * 4
    y, x, c = np.ogrid[:h, :w, :3]
    return ((x * 3 + y * 5 + c * 7 + i * 11) % 256).astype(np.uint8)


def _real_audio_pcm16(i: int, rate: int = 8000) -> np.ndarray:
    """Closed-form deterministic 16-bit PCM for media_id ``i``."""
    n = 4000 + (i % 5) * 2000
    t = np.arange(n)
    f = 110 + i * 13
    sine = np.round(12000 * np.sin(2 * np.pi * f * t / rate))
    saw = ((t * (i + 1)) % 7 - 3) * 100
    return (sine + saw).astype(np.int16)


def synthetic_real_media_df(spark, n: int = 32,
                            partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REALLY-ENCODED PNG / WAV bytes
    (alternating by media_id; the PNG rows cycle all five scanline
    filters), generated distributed via mapInPandas — the golden-path
    input for the real decoders."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i % 2 == 0:
                    img = _real_image_array(i)
                    payload = png_encode(img, filter_type=(i // 2) % 5)
                    rows.append((i, "image", payload, "image/png",
                                 img.shape[1], img.shape[0], None))
                else:
                    rate = 8000
                    pcm = _real_audio_pcm16(i, rate)
                    payload = wav_encode(pcm, rate)
                    rows.append((i, "audio", payload, "audio/wav",
                                 None, None, len(pcm) * 1000 // rate))
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n, 1, partitions).mapInPandas(gen,
                                                        schema=MEDIA_SCHEMA)
