"""Multimodal plumbing: schemas, batch shapes, and fan-out are real; the
media decode is a deterministic stub (no codec libs in this container)."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.functions.multimodal import (
    audio_features, image_features, resize_images, sample_video_frames,
    synthetic_media_df)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_df(spark, n=30).persist()


def test_image_features_schema_and_determinism(media):
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    again = {r["media_id"]: r for r in image_features(media).collect()}
    assert set(rows) == {i for i in range(30) if i % 3 == 0}  # kind == image
    for mid, r in rows.items():
        assert 0 <= r["mean_r"] <= 255 and len(r["luma_hist"]) == 8
        assert abs(sum(r["luma_hist"]) - 1.0) < 1e-5  # 6dp-rounded bins
        assert again[mid]["mean_r"] == r["mean_r"]  # stub is deterministic


def test_resize_images_payload_shape(media):
    rows = resize_images(media, out_w=16, out_h=12).collect()
    assert rows
    for r in rows:
        assert r["width"] == 16 and r["height"] == 12
        assert len(bytes(r["payload"])) == 16 * 12 * 3  # raw RGB


def test_sample_video_frames_fanout(media):
    vids = {r["media_id"]: r["duration_ms"]
            for r in media.filter("kind = 'video'").collect()}
    got: dict[int, list[int]] = {}
    for r in sample_video_frames(media, every_ms=500).collect():
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert set(got) == set(vids)
    for mid, frames in got.items():
        assert frames == list(range(0, vids[mid], 500))


def test_audio_features_windows(media):
    auds = {r["media_id"]: r["duration_ms"]
            for r in media.filter("kind = 'audio'").collect()}
    got: dict[int, list] = {}
    for r in audio_features(media, window_ms=250).collect():
        got.setdefault(r["media_id"], []).append(r)
    assert set(got) == set(auds)
    for mid, rows in got.items():
        assert len(rows) == auds[mid] // 250  # full windows only
        for r in rows:
            assert 0.0 <= r["rms"] <= 1.0 and 0.0 <= r["zcr"] <= 1.0


# ---------- real PNG / WAV codecs (round 4) ----------

def test_png_roundtrip_all_filters():
    """png_encode → png_decode is identity for every scanline filter
    type (0-4) across varied shapes."""
    import numpy as np
    from searchengine_spark.functions.multimodal import png_decode, png_encode
    for i in range(6):
        h, w = 5 + i, 7 + (i * 3) % 5
        img = ((np.arange(h * w * 3).reshape(h, w, 3) * 31 + i * 17)
               % 256).astype(np.uint8)
        for ft in range(5):
            assert np.array_equal(png_decode(png_encode(img, ft)), img), ft


def test_png_decode_gray_and_rgba():
    """Color type 0 expands to RGB; color type 6 drops alpha. Payloads
    hand-built against the spec (IHDR/IDAT framing, filter 0)."""
    import struct
    import zlib
    import numpy as np
    from searchengine_spark.functions.multimodal import (_PNG_MAGIC,
                                                         png_decode)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    # 2x3 grayscale ramp
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    png = (_PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = png_decode(png)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)  # gray replicated
    # 1x2 RGBA — alpha dropped
    px = bytes([10, 20, 30, 255, 40, 50, 60, 0])
    png = (_PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00" + px))
           + chunk(b"IEND", b""))
    out = png_decode(png)
    assert out.tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_png_decode_rejects_unsupported():
    import struct
    import zlib
    import pytest
    from searchengine_spark.functions.multimodal import (_PNG_MAGIC,
                                                         png_decode)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JFIF not a png")
    interlaced = (_PNG_MAGIC
                  + chunk(b"IHDR",
                          struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)))
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_decode(interlaced)


def test_wav_roundtrip_and_variants():
    """16-bit mono round-trips exactly; stereo mono-izes by channel
    mean; 8-bit PCM recenters; non-PCM formats raise."""
    import struct
    import numpy as np
    import pytest
    from searchengine_spark.functions.multimodal import wav_decode, wav_encode
    pcm = (np.round(8000 * np.sin(np.arange(500) / 7.0))).astype(np.int16)
    out, rate = wav_decode(wav_encode(pcm, rate=16000))
    assert rate == 16000
    assert np.allclose(out, pcm.astype(np.float32) / 32768.0)
    # stereo: interleave L=pcm, R=-pcm → mono mean ≈ 0
    inter = np.empty(1000, dtype=np.int16)
    inter[0::2], inter[1::2] = pcm, -pcm
    body = inter.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(body)) + body)
    out, rate = wav_decode(wav)
    assert len(out) == 500 and np.allclose(out, 0.0)
    # 8-bit: 128 is zero
    body8 = bytes([128, 255, 0, 128])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 36 + len(body8)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt8
            + b"data" + struct.pack("<I", len(body8)) + body8)
    out, _ = wav_decode(wav8)
    assert out[0] == 0.0 and out[1] > 0.99 and out[2] == -1.0
    # IEEE-float format tag rejected
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wavf = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmtf)
    with pytest.raises(ValueError, match="unsupported WAV format"):
        wav_decode(wavf)


def test_real_media_features_through_spark(spark):
    """synthetic_real_media_df → image_features/audio_features runs the
    REAL codecs inside mapInPandas; features match a driver-side
    recomputation from the closed-form source arrays."""
    import numpy as np
    from searchengine_spark.functions.multimodal import (
        _real_audio_pcm16, _real_image_array, audio_features,
        image_features, synthetic_real_media_df)
    media = synthetic_real_media_df(spark, n=10)
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert set(feats) == {0, 2, 4, 6, 8}
    for i in feats:
        img = _real_image_array(i).astype(np.float64)
        assert feats[i]["mean_r"] == round(float(img[:, :, 0].mean()), 6)
    auds = {}
    for r in audio_features(media, window_ms=500).collect():
        auds.setdefault(r["media_id"], []).append(r)
    assert set(auds) == {1, 3, 5, 7, 9}
    for i, rows in auds.items():
        pcm = _real_audio_pcm16(i).astype(np.float32) / 32768.0
        assert len(rows) == len(pcm) // 4000  # 500 ms @ 8 kHz
        w0 = pcm[:4000]
        exp_rms = round(float(np.sqrt((w0 ** 2).mean())), 6)
        assert min(rows, key=lambda r: r["window_start_ms"])["rms"] == exp_rms
