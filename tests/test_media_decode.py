"""REAL media decode tests: BMP/PPM/WAV payloads are constructed bit-exactly
in the test (struct/wave — no imaging libs involved), decoded distributed via
decode_media_features (mapInPandas), and every decoded number is asserted
against its closed-form value. Compressed formats must come back
'unsupported', never fake-decoded."""

import io
import math
import struct
import wave

import numpy as np
import pytest

import polars_net_spark as pl
from polars_net_spark.llm import media_codecs as mc
from polars_net_spark.llm.multimodal import decode_media_features


def make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bpp bottom-up BMP from an (H, W, 3) RGB array."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        img += line
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return bytes(header + info + img)


def make_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def make_wav(freq: float = 440.0, rate: int = 8000, n: int = 4000) -> bytes:
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def px():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact(px):
    assert np.array_equal(mc.decode_bmp(make_bmp(px)), px)


def test_ppm_roundtrip_exact(px):
    assert np.array_equal(mc.decode_ppm(make_ppm(px)), px)


def test_wav_decode_exact():
    rate, nch, samples = mc.decode_wav(make_wav())
    assert (rate, nch) == (8000, 1)
    assert len(samples) == 4000
    # full periods of a sine: RMS -> 1/sqrt(2)
    rms = float((samples**2).mean() ** 0.5)
    assert rms == pytest.approx(1 / math.sqrt(2), rel=1e-3)


def test_ahash_is_stable_and_discriminative(px):
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h1 = mc.ahash64(px)
    assert h1 == mc.ahash64(px.copy())
    # brightness shift preserves the aHash (threshold is the mean)
    brighter = np.clip(px.astype(int) + 40, 0, 255).astype(np.uint8)
    assert hamming(h1, mc.ahash64(brighter)) <= 8
    # inversion flips cells-vs-mean, so nearly every bit flips
    inverted = (255 - px).astype(np.uint8)
    assert hamming(h1, mc.ahash64(inverted)) >= 40


def test_decode_media_features_distributed(spark, px):
    rows = [
        (1, make_bmp(px)),
        (2, make_ppm(px)),
        (3, make_wav()),
        (4, b"\xff\xd8\xffJPEGJPEG"),  # jpeg magic -> must be unsupported
        (5, b"garbage-bytes"),
        (6, b"BM" + b"\x00" * 10),  # malformed BMP -> error status, not a crash
    ]
    sdf = pl.get_spark().createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r.asDict() for r in decode_media_features(sdf).spark.collect()}

    bmp = out[1]
    assert bmp["status"] == "decoded" and (bmp["width"], bmp["height"]) == (12, 16)
    exp_mean = px.reshape(-1, 3).mean(axis=0)
    assert bmp["mean_rgb"] == pytest.approx(list(exp_mean))
    assert bmp["ahash"] == mc.ahash64(px)
    # PPM of the same pixels decodes to the identical fingerprint
    assert out[2]["ahash"] == bmp["ahash"] and out[2]["status"] == "decoded"

    wavr = out[3]
    assert wavr["status"] == "decoded"
    assert wavr["sample_rate"] == 8000 and wavr["duration_ms"] == 500
    assert wavr["rms"] == pytest.approx(1 / math.sqrt(2), rel=1e-3)

    assert out[4]["status"] == "unsupported:image/jpeg" and out[4]["ahash"] is None
    assert out[5]["status"].startswith("unsupported:application/octet-stream")
    assert out[6]["status"].startswith("error:")


def test_image_near_dup_pairs(spark, px):
    from polars_net_spark.llm.multimodal import image_near_dup_pairs

    rng = np.random.default_rng(7)
    noisy = np.clip(px.astype(int) + rng.integers(-6, 7, size=px.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    rows = [(1, make_bmp(px)), (2, make_bmp(noisy)), (3, make_bmp(other)),
            (4, b"\xff\xd8\xffJPEG")]  # undecodable: excluded, not crashing
    sdf = pl.get_spark().createDataFrame(rows, "media_id long, payload binary")
    pairs = image_near_dup_pairs(sdf, max_hamming=8).spark.collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 8
    # identical images: distance 0
    sdf2 = pl.get_spark().createDataFrame(
        [(1, make_bmp(px)), (2, make_bmp(px.copy()))], "media_id long, payload binary")
    p2 = image_near_dup_pairs(sdf2).spark.collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in p2] == [(1, 2, 0)]


def test_audio_fingerprint_amplitude_invariant():
    _, _, s1 = mc.decode_wav(make_wav(freq=5.0, rate=8000, n=8000))
    f1 = mc.audio_fingerprint64(s1)
    # half the amplitude: envelope shape identical -> same fingerprint
    quiet = (s1 * 0.5)
    assert mc.audio_fingerprint64(quiet) == f1
    # different envelope (different low freq) -> different fingerprint
    _, _, s2 = mc.decode_wav(make_wav(freq=3.0, rate=8000, n=8000))
    d = (f1 ^ mc.audio_fingerprint64(s2)) & ((1 << 64) - 1)
    assert bin(d).count("1") >= 8


def test_audio_near_dup_pairs(spark):
    from polars_net_spark.llm.multimodal import audio_near_dup_pairs

    base = make_wav(freq=5.0, rate=8000, n=8000)
    # near-dup: same tone, slightly different amplitude via 8-bit re-encode
    _, _, s = mc.decode_wav(base)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(8000)
        f.writeframes((s[:, 0] * 0.7 * 32767).astype("<i2").tobytes())
    near = buf.getvalue()
    other = make_wav(freq=3.0, rate=8000, n=8000)
    sdf = pl.get_spark().createDataFrame(
        [(1, base), (2, near), (3, other)], "media_id long, payload binary")
    pairs = audio_near_dup_pairs(sdf, max_hamming=6).spark.collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
