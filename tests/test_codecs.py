"""Pure-stdlib media codecs + real-decode multimodal tiers.

The container has no PIL/av, so these tests prove the decode path is
REAL anyway: PNG bytes produced by the in-repo encoder round-trip
bit-exactly through every PNG filter type, WAV round-trips PCM
samples, and the Spark mapInPandas stages tag rows with the real
decoder tier (not 'stub') and recover ground-truth pixel/signal stats.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_anomaly_detection_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from financial_anomaly_detection_spark.sources.readers import load_table


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(channels, filter_type):
    rng = np.random.default_rng(42 + channels)
    shape = (11, 7) if channels == 1 else (11, 7, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, filter_type=filter_type))
    assert back.shape == img.shape
    assert (back == img).all()


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all, definitely text")


def test_wav_roundtrip_mono_and_stereo():
    t = np.arange(4000)
    mono = (np.sin(t * 0.05) * 20000).astype(np.int16)
    rate, back = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and (back[:, 0] == mono).all()
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, back = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and (back == stereo).all()


def test_image_decode_is_real_not_stub(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_png_payload,
        decode_image_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = attach_png_payload(docs)
    feats = decode_image_features(media).collect()
    assert len(feats) == 40
    assert all(r["decoder"] == "png-purepy" for r in feats)
    # ground truth: regenerate one image locally and compare exactly
    r = next(x for x in feats)
    i = r["doc_id"]
    h, w = 16 + i % 9, 16 + (i // 9) % 9
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 3 + yy * 5 + i * 7 + c * 11) % 256 for c in range(3)], axis=2
    ).astype(float)
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["mean_intensity"] == pytest.approx(img.mean(), abs=1e-9)


def test_audio_decode_recovers_signal(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_wav_payload,
        decode_audio_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = attach_wav_payload(docs)
    feats = decode_audio_features(media).collect()
    assert len(feats) == 40
    assert all(r["decoder"] == "wav-stdlib" for r in feats)
    for r in feats[:5]:
        expect_freq = 220.0 + (r["doc_id"] % 220)
        # rFFT bin width at 2000 samples / 16 kHz is 8 Hz
        assert abs(r["dominant_freq_hz"] - expect_freq) <= 8.0
        assert r["duration_sec"] == pytest.approx(0.125)
        # sine RMS = amplitude / sqrt(2)
        assert r["rms"] == pytest.approx(12000 / np.sqrt(2), rel=0.02)


def test_undecodable_payload_falls_to_tagged_stub(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_fake_payload,
        decode_image_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_fake_payload(docs)  # text bytes: no decoder understands
    feats = decode_image_features(media).collect()
    assert all(r["decoder"] == "stub" for r in feats)


def test_corrupt_png_payload_falls_to_stub_not_task_death(spark, sf_dir):
    """A payload with a valid PNG signature but corrupt body must fall
    to the tagged stub per record — never kill the Spark task (W7
    per-record error isolation applied to media decode)."""
    from financial_anomaly_detection_spark.operators.codecs import PNG_SIGNATURE
    from financial_anomaly_detection_spark.operators.multimodal import (
        decode_image_features,
    )

    rows = [
        (1, PNG_SIGNATURE + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 17),  # truncated
        (2, PNG_SIGNATURE + b"garbage-after-signature"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = decode_image_features(df).collect()
    assert len(feats) == 2
    assert all(r["decoder"] == "stub" for r in feats)


# --- AVI video tier (round 4) ---------------------------------------------


@pytest.mark.parametrize("width", [16, 17])  # even + padded-stride widths
def test_avi_roundtrip(width):
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(7 + width)
    frames = rng.integers(0, 256, size=(5, 9, width, 3), dtype=np.uint8)
    raw = encode_avi(frames, fps=8.0)
    fps, got = decode_avi(raw)
    assert fps == 8.0
    assert got.shape == frames.shape
    assert (got == frames).all()


def test_avi_rejects_non_avi_and_truncated():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_avi,
        encode_avi,
    )

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    raw = encode_avi(frames)
    for bad in [b"not an avi", raw[: len(raw) // 2], raw[:11]]:
        with pytest.raises(ValueError):
            decode_avi(bad)


def test_video_decode_is_real_not_stub(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_avi_payload,
        decode_video_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(24)
    media = attach_avi_payload(docs, "doc_id")
    feats = decode_video_features(media, "doc_id", "payload").collect()
    assert len(feats) == 24
    assert all(r["decoder"] == "avi-purepy" for r in feats)
    assert all(r["n_frames"] == 6 and r["fps"] == 8.0 for r in feats)
    assert all(r["width"] == 16 and r["height"] == 12 for r in feats)
    # the generated gradient translates per frame -> real motion signal
    assert all(r["motion_score"] > 0.0 for r in feats)
    assert all(len(r["sampled_means"]) == 4 for r in feats)
    # ground truth: frame means of the known generator for one id
    r0 = next(r for r in feats if r["doc_id"] == feats[0]["doc_id"])
    i = int(r0["doc_id"])
    yy, xx = np.mgrid[0:12, 0:16]
    frames = np.stack(
        [
            np.stack(
                [(xx * 5 + yy * 3 + i * 7 + f * 9 + c * 11) % 256 for c in range(3)],
                axis=2,
            )
            for f in range(6)
        ]
    ).astype(np.uint8)
    assert abs(r0["mean_intensity"] - frames.astype(float).mean()) < 1e-9


def test_corrupt_avi_payload_falls_to_stub_not_task_death(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_avi_payload,
        decode_video_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(8)
    media = attach_avi_payload(docs, "doc_id")
    # truncate half the payloads mid-container
    broken = media.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.expr("substring(payload, 1, 64)").cast("binary"),
        ).otherwise(F.col("payload")),
    )
    feats = decode_video_features(broken, "doc_id", "payload").collect()
    tiers = {r["doc_id"]: r["decoder"] for r in feats}
    assert all(
        tier == ("stub" if doc_id % 2 == 0 else "avi-purepy")
        for doc_id, tier in tiers.items()
    )


# --- JPEG (baseline T.81, round 5) ----------------------------------------


def test_jpeg_flat_color_roundtrips_exactly():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((24, 40, 3), [120, 64, 200], dtype=np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quant=4, subsample_420=sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() == 0


@pytest.mark.parametrize("sub", [False, True])
def test_jpeg_gradient_roundtrip_within_quant_error(sub):
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    x = np.linspace(0, 255, 61)
    y = np.linspace(0, 255, 45)
    gx, gy = np.meshgrid(x, y)
    img = np.stack([gx, gy, (gx + gy) / 2], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=4, subsample_420=sub))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape  # odd sizes: pad + crop handled
    assert err.mean() < 2.0 and err.max() <= (8 if sub else 4)


def test_jpeg_grayscale_and_noise_tight_at_quant1():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(33, 29), dtype=np.uint8).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quant=1))
    assert out.shape == gray.shape
    # grayscale skips color-space rounding: quant=1 is near-lossless
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8).astype(np.uint8)
    out2 = decode_jpeg(encode_jpeg(rgb, quant=1))
    assert np.abs(out2.astype(int) - rgb.astype(int)).max() <= 2  # YCbCr rounding


def test_jpeg_rejects_bad_and_unsupported():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    img = np.full((8, 8), 99, dtype=np.uint8)
    good = encode_jpeg(img, quant=2)
    # flip SOF0 -> SOF2 (progressive) -> must refuse, not mis-decode
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # truncated entropy data -> error (callers fall to the stub tier)
    with pytest.raises(Exception):
        decode_jpeg(good[: len(good) - 6])


def test_jpeg_multimodal_path_decodes_real(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_jpeg_payload,
        decode_image_features,
    )
    from financial_anomaly_detection_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(24)
    media = attach_jpeg_payload(docs, "doc_id")
    feats = decode_image_features(media, "doc_id", "payload").collect()
    assert len(feats) == 24
    assert {r["decoder"] for r in feats} <= {"jpeg-purepy", "pil"}
    for r in feats:
        i = r["doc_id"]
        assert r["width"] == 16 + (i // 9) % 9 and r["height"] == 16 + i % 9
        assert r["channels"] == 3
        assert 0.0 < r["mean_intensity"] < 255.0


# --- G.711 mu-law / A-law (round 5) ---------------------------------------


def test_g711_sine_roundtrip_snr():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_wav,
        encode_wav_g711,
    )

    t = np.arange(2000)
    sig = (8000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    for law in ("mu", "a"):
        rate, out = decode_wav(encode_wav_g711(sig, 8000, law))
        assert rate == 8000 and out.shape == (2000, 1)
        err = out[:, 0].astype(float) - sig.astype(float)
        snr = 10 * np.log10((sig.astype(float) ** 2).mean() / (err**2).mean())
        assert snr > 35.0, f"{law}-law SNR {snr:.1f} dB below G.711 expectation"


def test_g711_companding_idempotent_on_all_codes():
    """encode(decode(c)) must reproduce c's decode level for every one
    of the 256 codes — the nearest-level encoder guarantees it."""
    from financial_anomaly_detection_spark.operators.codecs import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    for dec, enc in ((_mulaw_decode, _mulaw_encode), (_alaw_decode, _alaw_encode)):
        assert np.array_equal(dec(enc(dec(codes))), dec(codes))


def test_g711_known_levels():
    """Spot values from the public G.711 tables: mu-law peak +-32124
    at codes 0x80/0x00 complemented; A-law peak +-32256; both laws
    decode a near-zero level for the 'silence' codes."""
    from financial_anomaly_detection_spark.operators.codecs import (
        _alaw_decode,
        _mulaw_decode,
    )

    mu = _mulaw_decode(np.arange(256, dtype=np.uint8))
    assert int(mu.max()) == 32124 and int(mu.min()) == -32124
    assert int(mu[0xFF]) == 0  # mu-law code 0xFF decodes to 0
    al = _alaw_decode(np.arange(256, dtype=np.uint8))
    assert int(al.max()) == 32256 and int(al.min()) == -32256
    assert abs(int(al[0xD5])) <= 8  # A-law 'silence' code 0x55^0x80


def test_g711_multimodal_path_decodes_real(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_g711_payload,
        decode_audio_features,
    )
    from financial_anomaly_detection_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(16)
    media = attach_g711_payload(docs, "doc_id")
    feats = decode_audio_features(media, "doc_id", "payload").collect()
    assert len(feats) == 16
    for r in feats:
        i = r["doc_id"]
        expect = "wav-mulaw-purepy" if i % 2 == 0 else "wav-alaw-purepy"
        assert r["decoder"] == expect
        assert r["sample_rate"] == 8000 and r["n_samples"] == 1000
        # dominant frequency recovered through the companding round-trip
        assert abs(r["dominant_freq_hz"] - (200 + (i % 17) * 100)) <= 16.0


# --- Motion JPEG in AVI (round 5) -----------------------------------------


def test_mjpeg_avi_roundtrip_and_compression():
    from financial_anomaly_detection_spark.operators.codecs import (
        decode_avi,
        encode_avi,
    )

    h, w, n = 24, 32, 5
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [
            np.stack(
                [(xx * 4 + k * 8) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256],
                -1,
            ).astype(np.uint8)
            for k in range(n)
        ]
    )
    raw = encode_avi(frames, fps=10.0, codec="MJPG", quant=4)
    fps, out = decode_avi(raw)
    assert fps == 10.0 and out.shape == frames.shape
    err = np.abs(out.astype(int) - frames.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8
    # it actually compresses: far below the uncompressed DIB size
    dib = encode_avi(frames, fps=10.0)
    assert len(raw) < len(dib) / 2


def test_mjpeg_multimodal_path_decodes_real(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        attach_mjpeg_payload,
        decode_video_features,
    )
    from financial_anomaly_detection_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12)
    media = attach_mjpeg_payload(docs, "doc_id")
    feats = decode_video_features(media, "doc_id", "payload").collect()
    assert len(feats) == 12
    for r in feats:
        assert r["decoder"] == "avi-mjpeg-purepy"
        assert r["n_frames"] == 6 and r["width"] == 24 and r["height"] == 16
        assert r["fps"] == 8.0
        assert r["motion_score"] > 0.0  # frames genuinely differ
