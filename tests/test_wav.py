"""RIFF/WAVE codec + audio feature path (operators/multimodal.py)."""

import numpy as np
import pytest

from medical_ocr_service_spark.operators import multimodal as mm


def test_wav_roundtrip_pcm16():
    rate = 16000
    t = np.arange(rate) / rate  # 1 s
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = mm.encode_wav(sig, rate)
    r, ch, x = mm.decode_wav(payload)
    assert (r, ch) == (rate, 1) and x.shape == (rate, 1)
    # 16-bit quantization: within 1/32767 of the original
    assert np.abs(x[:, 0] - sig).max() < 1.0 / 32000

    # stereo
    st = np.stack([sig, -sig], axis=1)
    r, ch, x = mm.decode_wav(mm.encode_wav(st, 8000))
    assert (r, ch) == (8000, 2) and x.shape == (rate, 2)
    assert np.abs(x - st).max() < 1.0 / 32000


def test_wav_error_paths():
    with pytest.raises(ValueError, match="not a WAV"):
        mm.decode_wav(b"RIFFxxxxAVI ")
    good = mm.encode_wav(np.zeros(100), 8000)
    # format code 2 (ADPCM) rejected loudly
    bad = bytearray(good)
    bad[20] = 2
    with pytest.raises(ValueError, match="unsupported WAV format"):
        mm.decode_wav(bytes(bad))


def test_wav_features_and_metadata_gate(spark):
    from pyspark.sql import functions as F

    media = mm.synthesize_media(spark, 60)
    wav = media.filter("mime = 'audio/wav'")
    assert wav.count() > 0
    feats = mm.decode_features(wav, fake=False).toPandas()
    assert feats["valid"].all()
    assert feats["feat"].map(len).eq(16).all()
    assert feats["feat"].map(lambda f: all(0 <= v <= 1 for v in f)).all()
    # RMS of a 0.5-amplitude sine is ~0.354 — real signal, not a digest
    assert feats["feat"].map(lambda f: abs(f[3] - 0.354) < 0.02).all()

    # lying duration metadata is caught against the decoded sample count
    lied = wav.limit(1).withColumn("duration_ms", F.lit(999_999))
    out = mm.decode_features(lied, fake=False).toPandas()
    assert not out.iloc[0]["valid"]
    assert out.iloc[0]["error"] == "METADATA_DURATION_MISMATCH"
