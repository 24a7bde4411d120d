"""Real multimodal decode: numpy PPM / WAV parsers against hand-built
fixtures with known pixel/sample values, plus the Spark end-to-end path."""

from __future__ import annotations

import math

import numpy as np
import pytest

from octocode_spark.operators.multimodal import (
    FEATURE_DIM,
    _audio_features,
    _image_features,
    _wav_header,
    decode_ppm,
    decode_wav_pcm16,
    extract_features,
    synthetic_media,
)


def test_decode_ppm_known_pixels():
    # 2×2: red, green / blue, white — header with a comment line
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    raw = b"P6\n# test\n2 2\n255\n" + px
    img = decode_ppm(raw)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 255]
    f = _image_features(img)
    assert len(f) == FEATURE_DIM
    # channel means of the actual pixels: R = (255+0+0+255)/4/255 = 0.5 etc.
    assert f[3] == pytest.approx(0.5)
    assert f[4] == pytest.approx(0.5)
    assert f[5] == pytest.approx(0.5)
    assert f[11] == 0.0 and f[12] == 1.0  # min / max


def test_decode_wav_known_samples():
    # constant +0.5 amplitude: RMS = mean_abs = max = 0.5, ZCR = 0
    samples = np.full(64, 16384, dtype="<i2")
    raw = _wav_header(128) + samples.tobytes()
    x, rate = decode_wav_pcm16(raw)
    assert rate == 16000 and len(x) == 64
    assert np.allclose(x, 0.5)
    f = _audio_features(x, rate)
    assert len(f) == FEATURE_DIM
    assert f[1] == pytest.approx(0.5) and f[3] == pytest.approx(0.5)
    assert f[4] == 0.0  # no zero crossings

    # full-scale square wave at Nyquist/2: ZCR = 1, energy in the top band
    sq = np.tile([16384, -16384], 32).astype("<i2")
    x2, _ = decode_wav_pcm16(_wav_header(128) + sq.tobytes())
    f2 = _audio_features(x2, 16000)
    assert f2[4] == pytest.approx(1.0)
    assert f2[1] == pytest.approx(0.5)
    assert np.argmax(f2[6:]) == 9  # highest FFT band dominates


def test_decoders_reject_garbage():
    with pytest.raises(ValueError, match="PPM"):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"\x00" * 64)
    with pytest.raises(ValueError, match="PCM-16"):
        bad = bytearray(_wav_header(4) + b"\x00" * 4)
        bad[34] = 8  # bits-per-sample = 8
        decode_wav_pcm16(bytes(bad))


def test_synthetic_media_payloads_really_decode(spark):
    """The end-to-end gate: synthetic image/audio payloads are VALID PPM/WAV
    files and the mapInPandas path derives features from decoded content."""
    media = synthetic_media(spark, 30).cache()
    rows = {r["media_id"]: r for r in media.collect()}
    img = next(r for r in rows.values() if r["kind"] == "image")
    aud = next(r for r in rows.values() if r["kind"] == "audio")
    px = decode_ppm(bytes(img["payload"]))
    assert px.shape == (8, 8, 3)
    x, rate = decode_wav_pcm16(bytes(aud["payload"]))
    assert (len(x), rate) == (64, 16000)

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    got = np.array(feats[img["media_id"]]["features"], dtype=np.float64)
    want = _image_features(px).astype(np.float32).astype(np.float64)
    assert np.allclose(got, want)  # Spark-side features == local decode
    got_a = np.array(feats[aud["media_id"]]["features"], dtype=np.float64)
    want_a = _audio_features(x, rate).astype(np.float32).astype(np.float64)
    assert np.allclose(got_a, want_a)
    assert all(
        not math.isnan(v) for r in feats.values() for v in r["features"]
    )
    media.unpersist()
