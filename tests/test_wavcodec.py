"""Stdlib WAV codec: decode verified against INDEPENDENTLY hand-packed
RIFF bytes (struct-built forward in the test — the codec can't
self-verify), real signal features, refusal of out-of-scope shapes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from changedatacapture_reporting_spark.operators import wavcodec


def _wav_bytes(fmt_tuple, raw, extra_chunk=None):
    """Forward RIFF construction, independent of wavcodec.encode."""
    fmt = struct.pack("<HHIIHH", *fmt_tuple)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        body += extra_chunk
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_16bit_mono_hand_packed():
    # square wave ±16384 at 8 kHz
    samples = [16384, 16384, -16384, -16384] * 2
    raw = struct.pack("<8h", *samples)
    data = _wav_bytes((1, 1, 8000, 16000, 2, 16), raw)
    assert wavcodec.is_wav(data)
    x, rate = wavcodec.decode(data)
    assert rate == 8000
    np.testing.assert_allclose(x, np.array(samples) / 32768.0, atol=1e-6)


def test_decode_8bit_stereo_channel_mean_and_unknown_chunk_skip():
    # L channel 255 (=+0.992), R channel 0 (=-1.0) → mean ≈ -0.004
    raw = bytes([255, 0, 255, 0])
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # word-align
    data = _wav_bytes((1, 2, 44100, 88200, 2, 8), raw, extra_chunk=junk)
    x, rate = wavcodec.decode(data)
    assert rate == 44100 and x.size == 2
    np.testing.assert_allclose(
        x, [((255 - 128) / 128.0 + (0 - 128) / 128.0) / 2] * 2, atol=1e-6
    )


def test_decode_float32_and_int32():
    vals = np.array([0.25, -0.5, 1.0, -1.0], dtype="<f4")
    data = _wav_bytes((3, 1, 16000, 64000, 4, 32), vals.tobytes())
    x, _ = wavcodec.decode(data)
    np.testing.assert_allclose(x, vals, atol=1e-7)
    ints = np.array(
        [2**30, -(2**30), 0, 2**31 - 1], dtype="<i4"
    )
    data = _wav_bytes((1, 1, 16000, 64000, 4, 32), ints.tobytes())
    x, _ = wavcodec.decode(data)
    np.testing.assert_allclose(
        x, ints.astype(np.float64) / 2**31, atol=1e-6
    )


def test_features_are_real_signal_measurements():
    # sine at rate/4 → zero-crossing rate 0.5, rms amp/sqrt(2), and the
    # spectral mass concentrated in the band holding bin n/4
    rate, n, amp = 8000, 1024, 0.8
    t = np.arange(n)
    x = (amp * np.sin(2 * np.pi * t / 4)).astype(np.float32)
    f = wavcodec.features(x, rate, 8)
    assert len(f) == 8
    assert abs(f[0] - amp / np.sqrt(2)) < 0.01  # rms
    assert abs(f[1] - 0.5) < 0.02  # zcr
    bands = np.array(f[2:])
    # bin 256 of 513 → falls in the last log-spaced band
    assert bands.argmax() == len(bands) - 1
    assert bands.sum() == pytest.approx(1.0, abs=1e-3)


def test_refusals_and_roundtrip():
    with pytest.raises(wavcodec.UnsupportedWAV, match="RIFF"):
        wavcodec.decode(b"not a wav at all")
    # truncated data chunk
    raw = struct.pack("<4h", 1, 2, 3, 4)
    good = _wav_bytes((1, 1, 8000, 16000, 2, 16), raw)
    with pytest.raises(wavcodec.UnsupportedWAV, match="truncated"):
        wavcodec.decode(good[:-3])
    # unsupported format code (e.g. 6 = a-law)
    bad = _wav_bytes((6, 1, 8000, 8000, 1, 8), b"\x00\x01")
    with pytest.raises(wavcodec.UnsupportedWAV, match="scope"):
        wavcodec.decode(bad)
    # encode→decode sanity (independent fixtures above are the proof)
    x = np.sin(np.linspace(0, 20, 500)).astype(np.float32) * 0.5
    got, rate = wavcodec.decode(wavcodec.encode(x, 22050))
    assert rate == 22050
    np.testing.assert_allclose(got, x, atol=1e-3)


def test_multimodal_extract_features_decodes_wav(spark):
    """The production mapInPandas path: WAV payloads yield REAL audio
    features (rms/zcr, not a byte histogram)."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        extract_features,
    )

    amp = 0.6
    x = (amp * np.sin(np.arange(2048) * np.pi / 2)).astype(np.float32)
    payload = wavcodec.encode(x, 16000)
    df = spark.createDataFrame([(1, payload)], "doc_id long, blob binary")
    (row,) = extract_features(df).collect()
    feats = row["features"]
    assert abs(feats[0] - amp / np.sqrt(2)) < 0.02
    assert abs(feats[1] - 0.5) < 0.05
