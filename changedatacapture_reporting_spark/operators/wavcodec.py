"""Stdlib WAV codec — REAL audio decode without audio libs.

The multimodal surface's audio leg previously fell through to the
byte-histogram stand-in for every payload (no soundfile/librosa in this
container). RIFF/WAVE PCM is a public byte format simple enough to
parse with ``struct`` + numpy, the same posture as
:mod:`operators.pngcodec`: decode what the spec pins exactly, refuse
everything else loudly (``UnsupportedWAV``) so a misparse can never
poison features, and let callers fall back to the stand-in.

Scope (refuses outside it, never guesses):

- RIFF little-endian container, ``WAVE`` form, ``fmt `` + ``data``
  chunks in any order, unknown chunks skipped (word-aligned per spec).
- PCM (format 1) at 8-bit unsigned / 16-bit / 32-bit signed LE, and
  IEEE float32 (format 3); any channel count (decoded to mono mean).

Features are REAL signal measurements (numpy): RMS level, zero-crossing
rate, and log-spaced spectral band energies from one rfft — the shape a
production audio-quality filter computes, at the fixed FEATURE_DIM the
multimodal contract pins.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWAV(ValueError):
    """Payload is not a WAV this codec can decode exactly."""


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 samples in [-1, 1], sample_rate).

    Multi-channel audio decodes to the channel MEAN (the standard
    mono-mixdown for feature extraction). Truncated chunks, non-PCM
    formats, and unsupported bit depths refuse."""
    if not is_wav(data):
        raise UnsupportedWAV("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise UnsupportedWAV(
                f"chunk {cid!r} truncated ({len(body)} of {size} bytes)"
            )
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedWAV(f"fmt chunk too short ({size} B)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise UnsupportedWAV("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if n_channels < 1:
        raise UnsupportedWAV("zero channels")
    if audio_format == 1 and bits == 8:
        x = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            - 128.0
        ) / 128.0
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = (
            np.frombuffer(raw, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise UnsupportedWAV(
            f"format {audio_format} at {bits}-bit is outside the "
            "exact-decode scope (PCM 8/16/32 + float32 only)"
        )
    n = (x.size // n_channels) * n_channels
    if n == 0:
        raise UnsupportedWAV("empty data chunk")
    mono = x[:n].reshape(-1, n_channels).mean(axis=1)
    return mono.astype(np.float32), int(sample_rate)


def features(samples: np.ndarray, sample_rate: int, dim: int) -> list[float]:
    """Fixed-width REAL audio features: [rms, zero-crossing rate,
    dim-2 log-spaced spectral band energy fractions]. All in [0, 1],
    deterministic, one rfft."""
    x = np.asarray(samples, dtype=np.float32)
    if x.size == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = (
        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if x.size > 1
        else 0.0
    )
    n_bands = max(dim - 2, 1)
    mag = np.abs(np.fft.rfft(x))
    mag[0] = 0.0  # DC carries no timbre information
    total = float(mag.sum()) or 1.0
    # log-spaced band edges over the positive spectrum
    edges = np.unique(
        np.geomspace(1, mag.size, n_bands + 1).astype(int)
    )
    bands = [
        float(mag[a:b].sum()) / total
        for a, b in zip(edges[:-1], edges[1:])
    ]
    bands += [0.0] * (n_bands - len(bands))
    out = [min(rms, 1.0), zcr] + bands[:n_bands]
    return [float(v) for v in out[:dim]] + [0.0] * max(0, dim - len(out))


def encode(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Mono float32 [-1, 1] samples → PCM WAV bytes (fixture/export
    helper; tests verify decode against INDEPENDENTLY hand-packed
    bytes, never against this)."""
    x = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    if bits == 16:
        raw = (x * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        raw = (x * 127.0 + 128.0).astype(np.uint8).tobytes()
    else:
        raise UnsupportedWAV(f"encode supports 8/16-bit, not {bits}")
    block = bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
