"""Minimal stdlib PNG codec — makes the multimodal decode path REAL
for one format in environments without image libraries (this container
ships no PIL; the environment contract forbids installing one).

Scope, chosen for the training-data-pipeline shapes that matter:
decode of non-interlaced 8-bit PNGs in the common color types
(greyscale 0, RGB 2, palette 3, grey+alpha 4, RGBA 6) with full
filter support (None/Sub/Up/Average/Paeth per the PNG spec §9), and
encode of 8-bit greyscale/RGB. Anything outside that scope raises
``UnsupportedPNG`` so callers fall back to the deterministic stand-in
decoder — a refusal, never a wrong pixel.

Performance posture: chunk parsing, zlib and the Up filter are
vectorized (numpy); Sub/Average/Paeth carry a left-pixel data
dependency so they run as per-row scalar loops — fine for the
thumbnail/feature-probe sizes this path serves. Production stacks
swap in PIL via the capability probe in operators.multimodal; the
Spark-side plumbing is identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class UnsupportedPNG(ValueError):
    """Valid-looking PNG outside this codec's scope (interlaced,
    16-bit, …) — callers fall back rather than misdecode."""


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels)
    (palette entries resolved to RGB; channels ∈ {1, 2, 3, 4})."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedPNG(f"bit depth {depth} (only 8 supported)")
    if color not in _CHANNELS:
        raise UnsupportedPNG(f"color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace != 0:
        raise UnsupportedPNG("Adam7 interlacing")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorizes (no intra-row dependency)
            line += prev
        elif ftype in (1, 3, 4):
            b = prev.astype(np.int32)
            cur = line.astype(np.int32)
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                if ftype == 1:  # Sub
                    cur[x] = (cur[x] + left) & 0xFF
                elif ftype == 3:  # Average
                    cur[x] = (cur[x] + ((left + int(b[x])) >> 1)) & 0xFF
                else:  # Paeth
                    up = int(b[x])
                    ul = int(b[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur[x] = (cur[x] + pred) & 0xFF
            line = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = line
        prev = out[y]
    px = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        px = plte[idx]  # (h, w, 3)
    return px


def to_grey(px: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → (h, w) uint8 luminance (ITU-R 601 weights for
    color; alpha ignored — features describe the pixels, not coverage)."""
    ch = px.shape[2]
    if ch == 1:
        return px[:, :, 0]
    if ch == 2:
        return px[:, :, 0]
    rgb = px[:, :, :3].astype(np.float32)
    grey = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    return np.clip(np.rint(grey), 0, 255).astype(np.uint8)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w[, ch]) to (height, width[, ch]) —
    pure index arithmetic, exact and deterministic."""
    h, w = px.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return px[np.ix_(ys, xs)]


def encode(px: np.ndarray) -> bytes:
    """uint8 array of shape (h, w) / (h, w, 1) (greyscale) or (h, w, 3)
    (RGB) → PNG bytes (filter 0 rows — simplicity over ratio; any
    conformant decoder reads it)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch == 1:
        color = 0
    elif ch == 3:
        color = 2
    else:
        raise ValueError(f"encode supports 1 or 3 channels, got {ch}")
    px = np.ascontiguousarray(px, dtype=np.uint8)
    raw = b"".join(
        b"\x00" + px[y].tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
