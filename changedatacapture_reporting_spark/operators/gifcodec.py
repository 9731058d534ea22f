"""Stdlib GIF decoder — real pixels for a second image format, and REAL
FRAMES for the video-ish ``sample_frames`` path.

GIF87a/GIF89a is a public byte format (W3C GIF89a specification):
logical screen descriptor, global/local color tables, LZW-compressed
indexed image data in 255-byte sub-blocks, extension blocks, multiple
image descriptors for animation. Same posture as
:mod:`operators.pngcodec`: decode the pinned scope exactly, refuse
everything else with ``UnsupportedGIF`` so a misparse never poisons
downstream features, and let callers fall back to the stand-in.

Scope:

- GIF87a and GIF89a, global and local color tables, interlaced and
  sequential images, transparency via the Graphic Control Extension's
  transparent index, multi-frame animations composited by OVERLAY onto
  the running canvas (disposal modes 0/1/2 — mode 2 restores the
  background as transparent-black per common-renderer behavior; mode 3
  "restore previous" refuses: honoring it needs a frame stack and
  guessing would show wrong pixels).
- LZW: variable code width 3–12 bits, clear/end codes, the deferred
  clear convention.

Decode output is an RGB uint8 array per frame; ``decode`` returns the
first composited frame (image semantics), ``decode_frames`` every
composited frame (video semantics).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedGIF(ValueError):
    """Payload is not a GIF this codec can decode exactly."""


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, variable width growing to
    12 bits, clear resets the dictionary, end-of-information stops."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dict_base = [(i,) for i in range(clear)] + [(), ()]
    table = list(dict_base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    n_bits = 0
    pos = 0
    while len(out) < n_pixels:
        while n_bits < width:
            if pos >= len(data):
                raise UnsupportedGIF(
                    f"LZW stream truncated at {len(out)}/{n_pixels} px"
                )
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise UnsupportedGIF(f"first LZW code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise UnsupportedGIF(f"LZW code {code} beyond table")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise UnsupportedGIF(
            f"LZW ended at {len(out)}/{n_pixels} pixels"
        )
    return out[:n_pixels]


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_frames(data: bytes) -> list[np.ndarray]:
    """Every composited frame as (h, w, 3) uint8 RGB."""
    if not is_gif(data):
        raise UnsupportedGIF("not a GIF87a/GIF89a payload")
    if len(data) < 13:
        raise UnsupportedGIF("header truncated")
    w, h, flags, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if gct.shape[0] != n:
            raise UnsupportedGIF("global color table truncated")
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < gct.shape[0]:
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(data):
                raise UnsupportedGIF("sub-blocks truncated")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(parts), p
            parts.append(data[p : p + n])
            if len(parts[-1]) != n:
                raise UnsupportedGIF("sub-block truncated")
            p += n

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise UnsupportedGIF("extension truncated")
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # GCE
                gflags = body[0]
                disposal = (gflags >> 2) & 0x07
                transparent = body[3] if gflags & 0x01 else None
                if disposal == 3:
                    raise UnsupportedGIF(
                        "disposal mode 3 (restore previous) is outside "
                        "the exact-decode scope"
                    )
            continue
        if b != 0x2C:
            raise UnsupportedGIF(f"unknown block introducer 0x{b:02x}")
        # image descriptor
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if ct.shape[0] != n:
                raise UnsupportedGIF("local color table truncated")
            pos += 3 * n
        if ct is None:
            raise UnsupportedGIF("image has no color table")
        if left + iw > w or top + ih > h:
            raise UnsupportedGIF("frame rectangle exceeds the canvas")
        if pos >= len(data):
            raise UnsupportedGIF("image data truncated")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise UnsupportedGIF(f"LZW min code size {min_code}")
        lzw, pos = read_subblocks(pos)
        idx = np.array(
            _lzw_decode(min_code, lzw, iw * ih), dtype=np.int32
        ).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx, ih)
        if int(idx.max(initial=0)) >= ct.shape[0]:
            raise UnsupportedGIF("pixel index beyond the color table")
        rect = canvas[top : top + ih, left : left + iw]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = rgb[mask]
        else:
            rect[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background (rendered as black)
            canvas[top : top + ih, left : left + iw] = 0
        # a Graphic Control Extension governs only the image that
        # follows it (GIF89a §23) — reset before the next frame
        transparent = None
        disposal = 0
    if not frames:
        raise UnsupportedGIF("no image data blocks")
    return frames


def decode(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    return decode_frames(data)[0]
