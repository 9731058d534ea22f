"""Stdlib PNG codec (operators.pngcodec) + its multimodal wiring.

The decode fixtures are HAND-BUILT in the test — chunks framed with
struct/zlib directly and filter bytes applied by an independent scalar
reference — so the codec cannot verify itself. Covers all five filter
types, the five supported color types, refusals (CRC, interlace,
16-bit), encode→decode round-trips, and the mapInPandas feature /
resize paths running REAL pixel math on PNG blobs in this PIL-less
container.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from changedatacapture_reporting_spark.operators import pngcodec as C


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, color, raw, plte: bytes | None = None, depth=8,
         interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = C.PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _filter_rows_reference(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent scalar implementation of the PNG filters (spec §9),
    FORWARD direction — produces the filtered stream the decoder must
    invert."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    out = bytearray()
    for y, ft in enumerate(ftypes):
        out.append(ft)
        for x in range(stride):
            v = flat[y][x]
            left = flat[y][x - ch] if x >= ch else 0
            up = flat[y - 1][x] if y > 0 else 0
            ul = flat[y - 1][x - ch] if y > 0 and x >= ch else 0
            if ft == 0:
                f = v
            elif ft == 1:
                f = v - left
            elif ft == 2:
                f = v - up
            elif ft == 3:
                f = v - ((left + up) >> 1)
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul
                )
                f = v - pred
            out.append(f & 0xFF)
    return bytes(out)


def test_decode_all_filter_types_grey():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 6, 1), dtype=np.uint8)
    raw = _filter_rows_reference(px, [0, 1, 2, 3, 4])
    got = C.decode(_png(6, 5, 0, raw))
    assert np.array_equal(got, px)


def test_decode_all_filter_types_rgb_and_rgba():
    rng = np.random.RandomState(11)
    for ch, color in ((3, 2), (4, 6), (2, 4)):
        px = rng.randint(0, 256, size=(4, 3, ch), dtype=np.uint8)
        raw = _filter_rows_reference(px, [4, 3, 1, 2])
        got = C.decode(_png(3, 4, color, raw))
        assert np.array_equal(got, px), (ch, color)


def test_decode_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)[:, :, None]
    raw = _filter_rows_reference(idx, [0, 0])
    got = C.decode(_png(3, 2, 3, raw, plte=plte))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 255], [0, 255, 0], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


def test_refusals():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    raw = _filter_rows_reference(px, [0, 0])
    ok = _png(2, 2, 0, raw)
    # corrupt a CRC → ValueError, never wrong pixels
    bad = bytearray(ok)
    bad[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        C.decode(bytes(bad))
    with pytest.raises(C.UnsupportedPNG, match="interlacing"):
        C.decode(_png(2, 2, 0, raw, interlace=1))
    with pytest.raises(C.UnsupportedPNG, match="bit depth"):
        C.decode(_png(2, 2, 0, raw, depth=16))
    with pytest.raises(ValueError, match="signature"):
        C.decode(b"plainly not a png")


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    grey = rng.randint(0, 256, size=(9, 7, 1), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(5, 5, 3), dtype=np.uint8)
    assert np.array_equal(C.decode(C.encode(grey)), grey)
    assert np.array_equal(C.decode(C.encode(rgb)), rgb)


def test_resize_nearest_exact():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = C.resize_nearest(px, 2, 2)
    # blocks of 2: picks the top-left sample of each block
    assert np.array_equal(out, np.array([[0, 2], [8, 10]], dtype=np.uint8))


def test_extract_features_real_png(spark):
    """A real PNG blob through the production mapInPandas path in this
    PIL-less container: features are the actual luminance strip, not
    the byte histogram — a horizontal black→white ramp must come back
    monotonically increasing."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    ramp = np.tile(
        np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (8, 1, 1)
    )
    png = C.encode(ramp)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image at all"))],
        "doc_id long, blob binary",
    )
    rows = {
        r["doc_id"]: list(r["features"])
        for r in extract_features(df).collect()
    }
    f = rows[1]
    assert len(f) == FEATURE_DIM
    assert all(b > a for a, b in zip(f, f[1:])), f  # the ramp survived
    # nearest-neighbor samples column (7*64)//8 = 56 of 64 → ≈0.89
    assert f[0] < 0.1 and f[-1] > 0.8
    # non-PNG falls back to the normalized byte histogram
    assert abs(sum(rows[2]) - 1.0) < 1e-3


def test_resize_images_real_png(spark):
    """resize_images on a PNG payload re-encodes REAL resized pixels:
    decoding the output PNG gives exactly the nearest-neighbor
    resample of the input."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        resize_images,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    png = C.encode(px)
    df = spark.createDataFrame(
        [(7, bytearray(png))], "doc_id long, blob binary"
    )
    (row,) = resize_images(df, 6, 4).collect()
    got = C.decode(bytes(row["resized"]))
    assert np.array_equal(got, C.resize_nearest(px, 6, 4))
    assert (row["width"], row["height"]) == (6, 4)
