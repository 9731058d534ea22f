"""operators.jpegcodec — stdlib+numpy baseline JPEG decoder against
HAND-BUILT byte fixtures (segments struct-packed, entropy data
specified as literal bit strings and packed by a trivial helper — the
same independent-construction discipline as the PNG filter streams and
the hand-bit-packed GIF LZW fixtures, so the codec cannot
self-verify). DC-only blocks make every expected pixel value
hand-computable: a constant block's only DCT coefficient is
F(0,0) = 8·(level−128), so the decoder must reproduce the level
EXACTLY (orthonormal IDCT of a DC-only block is constant F(0,0)/8)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from changedatacapture_reporting_spark.operators import jpegcodec
from changedatacapture_reporting_spark.operators.jpegcodec import (
    UnsupportedJPEG,
)


def _bits(s: str) -> bytes:
    """Pack a literal bit string MSB-first, padding with 1s (the JPEG
    entropy-segment padding convention)."""
    s = s.replace(" ", "")
    s += "1" * (-len(s) % 8)
    return bytes(
        int(s[i : i + 8], 2) for i in range(0, len(s), 8)
    )


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_ones(tid: int = 0) -> bytes:
    return _seg(0xDB, bytes([tid]) + b"\x01" * 64)


def _dht(tc: int, th: int, counts: list[int], values: bytes) -> bytes:
    assert sum(counts) == len(values)
    return _seg(
        0xC4, bytes([(tc << 4) | th]) + bytes(counts) + values
    )


def _sof0(w: int, h: int, comps: list[tuple[int, int, int, int]]) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return _seg(0xC0, body)


def _sos(comps: list[tuple[int, int, int]]) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([0, 63, 0])
    return _seg(0xDA, body)


_EOB_AC = _dht(1, 0, [1] + [0] * 15, b"\x00")  # single code '0' = EOB


def test_solid_grayscale_block_exact():
    """8×8 solid level 200: DC coefficient 8·72 = 576 (category 10),
    one-code Huffman tables, entropy bits written by hand."""
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + _dht(0, 0, [1] + [0] * 15, b"\x0a")  # '0' -> DC category 10
        + _EOB_AC
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _sos([(1, 0, 0)])
        + _bits("0" + format(576, "010b") + "0")
        + b"\xff\xd9"
    )
    px = jpegcodec.decode(jpg)
    assert px.shape == (8, 8, 1)
    assert (px == 200).all()


def test_dc_prediction_across_blocks():
    """24×8: three blocks at levels 200, 190, 205 — DC DIFFERENCES
    576, −80, +120 (categories 10/7/7; −80 encodes as 47 per the
    T.81 extend rule). Exercises the predictor chain and negative
    differences."""
    dc = _dht(0, 0, [0, 2] + [0] * 14, b"\x0a\x07")  # 00->10, 01->7
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + dc
        + _EOB_AC
        + _sof0(24, 8, [(1, 1, 1, 0)])
        + _sos([(1, 0, 0)])
        + _bits(
            "00" + format(576, "010b") + "0"   # 200
            + "01" + format(-80 + 127, "07b") + "0"  # 190
            + "01" + format(120, "07b") + "0"  # 205
        )
        + b"\xff\xd9"
    )
    px = jpegcodec.decode(jpg)
    assert px.shape == (8, 24, 1)
    assert (px[:, 0:8, 0] == 200).all()
    assert (px[:, 8:16, 0] == 190).all()
    assert (px[:, 16:24, 0] == 205).all()


def test_restart_markers_reset_predictor():
    """DRI=1: a restart marker lands between MCUs, byte-aligns the
    stream and RESETS the DC predictor — block 2's difference is its
    absolute DC (496, category 9), not −80."""
    dc = _dht(0, 0, [0, 2] + [0] * 14, b"\x0a\x09")  # 00->10, 01->9
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + dc
        + _EOB_AC
        + _seg(0xDD, struct.pack(">H", 1))  # DRI: interval 1
        + _sof0(16, 8, [(1, 1, 1, 0)])
        + _sos([(1, 0, 0)])
        + _bits("00" + format(576, "010b") + "0")   # 200
        + b"\xff\xd0"                               # RST0
        + _bits("01" + format(496, "09b") + "0")    # 190 (abs DC 496)
        + b"\xff\xd9"
    )
    px = jpegcodec.decode(jpg)
    assert (px[:, 0:8, 0] == 200).all()
    assert (px[:, 8:16, 0] == 190).all()


def test_color_420_solid_exact():
    """16×16 4:2:0 YCbCr solid (Y=128, Cb=228, Cr=98): four DC-zero
    luma blocks + one chroma block each (DCs 800 and −240, categories
    10 and 8). Expected RGB computed here INDEPENDENTLY from the JFIF
    equations — not read back from the codec."""
    dc = _dht(
        0, 0, [0, 3] + [0] * 14, b"\x00\x0a\x08"
    )  # 00->cat0, 01->cat10, 10->cat8
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + dc
        + _EOB_AC
        + _sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)])
        + _bits(
            ("00" + "0") * 4                       # 4 luma DC=0 blocks
            + "01" + format(800, "010b") + "0"     # Cb: 8*(228-128)
            + "10" + format(-240 + 255, "08b") + "0"  # Cr: 8*(98-128)
        )
        + b"\xff\xd9"
    )
    px = jpegcodec.decode(jpg)
    assert px.shape == (16, 16, 3)
    y, cb, cr = 128.0, 228.0, 98.0
    want = np.clip(
        np.round(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (px == want[None, None, :]).all(), (px[0, 0], want)


def test_ac_coefficient_and_zigzag():
    """One nonzero AC coefficient at zigzag index 1 (= frequency (0,1))
    with value 64: the decoded block must equal the hand-computed
    IDCT  128 + (64/8)·√2·cos((2x+1)π/16)  per column — pinning the
    zigzag mapping, AC run/size decoding and the IDCT normalization,
    not just DC plumbing."""
    # AC table: '0' -> EOB, '10' -> run 0 / size 7 (0x07)
    ac = _dht(1, 0, [1, 1] + [0] * 14, b"\x00\x07")
    dc = _dht(0, 0, [1] + [0] * 15, b"\x00")  # '0' -> category 0
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + dc
        + ac
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _sos([(1, 0, 0)])
        + _bits("0" + "10" + format(64, "07b") + "0")
        + b"\xff\xd9"
    )
    px = jpegcodec.decode(jpg).astype(np.float64)[:, :, 0]
    x = np.arange(8)
    basis = np.sqrt(2) / 2 * np.cos((2 * x + 1) * 1 * np.pi / 16)
    want_row = np.clip(np.round(128.0 + 64.0 * basis / 4.0), 0, 255)
    # every row identical; columns follow the cosine basis
    for r in range(8):
        assert (px[r] == want_row).all(), (px[r], want_row)


def test_refusals_and_errors():
    # progressive
    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00")
    )
    with pytest.raises(UnsupportedJPEG, match="progressive"):
        jpegcodec.decode(jpg)
    # 12-bit precision
    jpg12 = (
        b"\xff\xd8"
        + _seg(0xC0, bytes([12]) + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00")
    )
    with pytest.raises(UnsupportedJPEG, match="12-bit"):
        jpegcodec.decode(jpg12)
    # 16-bit quant table
    with pytest.raises(UnsupportedJPEG, match="quantization"):
        jpegcodec.decode(b"\xff\xd8" + _seg(0xDB, b"\x10" + b"\x00" * 128))
    # not a JPEG / truncated
    with pytest.raises(ValueError):
        jpegcodec.decode(b"nope")
    with pytest.raises(ValueError):
        jpegcodec.decode(b"\xff\xd8" + _seg(0xDB, b"\x00" + b"\x01" * 64)[:-10])


def test_extract_features_real_jpeg_pixels(spark):
    """The production mapInPandas path: a solid-200 JPEG's features
    are 200/255 across the strip — REAL pixels, not the byte-histogram
    stand-in (whose values for this payload differ)."""
    from changedatacapture_reporting_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    jpg = (
        b"\xff\xd8"
        + _dqt_ones()
        + _dht(0, 0, [1] + [0] * 15, b"\x0a")
        + _EOB_AC
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _sos([(1, 0, 0)])
        + _bits("0" + format(576, "010b") + "0")
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id long, blob binary"
    )
    feats = extract_features(df).collect()[0]["features"]
    assert len(feats) == FEATURE_DIM
    assert all(abs(f - 200.0 / 255.0) < 1e-6 for f in feats)