"""Stdlib GIF decoder: pixels verified against INDEPENDENTLY hand-built
GIF bytes — the LZW streams are bit-packed by a tiny forward packer in
this test (clear-code-per-pixel form, plus one hand-computed
width-growth stream), so the decoder cannot self-verify. Covers
palettes, interlace, transparency + animation compositing, and the
refusal surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from changedatacapture_reporting_spark.operators import gifcodec

PALETTE = [
    (0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
]  # 4 entries → min code size 2, clear=4, end=5


def _pack_codes(codes_with_width):
    """LSB-first GIF bit packing, forward-written."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes_with_width:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _lzw_plain(pixels, mcs=2) -> bytes:
    """Independent encoder: CLEAR before every pixel keeps the decoder
    table from ever growing — every code is width mcs+1."""
    clear, end, w = 1 << mcs, (1 << mcs) + 1, mcs + 1
    codes = []
    for p in pixels:
        codes.append((clear, w))
        codes.append((p, w))
    codes.append((end, w))
    return _pack_codes(codes)


def _gif(w, h, image_blocks, gct=PALETTE, header=b"GIF89a", bg=0):
    flags = 0x80 | 0x01  # GCT present, size 2<<1 = 4 entries
    out = bytearray(header)
    out += struct.pack("<HHBBB", w, h, flags, bg, 0)
    for r, g, b in gct:
        out += bytes((r, g, b))
    for blk in image_blocks:
        out += blk
    out += b"\x3b"
    return bytes(out)


def _image_block(left, top, iw, ih, lzw, mcs=2, interlaced=False):
    flags = 0x40 if interlaced else 0x00
    return (
        b"\x2c"
        + struct.pack("<HHHHB", left, top, iw, ih, flags)
        + bytes([mcs])
        + _subblocks(lzw)
    )


def _gce(disposal=0, transparent=None):
    gflags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return (
        b"\x21\xf9\x04"
        + bytes([gflags, 0, 0, transparent or 0])
        + b"\x00"
    )


def test_decode_2x2_hand_built():
    px = [0, 1, 2, 3]
    data = _gif(2, 2, [_image_block(0, 0, 2, 2, _lzw_plain(px))])
    assert gifcodec.is_gif(data)
    img = gifcodec.decode(data)
    assert img.shape == (2, 2, 3)
    want = np.array(PALETTE, dtype=np.uint8)[np.array(px)].reshape(2, 2, 3)
    np.testing.assert_array_equal(img, want)


def test_lzw_width_growth_hand_computed():
    """A REAL compressed stream (hand-computed greedy LZW for pixels
    [0,1,0,1,1]): codes [clear,0,1,6] read at width 3, then [1,end] at
    width 4 after the decoder's table hits 8 entries — pins the
    variable-width growth path the clear-per-pixel fixtures bypass."""
    lzw = _pack_codes(
        [(4, 3), (0, 3), (1, 3), (6, 3), (1, 4), (5, 4)]
    )
    data = _gif(5, 1, [_image_block(0, 0, 5, 1, lzw)])
    img = gifcodec.decode(data)
    want = np.array(PALETTE, dtype=np.uint8)[
        np.array([0, 1, 0, 1, 1])
    ].reshape(1, 5, 3)
    np.testing.assert_array_equal(img, want)


def test_interlaced_rows_restore():
    """1x4 interlaced image: stored row order is [0,2,1,3] — the
    decoder must put canvas rows back in display order."""
    stored = [0, 2, 1, 3]  # row r of the canvas holds palette index r
    data = _gif(
        1, 4,
        [_image_block(0, 0, 1, 4, _lzw_plain(stored), interlaced=True)],
    )
    img = gifcodec.decode(data)
    for row in range(4):
        np.testing.assert_array_equal(
            img[row, 0], np.array(PALETTE[row], dtype=np.uint8)
        )


def test_animation_compositing_with_transparency():
    """Frame 1 paints the full 2x2; frame 2 overlays the top row with
    [transparent, green] — the composited second frame keeps frame 1's
    pixel under the transparent index."""
    f1 = _image_block(0, 0, 2, 2, _lzw_plain([1, 1, 3, 3]))
    f2 = _gce(transparent=0) + _image_block(
        0, 0, 2, 1, _lzw_plain([0, 2])
    )
    data = _gif(2, 2, [f1, f2])
    frames = gifcodec.decode_frames(data)
    assert len(frames) == 2
    np.testing.assert_array_equal(
        frames[0][0], np.array([PALETTE[1], PALETTE[1]], dtype=np.uint8)
    )
    np.testing.assert_array_equal(
        frames[1][0], np.array([PALETTE[1], PALETTE[2]], dtype=np.uint8)
    )
    np.testing.assert_array_equal(frames[1][1], frames[0][1])


def test_refusals():
    with pytest.raises(gifcodec.UnsupportedGIF, match="GIF87a"):
        gifcodec.decode(b"NOTAGIF" + b"\x00" * 20)
    ok = _gif(2, 2, [_image_block(0, 0, 2, 2, _lzw_plain([0, 1, 2, 3]))])
    with pytest.raises(gifcodec.UnsupportedGIF, match="truncated"):
        gifcodec.decode(ok[:-6])
    # disposal mode 3 refuses rather than guessing pixels
    blk = _gce(disposal=3) + _image_block(
        0, 0, 2, 2, _lzw_plain([0, 1, 2, 3])
    )
    with pytest.raises(gifcodec.UnsupportedGIF, match="disposal"):
        gifcodec.decode(_gif(2, 2, [blk]))
    # frame rectangle beyond the canvas
    blk = _image_block(1, 1, 2, 2, _lzw_plain([0, 1, 2, 3]))
    with pytest.raises(gifcodec.UnsupportedGIF, match="canvas"):
        gifcodec.decode(_gif(2, 2, [blk]))


def test_sample_frames_decodes_real_gif_frames(spark):
    """The production row-expanding mapInPandas path: an animated GIF
    yields PNG-encoded REAL frames (decodable by the stdlib PNG codec),
    not byte chunks."""
    from changedatacapture_reporting_spark.operators import pngcodec
    from changedatacapture_reporting_spark.operators.multimodal import (
        sample_frames,
    )

    f1 = _image_block(0, 0, 2, 2, _lzw_plain([1, 1, 3, 3]))
    f2 = _gce(transparent=0) + _image_block(
        0, 0, 2, 1, _lzw_plain([0, 2])
    )
    payload = _gif(2, 2, [f1, f2])
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, blob binary"
    )
    rows = sorted(
        sample_frames(df, every_nth=1).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1]
    px0 = pngcodec.decode(bytes(rows[0]["frame"]))
    np.testing.assert_array_equal(
        px0[0, 0], np.array(PALETTE[1], dtype=np.uint8)
    )
    px1 = pngcodec.decode(bytes(rows[1]["frame"]))
    np.testing.assert_array_equal(
        px1[0, 1], np.array(PALETTE[2], dtype=np.uint8)
    )
