"""Stdlib+numpy BASELINE JPEG decoder — real pixels for the third
image format after PNG (operators.pngcodec) and GIF
(operators.gifcodec), same exact-or-refuse posture: implemented from
the public ITU-T T.81 / JFIF specifications, and anything outside
baseline sequential Huffman (progressive SOF2, arithmetic coding,
12-bit precision, unknown component layouts) raises
``UnsupportedJPEG`` so callers fall back to the deterministic stand-in
rather than ever mis-decoding.

Supported: SOF0/SOF1 (baseline + extended sequential, Huffman, 8-bit),
grayscale and 3-component YCbCr with any 1–2× subsampling grid (4:4:4,
4:2:2, 4:2:0, …), restart markers (DRI/RSTn with DC-predictor reset),
0xFF00 byte stuffing, multi-table DQT/DHT segments.

Decode shape: Huffman entropy decode per 8×8 block (DC category +
difference, AC run/size with EOB/ZRL), dequantize against the zigzag
quant table, orthonormal 8×8 IDCT as two numpy matrix multiplies,
level shift, nearest-neighbor chroma upsample, JFIF YCbCr→RGB. The
per-block loop is driver/worker-side Python — right for the
thumbnail-scale feature extraction it feeds (operators.multimodal),
not a media pipeline.

Reference parity: multimodal blob columns are an extension surface
(SURVEY.md §2.13); the reference procs (populate:1-80, query:1-60)
have no media path.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJPEG(ValueError):
    """Valid-looking JPEG using features outside baseline Huffman —
    refuse loudly, never guess pixels."""


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# zigzag index -> (row, col) in the 8x8 block, per T.81 Figure 5
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8x8 DCT basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_huffman(counts: list[int], values: bytes) -> dict:
    """Canonical Huffman per T.81 Annex C: {(length, code): value}."""
    table: dict = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    0xFF00, surfaces RSTn markers as events, stops at any other
    marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # past the segment: pad with 1s (T.81 F.2.2.5 allows
                # padding; a decode that RELIES on it past EOB is a
                # truncated stream and will fail the block loop)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
                self.marker = nxt  # RSTn / EOI / next segment
                continue
            self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> int:
        """Consume the pending RSTn marker (byte-aligns the stream);
        returns n. Raises if the pending marker is not a restart."""
        self.bits = 0
        self.nbits = 0
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError(
                f"expected restart marker, found {m!r}"
            )
        self.pos += 2  # the 0xFF <m> pair _fill stopped at
        self.marker = None
        return m - 0xD0


def _extend(v: int, s: int) -> int:
    """DC/AC difference decoding (T.81 F.2.2.1): an s-bit value below
    2^(s-1) encodes a negative number."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, pred: int, q: np.ndarray
) -> tuple[np.ndarray, int]:
    """One 8×8 block: entropy decode (zigzag), dequantize, IDCT.
    Returns (spatial block float array pre-level-shift, new DC pred)."""
    coefs = np.zeros(64, dtype=np.int32)
    s = reader.decode_huffman(dc_tab)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    diff = _extend(reader.read_bits(s), s)
    pred += diff
    coefs[0] = pred
    k = 1
    while k < 64:
        rs = reader.decode_huffman(ac_tab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coefs[k] = _extend(reader.read_bits(size), size)
        k += 1
    freq = np.zeros(64, dtype=np.float64)
    freq[_ZIGZAG] = coefs * q  # un-zigzag the dequantized coefficients
    block = _A.T @ freq.reshape(8, 8) @ _A
    return block, pred


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array of shape (height, width, channels),
    channels 1 (grayscale) or 3 (RGB)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        nxt = pos + 2 + seg_len

        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise UnsupportedJPEG("16-bit quantization table")
                qtables[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int32)
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                values = body[b + 17 : b + 17 + n]
                tab = _build_huffman(counts, values)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                b += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            precision = body[0]
            if precision != 8:
                raise UnsupportedJPEG(f"{precision}-bit precision")
            h_img, w_img = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise UnsupportedJPEG(f"{ncomp}-component frame")
            comps = []
            for c in range(ncomp):
                cid = body[6 + c * 3]
                hv = body[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + c * 3]))
            frame = (h_img, w_img, comps)
        elif marker == 0xC2:
            raise UnsupportedJPEG("progressive JPEG (SOF2)")
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise UnsupportedJPEG(
                f"SOF marker 0x{marker:02X} (non-baseline coding)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid = body[1 + c * 2]
                tt = body[2 + c * 2]
                sel[cid] = (tt >> 4, tt & 0x0F)
            scan = (sel, nxt)
            break
        # APPn / COM / anything else: skip
        pos = nxt

    if frame is None or scan is None:
        raise ValueError("JPEG has no frame/scan")
    h_img, w_img, comps = frame
    if h_img == 0 or w_img == 0:
        raise ValueError("zero-sized JPEG frame")
    sel, entropy_pos = scan

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1 or any(
        h < 1 or v < 1 for _, h, v, _ in comps
    ):
        raise UnsupportedJPEG(f"sampling grid {hmax}x{vmax}")
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    planes = {
        cid: np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64)
        for cid, h, v, _ in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(data, entropy_pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.restart()
                preds = {cid: 0 for cid, *_ in comps}
            for cid, h, v, tq in comps:
                if cid not in sel:
                    raise ValueError(
                        f"scan selects no tables for component {cid}"
                    )
                td, ta = sel[cid]
                if td not in dc_tabs or ta not in ac_tabs:
                    raise ValueError("scan references undefined DHT")
                if tq not in qtables:
                    raise ValueError("frame references undefined DQT")
                for by in range(v):
                    for bx in range(h):
                        block, preds[cid] = _decode_block(
                            reader,
                            dc_tabs[td],
                            ac_tabs[ta],
                            preds[cid],
                            qtables[tq],
                        )
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # level shift, upsample to full resolution, crop
    full = []
    for cid, h, v, _ in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:h_img, :w_img])

    if len(full) == 1:
        grey = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return grey[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
