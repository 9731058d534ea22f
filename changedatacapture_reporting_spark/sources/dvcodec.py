"""Binary deletion-vector codec — the PUBLIC Delta protocol's on-disk
deletion-vector format, implemented from the spec (PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format" sections) so this engine
both READS vectors written by current Delta writers and WRITES vectors
those writers can read back.

Layers, outermost in:

1. **DV file** (``storageType='u'``/``'p'``): one byte format-version
   (``1``), then per stored vector ``[size: int32 BE][blob][crc32(blob):
   int32 BE]``. A descriptor's ``offset`` points at the size word;
   ``sizeInBytes`` is ``len(blob)``.
2. **blob**: 4-byte little-endian magic ``1681511377`` followed by a
   64-bit RoaringBitmapArray in the *portable* serialization — the
   format shared with RoaringBitmap's ``Roaring64NavigableMap``:
   ``[numBitmaps: int64 LE]`` then, ascending by key, ``[key: int32 LE]
   [32-bit RoaringBitmap, standard portable format]`` where a row index
   ``i`` lives in bitmap ``i >> 32`` at value ``i & 0xFFFFFFFF``.
3. **32-bit RoaringBitmap** (RoaringFormatSpec): cookie ``12346``
   (no run containers; ``[cookie: i32 LE][numContainers: i32 LE]``) or
   ``12347`` (``cookie | (n-1) << 16`` plus a run-flag bitset);
   descriptive header ``[key: u16 LE][cardinality-1: u16 LE]`` per
   container; an offset header (``i32 LE`` per container, from stream
   start) when cookie is 12346 or there are ≥4 containers; then the
   containers — sorted ``u16`` arrays (card ≤ 4096), 1024×``u64 LE``
   bitsets (card > 4096), or ``[numRuns: u16][start: u16, len-1: u16]*``
   runs.
4. **Z85** (ZeroMQ RFC 32): the descriptor's ``pathOrInlineDv`` carries
   a 16-byte UUID (``storageType='u'``) or the whole blob
   (``storageType='i'``) in this base-85 alphabet, 4 bytes → 5 chars
   big-endian.

The encoder emits only array/bitset containers (cookie 12346 — always
valid); the decoder accepts all three container kinds, either cookie,
and tolerates/skips the offset header. Everything is stdlib-only so it
runs identically driver-side and inside Arrow-batched UDFs.

Reference behavior modeled on the reference engine's changelog delete
semantics (populate:371 'DELETED RECORD' rows never resurface); the
binary format itself is the public Delta spec's.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377  # Delta DV blob magic, little-endian
FILE_FORMAT_VERSION = 1
SERIAL_COOKIE_NO_RUNS = 12346
SERIAL_COOKIE_RUNS = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (length must be a multiple of 4)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not divisible by 4")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Decode a Z85 string (length must be a multiple of 5)."""
    if len(text) % 5:
        raise ValueError(f"z85 input length {len(text)} not divisible by 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid z85 character {ch!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError(f"z85 group {text[i:i + 5]!r} overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


def encode_uuid(u: _uuid.UUID) -> str:
    """UUID → the 20-char Z85 form ``pathOrInlineDv`` carries."""
    return z85_encode(u.bytes)


def decode_uuid(text: str) -> _uuid.UUID:
    return _uuid.UUID(bytes=z85_decode(text))


# --- 32-bit RoaringBitmap (standard portable format) -------------------


def _serialize_rb32(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 ``values`` with cookie 12346
    (array + bitset containers only — the always-valid encoding; run
    containers are an optional compression real encoders may or may not
    pick, so interop never requires emitting them)."""
    containers: list[tuple[int, list[int]]] = []
    cur_key = None
    cur: list[int] = []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur:
        containers.append((cur_key, cur))

    n = len(containers)
    head = struct.pack("<ii", SERIAL_COOKIE_NO_RUNS, n)
    desc = b"".join(
        struct.pack("<HH", k, len(vals) - 1) for k, vals in containers
    )
    # container payloads + offsets (from the start of this bitmap)
    payloads: list[bytes] = []
    for _, vals in containers:
        if len(vals) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
    base = len(head) + len(desc) + 4 * n
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    off = struct.pack(f"<{n}i", *offsets) if n else b""
    return head + desc + off + b"".join(payloads)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit RoaringBitmap at ``buf[pos:]``; returns
    (sorted values, next position). Accepts both cookies and all three
    container kinds."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE_RUNS:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
    elif cookie == SERIAL_COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
    else:
        raise ValueError(f"not a RoaringBitmap: cookie {cookie}")

    keys_cards = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((k, cm1 + 1))
    has_offsets = (cookie == SERIAL_COOKIE_NO_RUNS) or (
        n >= _NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        pos += 4 * n  # sequential parse — the offset header is a skip

    out: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        hi = k << 16
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(hi | start, (hi | start) + lm1 + 1))
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                base = hi | (wi << 6)
                while w:
                    b = w & -w
                    out.append(base | b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in vals)
    return out, pos


# --- 64-bit RoaringBitmapArray (portable) + DV blob ---------------------


def serialize_blob(indexes) -> bytes:
    """Row indexes (iterable of int64 ≥ 0) → DV blob (magic + portable
    64-bit RoaringBitmapArray). Deterministic: sorted, deduplicated."""
    xs = sorted(set(int(i) for i in indexes))
    if xs and xs[0] < 0:
        raise ValueError("negative row index")
    buckets: list[tuple[int, list[int]]] = []
    cur_key = None
    cur: list[int] = []
    for v in xs:
        k = v >> 32
        if k != cur_key:
            if cur:
                buckets.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFFFFFF)
    if cur:
        buckets.append((cur_key, cur))
    parts = [struct.pack("<i", MAGIC), struct.pack("<q", len(buckets))]
    for k, vals in buckets:
        parts.append(struct.pack("<i", k))
        parts.append(_serialize_rb32(vals))
    return b"".join(parts)


def deserialize_blob(blob: bytes) -> list[int]:
    """DV blob → sorted row indexes; refuses a wrong magic (a silent
    misparse would resurrect or over-delete rows)."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)} B)")
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {magic} (expected {MAGIC})"
        )
    (n,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", blob, pos)
        pos += 4
        vals, pos = _deserialize_rb32(blob, pos)
        hi = key << 32
        out.extend(hi | v for v in vals)
    return out


def blob_cardinality(blob: bytes) -> int:
    """Total CLAIMED cardinality of a DV blob, summed from its
    container descriptive headers alone — O(containers) work and zero
    per-row expansion, so the driver can sanity-check a descriptor's
    ``cardinality`` field against the compact bytes before any job
    launches (the executor-side decode re-verifies against the
    actually-decoded length; see delta_table._spec_dv_entries)."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)} B)")
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {magic} (expected {MAGIC})"
        )
    (n,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    total = 0
    for _ in range(n):
        pos += 4  # bitmap key
        (cookie,) = struct.unpack_from("<i", blob, pos)
        run_flags = b""
        if (cookie & 0xFFFF) == SERIAL_COOKIE_RUNS:
            nc = ((cookie >> 16) & 0xFFFF) + 1
            pos += 4
            nbytes = (nc + 7) // 8
            run_flags = blob[pos : pos + nbytes]
            pos += nbytes
        elif cookie == SERIAL_COOKIE_NO_RUNS:
            (nc,) = struct.unpack_from("<i", blob, pos + 4)
            pos += 8
        else:
            raise ValueError(f"not a RoaringBitmap: cookie {cookie}")
        cards = []
        for i in range(nc):
            _, cm1 = struct.unpack_from("<HH", blob, pos)
            pos += 4
            cards.append(cm1 + 1)
        if (cookie == SERIAL_COOKIE_NO_RUNS) or (
            nc >= _NO_OFFSET_THRESHOLD
        ):
            pos += 4 * nc  # offset header — skip
        for i, card in enumerate(cards):
            is_run = bool(run_flags) and bool(
                run_flags[i // 8] & (1 << (i % 8))
            )
            if is_run:
                (n_runs,) = struct.unpack_from("<H", blob, pos)
                pos += 2 + 4 * n_runs
            elif card > _ARRAY_MAX:
                pos += 8192
            else:
                pos += 2 * card
            total += card
    return total


# --- DV file framing ----------------------------------------------------


def pack_file(blobs: list[bytes]) -> tuple[bytes, list[tuple[int, int]]]:
    """Assemble one on-disk DV file from ``blobs``; returns
    (file bytes, [(offset, sizeInBytes)] per blob) — the offsets go in
    the add actions' descriptors."""
    parts = [bytes([FILE_FORMAT_VERSION])]
    spans: list[tuple[int, int]] = []
    pos = 1
    for blob in blobs:
        spans.append((pos, len(blob)))
        parts.append(struct.pack(">i", len(blob)))
        parts.append(blob)
        parts.append(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
        pos += 4 + len(blob) + 4
    return b"".join(parts), spans


def unpack_at(data: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract + checksum-verify one blob from DV-file bytes. The size
    word and CRC are both verified — a truncated or corrupt vector must
    refuse, not resurrect rows."""
    (stored,) = struct.unpack_from(">i", data, offset)
    if stored != size_in_bytes:
        raise ValueError(
            f"DV size mismatch at offset {offset}: file says {stored}, "
            f"descriptor says {size_in_bytes}"
        )
    start = offset + 4
    blob = data[start : start + size_in_bytes]
    if len(blob) != size_in_bytes:
        raise ValueError("DV file truncated")
    (crc,) = struct.unpack_from(">I", data, start + size_in_bytes)
    if (zlib.crc32(blob) & 0xFFFFFFFF) != crc:
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return blob


def dv_relative_path(path_or_inline: str) -> str:
    """``storageType='u'`` descriptor → table-relative file path. The
    last 20 chars are the Z85 UUID; anything before is the random
    prefix directory."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"pathOrInlineDv too short for a UUID: {path_or_inline!r}"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    name = f"deletion_vector_{decode_uuid(enc)}.bin"
    prefix = prefix.strip("/")
    return f"{prefix}/{name}" if prefix else name


def descriptor_indexes(dv: dict, file_bytes: bytes | None) -> list[int]:
    """Decode a spec descriptor into row indexes. ``file_bytes`` is the
    DV file's content for on-disk storage types (None for inline)."""
    st = dv.get("storageType")
    if st == "i":
        raw = z85_decode(dv["pathOrInlineDv"])
        size = int(dv["sizeInBytes"])
        # encoders pad the blob to a 4-byte multiple before Z85; the
        # descriptor's sizeInBytes recovers the true length
        if len(raw) < size or len(raw) - size >= 4:
            raise ValueError(
                f"inline DV decodes to {len(raw)} bytes; descriptor "
                f"says {size}"
            )
        return deserialize_blob(raw[:size])
    if st in ("u", "p"):
        if file_bytes is None:
            raise ValueError(f"storageType {st!r} needs file bytes")
        off = dv.get("offset")
        blob = unpack_at(
            file_bytes,
            1 if off is None else int(off),
            int(dv["sizeInBytes"]),
        )
        return deserialize_blob(blob)
    raise ValueError(f"unknown deletion-vector storageType {st!r}")
