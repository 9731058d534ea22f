"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode step stubbed (no image/audio libs in this container) but all the
Spark-side plumbing — schema, Arrow batching, partition-local feature
extraction — real and tested.

Pattern at 100 TB: blobs live in the lake as ``binary`` columns (or
pointers); metadata extraction is pure expressions; decode/feature-extract
runs as ``mapInPandas`` so each Arrow batch crosses to Python once and the
operator inherits the scan's partitioning (no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + typed metadata struct.

    Fixtures have no real media, so the payload is the utf-8 encoding of
    the text — the engine treats it as opaque bytes either way.
    """
    blob = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("blob", blob).withColumn(
        "blob_meta",
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            F.lit("text/plain").alias("content_type"),
            F.md5(F.col(text_col)).alias("checksum_md5"),
        ),
    )


def _decode_png_features(payload: bytes) -> list[float]:
    """REAL decode for PNG payloads (stdlib codec, operators.pngcodec):
    pixels → luminance → nearest-resample to a FEATURE_DIM strip →
    [0,1] floats. Raises on anything the codec refuses; callers fall
    through to the stand-in."""
    import numpy as np

    from changedatacapture_reporting_spark.operators import pngcodec

    grey = pngcodec.to_grey(pngcodec.decode(payload))
    strip = pngcodec.resize_nearest(grey, FEATURE_DIM, 1)
    return (
        strip.reshape(-1).astype("float32") / np.float32(255.0)
    ).tolist()


def _decode_gif_features(payload: bytes) -> list[float]:
    """REAL decode for GIF payloads (stdlib codec, operators.gifcodec):
    first composited frame → luminance → FEATURE_DIM strip, the same
    feature convention as the PNG path."""
    import numpy as np

    from changedatacapture_reporting_spark.operators import (
        gifcodec,
        pngcodec,
    )

    grey = pngcodec.to_grey(gifcodec.decode(payload))
    strip = pngcodec.resize_nearest(grey, FEATURE_DIM, 1)
    return (
        strip.reshape(-1).astype("float32") / np.float32(255.0)
    ).tolist()


def _decode_jpeg_features(payload: bytes) -> list[float]:
    """REAL decode for baseline JPEG payloads (stdlib+numpy codec,
    operators.jpegcodec): pixels → luminance → FEATURE_DIM strip, the
    same feature convention as the PNG/GIF paths. Non-baseline JPEGs
    (progressive, 12-bit, arithmetic) raise and fall through to the
    stand-in — never a misdecode."""
    import numpy as np

    from changedatacapture_reporting_spark.operators import (
        jpegcodec,
        pngcodec,
    )

    grey = pngcodec.to_grey(jpegcodec.decode(payload))
    strip = pngcodec.resize_nearest(grey, FEATURE_DIM, 1)
    return (
        strip.reshape(-1).astype("float32") / np.float32(255.0)
    ).tolist()


def _decode_wav_features(payload: bytes) -> list[float]:
    """REAL decode for WAV payloads (stdlib codec, operators.wavcodec):
    PCM samples → [rms, zero-crossing rate, spectral band energies]."""
    from changedatacapture_reporting_spark.operators import wavcodec

    samples, rate = wavcodec.decode(payload)
    return wavcodec.features(samples, rate, FEATURE_DIM)


def _make_decoder():
    """Capability probe, best-real-decoder-first: the stdlib codecs for
    the formats they pin exactly — WAV audio (operators.wavcodec),
    PNG / GIF / baseline-JPEG pixels (operators.pngcodec / gifcodec /
    jpegcodec) — then PIL when importable (any other image format),
    then the deterministic byte-histogram stand-in. Returned as a
    closure so the probe runs once per Python worker, not once per
    batch."""
    from changedatacapture_reporting_spark.operators import (
        gifcodec,
        jpegcodec,
        pngcodec,
        wavcodec,
    )

    try:
        import io

        import numpy as np
        from PIL import Image

        def _decode_pil(payload: bytes) -> list[float]:
            if wavcodec.is_wav(payload):  # PIL does images, not audio
                try:
                    return _decode_wav_features(payload)
                except Exception:
                    return _decode_fake(payload)
            try:
                img = Image.open(io.BytesIO(payload)).convert("L")
            except Exception:
                # payload isn't a decodable image (e.g. text fixtures) —
                # fall through to the byte-histogram stand-in so mixed
                # corpora don't poison the whole Arrow batch
                return _decode_fake(payload)
            img = img.resize((FEATURE_DIM, 1))
            arr = np.asarray(img, dtype="float32") / 255.0
            return arr.reshape(-1).tolist()

        return _decode_pil
    except ImportError:
        pass

    def _decode_stdlib(payload: bytes) -> list[float]:
        try:
            if pngcodec.is_png(payload):
                return _decode_png_features(payload)
            if gifcodec.is_gif(payload):
                return _decode_gif_features(payload)
            if jpegcodec.is_jpeg(payload):
                return _decode_jpeg_features(payload)
            if wavcodec.is_wav(payload):
                return _decode_wav_features(payload)
        except Exception:
            pass  # corrupt/out-of-scope payload — stand-in, never a guess
        return _decode_fake(payload)

    return _decode_stdlib


def _decode_fake(payload: bytes) -> list[float]:
    """Deterministic stand-in decode: byte-histogram features. Keeps the
    plumbing (batch shape, schema, numpy vectorization) production-real."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    bins = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
    return (bins / arr.size).astype("float32").tolist()


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    decoder: str = "auto",
) -> DataFrame:
    """Partition-local feature extraction over Arrow batches.

    ``mapInPandas`` = one Python worker round-trip per Arrow batch, not per
    row; no shuffle — output co-partitioned with input. ``decoder="auto"``
    capability-probes for PIL and falls back to the deterministic fake
    decoder when media libs are absent (import-try per the environment
    contract); ``decoder="fake"`` pins the byte-histogram stand-in — used
    by contracts that must stay bit-stable across environments.
    """
    decode = _decode_fake if decoder == "fake" else _make_decoder()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[blob_col].map(len),
                    "features": pdf[blob_col].map(decode),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image resize over Arrow batches.

    Real path: PIL when importable (every format); else the stdlib PNG
    codec (operators.pngcodec) decodes → nearest-neighbor resizes →
    re-encodes PNG payloads with REAL pixels. The deterministic
    stand-in strided-samples the payload bytes down to exactly
    ``width*height`` bytes, and also catches payloads no decoder
    handles. Either way the production contract holds: fixed-size
    output per row, one row per input row, no shuffle, partition-local.
    """
    n_out = width * height

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def _resize_sample(payload: bytes) -> bytes:
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                return bytes(n_out)
            idx = np.linspace(0, arr.size - 1, n_out).astype(np.int64)
            return arr[idx].tobytes()

        try:
            import io

            from PIL import Image

            def _resize(payload: bytes) -> bytes:
                try:
                    img = Image.open(io.BytesIO(payload))
                except Exception:
                    return _resize_sample(payload)
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
                return out.getvalue()

        except ImportError:
            from changedatacapture_reporting_spark.operators import (
                pngcodec,
            )

            def _resize(payload: bytes) -> bytes:
                if pngcodec.is_png(payload):
                    try:
                        px = pngcodec.decode(payload)
                        if px.shape[2] in (2, 4):  # drop alpha plane
                            px = px[:, :, : px.shape[2] - 1]
                        return pngcodec.encode(
                            pngcodec.resize_nearest(px, width, height)
                        )
                    except Exception:
                        return _resize_sample(payload)
                return _resize_sample(payload)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "resized": pdf[blob_col].map(_resize),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_nth: int = 4,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling over Arrow batches: 1 input row → N output
    rows (every ``every_nth`` frame), the row-expanding mapInPandas shape
    a video pipeline needs.

    REAL path (r14): an animated GIF payload decodes to its composited
    frames (stdlib operators.gifcodec), each sampled frame re-encoded
    as a PNG via operators.pngcodec — real pixels end to end, no media
    libs. Everything else keeps the deterministic stand-in (a "frame"
    is a ``frame_bytes``-sized chunk of the payload; ffmpeg-class
    container decode stays out of scope).

    Output stays partition-local (no shuffle); downstream per-frame
    feature extraction chains another mapInPandas on the same partitions.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from changedatacapture_reporting_spark.operators import (
            gifcodec,
            pngcodec,
        )

        def _frames(payload: bytes) -> list[tuple[int, bytes]]:
            if gifcodec.is_gif(payload):
                try:
                    decoded = gifcodec.decode_frames(payload)
                    return [
                        (i, pngcodec.encode(f))
                        for i, f in enumerate(decoded)
                        if i % every_nth == 0
                    ]
                except Exception:
                    pass  # out-of-scope GIF — stand-in, never a guess
            chunks = [
                payload[i : i + frame_bytes]
                for i in range(0, len(payload), frame_bytes)
            ]
            return [
                (i, c) for i, c in enumerate(chunks) if i % every_nth == 0
            ]

        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf[id_col], pdf[blob_col]):
                for i, c in _frames(payload):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(c)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, blob_col).mapInPandas(run, FRAMES_SCHEMA)
