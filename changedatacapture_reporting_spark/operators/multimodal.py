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


def _decode_real(payload: bytes) -> list[float]:
    """Real decoder — requires media libs not present in this container."""
    raise NotImplementedError(
        "image/audio decode requires PIL/torchaudio; not available here"
    )


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
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Partition-local feature extraction over Arrow batches.

    ``mapInPandas`` = one Python worker round-trip per Arrow batch, not per
    row; no shuffle — output co-partitioned with input. Falls back to the
    deterministic fake decoder when media libs are absent (import-try per
    the environment contract).
    """
    try:
        import PIL  # noqa: F401

        decode = _decode_real
    except ImportError:
        decode = _decode_fake

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
