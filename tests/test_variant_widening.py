"""variantType + typeWidening (public Delta table features).

Variant columns (Spark 4 VariantType) round-trip through the engine's
normal staging path — schemaString carries the type, parquet carries
the encoded binary, and no stats are collected over it (what real
engines do for variant).

Type widening: every scan in this engine requests the COMMITTED
schema over the files, so a column widened int→long (etc.) reads
back correctly from pre-widening files with no extra machinery —
Spark's parquet reader upcasts the narrower pages. The tests pin the
exact protocol shapes current writers produce (legacy file + widened
metaData + the feature mark + ``delta.typeChanges`` field metadata)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    read_delta,
    write_delta,
    _resolve_log,
)


def test_variant_column_roundtrip(spark, tmp_path):
    base = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id AS k, "
        "parse_json(concat('{\"n\": ', id, ', \"tag\": \"x\"}')) AS v "
        "FROM range(3)"
    )
    assert isinstance(df.schema["v"].dataType, T.VariantType)
    write_delta(spark, df, base)
    out = read_delta(spark, base)
    assert isinstance(out.schema["v"].dataType, T.VariantType)
    got = sorted(
        (r["k"], r["j"])
        for r in out.select("k", F.to_json("v").alias("j")).collect()
    )
    assert got == [
        (0, '{"n":0,"tag":"x"}'),
        (1, '{"n":1,"tag":"x"}'),
        (2, '{"n":2,"tag":"x"}'),
    ]
    # append + merge-free second write keeps working
    write_delta(
        spark,
        spark.sql(
            "SELECT CAST(9 AS BIGINT) AS k, parse_json('{\"n\": 9}') AS v"
        ),
        base,
    )
    assert read_delta(spark, base).count() == 4


def test_foreign_variant_feature_table(spark, tmp_path):
    """A (3,7)+variantType foreign genesis accepts reads and writes."""
    base = str(tmp_path / "t")
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.VariantType(), True),
        ]
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["variantType"],
                "writerFeatures": ["variantType"],
            }
        },
        {
            "metaData": {
                "id": "t-var",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    with open(base + "/_delta_log/" + "0" * 20 + ".json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    write_delta(
        spark,
        spark.sql(
            "SELECT CAST(1 AS BIGINT) AS k, "
            "parse_json('{\"a\": true}') AS v"
        ),
        base,
    )
    got = read_delta(spark, base).select(
        F.to_json("v").alias("j")
    ).collect()
    assert [r["j"] for r in got] == ['{"a":true}']


def test_type_widening_reads_and_appends(spark, tmp_path):
    """v0: int column + an int32 parquet file. v1: metaData widens it
    to long (delta.typeChanges recorded, feature marked). The engine
    must read BOTH old (int32 pages) and new (int64) files as long,
    and its own appends stage in the widened type."""
    base = str(tmp_path / "t")
    os.makedirs(base + "/_delta_log", exist_ok=True)
    # stage an int32 file by hand
    stage = base + "/_stage"
    spark.createDataFrame([(1,), (2,)], "x int").repartition(1)\
        .write.parquet(stage)
    part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    os.replace(os.path.join(stage, part), base + "/f0.parquet")
    import shutil

    shutil.rmtree(stage)
    narrow = T.StructType([T.StructField("x", T.IntegerType(), True)])
    wide = T.StructType(
        [
            T.StructField(
                "x",
                T.LongType(),
                True,
                {
                    "delta.typeChanges": [
                        {"fromType": "integer", "toType": "long"}
                    ]
                },
            )
        ]
    )

    def meta(s):
        return {
            "metaData": {
                "id": "t-widen",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": s.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        }

    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta(narrow),
        {
            "add": {
                "path": "f0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(base + "/f0.parquet"),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    v1 = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        },
        meta(wide),
    ]
    with open(base + "/_delta_log/" + "0" * 20 + ".json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in v0) + "\n")
    with open(base + f"/_delta_log/{1:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in v1) + "\n")

    out = read_delta(spark, base)
    assert isinstance(out.schema["x"].dataType, T.LongType)
    assert sorted(r["x"] for r in out.collect()) == [1, 2]
    # time travel to v0 reads with the NARROW schema
    out0 = read_delta(spark, base, version=0)
    assert isinstance(out0.schema["x"].dataType, T.IntegerType)

    # engine append in the widened type; both files read together
    assert write_delta(
        spark,
        spark.createDataFrame([(3_000_000_000,)], "x long"),
        base,
    ) == 2
    assert sorted(r["x"] for r in read_delta(spark, base).collect()) == [
        1,
        2,
        3_000_000_000,
    ]
    # skip probes over the widened column stay sound (old file lacks
    # long-typed stats — it has int-valued ones, still orderable)
    got = read_delta(spark, base, skip=[("x", ">", 100)])
    assert sorted(r["x"] for r in got.collect()) == [3_000_000_000]