"""timestampNtz + vacuumProtocolCheck (public Delta table features).

TIMESTAMP_NTZ columns (no-timezone semantics — a non-supporting reader
would misread them as instants) now read and write natively: engine-
created tables carrying the type mark the protocol themselves, foreign
(3,7)+timestampNtz tables stop refusing.

vacuumProtocolCheck codifies what r14 made load-bearing in
vacuum_delta: the per-version resolve loop tolerates ValueError for
versions vacuumed behind a checkpoint, so WITHOUT a head protocol
check an unsupported table protocol would fail every resolution,
leave ``referenced`` empty, and the delete loop would destroy every
aged data file of a table this engine cannot even read. The head
check (read + write protocol, uncaught) closes that hole for all
tables and satisfies the feature's demand."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    read_delta,
    vacuum_delta,
    write_delta,
    _resolve_log,
)


def _ntz_df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp_ntz"
    )


def test_ntz_table_created_marked_and_roundtrips(spark, tmp_path):
    base = str(tmp_path / "t")
    df = _ntz_df(
        spark,
        [
            (1, dt.datetime(2024, 1, 1, 12, 0)),
            (2, dt.datetime(2024, 6, 1, 0, 30)),
        ],
    )
    write_delta(spark, df, base)
    proto = _resolve_log(spark, base, None)["protocol"]
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "timestampNtz" in proto["readerFeatures"]
    assert "timestampNtz" in proto["writerFeatures"]
    # legacy-implied features ride the upgrade
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])

    out = read_delta(spark, base)
    assert isinstance(out.schema["ts"].dataType, T.TimestampNTZType)
    assert sorted((r["k"], r["ts"]) for r in out.collect()) == [
        (1, dt.datetime(2024, 1, 1, 12, 0)),
        (2, dt.datetime(2024, 6, 1, 0, 30)),
    ]
    # appends keep working against the feature protocol this engine
    # wrote; no second protocol action
    write_delta(spark, _ntz_df(spark, [(3, dt.datetime(2025, 1, 1))]), base)
    assert read_delta(spark, base).count() == 3


def test_ntz_skip_probe(spark, tmp_path):
    """Stats-based skipping over the NTZ column stays sound (ISO-8601
    stats strings order lexicographically = temporally)."""
    base = str(tmp_path / "t")
    write_delta(
        spark,
        _ntz_df(spark, [(1, dt.datetime(2024, 1, 1))]),
        base,
    )
    write_delta(
        spark,
        _ntz_df(spark, [(2, dt.datetime(2025, 1, 1))]),
        base,
    )
    got = read_delta(
        spark, base, skip=[("ts", ">", dt.datetime(2024, 6, 1))]
    )
    assert [r["k"] for r in got.collect()] == [2]


def test_ntz_evolution_marks_protocol(spark, tmp_path):
    base = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1,)], "k long"), base
    )
    assert _resolve_log(spark, base, None)["protocol"][
        "minWriterVersion"
    ] == 2
    write_delta(
        spark,
        _ntz_df(spark, [(2, dt.datetime(2024, 3, 3))]),
        base,
        merge_schema=True,
    )
    proto = _resolve_log(spark, base, None)["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "timestampNtz" in proto["readerFeatures"]
    rows = sorted(
        (r["k"], r["ts"]) for r in read_delta(spark, base).collect()
    )
    assert rows == [(1, None), (2, dt.datetime(2024, 3, 3))]


def test_foreign_ntz_table_reads_and_writes(spark, tmp_path):
    """A (3,7)+timestampNtz foreign genesis (schemaString carries
    timestamp_ntz) accepts this engine's reads and appends."""
    base = str(tmp_path / "t")
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("ts", T.TimestampNTZType(), True),
        ]
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        },
        {
            "metaData": {
                "id": "t-ntz",
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
        spark, _ntz_df(spark, [(1, dt.datetime(2024, 2, 2, 8))]), base
    )
    out = read_delta(spark, base)
    assert isinstance(out.schema["ts"].dataType, T.TimestampNTZType)
    assert out.count() == 1


def _rewrite_protocol(base, protocol):
    log = base + "/_delta_log"
    cname = "0" * 20 + ".json"
    out = []
    for line in open(os.path.join(log, cname)).read().splitlines():
        d = json.loads(line)
        if "protocol" in d:
            d["protocol"] = protocol
        out.append(json.dumps(d))
    os.remove(os.path.join(log, cname))
    crc = os.path.join(log, f".{cname}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with open(os.path.join(log, cname), "w") as f:
        f.write("\n".join(out) + "\n")


def test_vacuum_refuses_unsupported_protocol(spark, tmp_path):
    """The data-destruction hole closed in r14: a table whose protocol
    this engine cannot read must REFUSE vacuum — before the head
    check, every per-version resolve raised, ``referenced`` stayed
    empty, and vacuum(orphan_min_age_minutes=0) would have deleted
    every data file of the table."""
    base = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1,)], "k long"), base
    )
    data_files = [
        f for f in os.listdir(base) if f.endswith(".parquet")
    ]
    assert data_files
    _rewrite_protocol(
        base,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["someFutureFeature"],
            "writerFeatures": ["someFutureFeature"],
        },
    )
    with pytest.raises(ValueError, match="someFutureFeature"):
        vacuum_delta(spark, base, orphan_min_age_minutes=0)
    # nothing was deleted
    assert all(os.path.exists(os.path.join(base, f)) for f in data_files)


def test_vacuum_refuses_unsupported_writer_feature(spark, tmp_path):
    """vacuumProtocolCheck's specific demand: deleting files is
    writer-class work, so an unsupported WRITER feature refuses the
    vacuum even though reads are fine."""
    base = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1,)], "k long"), base
    )
    _rewrite_protocol(
        base,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["vacuumProtocolCheck"],
            "writerFeatures": ["vacuumProtocolCheck", "someWriterThing"],
        },
    )
    assert read_delta(spark, base).count() == 1  # reads stay fine
    with pytest.raises(ValueError, match="someWriterThing"):
        vacuum_delta(spark, base, orphan_min_age_minutes=0)


def test_vacuum_works_with_vacuum_protocol_check_marked(spark, tmp_path):
    base = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1,)], "k long"), base
    )
    write_delta(
        spark,
        spark.createDataFrame([(2,)], "k long"),
        base,
        mode="overwrite",
    )
    _rewrite_protocol(
        base,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["vacuumProtocolCheck"],
            "writerFeatures": ["vacuumProtocolCheck"],
        },
    )
    res = vacuum_delta(
        spark, base, retain_versions=1, orphan_min_age_minutes=0
    )
    assert res["files_deleted"] >= 1
    assert [r["k"] for r in read_delta(spark, base).collect()] == [2]
