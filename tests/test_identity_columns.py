"""Identity columns (public Delta protocol, "Identity Columns"):
``delta.identity.{start,step,allowExplicitInsert,highWaterMark}``
field metadata. r14 allocates values the caller omits — dense on the
start + k*step grid via a per-partition count pass + the record-number
bits of monotonically_increasing_id (no shuffle, no driver rows beyond
one count per partition) — and advances highWaterMark in the SAME
commit's metaData, so the mark can never disagree with the data.

Reference parity: the reference's changelog tables lean on the
warehouse's IDENTITY/sequence machinery (CreateChangeLogTables.sql);
this engine supplies the Delta-protocol equivalent."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    merge_delta,
    read_delta,
    write_delta,
    _resolve_log,
)


def _write_log(base, commits):
    os.makedirs(base + "/_delta_log", exist_ok=True)
    for v, actions in enumerate(commits):
        with open(f"{base}/_delta_log/{v:020d}.json", "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _id_field(start=1, step=1, allow=False, hwm=None, dtype=None):
    md = {
        "delta.identity.start": start,
        "delta.identity.step": step,
        "delta.identity.allowExplicitInsert": allow,
    }
    if hwm is not None:
        md["delta.identity.highWaterMark"] = hwm
    return T.StructField("id", dtype or T.LongType(), True, md)


def _genesis(base, id_field, protocol=None):
    schema = T.StructType(
        [id_field, T.StructField("val", T.StringType(), True)]
    )
    _write_log(
        base,
        [[
            {
                "protocol": protocol
                or {"minReaderVersion": 1, "minWriterVersion": 6}
            },
            {
                "metaData": {
                    "id": "t-ident",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ]],
    )


def _vals(spark, names):
    return spark.createDataFrame([(n,) for n in names], "val string")


def _hwm(spark, base):
    st = _resolve_log(spark, base, None)
    sch = T.StructType.fromJson(json.loads(st["meta"]["schemaString"]))
    return sch["id"].metadata.get("delta.identity.highWaterMark")


def test_dense_allocation_and_hwm(spark, tmp_path):
    """Values are contiguous on the grid across partitions AND across
    writes; the high-water mark rides each commit's metaData."""
    base = str(tmp_path / "t")
    _genesis(base, _id_field(start=100, step=10))
    write_delta(spark, _vals(spark, ["a", "b", "c"]), base, timestamp_ms=10)
    assert _hwm(spark, base) == 120
    write_delta(
        spark, _vals(spark, [f"x{i}" for i in range(200)]), base,
        timestamp_ms=20,
    )
    ids = sorted(r["id"] for r in read_delta(spark, base).collect())
    assert ids == list(range(100, 100 + 10 * 203, 10))  # dense, unique
    assert _hwm(spark, base) == ids[-1]
    # the hwm rides the SAME commit as its data (a metaData action in
    # the data commit, not a separate one)
    lines = [
        json.loads(ln)
        for ln in open(
            base + "/_delta_log/" + f"{2:020d}.json"
        ).read().splitlines()
        if ln.strip()
    ]
    metas = [a["metaData"] for a in lines if a.get("metaData")]
    adds = [a for a in lines if a.get("add")]
    assert metas and adds
    sch = T.StructType.fromJson(json.loads(metas[0]["schemaString"]))
    assert sch["id"].metadata["delta.identity.highWaterMark"] == ids[-1]


def test_negative_step_and_explicit_regrid(spark, tmp_path):
    """Negative step allocates downward; an explicit off-grid insert
    advances the mark and later allocation rounds back onto the grid
    strictly past it."""
    base = str(tmp_path / "t")
    _genesis(base, _id_field(start=0, step=-3, allow=True))
    write_delta(spark, _vals(spark, ["a", "b"]), base, timestamp_ms=10)
    assert sorted(
        r["id"] for r in read_delta(spark, base).collect()
    ) == [-3, 0]
    assert _hwm(spark, base) == -3
    # explicit off-grid value below the mark
    write_delta(
        spark,
        spark.createDataFrame([(-50, "c")], "id long, val string"),
        base,
        timestamp_ms=20,
    )
    assert _hwm(spark, base) == -50
    write_delta(spark, _vals(spark, ["d"]), base, timestamp_ms=30)
    ids = sorted(r["id"] for r in read_delta(spark, base).collect())
    assert ids == [-51, -50, -3, 0]  # -51 is on-grid (0 - 17*3), < -50
    # an explicit value that does NOT pass the mark leaves it alone
    write_delta(
        spark,
        spark.createDataFrame([(-6, "e")], "id long, val string"),
        base,
        timestamp_ms=40,
    )
    assert _hwm(spark, base) == -51


def test_explicit_insert_gates(spark, tmp_path):
    """allowExplicitInsert=false refuses provided values on append AND
    refuses MERGE outright (merge sources must carry the column)."""
    base = str(tmp_path / "t")
    _genesis(base, _id_field(allow=False))
    with pytest.raises(ValueError, match="allowExplicitInsert"):
        write_delta(
            spark,
            spark.createDataFrame([(7, "x")], "id long, val string"),
            base,
        )
    write_delta(spark, _vals(spark, ["x"]), base)
    with pytest.raises(ValueError, match="MERGE.*identity"):
        merge_delta(
            spark,
            spark.createDataFrame([(1, "y")], "id long, val string"),
            base,
            ["id"],
        )


def test_merge_with_allow_explicit(spark, tmp_path):
    """MERGE works on allowExplicitInsert=true identity tables with
    caller-supplied values (and does not move the mark)."""
    base = str(tmp_path / "t")
    _genesis(base, _id_field(allow=True))
    write_delta(
        spark,
        spark.createDataFrame([(1, "a")], "id long, val string"),
        base,
    )
    merge_delta(
        spark,
        spark.createDataFrame(
            [(1, "A"), (2, "b")], "id long, val string"
        ),
        base,
        ["id"],
    )
    assert sorted(
        (r["id"], r["val"]) for r in read_delta(spark, base).collect()
    ) == [(1, "A"), (2, "b")]
    # the explicit APPEND advanced the mark (write_delta maintains it
    # even for explicit values); the MERGE left it alone
    assert _hwm(spark, base) == 1


def test_empty_batch_and_type_gate(spark, tmp_path):
    """An empty batch allocates nothing and leaves the mark untouched;
    a non-bigint identity column refuses allocation with a pointed
    error (the protocol defines identity over bigint)."""
    base = str(tmp_path / "t")
    _genesis(base, _id_field(start=5, step=5))
    write_delta(spark, _vals(spark, ["a"]), base, timestamp_ms=10)
    assert _hwm(spark, base) == 5
    write_delta(
        spark,
        spark.createDataFrame([], "val string"),
        base,
        timestamp_ms=20,
    )
    assert _hwm(spark, base) == 5
    assert [r["id"] for r in read_delta(spark, base).collect()] == [5]

    base2 = str(tmp_path / "t2")
    _genesis(base2, _id_field(dtype=T.IntegerType()))
    with pytest.raises(ValueError, match="bigint"):
        write_delta(spark, _vals(spark, ["a"]), base2)


def test_identity_with_constraints_same_batch(spark, tmp_path):
    """Constraints referencing the identity column see the ALLOCATED
    values (the frame is pinned before enforcement): a constraint the
    allocation satisfies passes, one it cannot refuses."""
    base = str(tmp_path / "t")
    schema = T.StructType(
        [
            _id_field(start=100, step=10),
            T.StructField("val", T.StringType(), True),
        ]
    )
    _write_log(
        base,
        [[
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
            {
                "metaData": {
                    "id": "t-ic",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.constraints.id_big": "id >= 100"
                    },
                    "createdTime": 0,
                }
            },
        ]],
    )
    write_delta(spark, _vals(spark, ["a", "b"]), base, timestamp_ms=10)
    assert sorted(
        r["id"] for r in read_delta(spark, base).collect()
    ) == [100, 110]

    base2 = str(tmp_path / "t2")
    _write_log(
        base2,
        [[
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
            {
                "metaData": {
                    "id": "t-ic2",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.constraints.id_small": "id < 105"
                    },
                    "createdTime": 0,
                }
            },
        ]],
    )
    with pytest.raises(ValueError, match="id_small"):
        write_delta(spark, _vals(spark, ["a", "b"]), base2)
