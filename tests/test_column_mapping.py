"""Column mapping, 'name' mode (public Delta protocol, "Column
Mapping"): the parquet files carry stable PHYSICAL column names; the
committed schema's field metadata maps them to logical names. Reads
resolve physical→logical (including nested fields and partition
columns), stats-based skipping translates its probes, time travel
across a RENAME resolves each version with its own metaData, and
WRITES (r14) stage physical-named files with physical partition
dirs/values and stats keys — append, MERGE, DELETE (vector and
rewrite), OPTIMIZE, and mergeSchema evolution with fresh column-id
allocation. 'id' mode resolves by parquet FIELD ID through
Spark's field-id matcher (names are free to be junk); unknown/future
modes stay refused — pinned in test_delta_table's protocol-enforcement
test."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    delete_delta,
    merge_delta,
    metadata_summary,
    optimize_delta,
    read_delta,
    write_delta,
)


def _field(name, dtype, phys, cid):
    return T.StructField(
        name,
        dtype,
        True,
        {
            "delta.columnMapping.physicalName": phys,
            "delta.columnMapping.id": cid,
        },
    )


def _write_log(base, commits):
    os.makedirs(base + "/_delta_log", exist_ok=True)
    for v, actions in enumerate(commits):
        with open(f"{base}/_delta_log/{v:020d}.json", "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _meta(schema, part_cols=()):
    return {
        "metaData": {
            "id": "t-mapped",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": list(part_cols),
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "9",
            },
            "createdTime": 0,
        }
    }


_PROTO_25 = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
_PROTO_37 = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["columnMapping"],
        "writerFeatures": ["columnMapping"],
    }
}


def _stage_file(spark, base, df, rel):
    df.repartition(1).write.parquet(base + "/_stage")
    part = [
        p for p in os.listdir(base + "/_stage") if p.endswith(".parquet")
    ][0]
    os.replace(base + "/_stage/" + part, os.path.join(base, rel))
    import shutil

    shutil.rmtree(base + "/_stage")
    return {
        "add": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(base, rel)),
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _mapped_schema():
    return T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("name", T.StringType(), "col-bbb", 2),
            _field(
                "nested",
                T.StructType(
                    [
                        _field("p", T.LongType(), "p-phys", 4),
                        _field("q", T.StringType(), "q-phys", 5),
                    ]
                ),
                "col-ccc",
                3,
            ),
        ]
    )


def _physical_df(spark):
    return spark.createDataFrame(
        [(1, "a", (10, "x")), (2, "b", (20, "y"))],
        "`col-aaa` long, `col-bbb` string, "
        "`col-ccc` struct<`p-phys`:long, `q-phys`:string>",
    )


def test_mapped_read_logical_names(spark, tmp_path):
    """Physical parquet names (incl. nested) resolve back to logical
    names with the right values, at legacy protocol (2,5)."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    add = _stage_file(spark, base, _physical_df(spark), "f1.parquet")
    _write_log(base, [[_PROTO_25, _meta(_mapped_schema()), add]])
    df = read_delta(spark, base)
    assert df.columns == ["id", "name", "nested"]
    assert df.schema["nested"].dataType.fieldNames() == ["p", "q"]
    rows = sorted(
        (r["id"], r["name"], r["nested"]["p"], r["nested"]["q"])
        for r in df.collect()
    )
    assert rows == [(1, "a", 10, "x"), (2, "b", 20, "y")]


def test_mapped_read_v3_feature_protocol(spark, tmp_path):
    """The same table marked via the v3 columnMapping reader feature."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    add = _stage_file(spark, base, _physical_df(spark), "f1.parquet")
    _write_log(base, [[_PROTO_37, _meta(_mapped_schema()), add]])
    assert sorted(r["id"] for r in read_delta(spark, base).collect()) == [
        1,
        2,
    ]


def test_time_travel_across_rename(spark, tmp_path):
    """v0 names a column 'v'; v1 renames it to 'amount' (same physical
    name, the whole point of column mapping). Each version reads with
    ITS schema over the SAME files."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    s0 = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("v", T.LongType(), "col-bbb", 2),
        ]
    )
    s1 = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("amount", T.LongType(), "col-bbb", 2),
        ]
    )
    pdf = spark.createDataFrame(
        [(1, 100), (2, 200)], "`col-aaa` long, `col-bbb` long"
    )
    add = _stage_file(spark, base, pdf, "f1.parquet")
    _write_log(
        base,
        [[_PROTO_25, _meta(s0), add], [_PROTO_25, _meta(s1)]],
    )
    v0 = read_delta(spark, base, version=0)
    v1 = read_delta(spark, base, version=1)
    assert v0.columns == ["id", "v"]
    assert v1.columns == ["id", "amount"]
    assert sorted((r["id"], r["amount"]) for r in v1.collect()) == [
        (1, 100),
        (2, 200),
    ]


def test_mapped_partitioned_hive_dirs(spark, tmp_path):
    """Partition dirs and add.partitionValues carry PHYSICAL names per
    the spec; the read restores the logical partition column."""
    base = str(tmp_path / "t")
    os.makedirs(base + "/col-ppp=us", exist_ok=True)
    os.makedirs(base + "/col-ppp=eu", exist_ok=True)
    schema = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("region", T.StringType(), "col-ppp", 2),
        ]
    )
    adds = []
    for region, ids in (("us", [1, 2]), ("eu", [3])):
        pdf = spark.createDataFrame([(i,) for i in ids], "`col-aaa` long")
        a = _stage_file(
            spark, base, pdf, f"col-ppp={region}/f-{region}.parquet"
        )
        a["add"]["partitionValues"] = {"col-ppp": region}
        adds.append(a)
    _write_log(
        base, [[_PROTO_25, _meta(schema, part_cols=["region"])] + adds]
    )
    df = read_delta(spark, base)
    assert sorted(df.columns) == ["id", "region"]
    rows = sorted((r["id"], r["region"]) for r in df.collect())
    assert rows == [(1, "us"), (2, "us"), (3, "eu")]
    # partition-probe skipping equals filtering
    got = sorted(
        r["id"]
        for r in read_delta(
            spark, base, skip=[("region", "=", "us")]
        ).collect()
    )
    assert got == [1, 2]


def test_mapped_skip_equals_filter(spark, tmp_path):
    """Stats keys are physical; a logical skip probe must translate —
    and the result must equal the plain filter exactly."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    schema = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("v", T.LongType(), "col-bbb", 2),
        ]
    )
    adds = []
    for lo in (0, 100):
        pdf = spark.createDataFrame(
            [(lo + i, (lo + i) * 2) for i in range(5)],
            "`col-aaa` long, `col-bbb` long",
        )
        a = _stage_file(spark, base, pdf, f"f{lo}.parquet")
        a["add"]["stats"] = json.dumps(
            {
                "numRecords": 5,
                "minValues": {"col-aaa": lo},
                "maxValues": {"col-aaa": lo + 4},
                "nullCount": {"col-aaa": 0},
            }
        )
        adds.append(a)
    _write_log(base, [[_PROTO_25, _meta(schema)] + adds])
    skipped = read_delta(spark, base, skip=[("id", ">=", 100)])
    plain = read_delta(spark, base).filter(F.col("id") >= 100)
    assert sorted(r["id"] for r in skipped.collect()) == sorted(
        r["id"] for r in plain.collect()
    )
    # and the prune actually dropped the low file: only 5 rows scanned
    assert skipped.count() == 5
    # metadata_summary maps its lookups too
    ms = {
        r["column_name"]: (r["n_rows"], r["min_value"], r["max_value"])
        for r in metadata_summary(spark, base, columns=["id"]).collect()
    }
    assert ms["id"] == (10, "0", "104")


def test_mapped_append_writes_physical_files(spark, tmp_path):
    """'name'-mode WRITES (VERDICT r13 #3): an append of LOGICAL-named
    rows stages PHYSICAL-named parquet (incl. nested fields), so the
    table's real readers still resolve every column; this reader's own
    read returns the logical union. Works at legacy (2,5) protocol."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    add = _stage_file(spark, base, _physical_df(spark), "f1.parquet")
    _write_log(base, [[_PROTO_25, _meta(_mapped_schema()), add]])
    newrow = spark.createDataFrame(
        [(3, "c", (30, "z"))],
        "id long, name string, nested struct<p:long, q:string>",
    )
    v = write_delta(spark, newrow, base, timestamp_ms=5)
    assert v == 1
    df = read_delta(spark, base)
    rows = sorted(
        (r["id"], r["name"], r["nested"]["p"], r["nested"]["q"])
        for r in df.collect()
    )
    assert rows == [(1, "a", 10, "x"), (2, "b", 20, "y"),
                    (3, "c", 30, "z")]
    # the staged file itself carries PHYSICAL names — what the table's
    # foreign readers resolve against
    st = json.loads(
        open(f"{base}/_delta_log/{1:020d}.json").read().splitlines()[0]
    )
    new_rel = st["add"]["path"]
    raw = spark.read.parquet(os.path.join(base, new_rel))
    assert sorted(raw.columns) == ["col-aaa", "col-bbb", "col-ccc"]
    assert raw.schema["col-ccc"].dataType.fieldNames() == [
        "p-phys", "q-phys",
    ]
    # stats keys are physical too
    stats = json.loads(st["add"]["stats"])
    assert set(stats["nullCount"]) == {"col-aaa", "col-bbb"}
    # skip-read on the logical name prunes/filters correctly
    got = sorted(
        r["id"]
        for r in read_delta(spark, base, skip=[("id", ">=", 3)]).collect()
    )
    assert got == [3]


def test_mapped_merge_delete_optimize_roundtrip(spark, tmp_path):
    """MERGE (rewrite + DV modes), DELETE, and OPTIMIZE on a mapped
    table: every staged rewrite carries physical names, partitionValues
    stay physical, and the logical row set tracks an unmapped oracle
    table driven through identical operations."""
    base = str(tmp_path / "t")
    oracle = str(tmp_path / "o")
    os.makedirs(base, exist_ok=True)
    add = _stage_file(spark, base, _physical_df(spark), "f1.parquet")
    _write_log(base, [[_PROTO_25, _meta(_mapped_schema()), add]])
    logical = (
        "id long, name string, nested struct<p:long, q:string>"
    )
    write_delta(
        spark,
        spark.createDataFrame(
            [(1, "a", (10, "x")), (2, "b", (20, "y"))], logical
        ),
        oracle,
    )

    def rows(path):
        return sorted(
            (r["id"], r["name"], r["nested"]["p"], r["nested"]["q"])
            for r in read_delta(spark, path).collect()
        )

    src = spark.createDataFrame(
        [(2, "B!", (22, "yy")), (4, "d", (40, "w"))], logical
    )
    for p in (base, oracle):
        res = merge_delta(spark, src, p, ["id"], timestamp_ms=7)
        assert res["rows_upserted"] == 2, res
    assert rows(base) == rows(oracle)

    # vector delete (descriptor rides the mapped adds unchanged)
    for p in (base, oracle):
        delete_delta(
            spark, p, spark.createDataFrame([(1,)], "id long"),
            deletion_vectors=True, timestamp_ms=9,
        )
    assert rows(base) == rows(oracle)

    # OPTIMIZE purges the vectors and rewrites physical-named files
    for p in (base, oracle):
        r = optimize_delta(spark, p, timestamp_ms=11)
        assert r["version"] is not None
    assert rows(base) == rows(oracle)
    live = read_delta(spark, base)
    assert sorted(r["id"] for r in live.collect()) == [2, 4]


def test_mapped_merge_schema_evolution_allocates_ids(spark, tmp_path):
    """mergeSchema on a mapped table: the new column (a STRUCT, so
    nested fields too) gets fresh ``col-<uuid>`` physical names and
    sequential ids above delta.columnMapping.maxColumnId, the config
    bumps, pre-evolution files read NULL for it, and the staged file
    carries the generated physical names."""
    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    add = _stage_file(spark, base, _physical_df(spark), "f1.parquet")
    _write_log(base, [[_PROTO_25, _meta(_mapped_schema()), add]])
    evolved = spark.createDataFrame(
        [(5, "e", (50, "v"), (7.5, "lab"))],
        "id long, name string, nested struct<p:long, q:string>, "
        "extra struct<score:double, tag:string>",
    )
    v = write_delta(spark, evolved, base, merge_schema=True)
    assert v == 1
    df = read_delta(spark, base)
    assert df.columns == ["id", "name", "nested", "extra"]
    got = {
        (r["id"], r["extra"]["score"] if r["extra"] else None)
        for r in df.collect()
    }
    assert got == {(1, None), (2, None), (5, 7.5)}

    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
    )

    st = _resolve_log(spark, base, None)
    schema = T.StructType.fromJson(
        json.loads(st["meta"]["schemaString"])
    )
    extra = schema["extra"]
    md = extra.metadata
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    # maxColumnId was 9 (fixture): extra + 2 nested fields = 10, 11, 12
    ids = [md["delta.columnMapping.id"]] + [
        f.metadata["delta.columnMapping.id"]
        for f in extra.dataType.fields
    ]
    assert sorted(ids) == [10, 11, 12]
    assert st["meta"]["configuration"][
        "delta.columnMapping.maxColumnId"
    ] == "12"
    # nested physical names landed in the staged parquet
    commit = [
        json.loads(line)
        for line in open(
            f"{base}/_delta_log/{1:020d}.json"
        ).read().splitlines()
    ]
    rel = next(a["add"]["path"] for a in commit if a.get("add"))
    raw = spark.read.parquet(os.path.join(base, rel))
    phys_extra = md["delta.columnMapping.physicalName"]
    assert phys_extra in raw.columns
    assert all(
        n.startswith("col-")
        for n in raw.schema[phys_extra].dataType.fieldNames()
    )
    # a second append WITHOUT the evolved column still lands (omitted
    # existing column semantics) and reads NULL there
    write_delta(
        spark,
        spark.createDataFrame(
            [(6, "f", (60, "u"))],
            "id long, name string, nested struct<p:long, q:string>",
        ),
        base,
        merge_schema=True,
    )
    assert read_delta(spark, base).filter(F.col("id") == 6).collect()[
        0
    ]["extra"] is None


def test_mapped_partitioned_write_physical_dirs(spark, tmp_path):
    """Appends into a PARTITIONED mapped table: dirs and
    add.partitionValues keys use the physical partition-column name."""
    base = str(tmp_path / "t")
    os.makedirs(base + "/col-ppp=us", exist_ok=True)
    schema = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("region", T.StringType(), "col-ppp", 2),
        ]
    )
    pdf = spark.createDataFrame([(1,)], "`col-aaa` long")
    a = _stage_file(spark, base, pdf, "col-ppp=us/f-us.parquet")
    a["add"]["partitionValues"] = {"col-ppp": "us"}
    _write_log(
        base, [[_PROTO_25, _meta(schema, part_cols=["region"])] + [a]]
    )
    write_delta(
        spark,
        spark.createDataFrame([(2, "eu"), (3, "us")],
                              "id long, region string"),
        base,
        partition_by=["region"],
    )
    commit = [
        json.loads(line)
        for line in open(
            f"{base}/_delta_log/{1:020d}.json"
        ).read().splitlines()
    ]
    from urllib.parse import unquote

    adds = [a["add"] for a in commit if a.get("add")]
    # add.path is a percent-encoded relative URI per the protocol
    assert all(
        unquote(ad["path"]).startswith("col-ppp=") for ad in adds
    )
    assert all(set(ad["partitionValues"]) == {"col-ppp"} for ad in adds)
    rows = sorted(
        (r["id"], r["region"])
        for r in read_delta(spark, base).collect()
    )
    assert rows == [(1, "us"), (2, "eu"), (3, "us")]
    got = sorted(
        r["id"]
        for r in read_delta(
            spark, base, skip=[("region", "=", "us")]
        ).collect()
    )
    assert got == [1, 3]


def test_id_mode_write_roundtrip(spark, tmp_path):
    """r14: id-mode tables are WRITABLE — staged files carry physical
    column names AND parquet field ids (delta.columnMapping.id stamped
    as parquet.field.id metadata, nested fields included), so the
    table's own id-mode readers resolve them. The write path must
    re-enable the session's fieldId.write conf itself: a file without
    ids would be silently unreadable. Covers append, MERGE, DV delete,
    OPTIMIZE and mergeSchema evolution (fresh id above maxColumnId,
    stamped into the evolved files)."""
    import pyarrow.parquet as pq

    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
        delete_delta,
        merge_delta,
        optimize_delta,
    )

    base = str(tmp_path / "t")
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = _mapped_schema()
    meta = _meta(schema)
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    _write_log(base, [[_PROTO_25, meta]])
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")

    df = spark.createDataFrame(
        [(1, "a", (10, "x")), (2, "b", (20, "y"))],
        "id long, name string, nested struct<p:long, q:string>",
    )
    assert write_delta(spark, df, base, timestamp_ms=10) == 1

    # the staged file carries physical names + field ids, nested too
    fp = [
        os.path.join(base, f)
        for f in os.listdir(base)
        if f.endswith(".parquet")
    ][0]
    psch = pq.read_schema(fp)
    ids = {
        n: (psch.field(n).metadata or {}).get(b"PARQUET:field_id")
        for n in psch.names
    }
    assert ids == {"col-aaa": b"1", "col-bbb": b"2", "col-ccc": b"3"}
    nested = psch.field("col-ccc")
    sub = {
        nested.type.field(i).name: (
            nested.type.field(i).metadata or {}
        ).get(b"PARQUET:field_id")
        for i in range(nested.type.num_fields)
    }
    assert sub == {"p-phys": b"4", "q-phys": b"5"}

    rows = sorted(
        (r["id"], r["name"], r["nested"]["p"])
        for r in read_delta(spark, base).collect()
    )
    assert rows == [(1, "a", 10), (2, "b", 20)]

    # MERGE, DV delete, OPTIMIZE all stage through the same path
    src = spark.createDataFrame(
        [(2, "B", (22, "Y")), (3, "c", (30, "z"))],
        "id long, name string, nested struct<p:long, q:string>",
    )
    merge_delta(spark, src, base, ["id"], timestamp_ms=20)
    delete_delta(
        spark,
        base,
        spark.createDataFrame([(1,)], "id long"),
        deletion_vectors=True,
        timestamp_ms=30,
    )
    optimize_delta(spark, base, timestamp_ms=40)
    assert sorted(
        (r["id"], r["name"]) for r in read_delta(spark, base).collect()
    ) == [(2, "B"), (3, "c")]

    # mergeSchema evolution allocates a fresh id and stamps it into
    # the new files
    evolved = spark.createDataFrame(
        [(9, "z", (90, "w"), 7.5)],
        "id long, name string, nested struct<p:long, q:string>, "
        "score double",
    )
    write_delta(
        spark, evolved, base, merge_schema=True, timestamp_ms=50
    )
    st = _resolve_log(spark, base, None)
    sch2 = T.StructType.fromJson(json.loads(st["meta"]["schemaString"]))
    new_field = sch2["score"]
    new_id = new_field.metadata["delta.columnMapping.id"]
    assert new_id == 10  # above the fixture's maxColumnId=9
    assert st["meta"]["configuration"][
        "delta.columnMapping.maxColumnId"
    ] == "10"
    newest = max(
        (
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        ),
        key=os.path.getmtime,
    )
    s2 = pq.read_schema(newest)
    phys_new = new_field.metadata["delta.columnMapping.physicalName"]
    assert (
        s2.field(phys_new).metadata or {}
    )[b"PARQUET:field_id"] == b"10"
    assert sorted(
        (r["id"], r["score"])
        for r in read_delta(spark, base).collect()
    ) == [(2, None), (3, None), (9, 7.5)]


def test_id_mode_resolves_by_field_id_not_name(spark, tmp_path):
    """'id' mode: the parquet files carry ARBITRARY column names plus
    parquet field ids; resolution goes through the ids (Spark's
    field-id matcher), so even a file whose names match NOTHING in the
    mapping still reads correctly. Name-based resolution would return
    no columns here — the fixture's parquet names are junk on purpose."""
    import shutil

    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    write_schema = T.StructType(
        [
            T.StructField("junk_a", T.LongType(), True,
                          {"parquet.field.id": 1}),
            T.StructField("junk_b", T.StringType(), True,
                          {"parquet.field.id": 2}),
        ]
    )
    pdf = spark.createDataFrame(
        [(1, "a"), (2, "b")], schema=write_schema
    )
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try:
        pdf.repartition(1).write.parquet(base + "/_stage")
    finally:
        spark.conf.set(
            "spark.sql.parquet.fieldId.write.enabled", "false"
        )
    part = [
        p for p in os.listdir(base + "/_stage") if p.endswith(".parquet")
    ][0]
    os.replace(base + "/_stage/" + part, base + "/f1.parquet")
    shutil.rmtree(base + "/_stage")

    schema = T.StructType(
        [
            _field("id", T.LongType(), "col-0001", 1),
            _field("name", T.StringType(), "col-0002", 2),
        ]
    )
    meta = _meta(schema)
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    _write_log(
        base,
        [[
            _PROTO_25,
            meta,
            {
                "add": {
                    "path": "f1.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(base + "/f1.parquet"),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ]],
    )
    df = read_delta(spark, base)
    assert df.columns == ["id", "name"]
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # r14: id-mode writes land (field ids stamped) and read back
    # through the same id-resolution path — even though this table's
    # EXISTING file has junk physical names
    assert write_delta(
        spark,
        spark.createDataFrame([(3, "c")], "id long, name string"),
        base,
        timestamp_ms=10,
    ) == 1
    assert sorted(
        (r["id"], r["name"]) for r in read_delta(spark, base).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]


def test_timestamp_time_travel(spark, tmp_path):
    """read_delta(timestamp_ms=…) — timestampAsOf resolution by commit-
    file mtime: newest commit at-or-before the timestamp; too-early
    timestamps refuse; version and timestamp are mutually exclusive."""
    from changedatacapture_reporting_spark.sources.delta_table import (
        version_at_timestamp,
    )

    base = str(tmp_path / "tt")
    mk = lambda i: spark.createDataFrame([(i,)], "id long")  # noqa: E731
    for i in range(3):
        write_delta(spark, mk(i), base)
    log = os.path.join(base, "_delta_log")
    for v, t in enumerate((1_000, 2_000, 3_000)):
        os.utime(os.path.join(log, f"{v:020d}.json"), (t, t))
    assert version_at_timestamp(spark, base, 2_500_000) == 1
    assert version_at_timestamp(spark, base, 2_000_000) == 1
    assert version_at_timestamp(spark, base, 99_000_000) == 2
    got = {r["id"] for r in read_delta(spark, base, timestamp_ms=2_500_000).collect()}
    assert got == {0, 1}
    with pytest.raises(ValueError, match="precedes"):
        read_delta(spark, base, timestamp_ms=500_000)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, base, version=1, timestamp_ms=2_500_000)


def test_mapped_table_with_foreign_deletion_vector(spark, tmp_path):
    """The real-world composition: a current writer's table has BOTH
    column mapping AND deletion vectors enabled. The vector's row
    coordinates key on physical file paths (applied before the
    logical rename), the mapping restores logical names, and a skip
    probe on the renamed column still equals the plain filter."""
    import struct
    import uuid as _uuid
    import zlib

    from changedatacapture_reporting_spark.sources import dvcodec

    base = str(tmp_path / "t")
    os.makedirs(base, exist_ok=True)
    schema = T.StructType(
        [
            _field("id", T.LongType(), "col-aaa", 1),
            _field("v", T.LongType(), "col-bbb", 2),
        ]
    )
    pdf = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "`col-aaa` long, `col-bbb` long"
    ).sort("col-aaa")
    add = _stage_file(spark, base, pdf.coalesce(1), "f1.parquet")
    add["add"]["stats"] = json.dumps(
        {
            "numRecords": 10,
            "minValues": {"col-aaa": 0},
            "maxValues": {"col-aaa": 9},
            "nullCount": {"col-aaa": 0},
        }
    )
    # foreign binary DV killing row positions 2 and 5 (ids 2, 5)
    u = _uuid.uuid4()
    blob = dvcodec.serialize_blob([2, 5])
    data, spans = dvcodec.pack_file([blob])
    os.makedirs(base + "/zz", exist_ok=True)
    with open(base + f"/zz/deletion_vector_{u}.bin", "wb") as f:
        f.write(data)
    add["add"]["deletionVector"] = {
        "storageType": "u",
        "pathOrInlineDv": "zz" + dvcodec.encode_uuid(u),
        "offset": spans[0][0],
        "sizeInBytes": spans[0][1],
        "cardinality": 2,
    }
    proto = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "deletionVectors"],
            "writerFeatures": ["columnMapping", "deletionVectors"],
        }
    }
    _write_log(base, [[proto, _meta(schema), add]])
    df = read_delta(spark, base)
    assert df.columns == ["id", "v"]
    got = sorted(r["id"] for r in df.collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # translated skip probe over the surviving rows == plain filter
    skipped = sorted(
        r["id"]
        for r in read_delta(spark, base, skip=[("id", ">=", 5)]).collect()
    )
    assert skipped == [6, 7, 8, 9]
