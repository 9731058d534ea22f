"""Schema-evolution alignment: image-field union, typed NULLs for
absent columns, NULL-image preservation, no fabricated change rows, and
a column whose history begins mid-stream."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
)
from changedatacapture_reporting_spark.operators.reconstruct import (
    reconstruct_state,
)
from changedatacapture_reporting_spark.operators.schema_evolution import (
    align_cdc_schemas,
)


def _schema(src):
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("before", src, True),
            T.StructField("after", src, True),
        ]
    )


V1 = T.StructType(
    [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
)
V2 = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("w", T.StringType()),
    ]
)
TS = dt.datetime(2024, 3, 1)


def test_align_unions_fields_and_preserves_null_images(spark):
    ev1 = spark.createDataFrame(
        [
            (1, 0, TS, "insert", "t", None, (1, "a")),
            (2, 0, TS, "update", "t", (1, "a"), (1, "b")),
        ],
        _schema(V1),
    )
    ev2 = spark.createDataFrame(
        [
            (3, 0, TS, "update", "t", (1, "b", None), (1, "b", "W")),
            (4, 0, TS, "delete", "t", (1, "b", "W"), None),
        ],
        _schema(V2),
    )
    aligned = align_cdc_schemas([ev1, ev2])
    assert [f.name for f in aligned.schema["after"].dataType.fields] == [
        "id",
        "v",
        "w",
    ]
    rows = {r.lsn: r for r in aligned.orderBy("lsn").collect()}
    # NULL images stayed NULL, not structs of NULLs
    assert rows[1].before is None and rows[4].after is None
    # absent column is NULL in both images of v1 events
    assert rows[2].before.w is None and rows[2].after.w is None
    assert rows[3].after.w == "W"


def test_align_no_fabricated_change_rows_and_midstream_history(spark):
    """A v1 update must NOT emit a change row for the column it never
    had; reconstruction sees w's history begin at the first v2 write."""
    ev1 = spark.createDataFrame(
        [
            (1, 0, TS, "insert", "t", None, (7, "a")),
            (2, 0, TS, "update", "t", (7, "a"), (7, "b")),
        ],
        _schema(V1),
    )
    ev2 = spark.createDataFrame(
        [(3, 0, TS, "update", "t", (7, "b", None), (7, "b", "W"))],
        _schema(V2),
    )
    log = build_changelog(
        align_cdc_schemas([ev1, ev2]),
        ["id"],
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    w_rows = log.filter(F.col("column_name") == "w").collect()
    assert [(r.lsn, r.old_value, r.new_value) for r in w_rows] == [
        (3, None, "W")
    ]
    state = {
        r.id: (r.v, r.w)
        for r in reconstruct_state(log, ["id"], ["v", "w"]).collect()
    }
    assert state == {7: ("b", "W")}
    # at the pre-evolution boundary, w is simply absent (NULL)
    state2 = {
        r.id: (r.v, r.w)
        for r in reconstruct_state(
            log, ["id"], ["v", "w"], as_of_lsn=2
        ).collect()
    }
    assert state2 == {7: ("b", None)}


def test_align_type_conflict_raises(spark):
    narrow = spark.createDataFrame([], _schema(V1))
    widened = spark.createDataFrame(
        [],
        _schema(
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("v", T.StringType()),
                ]
            )
        ),
    )
    with pytest.raises(TypeError, match="conflicting types"):
        align_cdc_schemas([narrow, widened])
