from __future__ import annotations

import datetime as dt

import pytest

from changedatacapture_reporting_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="session")
def cdc_fixture(spark):
    """Hand-built CDC event batch (FIXTURES.md §B): composite PK
    (id, tenant_id), mixed types, NULL transitions, same-txn double update."""
    from pyspark.sql import types as T

    src = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("tenant_id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("note", T.StringType()),
        ]
    )

    def row(id, tenant, name, qty, note):
        return (id, tenant, name, qty, note)

    events = [
        # 3 inserts
        (1, 0, ts("2024-01-01 10:00:00"), "insert", "t", None, row(1, 1, "a", 10, None)),
        (2, 0, ts("2024-01-01 10:01:00"), "insert", "t", None, row(2, 1, "b", 20, "x")),
        (3, 0, ts("2024-01-01 10:02:00"), "insert", "t", None, row(3, 2, "c", 30, "y")),
        # multi-column update (name, qty)
        (4, 0, ts("2024-01-02 09:00:00"), "update", "t",
         row(1, 1, "a", 10, None), row(1, 1, "a2", 11, None)),
        # NULL -> value update (note)
        (5, 0, ts("2024-01-02 09:30:00"), "update", "t",
         row(1, 1, "a2", 11, None), row(1, 1, "a2", 11, "filled")),
        # value -> NULL update (note)
        (6, 0, ts("2024-01-02 09:45:00"), "update", "t",
         row(2, 1, "b", 20, "x"), row(2, 1, "b", 20, None)),
        # delete
        (7, 0, ts("2024-01-03 08:00:00"), "delete", "t",
         row(3, 2, "c", 30, "y"), None),
        # same-transaction (same lsn) double update of one row — the
        # reference's join cross-matches these (no __$seqval); ours must not
        (8, 0, ts("2024-01-04 12:00:00"), "update", "t",
         row(2, 1, "b", 20, None), row(2, 1, "b", 21, None)),
        (8, 1, ts("2024-01-04 12:00:00"), "update", "t",
         row(2, 1, "b", 21, None), row(2, 1, "b", 22, None)),
    ]
    schema = T.StructType(
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
    return spark.createDataFrame(events, schema)


