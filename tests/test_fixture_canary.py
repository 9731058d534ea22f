"""Fixture canary: every real testdata table must load and aggregate.

r04 post-mortem: the driver regenerated ``events.parquet`` with a new
``ts`` encoding (TIMESTAMP(NANOS)-as-long → native timestamp[us]) and six
driver queries, three pytest tests, and the whole bench went red with
opaque DATATYPE_MISMATCH errors. This canary turns any future silent
fixture regeneration into ONE loud, named failure: it loads all ten
tables from the real fixture dir and runs a trivial aggregate on each.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_table_loads_and_aggregates(spark, name):
    path = os.path.join(SF, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture table missing: {path}")
    df = load_table(spark, SF, name)
    n = df.count()
    assert n > 0, (
        f"fixture table '{name}' at {path} loaded 0 rows — "
        "testdata regeneration likely broke it"
    )
    # a non-trivial aggregate over every column forces full decode of the
    # current parquet encoding (count() alone can skip column chunks)
    row = df.agg(
        *[F.count(c).alias(c) for c in df.columns]
    ).collect()[0]
    assert max(row) > 0, f"all columns of '{name}' decoded as NULL"


def test_events_ts_normalized_to_timestamp(spark):
    """events.ts must come out of load_table as a session-zone TIMESTAMP
    with sane values, whatever the on-disk parquet encoding is."""
    if not os.path.exists(os.path.join(SF, "events.parquet")):
        pytest.skip("events fixture missing")
    df = load_table(spark, SF, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"events.ts is {df.schema['ts'].dataType}, expected TimestampType — "
        "sources/tables.py:normalize_events_ts missed an encoding"
    )
    bounds = df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    assert bounds.lo is not None and bounds.lo.year >= 1990, bounds
    assert bounds.hi.year <= 2100, bounds
