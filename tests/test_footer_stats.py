"""Footer-stats fast path (sources.delta_table._file_stats_from_footers):
the driver-side pyarrow stats must be EXACTLY the distributed
aggregate's stats — or refuse (None) so the aggregate stays the
authority. Pins the writer properties the fast path relies on
(oversized string stats are dropped whole, never truncated; NaN and
±0.0 float bounds bail; int-encoded decimals decode from raw)."""
from __future__ import annotations

import datetime
import decimal

import pytest

from changedatacapture_reporting_spark import fs as _fs
import changedatacapture_reporting_spark.sources.delta_table as dt

pytestmark = pytest.mark.usefixtures("spark")


def _both(spark, df, tmp_path, sub):
    """(fast, slow) stats for df written as one parquet dir."""
    out = f"{str(tmp_path)}/{sub}"
    df.write.parquet(out)
    rels = _fs.list_data_files(spark, out)
    schema = df.schema
    eligible = [
        (f.name, f.dataType)
        for f in schema.fields
        if isinstance(f.dataType, dt._STATS_TYPES)
    ]
    fast = dt._file_stats_from_footers(out, rels, eligible)
    orig = dt._file_stats_from_footers
    dt._file_stats_from_footers = lambda *a, **k: None
    try:
        slow = dt._file_stats(spark, out, rels, schema, [])
    finally:
        dt._file_stats_from_footers = orig
    return fast, slow, rels


def test_footer_stats_exact_on_mixed_types(spark, tmp_path):
    rows = [
        (1, "short", "x" * 100, 1.5, decimal.Decimal("12.34"),
         decimal.Decimal("1.000001"),
         datetime.datetime(2020, 1, 1, 12, 0, 0),
         datetime.datetime(2020, 1, 1, 12, 0, 0),
         datetime.date(2020, 1, 2), True, None),
        (2, "zz", "y" * 3000, -3.5, decimal.Decimal("-99.01"),
         decimal.Decimal("123456789012345678.123456"),
         datetime.datetime(2021, 6, 1, 3, 4, 5, 123456),
         datetime.datetime(2021, 6, 1, 3, 4, 5, 123456),
         datetime.date(2019, 1, 2), False, 7),
        (None,) * 11,
    ]
    ddl = (
        "i int, s string, ms string, d double, dec1 decimal(10,2), "
        "dec2 decimal(30,6), ts timestamp, ntz timestamp_ntz, "
        "dtc date, b boolean, i2 int"
    )
    df = spark.createDataFrame(rows, ddl).coalesce(1)
    fast, slow, rels = _both(spark, df, tmp_path, "mixed")
    assert fast is not None
    assert all(fast[r] == slow[r] for r in rels)


def test_footer_stats_exact_multi_file_and_rowgroup(spark, tmp_path):
    df = spark.range(0, 10000).selectExpr(
        "id", "cast(id % 7 as string) s",
        "timestamp_micros(cast(id * 1000000 as long)) ts",
    ).repartition(3)
    fast, slow, rels = _both(spark, df, tmp_path, "multi")
    assert fast is not None and len(rels) == 3
    assert all(fast[r] == slow[r] for r in rels)


def test_footer_stats_all_null_column_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "i int, s string"
    ).coalesce(1)
    fast, slow, rels = _both(spark, df, tmp_path, "allnull")
    assert fast is not None
    assert all(fast[r] == slow[r] for r in rels)


@pytest.mark.parametrize(
    "rows,ddl",
    [
        ([(float("nan"),), (2.0,)], "d double"),   # NaN bound
        ([(0.0,), (5.0,)], "d double"),            # ±0.0 sign ambiguity
        ([("q" * 5000,), ("a",)], "s string"),     # dropped oversize stats
    ],
)
def test_footer_stats_bails_on_unsafe_bounds(spark, tmp_path, rows, ddl):
    import uuid

    df = spark.createDataFrame(rows, ddl).coalesce(1)
    fast, slow, rels = _both(spark, df, tmp_path, f"u{uuid.uuid4().hex[:8]}")
    # the fast path must REFUSE (fall back), never guess
    assert fast is None
    # and the aggregate authority still answers
    assert all(r in slow for r in rels)


def test_writer_string_stats_drop_not_truncate(spark, tmp_path):
    """The fast path's exactness argument for strings: this session's
    parquet writer either records the EXACT min/max or drops the
    statistics entirely — a truncated bound would have to show up here
    as a has_min_max chunk whose max is a prefix of the true max."""
    import glob

    import pyarrow.parquet as pq

    for n in (10, 100, 1000, 3900):
        out = f"{str(tmp_path)}/s{n}"
        spark.createDataFrame(
            [("a" * n,), ("z" * n,)], "s string"
        ).coalesce(1).write.parquet(out)
        f = glob.glob(f"{out}/part*.parquet")[0]
        st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
        if st is not None and st.has_min_max:
            assert st.min == "a" * n and st.max == "z" * n


def test_write_delta_stats_identical_with_and_without_footers(
    spark, tmp_path, sf_dir
):
    """End to end: a write_delta commit's add.stats must be
    byte-identical whether the footer fast path or the aggregate
    computed them."""
    import json

    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"
    )
    write_delta(spark, orders.repartition(2), f"{str(tmp_path)}/fast")
    orig = dt._file_stats_from_footers
    dt._file_stats_from_footers = lambda *a, **k: None
    try:
        write_delta(spark, orders.repartition(2), f"{str(tmp_path)}/slow")
    finally:
        dt._file_stats_from_footers = orig

    def stats_of(p):
        files = _resolve_log(spark, p, None)["files"]
        return sorted(
            json.dumps(
                json.loads(a["stats"])
                if isinstance(a["stats"], str)
                else a["stats"],
                sort_keys=True,
            )
            for a in files.values()
        )

    # file split is deterministic (same repartition), so the per-file
    # stats multisets must match exactly
    assert stats_of(f"{str(tmp_path)}/fast") == stats_of(f"{str(tmp_path)}/slow")
