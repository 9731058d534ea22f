"""sources.jdbc_cdc: query-builder exactness + validation, LSN
normalization, stand-in window semantics (inclusive, parquet-pushed),
and the env-gated real-connector probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sources.jdbc_cdc import (
    JdbcDriverUnavailable,
    file_cdc_rows,
    jdbc_available,
    make_cdc_function_rows,
    mssql_cdc_query,
    normalize_lsn,
    read_cdc_jdbc,
)


def test_normalize_lsn_forms():
    assert normalize_lsn(255) == ("0x" + "0" * 17 + "0ff", 255)
    # hex form: low 8 of the 10 bytes are the orderable window
    hex10 = "0x" + "00" * 2 + "00000000000000ff"
    assert normalize_lsn(hex10) == ("0x" + "0" * 17 + "0ff", 255)
    # short hex literals right-pad to 10 bytes
    assert normalize_lsn("0xff")[1] == 255
    for bad in ("ff", "0xzz", "0x" + "f" * 21, -1, True):
        with pytest.raises(ValueError):
            normalize_lsn(bad)


def test_query_builder_shape_and_validation():
    q = mssql_cdc_query(
        "dbo_orders", 16, 255, ["o_orderkey", "status"],
        table_name="orders",
    )
    # server-side pushdown: the window lives in the TVF arguments
    assert "cdc.fn_cdc_get_all_changes_dbo_orders(" in q
    assert f"'0x{16:020x}'" in q and f"'0x{255:020x}'" in q
    assert "N'all update old'" in q
    # engine-ready projection: hex LSN, long seqval/mask, commit time,
    # the lsn_num partition column, and the image columns
    for frag in (
        "CONVERT(VARCHAR(42), t.[__$start_lsn], 1) AS [__$start_lsn]",
        "CONVERT(BIGINT, SUBSTRING(t.[__$seqval], 3, 8)) AS [__$seqval]",
        "CONVERT(BIGINT, t.[__$update_mask]) AS [__$update_mask]",
        "sys.fn_cdc_map_lsn_to_time(t.[__$start_lsn]) AS commit_ts",
        "CONVERT(BIGINT, SUBSTRING(t.[__$start_lsn], 3, 8)) AS lsn_num",
        "'orders' AS table_name",
        "t.[o_orderkey]",
        "t.[status]",
    ):
        assert frag in q, frag

    with pytest.raises(ValueError, match="identifier"):
        mssql_cdc_query("dbo_orders; DROP", 1, 2, ["a"])
    with pytest.raises(ValueError, match="identifier"):
        mssql_cdc_query("dbo_orders", 1, 2, ["a]; DROP"])
    with pytest.raises(ValueError, match="row_filter"):
        mssql_cdc_query("dbo_orders", 1, 2, ["a"], row_filter="evil")
    with pytest.raises(ValueError, match="empty LSN window"):
        mssql_cdc_query("dbo_orders", 9, 2, ["a"])
    with pytest.raises(ValueError, match="malformed LSN"):
        mssql_cdc_query("dbo_orders", "1 OR 1=1", 2, ["a"])


def test_file_standin_window_and_roundtrip(spark, sf_dir, tmp_path):
    """Fixture rows → inclusive window → paired events: boundary LSNs
    included, out-of-window excluded, and the parquet plan pushes the
    lsn_num predicate into the scan."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_VALUE_COLS,
        simulate_cdc_events,
    )
    from changedatacapture_reporting_spark.sources.mssql_cdc import (
        mssql_rows_to_events,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    rows = make_cdc_function_rows(ev, SIM_VALUE_COLS)
    path = str(tmp_path / "cdc_rows")
    rows.write.parquet(path)

    lo, hi = 100, 200
    windowed = file_cdc_rows(path, lo, hi, spark=spark)
    lsns = {r.lsn_num for r in windowed.select("lsn_num").distinct().collect()}
    assert lsns == {
        r.lsn
        for r in ev.filter(F.col("lsn").between(lo, hi)).select("lsn").collect()
    }
    assert min(lsns) == lo and max(lsns) == hi  # inclusive bounds

    plan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lsn_num" in plan

    events = mssql_rows_to_events(windowed, SIM_VALUE_COLS)
    want = ev.filter(F.col("lsn").between(lo, hi))
    assert events.count() == want.count()
    # update pairing is lossless: op histogram matches the source window
    got_ops = {r.op: r.n for r in events.groupBy("op").agg(F.count("*").alias("n")).collect()}
    want_ops = {r.op: r.n for r in want.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert got_ops == want_ops

    with pytest.raises(ValueError, match="empty LSN window"):
        file_cdc_rows(path, 5, 1, spark=spark)
    with pytest.raises(ValueError, match="requires the spark session"):
        file_cdc_rows(path, 1, 5)


def test_real_connector_is_env_gated(spark):
    """No SQL Server JDBC driver in this sandbox: the probe is False and
    read_cdc_jdbc fails with the actionable error, not an opaque
    provider failure."""
    assert jdbc_available(spark) is False
    with pytest.raises(JdbcDriverUnavailable, match="mssql-jdbc"):
        read_cdc_jdbc(
            spark,
            "jdbc:sqlserver://localhost;databaseName=x",
            "dbo_orders",
            1,
            9,
            ["o_orderkey"],
        )
