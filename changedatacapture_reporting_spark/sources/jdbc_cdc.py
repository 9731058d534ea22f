"""Live SQL Server CDC ingestion over JDBC — the reference's ACTUAL
input: ``[cdc].[fn_cdc_get_all_changes_<capture_instance>](@from_lsn,
@to_lsn, N'all update old')`` evaluated on the server over a live
connection (usp_cdc_populate_changelog.sql:319), not a file drop.

Three layers, so everything except the physical connection is built and
tested in-sandbox (the sources/kafka.py pattern):

- :func:`mssql_cdc_query` — PURE query builder: the exact T-SQL pushed
  to the server. The LSN window rides INSIDE the table-valued-function
  arguments, so the predicate is evaluated server-side (true pushdown —
  SQL Server walks only the [from, to] range of the change table's
  clustered index; Spark never sees out-of-window rows). The projection
  also happens server-side: binary LSN/seqval/mask are converted to the
  engine's orderable/long forms in the SELECT list, so JDBC transfers
  compact integers, not VARBINARY blobs.
- :func:`read_cdc_jdbc` — env-gated real reader: probes the JDBC driver
  class up front (clear error instead of an opaque provider failure),
  then ``spark.read.format("jdbc")`` with the built query, optionally
  RANGE-PARTITIONED on the server-computed ``lsn_num`` column
  (numPartitions parallel cursors — the only way a JDBC scan scales) —
  emitting ``mssql_rows_to_events``-ready rows.
- :func:`file_cdc_rows` — file-backed stand-in with the IDENTICAL
  column shape and the identical inclusive-window semantics, filtering
  on the materialized ``lsn_num`` so the predicate pushes into the
  parquet scan. Fixtures come from :func:`make_cdc_function_rows`.

Scale: fn_cdc_get_all_changes output is clustered by (__$start_lsn,
__$seqval), so ``lsn_num`` range partitions are contiguous index scans
server-side — N parallel readers cost N seeks, not N table scans. The
mask→BIGINT conversion caps the adapter at 64 captured columns per
instance (documented; the reference's own changelog melts per column,
so instances are narrow in practice).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z0-9_]+$")
_HEX_LSN = re.compile(r"^0x[0-9A-Fa-f]{1,20}$")

ROW_FILTERS = ("all", "all update old")


class JdbcDriverUnavailable(RuntimeError):
    """The SQL Server JDBC driver is not on the classpath."""


def jdbc_available(
    spark: SparkSession,
    driver: str = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
) -> bool:
    """True when the JDBC driver class is loadable."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def normalize_lsn(lsn: int | str) -> tuple[str, int]:
    """LSN as the engine's orderable long OR a ``0x…`` hex string →
    (server hex literal ``0x`` + 20 hex chars, orderable long). The
    orderable long is the low 8 of the 10 LSN bytes — the same window
    :func:`sources.mssql_cdc.parse_lsn` reads back. Strictly validated:
    these values are spliced into the server query text (the reference
    splices fn_varbintohexstr output the same way, populate:256–257),
    so anything but a pure hex literal is rejected."""
    if isinstance(lsn, bool):  # bool is an int subclass; always a bug
        raise ValueError(f"not an LSN: {lsn!r}")
    if isinstance(lsn, int):
        if lsn < 0:
            raise ValueError(f"negative LSN: {lsn}")
        return f"0x{lsn:020x}", lsn
    if not _HEX_LSN.match(lsn):
        raise ValueError(
            f"malformed LSN literal {lsn!r}: expected 0x + up to 20 hex "
            "chars (fn_varbintohexstr form)"
        )
    h = lsn[2:].rjust(20, "0").lower()
    return "0x" + h, int(h[4:20], 16)


def mssql_cdc_query(
    capture_instance: str,
    from_lsn: int | str,
    to_lsn: int | str,
    image_cols: list[str],
    table_name: str | None = None,
    row_filter: str = "all update old",
) -> str:
    """The exact server-side query for one capture instance and LSN
    window — the engine's analog of the reference's dynamic-SQL splice
    (populate:316–323). Identifiers and LSN literals are strictly
    validated before splicing. Output columns are exactly the
    ``mssql_rows_to_events`` input shape plus ``lsn_num`` (the
    partitioning column) — commit time resolved server-side via
    ``sys.fn_cdc_map_lsn_to_time`` (F13) so no second round trip."""
    for ident in [capture_instance, *image_cols]:
        if not _IDENT.match(ident):
            raise ValueError(f"invalid SQL identifier: {ident!r}")
    if row_filter not in ROW_FILTERS:
        raise ValueError(
            f"row_filter {row_filter!r} not in {ROW_FILTERS}"
        )
    lo_hex, lo_num = normalize_lsn(from_lsn)
    hi_hex, hi_num = normalize_lsn(to_lsn)
    if lo_num > hi_num:
        raise ValueError(
            f"empty LSN window: from {lo_hex} > to {hi_hex}"
        )
    tname = table_name if table_name is not None else capture_instance
    if not _IDENT.match(tname):
        raise ValueError(f"invalid table name: {tname!r}")
    imgs = ",\n       ".join(f"t.[{c}]" for c in image_cols)
    return (
        "SELECT CONVERT(VARCHAR(42), t.[__$start_lsn], 1) AS [__$start_lsn],\n"
        "       CONVERT(BIGINT, SUBSTRING(t.[__$seqval], 3, 8)) AS [__$seqval],\n"
        "       t.[__$operation] AS [__$operation],\n"
        "       CONVERT(BIGINT, t.[__$update_mask]) AS [__$update_mask],\n"
        f"       '{tname}' AS table_name,\n"
        "       sys.fn_cdc_map_lsn_to_time(t.[__$start_lsn]) AS commit_ts,\n"
        "       CONVERT(BIGINT, SUBSTRING(t.[__$start_lsn], 3, 8)) AS lsn_num,\n"
        f"       {imgs}\n"
        f"FROM cdc.fn_cdc_get_all_changes_{capture_instance}(\n"
        f"       CONVERT(BINARY(10), '{lo_hex}', 1),\n"
        f"       CONVERT(BINARY(10), '{hi_hex}', 1),\n"
        f"       N'{row_filter}') AS t"
    )


def read_cdc_jdbc(
    spark: SparkSession,
    url: str,
    capture_instance: str,
    from_lsn: int | str,
    to_lsn: int | str,
    image_cols: list[str],
    table_name: str | None = None,
    row_filter: str = "all update old",
    num_partitions: int = 1,
    fetchsize: int = 10_000,
    driver: str = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """fn_cdc_get_all_changes rows over a live JDBC connection, shaped
    for :func:`sources.mssql_cdc.mssql_rows_to_events` (which pairs the
    op-3/op-4 update halves and emits the engine's event model).

    ``num_partitions > 1`` range-partitions the read on the
    server-computed ``lsn_num`` (lowerBound/upperBound = the requested
    window) — N concurrent cursors over contiguous slices of the change
    table's clustered index. Credentials go in ``options`` (or the
    url); they are never logged. Driver-class availability is probed
    up front: this sandbox has no SQL Server driver jar, so in-repo
    tests cover the query builder and the :func:`file_cdc_rows`
    stand-in, which present the identical shape."""
    if not jdbc_available(spark, driver):
        raise JdbcDriverUnavailable(
            f"JDBC driver {driver} is not on the classpath. Launch with "
            "--jars mssql-jdbc-<ver>.jre11.jar (or --packages "
            "com.microsoft.sqlserver:mssql-jdbc:<ver>.jre11), or develop "
            "against sources.jdbc_cdc.file_cdc_rows, which presents the "
            "same row shape from a parquet directory."
        )
    q = mssql_cdc_query(
        capture_instance, from_lsn, to_lsn, image_cols,
        table_name=table_name, row_filter=row_filter,
    )
    _, lo_num = normalize_lsn(from_lsn)
    _, hi_num = normalize_lsn(to_lsn)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if num_partitions > 1:
        # dbtable (not query): partitioned JDBC reads require a named
        # relation to wrap; the window bounds double as the row-range
        # bounds because lsn_num IS the windowed column.
        reader = (
            reader.option("dbtable", f"({q}) AS cdc_window")
            .option("partitionColumn", "lsn_num")
            .option("lowerBound", str(lo_num))
            .option("upperBound", str(hi_num + 1))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", q)
    return reader.load()


def make_cdc_function_rows(
    events: DataFrame, image_cols: list[str]
) -> DataFrame:
    """Event-model frame → ``fn_cdc_get_all_changes`` output shape as
    the SERVER would return it through :func:`mssql_cdc_query`'s
    projection ('all update old': separate op-3/op-4 update rows, hex
    ``__$start_lsn``, long seqval/mask, ``commit_ts`` resolved, plus
    ``lsn_num``) — the fixture generator for the file stand-in, and the
    deterministic inverse the roundtrip contract replays."""
    hex_lsn = F.concat(F.lit("0x"), F.lpad(F.hex(F.col("lsn")), 20, "0"))
    mask = F.aggregate(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"before.{c}").eqNullSafe(
                            F.col(f"after.{c}")
                        ),
                        F.lit(1 << i),
                    )
                    for i, c in enumerate(image_cols)
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b.cast("long")),
    )

    def shape(src: str, op_val: int, flt):
        return events.filter(flt).select(
            hex_lsn.alias("__$start_lsn"),
            F.col("seq").cast("long").alias("__$seqval"),
            F.lit(op_val).alias("__$operation"),
            mask.alias("__$update_mask"),
            F.col("table_name"),
            F.col("commit_ts"),
            F.col("lsn").cast("long").alias("lsn_num"),
            F.col(f"{src}.*"),
        )

    op = F.col("op")
    return (
        shape("before", 1, op == "delete")
        .unionByName(shape("after", 2, op == "insert"))
        .unionByName(shape("before", 3, op == "update"))
        .unionByName(shape("after", 4, op == "update"))
    )


def file_cdc_rows(
    rows_or_path: DataFrame | str,
    from_lsn: int | str,
    to_lsn: int | str,
    spark: SparkSession | None = None,
) -> DataFrame:
    """The in-sandbox stand-in for :func:`read_cdc_jdbc`: the same row
    shape from a parquet directory (or an in-memory frame), with the
    same INCLUSIVE LSN-window semantics — filtered on the materialized
    ``lsn_num`` column, so from a parquet source the window predicate
    pushes into the scan (PushedFilters), the file analog of the
    server-side index range walk."""
    if isinstance(rows_or_path, str):
        if spark is None:
            raise ValueError("reading a path requires the spark session")
        rows = spark.read.parquet(rows_or_path)
    else:
        rows = rows_or_path
    _, lo = normalize_lsn(from_lsn)
    _, hi = normalize_lsn(to_lsn)
    if lo > hi:
        raise ValueError(f"empty LSN window: {from_lsn!r} > {to_lsn!r}")
    return rows.filter(
        (F.col("lsn_num") >= F.lit(lo)) & (F.col("lsn_num") <= F.lit(hi))
    )
