"""Adapter for SQL-Server-CDC-shaped change rows — direct parity with the
reference's input format.

The reference consumes ``[cdc].[fn_cdc_get_all_changes_dbo_<T>](from, to,
'all update old')`` rows (usp_cdc_populate_changelog.sql:319): one row per
delete (``__$operation``=1) / insert (2) / update-before (3) /
update-after (4), each carrying the row image, a VARBINARY ``__$start_lsn``
and a ``__$update_mask`` bitmask probed per column with
``fn_cdc_is_bit_set(fn_cdc_get_column_ordinal(...), mask)``
(populate:304–306). This module converts that shape into the engine's
paired event model (schema.cdc_event_schema):

- ``parse_lsn``          — F16 ``fn_varbintohexstr`` inverse: hex string /
                           binary LSN → orderable long
- ``changed_columns``    — F15: mask bit per 1-based column ordinal
- ``with_commit_time``   — F13 ``fn_cdc_map_lsn_to_time``: broadcast join
                           against an (lsn → commit_ts) mapping table
- ``mssql_rows_to_events`` — op 1/2 rows pass through; op 3/4 pairs join on
                           (lsn, seqval) into single update events. The join
                           includes ``__$seqval`` — fixing the reference's
                           same-transaction cross-match gap (its J1 joins on
                           lsn + column + pk only, populate:361–364).

At scale: the 3⋈4 pairing is an equi-join on (lsn, seqval) — unique per
update, uniformly distributed (LSNs are monotone), so AQE sort-merge
handles any volume; the lsn→time map is tiny (one row per transaction
batch) and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_DELETE_ROW = 1  # populate:375
OP_INSERT_ROW = 2  # populate:386
OP_UPDATE_BEFORE = 3  # populate:320
OP_UPDATE_AFTER = 4  # populate:353


def parse_lsn(lsn: Column) -> Column:
    """Hex-string or binary ``__$start_lsn`` → orderable BIGINT.

    The reference converts binary LSNs to hex strings for SQL splicing via
    ``fn_varbintohexstr`` (populate:256–257); we parse the same encoding
    back. Accepts '0x...'-prefixed hex strings or raw binary (uses the low
    8 of the 10 bytes — SQL Server LSNs are monotone in that suffix window
    for any realistic retention span).
    """
    s = F.when(
        lsn.cast("string").startswith("0x"),
        F.substring(lsn.cast("string"), 3, 100),
    ).otherwise(F.hex(lsn))
    return F.conv(F.substring(F.lpad(s, 20, "0"), 5, 16), 16, 10).cast("long")


def changed_columns(
    mask: Column, ordered_columns: list[str]
) -> Column:
    """F15 parity — ``fn_cdc_is_bit_set(fn_cdc_get_column_ordinal(i), mask)``:
    array of column names whose mask bit is set. ``ordered_columns`` is the
    capture-instance column order (1-based ordinals), the analog of the
    reference's ``sys.columns`` cursor order (populate:295)."""
    return F.filter(
        F.array(
            *[
                F.when(F.bit_get(mask, F.lit(i)) == 1, F.lit(c))
                for i, c in enumerate(ordered_columns)
            ]
        ),
        lambda c: c.isNotNull(),
    )


def with_commit_time(
    rows: DataFrame, lsn_time_map: DataFrame, lsn_col: str = "lsn"
) -> DataFrame:
    """F13 parity — ``fn_cdc_map_lsn_to_time`` as a broadcast join against
    an (lsn, commit_ts) mapping table."""
    return rows.join(F.broadcast(lsn_time_map), on=lsn_col, how="left")


def mssql_rows_to_events(
    rows: DataFrame,
    image_cols: list[str],
    lsn_time_map: DataFrame | None = None,
) -> DataFrame:
    """CDC-function-shaped rows → paired event model.

    Input schema: ``__$start_lsn`` (hex string or binary), ``__$seqval``
    long, ``__$operation`` int ∈ {1,2,3,4}, ``__$update_mask`` long,
    ``table_name`` string, plus one column per ``image_cols`` (the row
    image). ``commit_ts`` may be present, or supplied via ``lsn_time_map``.
    """
    base = rows.withColumn("lsn", parse_lsn(F.col("`__$start_lsn`"))).withColumn(
        "seq", F.col("`__$seqval`").cast("long")
    )
    if lsn_time_map is not None:
        base = with_commit_time(base, lsn_time_map)

    image = F.struct(*[F.col(c) for c in image_cols])
    common = ["lsn", "seq", "commit_ts", "table_name"]
    op = F.col("`__$operation`")

    deletes = base.filter(op == OP_DELETE_ROW).select(
        *common,
        F.lit("delete").alias("op"),
        image.alias("before"),
        F.lit(None).cast(base.select(image).schema[0].dataType).alias("after"),
    )
    inserts = base.filter(op == OP_INSERT_ROW).select(
        *common,
        F.lit("insert").alias("op"),
        F.lit(None).cast(base.select(image).schema[0].dataType).alias("before"),
        image.alias("after"),
    )
    # 3⋈4 pairing on (lsn, seq) — one row per update, seqval included
    before_rows = base.filter(op == OP_UPDATE_BEFORE).select(
        *common, image.alias("before")
    )
    after_rows = base.filter(op == OP_UPDATE_AFTER).select(
        "lsn", "seq", image.alias("after")
    )
    updates = before_rows.join(after_rows, on=["lsn", "seq"], how="inner").select(
        *common, F.lit("update").alias("op"), "before", "after"
    )

    out = updates.unionByName(deletes).unionByName(inserts)
    return out.select(
        "lsn", "seq", "commit_ts", "op", "table_name", "before", "after"
    )
