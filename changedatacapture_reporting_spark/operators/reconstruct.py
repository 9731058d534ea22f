"""Changelog replay → table state reconstruction.

The inverse of the populate dataflow: given the long-format per-column
changelog (EAV: one row per transaction × row × changed column,
usp_cdc_populate_changelog.sql:138–177 schema), rebuild each row's state
as of a point in time. The reference has no such operator — its users
join the changelog by hand — but it's the canonical consumption pattern
for a changelog table and the invariant our property tests check
(SURVEY.md §5.4: "changelog replay reconstructs final table state").

Plan shape (scale notes):
- two aggregations, zero joins: (pk, column) last-write, then pk-level
  widen — marker rows flow through as the NULL-column group, so liveness
  needs no separate aggregate or join;
- per (pk, column), the last change wins — ``max_by`` over the event
  ordering (commit_time, lsn, seq), an ordinary aggregate with map-side
  partial application, NOT a window + filter (no sort of full history);
- delete → re-insert starts a new EPOCH: a column value only counts if it
  was written strictly after the key's last delete marker (carried as an
  ord struct through the same aggregates — still zero joins). Without
  this, a pre-delete value leaks into the re-inserted row, which the
  serving-snapshot refresh correctly refuses to do — the two paths must
  agree (caught by test_serving.py::test_split_refresh_equals_full_reconstruct);
- the EAV→wide pivot is a conditional-aggregate projection over the fixed
  column list — no Spark ``pivot()`` metadata scan needed when the schema
  is known.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD


def reconstruct_state(
    changelog: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    as_of: dt.datetime | str | None = None,
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
    as_of_lsn: int | None = None,
) -> DataFrame:
    """Rebuild the (string-typed) current image of every live row.

    A row is live iff its latest marker event is not a delete. Values are
    the last ``new_value`` per column at or before ``as_of`` (a commit
    time) and/or ``as_of_lsn`` — the LSN form is the one SQL Server CDC
    consumers actually hold (``sys.fn_cdc_map_time_to_lsn`` hands them an
    LSN boundary, usp_cdc_populate_changelog.sql:241–253), and unlike a
    timestamp it is exact: two transactions in the same clock tick still
    split deterministically. Output: pk cols + one string column per
    value col (the changelog is type-erased — re-cast downstream if the
    source schema is known).
    """
    log = changelog
    if as_of is not None:
        log = log.filter(F.col("commit_time") <= F.lit(as_of).cast("timestamp"))
    if as_of_lsn is not None:
        log = log.filter(F.col("lsn") <= F.lit(as_of_lsn))

    avail = [c for c in order_cols if c in log.columns]
    ord_key = F.struct(*[F.col(c) for c in avail])

    # One pass, two aggregations, ZERO joins: marker rows (NULL column_name)
    # ride through the same (pk, column) grouping as their own NULL-keyed
    # group, so per-column last values AND liveness come out of a single
    # dataflow. The previous formulation (separate value/marker aggregates
    # + anti-join + union + left join) cost two extra shuffles and two join
    # exchanges — pure overhead at changelog scale.
    liveness_case = (
        F.when(F.col("old_value") == DELETED_RECORD, F.lit("dead"))
        .when(F.col("new_value") == NEW_RECORD, F.lit("live"))
        .otherwise(F.lit("live"))
    )
    per_key = log.groupBy(*pk_cols, "column_name").agg(
        F.max_by("new_value", ord_key).alias("last_value"),
        F.max_by(liveness_case, ord_key).alias("liveness"),
        F.max(ord_key).alias("last_ord"),
        # ord of the key's last delete marker (NULL-column group only) —
        # the epoch boundary: values written at or before it belong to a
        # previous incarnation of the row and must not leak into the
        # current one (delete → re-insert resets every column)
        F.max(
            F.when(F.col("old_value") == DELETED_RECORD, ord_key)
        ).alias("last_delete_ord"),
    )

    # rows with updates but no marker in range are treated as live
    # (the latest marker decides otherwise: insert → live, delete → gone)
    wide = per_key.groupBy(*pk_cols).agg(
        *[
            F.max(
                F.when(
                    F.col("column_name") == c,
                    F.struct(
                        F.col("last_ord").alias("o"),
                        F.col("last_value").alias("v"),
                    ),
                )
            ).alias(f"_s_{c}")
            for c in value_cols
        ],
        F.max(F.when(F.col("column_name").isNull(), F.col("liveness"))).alias(
            "__liveness"
        ),
        F.max(
            F.when(F.col("column_name").isNull(), F.col("last_delete_ord"))
        ).alias("__del_ord"),
    )
    current_epoch = lambda c: F.col("__del_ord").isNull() | (  # noqa: E731
        F.col(f"_s_{c}")["o"] > F.col("__del_ord")
    )
    return wide.filter(
        F.col("__liveness").isNull() | (F.col("__liveness") == "live")
    ).select(
        *pk_cols,
        *[
            F.when(current_epoch(c), F.col(f"_s_{c}")["v"]).alias(c)
            for c in value_cols
        ],
    )


def snapshot_tables_at_lsn(
    changelog: DataFrame,
    specs: dict[str, tuple[list[str], list[str]]],
    as_of_lsn: int,
) -> DataFrame:
    """Transactionally CONSISTENT multi-table snapshot: every table in
    ``specs`` (table → (pk_cols, value_cols)) reconstructed from the
    shared changelog at the SAME LSN boundary — the guarantee a
    multi-table source transaction needs downstream (an order and its
    tax row committed under one LSN either both show or both don't;
    a per-table timestamp cut cannot promise that).

    Output is one EAV frame across tables — (table_name, row_key,
    column_name, value) — so heterogeneous table schemas coexist;
    ``row_key`` is the '|'-joined pk. Per table it is exactly
    :func:`reconstruct_state` (two aggregations, zero joins); the
    table filter prunes the sink's table_name partitions.
    """
    frames = []
    for table, (pk_cols, value_cols) in specs.items():
        st = reconstruct_state(
            changelog.filter(F.col("table_name") == table),
            pk_cols,
            value_cols,
            as_of_lsn=as_of_lsn,
        )
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols])
        melted = st.select(
            F.lit(table).alias("table_name"),
            key.alias("row_key"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in value_cols
                    ]
                )
            ).alias("e"),
        ).select("table_name", "row_key", "e.column_name", "e.value")
        frames.append(melted)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def reconstruct_series(
    changelog: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    cuts: list[int],
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
    max_cuts_per_pass: int = 8,
) -> DataFrame:
    """State of every live row at EACH of several LSN cuts, in
    ⌈C/K⌉ passes over the changelog — the backtesting/"state at every
    month end" series a consumer otherwise gets by running
    ``reconstruct_state`` per cut (C scans, C shuffles) or
    materializing every snapshot.

    Same dataflow as :func:`reconstruct_state` evaluated at C boundaries
    via bounded conditional aggregates (the generalization
    ``operators.diff.snapshot_diff`` applies at C=2): per pass, two hash
    aggregations, ZERO joins, K× the aggregate-buffer width, one
    explode; epoch correctness (delete → re-insert between cuts) holds
    at every boundary independently. Cuts are processed in batches of
    ``max_cuts_per_pass`` (K) and the per-batch results unioned: an
    unbounded C inflates whole-stage-codegen size superlinearly and a
    fresh JVM pays 2-4× the query's own runtime in JIT (measured
    NOTES_r10: 6.8-12.3 s cold vs 3.2-3.9 s warmed at C=12) — K=8
    keeps each generated aggregate small while each batch still scans
    the changelog once, pruned to lsn <= max(batch). Output: ``cut`` +
    pk cols + value cols (string-typed), one row per (cut, live row at
    that cut) — output size is the series' own size, the irreducible
    cost.
    """
    if not cuts:
        raise ValueError("need at least one cut")
    if max_cuts_per_pass < 1:
        raise ValueError("max_cuts_per_pass must be >= 1")
    all_cuts = sorted({int(c) for c in cuts})
    if len(all_cuts) > max_cuts_per_pass:
        out = None
        for i in range(0, len(all_cuts), max_cuts_per_pass):
            part = reconstruct_series(
                changelog,
                pk_cols,
                value_cols,
                all_cuts[i : i + max_cuts_per_pass],
                order_cols,
                max_cuts_per_pass,
            )
            out = part if out is None else out.unionByName(part)
        return out
    cut_list = all_cuts
    log = changelog.filter(F.col("lsn") <= F.lit(cut_list[-1]))
    avail = [c for c in order_cols if c in log.columns]
    ord_key = F.struct(*[F.col(c) for c in avail])
    liveness = (
        F.when(F.col("old_value") == DELETED_RECORD, F.lit("dead"))
        .when(F.col("new_value") == NEW_RECORD, F.lit("live"))
        .otherwise(F.lit("live"))
    )

    def last_at(i: int, cut_lsn: int):
        cut = F.col("lsn") <= F.lit(cut_lsn)

        def b(e):
            return F.when(cut, e)

        return [
            F.max_by(b(F.col("new_value")), b(ord_key)).alias(f"_v{i}"),
            F.max_by(b(liveness), b(ord_key)).alias(f"_live{i}"),
            F.max(b(ord_key)).alias(f"_ord{i}"),
            F.max(
                b(F.when(F.col("old_value") == DELETED_RECORD, ord_key))
            ).alias(f"_del{i}"),
        ]

    per_key = log.groupBy(*pk_cols, "column_name").agg(
        *[e for i, c in enumerate(cut_list) for e in last_at(i, c)]
    )

    def wide_at(i: int):
        cols = [
            F.max(
                F.when(
                    F.col("column_name") == c,
                    F.struct(
                        F.col(f"_ord{i}").alias("o"),
                        F.col(f"_v{i}").alias("v"),
                    ),
                )
            ).alias(f"_s{i}_{c}")
            for c in value_cols
        ]
        cols.append(
            F.max(
                F.when(F.col("column_name").isNull(), F.col(f"_live{i}"))
            ).alias(f"_m{i}")
        )
        cols.append(
            F.max(
                F.when(F.col("column_name").isNull(), F.col(f"_del{i}"))
            ).alias(f"_e{i}")
        )
        cols.append(F.max(F.col(f"_ord{i}").isNotNull()).alias(f"_seen{i}"))
        return cols

    wide = per_key.groupBy(*pk_cols).agg(
        *[e for i in range(len(cut_list)) for e in wide_at(i)]
    )

    def val(i: int, c: str):
        s = F.col(f"_s{i}_{c}")
        in_epoch = F.col(f"_e{i}").isNull() | (s["o"] > F.col(f"_e{i}"))
        return F.when(s.isNotNull() & in_epoch, s["v"])

    def live(i: int):
        return F.col(f"_seen{i}") & (
            F.col(f"_m{i}").isNull() | (F.col(f"_m{i}") == "live")
        )

    states = F.array(
        *[
            F.struct(
                F.lit(cut).cast("long").alias("cut"),
                live(i).alias("live"),
                *[val(i, c).alias(c) for c in value_cols],
            )
            for i, cut in enumerate(cut_list)
        ]
    )
    return (
        wide.select(*pk_cols, F.explode(states).alias("_st"))
        .filter(F.col("_st.live"))
        .select(
            F.col("_st.cut").alias("cut"),
            *pk_cols,
            *[F.col(f"_st.{c}").alias(c) for c in value_cols],
        )
    )
