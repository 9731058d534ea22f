"""Net-changes view over a CDC event window — the ``fn_cdc_get_net_changes``
analog.

The reference consumes SQL Server CDC exclusively through
``fn_cdc_get_all_changes_*`` (usp_cdc_populate_changelog.sql:319 builds the
function name, :331 reads it). SQL Server's public CDC API has a second
table-valued function the reference's users also have available:
``fn_cdc_get_net_changes_<capture_instance>``, which collapses an LSN
window to AT MOST ONE row per key — the *net* effect of every change in
the window. That is the natural input for idempotent downstream merges
(apply each key once instead of replaying its history), so a user
switching from the reference's source system expects it to exist.

Net semantics (the documented SQL Server mapping, re-expressed):

- key did not exist at window start (first in-window op is ``insert``)
  and exists at window end → net **insert** (final after image);
- existed and still exists → net **update** (first before image, final
  after image — intermediate states collapse);
- existed and was deleted → net **delete** (first before image);
- inserted AND deleted inside the window → **no row** (net zero).

Plan shape (the 100 TB posture): ONE hash aggregation on
(table_name, pk) with map-side partial application — ``min_by``/``max_by``
over the event ordering (lsn, seq) pick the boundary ops/images without a
window function (no sort of the full window) and without any join. The
LSN-range filter sits directly on the scan, so parquet row-group pruning
applies before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def net_changes(
    events: DataFrame,
    pk_cols: list[str],
    from_lsn: int | None = None,
    to_lsn: int | None = None,
) -> DataFrame:
    """Collapse an event window to one net row per (table_name, pk).

    Output: table_name, pk cols, ``net_op`` ∈ {insert, update, delete},
    ``before`` (NULL for net inserts), ``after`` (NULL for net deletes),
    ``last_lsn``, ``last_commit_ts``. Keys whose window history nets to
    zero (insert → … → delete) emit nothing.
    """
    ev = events
    if from_lsn is not None:
        ev = ev.filter(F.col("lsn") >= F.lit(from_lsn))
    if to_lsn is not None:
        ev = ev.filter(F.col("lsn") <= F.lit(to_lsn))

    ord_key = F.struct(F.col("lsn"), F.col("seq"))
    pk_exprs = [
        F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
        for c in pk_cols
    ]
    g = ev.select(
        "table_name", *pk_exprs, "lsn", "seq", "commit_ts", "op",
        "before", "after",
    ).groupBy("table_name", *pk_cols).agg(
        F.min_by("op", ord_key).alias("_first_op"),
        F.max_by("op", ord_key).alias("_last_op"),
        # first before / last after are evaluated lazily below: when the
        # key existed at the window edge, the edge event carries the
        # corresponding non-null image, so no null-skipping is needed
        F.min_by("before", ord_key).alias("_first_before"),
        F.max_by("after", ord_key).alias("_last_after"),
        F.max("lsn").alias("last_lsn"),
        F.max_by("commit_ts", ord_key).alias("last_commit_ts"),
    )

    existed_before = F.col("_first_op") != "insert"
    exists_after = F.col("_last_op") != "delete"
    net_op = (
        F.when(existed_before & exists_after, F.lit("update"))
        .when(~existed_before & exists_after, F.lit("insert"))
        .otherwise(F.lit("delete"))
    )
    return g.filter(existed_before | exists_after).select(
        "table_name",
        *pk_cols,
        net_op.alias("net_op"),
        F.when(existed_before, F.col("_first_before")).alias("before"),
        F.when(exists_after, F.col("_last_after")).alias("after"),
        "last_lsn",
        "last_commit_ts",
    )
