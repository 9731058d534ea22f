"""Apply a net-changes window to a target snapshot — the consumer-side
MERGE that SQL Server users run downstream of the reference's changelog
(``MERGE INTO target USING fn_cdc_get_net_changes_… ON pk`` — the
documented net-changes consumption pattern; the reference's repo stops at
populating the changelog, usp_cdc_populate_changelog.sql:397, and leaves
this apply step to its consumers).

Semantics (row-level, idempotent for a fixed window):

- net **insert** / **update** → upsert the net ``after`` image (whole-row
  overwrite; net images are full rows, so no per-column merge is needed);
- net **delete** → remove the key;
- keys absent from the net frame pass through untouched.

Plan shape (the 100 TB posture): NOT a full-outer join. A full outer
shuffles the entire target every window; instead

    result = (target ⟕anti touched-keys) ∪all upsert-images

both joins keyed on the pk. The net side is one window's worth of keys —
orders of magnitude smaller than the target — so the anti join broadcasts
it (hint with ``broadcast_net=True`` when the window is known-small;
otherwise AQE's size estimate decides) and the TARGET NEVER SHUFFLES. The
union appends the (tiny) upsert frame. With a partitioned/bucketed target
sink, downstream writers can additionally restrict the rewrite to touched
buckets (see operators.serving.refresh_state_snapshot for that form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    target: DataFrame,
    net: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    broadcast_net: bool = False,
) -> DataFrame:
    """Merge a :func:`operators.net_changes.net_changes` frame into a
    target snapshot of schema (pk_cols + value_cols).

    ``net`` must carry the pk columns, ``net_op`` and the ``after`` struct
    (full row image for inserts/updates, NULL for deletes), with AT MOST
    ONE row per key — exactly what net_changes emits; feeding a raw
    multi-event window here would upsert a key once per event. Upserted
    values are cast to the target's column types, so a type-erased
    (string-typed) changelog snapshot merges cleanly with a typed net
    image.
    """
    dtypes = {f.name: f.dataType for f in target.schema.fields}
    touched = net.select(*pk_cols).distinct()
    if broadcast_net:
        touched = F.broadcast(touched)
    upserts = net.filter(F.col("net_op") != "delete").select(
        *[F.col(c).cast(dtypes[c]).alias(c) for c in pk_cols],
        *[
            F.col(f"after.{c}").cast(dtypes[c]).alias(c)
            for c in value_cols
        ],
    )
    untouched = target.join(touched, on=pk_cols, how="left_anti")
    return untouched.unionByName(upserts)
