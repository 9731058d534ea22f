"""Serving-state snapshot: the changelog materialized as a current-state
table, refreshed INCREMENTALLY — the consumption pattern that makes a
100 TB changelog usable for point reads without replaying history.

Layout: one row per live source row (pk cols + string-typed value cols +
``__lsn``, the last LSN applied to that pk), parquet-partitioned by
``state_bucket = pmod(xxhash64(pk…), n_buckets)``. A refresh:

1. selects changelog rows past the snapshot watermark (an ``lsn >``
   filter — prunes to new files via row-group stats, never history);
2. reduces the delta to per-pk state (same zero-join aggregate shape as
   :func:`..reconstruct.reconstruct_state`, plus per-column TOUCHED
   flags so an explicit ``NULL``-set is not confused with "untouched");
3. full-outer merges it with the CURRENT snapshot rows of only the
   buckets containing changed pks (partition pruning on
   ``state_bucket``);
4. rewrites exactly those bucket partitions through the same
   marker-manifest replace commit the file compactor uses
   (``populate._publish_replace``) — crash on either side of the marker
   is healed by ``populate.recover_sink`` on the snapshot dir.

So refresh I/O ∝ (delta + touched buckets), not state size; bucket
count trades rewrite granularity against file count. The watermark meta
is advanced AFTER publish — a crash in between re-applies the same
delta, which the merge makes idempotent (last-writer-wins by lsn, and
re-applying identical per-column values is a fixpoint).

Merge semantics per pk present in both sides, driven by the delta's
latest marker: ``dead`` (delete) drops the row; ``live`` (insert marker
— a re-insert epoch) REPLACES the row with delta-provided columns only
(values from before the delete must not leak into the new epoch); no
marker (updates only) merges per column, delta value where touched.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark import fs
from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD

META_FILE = "_state_meta.json"
BUCKET_COL = "state_bucket"


def _bucket(pk_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*pk_cols), F.lit(n_buckets)).cast("int")


def _delta_state(
    changelog: DataFrame,
    pk_cols: list[str],
    value_cols: list[str],
    order_cols: tuple[str, ...] = ("commit_time", "lsn", "seq"),
) -> DataFrame:
    """Per-pk reduction of a changelog slice: per-column (touched, last
    value), latest-marker liveness (NULL = no marker in slice), max lsn.
    Two aggregations, zero joins — the reconstruct_state shape."""
    avail = [c for c in order_cols if c in changelog.columns]
    ord_key = F.struct(*[F.col(c) for c in avail])
    liveness = (
        F.when(F.col("old_value") == DELETED_RECORD, F.lit("dead"))
        .when(F.col("new_value") == NEW_RECORD, F.lit("live"))
        .otherwise(F.lit("live"))
    )
    per_key = changelog.groupBy(*pk_cols, "column_name").agg(
        F.max_by("new_value", ord_key).alias("_v"),
        F.max_by(liveness, ord_key).alias("_live"),
        F.max(ord_key).alias("_ord"),
        F.max(
            F.when(F.col("old_value") == DELETED_RECORD, ord_key)
        ).alias("_del_ord"),
        F.max("lsn").alias("_lsn"),
    )
    wide = per_key.groupBy(*pk_cols).agg(
        *[
            F.max(
                F.when(
                    F.col("column_name") == c,
                    F.struct(
                        F.lit(True).alias("t"),
                        F.col("_v").alias("v"),
                        F.col("_ord").alias("o"),
                    ),
                )
            ).alias(f"_sr_{c}")
            for c in value_cols
        ],
        F.max(F.when(F.col("column_name").isNull(), F.col("_live"))).alias(
            "__marker"
        ),
        F.max(
            F.when(F.col("column_name").isNull(), F.col("_del_ord"))
        ).alias("__del_ord"),
        F.max("_lsn").alias("__lsn"),
    )
    # epoch filter WITHIN the slice (same rule as reconstruct_state): a
    # column write at or before the slice's last delete marker belongs to
    # a dead incarnation — drop it so "touched" means touched in the
    # current epoch. Keeps the _s_<c> struct(t, v) consumer contract.
    return wide.select(
        *pk_cols,
        *[
            F.when(
                F.col(f"_sr_{c}").isNotNull()
                & (
                    F.col("__del_ord").isNull()
                    | (F.col(f"_sr_{c}")["o"] > F.col("__del_ord"))
                ),
                F.struct(
                    F.col(f"_sr_{c}")["t"].alias("t"),
                    F.col(f"_sr_{c}")["v"].alias("v"),
                ),
            ).alias(f"_s_{c}")
            for c in value_cols
        ],
        "__marker",
        "__lsn",
    )


def _read_meta(spark: SparkSession, snapshot_path: str) -> dict:
    return json.loads(fs.read_text(spark, fs.join(snapshot_path, META_FILE)))


def _write_meta(
    spark: SparkSession,
    snapshot_path: str,
    watermark_lsn: int,
    n_buckets: int,
    schema_json: str | None = None,
) -> None:
    meta = {"watermark_lsn": watermark_lsn, "n_buckets": n_buckets}
    if schema_json is not None:
        meta["schema"] = schema_json
    fs.write_text(
        spark, fs.join(snapshot_path, META_FILE), json.dumps(meta)
    )


def read_state_snapshot(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """Read the snapshot with the EXPLICIT schema persisted in
    ``_state_meta.json``. This is the only safe read path: a legal
    refresh can leave the survivor set empty, and a ``partitionBy``
    write of an empty frame produces ZERO schema-bearing files — a
    plain ``spark.read.parquet`` on that directory dies with
    ``UNABLE_TO_INFER_SCHEMA``. With the schema pinned in the meta, an
    emptied snapshot reads back as a 0-row typed frame and the next
    refresh proceeds normally. Falls back to inference only for
    pre-schema metas (heals forward: the next refresh rewrites the
    meta with the schema)."""
    meta = _read_meta(spark, snapshot_path)
    schema_json = meta.get("schema")
    if schema_json is None:
        return spark.read.parquet(snapshot_path)
    raw = T.StructType.fromJson(json.loads(schema_json))
    # parquet never enforces declared non-nullability; relax it so the
    # stored schema can't reject a file written by an older build
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in raw.fields]
    )
    return spark.read.schema(schema).parquet(snapshot_path)


def build_state_snapshot(
    spark: SparkSession,
    changelog: DataFrame,
    snapshot_path: str,
    pk_cols: list[str],
    value_cols: list[str],
    n_buckets: int = 64,
) -> int:
    """Initial full materialization. Returns the live-row count."""
    state = _delta_state(changelog, pk_cols, value_cols)
    live = state.filter(
        F.col("__marker").isNull() | (F.col("__marker") == "live")
    )
    out = live.select(
        *pk_cols,
        *[F.col(f"_s_{c}")["v"].alias(c) for c in value_cols],
        F.col("__lsn"),
        _bucket(pk_cols, n_buckets).alias(BUCKET_COL),
    )
    (
        out.repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(snapshot_path)
    )
    wm = changelog.agg(F.max("lsn")).head()[0] or 0
    # the schema rides in the meta so an all-dead changelog (zero data
    # files written above) still yields a READABLE snapshot
    _write_meta(spark, snapshot_path, int(wm), n_buckets, out.schema.json())
    return read_state_snapshot(spark, snapshot_path).count()


def refresh_state_snapshot(
    spark: SparkSession,
    changelog: DataFrame,
    snapshot_path: str,
    pk_cols: list[str],
    value_cols: list[str],
    broadcast_delta_rows: int = 1_000_000,
) -> dict[str, int]:
    """Incremental refresh from changelog rows past the snapshot
    watermark. Rewrites only the bucket partitions containing changed
    pks; all other buckets are untouched (verified by file listing in
    tests). Idempotent: re-running after a crash between publish and
    meta advance re-applies the same delta to the same result.

    Join strategy (r12): the per-pk delta row count is known BEFORE the
    merge is planned (the same aggregate that finds the touched
    buckets), so when it is at most ``broadcast_delta_rows`` the
    full-outer merge — which Spark can only run as a both-sides-shuffle
    sort-merge join — is decomposed into (a) a BROADCAST left-outer of
    the touched buckets against the delta (the state side, full-width,
    never shuffles) plus (b) a pk-only anti-join for brand-new keys
    (shuffles just the key column of the touched buckets). At 100 TB
    with wide value columns this removes the dominant shuffle of the
    steady path; a bulk backfill past the threshold keeps the
    full-outer shape.

    Returns ``{"rows_applied": …, "buckets_rewritten": …,
    "watermark_lsn": …}``.
    """
    from changedatacapture_reporting_spark.operators.populate import (
        REPLACE_MARKER,
        STAGING_ROOT,
        _publish_replace,
        recover_sink,
    )

    recover_sink(spark, snapshot_path)  # heal a crashed previous refresh
    meta = _read_meta(spark, snapshot_path)
    wm, n_buckets = meta["watermark_lsn"], meta["n_buckets"]

    delta_log = changelog.filter(F.col("lsn") > F.lit(wm))
    delta = _delta_state(delta_log, pk_cols, value_cols).withColumn(
        BUCKET_COL, _bucket(pk_cols, n_buckets)
    )
    delta.persist()
    try:
        agg = delta.agg(
            F.collect_set(BUCKET_COL).alias("buckets"),
            F.max("__lsn").alias("max_lsn"),
            F.count("*").alias("n"),
        ).head()
        buckets = sorted(agg.buckets or [])
        if not buckets:
            return {
                "rows_applied": 0,
                "buckets_rewritten": 0,
                "watermark_lsn": wm,
            }

        old = read_state_snapshot(spark, snapshot_path).filter(
            F.col(BUCKET_COL).isin(buckets)
        )
        o = old.alias("o")
        d = delta.alias("d")
        cond = [o[c].eqNullSafe(d[c]) for c in pk_cols]
        small = int(agg.n) <= broadcast_delta_rows
        j = (
            o.join(F.broadcast(d), cond, "left_outer")
            if small
            else o.join(d, cond, "full_outer")
        )

        in_new = d["__lsn"].isNotNull()
        dropped = in_new & (d["__marker"] == "dead")
        reinserted = in_new & (d["__marker"] == "live")
        merged_cols = []
        for c in value_cols:
            s = d[f"_s_{c}"]
            merged_cols.append(
                F.when(reinserted, s["v"])
                .when(in_new & s.isNotNull(), s["v"])  # touched update
                .otherwise(o[c])
                .alias(c)
            )
        out = (
            j.filter(~dropped | dropped.isNull())
            .select(
                *[F.coalesce(o[c], d[c]).alias(c) for c in pk_cols],
                *merged_cols,
                F.greatest(o["__lsn"], d["__lsn"]).alias("__lsn"),
                F.coalesce(o[BUCKET_COL], d[BUCKET_COL]).alias(BUCKET_COL),
            )
        )
        if small:
            # brand-new pks (absent from the snapshot): the full-outer's
            # right-only rows, recovered via a pk-only anti-join — the
            # state side contributes just its key column to the shuffle
            anti_cond = [
                delta[c].eqNullSafe(old[c]) for c in pk_cols
            ]
            fresh = delta.join(
                old.select(*pk_cols), anti_cond, "left_anti"
            ).filter(
                F.col("__marker").isNull() | (F.col("__marker") != "dead")
            )
            fresh_rows = fresh.select(
                *pk_cols,
                *[
                    F.when(
                        F.col(f"_s_{c}").isNotNull(), F.col(f"_s_{c}")["v"]
                    ).alias(c)
                    for c in value_cols
                ],
                F.col("__lsn"),
                F.col(BUCKET_COL),
            )
            out = out.unionByName(fresh_rows)

        run_id = "refresh-" + uuid.uuid4().hex
        staging = fs.join(snapshot_path, STAGING_ROOT, run_id)
        (
            out.repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(fs.join(staging, "data"))
        )
        old_generation = [
            f"{BUCKET_COL}={b}/{name}"
            for b in buckets
            # a bucket can be brand-new (first pk hashing into it)
            if fs.exists(spark, fs.join(snapshot_path, f"{BUCKET_COL}={b}"))
            for name in fs.list_data_files(
                spark, fs.join(snapshot_path, f"{BUCKET_COL}={b}")
            )
        ]
        fs.write_text(
            spark,
            fs.join(staging, REPLACE_MARKER),
            "\n".join(old_generation),
        )
        _publish_replace(spark, staging, snapshot_path)
        # carry the stored schema forward; heal a pre-schema meta from
        # the merged frame (its shape IS the snapshot shape)
        _write_meta(
            spark,
            snapshot_path,
            int(agg.max_lsn),
            n_buckets,
            meta.get("schema") or out.schema.json(),
        )
        return {
            "rows_applied": int(agg.n),
            "buckets_rewritten": len(buckets),
            "watermark_lsn": int(agg.max_lsn),
        }
    finally:
        delta.unpersist()
