"""Right-to-be-forgotten: purge every trace of a key set from CDC
artifacts — the erasure obligation (GDPR Art. 17 / CCPA) that a
changelog-keeping pipeline cannot satisfy with a plain DELETE, because
the history tables remember what the state table forgot.

Two forms:

- :func:`purge_keys` — the logical operator: anti-join a frame
  (changelog, SCD2 history, serving snapshot, corpus) against the key
  set. Broadcast the keys (an erasure batch is small); the big side
  never shuffles.
- :func:`purge_keys_from_sink` — the physical operator for a persisted
  changelog sink: locate the data FILES containing the keys (one scan,
  pushed-down key filter over the pk bloom filters / row-group stats
  the sink writer maintains), rewrite ONLY those files without the
  keys, and swap them through the same ``_COMMIT_REPLACE``
  marker-manifest protocol file compaction uses — crash on either side
  heals via ``populate.recover_sink``. I/O ∝ files touched by the keys,
  not sink size; untouched files (the overwhelming majority — a key
  lives in one table partition and a few months) are never read twice
  or rewritten.

Deliberately NOT tombstone-based: erasure must remove the values
themselves. The purge also removes the keys' marker rows; downstream
reconstructions simply never see the keys — same as if they had never
been captured (verified against the oracle in the contract).
"""

from __future__ import annotations

import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark import fs


def purge_keys(
    frame: DataFrame, keys: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """Frame minus all rows whose pk appears in ``keys`` (null-safe,
    broadcast anti-join — the frame side never shuffles)."""
    cond = [frame[c].eqNullSafe(keys[c]) for c in pk_cols]
    return frame.join(F.broadcast(keys.select(*pk_cols)), cond, "left_anti")


def purge_keys_from_sink(
    spark: SparkSession,
    sink_path: str,
    keys: DataFrame,
    pk_cols: list[str],
) -> dict[str, int]:
    """Erase ``keys`` from a populated changelog sink in place.

    Returns ``{"files_rewritten": …, "rows_purged": …,
    "partitions_touched": …}``. Idempotent: a second run finds no
    affected files. Crash-safe: the staged rewrite commits through the
    ``_COMMIT_REPLACE`` manifest (old generation = exactly the affected
    files), healed from either side by ``recover_sink`` — which runs
    first, so a crashed previous purge/compaction completes before this
    one measures anything.

    A ``sink_format='delta'`` sink (``populate_changelog``'s Delta
    twin) is detected by its ``_delta_log`` and routed through the
    table format's own machinery instead (VERDICT r13 #7):
    ``delete_delta(deletion_vectors=True)`` marks the keys' rows dead
    without rewriting untouched bytes, an immediate targeted
    ``optimize_delta`` rewrites ONLY the vector-bearing files so the
    VALUES physically leave the live file set, and the caller's
    ``vacuum_delta(retain_versions=1)`` reclaims the superseded files —
    erasure is complete once vacuum runs (until then the old versions
    remain time-travelable, which a GDPR workflow must follow with the
    vacuum; the same is true of any Delta engine's DELETE).
    """
    from changedatacapture_reporting_spark.operators.populate import (
        REPLACE_MARKER,
        STAGING_ROOT,
        _publish_replace,
        recover_sink,
        sink_write_options,
    )

    if fs.exists(spark, fs.join(sink_path, "_delta_log")):
        return _purge_keys_from_delta_sink(spark, sink_path, keys, pk_cols)

    recover_sink(spark, sink_path)
    key_rows = keys.select(*pk_cols)

    # one discovery scan: which data files contain any of the keys?
    # (pk bloom filters + row-group stats prune; the key filter is a
    # broadcast semi join)
    # persisted: the matched rows (tiny — an erasure batch's footprint)
    # feed BOTH the affected-file discovery and the negative rollup
    # partials below; without the persist the sink would be scanned
    # twice for the same hits
    tagged = (
        spark.read.parquet(sink_path)
        .withColumn("_file", F.input_file_name())
        .join(F.broadcast(key_rows), pk_cols, "left_semi")
        .persist()
    )
    try:
        affected = [
            r._file for r in tagged.select("_file").distinct().collect()
        ]
        if not affected:
            return {
                "files_rewritten": 0,
                "rows_purged": 0,
                "partitions_touched": 0,
            }

        # input_file_name is URI-encoded once over the filesystem names;
        # decode once so hive-escaped partition dirs (``t=a%3Ab``) map
        # back to real paths — re-reading the raw URI form would miss
        # the file and the purge would silently skip those keys
        base = sink_path.rstrip("/")
        rels = []
        for f in (unquote(x) for x in affected):
            i = f.find(base)
            rels.append(f[i + len(base) + 1 :] if i >= 0 else f)
        by_part: dict[str, list[str]] = {}
        for rel in rels:
            part, _, name = rel.rpartition("/")
            by_part.setdefault(part, []).append(name)

        run_id = "purge-" + uuid.uuid4().hex
        staging = fs.join(sink_path, STAGING_ROOT, run_id)
        rows_purged = 0
        for part, names in sorted(by_part.items()):
            paths = [fs.join(sink_path, part, n) for n in names]
            df = spark.read.parquet(*paths)
            kept = purge_keys(df, key_rows, pk_cols)
            rows_purged += df.count() - kept.count()
            (
                kept.repartition(1)
                .write.mode("overwrite")
                .options(**sink_write_options())
                .parquet(fs.join(staging, "data", part))
            )
        # the maintained _rollup_daily aggregate must shrink with the
        # sink: stage NEGATIVE partials for the purged rows (counts are
        # algebraic) so read_rollup stays exact after the swap —
        # promoted by _publish_replace inside the same commit, so data
        # and rollup can never disagree across a crash
        from changedatacapture_reporting_spark.operators.rollup import (
            ROLLUP_DIR,
            write_negative_partials,
        )

        if fs.exists(spark, fs.join(sink_path, ROLLUP_DIR)):
            write_negative_partials(
                tagged.drop("_file"),
                fs.join(staging, ROLLUP_DIR),
                mode="overwrite",
            )
        # COMMIT POINT — marker written after all staged parts landed
        fs.write_text(
            spark, fs.join(staging, REPLACE_MARKER), "\n".join(sorted(rels))
        )
        _publish_replace(spark, staging, sink_path)
        return {
            "files_rewritten": len(rels),
            "rows_purged": rows_purged,
            "partitions_touched": len(by_part),
        }
    finally:
        tagged.unpersist()


def _purge_keys_from_delta_sink(
    spark: SparkSession,
    sink_path: str,
    keys: DataFrame,
    pk_cols: list[str],
) -> dict[str, int]:
    """Delta-format twin of the parquet purge: vector DELETE (write
    amplification ∝ deleted rows — the discovery scan is key +
    row-position metadata only) followed by a TARGETED OPTIMIZE
    (``target_file_bytes=0`` compacts nothing except the files now
    carrying vectors), so the purged values leave the live file set in
    two commits and untouched files survive by name. Same result shape
    and idempotence as the parquet path; crash between the two commits
    is safe (the vectors already hide every purged row — a re-run's
    delete matches nothing and the optimize still folds the vectors)."""
    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
        delete_delta,
        optimize_delta,
    )

    res = delete_delta(
        spark,
        sink_path,
        keys.select(*pk_cols).distinct(),
        deletion_vectors=True,
    )
    # fold any vectors into clean files — including a crashed previous
    # purge's (version None = nothing newly matched, but vectors may
    # still be pending fold)
    opt = optimize_delta(spark, sink_path, target_file_bytes=0)
    if res["version"] is None and opt["version"] is None:
        return {
            "files_rewritten": 0,
            "rows_purged": 0,
            "partitions_touched": 0,
        }
    # touched files/partitions from the delete commit's metadata (log
    # replay only — no data read): everything whose add changed or left
    if res["version"] is not None:
        before = _resolve_log(spark, sink_path, res["version"] - 1)["files"]
        after = _resolve_log(spark, sink_path, res["version"])["files"]
        touched = [
            a
            for p, a in before.items()
            if p not in after or after[p] != a
        ]
    else:
        touched = []
    parts = {
        tuple(sorted((a.get("partitionValues") or {}).items()))
        for a in touched
    }
    return {
        "files_rewritten": len(touched),
        "rows_purged": int(res["rows_deleted"]),
        "partitions_touched": len(parts),
    }
