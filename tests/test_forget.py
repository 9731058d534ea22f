"""Right-to-be-forgotten purge: logical anti-join, targeted file
rewrite (untouched files survive byte-identical by name), idempotence,
and no trace of purged keys in any downstream reconstruction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark import fs
from changedatacapture_reporting_spark.operators.forget import (
    purge_keys,
    purge_keys_from_sink,
)
from changedatacapture_reporting_spark.operators.populate import (
    populate_changelog,
)

SRC = T.StructType(
    [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
)
SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("commit_ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("before", SRC, True),
        T.StructField("after", SRC, True),
    ]
)


def _ev(lsn, table, rid, month):
    t = dt.datetime(2024, month, 1, 9, 0, 0)
    return (lsn, 0, t, "insert", table, None, (rid, f"v{rid}"))


def test_purge_keys_from_sink_targets_only_affected_files(spark, tmp_path):
    """Keys living in one (table, month) partition: only that
    partition's files are rewritten; every other file survives with its
    exact name; a second purge is a no-op."""
    sink = str(tmp_path / "sink")
    # two tables × two months; key 7 lives only in (a, Jan)
    ev = [
        _ev(1, "a", 7, 1),
        _ev(2, "a", 8, 1),
        _ev(3, "a", 9, 2),
        _ev(4, "b", 7, 1),  # same id in table b — must NOT be purged
        _ev(5, "b", 10, 2),
    ]
    populate_changelog(spark, spark.createDataFrame(ev, SCHEMA), sink, ["id"])
    before = set(fs.list_data_files(spark, sink))

    keys = spark.createDataFrame([(7,)], "id int")
    # purge from table a only: scope the keys by reading back what we
    # intend to forget — here the operator purges by pk across the sink,
    # so table b's id=7 row is ALSO a hit; that is the GDPR semantic
    # (the subject's key, wherever it appears)
    res = purge_keys_from_sink(spark, sink, keys, ["id"])
    after = set(fs.list_data_files(spark, sink))

    assert res["rows_purged"] == 2  # a/Jan and b/Jan marker rows
    assert res["partitions_touched"] == 2
    log = spark.read.parquet(sink)
    assert log.filter(F.col("id") == 7).count() == 0
    assert log.count() == 3
    # untouched partitions' files survive by name
    untouched_before = {f for f in before if "commit_month=2024-01" not in f}
    assert untouched_before and untouched_before <= after

    res2 = purge_keys_from_sink(spark, sink, keys, ["id"])
    assert res2 == {
        "files_rewritten": 0,
        "rows_purged": 0,
        "partitions_touched": 0,
    }


def test_purge_adjusts_rollup_partials(spark, tmp_path):
    """ADVICE r07 item 3: the maintained _rollup_daily aggregate must
    shrink with the sink. After a purge, read_rollup == partials
    recomputed from the surviving rows (negative partials appended in
    the same replace commit), and a second purge changes nothing."""
    from changedatacapture_reporting_spark.operators.rollup import (
        _partials,
        read_rollup,
    )

    sink = str(tmp_path / "sink")
    ev = [
        _ev(1, "a", 7, 1),
        _ev(2, "a", 8, 1),
        _ev(3, "a", 9, 2),
        _ev(4, "b", 7, 1),
        _ev(5, "b", 10, 2),
    ]
    populate_changelog(spark, spark.createDataFrame(ev, SCHEMA), sink, ["id"])
    keys = spark.createDataFrame([(7,)], "id int")
    purge_keys_from_sink(spark, sink, keys, ["id"])

    def snap(df):
        return {
            (r.table_name, str(r.activity_date)): (
                r.n_changes, r.n_column_changes, r.n_inserts, r.n_deletes
            )
            for r in df.collect()
            if r.n_changes  # zeroed-out groups are equivalent to absent
        }

    survivors = spark.read.parquet(sink)
    assert snap(read_rollup(spark, sink)) == snap(_partials(survivors))

    purge_keys_from_sink(spark, sink, keys, ["id"])  # idempotent no-op
    assert snap(read_rollup(spark, sink)) == snap(_partials(survivors))


def test_purge_keys_logical_null_safe(spark):
    frame = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "z")], "id int, v string"
    )
    keys = spark.createDataFrame([(2,), (None,)], "id int")
    got = {r.v for r in purge_keys(frame, keys, ["id"]).collect()}
    assert got == {"x"}  # null key matches null row (null-safe equality)


def test_purge_hits_hive_escaped_partition_dirs(spark, tmp_path):
    """A ``table_name`` with a hive-escaped char (``:``) lands in a
    ``table_name=sch%3Atbl`` dir that input_file_name URI-encodes once
    more — the purge's affected-file paths must decode exactly once
    before being re-read or the rewrite silently skips the partition
    (keys survive a "successful" purge: the r12 regression)."""
    sink = str(tmp_path / "sink_esc")
    ev = [
        _ev(1, "sch:tbl", 7, 1),
        _ev(2, "sch:tbl", 8, 1),
        _ev(3, "plain", 7, 1),
    ]
    populate_changelog(spark, spark.createDataFrame(ev, SCHEMA), sink, ["id"])
    keys = spark.createDataFrame([(7,)], "id int")
    res = purge_keys_from_sink(spark, sink, keys, ["id"])
    assert res["rows_purged"] == 2 and res["partitions_touched"] == 2, res
    log = spark.read.parquet(sink)
    assert log.filter(F.col("id") == 7).count() == 0
    assert log.count() == 1


def test_purge_keys_from_delta_sink(spark, tmp_path):
    """The delta-format sink's erasure path (VERDICT r13 #7): vector
    DELETE + targeted OPTIMIZE through the same purge_keys_from_sink
    entry point. Values AND marker rows gone from every read, untouched
    files survive by name, the purge is idempotent, populate resume is
    unaffected, and vacuum physically reclaims the superseded files so
    the purged values leave the disk."""
    import os

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        vacuum_delta,
    )

    sink = str(tmp_path / "sink")
    ev = [
        _ev(1, "a", 7, 1),
        _ev(2, "a", 8, 1),
        _ev(3, "a", 9, 2),
        _ev(4, "b", 7, 1),
        _ev(5, "b", 10, 2),
    ]
    populate_changelog(
        spark, spark.createDataFrame(ev, SCHEMA), sink, ["id"],
        maintain_rollup=False, sink_format="delta",
    )
    before = set(fs.list_data_files(spark, sink))

    keys = spark.createDataFrame([(7,)], "id int")
    res = purge_keys_from_sink(spark, sink, keys, ["id"])
    assert res["rows_purged"] == 2  # a/Jan and b/Jan rows
    assert res["files_rewritten"] == 2
    assert res["partitions_touched"] == 2

    log = read_delta(spark, sink)
    assert log.filter(F.col("id") == 7).count() == 0
    assert log.count() == 3
    # untouched months' files survive by name
    after = set(fs.list_data_files(spark, sink))
    untouched = {f for f in before if "commit_month=2024-02" in f}
    assert untouched and untouched <= after

    # idempotent
    res2 = purge_keys_from_sink(spark, sink, keys, ["id"])
    assert res2 == {
        "files_rewritten": 0,
        "rows_purged": 0,
        "partitions_touched": 0,
    }

    # populate resume still works on top of the purge commits
    more = spark.createDataFrame([_ev(6, "a", 11, 2)], SCHEMA)
    r = populate_changelog(
        spark, more, sink, ["id"],
        maintain_rollup=False, sink_format="delta",
    )
    assert r.rows_changed == 1
    assert read_delta(spark, sink).count() == 4

    # vacuum reclaims the superseded files: the purged value bytes
    # leave the DISK, not just the live set
    vacuum_delta(spark, sink, retain_versions=1, orphan_min_age_minutes=0)
    disk = [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(sink)
        for f in fns
        if f.endswith(".parquet") and "_delta_log" not in dp
    ]
    hits = [
        p
        for p in disk
        if spark.read.parquet(p).filter(F.col("id") == 7).count()
    ]
    assert hits == []
    # and the surviving table still reads exactly
    assert read_delta(spark, sink).count() == 4
