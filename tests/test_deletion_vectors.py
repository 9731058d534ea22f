"""Deletion vectors (public Delta protocol, deletion-vector feature):
MERGE/DELETE mark rows dead in per-commit vectors instead of rewriting
touched files — write amplification ∝ deleted rows, not touched-file
bytes. These tests pin semantic equality with the rewrite paths, the
vector lifecycle (carry-over, checkpoint survival, OPTIMIZE purge,
VACUUM reclaim), the strengthened commit conflict check, and the
degenerate shapes (fully-dead files, delete-everything, stat-less
fallback)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark import fs
from changedatacapture_reporting_spark.sources.delta_table import (
    DV_DIR,
    _resolve_log,
    delete_delta,
    merge_delta,
    metadata_summary,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "v", "p").collect())


def _mk(spark, path, partition_by=("p",)):
    """Two appends over three partitions, one with hive-escaped chars
    and one with '+' (URLDecoder's trap char) — DV coordinates must
    survive both."""
    base = [(i, i * 10, ["c:d", "plain", "p+q"][i % 3]) for i in range(1, 21)]
    src = spark.createDataFrame(base, "id int, v int, p string")
    # one multi-row file per (append, partition value): deletes then mark
    # rows in surviving files instead of fully killing 1-row files
    write_delta(
        spark, src.filter(F.col("id") <= 10).repartition(1), path,
        partition_by=list(partition_by),
    )
    write_delta(
        spark, src.filter(F.col("id") > 10).repartition(1), path,
        partition_by=list(partition_by),
    )
    return src


def _live_dvs(spark, path):
    return [
        a["deletionVector"]
        for a in _resolve_log(spark, path, None)["files"].values()
        if a.get("deletionVector")
    ]


def test_dv_merge_equals_rewrite_merge(spark, tmp_path):
    """One MERGE carrying updates, inserts and deletes, run in vector
    mode and rewrite mode against identical clones: the logical tables
    must match exactly, the vector run must rewrite nothing, and time
    travel to the pre-merge version still shows the old rows."""
    dA, dB = str(tmp_path / "A"), str(tmp_path / "B")
    _mk(spark, dA)
    _mk(spark, dB)
    mrg = spark.createDataFrame(
        [(1, 111, "c:d", False), (20, 222, "plain", False),
         (25, 555, "p+q", False), (3, 0, "plain", True),
         (9, 0, "plain", True)],
        "id int, v int, p string, _del boolean",
    )
    rA = merge_delta(
        spark, mrg, dA, ["id"], delete_col="_del", deletion_vectors=True
    )
    rB = merge_delta(spark, mrg, dB, ["id"], delete_col="_del")
    assert _rows(read_delta(spark, dA)) == _rows(read_delta(spark, dB))
    assert rA["files_rewritten"] == 0
    assert rA["files_dv_updated"] >= 1 and rA["deletion_vector"]
    assert rB["files_rewritten"] >= 1
    # pre-merge snapshot unaffected
    assert read_delta(spark, dA, version=rA["version"] - 1).count() == 20


def test_dv_delete_never_rewrites_data_files(spark, tmp_path):
    """delete_delta in vector mode: every pre-existing DATA file
    survives on disk byte-identical by name — only a vector directory
    appears. The rewrite path would have swapped files; the vector path
    must not touch them."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = set(fs.list_data_files(spark, path))
    res = delete_delta(
        spark, path, spark.createDataFrame([(4,), (7,)], "id int")
    )
    assert res["rows_deleted"] == 2 and res["files_rewritten"] == 0
    after = set(fs.list_data_files(spark, path))
    assert before == after  # DV dir is underscore-hidden from listings
    assert fs.listdir(spark, fs.join(path, DV_DIR))
    got = {r["id"] for r in read_delta(spark, path).collect()}
    assert got == set(range(1, 21)) - {4, 7}


def test_dv_fully_dead_file_becomes_plain_remove(spark, tmp_path):
    """Deleting every row of one file drops its add entirely (no
    zero-live-row file lingers in the live set), while time travel to
    the prior version still reads it."""
    path = str(tmp_path / "t")
    a = spark.createDataFrame([(1, 10, "x"), (2, 20, "x")], "id int, v int, p string")
    b = spark.createDataFrame([(3, 30, "y")], "id int, v int, p string")
    write_delta(spark, a.repartition(1), path)
    write_delta(spark, b.repartition(1), path)
    res = delete_delta(
        spark, path, spark.createDataFrame([(1,), (2,)], "id int")
    )
    assert res["files_removed"] >= 1 and res["files_dv_updated"] == 0
    assert not _live_dvs(spark, path)  # nothing left carries a vector
    assert {r["id"] for r in read_delta(spark, path).collect()} == {3}
    assert read_delta(spark, path, version=res["version"] - 1).count() == 3


def test_dv_delete_everything_leaves_readable_table(spark, tmp_path):
    """A vector delete that kills every live row must leave a READABLE
    zero-row table (the r11 empty-generation audit applies to vectors
    too), and a follow-up append revives it."""
    path = str(tmp_path / "t")
    src = _mk(spark, path)
    res = delete_delta(spark, path, src.select("id"))
    assert res["rows_deleted"] == 20
    assert read_delta(spark, path).count() == 0
    write_delta(
        spark,
        spark.createDataFrame([(99, 990, "plain")], "id int, v int, p string"),
        path,
        partition_by=["p"],
    )
    assert _rows(read_delta(spark, path)) == [(99, 990, "plain")]


def test_dv_carry_over_across_commits(spark, tmp_path):
    """A second vector commit touching an already-vectored file carries
    the complete prior vector forward (descriptors never chain); the
    logical table tracks the rewrite clone at every step."""
    dA, dB = str(tmp_path / "A"), str(tmp_path / "B")
    _mk(spark, dA)
    _mk(spark, dB)
    for ids in ([2, 5], [8], [11, 5]):  # 5 repeated: idempotent delete
        keys = spark.createDataFrame([(i,) for i in ids], "id int")
        delete_delta(spark, dA, keys)
        delete_delta(spark, dB, keys, deletion_vectors=False)
        assert _rows(read_delta(spark, dA)) == _rows(read_delta(spark, dB))
    # the latest vector's cardinality counts the union, not the batch
    cards = {dv["cardinality"] for dv in _live_dvs(spark, dA)}
    assert cards and all(c >= 1 for c in cards)


def test_dv_checkpoint_preserves_vectors_and_stats(spark, tmp_path):
    """Checkpointing while vectors are live must carry BOTH the
    deletionVector descriptors (dropping one would resurrect deleted
    rows once json commits expire) and the stats strings (data skipping
    survives log compaction)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_delta(spark, path, spark.createDataFrame([(4,), (7,)], "id int"))
    before = _rows(read_delta(spark, path))
    write_checkpoint(spark, path)
    state = _resolve_log(spark, path, None)
    dvs = [a for a in state["files"].values() if a.get("deletionVector")]
    assert dvs and all(a.get("stats") for a in state["files"].values())
    assert _rows(read_delta(spark, path)) == before
    # skip-read equality through a checkpoint-replayed vector
    assert (
        read_delta(spark, path, skip=[("v", ">=", 100)]).count()
        == read_delta(spark, path).filter(F.col("v") >= 100).count()
    )


def test_checkpoint_written_before_dv_fields_reads_back(spark, tmp_path):
    """Back-compat: a checkpoint written by the pre-vector code (no
    stats / deletionVector columns) replays as plain stat-less adds —
    not an error, not phantom vectors."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_delta(spark, df, path)
    write_checkpoint(spark, path)
    # rewrite the checkpoint with the historical 5-field add struct
    log = fs.join(path, "_delta_log")
    cp_name = [n for n in fs.listdir(spark, log) if "checkpoint" in n][0]
    cp_path = fs.join(log, cp_name)
    tmp_cp = str(tmp_path / "cp_old")
    (
        spark.read.parquet(cp_path)
        .select(
            F.when(
                F.col("add").isNotNull(),
                F.struct(
                    F.col("add.path").alias("path"),
                    F.col("add.partitionValues").alias("partitionValues"),
                    F.col("add.size").alias("size"),
                    F.col("add.modificationTime").alias("modificationTime"),
                    F.col("add.dataChange").alias("dataChange"),
                ),
            ).alias("add"),
            "remove", "metaData", "protocol",
        )
        .repartition(1)
        .write.parquet(tmp_cp)
    )
    import os
    os.remove(cp_path)
    crc = fs.join(log, f".{cp_name}.crc")  # stale Hadoop checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)
    part = [n for n in fs.list_data_files(spark, tmp_cp)][0]
    os.replace(fs.join(tmp_cp, part), cp_path)
    state = _resolve_log(spark, path, None)
    assert all(not a.get("deletionVector") for a in state["files"].values())
    assert read_delta(spark, path).count() == 2


def test_optimize_purges_vectors(spark, tmp_path):
    """OPTIMIZE folds vectors into clean files regardless of file size,
    keeps the logical rows identical, and restores metadata-only
    aggregation (which must REFUSE while vectors are live)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_delta(
        spark, path, spark.createDataFrame([(4,), (7,), (13,)], "id int")
    )
    with pytest.raises(ValueError, match="deletion vectors"):
        metadata_summary(spark, path)
    before = _rows(read_delta(spark, path))
    res = optimize_delta(spark, path)
    assert res["version"] is not None
    assert not _live_dvs(spark, path)
    assert _rows(read_delta(spark, path)) == before
    ms = {r["column_name"]: r["n_rows"] for r in
          metadata_summary(spark, path).collect()}
    assert ms["v"] == 17


def test_vacuum_reclaims_superseded_vectors_only(spark, tmp_path):
    """Full-retention vacuum keeps every referenced vector directory;
    retain_versions=1 after an OPTIMIZE purge reclaims them all. A
    still-referenced vector must never be deleted (deleting one would
    resurrect rows)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    # both keys live in the SAME file (plain partition, first append),
    # so the second vector fully supersedes the first at the latest
    # version — dv1 stays reachable only through version 2
    delete_delta(spark, path, spark.createDataFrame([(4,)], "id int"))
    delete_delta(spark, path, spark.createDataFrame([(10,)], "id int"))
    dv_root = fs.join(path, DV_DIR)
    assert len(fs.listdir(spark, dv_root)) == 2
    before = _rows(read_delta(spark, path))
    vacuum_delta(spark, path)  # full retention: both versions referenced
    assert len(fs.listdir(spark, dv_root)) == 2
    assert _rows(read_delta(spark, path)) == before
    vacuum_delta(spark, path, retain_versions=1,
                 orphan_min_age_minutes=0)  # v1's vector drops
    assert len(fs.listdir(spark, dv_root)) == 1
    assert _rows(read_delta(spark, path)) == before
    optimize_delta(spark, path)
    vacuum_delta(spark, path, retain_versions=1, orphan_min_age_minutes=0)
    assert len(fs.listdir(spark, dv_root)) == 0
    assert _rows(read_delta(spark, path)) == before


def test_dv_commit_conflicts_with_concurrent_vector(spark, tmp_path):
    """The strengthened conflict check: a concurrent commit that
    re-adds a touched path with a DIFFERENT vector (path still present!)
    must abort the planned commit — committing over it would resurrect
    the concurrent delete."""
    from changedatacapture_reporting_spark import fs as _fs

    path = str(tmp_path / "t")
    _mk(spark, path)
    real_create = _fs.create_exclusive
    injected = {"done": False}

    def racing_create(sp, p, text=""):
        if not injected["done"] and "_delta_log/000000000000000000" in p:
            injected["done"] = True
            delete_delta(
                spark, path, spark.createDataFrame([(5,)], "id int")
            )
        return real_create(sp, p, text)

    _fs.create_exclusive = racing_create
    try:
        with pytest.raises(ValueError, match="delete conflict"):
            delete_delta(
                spark, path, spark.createDataFrame([(2,)], "id int")
            )
    finally:
        _fs.create_exclusive = real_create
    # the injected delete won; its vector is intact
    assert {r["id"] for r in read_delta(spark, path).collect()} == (
        set(range(1, 21)) - {5}
    )


def test_dv_skip_read_equality(spark, tmp_path):
    """Data skipping stays sound over vectored files: stats are
    over-approximations (they still count dead rows), so pruning only
    keeps extra files — skip-reads equal plain filters, including a
    probe that matches ONLY deleted rows."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_delta(spark, path, spark.createDataFrame(
        [(18,), (19,), (20,)], "id int"))
    for probe in [[("v", ">=", 100)], [("v", ">", 170)], [("id", "=", 19)]]:
        got = read_delta(spark, path, skip=probe).count()
        want = read_delta(spark, path)
        for c, op, val in probe:
            want = want.filter(
                F.col(c) >= val if op == ">=" else
                F.col(c) > val if op == ">" else F.col(c) == val
            )
        assert got == want.count(), probe


def test_dv_cdc_version_events_see_vector_deletes(spark, tmp_path):
    """Snapshot-diff CDC over a vector delete emits the same delete
    events as over a rewrite delete — version_events reads through
    read_delta, which applies vectors."""
    from changedatacapture_reporting_spark.sources.delta_table import (
        delta_version_events,
    )

    dA, dB = str(tmp_path / "A"), str(tmp_path / "B")
    _mk(spark, dA)
    _mk(spark, dB)
    keys = spark.createDataFrame([(4,), (7,)], "id int")
    delete_delta(spark, dA, keys)
    delete_delta(spark, dB, keys, deletion_vectors=False)
    evA = delta_version_events(spark, dA, ["id"], from_version=1)
    evB = delta_version_events(spark, dB, ["id"], from_version=1)
    cols = ["lsn", "op", "id"]
    rA = sorted(
        tuple(r) for r in
        evA.select("lsn", "op", F.col("before.id").alias("id")).collect()
    )
    rB = sorted(
        tuple(r) for r in
        evB.select("lsn", "op", F.col("before.id").alias("id")).collect()
    )
    assert rA == rB and len(rA) == 2 and all(r[1] == "delete" for r in rA)


def test_dv_falls_back_to_rewrite_without_stats(spark, tmp_path):
    """A touched file with no numRecords stats (e.g. externally added)
    cannot be vectored soundly — delete_delta falls back to the rewrite
    path; merge_delta refuses with a pointed error."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10, "x"), (2, 20, "x")], "id int, v int, p string")
    write_delta(spark, df, path)
    # strip stats from the committed add (simulates a foreign writer)
    log = fs.join(path, "_delta_log")
    cname = "00000000000000000000.json"
    lines = []
    for line in fs.read_text(spark, fs.join(log, cname)).splitlines():
        d = json.loads(line)
        if "add" in d:
            d["add"].pop("stats", None)
        lines.append(json.dumps(d))
    import os
    os.remove(fs.join(log, cname))
    fs.write_text(spark, fs.join(log, cname), "\n".join(lines) + "\n")

    res = delete_delta(
        spark, path, spark.createDataFrame([(1,)], "id int"),
        deletion_vectors=True,
    )
    assert res["files_rewritten"] == 1 and res["deletion_vector"] is None
    assert {r["id"] for r in read_delta(spark, path).collect()} == {2}

    src = spark.createDataFrame([(2, 99, "x")], "id int, v int, p string")
    # strip stats again (the delete rewrote the file with fresh stats)
    cname2 = "00000000000000000001.json"
    lines = []
    for line in fs.read_text(spark, fs.join(log, cname2)).splitlines():
        d = json.loads(line)
        if "add" in d:
            d["add"].pop("stats", None)
        lines.append(json.dumps(d))
    os.remove(fs.join(log, cname2))
    fs.write_text(spark, fs.join(log, cname2), "\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="numRecords stats"):
        merge_delta(
            spark, src, path, ["id"], deletion_vectors=True
        )


def test_dv_readd_stats_marked_loose_and_optimize_restores(
    spark, tmp_path
):
    """A DV re-add's stats must carry tightBounds=false (spec rule for
    DV writers, ADVICE r13): numRecords stays physical and min/max are
    bounds over a superset of the live rows, so a foreign engine never
    trusts them as exact. metadata_summary refuses loose stats even if
    the vector itself were gone; OPTIMIZE rewrites with fresh TIGHT
    stats and metadata-only aggregation comes back."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 11)], "id long, v long"
    )
    write_delta(spark, df.repartition(1), path)
    delete_delta(
        spark, path, spark.createDataFrame([(1,), (2,)], "id long"),
        deletion_vectors=True,
    )
    st = _resolve_log(spark, path, None)
    (add,) = st["files"].values()
    stats = json.loads(add["stats"])
    assert stats["tightBounds"] is False
    assert stats["numRecords"] == 10  # physical, per the spec
    # min/max survive as (possibly wide) bounds — pruning stays sound
    assert int(stats["minValues"]["id"]) == 1
    with pytest.raises(ValueError, match="deletion|tightBounds"):
        metadata_summary(spark, path)
    optimize_delta(spark, path, timestamp_ms=1)
    ms = {
        r["column_name"]: (r["n_rows"], r["min_value"])
        for r in metadata_summary(spark, path).collect()
    }
    assert ms["id"] == (8, "3")


def test_insert_only_dv_merge_keeps_protocol(spark, tmp_path):
    """An insert-only merge with deletion_vectors=True stages no vector
    — it must NOT bump the table to (3,7)+deletionVectors (ADVICE r13:
    that would lock out non-DV readers of a table carrying no vectors).
    The first merge that actually marks rows bumps it."""
    path = str(tmp_path / "t")
    write_delta(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
        path,
    )
    res = merge_delta(
        spark,
        spark.createDataFrame([(3, 30), (4, 40)], "id long, v long"),
        path, ["id"], deletion_vectors=True,
    )
    assert res["files_dv_updated"] == 0 and res["rows_upserted"] == 2
    proto = _resolve_log(spark, path, None)["protocol"]
    assert int(proto["minReaderVersion"]) == 1
    assert not (proto.get("readerFeatures") or [])
    # a matched merge stages a vector and bumps — unchanged behavior
    merge_delta(
        spark, spark.createDataFrame([(1, 11)], "id long, v long"),
        path, ["id"], deletion_vectors=True,
    )
    proto = _resolve_log(spark, path, None)["protocol"]
    assert int(proto["minReaderVersion"]) == 3
    assert "deletionVectors" in proto["readerFeatures"]
