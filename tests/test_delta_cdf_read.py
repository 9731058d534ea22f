"""read_delta_cdf — protocol-level Change Data Feed (public Delta
PROTOCOL.md, "Add CDC File" + "Change Data Files"): cdc actions from
CDF-enabled foreign writers are the change record; commits without them
derive per the spec's rule (dataChange adds → inserts, removes →
deletes), with this engine's refinement for same-path deletion-vector
swaps (vector DELTA only — no whole-file churn)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sources.delta_table import (
    delete_delta,
    read_delta,
    read_delta_cdf,
    write_checkpoint,
    write_delta,
)


def _changes(df):
    return sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    )


def test_cdf_derivation_append_overwrite_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
        .repartition(1),  # one file → the rewrite's churn is pinned
        path,
    )
    write_delta(
        spark, spark.createDataFrame([(3, 30)], "id long, v long"), path
    )
    # v2: rewrite-mode delete of id=1 (remove touched file + add
    # survivors → derived delete of ALL old rows + insert of survivors)
    delete_delta(
        spark, path, spark.createDataFrame([(1,)], "id long"),
        deletion_vectors=False,
    )
    got = _changes(read_delta_cdf(spark, path, 1, 2))
    assert (3, 30, "insert", 1) in got
    assert (1, 10, "delete", 2) in got
    # survivors of the rewritten file re-insert (spec derivation)
    assert (2, 20, "insert", 2) in got and (2, 20, "delete", 2) in got
    # inclusive start at 0 sees the initial inserts
    got0 = _changes(read_delta_cdf(spark, path, 0, 0))
    assert got0 == [(1, 10, "insert", 0), (2, 20, "insert", 0)]


def test_cdf_dv_swap_emits_vector_delta_only(spark, tmp_path):
    """Two consecutive vector DELETEs on one file: each commit's feed
    holds exactly ITS newly-masked rows — the carried-over vector
    (descriptors name their COMPLETE vector) must not re-emit the first
    commit's deletes."""
    path = str(tmp_path / "t")
    write_delta(
        spark,
        spark.createDataFrame(
            [(i, i * 10) for i in range(1, 9)], "id long, v long"
        ).repartition(1),
        path,
    )
    delete_delta(spark, path, spark.createDataFrame([(2,), (3,)], "id long"))
    delete_delta(spark, path, spark.createDataFrame([(5,)], "id long"))
    assert _changes(read_delta_cdf(spark, path, 1, 1)) == [
        (2, 20, "delete", 1), (3, 30, "delete", 1),
    ]
    assert _changes(read_delta_cdf(spark, path, 2, 2)) == [
        (5, 50, "delete", 2),
    ]
    # whole range = initial inserts + exactly three deletes
    all_rows = _changes(read_delta_cdf(spark, path))
    assert sum(1 for r in all_rows if r[2] == "delete") == 3
    assert sum(1 for r in all_rows if r[2] == "insert") == 8


def test_cdf_foreign_cdc_actions_are_the_record(spark, tmp_path):
    """A commit carrying cdc actions (what CDF-enabled writers emit):
    the _change_data files ARE the feed — update pre/postimages come
    back verbatim and NO derivation runs for that commit."""
    path = str(tmp_path / "t")
    write_delta(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
        .repartition(1),
        path,
    )
    # stage the rewritten data file (id=2 updated to 99)
    new_df = spark.createDataFrame([(1, 10), (2, 99)], "id long, v long")
    stage = str(tmp_path / "stage")
    new_df.repartition(1).write.parquet(stage)
    part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    os.replace(os.path.join(stage, part), os.path.join(path, "f-new.parquet"))
    # stage the cdc file (pre/postimage rows)
    cdc_df = spark.createDataFrame(
        [(2, 20, "update_preimage"), (2, 99, "update_postimage")],
        "id long, v long, _change_type string",
    )
    cdc_stage = str(tmp_path / "cdc_stage")
    cdc_df.repartition(1).write.parquet(cdc_stage)
    part = [p for p in os.listdir(cdc_stage) if p.endswith(".parquet")][0]
    os.makedirs(os.path.join(path, "_change_data"), exist_ok=True)
    cdc_rel = "_change_data/cdc-0.parquet"
    os.replace(os.path.join(cdc_stage, part), os.path.join(path, cdc_rel))

    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
    )

    st = _resolve_log(spark, path, None)
    (old_add,) = st["files"].values()
    actions = [
        {"remove": {"path": old_add["path"], "deletionTimestamp": 1,
                    "dataChange": True}},
        {"add": {"path": "f-new.parquet", "partitionValues": {},
                 "size": os.path.getsize(
                     os.path.join(path, "f-new.parquet")),
                 "modificationTime": 1, "dataChange": True}},
        {"cdc": {"path": cdc_rel, "partitionValues": {},
                 "size": os.path.getsize(os.path.join(path, cdc_rel)),
                 "dataChange": False}},
    ]
    with open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")

    got = _changes(read_delta_cdf(spark, path, 1))
    assert got == [
        (2, 20, "update_preimage", 1),
        (2, 99, "update_postimage", 1),
    ]
    # the snapshot itself reflects the swap
    assert {tuple(r) for r in read_delta(spark, path).collect()} == {
        (1, 10), (2, 99),
    }


def test_cdf_refuses_expired_commits_and_composes_to_events(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1, 10)], "id long, v long"), path
    )
    write_delta(
        spark, spark.createDataFrame([(2, 20)], "id long, v long"), path
    )
    write_checkpoint(spark, path)
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="change feed"):
        read_delta_cdf(spark, path, 0)
    # the surviving range still feeds the engine's event model
    from changedatacapture_reporting_spark.sources.delta_cdf import (
        cdf_rows_to_events,
    )

    ev = cdf_rows_to_events(
        read_delta_cdf(spark, path, 1), ["id"], table_name="t"
    )
    rows = ev.collect()
    assert len(rows) == 1
    assert rows[0]["op"] == "insert" and rows[0]["lsn"] == 1
    assert rows[0]["after"]["id"] == 2
