"""Row tracking (public Delta protocol, writer feature
``rowTracking``): every add of a row-tracked table must carry
``baseRowId`` + ``defaultRowCommitVersion``, allocated fresh and
non-overlapping from the ``delta.rowTracking`` domain's high-water
mark (advanced in the SAME commit). Vector swaps inherit the live
file's ids — the rows did not move. Row-COPYING rewrites (OPTIMIZE,
rewrite-mode MERGE/DELETE) refuse: copied rows change position, and
this writer does not materialize row-id columns, so re-writing them
would silently re-id rows downstream incremental consumers key on."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    write_checkpoint,
    write_delta,
    _resolve_log,
)


def _genesis(base, hwm=None):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    os.makedirs(base + "/_delta_log", exist_ok=True)
    actions = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        },
        {
            "metaData": {
                "id": "t-rt",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.enableRowTracking": "true"},
                "createdTime": 0,
            }
        },
    ]
    if hwm is not None:
        actions.append(
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": hwm}
                    ),
                    "removed": False,
                }
            }
        )
    with open(base + "/_delta_log/" + "0" * 20 + ".json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _hwm(spark, base):
    dm = _resolve_log(spark, base, None)["domains"]["delta.rowTracking"]
    return json.loads(dm["configuration"])["rowIdHighWaterMark"]


def _adds(spark, base):
    return list(_resolve_log(spark, base, None)["files"].values())


def test_appends_assign_fresh_nonoverlapping_ids(spark, tmp_path):
    base = str(tmp_path / "t")
    _genesis(base, hwm=99)
    write_delta(spark, _mk(spark, [(1, 10), (2, 20), (3, 30)]), base)
    adds = _adds(spark, base)
    spans = sorted(
        (int(a["baseRowId"]), int(a["baseRowId"])
         + json.loads(a["stats"])["numRecords"] - 1)
        for a in adds
    )
    # ranges start above the foreign mark, never overlap
    assert spans[0][0] == 100
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert all(int(a["defaultRowCommitVersion"]) == 1 for a in adds)
    assert _hwm(spark, base) == 99 + 3

    # second commit continues above the new mark
    write_delta(spark, _mk(spark, [(4, 40)]), base)
    adds2 = _adds(spark, base)
    new = [a for a in adds2 if int(a["defaultRowCommitVersion"]) == 2]
    assert new and all(int(a["baseRowId"]) >= 103 for a in new)
    assert _hwm(spark, base) == 99 + 4


def test_checkpoint_preserves_row_ids(spark, tmp_path):
    base = str(tmp_path / "t")
    _genesis(base)  # no prior mark: ids start at 0
    write_delta(spark, _mk(spark, [(1, 10), (2, 20)]), base)
    ids_before = {
        a["path"]: (
            int(a["baseRowId"]), int(a["defaultRowCommitVersion"])
        )
        for a in _adds(spark, base)
    }
    assert _hwm(spark, base) == 1
    v = write_checkpoint(spark, base)
    log = base + "/_delta_log"
    for n in list(os.listdir(log)):
        if n.endswith(".json") and n.split(".")[0].isdigit():
            if int(n.split(".")[0]) <= v:
                os.remove(os.path.join(log, n))
    ids_after = {
        a["path"]: (
            int(a["baseRowId"]), int(a["defaultRowCommitVersion"])
        )
        for a in _adds(spark, base)
    }
    assert ids_after == ids_before
    assert _hwm(spark, base) == 1  # domain survived the checkpoint too


def test_vector_mutations_preserve_swapped_file_ids(spark, tmp_path):
    base = str(tmp_path / "t")
    _genesis(base)
    write_delta(
        spark, _mk(spark, [(i, i * 10) for i in range(6)]), base
    )
    before = {
        a["path"]: int(a["baseRowId"]) for a in _adds(spark, base)
    }
    r = delete_delta(
        spark,
        base,
        spark.createDataFrame([(2,)], "k long"),
        deletion_vectors=True,
    )
    assert r["rows_deleted"] == 1
    after = _adds(spark, base)
    for a in after:
        if a["path"] in before:  # swapped file kept its ids
            assert int(a["baseRowId"]) == before[a["path"]]
    # vector MERGE: new upsert files get fresh ids above the mark
    hwm_before = _hwm(spark, base)
    merge_delta(
        spark,
        _mk(spark, [(0, 999), (100, 1)]),
        base,
        ["k"],
        deletion_vectors=True,
    )
    new = [
        a
        for a in _adds(spark, base)
        if a["path"] not in {x["path"] for x in after}
    ]
    assert new and all(
        int(a["baseRowId"]) > hwm_before for a in new
    )
    assert sorted(
        r["k"] for r in read_delta(spark, base).collect()
    ) == [0, 1, 3, 4, 5, 100]


def test_row_copying_rewrites_refuse(spark, tmp_path):
    base = str(tmp_path / "t")
    _genesis(base)
    write_delta(spark, _mk(spark, [(1, 10), (2, 20)]), base)
    with pytest.raises(ValueError, match="row-tracked"):
        optimize_delta(spark, base)
    with pytest.raises(ValueError, match="row-tracked"):
        delete_delta(
            spark,
            base,
            spark.createDataFrame([(1,)], "k long"),
            deletion_vectors=False,
        )
    with pytest.raises(ValueError, match="row-tracked"):
        merge_delta(
            spark, _mk(spark, [(1, 99)]), base, ["k"],
            deletion_vectors=False,
        )
    # insert-only rewrite merge copies nothing → allowed
    res = merge_delta(
        spark, _mk(spark, [(9, 90)]), base, ["k"],
        deletion_vectors=False,
    )
    assert res["version"] is not None
    assert read_delta(spark, base).count() == 3


def test_stats_required_for_allocation(spark, tmp_path):
    base = str(tmp_path / "t")
    _genesis(base)
    with pytest.raises(ValueError, match="numRecords"):
        write_delta(
            spark, _mk(spark, [(1, 10)]), base, collect_stats=False
        )