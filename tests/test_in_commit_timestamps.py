"""In-commit timestamps (public Delta protocol, writer feature
``inCommitTimestamp``): when ``delta.enableInCommitTimestamps=true``,
every commit leads with a commitInfo action whose inCommitTimestamp
strictly exceeds the previous commit's — the commit clock stops
depending on filesystem mtimes, which object stores rewrite on
copy/restore. r14 emits the record at BOTH commit sites (write_delta
and the shared swap loop behind OPTIMIZE/MERGE/DELETE/maintenance) and
prefers it over mtimes in timestamp time travel and CDF stamps."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    version_at_timestamp,
    write_delta,
    _commit_timestamp_ms,
)


def _genesis(base, ict_genesis=5000):
    schema = T.StructType([T.StructField("k", T.LongType(), True)])
    os.makedirs(base + "/_delta_log", exist_ok=True)
    actions = [
        {"commitInfo": {"inCommitTimestamp": ict_genesis,
                        "timestamp": ict_genesis}},
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["inCommitTimestamp"],
            }
        },
        {
            "metaData": {
                "id": "t-ict",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.enableInCommitTimestamps": "true"
                },
                "createdTime": 0,
            }
        },
    ]
    with open(base + "/_delta_log/" + "0" * 20 + ".json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _commit_lines(base, v):
    return [
        json.loads(ln)
        for ln in open(
            base + f"/_delta_log/{v:020d}.json"
        ).read().splitlines()
        if ln.strip()
    ]


def _mk(spark, k):
    return spark.createDataFrame([(k,)], "k long")


def test_every_commit_site_stamps_monotonic_ict(spark, tmp_path):
    """write_delta, MERGE, DELETE and OPTIMIZE all lead with a
    commitInfo whose ict strictly increases — even when the caller
    clock runs BEHIND the chain (clock skew must not regress it)."""
    base = str(tmp_path / "t")
    _genesis(base, ict_genesis=5000)

    v1 = write_delta(spark, _mk(spark, 1), base, timestamp_ms=100)
    l1 = _commit_lines(base, v1)
    assert "commitInfo" in l1[0]  # FIRST action, per the spec
    assert l1[0]["commitInfo"]["inCommitTimestamp"] == 5001  # > genesis

    res = merge_delta(spark, _mk(spark, 2), base, ["k"], timestamp_ms=200)
    l2 = _commit_lines(base, res["version"])
    assert l2[0]["commitInfo"]["inCommitTimestamp"] == 5002

    r = delete_delta(
        spark, base, _mk(spark, 1), deletion_vectors=False,
        timestamp_ms=300,
    )
    l3 = _commit_lines(base, r["version"])
    assert l3[0]["commitInfo"]["inCommitTimestamp"] == 5003

    o = optimize_delta(spark, base, timestamp_ms=9000)
    if o.get("version") is not None:  # a clock AHEAD takes the clock
        l4 = _commit_lines(base, o["version"])
        assert l4[0]["commitInfo"]["inCommitTimestamp"] == 9000

    assert sorted(r["k"] for r in read_delta(spark, base).collect()) == [2]


def test_timestamp_time_travel_uses_ict(spark, tmp_path):
    """version_at_timestamp resolves by the recorded ict, NOT the file
    mtimes (which are 'now' in this test and would otherwise shadow
    every fixture timestamp)."""
    base = str(tmp_path / "t")
    _genesis(base, ict_genesis=5000)
    v1 = write_delta(spark, _mk(spark, 1), base, timestamp_ms=100)
    v2 = write_delta(spark, _mk(spark, 2), base, timestamp_ms=9000)

    assert version_at_timestamp(spark, base, 5000) == 0
    assert version_at_timestamp(spark, base, 5001) == v1
    assert version_at_timestamp(spark, base, 8999) == v1
    assert version_at_timestamp(spark, base, 9000) == v2
    with pytest.raises(ValueError, match="precedes"):
        version_at_timestamp(spark, base, 4999)

    # _commit_timestamp_ms (the CDF stamp) prefers the ict too
    assert _commit_timestamp_ms(spark, base, v1) == 5001
    assert _commit_timestamp_ms(spark, base, v2) == 9000


def test_non_ict_tables_unchanged(spark, tmp_path):
    """Tables without the config keep mtime-based time travel and emit
    no commitInfo — zero-cost path."""
    base = str(tmp_path / "t")
    write_delta(spark, _mk(spark, 1), base, timestamp_ms=100)
    v1 = write_delta(spark, _mk(spark, 2), base, timestamp_ms=200)
    lines = _commit_lines(base, v1)
    assert all("commitInfo" not in a for a in lines)
