"""Domain metadata + clustered tables (public Delta protocol, "Domain
Metadata" / "Clustered Table"): a writer that does not understand a
domain must PRESERVE it — concretely, domain metadata must survive
checkpointing in BOTH forms, or a foreign table's clustering (or any
other domain) is silently stripped once the json commits expire. And a
clustered table's OPTIMIZE must honor the clustering columns recorded
in the ``delta.clustering`` domain — plain compaction would un-cluster
the table for every other engine."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    _clustering_columns,
    _resolve_log,
    optimize_delta,
    read_delta,
    write_checkpoint,
    write_delta,
)


def _expire_jsons(path, up_to):
    log = os.path.join(path, "_delta_log")
    for n in list(os.listdir(log)):
        if n.endswith(".json") and n.split(".")[0].isdigit():
            if int(n.split(".")[0]) <= up_to:
                os.remove(os.path.join(log, n))


def _append_domain_commit(spark, path, domains):
    """A foreign commit carrying domainMetadata actions."""
    st = _resolve_log(spark, path, None)
    log = os.path.join(path, "_delta_log")
    v = st["version"] + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        for d in domains:
            f.write(json.dumps({"domainMetadata": d}) + "\n")
    return v


def _mark_features(spark, path, feats):
    st = _resolve_log(spark, path, None)
    log = os.path.join(path, "_delta_log")
    v = st["version"] + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": sorted(feats),
                    }
                }
            )
            + "\n"
        )
    return v


def test_domains_replay_and_survive_both_checkpoint_forms(
    spark, tmp_path
):
    base = str(tmp_path / "t")
    write_delta(
        spark, spark.createDataFrame([(1, 10)], "k long, v long"), base
    )
    _mark_features(spark, base, ["domainMetadata"])
    _append_domain_commit(
        spark,
        base,
        [
            {
                "domain": "com.example.custom",
                "configuration": json.dumps({"x": 1}),
                "removed": False,
            },
            {
                "domain": "com.example.gone",
                "configuration": "",
                "removed": True,
            },
        ],
    )
    # writes still land on the feature-marked table
    assert (
        write_delta(
            spark,
            spark.createDataFrame([(2, 20)], "k long, v long"),
            base,
        )
        is not None
    )
    st = _resolve_log(spark, base, None)
    assert st["domains"]["com.example.custom"]["configuration"] == (
        json.dumps({"x": 1})
    )
    assert st["domains"]["com.example.gone"]["removed"] is True

    # classic checkpoint → expire → domains still there
    v = write_checkpoint(spark, base)
    _expire_jsons(base, v)
    st2 = _resolve_log(spark, base, None)
    assert st2["domains"]["com.example.custom"]["configuration"] == (
        json.dumps({"x": 1})
    )
    assert st2["domains"]["com.example.gone"]["removed"] is True

    # v2 checkpoint → expire → domains still there
    write_delta(
        spark, spark.createDataFrame([(3, 30)], "k long, v long"), base
    )
    v2 = write_checkpoint(spark, base, policy="v2")
    _expire_jsons(base, v2)
    st3 = _resolve_log(spark, base, None)
    assert st3["domains"]["com.example.custom"]["configuration"] == (
        json.dumps({"x": 1})
    )
    assert read_delta(spark, base).count() == 3


def test_optimize_honors_clustering_domain(spark, tmp_path):
    """Files written value-interleaved on v; the clustering domain
    names v (physical name, exercising the mapping-aware path is
    covered by the name passthrough here); OPTIMIZE with NO explicit
    zorder must come out range-clustered — committed per-file [min,max]
    on v non-overlapping."""
    base = str(tmp_path / "t")
    # 4 interleaved files: each spans nearly the whole v range
    for i in range(4):
        df = spark.range(200).select(
            (F.col("id") * 4 + i).alias("k"),
            ((F.col("id") * 4 + i) % 997).alias("v"),
        )
        write_delta(spark, df, base)
    _mark_features(spark, base, ["domainMetadata", "clustering"])
    _append_domain_commit(
        spark,
        base,
        [
            {
                "domain": "delta.clustering",
                "configuration": json.dumps(
                    {"clusteringColumns": [["v"]]}
                ),
                "removed": False,
            }
        ],
    )
    res = optimize_delta(spark, base, target_file_bytes=2048)
    assert res["version"] is not None
    st = _resolve_log(spark, base, None)
    spans = []
    for a in st["files"].values():
        stats = json.loads(a["stats"])
        spans.append(
            (int(stats["minValues"]["v"]), int(stats["maxValues"]["v"]))
        )
    spans.sort()
    assert len(spans) >= 2  # actually re-clustered into ranged files
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans  # non-overlapping ranges on v
    assert sorted(
        r["k"] for r in read_delta(spark, base).collect()
    ) == sorted(range(0, 800))


def test_clustering_columns_edge_cases(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )

    def st(dm):
        return {"domains": {"delta.clustering": dm} if dm else {}}

    assert _clustering_columns(st(None), schema, []) is None
    assert (
        _clustering_columns(
            st({"configuration": "{}", "removed": True}), schema, []
        )
        is None
    )
    assert (
        _clustering_columns(
            st({"configuration": "not json", "removed": False}),
            schema,
            [],
        )
        is None
    )
    # string / unknown / nested columns are skipped, not raised
    cfg = json.dumps(
        {"clusteringColumns": [["s"], ["nope"], ["a", "b"], ["v"], ["k"]]}
    )
    assert _clustering_columns(
        st({"configuration": cfg, "removed": False}), schema, []
    ) == ("v", "k")
    # one eligible column clusters on itself
    cfg1 = json.dumps({"clusteringColumns": [["v"]]})
    assert _clustering_columns(
        st({"configuration": cfg1, "removed": False}), schema, []
    ) == ("v", "v")
    # partition columns are not clustering columns
    assert (
        _clustering_columns(
            st({"configuration": cfg1, "removed": False}), schema, ["v"]
        )
        is None
    )
