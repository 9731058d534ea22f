"""Differential fuzz for the deletion-vector lifecycle: a seeded random
walk over append / vector-merge / rewrite-merge / vector-delete /
rewrite-delete / OPTIMIZE / checkpoint / VACUUM, checked after every
step against a driver-side model of the logical table, plus time-travel
spot checks against recorded version snapshots. The walk interleaves
vector and rewrite commits on the SAME table, so carried-over vectors,
vector purges, and checkpoint replay of vectored adds all get exercised
in combination rather than one edge per test.

Committed power is 4 seeds x 10 steps (seconds); raise with
DV_FUZZ_SEEDS=n for a soak.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sources.delta_table import (
    delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)

N_SEEDS = int(os.environ.get("DV_FUZZ_SEEDS", "4"))
N_STEPS = 10


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, ["a", "b", "c:d"][k % 3]) for k, v in rows],
        "id int, v int, p string",
    )


def _read(spark, path, version=None):
    return {
        (r["id"], r["v"], r["p"])
        for r in read_delta(spark, path, version=version).collect()
    }


def _model_rows(model):
    return {(k, v, ["a", "b", "c:d"][k % 3]) for k, v in model.items()}


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_dv_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(1234 + seed)
    path = str(tmp_path / f"t{seed}")
    model: dict[int, int] = {}
    next_key = 0
    snapshots: list[tuple[int, set]] = []  # (version, expected rows)
    version = -1

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    # initial population: two files per partition value
    ks = fresh_keys(30)
    rows = [(k, k * 10) for k in ks]
    model.update(rows)
    version = write_delta(
        spark, _df(spark, rows).repartition(2), path, partition_by=["p"]
    )
    snapshots.append((version, _model_rows(model)))

    for step in range(N_STEPS):
        live = sorted(model)
        op = rng.choice(
            ["append", "merge", "merge", "delete", "delete",
             "optimize", "checkpoint", "vacuum", "overwrite"]
        )
        if op == "overwrite":
            # truncate-and-reload: drops every add (vectored or not)
            ks = fresh_keys(rng.randint(2, 6))
            rows = [(k, k * 10) for k in ks]
            model.clear()
            model.update(rows)
            version = write_delta(
                spark, _df(spark, rows), path,
                partition_by=["p"], mode="overwrite",
            )
        elif op == "append":
            ks = fresh_keys(rng.randint(1, 8))
            rows = [(k, k * 10) for k in ks]
            model.update(rows)
            version = write_delta(
                spark, _df(spark, rows), path, partition_by=["p"]
            )
        elif op == "merge" and live:
            dv = rng.random() < 0.5
            upd = rng.sample(live, min(len(live), rng.randint(1, 6)))
            dels = rng.sample(live, min(len(live), rng.randint(0, 4)))
            ins = fresh_keys(rng.randint(0, 3))
            src_rows = (
                [(k, model[k] + 1, False) for k in upd if k not in dels]
                + [(k, 0, True) for k in dels]
                + [(k, k * 10, False) for k in ins]
            )
            if not src_rows:
                continue
            src = spark.createDataFrame(
                [(k, v, ["a", "b", "c:d"][k % 3], d) for k, v, d in src_rows],
                "id int, v int, p string, _del boolean",
            )
            txn = ("walk", step) if rng.random() < 0.5 else None
            res = merge_delta(
                spark, src, path, ["id"], delete_col="_del",
                deletion_vectors=dv, txn=txn,
            )
            for k, v, d in src_rows:
                if d:
                    model.pop(k, None)
                else:
                    model[k] = v
            if txn is not None and res["version"] is not None:
                # immediate redelivery: exact no-op
                replay = merge_delta(
                    spark, src, path, ["id"], delete_col="_del",
                    deletion_vectors=dv, txn=txn,
                )
                assert replay.get("skipped_txn") is True, replay
            if res["version"] is None:
                continue
            version = res["version"]
            if dv:
                assert res["files_rewritten"] == 0, res
        elif op == "delete" and live:
            dv = rng.random() < 0.6
            dels = rng.sample(live, min(len(live), rng.randint(1, 6)))
            keys_df = spark.createDataFrame(
                [(k,) for k in dels], "id int"
            )
            txn = ("walk", step) if rng.random() < 0.5 else None
            res = delete_delta(
                spark, path, keys_df, deletion_vectors=dv, txn=txn,
            )
            for k in dels:
                model.pop(k, None)
            if txn is not None and res["version"] is not None:
                replay = delete_delta(
                    spark, path, keys_df, deletion_vectors=dv, txn=txn,
                )
                assert replay.get("skipped_txn") is True, replay
            if res["version"] is None:
                continue
            version = res["version"]
        elif op == "optimize":
            res = optimize_delta(spark, path)
            if res["version"] is None:
                continue
            version = res["version"]
        elif op == "checkpoint":
            write_checkpoint(spark, path)
        elif op == "vacuum":
            vacuum_delta(spark, path)  # full retention: nothing logical
        else:
            continue
        got = _read(spark, path)
        assert got == _model_rows(model), (
            f"seed {seed} step {step} op {op}: "
            f"missing {_model_rows(model) - got}, extra {got - _model_rows(model)}"
        )
        snapshots.append((version, _model_rows(model)))

    # time travel: every recorded version still reads its exact snapshot
    # (full-retention vacuum must not have broken any of them)
    for v, expect in snapshots[-6:]:
        assert _read(spark, path, version=v) == expect, f"version {v}"
