"""Differential fuzz for the deletion-vector lifecycle: a seeded random
walk over append / vector-merge / rewrite-merge / vector-delete /
rewrite-delete / OPTIMIZE / checkpoint / VACUUM / truncate-overwrite /
mergeSchema-EVOLVE, checked after every step against a driver-side
model of the logical table, plus time-travel spot checks against
recorded version snapshots (each compared with the schema of ITS OWN
version — evolution is itself versioned). Half the merges/deletes
carry txn=(app, step) and are immediately redelivered, asserting the
replay skips. The walk interleaves vector and rewrite commits on the
SAME table, so carried-over vectors, vector purges, checkpoint replay
of vectored adds, evolved schemas over vectored files and exactly-once
markers all get exercised in combination rather than one edge per
test.

Committed power is 4 seeds x 10 steps (seconds); raise with
DV_FUZZ_SEEDS=n for a soak.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from changedatacapture_reporting_spark import fs
from changedatacapture_reporting_spark.sources import dvcodec
from changedatacapture_reporting_spark.sources.delta_table import (
    _commit_name,
    _dv_protocol_actions,
    _log_path,
    _resolve_log,
    _scan_adds,
    delete_delta,
    merge_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)

N_SEEDS = int(os.environ.get("DV_FUZZ_SEEDS", "4"))
N_STEPS = int(os.environ.get("DV_FUZZ_STEPS", "10"))


def _p(k):
    return ["a", "b", "c:d"][k % 3]


def _lang(k):
    return f"l{k % 2}"


def _df(spark, rows, evolved):
    """rows: list of (k, v, lang)."""
    if evolved:
        return spark.createDataFrame(
            [(k, v, _p(k), lang) for k, v, lang in rows],
            "id int, v int, p string, lang string",
        )
    return spark.createDataFrame(
        [(k, v, _p(k)) for k, v, _ in rows], "id int, v int, p string"
    )


def _read(spark, path, version=None):
    return {
        tuple(r) for r in read_delta(spark, path, version=version).collect()
    }


def _expect(model, evolved):
    if evolved:
        return {(k, v, _p(k), lang) for k, (v, lang) in model.items()}
    return {(k, v, _p(k)) for k, (v, _) in model.items()}


# seed 0 stays in the fast lane (one walk keeps the lifecycle covered
# in-round); the remaining seeds are pre-commit-gate soak power
@pytest.mark.parametrize(
    "seed",
    [0]
    + [
        pytest.param(i, marks=pytest.mark.soak)
        for i in range(1, N_SEEDS)
    ],
)
def test_dv_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(1234 + seed)
    path = str(tmp_path / f"t{seed}")
    model: dict[int, tuple] = {}  # k -> (v, lang)
    evolved = False
    next_key = 0
    snapshots: list[tuple[int, set]] = []  # (version, expected rows)
    version = -1

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    # initial population: two files per partition value
    rows = [(k, k * 10, None) for k in fresh_keys(30)]
    model.update({k: (v, lang) for k, v, lang in rows})
    version = write_delta(
        spark, _df(spark, rows, False).repartition(2), path,
        partition_by=["p"],
    )
    snapshots.append((version, _expect(model, evolved)))

    for step in range(N_STEPS):
        live = sorted(model)
        op = rng.choice(
            ["append", "merge", "merge", "delete", "delete",
             "optimize", "checkpoint", "vacuum", "overwrite", "evolve",
             "foreign_dv", "foreign_dv"]
        )
        if op == "evolve" and not evolved:
            # mergeSchema: the lang column arrives WITH a data batch;
            # every pre-existing row reads back NULL for it
            rows = [(k, k * 10, _lang(k)) for k in fresh_keys(3)]
            model.update({k: (v, lang) for k, v, lang in rows})
            version = write_delta(
                spark, _df(spark, rows, True), path,
                partition_by=["p"], merge_schema=True,
            )
            evolved = True
        elif op == "overwrite":
            # truncate-and-reload: drops every add (vectored or not);
            # the committed schema stays evolved once evolved
            rows = [(k, k * 10, _lang(k) if evolved else None)
                    for k in fresh_keys(rng.randint(2, 6))]
            model.clear()
            model.update({k: (v, lang) for k, v, lang in rows})
            version = write_delta(
                spark, _df(spark, rows, evolved), path,
                partition_by=["p"], mode="overwrite",
            )
        elif op == "append":
            rows = [(k, k * 10, _lang(k) if evolved else None)
                    for k in fresh_keys(rng.randint(1, 8))]
            model.update({k: (v, lang) for k, v, lang in rows})
            version = write_delta(
                spark, _df(spark, rows, evolved), path,
                partition_by=["p"],
            )
        elif op == "merge" and live:
            dv = rng.random() < 0.5
            upd = rng.sample(live, min(len(live), rng.randint(1, 6)))
            dels = rng.sample(live, min(len(live), rng.randint(0, 4)))
            ins = fresh_keys(rng.randint(0, 3))
            src_rows = (
                [(k, model[k][0] + 1,
                  _lang(k) if evolved else None, False)
                 for k in upd if k not in dels]
                + [(k, 0, None, True) for k in dels]
                + [(k, k * 10, _lang(k) if evolved else None, False)
                   for k in ins]
            )
            if not src_rows:
                continue
            if evolved:
                src = spark.createDataFrame(
                    [(k, v, _p(k), lang, d) for k, v, lang, d in src_rows],
                    "id int, v int, p string, lang string, _del boolean",
                )
            else:
                src = spark.createDataFrame(
                    [(k, v, _p(k), d) for k, v, _, d in src_rows],
                    "id int, v int, p string, _del boolean",
                )
            txn = ("walk", step) if rng.random() < 0.5 else None
            res = merge_delta(
                spark, src, path, ["id"], delete_col="_del",
                deletion_vectors=dv, txn=txn,
            )
            for k, v, lang, d in src_rows:
                if d:
                    model.pop(k, None)
                else:
                    model[k] = (v, lang)
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
        elif op == "foreign_dv":
            # a FOREIGN spec writer deletes rows from one un-vectored
            # file: hand-written commit (remove + re-add) carrying a
            # binary RoaringBitmapArray vector under a random-prefix
            # dir — the read path must apply it like our own vectors,
            # OPTIMIZE must purge it, vacuum must not reclaim it while
            # referenced
            import uuid as _uuid

            st = _resolve_log(spark, path, None)
            cands = sorted(
                (
                    a
                    for a in st["files"].values()
                    if not a.get("deletionVector")
                ),
                key=lambda a: a["path"],
            )
            if not cands:
                continue
            add = rng.choice(cands)
            frows = _scan_adds(
                spark, path, st["meta"], [add], with_rowpos=True
            ).select("id", "_pos_idx").collect()
            if not frows:
                continue
            kill = rng.sample(frows, min(len(frows), rng.randint(1, 3)))
            u = _uuid.uuid4()
            blob = dvcodec.serialize_blob(
                [int(r["_pos_idx"]) for r in kill]
            )
            data, spans = dvcodec.pack_file([blob])
            fs.write_bytes(
                spark,
                fs.join(path, f"fx/deletion_vector_{u}.bin"),
                data,
            )
            new_add = dict(add)
            new_add["deletionVector"] = {
                "storageType": "u",
                "pathOrInlineDv": "fx" + dvcodec.encode_uuid(u),
                "offset": spans[0][0],
                "sizeInBytes": spans[0][1],
                "cardinality": len(kill),
            }
            new_add["dataChange"] = True
            actions = _dv_protocol_actions(st) + [
                {
                    "remove": {
                        "path": add["path"],
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                },
                {"add": new_add},
            ]
            version = st["version"] + 1
            fs.write_text(
                spark,
                fs.join(_log_path(path), _commit_name(version)),
                "\n".join(json.dumps(a) for a in actions) + "\n",
            )
            for r in kill:
                model.pop(r["id"], None)
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
        want = _expect(model, evolved)
        assert got == want, (
            f"seed {seed} step {step} op {op}: "
            f"missing {want - got}, extra {got - want}"
        )
        snapshots.append((version, want))

    # time travel: every recorded version still reads its exact snapshot
    # with ITS OWN schema (full-retention vacuum must not have broken
    # any of them; evolution must not leak backward)
    for v, expect in snapshots[-6:]:
        assert _read(spark, path, version=v) == expect, f"version {v}"
