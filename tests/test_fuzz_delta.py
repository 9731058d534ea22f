"""Differential fuzz of the protocol-native Delta table: random
append / overwrite / merge / optimize / checkpoint sequences executed
against BOTH sources.delta_table and an independent in-memory model
(a dict of pk -> row per version). Every version must read back
exactly the model's snapshot — time travel included — regardless of
the interleaving, partitioning, or compaction points.

The same differential strategy as tests/test_fuzz_cdc.py: the model is
deliberately naive (no files, no log, no partitions) so a shared bug
is implausible.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.sources.delta_table import (
    merge_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)


# full differential power is the pre-commit gate's job;
# the fast lane (-m 'not soak') skips it
pytestmark = pytest.mark.soak

N_OPS = int(os.environ.get("FUZZ_DELTA_OPS", "12"))
SEEDS = [0, 1, 2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp int, v string")


def _apply_model(model: dict, op: str, payload) -> dict:
    """The naive interpreter: version state as {id: (id, grp, v)}."""
    new = dict(model)
    if op == "append":
        for r in payload:
            # append keeps BOTH rows for a duplicated id (a Delta
            # append is not an upsert); model stores a list per id
            new.setdefault(r[0], []).append(r)
    elif op == "overwrite":
        new = {}
        for r in payload:
            new.setdefault(r[0], []).append(r)
    elif op == "merge":
        upserts, deletes = payload
        for rid in deletes:
            new.pop(rid, None)
        for r in upserts:
            new[r[0]] = [r]
    return new


def _model_rows(model: dict) -> set:
    return {r for rows in model.values() for r in rows}


def _mapped_genesis(spark, path, rows0, part):
    """Hand-built 'name'-mapped v0 (physical m-* column names) holding
    ``rows0`` — the fuzz walk then drives every op through the mapped
    write paths."""
    import json as _json

    from pyspark.sql import types as T

    phys = spark.createDataFrame(
        rows0, "`m-id` long, `m-grp` int, `m-v` string"
    )
    stage = path + "/_stage"
    w = phys.write.mode("overwrite")
    if part:
        w = w.partitionBy("m-grp")
    w.parquet(stage)
    os.makedirs(path + "/_delta_log", exist_ok=True)
    adds = []
    from changedatacapture_reporting_spark import fs as _fs

    for rel in _fs.list_data_files(spark, stage):
        dest_rel = rel  # keep hive dirs (physical names already)
        full = os.path.join(path, dest_rel)
        os.makedirs(os.path.dirname(full) or path, exist_ok=True)
        os.replace(os.path.join(stage, rel), full)
        pv = {}
        for seg in dest_rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                pv[k] = v
        adds.append(
            {
                "add": {
                    "path": dest_rel,
                    "partitionValues": pv,
                    "size": os.path.getsize(full),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    import shutil

    shutil.rmtree(stage)

    def fld(name, dt_, phys_name, cid):
        return T.StructField(
            name, dt_, True,
            {"delta.columnMapping.physicalName": phys_name,
             "delta.columnMapping.id": cid},
        )

    schema = T.StructType(
        [
            fld("id", T.LongType(), "m-id", 1),
            fld("grp", T.IntegerType(), "m-grp", 2),
            fld("v", T.StringType(), "m-v", 3),
        ]
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-fuzz-mapped",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ["grp"] if part else [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }
        },
    ] + adds
    with open(f"{path}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in actions) + "\n")


@pytest.mark.parametrize("mapped", [False, True])
@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_delta_log_replay(spark, tmp_path, seed, mapped):
    import random

    rng = random.Random(seed)
    path = str(tmp_path / f"t_fuzz_{seed}")
    # genesis commit fixes the schema and partitioning
    partitioned = rng.random() < 0.5
    part = ["grp"] if partitioned else []
    rows0 = [(i, i % 3, f"s{seed}_{i}") for i in range(rng.randint(1, 6))]
    if mapped:
        # same walk, but over a column-mapped ('name' mode) table: every
        # op below exercises the physical-translation write paths (r14)
        _mapped_genesis(spark, path, rows0, part)
    else:
        write_delta(spark, _mk(spark, rows0), path, partition_by=part)
    model = _apply_model({}, "append", rows0)
    versions = {0: _model_rows(model)}
    next_id = 100

    v = 0
    live_constraints: set[str] = set()
    for step in range(N_OPS):
        op = rng.choice(
            ["append", "overwrite", "merge", "optimize", "checkpoint",
             "checkpoint_v2", "add_constraint", "drop_constraint"]
        )
        if op == "append":
            rows = [
                (next_id + i, (next_id + i) % 3, f"a{step}_{i}")
                for i in range(rng.randint(1, 4))
            ]
            next_id += len(rows)
            got = write_delta(spark, _mk(spark, rows), path,
                              partition_by=part)
            model = _apply_model(model, "append", rows)
            v += 1
            assert got == v
        elif op == "overwrite":
            rows = [
                (next_id + i, (next_id + i) % 3, f"o{step}_{i}")
                for i in range(rng.randint(1, 4))
            ]
            next_id += len(rows)
            got = write_delta(spark, _mk(spark, rows), path, mode="overwrite",
                              partition_by=part)
            model = _apply_model(model, "overwrite", rows)
            v += 1
            assert got == v
        elif op == "merge":
            existing = [
                rid for rid, rows in model.items() if len(rows) == 1
            ]
            if not existing:
                continue
            upd_ids = rng.sample(existing, min(2, len(existing)))
            del_ids = [
                rid for rid in rng.sample(existing, min(2, len(existing)))
                if rid not in upd_ids
            ]
            ins = [(next_id, next_id % 3, f"m{step}")]
            next_id += 1
            upserts = [
                (rid, rid % 3, f"u{step}_{rid}") for rid in upd_ids
            ] + ins
            src = spark.createDataFrame(
                [(*r, False) for r in upserts]
                + [(rid, rid % 3, None, True) for rid in del_ids],
                "id long, grp int, v string, _del boolean",
            )
            res = merge_delta(spark, src, path, ["id"], delete_col="_del")
            model = _apply_model(model, "merge", (upserts, del_ids))
            if res["version"] is not None:
                v += 1
                assert res["version"] == v
        elif op == "optimize":
            res = optimize_delta(spark, path, target_file_bytes=1 << 30)
            if res["version"] is not None:
                v += 1
                assert res["version"] == v
            # rows unchanged by construction (dataChange: false)
        elif op == "add_constraint":
            # CHECK-constraint DDL interleaved with the whole walk
            # (r14): satisfied constraints land as metadata commits and
            # every later write enforces them; an unsatisfiable one
            # must refuse WITHOUT committing (walk rows have id ≥ 0)
            from changedatacapture_reporting_spark.sources.delta_table import (
                add_check_constraint,
            )

            name = f"c{step}"
            if rng.random() < 0.3 and model:
                import pytest as _pytest

                with _pytest.raises(ValueError):
                    add_check_constraint(spark, path, name, "id < -1")
                continue  # nothing committed, version unchanged
            expr = rng.choice(
                ["id >= 0", "grp BETWEEN 0 AND 2", "grp = id % 3"]
            )
            add_check_constraint(spark, path, name, expr)
            live_constraints.add(name)
            v += 1
        elif op == "drop_constraint":
            from changedatacapture_reporting_spark.sources.delta_table import (
                drop_check_constraint,
            )

            if not live_constraints:
                continue
            name = rng.choice(sorted(live_constraints))
            drop_check_constraint(spark, path, name)
            live_constraints.discard(name)
            v += 1
        elif op == "checkpoint":
            # r14: sometimes checkpoint in the ENGINE'S v2 form (UUID
            # manifest + parquet sidecar) — replay must be identical
            write_checkpoint(
                spark, path,
                policy="v2" if rng.random() < 0.4 else None,
            )
        elif op == "checkpoint_v2":
            # a FOREIGN v2 checkpoint (manifest + sidecars) lands at
            # the current version, carrying the table's CURRENT
            # protocol so the walk stays writable; jsons are kept so
            # older versions stay time-travelable. Subsequent reads at
            # ≥ this version replay through the v2 path.
            from changedatacapture_reporting_spark.sources.delta_table import (
                _resolve_log,
            )
            from test_v2_checkpoint import _build_v2_parquet

            st = _resolve_log(spark, path, None)
            proto = st.get("protocol") or {}
            _build_v2_parquet(
                spark, path, st,
                n_sidecars=rng.randint(1, 3),
                protocol_row=(
                    int(proto.get("minReaderVersion") or 1),
                    int(proto.get("minWriterVersion") or 2),
                    proto.get("readerFeatures"),
                    proto.get("writerFeatures"),
                ),
                expire=False,
            )
        versions[v] = _model_rows(model)

        # the LATEST snapshot always matches the model
        got_rows = {tuple(r) for r in read_delta(spark, path).collect()}
        assert got_rows == versions[v], f"seed={seed} step={step} op={op}"

    # full time travel: every recorded version replays to its model state
    for ver, want in versions.items():
        got = {tuple(r) for r in read_delta(spark, path, version=ver).collect()}
        assert got == want, f"seed={seed} version={ver}"

    # vacuum with full retention deletes nothing and changes no snapshot
    vacuum_delta(spark, path)
    for ver, want in versions.items():
        got = {tuple(r) for r in read_delta(spark, path, version=ver).collect()}
        assert got == want, f"seed={seed} post-vacuum version={ver}"


def test_fuzz_delta_merge_respects_multirow_append_guard(spark, tmp_path):
    """A merge whose key matches a MULTI-ROW id (two appends of the same
    id) must rewrite every copy — MERGE semantics collapse the key to
    the single source row."""
    path = str(tmp_path / "t_multi")
    write_delta(spark, _mk(spark, [(1, 0, "a")]), path)
    write_delta(spark, _mk(spark, [(1, 0, "b"), (2, 1, "c")]), path)
    src = spark.createDataFrame(
        [(1, 0, "merged", False)], "id long, grp int, v string, _del boolean"
    )
    merge_delta(spark, src, path, ["id"], delete_col="_del")
    got = {tuple(r) for r in read_delta(spark, path).collect()}
    assert got == {(1, 0, "merged"), (2, 1, "c")}


# ---------------------------------------------------------------------------
# data-skipping pruner fuzz (r10): a pruned file must NEVER contain a
# matching row — and every file that could match must be kept
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


_VALS = st.integers(min_value=-5, max_value=15)
_FILE = st.lists(_VALS, min_size=0, max_size=6)  # the rows of one file
_OP = st.sampled_from(["=", "==", "<", "<=", ">", ">="])
_PRED = st.tuples(_OP, _VALS)


@settings(max_examples=300, deadline=None)
@given(st.lists(_FILE, min_size=1, max_size=5), st.lists(_PRED, min_size=1, max_size=3))
def test_prune_adds_never_drops_a_matching_file(files, preds):
    import json as _json

    from changedatacapture_reporting_spark.sources.delta_table import (
        prune_adds,
    )

    def _match(v, op, x):
        return {
            "=": v == x, "==": v == x, "<": v < x, "<=": v <= x,
            ">": v > x, ">=": v >= x,
        }[op]

    adds = []
    for i, rows in enumerate(files):
        stats = {
            "numRecords": len(rows),
            "minValues": {"c": min(rows)} if rows else {},
            "maxValues": {"c": max(rows)} if rows else {},
            "nullCount": {"c": 0},
        }
        adds.append({"path": f"f{i}", "stats": _json.dumps(stats)})

    skip = [("c", op, x) for op, x in preds]
    kept = {a["path"] for a in prune_adds(adds, skip)}
    for i, rows in enumerate(files):
        has_match = any(
            all(_match(v, op, x) for op, x in preds) for v in rows
        )
        if has_match:
            # soundness: a file containing a matching row is NEVER pruned
            assert f"f{i}" in kept, (rows, preds)


# decimal-stats variant (r11): stats serialized as canonical strings
# (protocol form), probes arrive as Decimal OR float — the pruner's
# Decimal comparison path must stay sound around the 2^53 boundary
# where float collapse used to invert strict comparisons.

_BIG = 9007199254740992  # 2^53
_DEC_UNITS = st.integers(min_value=-4, max_value=8)


def _dec_of(u):
    import decimal as _d

    # cluster values tightly around 2^53 so off-by-one-ULP bugs surface
    return _d.Decimal(_BIG) + _d.Decimal(u) / 2


_DEC_FILE = st.lists(_DEC_UNITS, min_size=0, max_size=5)
_DEC_PRED = st.tuples(
    st.sampled_from(["=", "<", "<=", ">", ">="]),
    _DEC_UNITS,
    st.booleans(),  # probe as Decimal (True) or float (False)
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_DEC_FILE, min_size=1, max_size=4),
    st.lists(_DEC_PRED, min_size=1, max_size=2),
)
def test_prune_adds_decimal_stats_sound_past_double(files, preds):
    import json as _json

    from changedatacapture_reporting_spark.sources.delta_table import (
        prune_adds,
    )

    def _match(v, op, x):
        import decimal as _d

        x = x if isinstance(x, _d.Decimal) else _d.Decimal(str(x))
        return {
            "=": v == x, "<": v < x, "<=": v <= x, ">": v > x, ">=": v >= x,
        }[op]

    adds = []
    vals_by_file = []
    for i, units in enumerate(files):
        vals = [_dec_of(u) for u in units]
        vals_by_file.append(vals)
        stats = {
            "numRecords": len(vals),
            # protocol form: exact canonical strings
            "minValues": {"c": str(min(vals))} if vals else {},
            "maxValues": {"c": str(max(vals))} if vals else {},
            "nullCount": {"c": 0},
        }
        adds.append({"path": f"f{i}", "stats": _json.dumps(stats)})

    skip = []
    probes = []
    for op, u, as_dec in preds:
        d = _dec_of(u)
        probes.append((op, d))
        skip.append(("c", op, d if as_dec else float(d)))
    kept = {a["path"] for a in prune_adds(adds, skip)}
    for i, vals in enumerate(vals_by_file):
        # soundness vs the EXACT decimal predicate: if the float-typed
        # probe's rounded value widened the match set, keeping extra
        # files is fine; dropping a file whose rows match the exact
        # values is never fine
        has_match = any(
            all(_match(v, op, d) for op, d in probes) for v in vals
        )
        if has_match and all(
            isinstance(s[2], __import__("decimal").Decimal) for s in skip
        ):
            assert f"f{i}" in kept, (vals, skip)


# partition-column variant (r11): bool + int partition values arrive as
# the STRINGS Spark writes into partitionValues; bool('false') is True
# in Python, so this pins the explicit parse.

_BOOL_PRED = st.tuples(st.sampled_from(["=", "=="]), st.booleans())
_INT_PART_PRED = st.tuples(
    st.sampled_from(["=", "<", "<=", ">", ">="]),
    st.integers(min_value=-2, max_value=4),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=-2, max_value=4)),
        min_size=1,
        max_size=6,
    ),
    _BOOL_PRED,
    _INT_PART_PRED,
)
def test_prune_adds_partition_values_sound(parts, bpred, ipred):
    from changedatacapture_reporting_spark.sources.delta_table import (
        prune_adds,
    )

    adds = [
        {
            "path": f"f{i}",
            "partitionValues": {
                "flag": "true" if b else "false",
                "bucket": str(n),
            },
            "stats": '{"numRecords": 1, "minValues": {}, '
            '"maxValues": {}, "nullCount": {}}',
        }
        for i, (b, n) in enumerate(parts)
    ]
    bop, bval = bpred
    iop, ival = ipred
    skip = [("flag", bop, bval), ("bucket", iop, ival)]
    kept = {
        a["path"] for a in prune_adds(adds, skip, ["flag", "bucket"])
    }

    def _m(v, op, x):
        return {
            "=": v == x, "==": v == x, "<": v < x, "<=": v <= x,
            ">": v > x, ">=": v >= x,
        }[op]

    for i, (b, n) in enumerate(parts):
        matches = _m(b, bop, bval) and _m(n, iop, ival)
        if matches:
            assert f"f{i}" in kept, (parts[i], skip)
        else:
            # partition values are EXACT (not an interval) — the pruner
            # must also be complete here: a non-matching partition is
            # always pruned
            assert f"f{i}" not in kept, (parts[i], skip)
