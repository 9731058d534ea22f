"""CHECK constraints, legacy column invariants and generated columns
(public Delta protocol: "Check Constraints", "Column Invariants",
"Generated Columns") — r14 turns the v3–v6 legacy refusals into real
enforcement: one aggregate pass per written batch validates every
constraint, omitted generated columns are computed, provided ones must
equal their expression, and ADD/DROP CONSTRAINT land as metadata-only
commits with the protocol mark real engines require.

Violation semantics are the protocol's strict reading: the expression
must evaluate to TRUE — FALSE and NULL both refuse (stricter than the
SQL standard on NULL, which is the safe interop posture).

Reference parity: the reference assumes warehouse-enforced table
constraints around its changelog tables (CreateChangeLogTables.sql's
PK DDL); this engine enforces them inside the commit path."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_reporting_spark.sources.delta_table import (
    add_check_constraint,
    drop_check_constraint,
    merge_delta,
    read_delta,
    write_delta,
    _resolve_log,
)


def _write_log(base, commits):
    os.makedirs(base + "/_delta_log", exist_ok=True)
    for v, actions in enumerate(commits):
        with open(f"{base}/_delta_log/{v:020d}.json", "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _genesis(base, schema, protocol, config=None):
    _write_log(
        base,
        [[
            {"protocol": protocol},
            {
                "metaData": {
                    "id": "t-inv",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": config or {},
                    "createdTime": 0,
                }
            },
        ]],
    )


def _mk(spark, rows, ddl="k long, v long"):
    return spark.createDataFrame(rows, ddl)


def test_add_constraint_lifecycle(spark, tmp_path):
    """ADD validates existing rows, marks the protocol, enforces on
    later writes; DROP restores writability; duplicate names and
    unsatisfiable constraints refuse."""
    base = str(tmp_path / "t")
    write_delta(spark, _mk(spark, [(1, 10), (2, 20)]), base)

    # existing rows violate → refused, nothing committed
    with pytest.raises(ValueError, match="2 existing row"):
        add_check_constraint(spark, base, "big", "v > 100")
    assert _resolve_log(spark, base, None)["version"] == 0

    v = add_check_constraint(spark, base, "v_pos", "v > 0")
    assert v == 1
    st = _resolve_log(spark, base, None)
    # legacy protocol ratchets to minWriterVersion 3
    assert st["protocol"]["minWriterVersion"] == 3
    assert (
        st["meta"]["configuration"]["delta.constraints.v_pos"] == "v > 0"
    )

    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, base, "V_POS", "v > 0")

    # violating batch refuses with the constraint name and count;
    # NULL is a violation (strict-TRUE semantics)
    with pytest.raises(ValueError, match="v_pos.*1 row"):
        write_delta(spark, _mk(spark, [(3, -1)]), base)
    with pytest.raises(ValueError, match="violates table invariants"):
        write_delta(spark, _mk(spark, [(3, None)]), base)
    assert write_delta(spark, _mk(spark, [(3, 30)]), base) == 2

    drop_check_constraint(spark, base, "v_pos")
    assert write_delta(spark, _mk(spark, [(4, -4)]), base) == 4
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(spark, base, "v_pos")


def test_constraint_feature_protocol_v7(spark, tmp_path):
    """ADD CONSTRAINT on a (·,7) table records the checkConstraints
    writer feature instead of bumping the legacy version."""
    base = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    _genesis(
        base,
        schema,
        {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["appendOnly"],
        },
    )
    add_check_constraint(spark, base, "c1", "v >= 0")
    proto = _resolve_log(spark, base, None)["protocol"]
    assert proto["minWriterVersion"] == 7
    assert set(proto["writerFeatures"]) == {"appendOnly", "checkConstraints"}
    with pytest.raises(ValueError, match="violates"):
        write_delta(spark, _mk(spark, [(1, -1)]), base)


def test_merge_enforces_constraints(spark, tmp_path):
    """MERGE validates its upsert rows — matched rows take the source
    wholesale, so the upsert frame is exactly the new row values."""
    base = str(tmp_path / "t")
    write_delta(spark, _mk(spark, [(1, 10)]), base)
    add_check_constraint(spark, base, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="v_pos"):
        merge_delta(spark, _mk(spark, [(1, -5)]), base, ["k"])
    merge_delta(spark, _mk(spark, [(1, 99), (2, 2)]), base, ["k"])
    assert sorted(
        (r["k"], r["v"]) for r in read_delta(spark, base).collect()
    ) == [(1, 99), (2, 2)]


def test_foreign_legacy_constraint_enforced(spark, tmp_path):
    """A hand-built v3 table with delta.constraints.* (the legacy form
    real SQL engines write) enforces instead of refusing."""
    base = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    _genesis(
        base,
        schema,
        {"minReaderVersion": 1, "minWriterVersion": 3},
        config={"delta.constraints.rng": "v BETWEEN 0 AND 100"},
    )
    assert write_delta(spark, _mk(spark, [(1, 50)]), base) == 1
    with pytest.raises(ValueError, match="rng"):
        write_delta(spark, _mk(spark, [(2, 101)]), base)


def test_legacy_column_invariant_enforced(spark, tmp_path):
    """delta.invariants field metadata (minWriterVersion 2's ancestor
    of CHECK constraints) parses and enforces; a malformed entry
    refuses the write rather than silently skipping the check."""
    base = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField(
                "k",
                T.LongType(),
                True,
                {
                    "delta.invariants": json.dumps(
                        {"expression": {"expression": "k < 1000"}}
                    )
                },
            ),
            T.StructField("v", T.LongType(), True),
        ]
    )
    _genesis(base, schema, {"minReaderVersion": 1, "minWriterVersion": 2})
    assert write_delta(spark, _mk(spark, [(1, 10)]), base) == 1
    with pytest.raises(ValueError, match="column invariant"):
        write_delta(spark, _mk(spark, [(5000, 1)]), base)

    base2 = str(tmp_path / "t2")
    bad = T.StructType(
        [
            T.StructField(
                "k", T.LongType(), True, {"delta.invariants": "{}"}
            ),
        ]
    )
    _genesis(base2, bad, {"minReaderVersion": 1, "minWriterVersion": 2})
    with pytest.raises(ValueError, match="cannot parse"):
        write_delta(spark, _mk(spark, [(1,)], "k long"), base2)


def _gen_schema():
    return T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField(
                "a2",
                T.LongType(),
                True,
                {"delta.generationExpression": "a * 2"},
            ),
        ]
    )


def test_generated_column_computed_when_omitted(spark, tmp_path):
    """Omitted generated columns are computed from their expression
    and land in committed field order."""
    base = str(tmp_path / "t")
    _genesis(
        base, _gen_schema(), {"minReaderVersion": 1, "minWriterVersion": 4}
    )
    write_delta(spark, _mk(spark, [(1,), (2,)], "a long"), base)
    assert sorted(
        (r["a"], r["a2"]) for r in read_delta(spark, base).collect()
    ) == [(1, 2), (2, 4)]


def test_generated_column_validated_when_provided(spark, tmp_path):
    """Provided generated values must equal the expression — a
    mismatch refuses, an exact value (what real writers that
    materialize eagerly produce) lands."""
    base = str(tmp_path / "t")
    _genesis(
        base, _gen_schema(), {"minReaderVersion": 1, "minWriterVersion": 4}
    )
    with pytest.raises(ValueError, match="generated column 'a2'"):
        write_delta(spark, _mk(spark, [(3, 99)], "a long, a2 long"), base)
    write_delta(spark, _mk(spark, [(3, 6)], "a long, a2 long"), base)
    assert sorted(
        (r["a"], r["a2"]) for r in read_delta(spark, base).collect()
    ) == [(3, 6)]


def test_generated_column_merge_computes(spark, tmp_path):
    """MERGE sources may omit generated columns too — computed before
    the source-schema check, validated when provided."""
    base = str(tmp_path / "t")
    _genesis(
        base,
        _gen_schema(),
        {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["generatedColumns"],
        },
    )
    write_delta(spark, _mk(spark, [(1,)], "a long"), base)
    merge_delta(spark, _mk(spark, [(1,), (5,)], "a long"), base, ["a"])
    assert sorted(
        (r["a"], r["a2"]) for r in read_delta(spark, base).collect()
    ) == [(1, 2), (5, 10)]
    with pytest.raises(ValueError, match="generated column"):
        merge_delta(
            spark, _mk(spark, [(7, 1)], "a long, a2 long"), base, ["a"]
        )
