"""Unit tests for the core populate dataflow (SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_reporting_spark.config import CompatFlags
from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
    pair_update_images,
)
from changedatacapture_reporting_spark.schema import DELETED_RECORD, NEW_RECORD

PK = ["id", "tenant_id"]


def _rows(df):
    return {
        (
            r.commit_time.isoformat(),
            r.id,
            r.tenant_id,
            r.column_name,
            r.old_value,
            r.new_value,
        )
        for r in df.collect()
    }


def test_update_emits_one_row_per_changed_column(spark, cdc_fixture):
    log = build_changelog(cdc_fixture, PK, with_audit_cols=False)
    upd = log.filter(F.col("column_name").isNotNull())
    got = _rows(upd)
    assert ("2024-01-02T09:00:00", 1, 1, "name", "a", "a2") in got
    assert ("2024-01-02T09:00:00", 1, 1, "qty", "10", "11") in got
    # unchanged columns of that update emit nothing
    assert not any(
        r for r in got if r[0] == "2024-01-02T09:00:00" and r[3] in ("id", "tenant_id", "note")
    )


def test_null_transitions_are_detected(spark, cdc_fixture):
    got = _rows(build_changelog(cdc_fixture, PK, with_audit_cols=False))
    assert ("2024-01-02T09:30:00", 1, 1, "note", None, "filled") in got
    assert ("2024-01-02T09:45:00", 2, 1, "note", "x", None) in got


def test_insert_delete_markers(spark, cdc_fixture):
    log = build_changelog(cdc_fixture, PK, with_audit_cols=False)
    markers = log.filter(F.col("column_name").isNull())
    got = _rows(markers)
    assert ("2024-01-01T10:00:00", 1, 1, None, None, NEW_RECORD) in got
    assert ("2024-01-03T08:00:00", 3, 2, None, DELETED_RECORD, None) in got
    assert sum(1 for r in got if r[5] == NEW_RECORD) == 3
    assert sum(1 for r in got if r[4] == DELETED_RECORD) == 1


def test_same_lsn_double_update_does_not_cross_match(spark, cdc_fixture):
    """Two updates to one row in one transaction (lsn=8) must pair each
    before with ITS OWN after — the reference's join on (lsn, column, pk)
    alone would cross-match (SURVEY.md §2.3 J1 gap)."""
    log = build_changelog(cdc_fixture, PK, with_audit_cols=False)
    got = _rows(log.filter(F.to_date("commit_time") == "2024-01-04"))
    assert ("2024-01-04T12:00:00", 2, 1, "qty", "20", "21") in got
    assert ("2024-01-04T12:00:00", 2, 1, "qty", "21", "22") in got
    assert len(got) == 2  # no 20→22 / 21→21 cross-products


def test_pk_json_canonical_form(spark, cdc_fixture):
    log = build_changelog(cdc_fixture, PK, with_audit_cols=False)
    r = log.filter(
        (F.col("id") == 1) & F.col("column_name").isNull()
    ).head()
    assert r.pk_json == '{"id":1,"tenant_id":1}'


def test_truncate128_compat_flag(spark):
    from pyspark.sql import types as T

    src = T.StructType([T.StructField("id", T.IntegerType()),
                        T.StructField("v", T.StringType())])
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("commit_ts", T.TimestampType()),
            T.StructField("op", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("before", src),
            T.StructField("after", src),
        ]
    )
    import datetime as dt

    long_v = "x" * 200
    df = spark.createDataFrame(
        [(1, 0, dt.datetime(2024, 1, 1), "update", "t", (1, "a"), (1, long_v))],
        schema,
    )
    faithful = build_changelog(
        df, ["id"], flags=CompatFlags(truncate128=True), with_audit_cols=False
    )
    assert faithful.head().new_value == "x" * 128
    exact = build_changelog(df, ["id"], with_audit_cols=False)
    assert exact.head().new_value == long_v


def test_global_order_compat_flag(spark, cdc_fixture):
    """CompatFlags.global_order reproduces the reference's total ORDER BY
    (populate:390–394); default leaves ordering to the sink."""
    ordered = build_changelog(
        cdc_fixture, PK, flags=CompatFlags(global_order=True),
        with_audit_cols=False,
    ).collect()
    keys = [
        (r.commit_time, r.id, r.tenant_id, r.column_name or "") for r in ordered
    ]
    assert keys == sorted(keys)


def test_schema_evolution_new_source_column(spark, tmp_path):
    """S2 dynamic-schema story: when the source grows a column, the EAV
    changelog absorbs it with NO sink schema change — the new column's
    changes appear as ordinary (column_name, old, new) rows and append to
    the same parquet sink (the reference re-discovers columns from
    sys.columns each run, populate:295; ours re-reads df.schema)."""
    import datetime as dt

    from pyspark.sql import types as T

    def evt_schema(fields):
        src = T.StructType([T.StructField(n, t) for n, t in fields])
        return T.StructType(
            [
                T.StructField("lsn", T.LongType(), False),
                T.StructField("seq", T.LongType(), False),
                T.StructField("commit_ts", T.TimestampType(), False),
                T.StructField("op", T.StringType(), False),
                T.StructField("table_name", T.StringType(), False),
                T.StructField("before", src, True),
                T.StructField("after", src, True),
            ]
        )

    ts = dt.datetime(2024, 1, 1, 10, 0)
    v1 = spark.createDataFrame(
        [(1, 0, ts, "update", "t", (1, "a"), (1, "b"))],
        evt_schema([("id", T.IntegerType()), ("name", T.StringType())]),
    )
    v2 = spark.createDataFrame(
        [(2, 0, ts, "update", "t", (1, "b", None), (1, "b", 5))],
        evt_schema(
            [
                ("id", T.IntegerType()),
                ("name", T.StringType()),
                ("score", T.IntegerType()),
            ]
        ),
    )
    sink = str(tmp_path / "sink")
    for ev in (v1, v2):
        build_changelog(ev, ["id"], with_audit_cols=False).write.mode(
            "append"
        ).parquet(sink)

    log = spark.read.parquet(sink)
    assert {r.column_name for r in log.collect()} == {"name", "score"}
    score_row = log.filter(F.col("column_name") == "score").head()
    assert (score_row.old_value, score_row.new_value) == (None, "5")


def test_changelog_plan_is_single_scan(spark, sf_dir):
    """The fused build must stay one source scan with no union — the
    branch-per-op formulation silently triples source reads."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_PK,
        simulate_cdc_events,
    )

    df = build_changelog(
        simulate_cdc_events(spark, sf_dir), SIM_PK, with_audit_cols=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan


def test_pair_update_images_join_path(spark, cdc_fixture):
    """J1: the reference's literal join shape over split before/after rows
    must agree with the join-free paired path."""
    upd = cdc_fixture.filter(F.col("op") == "update")
    value_cols = [f.name for f in cdc_fixture.schema["after"].dataType.fields]
    changed = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}")),
                    F.lit(c),
                )
                for c in value_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    before_rows = upd.select(
        "lsn", "seq", "commit_ts", "table_name",
        F.col("before").alias("image"), changed.alias("changed_cols"),
    )
    after_rows = upd.select(
        "lsn", "seq", "commit_ts", "table_name",
        F.col("after").alias("image"), changed.alias("changed_cols"),
    )
    joined = pair_update_images(before_rows, after_rows, PK)
    direct = build_changelog(cdc_fixture, PK, with_audit_cols=False).filter(
        F.col("column_name").isNotNull()
    )
    j = {tuple(r) for r in joined.select(
        "commit_time", "table_name", "id", "tenant_id",
        "column_name", "old_value", "new_value").collect()}
    d = {tuple(r) for r in direct.select(
        "commit_time", "table_name", "id", "tenant_id",
        "column_name", "old_value", "new_value").collect()}
    assert j == d


def test_byte_compat_schema_mirrors_reference_ddl(spark, cdc_fixture):
    """With the fidelity flags on, SELECT * consumers of the reference
    changelog (usp_cdc_query_data.sql:50) see every DDL column
    (usp_cdc_populate_changelog.sql:144–156) in DDL order; pk_json is our
    documented composite-PK extension."""
    flags = CompatFlags(surrogate_id=True, audit_modified_cols=True)
    out = build_changelog(cdc_fixture, PK, flags=flags)

    ddl_cols = [
        "changelog_id",  # <desttable>_id IDENTITY (populate:144,156)
        "commit_time",
        "table_name",
        *PK,
        "column_name",
        "old_value",
        "new_value",
        "created_dt",
        "created_by",
        "modified_dt",
        "modified_by",
    ]
    got = [c for c in out.columns if c in ddl_cols]
    assert got == ddl_cols

    rows = out.select("changelog_id", "modified_dt", "modified_by").collect()
    assert len({r.changelog_id for r in rows}) == len(rows)  # unique key
    assert all(r.modified_dt is None and r.modified_by is None for r in rows)

    # defaults stay lean: no compat columns unless asked
    lean = build_changelog(cdc_fixture, PK)
    assert "changelog_id" not in lean.columns
    assert "modified_dt" not in lean.columns
