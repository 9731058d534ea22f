"""Query registry backing ``__spark_entry__`` (the driver contract).

Each entry: name → (spark_fn, oracle_sql | None).

- ``spark_fn(spark, sf_dir) -> DataFrame`` runs the operator through this
  engine's real code path (NOT a SQL re-statement) — it exercises the
  operators in changedatacapture_reporting_spark.operators.
- ``oracle_sql`` is DuckDB SQL over the pre-registered fixture views that
  computes the same result. Column names/aliases match exactly — the
  driver's comparator sorts columns by name before hashing.
- Entries whose semantics aren't SQL-expressible (LSH banding, streaming
  state) carry ``None`` → driver does a rows-only check; pytest covers
  their correctness against brute-force equivalents instead.

Float policy: any double aggregate compared against the oracle is either
computed on DECIMAL (exact, order-independent) or rounded far below the
accumulation-order noise floor, so Spark-vs-DuckDB summation order can't
flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
    pair_update_images,
)
from changedatacapture_reporting_spark.operators.query_data import (
    freshness,
    query_changelog,
)
from changedatacapture_reporting_spark.sources.cdc_simulator import (
    ORACLE_EVENTS_CTE,
    SIM_PK,
    simulate_cdc_events,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

CHANGELOG_OUT = [
    "commit_time",
    "table_name",
    "o_orderkey",
    "column_name",
    "old_value",
    "new_value",
]

# ---------------------------------------------------------------------------
# CDC core (SURVEY.md §2.1–§2.9)
# ---------------------------------------------------------------------------


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = simulate_cdc_events(spark, sf_dir)
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


# The full populate dataflow in oracle form: per-column change rows
# (UNION ALL per column = UNPIVOT with NULL-drop) + insert/delete markers.
_ORACLE_CHANGES = f"""
WITH {ORACLE_EVENTS_CTE},
upd AS (SELECT * FROM ev WHERE op = 'update'),
changes AS (
  SELECT commit_ts AS commit_time, 'orders' AS table_name, o_orderkey,
         'status' AS column_name, b_status AS old_value, a_status AS new_value
  FROM upd WHERE b_status IS DISTINCT FROM a_status
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'priority', b_priority, a_priority
  FROM upd WHERE b_priority IS DISTINCT FROM a_priority
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'total',
         CAST(b_total AS VARCHAR), CAST(a_total AS VARCHAR)
  FROM upd WHERE b_total IS DISTINCT FROM a_total
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'note', b_note, a_note
  FROM upd WHERE b_note IS DISTINCT FROM a_note
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, NULL, 'DELETED RECORD', NULL
  FROM ev WHERE op = 'delete'
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, NULL, NULL, 'NEW RECORD'
  FROM ev WHERE op = 'insert'
)
"""


def _q_changelog_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _changelog(spark, sf_dir)


_SQL_CHANGELOG_FULL = (
    _ORACLE_CHANGES
    + "SELECT commit_time, table_name, o_orderkey, column_name, old_value,"
    " new_value FROM changes"
)


def _q_changelog_join_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's literal before/after pairing join over split
    image rows ('all update old' shape, populate:340–364)."""
    events = simulate_cdc_events(spark, sf_dir)
    upd = events.filter(F.col("op") == "update")
    value_cols = [f.name for f in events.schema["after"].dataType.fields]
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
    b = upd.select("lsn", "seq", "commit_ts", "table_name",
                   F.col("before").alias("image"), changed.alias("changed_cols"))
    a = upd.select("lsn", "seq", "commit_ts", "table_name",
                   F.col("after").alias("image"), changed.alias("changed_cols"))
    out = pair_update_images(b, a, SIM_PK)
    return out.select(*CHANGELOG_OUT)


_SQL_CHANGELOG_JOIN_PATH = (
    _ORACLE_CHANGES
    + "SELECT commit_time, table_name, o_orderkey, column_name, old_value,"
    " new_value FROM changes WHERE column_name IS NOT NULL"
)


def _q_query_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — day-truncated inclusive time-range slice (query:49–57)."""
    log = _changelog(spark, sf_dir)
    return query_changelog(
        log, "1995-03-15 13:45:00", "1996-09-01 02:30:00"
    ).select(*CHANGELOG_OUT)


_SQL_QUERY_WINDOW = (
    _ORACLE_CHANGES
    + """
SELECT commit_time, table_name, o_orderkey, column_name, old_value, new_value
FROM changes
WHERE CAST(commit_time AS DATE) >= DATE '1995-03-15'
  AND CAST(commit_time AS DATE) <= DATE '1996-09-01'
"""
)


def _q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — freshness banner, MM/dd/yyyy (query:41–46), on commit_time
    (created_dt is wall-clock and can't be oracle-compared)."""
    return freshness(_changelog(spark, sf_dir), ts_col="commit_time")


_SQL_FRESHNESS = (
    _ORACLE_CHANGES
    + """
SELECT 'ATTENTION: Data is accurate as of ' || strftime(MAX(commit_time), '%m/%d/%Y') AS message,
       strftime(MAX(commit_time), '%m/%d/%Y') AS accurate_as_of
FROM changes
"""
)


def _q_watermark_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — min capture time + reference-style MAX+1min resume point
    (populate:195, 203)."""
    events = simulate_cdc_events(spark, sf_dir)
    return events.agg(
        F.min("commit_ts").alias("min_capture_ts"),
        (F.max("commit_ts") + F.expr("INTERVAL 1 MINUTE")).alias(
            "legacy_resume_ts"
        ),
        F.max("lsn").alias("watermark_lsn"),
    )


_SQL_WATERMARK_BOUNDS = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT MIN(commit_ts) AS min_capture_ts,
       MAX(commit_ts) + INTERVAL 1 MINUTE AS legacy_resume_ts,
       MAX(lsn) AS watermark_lsn
FROM ev
"""


def _q_incremental_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1/ST2 — incremental run over the (watermark, to] LSN window:
    only events with lsn > 3000 contribute (exact semantics, not the
    reference's +1-minute hop)."""
    events = simulate_cdc_events(spark, sf_dir).filter(F.col("lsn") > 3000)
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


_SQL_INCREMENTAL_RESUME = (
    _ORACLE_CHANGES
    + "SELECT commit_time, table_name, o_orderkey, column_name, old_value,"
    " new_value FROM changes WHERE o_orderkey > 3000"
)


def _q_reconstruct_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog replay → current state (operators.reconstruct): build the
    changelog with insert images recorded, then rebuild every live row's
    string-typed image. Updates of rows with no recorded insert keep NULL
    for never-changed columns — the oracle mirrors that."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )

    events = simulate_cdc_events(spark, sf_dir)
    log = build_changelog(
        events,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    return reconstruct_state(
        log, SIM_PK, ["status", "priority", "total", "note"]
    )


def _q_state_snapshot_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving snapshot round trip (operators.serving): materialize
    current state from the first half of the LSN range, then refresh
    incrementally with the full changelog — only buckets containing
    changed pks are rewritten (marker-manifest replace commit). The
    final snapshot must equal the one-shot reconstruction, so it shares
    the reconstruct oracle; the merge semantics (per-column touched
    flags, delete, re-insert epochs, crash idempotence) are pytest-
    covered in tests/test_serving.py."""
    import tempfile

    from changedatacapture_reporting_spark.operators.serving import (
        build_state_snapshot,
        read_state_snapshot,
        refresh_state_snapshot,
    )

    events = simulate_cdc_events(spark, sf_dir)
    log = build_changelog(
        events,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    value_cols = ["status", "priority", "total", "note"]
    mid = int(log.agg(F.expr("percentile(lsn, 0.5)")).head()[0])
    path = tempfile.mkdtemp(prefix="state_snap_") + "/state"
    build_state_snapshot(
        spark,
        log.filter(F.col("lsn") <= mid),
        path,
        SIM_PK,
        value_cols,
        n_buckets=16,
    )
    refresh_state_snapshot(spark, log, path, SIM_PK, value_cols)
    return read_state_snapshot(spark, path).select(*SIM_PK, *value_cols)


# each key has exactly one simulated event, so final state per key is that
# event's contribution: inserts record every column; updates only changed
# columns; deletes drop the row
_SQL_RECONSTRUCT = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT o_orderkey,
       CASE WHEN op = 'insert' THEN a_status
            WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
       CASE WHEN op = 'insert' THEN a_priority
            WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
       CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
            WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR) END AS total,
       CASE WHEN op = 'insert' THEN a_note
            WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note
FROM ev
WHERE op != 'delete'
  -- a no-op update leaves no changelog rows, so the replay can't see it
  AND NOT (op = 'update'
           AND b_status IS NOT DISTINCT FROM a_status
           AND b_priority IS NOT DISTINCT FROM a_priority
           AND b_total IS NOT DISTINCT FROM a_total
           AND b_note IS NOT DISTINCT FROM a_note)
"""


def _q_mssql_shape_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference-input parity: synthesize ``fn_cdc_get_all_changes``-
    shaped rows ('all update old': separate op-3/op-4 update rows, hex
    ``__$start_lsn``, ``__$seqval``, ``__$update_mask``, commit time only
    via an LSN→time map), run them through sources.mssql_cdc back into the
    event model, then the changelog builder. Oracle = the same SQL as
    cdc_changelog_full — the adapter must be a lossless round trip."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_VALUE_COLS,
    )
    from changedatacapture_reporting_spark.sources.mssql_cdc import (
        mssql_rows_to_events,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    hex_lsn = F.concat(F.lit("0x"), F.lpad(F.hex(F.col("lsn")), 20, "0"))
    mask = F.aggregate(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}")),
                        F.lit(1 << i),
                    )
                    for i, c in enumerate(SIM_VALUE_COLS)
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b.cast("long")),
    )

    def shape(src: str, op_val: int, flt):
        return ev.filter(flt).select(
            hex_lsn.alias("__$start_lsn"),
            F.col("seq").alias("__$seqval"),
            F.lit(op_val).alias("__$operation"),
            mask.alias("__$update_mask"),
            F.col("table_name"),
            F.col(f"{src}.*"),
        )

    rows = (
        shape("before", 1, F.col("op") == "delete")
        .unionByName(shape("after", 2, F.col("op") == "insert"))
        .unionByName(shape("before", 3, F.col("op") == "update"))
        .unionByName(shape("after", 4, F.col("op") == "update"))
    )
    lsn_time_map = ev.select("lsn", "commit_ts").distinct()
    events = mssql_rows_to_events(rows, SIM_VALUE_COLS, lsn_time_map)
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


def _q_jdbc_shape_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-JDBC input-form parity (sources.jdbc_cdc — the reference's
    actual input is fn_cdc_get_all_changes over a live connection,
    populate:319): synthesize the exact row shape
    :func:`sources.jdbc_cdc.mssql_cdc_query` projects server-side
    ('all update old' op-3/4 split, hex LSN, long seqval/mask, resolved
    commit_ts, lsn_num), apply the stand-in reader's inclusive LSN
    window (file_cdc_rows — the same semantics the server's TVF bounds
    give), pair back into the event model, build the changelog. Oracle
    = the changelog SQL restricted to the same window. The real
    read_cdc_jdbc differs only in the row producer (JDBC load vs this
    frame) — everything exercised here is the shared code."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_VALUE_COLS,
    )
    from changedatacapture_reporting_spark.sources.jdbc_cdc import (
        file_cdc_rows,
        make_cdc_function_rows,
    )
    from changedatacapture_reporting_spark.sources.mssql_cdc import (
        mssql_rows_to_events,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    rows = make_cdc_function_rows(ev, SIM_VALUE_COLS)
    windowed = file_cdc_rows(rows, _JDBC_WINDOW[0], _JDBC_WINDOW[1])
    events = mssql_rows_to_events(windowed, SIM_VALUE_COLS)
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


# inclusive LSN window for the JDBC roundtrip — inside every sf's key
# range (sf0.001 orders keys reach ~6000)
_JDBC_WINDOW = (1000, 4000)

_SQL_JDBC_ROUNDTRIP = f"""
WITH {ORACLE_EVENTS_CTE},
evw AS (
  SELECT * FROM ev
  WHERE lsn BETWEEN {_JDBC_WINDOW[0]} AND {_JDBC_WINDOW[1]}
),
upd AS (SELECT * FROM evw WHERE op = 'update'),
changes AS (
  SELECT commit_ts AS commit_time, 'orders' AS table_name, o_orderkey,
         'status' AS column_name, b_status AS old_value, a_status AS new_value
  FROM upd WHERE b_status IS DISTINCT FROM a_status
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'priority', b_priority, a_priority
  FROM upd WHERE b_priority IS DISTINCT FROM a_priority
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'total',
         CAST(b_total AS VARCHAR), CAST(a_total AS VARCHAR)
  FROM upd WHERE b_total IS DISTINCT FROM a_total
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, 'note', b_note, a_note
  FROM upd WHERE b_note IS DISTINCT FROM a_note
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, NULL, 'DELETED RECORD', NULL
  FROM evw WHERE op = 'delete'
  UNION ALL
  SELECT commit_ts, 'orders', o_orderkey, NULL, NULL, 'NEW RECORD'
  FROM evw WHERE op = 'insert'
)
SELECT commit_time, table_name, o_orderkey, column_name, old_value,
       new_value FROM changes
"""


def _q_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC parsing parity for the open wire format: serialize the simulated
    events as Debezium JSON envelopes (sources.debezium.events_to_debezium
    — the outbound adapter), parse them back (parse_debezium → from_json),
    build the changelog. Oracle = the same SQL as cdc_changelog_full, so
    the adapter pair must be a lossless round trip."""
    from changedatacapture_reporting_spark.sources.debezium import (
        events_to_debezium,
        parse_debezium,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    json_df = events_to_debezium(ev)
    source_struct = ev.schema["after"].dataType
    events = parse_debezium(json_df, "value", source_struct)
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


def _q_debezium_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter classification (sources.debezium.parse_debezium_tagged):
    the simulated stream is serialized to Debezium JSON with DETERMINISTIC
    corruption — op replaced (k%13), lsn nulled (k%17), JSON truncated
    (k%19), required image nulled (k%23), first match wins — and the
    tagged parser must route every document to exactly the reason the
    arithmetic predicts (NULL = well-formed). The oracle replays the
    modular rules directly."""
    from changedatacapture_reporting_spark.sources.debezium import (
        parse_debezium_tagged,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    k = F.col("lsn")
    c_op = k % 13 == 0
    c_lsn = ~c_op & (k % 17 == 0)
    c_json = ~c_op & ~c_lsn & (k % 19 == 0)
    c_img = ~c_op & ~c_lsn & ~c_json & (k % 23 == 0)

    dbz_op = (
        F.when(c_op, F.lit("x"))
        .when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    null_img = F.lit(None).cast(ev.schema["after"].dataType)
    before = F.when(c_img & (F.col("op") == "delete"), null_img).otherwise(
        F.col("before")
    )
    after = F.when(c_img & (F.col("op") != "delete"), null_img).otherwise(
        F.col("after")
    )
    envelope = F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            F.struct(
                F.when(~c_lsn, F.col("lsn")).alias("lsn"),
                F.col("seq").alias("sequence"),
                (F.unix_micros(F.col("commit_ts").cast("timestamp")) / 1000)
                .cast("long")
                .alias("ts_ms"),
                F.col("table_name").alias("table"),
            ).alias("source"),
            dbz_op.alias("op"),
        )
    )
    doc = F.when(c_json, F.substring(envelope, 1, 10)).otherwise(envelope)
    json_df = ev.select(doc.alias("value"))
    tagged = parse_debezium_tagged(
        json_df, "value", ev.schema["after"].dataType
    )
    return tagged.groupBy("reject_reason").agg(F.count("*").alias("n"))


_SQL_DEBEZIUM_DLQ = """
SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'unknown-op'
            WHEN o_orderkey % 17 = 0 THEN 'missing-lsn'
            WHEN o_orderkey % 19 = 0 THEN 'unparseable'
            WHEN o_orderkey % 23 = 0 THEN 'missing-image'
       END AS reject_reason,
       COUNT(*) AS n
FROM orders
GROUP BY 1
"""


def _q_backfill_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-event backfill (operators.populate.backfill_changelog): the
    sink is populated with a gapped stream (keys lsn % 5 ∈ {2, 3}
    missed — interspersed BELOW the watermark, so a normal populate run
    correctly refuses them), then backfilled from the full stream — the
    dedup anti-join drops every already-present row and appends only
    the gap. Reading the sink back must equal the full-changelog
    oracle, bit for bit."""
    import tempfile

    from changedatacapture_reporting_spark.operators.populate import (
        backfill_changelog,
        populate_changelog,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    sink = tempfile.mkdtemp(prefix="backfill_") + "/sink"
    gapped = ev.filter(~(F.col("lsn") % 5).isin(2, 3))
    populate_changelog(spark, gapped, sink, SIM_PK)
    backfill_changelog(spark, ev, sink, SIM_PK)
    return spark.read.parquet(sink).select(*CHANGELOG_OUT)


def _q_populate_delta_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog populate with a Delta-format sink (VERDICT r12 #6 —
    the sink unification): two windowed runs (resume across the split)
    plus an exact-replay third run that must load NOTHING, all through
    ONE commit protocol — the per-table watermark txn actions land in
    the same atomic Delta commit as the data. Reading the table back
    must equal the full-changelog oracle bit for bit, proving the
    split/resume/idempotence semantics match the parquet sink's (whose
    own contracts remain separate)."""
    import tempfile

    from changedatacapture_reporting_spark.operators.populate import (
        populate_changelog,
    )
    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    sink = tempfile.mkdtemp(prefix="popdelta_") + "/sink"
    kw = dict(maintain_rollup=False, sink_format="delta")
    populate_changelog(spark, ev, sink, SIM_PK, to_lsn=3000, **kw)
    populate_changelog(spark, ev, sink, SIM_PK, **kw)
    replay = populate_changelog(spark, ev, sink, SIM_PK, **kw)
    assert replay.rows_changed == 0, replay
    return read_delta(spark, sink).select(*CHANGELOG_OUT)


def _q_forget_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten (operators.forget.purge_keys_from_sink):
    populate a real changelog sink, then erase keys ``k % 50 == 3`` in
    place — only the data files containing those keys are rewritten,
    committed through the replace-marker protocol. Reading the sink back
    must equal the full-changelog oracle minus every trace of the purged
    keys (values, markers, everything)."""
    import tempfile

    from changedatacapture_reporting_spark.operators.forget import (
        purge_keys_from_sink,
    )
    from changedatacapture_reporting_spark.operators.populate import (
        populate_changelog,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    sink = tempfile.mkdtemp(prefix="forget_") + "/sink"
    populate_changelog(spark, ev, sink, SIM_PK)
    k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
    keys = ev.select(k.alias("o_orderkey")).filter(k % 50 == 3).distinct()
    purge_keys_from_sink(spark, sink, keys, SIM_PK)
    return spark.read.parquet(sink).select(*CHANGELOG_OUT)


_SQL_FORGET = (
    _ORACLE_CHANGES
    + "SELECT commit_time, table_name, o_orderkey, column_name, old_value,"
    " new_value FROM changes WHERE o_orderkey % 50 != 3"
)


def _q_forget_keys_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the DELTA-format changelog sink
    (VERDICT r13 #7, operators.forget._purge_keys_from_delta_sink):
    populate with ``sink_format='delta'``, erase keys ``k % 50 == 3``
    through the SAME purge_keys_from_sink entry point — which routes to
    vector DELETE + targeted OPTIMIZE — then vacuum down to the live
    version so the purged values physically leave the disk. The read
    back must equal the full-changelog oracle minus every trace of the
    purged keys, identical to the parquet sink's proof."""
    import tempfile

    from changedatacapture_reporting_spark.operators.forget import (
        purge_keys_from_sink,
    )
    from changedatacapture_reporting_spark.operators.populate import (
        populate_changelog,
    )
    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        vacuum_delta,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    sink = tempfile.mkdtemp(prefix="forget_delta_") + "/sink"
    populate_changelog(
        spark, ev, sink, SIM_PK,
        maintain_rollup=False, sink_format="delta",
    )
    k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
    keys = ev.select(k.alias("o_orderkey")).filter(k % 50 == 3).distinct()
    res = purge_keys_from_sink(spark, sink, keys, SIM_PK)
    assert res["rows_purged"] > 0 and res["files_rewritten"] > 0, res
    vacuum_delta(spark, sink, retain_versions=1, orphan_min_age_minutes=0)
    return read_delta(spark, sink).select(*CHANGELOG_OUT)


def _q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-instance schema evolution
    (operators.schema_evolution.align_cdc_schemas): the simulated stream
    is split into a v1 frame (even keys, images WITHOUT the ``note``
    column — events captured before the column existed) and a v2 frame
    (odd keys, full images); aligning and building one changelog must
    yield exactly the full changelog minus note-change rows for v1
    events — absent columns are NULL in BOTH images, so null-safe change
    detection stays silent instead of fabricating old→NULL rows."""
    from changedatacapture_reporting_spark.operators.schema_evolution import (
        align_cdc_schemas,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    k = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
    v1 = ev.filter(k % 2 == 0).select(
        "lsn",
        "seq",
        "commit_ts",
        "op",
        "table_name",
        F.col("before").dropFields("note").alias("before"),
        F.col("after").dropFields("note").alias("after"),
    )
    v2 = ev.filter(k % 2 != 0)
    aligned = align_cdc_schemas([v1, v2])
    return build_changelog(aligned, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


# the full-changelog oracle with note changes restricted to v2 (odd) keys
_SQL_SCHEMA_EVOLUTION = _SQL_CHANGELOG_FULL.replace(
    "FROM upd WHERE b_note IS DISTINCT FROM a_note",
    "FROM upd WHERE b_note IS DISTINCT FROM a_note AND o_orderkey % 2 != 0",
)


def _q_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-transport parity (sources.kafka): the simulated events are
    serialized to Debezium envelopes, wrapped as Kafka-shaped records
    (key/value binary + topic/partition/offset — the exact schema
    spark-sql-kafka emits), parsed back through the one-pass tagged
    parser with replay addresses, and rebuilt into the changelog. Oracle
    = the same SQL as cdc_changelog_full, so the whole transport wrap /
    unwrap must be lossless. The real-connector path differs only in the
    record producer (kafka_stream vs make_kafka_records) — everything
    exercised here is the shared code."""
    from changedatacapture_reporting_spark.sources.debezium import (
        events_to_debezium,
    )
    from changedatacapture_reporting_spark.sources.kafka import (
        kafka_debezium_events,
        make_kafka_records,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    records = make_kafka_records(
        events_to_debezium(ev), "value", topic="cdc.orders", key_col="value"
    )
    tagged = kafka_debezium_events(records, ev.schema["after"].dataType)
    events = tagged.filter(F.col("reject_reason").isNull()).select(
        "lsn", "seq", "commit_ts", "op", "table_name", "before", "after"
    )
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


def _q_delta_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC parsing parity for the third SURVEY §1.3 input form: serialize
    the simulated events into Delta-CDF-convention rows (update pre/post
    image pairs sharing a ``_commit_version``), re-pair them back into the
    event model (sources.delta_cdf.cdf_rows_to_events — one aggregation,
    no self-join), build the changelog. Oracle = the same SQL as
    cdc_changelog_full — the adapter must be a lossless round trip."""
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        SIM_VALUE_COLS,
    )
    from changedatacapture_reporting_spark.sources.delta_cdf import (
        cdf_rows_to_events,
        events_to_cdf_rows,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    cdf = events_to_cdf_rows(ev)
    events = cdf_rows_to_events(
        cdf, SIM_PK, SIM_VALUE_COLS, table_name="orders"
    )
    return build_changelog(events, SIM_PK, with_audit_cols=False).select(
        *CHANGELOG_OUT
    )


def _q_delta_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-native Delta Lake table format (sources.delta_table —
    the lakehouse-interchange gap behind fs.py's own commit protocol):
    four commits against a real _delta_log (append, append, OVERWRITE
    as an atomic replace, checkpoint compaction, then one post-
    checkpoint append), hive-partitioned on o_orderstatus, read back at
    the LATEST version through the checkpoint + tail-JSON replay path.
    The oracle computes the post-overwrite survivor set directly — so
    the hash check proves adds/removes/checkpoint/partition-typing all
    resolved correctly. Time travel and spec-shape assertions live in
    tests/test_delta_table.py."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_tbl_") + "/orders_delta"
    write_delta(
        spark, orders.filter(k % 10 == 0), path,
        partition_by=["o_orderstatus"],
    )
    write_delta(
        spark, orders.filter(k % 10 == 1), path,
        partition_by=["o_orderstatus"],
    )
    write_delta(
        spark, orders.filter(k % 7 == 0), path,
        mode="overwrite", partition_by=["o_orderstatus"],
    )
    write_checkpoint(spark, path)
    write_delta(
        spark, orders.filter(k % 7 == 1), path,
        partition_by=["o_orderstatus"],
    )
    return read_delta(spark, path)


_SQL_DELTA_TABLE = """
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders WHERE o_orderkey % 7 IN (0, 1)
"""


def _q_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE compaction (sources.delta_table.optimize_delta): five
    small appends land ~5 files per partition (the small-file problem
    every incremental ingestion loop creates), one optimize rewrites
    each partition's files into a single target-sized file and commits
    the swap with dataChange:false remove+add actions, and the table is
    read back AT THE OPTIMIZED VERSION — the hash check proves the
    rewrite changed layout without changing a single row. File-count /
    time-travel / vacuum / conflict assertions live in
    tests/test_delta_table.py."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        optimize_delta,
        read_delta,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_opt_") + "/orders_delta"
    for i in range(5):
        write_delta(
            spark, orders.filter(k % 7 == i), path,
            partition_by=["o_orderstatus"],
        )
    res = optimize_delta(spark, path, target_file_bytes=1 << 30)
    assert res["version"] is not None and res["files_removed"] > res[
        "files_added"
    ], res
    return read_delta(spark, path, version=res["version"])


_SQL_DELTA_OPTIMIZE = """
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders WHERE o_orderkey % 7 <= 4
"""


def _q_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (sources.delta_table.merge_delta): one transaction
    carrying updates (k%5==0 non-deleted rows re-prioritized), inserts
    (k%11==0 keys shifted into a fresh key range) and deletes (k%7==3)
    against a hive-partitioned table built from two appends. The merge
    rewrites ONLY the files containing matched keys (discovery = one
    pk-pruned provenance scan + broadcast semi-join; I/O ∝ touched
    files) and the table is read back at the merged version — the hash
    check proves update/insert/delete semantics and survivor rewriting
    in one shot. Conflict/ambiguity/no-op edges live in
    tests/test_delta_table.py."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        merge_delta,
        read_delta,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_mrg_") + "/orders_delta"
    write_delta(
        spark, orders.filter(k % 2 == 0), path,
        partition_by=["o_orderstatus"],
    )
    write_delta(
        spark, orders.filter(k % 2 == 1), path,
        partition_by=["o_orderstatus"],
    )
    updates = (
        orders.filter((k % 5 == 0) & (k % 7 != 3))
        .withColumn("o_orderpriority", F.lit("X-MERGED"))
        .withColumn("_delete", F.lit(False))
    )
    inserts = orders.filter(k % 11 == 0).select(
        (k + 10_000_000).alias("o_orderkey"),
        F.lit("X-NEW").alias("o_orderpriority"),
        "o_orderstatus",
    ).withColumn("_delete", F.lit(False))
    deletes = orders.filter(k % 7 == 3).withColumn(
        "_delete", F.lit(True)
    )
    res = merge_delta(
        spark,
        updates.unionByName(inserts).unionByName(deletes),
        path,
        ["o_orderkey"],
        delete_col="_delete",
    )
    assert res["version"] == 2 and res["files_rewritten"] > 0, res
    return read_delta(spark, path, version=res["version"])


_SQL_DELTA_MERGE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
)
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 3
            THEN 'X-MERGED' ELSE o_orderpriority END AS o_orderpriority,
       o_orderstatus
FROM base
WHERE o_orderkey % 7 <> 3
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey,
       'X-NEW' AS o_orderpriority,
       o_orderstatus
FROM base
WHERE o_orderkey % 11 = 0
"""


def _q_delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion vectors (sources.delta_table, public Delta protocol DV
    feature): the same MERGE transaction as delta_merge_upsert but in
    vector mode — matched rows are marked dead in a per-commit vector,
    touched files are never read in full or rewritten (write
    amplification ∝ matched rows, the 100 TB update/GDPR shape) — then
    a vector DELETE on a second key set, then a checkpoint, and the
    table is read back THROUGH the checkpoint replay. The hash check
    proves: vectors delete exactly the matched rows, upserts land, the
    carry-over across two vector commits is complete, and checkpointing
    preserves the vectors (a dropped vector would resurrect rows).
    Lifecycle edges (OPTIMIZE purge, VACUUM reclaim, conflicts,
    fully-dead files) live in tests/test_deletion_vectors.py."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        merge_delta,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_dv_") + "/orders_delta"
    write_delta(
        spark, orders.filter(k % 2 == 0), path,
        partition_by=["o_orderstatus"],
    )
    write_delta(
        spark, orders.filter(k % 2 == 1), path,
        partition_by=["o_orderstatus"],
    )
    updates = (
        orders.filter((k % 5 == 0) & (k % 7 != 3))
        .withColumn("o_orderpriority", F.lit("X-MERGED"))
        .withColumn("_delete", F.lit(False))
    )
    inserts = orders.filter(k % 11 == 0).select(
        (k + 10_000_000).alias("o_orderkey"),
        F.lit("X-NEW").alias("o_orderpriority"),
        "o_orderstatus",
    ).withColumn("_delete", F.lit(False))
    deletes = orders.filter(k % 7 == 3).withColumn(
        "_delete", F.lit(True)
    )
    res = merge_delta(
        spark,
        updates.unionByName(inserts).unionByName(deletes),
        path,
        ["o_orderkey"],
        delete_col="_delete",
        deletion_vectors=True,
    )
    assert res["files_rewritten"] == 0 and res["files_dv_updated"] > 0, res
    res2 = delete_delta(
        spark, path, orders.filter(k % 13 == 1).select("o_orderkey")
    )
    assert res2["files_rewritten"] == 0 and res2["rows_deleted"] > 0, res2
    write_checkpoint(spark, path)
    return read_delta(spark, path)


_SQL_DELTA_DELETION_VECTORS = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
), merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 3
              THEN 'X-MERGED' ELSE o_orderpriority END AS o_orderpriority,
         o_orderstatus
  FROM base
  WHERE o_orderkey % 7 <> 3
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey,
         'X-NEW' AS o_orderpriority,
         o_orderstatus
  FROM base
  WHERE o_orderkey % 11 = 0
)
-- the vector DELETE keys are base o_orderkey values (k % 13 = 1);
-- inserted keys live 10M above the base range and never match them
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM merged
WHERE o_orderkey >= 10000000 OR o_orderkey % 13 <> 1
"""


def _q_delta_foreign_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-writer deletion vectors (sources.dvcodec + delta_table):
    a FOREIGN spec commit — hand-written remove+add carrying a binary
    RoaringBitmapArray vector (Z85 'u' storage, CRC framing) under a
    random-prefix dir, protocol (3,7) — deletes the k%10==3 rows; then
    this engine's own delete_delta removes k%13==1, whose staged vector
    must CARRY the foreign entries forward (decode interop on the write
    path, not just the read path); then a checkpoint, and the table is
    read back through the checkpoint replay. The hash proves the
    foreign bitmap decoded to exactly the right row set and survived
    both the carry-over and checkpointing."""
    import json
    import os
    import tempfile
    import uuid as _uuid

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources import dvcodec
    from changedatacapture_reporting_spark.sources.delta_table import (
        _commit_name,
        _dv_protocol_actions,
        _log_path,
        _resolve_log,
        _scan_adds,
        delete_delta,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    path = tempfile.mkdtemp(prefix="delta_fdv_") + "/orders_delta"
    write_delta(spark, orders.repartition(4, "o_orderkey"), path)

    # the foreign writer: one spec vector per touched file, killing the
    # k%10==3 rows at their physical row positions
    st = _resolve_log(spark, path, None)
    adds = sorted(st["files"].values(), key=lambda a: a["path"])
    pos = (
        _scan_adds(spark, path, st["meta"], adds, with_rowpos=True)
        .filter(F.col("o_orderkey") % 10 == 3)
        .select("_pos_key", "_pos_idx")
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in pos:
        by_file.setdefault(r["_pos_key"], []).append(int(r["_pos_idx"]))
    u = _uuid.uuid4()
    keys = sorted(by_file)
    blobs = [dvcodec.serialize_blob(by_file[k]) for k in keys]
    data, spans = dvcodec.pack_file(blobs)
    fs.write_bytes(
        spark, fs.join(path, f"fx/deletion_vector_{u}.bin"), data
    )
    actions = _dv_protocol_actions(st)
    by_key = {os.path.basename(a["path"]): a for a in adds}
    for k, (off, size) in zip(keys, spans):
        add = dict(by_key[k.split("/")[-1]])
        actions.append(
            {
                "remove": {
                    "path": add["path"],
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
        )
        add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": "fx" + dvcodec.encode_uuid(u),
            "offset": off,
            "sizeInBytes": size,
            "cardinality": len(by_file[k]),
        }
        add["dataChange"] = True
        actions.append({"add": add})
    fs.write_text(
        spark,
        fs.join(_log_path(path), _commit_name(st["version"] + 1)),
        "\n".join(json.dumps(a) for a in actions) + "\n",
    )

    # this engine's vector delete on top: carries the foreign bitmaps
    res = delete_delta(
        spark,
        path,
        orders.filter(F.col("o_orderkey") % 13 == 1).select("o_orderkey"),
    )
    assert res["files_rewritten"] == 0, res
    write_checkpoint(spark, path)
    return read_delta(spark, path)


_SQL_DELTA_FOREIGN_DV = """
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders
WHERE o_orderkey % 10 <> 3 AND o_orderkey % 13 <> 1
"""


def _q_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping, 'name' mode (sources.delta_table): a table whose
    parquet files carry PHYSICAL names (col-1..col-3) is committed at
    protocol (2,5) with the logical↔physical map in the schema field
    metadata; v1 RENAMES o_orderpriority → priority (same physical
    column — the rename is metadata-only). The read resolves v1 with
    logical names, and the stats-skip probe on the renamed column
    translates logical→physical before pruning. Hash proves values
    land under the right logical names across the rename."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("col-1"),
        F.col("o_orderpriority").alias("col-2"),
        F.col("o_orderstatus").alias("col-3"),
    )
    base = tempfile.mkdtemp(prefix="delta_cm_") + "/orders_mapped"
    stage = base + "/_stage"
    orders.repartition(1).write.parquet(stage)
    part = [
        p for p in fs.listdir(spark, stage) if p.endswith(".parquet")
    ][0]
    os.makedirs(base + "/_delta_log", exist_ok=True)
    os.replace(os.path.join(stage, part), base + "/f1.parquet")

    def field(name, phys, cid):
        return T.StructField(
            name,
            T.StringType() if cid > 1 else T.LongType(),
            True,
            {
                "delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": cid,
            },
        )

    def meta(fields):
        return {
            "metaData": {
                "id": "t-mapped",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": T.StructType(fields).json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }
        }

    v0 = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta(
            [
                field("o_orderkey", "col-1", 1),
                field("o_orderpriority", "col-2", 2),
                field("o_orderstatus", "col-3", 3),
            ]
        ),
        {
            "add": {
                "path": "f1.parquet",
                "partitionValues": {},
                "size": os.path.getsize(base + "/f1.parquet"),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    v1 = [
        meta(
            [
                field("o_orderkey", "col-1", 1),
                field("priority", "col-2", 2),
                field("o_orderstatus", "col-3", 3),
            ]
        )
    ]
    for i, actions in enumerate((v0, v1)):
        with open(f"{base}/_delta_log/{i:020d}.json", "w") as f:
            f.write(
                "\n".join(_json.dumps(a) for a in actions) + "\n"
            )
    df0 = read_delta(spark, base, version=0)
    assert df0.columns == [
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
    ], df0.columns
    return read_delta(
        spark, base, version=1, skip=[("priority", ">=", "3")]
    )


_SQL_DELTA_COLUMN_MAPPING = """
SELECT o_orderkey,
       o_orderpriority AS priority,
       o_orderstatus
FROM orders
WHERE o_orderpriority >= '3'
"""


def _q_delta_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-level Change Data Feed (sources.delta_table
    read_delta_cdf — public Delta PROTOCOL.md "Add CDC File" / "Change
    Data Files"): a three-commit table (append; vector DELETE of
    k%7==0; append of a shifted subset) read back as CDF rows. The
    vector-delete commit must feed EXACTLY its newly-masked rows (the
    vector-delta refinement — a whole-file derivation would emit
    survivor churn and fail the hash), appends derive as inserts, and
    _commit_version stamps each row with its commit."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        read_delta_cdf,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    path = tempfile.mkdtemp(prefix="delta_cdf_") + "/orders_delta"
    write_delta(spark, orders.repartition(4, "o_orderkey"), path)
    res = delete_delta(
        spark, path,
        orders.filter(k % 7 == 0).select("o_orderkey"),
        deletion_vectors=True,
    )
    assert res["files_rewritten"] == 0, res  # vectors, not rewrites
    write_delta(
        spark,
        orders.filter(k % 19 == 0).select(
            (k + 50000000).alias("o_orderkey"),
            F.lit("X-CDF").alias("o_orderpriority"),
            F.col("o_orderstatus"),
        ),
        path,
    )
    return read_delta_cdf(spark, path, 0).select(
        "o_orderkey",
        "o_orderpriority",
        "_change_type",
        "_commit_version",
    )


_SQL_DELTA_CHANGE_FEED = """
SELECT o_orderkey, o_orderpriority,
       'insert' AS _change_type, 0 AS _commit_version
FROM orders
UNION ALL
SELECT o_orderkey, o_orderpriority,
       'delete' AS _change_type, 1 AS _commit_version
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey + 50000000 AS o_orderkey,
       'X-CDF' AS o_orderpriority,
       'insert' AS _change_type, 2 AS _commit_version
FROM orders WHERE o_orderkey % 19 = 0
"""


def _q_delta_cdf_writes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed WRITES (sources.delta_table _stage_cdc — public
    Delta PROTOCOL.md "Add CDC File"): a table configured
    ``delta.enableChangeDataFeed=true`` takes one MERGE carrying all
    three legs (updates k%9, deletes k%13==2, inserts shifted k%23);
    the writer must emit the ``_change_data`` record — pre/postimage
    pairs for updates, value rows for deletes, insert rows — and
    read_delta_cdf must return it as the authoritative feed (the hash
    fails if derivation ran instead: derivation can't produce
    update_preimage rows at all)."""
    import json as _json
    import os
    import tempfile

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources.delta_table import (
        merge_delta,
        read_delta_cdf,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    path = tempfile.mkdtemp(prefix="delta_cdfw_") + "/orders_delta"
    write_delta(spark, orders.repartition(4, "o_orderkey"), path)
    # flip the CDF config in commit 0 (a real CDF table carries it
    # from creation; this writer creates unconfigured tables)
    log = os.path.join(path, "_delta_log")
    cname = f"{0:020d}.json"
    lines = []
    for line in fs.read_text(spark, os.path.join(log, cname)).splitlines():
        d = _json.loads(line)
        if d.get("metaData"):
            d["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"
            }
        lines.append(_json.dumps(d))
    os.remove(os.path.join(log, cname))
    fs.write_text(
        spark, os.path.join(log, cname), "\n".join(lines) + "\n"
    )

    updates = orders.filter((k % 9 == 0) & (k % 13 != 2)).select(
        "o_orderkey",
        F.lit("X-UPD").alias("o_orderpriority"),
        "o_orderstatus",
        F.lit(False).alias("_del"),
    )
    deletes = orders.filter(k % 13 == 2).select(
        "o_orderkey", "o_orderpriority", "o_orderstatus",
        F.lit(True).alias("_del"),
    )
    inserts = orders.filter(k % 23 == 0).select(
        (k + 30000000).alias("o_orderkey"),
        F.lit("X-NEW").alias("o_orderpriority"),
        F.col("o_orderstatus"),
        F.lit(False).alias("_del"),
    )
    res = merge_delta(
        spark,
        updates.unionByName(deletes).unionByName(inserts),
        path,
        ["o_orderkey"],
        delete_col="_del",
    )
    v = res["version"]
    return read_delta_cdf(spark, path, v, v).select(
        "o_orderkey", "o_orderpriority", "_change_type"
    )


_SQL_DELTA_CDF_WRITES = """
SELECT o_orderkey, o_orderpriority,
       'update_preimage' AS _change_type
FROM orders WHERE o_orderkey % 9 = 0 AND o_orderkey % 13 <> 2
UNION ALL
SELECT o_orderkey, 'X-UPD' AS o_orderpriority,
       'update_postimage' AS _change_type
FROM orders WHERE o_orderkey % 9 = 0 AND o_orderkey % 13 <> 2
UNION ALL
SELECT o_orderkey, o_orderpriority, 'delete' AS _change_type
FROM orders WHERE o_orderkey % 13 = 2
UNION ALL
SELECT o_orderkey + 30000000 AS o_orderkey,
       'X-NEW' AS o_orderpriority,
       'insert' AS _change_type
FROM orders WHERE o_orderkey % 23 = 0
"""


def _q_delta_mapped_writes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITES to a column-mapped ('name' mode) table (VERDICT r13 #3,
    sources.delta_table): a FOREIGN mapped table (physical col-1..col-3
    parquet names, logical names in the schema metadata, protocol
    (2,5)) is driven through this engine's whole write surface —
    append (write_delta), MERGE (update+insert), vector DELETE, and
    OPTIMIZE. Every staged file must carry PHYSICAL names (asserted on
    the appended file) and partitionValues/stats keys must translate,
    or the table's real readers would see NULLs. The hash proves the
    logical row set equals a plain-SQL oracle of the same operations."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        merge_delta,
        optimize_delta,
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="delta_mw_") + "/orders_mapped"
    stage = base + "/_stage"
    orders.filter(k % 4 != 1).select(
        k.alias("col-1"),
        F.col("o_orderpriority").alias("col-2"),
        F.col("o_orderstatus").alias("col-3"),
    ).repartition(2, "col-1").write.parquet(stage)
    parts = sorted(
        p for p in fs.listdir(spark, stage) if p.endswith(".parquet")
    )
    os.makedirs(base + "/_delta_log", exist_ok=True)
    adds = []
    for i, p in enumerate(parts):
        rel = f"f{i}.parquet"
        os.replace(os.path.join(stage, p), f"{base}/{rel}")
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(f"{base}/{rel}"),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )

    def field(name, phys, cid, dtype):
        return T.StructField(
            name, dtype, True,
            {
                "delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": cid,
            },
        )

    schema = T.StructType(
        [
            field("o_orderkey", "col-1", 1, T.LongType()),
            field("o_orderpriority", "col-2", 2, T.StringType()),
            field("o_orderstatus", "col-3", 3, T.StringType()),
        ]
    )
    v0 = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-mapped-writes",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }
        },
    ] + adds
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    # 1. append through the mapped write path (logical names in)
    v = write_delta(spark, orders.filter(k % 4 == 1), base)
    assert v == 1
    commit1 = [
        _json.loads(line)
        for line in open(f"{base}/_delta_log/{1:020d}.json")
    ]
    rel1 = next(a["add"]["path"] for a in commit1 if a.get("add"))
    raw_cols = spark.read.parquet(f"{base}/{rel1}").columns
    assert sorted(raw_cols) == ["col-1", "col-2", "col-3"], raw_cols

    # 2. MERGE: priority rewrite for k%9==0, inserts 30M above
    src = orders.filter(k % 9 == 0).select(
        "o_orderkey",
        F.lit("X-MAP").alias("o_orderpriority"),
        "o_orderstatus",
    ).unionByName(
        orders.filter(k % 23 == 0).select(
            (k + 30000000).alias("o_orderkey"),
            F.lit("X-NEW").alias("o_orderpriority"),
            F.col("o_orderstatus"),
        )
    )
    merge_delta(spark, src, base, ["o_orderkey"])

    # 3. vector DELETE of k%13==2, then OPTIMIZE folds the vectors
    delete_delta(
        spark, base,
        orders.filter(k % 13 == 2).select("o_orderkey"),
        deletion_vectors=True,
    )
    optimize_delta(spark, base)
    return read_delta(spark, base)


_SQL_DELTA_MAPPED_WRITES = """
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 9 = 0 THEN 'X-MAP'
              ELSE o_orderpriority END AS o_orderpriority,
         o_orderstatus
  FROM orders
  UNION ALL
  SELECT o_orderkey + 30000000 AS o_orderkey,
         'X-NEW' AS o_orderpriority,
         o_orderstatus
  FROM orders
  WHERE o_orderkey % 23 = 0
)
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM merged
WHERE o_orderkey >= 30000000 OR o_orderkey % 13 <> 2
"""


def _q_delta_row_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints + generated columns ENFORCED on the write path
    (r14, sources.delta_table — public Delta PROTOCOL.md "Check
    Constraints" / "Generated Columns"): a FOREIGN legacy-v4 table
    declares a generated column (o_pricecat, a CASE over o_totalprice)
    and a CHECK constraint; this engine appends WITHOUT the generated
    column (must compute it), ADDs a second constraint through the DDL
    API (validating every existing row), MERGEs a slice that PROVIDES
    the generated values (must validate equality), and PROVES a
    violating batch refuses without landing a byte. The hash equals a
    plain-SQL oracle computing the same generation expression."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        add_check_constraint,
        merge_delta,
        read_delta,
        write_delta,
        _resolve_log,
    )

    k = F.col("o_orderkey")
    gen_sql = (
        "CASE WHEN o_totalprice > 150000 THEN 'HI' ELSE 'LO' END"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="delta_inv_") + "/orders_inv"
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
            T.StructField(
                "o_pricecat",
                T.StringType(),
                True,
                {"delta.generationExpression": gen_sql},
            ),
        ]
    )
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {
            "metaData": {
                "id": "t-invariants",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.constraints.pk_pos": "o_orderkey >= 0"
                },
                "createdTime": 0,
            }
        },
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    # 1. append WITHOUT the generated column — the engine computes it
    assert write_delta(spark, orders.filter(k % 3 != 0), base) == 1

    # 2. DDL: a second constraint validates the existing rows first
    add_check_constraint(
        spark, base, "prio_known", "o_orderpriority IS NOT NULL"
    )

    # 3. a batch violating pk_pos must refuse WITHOUT landing
    pre = _resolve_log(spark, base, None)["version"]
    try:
        write_delta(
            spark,
            spark.createDataFrame(
                [(-1, 1.0, "1-URGENT")],
                "o_orderkey long, o_totalprice double, "
                "o_orderpriority string",
            ),
            base,
        )
        raise AssertionError("violating batch landed")
    except ValueError:
        pass
    assert _resolve_log(spark, base, None)["version"] == pre

    # 4. MERGE providing correct generated values — validated, lands
    src = orders.filter(k % 3 == 0).withColumn(
        "o_pricecat",
        F.when(F.col("o_totalprice") > 150000, "HI").otherwise("LO"),
    )
    merge_delta(spark, src, base, ["o_orderkey"])
    return read_delta(spark, base)


_SQL_DELTA_ROW_INVARIANTS = """
SELECT o_orderkey,
       o_totalprice,
       o_orderpriority,
       CASE WHEN o_totalprice > 150000 THEN 'HI' ELSE 'LO' END
           AS o_pricecat
FROM orders
"""


def _q_delta_identity_writes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-column allocation (r14, sources.delta_table — public
    Delta PROTOCOL.md "Identity Columns"): a FOREIGN table declares
    row_id as bigint IDENTITY(start 1000, step 2, no explicit
    inserts); two engine appends omit the column and must allocate
    DENSE on-grid values that continue across commits (the high-water
    mark rides each commit's metaData). The batches are staged as one
    sorted partition so the id↔row pairing is deterministic and a
    plain ROW_NUMBER oracle reproduces it exactly."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="delta_idn_") + "/orders_identity"
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField(
                "row_id",
                T.LongType(),
                True,
                {
                    "delta.identity.start": 1000,
                    "delta.identity.step": 2,
                    "delta.identity.allowExplicitInsert": False,
                },
            ),
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
        {
            "metaData": {
                "id": "t-identity",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    def sorted_batch(pred):
        return (
            orders.filter(pred)
            .repartition(1)
            .sortWithinPartitions("o_orderkey")
        )

    assert write_delta(spark, sorted_batch(k % 2 == 0), base) == 1
    assert write_delta(spark, sorted_batch(k % 2 == 1), base) == 2
    return read_delta(spark, base)


_SQL_DELTA_IDENTITY_WRITES = """
WITH w1 AS (
  SELECT o_orderkey, o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders WHERE o_orderkey % 2 = 0
), w2 AS (
  SELECT o_orderkey, o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT 998 + 2 * rn AS row_id, o_orderkey, o_orderpriority FROM w1
UNION ALL
SELECT 998 + 2 * ((SELECT COUNT(*) FROM w1) + rn) AS row_id,
       o_orderkey, o_orderpriority
FROM w2
"""


def _q_delta_id_mode_writes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITES to an 'id'-mode column-mapped table (r14,
    sources.delta_table — the mode current Databricks writers can set,
    where resolution goes through parquet FIELD IDS and names are
    free to be junk): a FOREIGN id-mode genesis takes this engine's
    append + MERGE + vector DELETE + OPTIMIZE; the appended file's
    parquet FOOTER is asserted to carry the mapping ids (a file
    without them is unreadable to the table's own readers — and the
    session conf is adversarially disabled first, the write path must
    re-enable it). The hash proves the logical row set equals the
    plain-SQL oracle of the same operations."""
    import json as _json
    import os
    import tempfile

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        merge_delta,
        optimize_delta,
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="delta_idw_") + "/orders_idmode"
    os.makedirs(base + "/_delta_log", exist_ok=True)

    def field(name, phys, cid, dtype):
        return T.StructField(
            name, dtype, True,
            {
                "delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": cid,
            },
        )

    schema = T.StructType(
        [
            field("o_orderkey", "junk-x", 1, T.LongType()),
            field("o_orderpriority", "junk-y", 2, T.StringType()),
            field("o_orderstatus", "junk-z", 3, T.StringType()),
        ]
    )
    v0 = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-idmode-writes",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }
        },
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    assert write_delta(spark, orders.filter(k % 4 != 1), base) == 1
    commit1 = [
        _json.loads(line)
        for line in open(f"{base}/_delta_log/{1:020d}.json")
    ]
    rel1 = next(a["add"]["path"] for a in commit1 if a.get("add"))
    psch = pq.read_schema(f"{base}/{rel1}")
    got_ids = {
        n: int((psch.field(n).metadata or {})[b"PARQUET:field_id"])
        for n in psch.names
    }
    assert got_ids == {"junk-x": 1, "junk-y": 2, "junk-z": 3}, got_ids

    assert write_delta(spark, orders.filter(k % 4 == 1), base) == 2
    src = orders.filter(k % 9 == 0).select(
        "o_orderkey",
        F.lit("X-ID").alias("o_orderpriority"),
        "o_orderstatus",
    )
    merge_delta(spark, src, base, ["o_orderkey"])
    delete_delta(
        spark, base,
        orders.filter(k % 13 == 2).select("o_orderkey"),
        deletion_vectors=True,
    )
    optimize_delta(spark, base)
    return read_delta(spark, base)


_SQL_DELTA_ID_MODE_WRITES = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 9 = 0 THEN 'X-ID'
            ELSE o_orderpriority END AS o_orderpriority,
       o_orderstatus
FROM orders
WHERE o_orderkey % 13 <> 2
"""


def _q_delta_ict_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-commit timestamps (r14, sources.delta_table — public Delta
    PROTOCOL.md writer feature ``inCommitTimestamp``): a FOREIGN
    ICT-enabled genesis (ict 10000) takes two engine appends whose
    commits record icts 20000 and 30000; timestamp time travel at
    25000 and 35000 must resolve through the RECORDED icts — the
    commit-file mtimes are all 'now', so mtime-based resolution would
    refuse every fixture timestamp outright. Returns both snapshots
    tagged, hashed against a plain-SQL oracle of the two windows."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="delta_ict_") + "/orders_ict"
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )
    v0 = [
        {"commitInfo": {"inCommitTimestamp": 10000, "timestamp": 10000}},
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["inCommitTimestamp"],
            }
        },
        {
            "metaData": {
                "id": "t-ict-travel",
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
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    assert write_delta(
        spark, orders.filter(k % 3 == 0), base, timestamp_ms=20000
    ) == 1
    assert write_delta(
        spark, orders.filter(k % 3 == 1), base, timestamp_ms=30000
    ) == 2
    at_25 = read_delta(spark, base, timestamp_ms=25000).withColumn(
        "asof", F.lit("t25")
    )
    at_35 = read_delta(spark, base, timestamp_ms=35000).withColumn(
        "asof", F.lit("t35")
    )
    return at_25.unionByName(at_35)


_SQL_DELTA_ICT_TIME_TRAVEL = """
SELECT o_orderkey, o_orderpriority, 't25' AS asof
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT o_orderkey, o_orderpriority, 't35' AS asof
FROM orders WHERE o_orderkey % 3 IN (0, 1)
"""


def _q_delta_timestamp_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP_NTZ end to end (r14, sources.delta_table — public
    Delta table feature ``timestampNtz``): an engine-created table
    with an NTZ column must mark the protocol itself ((3,7), feature
    in BOTH sets — a non-supporting reader would misread the values as
    instants), round-trip the type, and keep stats-based file skipping
    sound over the NTZ column (ISO-8601 stats strings order
    lexicographically = temporally). Two date-windowed appends make
    the skip probe prune real files; the exact filter on top is
    hashed against a plain-SQL oracle."""
    import datetime as _dt
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
        _resolve_log,
    )

    cutoff = _dt.datetime(1995, 6, 1)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
    )
    base = tempfile.mkdtemp(prefix="delta_ntz_") + "/orders_ntz"
    d = F.col("o_orderdate")
    write_delta(spark, orders.filter(d <= F.lit(cutoff)), base)
    write_delta(spark, orders.filter(d > F.lit(cutoff)), base)
    proto = _resolve_log(spark, base, None)["protocol"]
    assert proto["minReaderVersion"] == 3, proto
    assert "timestampNtz" in proto["readerFeatures"], proto
    assert "timestampNtz" in proto["writerFeatures"], proto
    out = read_delta(spark, base, skip=[("o_orderdate", ">", cutoff)])
    from pyspark.sql import types as T

    assert isinstance(
        out.schema["o_orderdate"].dataType, T.TimestampNTZType
    ), out.schema
    return out.filter(d > F.lit(cutoff))


_SQL_DELTA_TIMESTAMP_NTZ = """
SELECT o_orderkey, o_orderdate
FROM orders
WHERE o_orderdate > TIMESTAMP '1995-06-01'
"""


def _q_delta_variant_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant columns (r14, sources.delta_table — public Delta table
    feature ``variantType``, Spark 4 VariantType): semi-structured
    values write through the engine's normal staging path and read
    back typed; the hash compares the canonical ``to_json`` rendering
    of an array variant (deterministic formatting on both sides)
    against a string-building SQL oracle."""
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey"
    )
    df = orders.select(
        "o_orderkey",
        F.parse_json(
            F.concat(
                F.lit("["),
                k.cast("string"),
                F.lit(","),
                (k % 5).cast("string"),
                F.lit("]"),
            )
        ).alias("v"),
    )
    base = tempfile.mkdtemp(prefix="delta_var_") + "/orders_variant"
    write_delta(spark, df.filter(k % 2 == 0), base)
    write_delta(spark, df.filter(k % 2 == 1), base)
    out = read_delta(spark, base)
    assert isinstance(out.schema["v"].dataType, T.VariantType), out.schema
    return out.select(
        "o_orderkey", F.to_json("v").alias("vj")
    )


_SQL_DELTA_VARIANT = """
SELECT o_orderkey,
       '[' || o_orderkey || ',' || (o_orderkey % 5) || ']' AS vj
FROM orders
"""


def _q_delta_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type widening (r14, sources.delta_table — public Delta feature
    ``typeWidening``): a FOREIGN table whose column was widened
    int→long after its first file landed — v0 carries a real INT32
    parquet file, v1 re-commits the metaData with the widened type,
    ``delta.typeChanges`` and the feature protocol. The engine must
    read the int32 pages back as long under the committed schema and
    append its own long rows on top; the hash equals a plain-SQL
    oracle over both halves."""
    import json as _json
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="delta_tw_") + "/orders_widen"
    os.makedirs(base + "/_delta_log", exist_ok=True)
    stage = base + "/_stage"
    orders.filter(k % 2 == 0).select(
        k.cast("int").alias("o_orderkey"), "o_orderpriority"
    ).repartition(1).write.parquet(stage)
    part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    os.replace(os.path.join(stage, part), base + "/f0.parquet")
    shutil.rmtree(stage)

    def meta(s):
        return {
            "metaData": {
                "id": "t-widen-contract",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": s.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        }

    narrow = T.StructType(
        [
            T.StructField("o_orderkey", T.IntegerType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )
    wide = T.StructType(
        [
            T.StructField(
                "o_orderkey",
                T.LongType(),
                True,
                {
                    "delta.typeChanges": [
                        {"fromType": "integer", "toType": "long"}
                    ]
                },
            ),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta(narrow),
        {
            "add": {
                "path": "f0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(base + "/f0.parquet"),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    v1 = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening"],
            }
        },
        meta(wide),
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")
    with open(f"{base}/_delta_log/{1:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v1) + "\n")

    assert write_delta(spark, orders.filter(k % 2 == 1), base) == 2
    out = read_delta(spark, base)
    assert isinstance(out.schema["o_orderkey"].dataType, T.LongType)
    return out


_SQL_DELTA_TYPE_WIDENING = """
SELECT o_orderkey, o_orderpriority FROM orders
"""


def _q_delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (r14, sources.delta_table — public Delta writer
    feature ``rowTracking``): a FOREIGN row-tracked genesis (feature
    protocol + delta.enableRowTracking + a prior high-water mark of
    4999) takes two engine appends and a vector DELETE. Every add must
    carry a fresh non-overlapping baseRowId range above the mark with
    the commit version stamped, the domain mark must advance in the
    same commits, and the vector swap must INHERIT the touched file's
    ids (asserted in-contract); the hash proves the surviving logical
    rows equal a plain-SQL oracle."""
    import json as _json
    import os
    import tempfile

    from pyspark.sql import types as T

    from changedatacapture_reporting_spark.sources.delta_table import (
        delete_delta,
        read_delta,
        write_delta,
        _resolve_log,
    )

    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="delta_rt_") + "/orders_rt"
    os.makedirs(base + "/_delta_log", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )
    v0 = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        },
        {
            "metaData": {
                "id": "t-rowtracking",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.enableRowTracking": "true"},
                "createdTime": 0,
            }
        },
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": _json.dumps(
                    {"rowIdHighWaterMark": 4999}
                ),
                "removed": False,
            }
        },
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(_json.dumps(a) for a in v0) + "\n")

    assert write_delta(spark, orders.filter(k % 2 == 0), base) == 1
    assert write_delta(spark, orders.filter(k % 2 == 1), base) == 2

    st = _resolve_log(spark, base, None)
    spans = []
    for a in st["files"].values():
        assert a.get("baseRowId") is not None, a["path"]
        n = _json.loads(a["stats"])["numRecords"]
        spans.append((int(a["baseRowId"]), int(a["baseRowId"]) + n - 1))
        assert int(a["defaultRowCommitVersion"]) in (1, 2)
    spans.sort()
    assert spans[0][0] == 5000  # above the foreign mark
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2  # non-overlapping ranges
    mark = _json.loads(
        st["domains"]["delta.rowTracking"]["configuration"]
    )["rowIdHighWaterMark"]
    assert mark == 4999 + orders.count()

    ids_before = {
        a["path"]: int(a["baseRowId"]) for a in st["files"].values()
    }
    delete_delta(
        spark,
        base,
        orders.filter(k % 13 == 2).select("o_orderkey"),
        deletion_vectors=True,
    )
    st2 = _resolve_log(spark, base, None)
    for a in st2["files"].values():
        if a["path"] in ids_before:  # swapped files inherit their ids
            assert int(a["baseRowId"]) == ids_before[a["path"]]
    return read_delta(spark, base)


_SQL_DELTA_ROW_TRACKING = """
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE o_orderkey % 13 <> 2
"""


def _q_delta_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 (UUID-named) checkpoint reads (sources.delta_table
    _replay_v2_checkpoint — public Delta PROTOCOL.md, "V2 Checkpoints",
    checkpointPolicy=v2): a FOREIGN v2 checkpoint is hand-built over a
    two-commit table — parquet manifest carrying protocol (3,7,
    readerFeatures=[v2Checkpoint]) + metaData + checkpointMetadata +
    two ``sidecar`` pointers, the add actions split across two parquet
    sidecars under ``_delta_log/_sidecars/`` — and every covered json
    commit is EXPIRED, so the read can only succeed through the v2
    replay path. This engine then commits an append ON TOP (the replay
    feeds the next version's state) and the final snapshot is read
    back. The hash proves manifest + sidecar resolution reproduced the
    exact pre-checkpoint row set and composed with a live write."""
    import json as _json  # noqa: F401 (parity with sibling contracts)
    import os
    import tempfile
    import uuid as _uuid

    from changedatacapture_reporting_spark import fs
    from changedatacapture_reporting_spark.sources.delta_table import (
        _SIDECAR_FILE_SCHEMA,
        _V2_CHECKPOINT_SCHEMA,
        SIDECAR_DIR,
        _log_path,
        _resolve_log,
        read_delta,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_v2cp_") + "/orders_delta"
    write_delta(
        spark, orders.filter(k % 3 != 0).repartition(3, "o_orderkey"),
        path,
    )
    write_delta(
        spark, orders.filter(k % 3 == 0).repartition(2, "o_orderkey"),
        path,
    )

    def _as_parquet(df, dest):
        tmp = dest + "_tmp"
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        part = [n for n in os.listdir(tmp) if n.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), dest)
        fs.delete(spark, tmp)

    st = _resolve_log(spark, path, None)
    v = st["version"]
    log = _log_path(path)
    sc_dir = os.path.join(log, SIDECAR_DIR)
    os.makedirs(sc_dir, exist_ok=True)
    adds = sorted(st["files"].values(), key=lambda a: a["path"])
    sc_names = []
    for group in (adds[0::2], adds[1::2]):
        if not group:
            continue
        name = f"{_uuid.uuid4()}.parquet"
        rows = [
            (
                (
                    a["path"], dict(a.get("partitionValues") or {}),
                    int(a.get("size") or 0),
                    int(a.get("modificationTime") or 0),
                    bool(a.get("dataChange", True)), a.get("stats"),
                    None, None, None,
                ),
                None,
            )
            for a in group
        ]
        _as_parquet(
            spark.createDataFrame(rows, _SIDECAR_FILE_SCHEMA),
            os.path.join(sc_dir, name),
        )
        sc_names.append(name)
    meta = st["meta"]
    manifest_rows = [
        (None, None, None,
         (3, 7, ["v2Checkpoint"], ["appendOnly", "invariants"]),
         None, None, None, None),
        (None, None,
         (meta["id"], meta["schemaString"],
          list(meta.get("partitionColumns") or []),
          dict(meta.get("configuration") or {})),
         None, None, None, None, None),
        (None, None, None, None, None, None, (int(v),), None),
    ] + [
        (None, None, None, None, None, None, None, (n, 1, 0))
        for n in sc_names
    ]
    _as_parquet(
        spark.createDataFrame(manifest_rows, _V2_CHECKPOINT_SCHEMA),
        os.path.join(log, f"{v:020d}.checkpoint.{_uuid.uuid4()}.parquet"),
    )
    for j in range(v + 1):
        os.remove(os.path.join(log, f"{j:020d}.json"))

    # commit on top: state for version v+1 resolves THROUGH the v2 form
    write_delta(
        spark,
        orders.filter(k % 17 == 0).select(
            (k + 20000000).alias("o_orderkey"),
            F.lit("X-V2").alias("o_orderpriority"),
            F.col("o_orderstatus"),
        ),
        path,
    )
    return read_delta(spark, path)


_SQL_DELTA_V2_CHECKPOINT = """
SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
UNION ALL
SELECT o_orderkey + 20000000 AS o_orderkey,
       'X-V2' AS o_orderpriority,
       o_orderstatus
FROM orders
WHERE o_orderkey % 17 = 0
"""


def _q_cdc_from_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC WITHOUT CDC (operators.diff.snapshots_to_events over
    sources.delta_table): two versions of a Delta table — v1 drops the
    k%5==0 keys, adds the k%5==3 keys, and rewrites priority for k%3==0
    survivors — are diffed into the engine's event model by one
    pk-keyed full-outer join, then fed to the SAME build_changelog as
    every log-based source. This is the ingestion shape for sources
    that publish versioned tables but no change feed (Delta without
    CDF, nightly warehouse extracts); the oracle derives the
    insert/delete/update rows from the key arithmetic directly."""
    import tempfile

    from changedatacapture_reporting_spark.operators.diff import (
        snapshots_to_events,
    )
    from changedatacapture_reporting_spark.sources.delta_table import (
        read_delta,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )
    v0 = base.filter(k % 5 < 3)
    v1 = base.filter((k % 5 >= 1) & (k % 5 <= 3)).withColumn(
        "priority",
        F.when(k % 3 == 0, F.lit("X-URGENT")).otherwise(F.col("priority")),
    )
    path = tempfile.mkdtemp(prefix="delta_snap_") + "/t"
    write_delta(spark, v0, path)
    write_delta(spark, v1, path, mode="overwrite")
    events = snapshots_to_events(
        read_delta(spark, path, version=0),
        read_delta(spark, path, version=1),
        ["o_orderkey"],
        lsn=1,
        table_name="orders",
    )
    return build_changelog(
        events, ["o_orderkey"], with_audit_cols=False
    ).select(
        "commit_time", "table_name", "o_orderkey", "column_name",
        "old_value", "new_value",
    )


_SQL_CDC_FROM_SNAPSHOTS = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS pr FROM orders
),
ch AS (
  SELECT k, 'priority' AS column_name, pr AS old_value,
         'X-URGENT' AS new_value
  FROM base WHERE k % 5 IN (1, 2) AND k % 3 = 0
  UNION ALL
  SELECT k, NULL, 'DELETED RECORD', NULL FROM base WHERE k % 5 = 0
  UNION ALL
  SELECT k, NULL, NULL, 'NEW RECORD' FROM base WHERE k % 5 = 3
)
SELECT TIMESTAMP '1970-01-01 00:00:00' AS commit_time,
       'orders' AS table_name, k AS o_orderkey,
       column_name, old_value, new_value
FROM ch
"""


def _q_changelog_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting rollup over the changelog: per-day, per-kind activity
    (exercises groupBy over the EAV output)."""
    log = _changelog(spark, sf_dir)
    kind = (
        F.when(F.col("new_value") == "NEW RECORD", F.lit("insert"))
        .when(F.col("old_value") == "DELETED RECORD", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        log.withColumn("change_date", F.to_date("commit_time"))
        .withColumn("kind", kind)
        .groupBy("change_date", "kind")
        .agg(
            F.count("*").alias("n_changes"),
            F.countDistinct("o_orderkey").alias("n_rows_touched"),
        )
    )


_SQL_CHANGELOG_DAILY = (
    _ORACLE_CHANGES
    + """
SELECT CAST(commit_time AS DATE) AS change_date,
       CASE WHEN new_value = 'NEW RECORD' THEN 'insert'
            WHEN old_value = 'DELETED RECORD' THEN 'delete'
            ELSE 'update' END AS kind,
       COUNT(*) AS n_changes,
       COUNT(DISTINCT o_orderkey) AS n_rows_touched
FROM changes
GROUP BY 1, 2
"""
)


def _q_changelog_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The migration path a reference user actually takes: the engine's
    changelog registered as a view (sql.register_view) and queried with
    PLAIN SQL — the reference's own consumption pattern is ad-hoc
    SELECTs over the generated _ChangeLog tables (usp_cdc_query_data.sql
    :40–75). The statement here is the per-column activity rollup; the
    view is a lazy logical plan, so Catalyst optimizes the SQL text and
    the DataFrame-built changelog as ONE plan."""
    from changedatacapture_reporting_spark.sql import register_view

    register_view(spark, _changelog(spark, sf_dir), "changelog_v")
    return spark.sql(
        """
        SELECT table_name, column_name,
               COUNT(*) AS n_changes,
               COUNT(DISTINCT o_orderkey) AS n_rows_touched
        FROM changelog_v
        GROUP BY table_name, column_name
        """
    )


_SQL_SQL_SURFACE = (
    _ORACLE_CHANGES
    + """
SELECT table_name, column_name,
       COUNT(*) AS n_changes,
       COUNT(DISTINCT o_orderkey) AS n_rows_touched
FROM changes
GROUP BY table_name, column_name
"""
)


def _q_row_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row audit trail — the changelog's point-lookup pattern
    (partition pruning on table_name + pk predicate at the scan)."""
    return _changelog(spark, sf_dir).filter(F.col("o_orderkey") % 1000 == 7)


_SQL_ROW_HISTORY = (
    _ORACLE_CHANGES
    + "SELECT commit_time, table_name, o_orderkey, column_name, old_value,"
    " new_value FROM changes WHERE o_orderkey % 1000 = 7"
)


def _q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-column nulls/cardinality/bounds in one
    scan (exact distinct here for oracle parity; HLL++ is the scale
    default)."""
    from changedatacapture_reporting_spark.operators.profile import profile_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    return profile_table(orders, cols, exact_distinct=True)


_SQL_PROFILE = """
SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS VARCHAR),
       CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderdate), CAST(MIN(o_orderdate) AS VARCHAR),
       CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
"""


def _q_transaction_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction rollup of the EAV changelog: how many columns
    changed and which (sorted, comma-joined) — the 'what did this commit
    touch' reporting pattern."""
    log = _changelog(spark, sf_dir).filter(F.col("column_name").isNotNull())
    return log.groupBy("o_orderkey", "commit_time").agg(
        F.count("*").alias("n_cols_changed"),
        F.array_join(
            F.array_sort(F.collect_list("column_name")), ","
        ).alias("changed_cols"),
    )


_SQL_TRANSACTION_SUMMARY = (
    _ORACLE_CHANGES
    + """
SELECT o_orderkey, commit_time,
       COUNT(*) AS n_cols_changed,
       string_agg(column_name, ',' ORDER BY column_name) AS changed_cols
FROM changes
WHERE column_name IS NOT NULL
GROUP BY o_orderkey, commit_time
"""
)


def _q_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-changes collapse (operators.net_changes.net_changes — the
    ``fn_cdc_get_net_changes_*`` analog): the multi-event simulated
    stream (base + second-update wave + trailing-delete wave) collapses
    to one net row per key; insert→delete histories vanish. One hash
    aggregation, zero joins; the oracle replays the window-edge pick with
    first/last-lsn self-joins (oracle-tier shape only)."""
    from changedatacapture_reporting_spark.operators.net_changes import (
        net_changes,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    n = net_changes(ev, SIM_PK)
    return n.select(
        "o_orderkey",
        "net_op",
        F.col("before.status").alias("b_status"),
        F.col("before.priority").alias("b_priority"),
        F.col("before.total").alias("b_total"),
        F.col("before.note").alias("b_note"),
        F.col("after.status").alias("a_status"),
        F.col("after.priority").alias("a_priority"),
        F.col("after.total").alias("a_total"),
        F.col("after.note").alias("a_note"),
        "last_lsn",
    )


def _build_sql_net_changes() -> str:
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        ORACLE_EVENTS_MULTI_CTE,
    )

    return (
        "WITH "
        + ORACLE_EVENTS_MULTI_CTE
        + """,
bounds AS (
  SELECT o_orderkey AS k, MIN(lsn) AS first_lsn, MAX(lsn) AS last_lsn
  FROM evm GROUP BY 1
),
f AS (SELECT evm.* FROM evm JOIN bounds ON evm.o_orderkey = bounds.k
      AND evm.lsn = bounds.first_lsn),
l AS (SELECT evm.* FROM evm JOIN bounds ON evm.o_orderkey = bounds.k
      AND evm.lsn = bounds.last_lsn)
SELECT f.o_orderkey,
       CASE WHEN f.op <> 'insert' AND l.op <> 'delete' THEN 'update'
            WHEN f.op = 'insert' THEN 'insert'
            ELSE 'delete' END AS net_op,
       CASE WHEN f.op <> 'insert' THEN f.b_status END AS b_status,
       CASE WHEN f.op <> 'insert' THEN f.b_priority END AS b_priority,
       CASE WHEN f.op <> 'insert' THEN f.b_total END AS b_total,
       CASE WHEN f.op <> 'insert' THEN f.b_note END AS b_note,
       CASE WHEN l.op <> 'delete' THEN l.a_status END AS a_status,
       CASE WHEN l.op <> 'delete' THEN l.a_priority END AS a_priority,
       CASE WHEN l.op <> 'delete' THEN l.a_total END AS a_total,
       CASE WHEN l.op <> 'delete' THEN l.a_note END AS a_note,
       bounds.last_lsn
FROM f JOIN l ON f.o_orderkey = l.o_orderkey
JOIN bounds ON bounds.k = f.o_orderkey
WHERE NOT (f.op = 'insert' AND l.op = 'delete')
"""
    )


_SQL_NET_CHANGES = _build_sql_net_changes()


def _q_apply_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC consumer-side MERGE (operators.apply.apply_changes): the state
    reconstructed from the base event wave is the target snapshot; the
    tail window (second-update + trailing-delete waves) collapses to net
    changes, which merge in via anti-join + upsert-union — the target
    never shuffles (net side broadcasts). The result must equal the state
    a consumer would get replaying the FULL stream row-level; the oracle
    computes that end state directly."""
    from changedatacapture_reporting_spark.operators.apply import apply_changes
    from changedatacapture_reporting_spark.operators.net_changes import (
        net_changes,
    )
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    value_cols = ["status", "priority", "total", "note"]
    ev = simulate_cdc_events_multi(spark, sf_dir)
    base_log = build_changelog(
        ev.filter(F.col("lsn") < MULTI_OFF_UPDATE),
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    target = reconstruct_state(base_log, SIM_PK, value_cols)
    net = net_changes(ev, SIM_PK, from_lsn=MULTI_OFF_UPDATE)
    return apply_changes(target, net, SIM_PK, value_cols, broadcast_net=True)


# final state after base-wave replay + tail-window merge: tail-touched
# keys are k%4==1 (second update; whole-row net image wins) and
# k%20 ∈ {5,11} (trailing delete; 5 also carries the update → both drop);
# every other key keeps its base reconstruction
_SQL_APPLY_NET = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT o_orderkey,
       CASE WHEN op = 'insert' THEN a_status
            WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
       CASE WHEN op = 'insert' THEN a_priority
            WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
       CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
            WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR) END AS total,
       CASE WHEN op = 'insert' THEN a_note
            WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note
FROM ev
WHERE op != 'delete'
  AND NOT (op = 'update'
           AND b_status IS NOT DISTINCT FROM a_status
           AND b_priority IS NOT DISTINCT FROM a_priority
           AND b_total IS NOT DISTINCT FROM a_total
           AND b_note IS NOT DISTINCT FROM a_note)
  AND o_orderkey % 4 != 1 AND o_orderkey % 20 NOT IN (5, 11)
UNION ALL
SELECT o_orderkey, 'Y' AS status, a_priority AS priority,
       CAST(a_total + 7 AS VARCHAR) AS total, a_note AS note
FROM ev
WHERE o_orderkey % 4 = 1 AND o_orderkey % 20 != 5
"""


def _q_changelog_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog retention (operators.compaction.compact_changelog): the
    multi-event stream's changelog is compacted at the boundary between
    the second-update wave and the trailing-delete wave — the prefix
    (base + update waves, every key's multi-version history) folds into
    per-row base images; the delete wave stays verbatim in the tail and
    must still kill its keys. Reconstructing current state from the
    COMPACTED log must equal reconstructing from the full log (oracle =
    the full-log reconstruction SQL minus the deleted keys)."""
    from changedatacapture_reporting_spark.operators.compaction import (
        compact_changelog,
    )
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_DELETE,
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    mid = (MULTI_OFF_UPDATE + MULTI_OFF_DELETE) // 2
    compacted = compact_changelog(log, SIM_PK, upto_lsn=mid)
    return reconstruct_state(
        compacted, SIM_PK, ["status", "priority", "total", "note"]
    )


def _q_column_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(table, column) change-frequency profile
    (operators.profile.column_churn) over the multi-event stream's
    changelog (no insert images — pure churn): change counts, distinct
    hot keys, to-NULL transitions, last change time. The oracle rebuilds
    the per-column change rows from the event arithmetic (base update
    wave + always-changing status/total of the second wave)."""
    from changedatacapture_reporting_spark.operators.profile import (
        column_churn,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev, SIM_PK, with_audit_cols=False, carry_cols=["lsn", "seq"]
    )
    return column_churn(log, SIM_PK)


_SQL_COLUMN_CHURN = f"""
WITH {ORACLE_EVENTS_CTE},
chg AS (
  SELECT 'status' AS column_name, o_orderkey, commit_ts,
         a_status IS NULL AS to_null
  FROM ev WHERE op = 'update' AND b_status IS DISTINCT FROM a_status
  UNION ALL
  SELECT 'priority', o_orderkey, commit_ts, a_priority IS NULL
  FROM ev WHERE op = 'update' AND b_priority IS DISTINCT FROM a_priority
  UNION ALL
  SELECT 'total', o_orderkey, commit_ts, a_total IS NULL
  FROM ev WHERE op = 'update' AND b_total IS DISTINCT FROM a_total
  UNION ALL
  SELECT 'note', o_orderkey, commit_ts, a_note IS NULL
  FROM ev WHERE op = 'update' AND b_note IS DISTINCT FROM a_note
  UNION ALL
  SELECT 'status', o_orderkey, commit_ts, FALSE
  FROM ev WHERE o_orderkey % 4 = 1
  UNION ALL
  SELECT 'total', o_orderkey, commit_ts, FALSE
  FROM ev WHERE o_orderkey % 4 = 1
)
SELECT 'orders' AS table_name, column_name,
       COUNT(*) AS n_changes,
       COUNT(DISTINCT o_orderkey) AS n_keys,
       CAST(SUM(CASE WHEN to_null THEN 1 ELSE 0 END) AS BIGINT) AS n_to_null,
       MAX(commit_ts) AS last_change
FROM chg
GROUP BY 1, 2
"""


def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 fold of the changelog (operators.scd.scd2_history):
    one row per (pk, version) with validity intervals. The simulator has
    one event per key, so every surviving key yields exactly one open
    version (insert → full image, update → changed columns only, delete →
    no version); multi-version folding, carry-forward, change-to-NULL and
    re-insert epochs are covered by tests/test_scd.py."""
    from changedatacapture_reporting_spark.operators.scd import scd2_history

    events = simulate_cdc_events(spark, sf_dir)
    log = build_changelog(
        events,
        SIM_PK,
        with_audit_cols=False,
        record_insert_images=True,
        carry_cols=["lsn", "seq"],
    )
    return scd2_history(log, SIM_PK, ["status", "priority", "total", "note"])


_SQL_SCD2 = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT o_orderkey,
  CASE WHEN op = 'insert' THEN a_status
       WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
  CASE WHEN op = 'insert' THEN a_priority
       WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
  CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
       WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR)
  END AS total,
  CASE WHEN op = 'insert' THEN a_note
       WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note,
  commit_ts AS valid_from,
  CAST(NULL AS TIMESTAMP) AS valid_to,
  TRUE AS is_current
FROM ev
WHERE op = 'insert'
   OR (op = 'update' AND (b_status IS DISTINCT FROM a_status
        OR b_priority IS DISTINCT FROM a_priority
        OR b_total IS DISTINCT FROM a_total
        OR b_note IS DISTINCT FROM a_note))
"""


def _q_reconstruct_at_lsn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSN-bounded point-in-time state (reconstruct_state(as_of_lsn=…)):
    the boundary SQL Server CDC consumers actually hold (time→LSN mapped
    via fn_cdc_map_time_to_lsn, populate:241–253). The bound slices the
    multi-event stream BETWEEN the second-update wave and the
    trailing-delete wave, so updated values must show while the
    about-to-be-deleted keys are still live — a timestamp bound cannot
    express this cut (all three waves share commit_ts)."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_DELETE,
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    mid = (MULTI_OFF_UPDATE + MULTI_OFF_DELETE) // 2
    return reconstruct_state(
        log, SIM_PK, ["status", "priority", "total", "note"], as_of_lsn=mid
    )


# state between the second-update and trailing-delete waves: base
# reconstruction, with k%4==1 keys overlaid by the second update (status
# 'Y', total+7; carry elsewhere) and NO deletes applied
_SQL_RECONSTRUCT_AT_LSN = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT o_orderkey,
       CASE WHEN op = 'insert' THEN a_status
            WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
       CASE WHEN op = 'insert' THEN a_priority
            WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
       CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
            WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR) END AS total,
       CASE WHEN op = 'insert' THEN a_note
            WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note
FROM ev
WHERE op != 'delete'
  AND NOT (op = 'update'
           AND b_status IS NOT DISTINCT FROM a_status
           AND b_priority IS NOT DISTINCT FROM a_priority
           AND b_total IS NOT DISTINCT FROM a_total
           AND b_note IS NOT DISTINCT FROM a_note)
  AND o_orderkey % 4 != 1
UNION ALL
SELECT o_orderkey, 'Y' AS status,
       CASE WHEN op = 'insert' THEN a_priority
            WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
       CAST(a_total + 7 AS VARCHAR) AS total,
       CASE WHEN op = 'insert' THEN a_note
            WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note
FROM ev
WHERE o_orderkey % 4 = 1
"""


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two LSN cuts (operators.diff.snapshot_diff)
    — ONE aggregation, no reconstruct-join: A = end of the base wave,
    B = end of the stream, so the diff must be exactly the second-update
    wave as ``update`` rows (status→'Y', total+7, old side = the A-state
    carry), the delete wave as ``delete`` rows, and ``insert`` rows for
    keys invisible at A (no-op base update) that the update wave then
    touched. The oracle replays all three classes from the event
    arithmetic."""
    from changedatacapture_reporting_spark.operators.diff import (
        snapshot_diff,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_DELETE,
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    return snapshot_diff(
        log,
        SIM_PK,
        ["status", "priority", "total", "note"],
        lsn_a=MULTI_OFF_UPDATE - 1,
        lsn_b=2 * MULTI_OFF_DELETE,
    )


_SQL_SNAPSHOT_DIFF = f"""
WITH {ORACLE_EVENTS_CTE},
noop AS (
  SELECT o_orderkey FROM ev
  WHERE op = 'update'
    AND b_status IS NOT DISTINCT FROM a_status
    AND b_priority IS NOT DISTINCT FROM a_priority
    AND b_total IS NOT DISTINCT FROM a_total
    AND b_note IS NOT DISTINCT FROM a_note
),
seen AS (
  -- A-state under reconstruct semantics: inserts carry every column,
  -- updates only changed columns; no-op updates are invisible
  SELECT o_orderkey,
         CASE WHEN op='insert' THEN a_status
              WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS s,
         CASE WHEN op='insert' THEN a_priority
              WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS p,
         CASE WHEN op='insert' THEN CAST(a_total AS VARCHAR)
              WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR) END AS t,
         CASE WHEN op='insert' THEN a_note
              WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS n,
         a_total
  FROM ev
  WHERE op != 'delete' AND o_orderkey NOT IN (SELECT o_orderkey FROM noop)
)
SELECT o_orderkey, 'delete' AS change_kind,
       s AS old_status, p AS old_priority, t AS old_total, n AS old_note,
       NULL AS new_status, NULL AS new_priority,
       NULL AS new_total, NULL AS new_note
FROM seen WHERE o_orderkey % 20 IN (5, 11)
UNION ALL
SELECT o_orderkey, 'update',
       s, p, t, n,
       'Y', p, CAST(a_total + 7 AS VARCHAR), n
FROM seen WHERE o_orderkey % 4 = 1 AND o_orderkey % 20 != 5
UNION ALL
SELECT e.o_orderkey, 'insert',
       NULL, NULL, NULL, NULL,
       'Y', NULL, CAST(e.a_total + 7 AS VARCHAR), NULL
FROM ev e JOIN noop USING (o_orderkey)
WHERE e.o_orderkey % 4 = 1 AND e.o_orderkey % 20 != 5
"""


# final reconstruct state == the at-lsn oracle minus the delete wave's
# keys (k % 20 ∈ {5, 11})
_SQL_CHANGELOG_COMPACTED = _SQL_RECONSTRUCT_AT_LSN.replace(
    "AND o_orderkey % 4 != 1",
    "AND o_orderkey % 4 != 1 AND o_orderkey % 20 NOT IN (5, 11)",
).replace(
    "WHERE o_orderkey % 4 = 1",
    "WHERE o_orderkey % 4 = 1 AND o_orderkey % 20 NOT IN (5, 11)",
)


def _q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators.scd.scd2_merge): the
    base-wave history is the existing dimension; the tail window's
    changelog (second updates + trailing deletes) folds in without a
    full rebuild — untouched keys anti-join through, only open versions
    re-derive. The oracle computes the full two-version history with
    interval closing directly from the event arithmetic."""
    from changedatacapture_reporting_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    value_cols = ["status", "priority", "total", "note"]
    ev = simulate_cdc_events_multi(spark, sf_dir)

    def log_of(e: DataFrame) -> DataFrame:
        return build_changelog(
            e,
            SIM_PK,
            with_audit_cols=False,
            record_insert_images=True,
            carry_cols=["lsn", "seq"],
        )

    existing = scd2_history(
        log_of(ev.filter(F.col("lsn") < MULTI_OFF_UPDATE)), SIM_PK, value_cols
    )
    return scd2_merge(
        existing,
        log_of(ev.filter(F.col("lsn") >= MULTI_OFF_UPDATE)),
        SIM_PK,
        value_cols,
        # `existing` here is a computed subtree, not a materialized
        # table — checkpoint it so it is derived once, not three times
        materialize=True,
    )


# full two-version history of the multi-event stream: v1 = the base
# event's version (closed by the second update for k%4==1 keys, or by the
# trailing delete for insert→delete k%20==11 keys); v2 = the second
# update's version (status 'Y', total+7, carry elsewhere; closed by the
# trailing delete for k%20==5). No-op base updates emit no v1 but still
# get a carry-less v2.
_SQL_SCD2_INCREMENTAL = f"""
WITH {ORACLE_EVENTS_CTE},
v1 AS (
  SELECT o_orderkey,
    CASE WHEN op = 'insert' THEN a_status
         WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
    CASE WHEN op = 'insert' THEN a_priority
         WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
    CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
         WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR)
    END AS total,
    CASE WHEN op = 'insert' THEN a_note
         WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note,
    commit_ts AS valid_from,
    CASE WHEN o_orderkey % 4 = 1 OR o_orderkey % 20 = 11
         THEN commit_ts END AS valid_to
  FROM ev
  WHERE op != 'delete'
    AND NOT (op = 'update'
             AND b_status IS NOT DISTINCT FROM a_status
             AND b_priority IS NOT DISTINCT FROM a_priority
             AND b_total IS NOT DISTINCT FROM a_total
             AND b_note IS NOT DISTINCT FROM a_note)
),
v2 AS (
  SELECT o_orderkey,
    'Y' AS status,
    CASE WHEN op = 'insert' THEN a_priority
         WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
    CAST(a_total + 7 AS VARCHAR) AS total,
    CASE WHEN op = 'insert' THEN a_note
         WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note,
    commit_ts AS valid_from,
    CASE WHEN o_orderkey % 20 = 5 THEN commit_ts END AS valid_to
  FROM ev
  WHERE o_orderkey % 4 = 1
)
SELECT o_orderkey, status, priority, total, note, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
"""


def _q_multi_table_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table transactionally consistent snapshot
    (operators.reconstruct.snapshot_tables_at_lsn): two tables share one
    LSN sequence (each orders transaction also writes orders_tax at the
    same lsn, seqval 1 — the SQL Server multi-table-transaction shape);
    both reconstruct from the SHARED changelog at the same lsn ≤ 3000
    cut, emitted as one cross-table EAV frame. The oracle replays both
    tables' state arithmetic at the identical boundary."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        snapshot_tables_at_lsn,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        simulate_cdc_events_cross_table,
    )

    base, tax = simulate_cdc_events_cross_table(spark, sf_dir)

    def log_of(e: DataFrame) -> DataFrame:
        return build_changelog(
            e,
            SIM_PK,
            with_audit_cols=False,
            carry_cols=["lsn", "seq"],
            record_insert_images=True,
        )

    log = log_of(base).unionByName(log_of(tax))
    return snapshot_tables_at_lsn(
        log,
        {
            "orders": (SIM_PK, ["status", "priority", "total", "note"]),
            "orders_tax": (SIM_PK, ["rate", "fee"]),
        },
        as_of_lsn=3000,
    )


_SQL_MULTI_SNAPSHOT = f"""
WITH {ORACLE_EVENTS_CTE},
w AS (SELECT * FROM ev WHERE o_orderkey <= 3000),
o_live AS (
  SELECT * FROM w WHERE op != 'delete'
    AND NOT (op = 'update'
             AND b_status IS NOT DISTINCT FROM a_status
             AND b_priority IS NOT DISTINCT FROM a_priority
             AND b_total IS NOT DISTINCT FROM a_total
             AND b_note IS NOT DISTINCT FROM a_note)
),
t_live AS (
  SELECT * FROM w WHERE op != 'delete'
    AND NOT (op = 'update' AND o_orderkey % 3 != 0 AND o_orderkey % 2 != 0)
)
SELECT 'orders' AS table_name, CAST(o_orderkey AS VARCHAR) AS row_key,
       'status' AS column_name,
       CASE WHEN op = 'insert' THEN a_status
            WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS value
FROM o_live
UNION ALL
SELECT 'orders', CAST(o_orderkey AS VARCHAR), 'priority',
       CASE WHEN op = 'insert' THEN a_priority
            WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END
FROM o_live
UNION ALL
SELECT 'orders', CAST(o_orderkey AS VARCHAR), 'total',
       CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
            WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR)
       END
FROM o_live
UNION ALL
SELECT 'orders', CAST(o_orderkey AS VARCHAR), 'note',
       CASE WHEN op = 'insert' THEN a_note
            WHEN b_note IS DISTINCT FROM a_note THEN a_note END
FROM o_live
UNION ALL
SELECT 'orders_tax', CAST(o_orderkey AS VARCHAR), 'rate',
       CASE WHEN op = 'insert' OR o_orderkey % 3 = 0
            THEN CAST(o_orderkey % 9
                 + CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS VARCHAR)
       END
FROM t_live
UNION ALL
SELECT 'orders_tax', CAST(o_orderkey AS VARCHAR), 'fee',
       CASE WHEN op = 'insert' OR o_orderkey % 2 = 0
            THEN CAST(o_orderkey % 11
                 + CASE WHEN o_orderkey % 2 = 0 THEN 2 ELSE 0 END AS VARCHAR)
       END
FROM t_live
"""


def _q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators.incremental_agg): the
    per-status (row count, total sum) aggregate of the simulated orders
    state, maintained from the PRE-change aggregate by folding one CDC
    batch into signed per-group deltas and merging — state is never
    rescanned. Oracle = the from-scratch GROUP BY of the post-batch
    state (after images of every surviving key), which the maintained
    view must equal exactly, including groups the batch emptied."""
    from changedatacapture_reporting_spark.operators.incremental_agg import (
        aggregate_deltas,
        merge_aggregate,
    )

    ev = simulate_cdc_events(spark, sf_dir)
    pre_state = ev.filter(F.col("op") != "insert").select("before.*")
    agg0 = pre_state.groupBy("status").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("total").cast("long").alias("sum_total"),
    )
    deltas = aggregate_deltas(ev, ["status"], {"sum_total": "total"})
    # agg0 here is a computed subtree, not a materialized table —
    # checkpoint it so it is derived once, not twice (scd2 precedent)
    return merge_aggregate(agg0, deltas, ["status"], materialize=True)


_SQL_INCREMENTAL_AGG = f"""
WITH {ORACLE_EVENTS_CTE}
SELECT a_status AS status,
       COUNT(*) AS n_rows,
       CAST(SUM(a_total) AS BIGINT) AS sum_total
FROM ev
WHERE op != 'delete'
GROUP BY 1
"""


def _q_reconstruct_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-cut state series (operators.reconstruct.reconstruct_series):
    the multi-event stream reconstructed at THREE boundaries — end of
    the base wave, between the second-update and delete waves, and after
    everything — in one pass (two aggregations, zero joins), not three
    reconstruct_state runs. The oracle unions the three independently
    derived state arithmetics, each tagged with its cut."""
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_series,
    )
    from changedatacapture_reporting_spark.sources.cdc_simulator import (
        MULTI_OFF_DELETE,
        MULTI_OFF_UPDATE,
        simulate_cdc_events_multi,
    )

    ev = simulate_cdc_events_multi(spark, sf_dir)
    log = build_changelog(
        ev,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    mid = (MULTI_OFF_UPDATE + MULTI_OFF_DELETE) // 2
    return reconstruct_series(
        log,
        SIM_PK,
        ["status", "priority", "total", "note"],
        cuts=[MULTI_OFF_UPDATE - 1, mid, 3 * MULTI_OFF_DELETE],
    )


def _series_cut_sql(cut_expr: str, body: str) -> str:
    # strip the body's own WITH prefix: the series oracle shares ONE CTE
    marker = "SELECT o_orderkey"
    return f"SELECT CAST({cut_expr} AS BIGINT) AS cut, s.* FROM (\n{body[body.index(marker):]}) s"


_SQL_RECONSTRUCT_SERIES = f"""
WITH {ORACLE_EVENTS_CTE}
{_series_cut_sql("99999999", _SQL_RECONSTRUCT)}
UNION ALL
{_series_cut_sql("150000000", _SQL_RECONSTRUCT_AT_LSN)}
UNION ALL
{_series_cut_sql("600000000", _SQL_CHANGELOG_COMPACTED)}
"""


def _q_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift detection (operators.consistency.drift_report): the
    reconstructed state audited against a deterministically corrupted
    snapshot — keys divisible by 17 vanish (missing_in_right), keys
    divisible by 13 get a wrong status (value_mismatch), and the
    delete-wave keys reappear as ghosts (missing_in_left). Identical
    keys emit nothing, so the report is drift-sized. The oracle replays
    the same corruption over the reconstruct arithmetic and the same
    full-outer classification."""
    from changedatacapture_reporting_spark.operators.consistency import (
        drift_report,
    )
    from changedatacapture_reporting_spark.operators.reconstruct import (
        reconstruct_state,
    )

    events = simulate_cdc_events(spark, sf_dir)
    log = build_changelog(
        events,
        SIM_PK,
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    )
    value_cols = ["status", "priority", "total", "note"]
    left = reconstruct_state(log, SIM_PK, value_cols).localCheckpoint()
    k = F.col("o_orderkey")
    corrupted = left.filter(k % 17 != 0).withColumn(
        "status",
        F.when(k % 13 == 0, F.lit("DRIFT")).otherwise(F.col("status")),
    )
    ghosts = events.filter(F.col("op") == "delete").select(
        F.col("before.o_orderkey").alias("o_orderkey"),
        F.lit("GHOST").alias("status"),
        F.lit(None).cast("string").alias("priority"),
        F.lit(None).cast("string").alias("total"),
        F.lit(None).cast("string").alias("note"),
    )
    return drift_report(
        left, corrupted.unionByName(ghosts), SIM_PK, value_cols
    )


_SQL_DRIFT_REPORT = f"""
WITH {ORACLE_EVENTS_CTE},
L AS (
  SELECT o_orderkey,
         CASE WHEN op = 'insert' THEN a_status
              WHEN b_status IS DISTINCT FROM a_status THEN a_status END AS status,
         CASE WHEN op = 'insert' THEN a_priority
              WHEN b_priority IS DISTINCT FROM a_priority THEN a_priority END AS priority,
         CASE WHEN op = 'insert' THEN CAST(a_total AS VARCHAR)
              WHEN b_total IS DISTINCT FROM a_total THEN CAST(a_total AS VARCHAR) END AS total,
         CASE WHEN op = 'insert' THEN a_note
              WHEN b_note IS DISTINCT FROM a_note THEN a_note END AS note
  FROM ev
  WHERE op != 'delete'
    AND NOT (op = 'update'
             AND b_status IS NOT DISTINCT FROM a_status
             AND b_priority IS NOT DISTINCT FROM a_priority
             AND b_total IS NOT DISTINCT FROM a_total
             AND b_note IS NOT DISTINCT FROM a_note)
),
R AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN 'DRIFT' ELSE status END AS status,
         priority, total, note
  FROM L WHERE o_orderkey % 17 != 0
  UNION ALL
  SELECT o_orderkey, 'GHOST', NULL, NULL, NULL
  FROM ev WHERE op = 'delete'
)
SELECT COALESCE(L.o_orderkey, R.o_orderkey) AS o_orderkey,
       CASE WHEN R.o_orderkey IS NULL THEN 'missing_in_right'
            WHEN L.o_orderkey IS NULL THEN 'missing_in_left'
            WHEN L.status IS DISTINCT FROM R.status
              OR L.priority IS DISTINCT FROM R.priority
              OR L.total IS DISTINCT FROM R.total
              OR L.note IS DISTINCT FROM R.note THEN 'value_mismatch'
       END AS drift_kind,
       L.status AS left_status, L.priority AS left_priority,
       L.total AS left_total, L.note AS left_note,
       R.status AS right_status, R.priority AS right_priority,
       R.total AS right_total, R.note AS right_note
FROM L FULL OUTER JOIN R ON L.o_orderkey = R.o_orderkey
WHERE (R.o_orderkey IS NULL OR L.o_orderkey IS NULL
       OR L.status IS DISTINCT FROM R.status
       OR L.priority IS DISTINCT FROM R.priority
       OR L.total IS DISTINCT FROM R.total
       OR L.note IS DISTINCT FROM R.note)
"""


def _q_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily activity series (operators.timeseries.resample_daily,
    zero fill): the changelog's irregular per-day counts regularized to
    one row per (table, day) across each table's observed span — the
    grid every dashboard/forecast consumes. Grid via sequence() explode
    (rows ∝ output, no calendar join); oracle replays with
    generate_series."""
    from changedatacapture_reporting_spark.operators.timeseries import (
        resample_daily,
    )

    log = _changelog(spark, sf_dir)
    daily = (
        log.withColumn("change_date", F.to_date("commit_time"))
        .groupBy("table_name", "change_date")
        .agg(F.count("*").cast("long").alias("n_changes"))
    )
    return resample_daily(
        daily, ["table_name"], "change_date", ["n_changes"], fill="zero"
    )


_SQL_DAILY_SERIES = (
    _ORACLE_CHANGES
    + """
, daily AS (
  SELECT table_name, CAST(commit_time AS DATE) AS d, COUNT(*) AS n_changes
  FROM changes GROUP BY 1, 2
), span AS (
  SELECT table_name, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
), grid AS (
  SELECT table_name, CAST(g AS DATE) AS day
  FROM span, UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                    CAST(hi AS TIMESTAMP),
                                    INTERVAL 1 DAY)) AS t(g)
)
SELECT g.table_name, g.day,
       CAST(COALESCE(d.n_changes, 0) AS BIGINT) AS n_changes,
       d.d IS NOT NULL AS is_observed
FROM grid g
LEFT JOIN daily d ON g.table_name = d.table_name AND g.day = d.d
"""
)


def _q_activity_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-rate anomaly monitor (operators.profile.
    activity_anomaly): per-day changelog volume z-scored against the
    trailing 7 days (current day excluded, ≥3-day history required) —
    the standing alert a CDC operator keeps on the maintained daily
    rollup. The oracle replays the identical window arithmetic.

    Accuracy-contract form (r9): the hashed columns are exact
    (table_name, change_date, n_changes long) plus the two booleans
    derived from the z computation — z_defined (history + positive
    baseline stddev) and is_anomaly (|z| > 2). The double z itself is
    NOT hashed: variance accumulates differently across engines at the
    last ulp, so a rounded double sitting on a rounding boundary could
    flip the hash (NOTES_r08 item 1); the booleans only flip if a z
    sits exactly ON the 2.0 threshold across engines, which the fixture
    is nowhere near (pytest pins the z values themselves)."""
    from changedatacapture_reporting_spark.operators.profile import (
        activity_anomaly,
    )

    log = _changelog(spark, sf_dir)
    daily = (
        log.withColumn("change_date", F.to_date("commit_time"))
        .groupBy("table_name", "change_date")
        .agg(F.count("*").cast("long").alias("n_changes"))
    )
    flagged = activity_anomaly(
        daily, ["table_name"], "change_date", "n_changes",
        trailing=7, z_threshold=2.0,
    )
    return flagged.select(
        "table_name",
        "change_date",
        "n_changes",
        F.col("z_score").isNotNull().alias("z_defined"),
        "is_anomaly",
    )


_SQL_ACTIVITY_ANOMALY = (
    _ORACLE_CHANGES
    + """
, daily AS (
  SELECT table_name, CAST(commit_time AS DATE) AS change_date,
         COUNT(*) AS n_changes
  FROM changes GROUP BY 1, 2
), stats AS (
  SELECT table_name, change_date, n_changes,
         COUNT(n_changes) OVER w AS n_prev,
         AVG(n_changes) OVER w AS m,
         STDDEV_SAMP(n_changes) OVER w AS sd
  FROM daily
  WINDOW w AS (PARTITION BY table_name ORDER BY change_date
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT table_name, change_date, n_changes,
       (n_prev >= 3 AND sd IS NOT NULL AND sd > 0) AS z_defined,
       COALESCE(ABS(CASE WHEN n_prev >= 3 AND sd IS NOT NULL AND sd > 0
                         THEN (n_changes - m) / sd END) > 2.0,
                FALSE) AS is_anomaly
FROM stats
"""
)


def _q_delta_metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation (sources.delta_table.metadata_summary):
    COUNT/MIN/MAX/null-count per column answered ENTIRELY from the
    committed add.stats — zero data files opened after the writes. The
    table is built from orders across three appends (one per priority
    band, partitioned on o_orderstatus), so every number the oracle
    computes by scanning the source rows must be reproduced by folding
    per-file stats alone — proving write-time stats are exact, not
    estimates. Only integer/string/date columns participate (float
    formatting is engine-specific; the stats themselves carry any atomic
    type)."""
    import tempfile

    from changedatacapture_reporting_spark.sources.delta_table import (
        metadata_summary,
        write_delta,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate",
        "o_orderstatus",
    )
    k = F.col("o_orderkey")
    path = tempfile.mkdtemp(prefix="delta_meta_") + "/orders_delta"
    for band in (0, 1, 2):
        write_delta(
            spark,
            orders.filter(k % 3 == band),
            path,
            partition_by=["o_orderstatus"],
        )
    return metadata_summary(spark, path)


_SQL_DELTA_META = """
SELECT 'o_orderkey' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
"""


def _q_pk_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-change fusion (operators.changelog.fuse_pk_change_events):
    SQL Server CDC emits an UPDATE that changes the primary key as a
    same-transaction DELETE+INSERT pair; this contract fabricates such a
    stream deterministically from ``orders`` (delete of pk=k, insert of
    pk=k+10^7 with the identical value image, grouped ~50 per lsn so the
    rank-disambiguation path is exercised, plus unmatched deletes and
    inserts) and checks the fused event stream — op, old/new pk, carried
    values — against a full SQL replay of the rank-to-rank pairing."""
    from changedatacapture_reporting_spark.operators.changelog import (
        fuse_pk_change_events,
    )
    from changedatacapture_reporting_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = o.filter(k % 97 < 30).select(
        k.alias("k"),
        F.col("o_custkey").cast("long").alias("cust"),
        F.col("o_orderpriority").alias("prio"),
    )
    kk = F.col("k")

    def _image(pk) -> F.Column:
        return F.struct(
            pk.cast("long").alias("okey"),
            F.col("cust").alias("cust"),
            F.col("prio").alias("prio"),
        )

    null_img = F.lit(None).cast("struct<okey:bigint,cust:bigint,prio:string>")
    dels = src.filter(kk % 3 != 0).select(
        (kk % 50).cast("long").alias("lsn"),
        kk.cast("long").alias("seq"),
        F.timestamp_seconds(kk).alias("commit_ts"),
        F.lit("delete").alias("op"),
        F.lit("orders").alias("table_name"),
        _image(kk).alias("before"),
        null_img.alias("after"),
    )
    ins = src.filter(kk % 3 != 1).select(
        (kk % 50).cast("long").alias("lsn"),
        (kk + 1).cast("long").alias("seq"),
        F.timestamp_seconds(kk + 1).alias("commit_ts"),
        F.lit("insert").alias("op"),
        F.lit("orders").alias("table_name"),
        null_img.alias("before"),
        _image(kk + 10_000_000).alias("after"),
    )
    fused = fuse_pk_change_events(
        dels.unionByName(ins), ["okey"], ["cust", "prio"]
    )
    return fused.select(
        "lsn",
        "seq",
        "op",
        F.col("before.okey").alias("old_pk"),
        F.col("after.okey").alias("new_pk"),
        F.coalesce(F.col("after.cust"), F.col("before.cust")).alias("cust"),
        F.coalesce(F.col("after.prio"), F.col("before.prio")).alias("prio"),
    )


_SQL_PK_CHANGE = """
WITH src AS (
  SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS cust,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 97 < 30
),
d AS (
  SELECT CAST(k % 50 AS BIGINT) AS lsn, CAST(k AS BIGINT) AS seq,
         CAST(k AS BIGINT) AS pk, cust, prio,
         ROW_NUMBER() OVER (PARTITION BY k % 50, cust, prio ORDER BY k) AS r
  FROM src WHERE k % 3 != 0
),
i AS (
  SELECT CAST(k % 50 AS BIGINT) AS lsn, CAST(k + 1 AS BIGINT) AS seq,
         CAST(k + 10000000 AS BIGINT) AS pk, cust, prio,
         ROW_NUMBER() OVER (PARTITION BY k % 50, cust, prio ORDER BY k) AS r
  FROM src WHERE k % 3 != 1
)
SELECT COALESCE(i.lsn, d.lsn) AS lsn,
       COALESCE(i.seq, d.seq) AS seq,
       CASE WHEN d.pk IS NOT NULL AND i.pk IS NOT NULL THEN 'pk_update'
            WHEN d.pk IS NOT NULL THEN 'delete'
            ELSE 'insert' END AS op,
       d.pk AS old_pk,
       i.pk AS new_pk,
       COALESCE(i.cust, d.cust) AS cust,
       COALESCE(i.prio, d.prio) AS prio
FROM d FULL OUTER JOIN i
  ON d.lsn = i.lsn AND d.cust = i.cust AND d.prio = i.prio AND d.r = i.r
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

from changedatacapture_reporting_spark.contracts_llm import (  # noqa: E402
    REGISTRY_LLM,
)
from changedatacapture_reporting_spark.contracts_relational import (  # noqa: E402
    REGISTRY_RELATIONAL,
)
from changedatacapture_reporting_spark.contracts_streaming import (  # noqa: E402
    REGISTRY_STREAMING,
)

_REGISTRY_ALL: dict[str, tuple[QueryFn, str | None]] = {
    "cdc_changelog_full": (_q_changelog_full, _SQL_CHANGELOG_FULL),
    "cdc_changelog_join_path": (_q_changelog_join_path, _SQL_CHANGELOG_JOIN_PATH),
    "cdc_query_window": (_q_query_window, _SQL_QUERY_WINDOW),
    "cdc_freshness": (_q_freshness, _SQL_FRESHNESS),
    "cdc_watermark_bounds": (_q_watermark_bounds, _SQL_WATERMARK_BOUNDS),
    "cdc_incremental_resume": (_q_incremental_resume, _SQL_INCREMENTAL_RESUME),
    "cdc_changelog_daily_activity": (_q_changelog_daily_activity, _SQL_CHANGELOG_DAILY),
    "cdc_changelog_sql_surface": (_q_changelog_sql_surface, _SQL_SQL_SURFACE),
    "cdc_reconstruct_state": (_q_reconstruct_state, _SQL_RECONSTRUCT),
    "cdc_state_snapshot_refresh": (_q_state_snapshot_refresh, _SQL_RECONSTRUCT),
    "cdc_mssql_shape_roundtrip": (_q_mssql_shape_roundtrip, _SQL_CHANGELOG_FULL),
    "cdc_jdbc_shape_roundtrip": (_q_jdbc_shape_roundtrip, _SQL_JDBC_ROUNDTRIP),
    "cdc_debezium_roundtrip": (_q_debezium_roundtrip, _SQL_CHANGELOG_FULL),
    "cdc_debezium_dlq": (_q_debezium_dlq, _SQL_DEBEZIUM_DLQ),
    "cdc_delta_cdf_roundtrip": (_q_delta_cdf_roundtrip, _SQL_CHANGELOG_FULL),
    "delta_table_roundtrip": (_q_delta_table_roundtrip, _SQL_DELTA_TABLE),
    "delta_optimize_roundtrip": (_q_delta_optimize, _SQL_DELTA_OPTIMIZE),
    "delta_merge_upsert": (_q_delta_merge, _SQL_DELTA_MERGE),
    "delta_deletion_vectors": (
        _q_delta_deletion_vectors,
        _SQL_DELTA_DELETION_VECTORS,
    ),
    "cdc_from_delta_snapshots": (_q_cdc_from_snapshots, _SQL_CDC_FROM_SNAPSHOTS),
    "cdc_kafka_roundtrip": (_q_kafka_roundtrip, _SQL_CHANGELOG_FULL),
    "cdc_schema_evolution": (_q_schema_evolution, _SQL_SCHEMA_EVOLUTION),
    "cdc_forget_keys": (_q_forget_keys, _SQL_FORGET),
    "cdc_forget_keys_delta": (_q_forget_keys_delta, _SQL_FORGET),
    "cdc_backfill_gap": (_q_backfill_gap, _SQL_CHANGELOG_FULL),
    "cdc_row_history": (_q_row_history, _SQL_ROW_HISTORY),
    "cdc_net_changes": (_q_net_changes, _SQL_NET_CHANGES),
    "cdc_apply_net_changes": (_q_apply_net_changes, _SQL_APPLY_NET),
    "cdc_scd2_history": (_q_scd2_history, _SQL_SCD2),
    "cdc_scd2_incremental": (_q_scd2_incremental, _SQL_SCD2_INCREMENTAL),
    "cdc_reconstruct_at_lsn": (_q_reconstruct_at_lsn, _SQL_RECONSTRUCT_AT_LSN),
    "cdc_reconstruct_series": (_q_reconstruct_series, _SQL_RECONSTRUCT_SERIES),
    "cdc_changelog_compacted": (_q_changelog_compacted, _SQL_CHANGELOG_COMPACTED),
    "cdc_snapshot_diff": (_q_snapshot_diff, _SQL_SNAPSHOT_DIFF),
    "cdc_multi_table_snapshot": (_q_multi_table_snapshot, _SQL_MULTI_SNAPSHOT),
    "cdc_transaction_summary": (_q_transaction_summary, _SQL_TRANSACTION_SUMMARY),
    "cdc_incremental_agg": (_q_incremental_agg, _SQL_INCREMENTAL_AGG),
    "cdc_activity_anomaly": (_q_activity_anomaly, _SQL_ACTIVITY_ANOMALY),
    "cdc_daily_series": (_q_daily_series, _SQL_DAILY_SERIES),
    "cdc_drift_report": (_q_drift_report, _SQL_DRIFT_REPORT),
    "profile_orders": (_q_profile_orders, _SQL_PROFILE),
    "cdc_column_churn": (_q_column_churn, _SQL_COLUMN_CHURN),
    "cdc_pk_change_events": (_q_pk_change_events, _SQL_PK_CHANGE),
    "delta_metadata_summary": (_q_delta_metadata_summary, _SQL_DELTA_META),
    "delta_foreign_dv": (_q_delta_foreign_dv, _SQL_DELTA_FOREIGN_DV),
    "delta_column_mapping": (
        _q_delta_column_mapping,
        _SQL_DELTA_COLUMN_MAPPING,
    ),
    "delta_v2_checkpoint": (
        _q_delta_v2_checkpoint,
        _SQL_DELTA_V2_CHECKPOINT,
    ),
    "delta_mapped_writes": (
        _q_delta_mapped_writes,
        _SQL_DELTA_MAPPED_WRITES,
    ),
    "delta_change_feed": (
        _q_delta_change_feed,
        _SQL_DELTA_CHANGE_FEED,
    ),
    "delta_cdf_writes": (
        _q_delta_cdf_writes,
        _SQL_DELTA_CDF_WRITES,
    ),
    "delta_row_invariants": (
        _q_delta_row_invariants,
        _SQL_DELTA_ROW_INVARIANTS,
    ),
    "delta_identity_writes": (
        _q_delta_identity_writes,
        _SQL_DELTA_IDENTITY_WRITES,
    ),
    "delta_id_mode_writes": (
        _q_delta_id_mode_writes,
        _SQL_DELTA_ID_MODE_WRITES,
    ),
    "delta_ict_time_travel": (
        _q_delta_ict_time_travel,
        _SQL_DELTA_ICT_TIME_TRAVEL,
    ),
    "delta_timestamp_ntz": (
        _q_delta_timestamp_ntz,
        _SQL_DELTA_TIMESTAMP_NTZ,
    ),
    "delta_variant_roundtrip": (
        _q_delta_variant_roundtrip,
        _SQL_DELTA_VARIANT,
    ),
    "delta_type_widening": (
        _q_delta_type_widening,
        _SQL_DELTA_TYPE_WIDENING,
    ),
    "delta_row_tracking": (
        _q_delta_row_tracking,
        _SQL_DELTA_ROW_TRACKING,
    ),
    "cdc_populate_delta_sink": (_q_populate_delta_sink, _SQL_CHANGELOG_FULL),
    **REGISTRY_RELATIONAL,
    **REGISTRY_LLM,
    **REGISTRY_STREAMING,
}

# The driver's correctness gate checks roughly the FIRST 50 registry
# entries; rotation is derived by tools/window_rotation.py from the
# CORRECTNESS_r*.json ledger (see the r14 note inside the list).
_CHECK_WINDOW: list[str] = [
    # r14 window from tools/window_rotation.py --propose: the NEW
    # interop entries lead (never driver-checked — five from the
    # lakehouse wave, four from the writer-feature wave), then the
    # 15-entry r10-stale cohort, then the oldest r11 names — after
    # this round nothing in the 176-entry registry is staler than r11.
    "delta_row_invariants",
    "delta_identity_writes",
    "delta_id_mode_writes",
    "delta_ict_time_travel",
    "delta_timestamp_ntz",
    "delta_variant_roundtrip",
    "delta_type_widening",
    "delta_row_tracking",
    "cdc_forget_keys_delta",
    "delta_v2_checkpoint",
    "delta_mapped_writes",
    "delta_change_feed",
    "delta_cdf_writes",
    "multimodal_frame_sample",
    "order_gaps",
    "order_priority_stats",
    "part_price_ranks",
    "percentile_spend",
    "q11_important_parts",
    "q12_shipping_latency",
    "q16_supplier_count_by_part",
    "q20_excess_suppliers",
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q9_product_profit",
    "streaming_apply_state",
    "streaming_current_state",
    "text_langid",
    "text_quality_scores",
    "text_token_stats",
    "above_customer_avg_orders",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "approx_distinct_stats",
    "asof_signup_attribution",
    "cdc_changelog_full",
    "cdc_daily_series",
    "cdc_drift_report",
    "cdc_forget_keys",
    "cdc_from_delta_snapshots",
    "cdc_incremental_agg",
    "cdc_incremental_resume",
    "cdc_kafka_roundtrip",
    "cdc_pk_change_events",
    "cdc_reconstruct_series",
    "cdc_reconstruct_state",
    "cdc_watermark_bounds",
    "corpus_boilerplate_scores",
    "corpus_lm_surprisal",
    "corpus_pack_bfd",
    # (8 oldest-r11 names deferred to the r15 rotation to keep the
    # window at 50 as new interop entries joined the head:
    # corpus_pack_sequences, corpus_pps_sample, corpus_prepare,
    # cube_lineitem_counts, customers_with_urgent_orders,
    # dedup_embedding_neardup, delta_merge_upsert,
    # delta_metadata_summary)
]

assert set(_CHECK_WINDOW) <= set(_REGISTRY_ALL), sorted(
    set(_CHECK_WINDOW) - set(_REGISTRY_ALL)
)
assert len(_CHECK_WINDOW) == len(set(_CHECK_WINDOW)) == 50

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    name: _REGISTRY_ALL[name] for name in _CHECK_WINDOW
} | {name: v for name, v in _REGISTRY_ALL.items() if name not in set(_CHECK_WINDOW)}


def _ensure_session_confs(spark: SparkSession) -> None:
    """The driver supplies its own SparkSession; these runtime confs are
    required for correct semantics regardless of how it was built:
    UTC pins timestamp semantics to match the DuckDB oracle, nanosAsLong
    lets the events table's TIMESTAMP(NANOS) parquet be read at all."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _wrap(fn: QueryFn) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_session_confs(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, QueryFn]:
    return {name: _wrap(fn) for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
