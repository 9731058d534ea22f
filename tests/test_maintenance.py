"""Changelog compaction/retention invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from changedatacapture_reporting_spark.operators.changelog import build_changelog
from changedatacapture_reporting_spark.operators.maintenance import (
    compact_changelog,
    retain_changelog,
)
from changedatacapture_reporting_spark.operators.reconstruct import reconstruct_state


@pytest.fixture(scope="module")
def log(spark, cdc_fixture):
    return build_changelog(
        cdc_fixture,
        ["id", "tenant_id"],
        with_audit_cols=False,
        carry_cols=["lsn", "seq"],
        record_insert_images=True,
    ).cache()


PK = ["id", "tenant_id"]
VALS = ["name", "qty", "note"]


def _state(df, as_of=None):
    return {
        (r.id, r.tenant_id): (r.name, r.qty, r.note)
        for r in reconstruct_state(df, PK, VALS, as_of=as_of).collect()
    }


def test_compaction_preserves_current_state(log):
    compacted = compact_changelog(log, PK)
    assert _state(compacted) == _state(log)
    # and it is strictly smaller: one row per (row, column) + markers
    assert compacted.count() < log.count()


def test_compaction_keeps_latest_values(log):
    compacted = compact_changelog(log, PK)
    qty_rows = compacted.filter(
        (F.col("id") == 2) & (F.col("column_name") == "qty")
    ).collect()
    assert len(qty_rows) == 1
    assert qty_rows[0].new_value == "22"  # last of the same-lsn double update


def test_retention_preserves_reconstruction_after_cutoff(log):
    cutoff = dt.datetime(2024, 1, 2, 12, 0)
    retained = retain_changelog(log, PK, cutoff)
    assert retained.count() < log.count()
    for as_of in (None, dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4, 23, 0)):
        assert _state(retained, as_of) == _state(log, as_of), f"as_of={as_of}"
