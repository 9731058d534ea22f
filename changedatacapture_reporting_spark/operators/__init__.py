from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
    changed_column_entries,
    pair_update_images,
)
from changedatacapture_reporting_spark.operators.maintenance import (
    compact_changelog,
    compact_sink_files,
    expire_changelog_months,
    retain_changelog,
)
from changedatacapture_reporting_spark.operators.populate import (
    PopulateResult,
    populate_changelog,
    recover_sink,
)
from changedatacapture_reporting_spark.operators.profile import profile_table
from changedatacapture_reporting_spark.operators.serving import (
    build_state_snapshot,
    read_state_snapshot,
    refresh_state_snapshot,
)
from changedatacapture_reporting_spark.operators.range_join import (
    interval_overlap_join,
    point_in_interval_join,
)
from changedatacapture_reporting_spark.operators.query_data import (
    freshness,
    query_changelog,
    resolve_changelog_name,
)
from changedatacapture_reporting_spark.operators.reconstruct import (
    reconstruct_state,
)
from changedatacapture_reporting_spark.operators.rollup import (
    read_rollup,
    update_rollup,
)
from changedatacapture_reporting_spark.operators.scd import scd2_history

__all__ = [
    "build_changelog",
    "changed_column_entries",
    "pair_update_images",
    "populate_changelog",
    "PopulateResult",
    "query_changelog",
    "freshness",
    "resolve_changelog_name",
    "reconstruct_state",
    "scd2_history",
    "read_rollup",
    "update_rollup",
    "compact_changelog",
    "compact_sink_files",
    "expire_changelog_months",
    "recover_sink",
    "retain_changelog",
    "profile_table",
    "build_state_snapshot",
    "read_state_snapshot",
    "refresh_state_snapshot",
    "point_in_interval_join",
    "interval_overlap_join",
]
