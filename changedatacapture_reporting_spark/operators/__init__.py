from changedatacapture_reporting_spark.operators.changelog import (
    build_changelog,
    changed_column_entries,
    pair_update_images,
)
from changedatacapture_reporting_spark.operators.query_data import (
    freshness,
    query_changelog,
)

__all__ = [
    "build_changelog",
    "changed_column_entries",
    "pair_update_images",
    "query_changelog",
    "freshness",
]
