from changedatacapture_reporting_spark.sources.cdc_simulator import (
    simulate_cdc_events,
)
from changedatacapture_reporting_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "simulate_cdc_events",
]
