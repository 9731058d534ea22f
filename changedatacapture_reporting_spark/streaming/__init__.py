from changedatacapture_reporting_spark.streaming.populate_stream import (
    stream_populate,
)
from changedatacapture_reporting_spark.streaming.stateful import (
    current_state_stream,
)
from changedatacapture_reporting_spark.streaming.windows import (
    sliding_counts,
    stateful_dedup,
    streaming_sessions,
    tumbling_counts,
)

__all__ = [
    "stream_populate",
    "current_state_stream",
    "tumbling_counts",
    "sliding_counts",
    "streaming_sessions",
    "stateful_dedup",
]
