"""PySpark-native CDC reporting + analytics engine.

A from-scratch re-expression of the capabilities of
``thedobe/ChangeDataCapture-Reporting`` (a T-SQL, metadata-driven CDC→changelog
code generator; see /root/reference) as an idiomatic Apache Spark engine:

- CDC event streams → long-format per-column changelog
  (``usp_cdc_populate_changelog.sql`` semantics) via DataFrame built-ins only.
- Time-range changelog reporting (``usp_cdc_query_data.sql`` semantics).
- Batch incremental (high-watermark) and Structured Streaming execution.
- A broad relational operator surface plus LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns), designed
  for 100 TB scale: no row-at-a-time Python in any hot path, broadcast-able
  dims, shuffle-conscious plans.
"""

from changedatacapture_reporting_spark.config import CompatFlags
from changedatacapture_reporting_spark.session import get_spark

__all__ = ["CompatFlags", "get_spark"]
__version__ = "0.1.0"
