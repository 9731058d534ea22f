from changedatacapture_reporting_spark.functions.text import (
    fingerprint_md5,
    langid_scores,
    quality_columns,
    shingles,
    simhash64,
    tokens,
)
from changedatacapture_reporting_spark.functions.vectors import (
    dot_decimal,
    dot_double,
    l2_norm_sq,
)

__all__ = [
    "tokens",
    "shingles",
    "fingerprint_md5",
    "quality_columns",
    "langid_scores",
    "simhash64",
    "dot_decimal",
    "dot_double",
    "l2_norm_sq",
]
