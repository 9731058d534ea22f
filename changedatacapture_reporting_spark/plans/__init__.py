from changedatacapture_reporting_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_python_eval,
    assert_pushed_filter,
    plan_string,
)
from changedatacapture_reporting_spark.plans.skew import salted_aggregate

__all__ = [
    "plan_string",
    "assert_pushed_filter",
    "assert_broadcast_join",
    "assert_no_python_eval",
    "salted_aggregate",
]
