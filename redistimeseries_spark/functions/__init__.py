from redistimeseries_spark.functions.buckets import bucket_start, report_ts, resolve_align
from redistimeseries_spark.functions.aggs import (
    AGGREGATORS,
    agg_expr,
    empty_value,
    is_valid_agg,
    percentile_frac,
    sanitize,
)

__all__ = [
    "bucket_start",
    "report_ts",
    "resolve_align",
    "AGGREGATORS",
    "agg_expr",
    "empty_value",
    "is_valid_agg",
    "percentile_frac",
    "sanitize",
]
