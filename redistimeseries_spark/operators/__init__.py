from redistimeseries_spark.operators.range_query import ts_range

__all__ = ["ts_range"]
