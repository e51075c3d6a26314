"""Shared sample-validity + key/range pre-filter.

One definition of the rule every analytics operator applies before its
plan (NaN samples are invalid everywhere — isValueValid,
src/tsdb.c:380-386; key subset; inclusive [start, end] range) — was
verbatim-copied across smooth/resample/correlate until round 10."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS


def filter_valid_range(
    samples: DataFrame,
    keys: list[str] | str | None,
    start: int,
    end: int,
) -> DataFrame:
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    return df
