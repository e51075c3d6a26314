"""Bucket math, replicated exactly from the reference.

Reference: CalcBucketStart (src/tsdb.h:84-99) —
  bucket(ts) = ts - ((ts - align) mod dur)   with positive modulo,
  clamped to >= 0.
BUCKETTIMESTAMP (src/filter_iterator.c:42-55): reported timestamp is the
bucket start ('-'), midpoint ('~', start + dur/2 integer), or end ('+').
ALIGN (src/tsdb.c:1392-1407): alignment = raw query start / query end /
explicit timestamp (note: the *unclamped* query start, even when retention
clamps the scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_start(ts: Column, dur: int, align: int = 0) -> Column:
    b = ts - F.pmod(ts - F.lit(align).cast("long"), F.lit(dur).cast("long"))
    return F.greatest(F.lit(0).cast("long"), b)


def resolve_align(align, start_ts: int, end_ts: int) -> int:
    """'start' | 'end' | explicit int -> alignment timestamp."""
    if align == "start" or align == "-":
        return start_ts
    if align == "end" or align == "+":
        return end_ts
    return int(align or 0)


def report_ts(bucket: Column, dur: int, bucket_ts: str = "-") -> Column:
    """Shift the reported bucket timestamp per BUCKETTIMESTAMP."""
    if bucket_ts in ("-", "start", "low"):
        return bucket
    if bucket_ts in ("~", "mid"):
        return bucket + F.lit(dur // 2).cast("long")
    if bucket_ts in ("+", "end", "high"):
        return bucket + F.lit(dur).cast("long")
    raise ValueError(f"bad BUCKETTIMESTAMP {bucket_ts!r}")


def bucket_sql(ts_expr: str, dur: int, align: int = 0) -> str:
    """DuckDB-side expression mirroring bucket_start (positive pmod)."""
    return (
        f"GREATEST(0, {ts_expr} - ((({ts_expr} - {align}) % {dur} + {dur}) % {dur}))"
    )


def report_ts_sql(bucket_expr: str, dur: int, bucket_ts: str = "-") -> str:
    if bucket_ts in ("-", "start", "low"):
        return bucket_expr
    if bucket_ts in ("~", "mid"):
        return f"({bucket_expr} + {dur // 2})"
    if bucket_ts in ("+", "end", "high"):
        return f"({bucket_expr} + {dur})"
    raise ValueError(f"bad BUCKETTIMESTAMP {bucket_ts!r}")
