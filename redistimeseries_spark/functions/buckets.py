"""Bucket math, replicated exactly from the reference.

Reference: CalcBucketStart (src/tsdb.h:89-95) —
  bucket(ts) = ts - ((ts - align) mod dur)   with positive modulo,
  UNCLAMPED: the internal bucket grid may start at a negative timestamp
  (e.g. ALIGN later than an early sample).  BucketStartNormalize
  (src/tsdb.h:97-99) clamps to >= 0 only when the bucket is *reported*
  (filter_iterator.c:1071, module.c:922) — grouping, spine generation and
  joins all run on the unclamped grid, otherwise the grid turns irregular
  near 0 and real buckets collide into the clamped one.
BUCKETTIMESTAMP (src/filter_iterator.c:42-55): reported timestamp is the
normalized bucket start ('-'), midpoint ('~', start + dur/2 integer), or
end ('+') — the shift applies after normalization.
ALIGN (src/tsdb.c:1392-1407): alignment = raw query start / query end /
explicit timestamp (note: the *unclamped* query start, even when retention
clamps the scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_start(ts: Column, dur: int, align: int = 0) -> Column:
    """Unclamped bucket start (CalcBucketStart) — grouping key, NOT the
    reported timestamp.  Use report_ts/normalize_bucket for output."""
    return ts - F.pmod(ts - F.lit(align).cast("long"), F.lit(dur).cast("long"))


def normalize_bucket(bucket: Column) -> Column:
    """BucketStartNormalize (src/tsdb.h:97-99): clamp negative bucket
    starts to 0 when reporting."""
    return F.greatest(F.lit(0).cast("long"), bucket)


def resolve_align(align, start_ts: int, end_ts: int) -> int:
    """'start' | 'end' | explicit int -> alignment timestamp."""
    if align == "start" or align == "-":
        return start_ts
    if align == "end" or align == "+":
        return end_ts
    return int(align or 0)


def report_ts(bucket: Column, dur: int, bucket_ts: str = "-") -> Column:
    """Normalize (clamp >= 0) then shift per BUCKETTIMESTAMP — the
    reference normalizes before calc_bucket_ts (filter_iterator.c:1071 then
    :42-55)."""
    b = normalize_bucket(bucket)
    if bucket_ts in ("-", "start", "low"):
        return b
    if bucket_ts in ("~", "mid"):
        return b + F.lit(dur // 2).cast("long")
    if bucket_ts in ("+", "end", "high"):
        return b + F.lit(dur).cast("long")
    raise ValueError(f"bad BUCKETTIMESTAMP {bucket_ts!r}")


def bucket_sql(ts_expr: str, dur: int, align: int = 0) -> str:
    """DuckDB-side expression mirroring bucket_start (positive pmod,
    unclamped grouping grid)."""
    return f"({ts_expr} - ((({ts_expr} - {align}) % {dur} + {dur}) % {dur}))"


def report_ts_sql(bucket_expr: str, dur: int, bucket_ts: str = "-") -> str:
    b = f"GREATEST(0, {bucket_expr})"
    if bucket_ts in ("-", "start", "low"):
        return b
    if bucket_ts in ("~", "mid"):
        return f"({b} + {dur // 2})"
    if bucket_ts in ("+", "end", "high"):
        return f"({b} + {dur})"
    raise ValueError(f"bad BUCKETTIMESTAMP {bucket_ts!r}")
