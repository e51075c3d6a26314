"""Rollup routing: answer a coarse-bucket aggregation query from a
fine-bucket compaction destination instead of the raw samples.

The reference maintains compaction dests (TS.CREATERULE) but always
answers TS.RANGE from the source chunks; at 100 TB the dest table is
1000x smaller than the fact table, so routing a compatible query to it
is the materialized-view rewrite every warehouse performs.  Routing is
EXACT only for composable aggregators:

  min/max/sum  combine with themselves
  count        combines with sum
  first/last   combine with min_by/max_by on the fine-bucket ts

avg/std/var/twa do not compose from their own outputs (they need
sum+count / moment pairs) and are rejected — route those to the raw
samples, or maintain sum+count rules.

Compatibility: coarse bucket must be a whole multiple of the fine
bucket and share its alignment, so every fine bucket nests in exactly
one coarse bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark.functions.buckets import bucket_start

COMPOSABLE = {
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.sum(c),
    "first": lambda c: F.min_by(c, "ts"),
    "last": lambda c: F.max_by(c, "ts"),
}


def range_from_rollup(
    dest: DataFrame,
    agg: str,
    fine_ms: int,
    coarse_ms: int,
    align: int = 0,
    out_col: str | None = None,
) -> DataFrame:
    """(key, ts, <agg>) at `coarse_ms` buckets, computed from a
    `fine_ms`-bucket dest table (key, ts = fine bucket start, value).

    One groupBy over the dest — a table |buckets|/|samples| the size of
    the fact table; the scan, not the samples scan, is the whole cost."""
    if agg not in COMPOSABLE:
        raise ValueError(
            f"aggregator {agg!r} does not compose from its own outputs; "
            f"composable: {sorted(COMPOSABLE)}"
        )
    if coarse_ms % fine_ms != 0:
        raise ValueError("coarse bucket must be a multiple of the fine bucket")
    b = bucket_start(F.col("ts"), coarse_ms, align)
    return (
        dest.groupBy("key", b.alias("ts"))
        .agg(COMPOSABLE[agg]("value").alias(out_col or agg))
        .orderBy("key", "ts")
    )
