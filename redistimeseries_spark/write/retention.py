"""Retention: query-time clamp + eviction.

Reference: samples older than lastTimestamp - retention are clamped out of
queries (src/tsdb.c:1367-1374) and evicted on chunk rollover
(SeriesTrim, src/tsdb.c:207-239); late arrivals beyond retention are
rejected at ingest (src/module.c:1006-1012).

Spark: the clamp is an extra filter conjunct computed from per-key max(ts)
— a tiny per-key aggregate broadcast back into the scan predicate.  At
100 TB the `latest` side is one row per series; the join is broadcast and
the ts predicate still prunes row groups.  Eviction is a partition-drop
job on the day-partitioned layout (delete whole partitions older than the
horizon, rewrite only the boundary partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_clamp(samples: DataFrame, retention_ms: int) -> DataFrame:
    """Filter to ts >= per-key max(ts) - retention (0 = unlimited)."""
    if retention_ms <= 0:
        return samples
    horizon = samples.groupBy("key").agg(
        (F.max("ts") - F.lit(retention_ms)).alias("__horizon")
    )
    return (
        samples.join(F.broadcast(horizon), "key")
        .filter(F.col("ts") >= F.col("__horizon"))
        .drop("__horizon")
    )


def reject_late(
    incoming: DataFrame, current_max: DataFrame, retention_ms: int
) -> tuple[DataFrame, DataFrame]:
    """Split an ingest batch into (accepted, rejected) per the reference's
    late-beyond-retention rule.  current_max: (key, max_ts)."""
    if retention_ms <= 0:
        return incoming, incoming.limit(0)
    j = incoming.join(F.broadcast(current_max), "key", "left")
    late = F.col("max_ts").isNotNull() & (
        F.col("ts") < F.col("max_ts") - F.lit(retention_ms)
    )
    return (
        j.filter(~late).drop("max_ts"),
        j.filter(late).drop("max_ts"),
    )
