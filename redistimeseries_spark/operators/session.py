"""Gap-based sessionization of per-key sample streams.

Not in the reference surface (its closest notion is the bucket), but the
first event-stream question users ask after range aggregation: split each
series into sessions separated by silence > gap, then aggregate per
session.  Batch shape: one per-key window — lag to detect session starts,
running sum to number them — then an ordinary groupBy for stats; both
stages key-partitioned, satisfied without an exchange on the bucketed
(key, ts)-sorted layout.  The streaming analogue is Spark's native
`F.session_window(ts, gap)` watermark aggregation; this module is the
batch/backfill path that matches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(samples: DataFrame, gap_ms: int) -> DataFrame:
    """(key, ts, value, session_id) — session_id numbers sessions per key
    from 1 in time order; a new session starts when the gap from the
    previous sample exceeds `gap_ms` (strict).  Requires unique (key, ts)
    (resolve duplicates first — write/dup_policy)."""
    w = Window.partitionBy("key").orderBy("ts")
    prev = F.lag("ts").over(w)
    starts = prev.isNull() | (F.col("ts") - prev > gap_ms)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return samples.select(
        "key",
        "ts",
        "value",
        F.sum(starts.cast("long")).over(run).alias("session_id"),
    )


def session_stats(samples: DataFrame, gap_ms: int) -> DataFrame:
    """(key, session_id, start_ts, end_ts, n_samples, sum_value) — one row
    per session."""
    return (
        sessionize(samples, gap_ms)
        .groupBy("key", "session_id")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("value").alias("sum_value"),
        )
    )
