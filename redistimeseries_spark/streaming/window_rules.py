"""Compaction rules as native Structured Streaming windowed aggregation.

The reference's rule engine finalizes a bucket when a sample lands in a
newer bucket (src/module.c:915-984) — in Structured Streaming terms that's
a tumbling-window aggregation in *append* mode with a watermark: a window
emits once the event-time watermark passes its end, i.e. once newer data
has arrived (plus the configured lateness allowance, which generalizes the
reference's strict in-order finalize to bounded out-of-orderness; samples
later than the watermark are the reference's "late beyond retention"
rejects).

This is the pure-streaming alternative to StreamingStore's foreachBatch
recompute: state lives in the streaming state store (checkpointed — the
reference serializes live agg contexts into RDB, compaction.h:32-33), and
each closed bucket is appended to the dest sink exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark.functions.aggs import agg_expr

# aggregators expressible in streaming append mode (algebraic / bounded state)
STREAMING_AGGS = {
    "min", "max", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "range", "std.p", "std.s", "var.p", "var.s",
}


def windowed_rule(
    stream: DataFrame,
    agg: str,
    bucket_ms: int,
    watermark_delay_ms: int = 0,
    align_ts: int = 0,
) -> DataFrame:
    """stream: streaming DF (key, ts epoch-ms, value).  Returns a streaming
    DF (key, ts=bucket_start_ms, value) that, in append output mode, emits
    each bucket exactly once when it closes.

    align_ts: rule alignment (TS.CREATERULE alignTimestamp) — the bucket
    lattice is offset by align mod dur (CalcBucketStart, src/tsdb.h:88-99);
    window()'s startTime parameter expresses exactly that shift."""
    if agg not in STREAMING_AGGS:
        raise ValueError(f"{agg} is not streamable in append mode (use foreachBatch)")
    with_time = stream.withColumn("__event_time", F.timestamp_millis(F.col("ts")))
    win = F.window(
        "__event_time",
        f"{bucket_ms} milliseconds",
        f"{bucket_ms} milliseconds",
        f"{align_ts % bucket_ms} milliseconds",
    )
    out = (
        with_time.withWatermark("__event_time", f"{watermark_delay_ms} milliseconds")
        .groupBy("key", win.alias("__w"))
        .agg(agg_expr(agg, F.col("value"), F.col("ts"), alias="value"))
        .select(
            "key",
            F.unix_millis(F.col("__w.start")).alias("ts"),
            "value",
        )
    )
    return out


def session_rule(
    stream: DataFrame,
    gap_ms: int,
    watermark_delay_ms: int = 0,
) -> DataFrame:
    """Gap-based sessionization as a NATIVE streaming aggregation:
    `F.session_window(ts, gap)` merges overlapping per-key session state
    in the state store and, in append mode, emits each closed session
    exactly once — when the watermark passes session_end + gap (no newer
    event can extend it).  The streaming counterpart of the batch
    operators/session.py (whose window formulation this matches on
    replayed input, up to the session-numbering column: streaming
    sessions are identified by their start ts, which is stable under
    replay; batch ordinals are not available incrementally).

    Returns a streaming DF (key, start_ts, end_ts, n_samples, sum_value).
    """
    with_time = stream.withColumn("__t", F.timestamp_millis(F.col("ts")))
    delay = f"{watermark_delay_ms} milliseconds"
    return (
        with_time.withWatermark("__t", delay)
        .groupBy("key", F.session_window("__t", f"{gap_ms} milliseconds"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .select("key", "start_ts", "end_ts", "n_samples", "sum_value")
    )
