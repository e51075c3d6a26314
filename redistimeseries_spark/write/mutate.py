"""TS.INCRBY / TS.DECRBY, TS.DEL, and the IGNORE ingest dedup filter.

INCRBY (src/module.c:1469-1564): each increment reads lastValue and writes
lastValue + delta at ts — over a batch of increments this is exactly a
running cumulative sum per key, i.e. one window scan (no driver loop).

DEL (src/module.c:2306-2339): delete samples in [from, to]; on a Delta
layout this is `DELETE WHERE key = ? AND ts BETWEEN`; here the batch
builder returns the surviving rows plus which compaction buckets must be
recomputed (ContinuousDeletion cascade, src/tsdb.c:772-793) — the caller
re-aggregates exactly those buckets (streaming/compaction.py).

IGNORE (src/module.c:986-1023): at ingest, with DP_LAST, drop a sample if
ts - prev_ts <= ignoreMaxTimeDiff AND |value - prev_value| <=
ignoreMaxValDiff where prev is the previously *kept* sample.  The kept-set
dependence makes it a sequential scan per key — vectorized numpy inside
applyInPandas, same scale shape as TWA (parallel across keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark.functions.buckets import bucket_start


def incrby(increments: DataFrame, seq_col: str = "seq") -> DataFrame:
    """increments: (key, ts, value=delta, seq).  Returns the resulting
    samples: running sum of deltas per key in arrival order."""
    w = (
        Window.partitionBy("key")
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return increments.select(
        "key", "ts", F.sum("value").over(w).alias("value")
    )


def ts_del(
    samples: DataFrame, key: str, from_ts: int, to_ts: int
) -> tuple[DataFrame, DataFrame]:
    """Returns (surviving samples, deleted rows' bucket spine seed) —
    the deleted rows, so rule destinations can recompute affected buckets."""
    hit = (F.col("key") == key) & F.col("ts").between(from_ts, to_ts)
    return samples.filter(~hit), samples.filter(hit)


def affected_buckets(deleted: DataFrame, bucket_ms: int, align: int = 0) -> DataFrame:
    """Distinct (key, bucket) touched by a delete — the recompute set for a
    compaction rule (src/tsdb.c:622-660 SeriesCalcRange recompute)."""
    return deleted.select(
        "key", bucket_start(F.col("ts"), bucket_ms, align).alias("bucket")
    ).distinct()


def ignore_filter(
    samples: DataFrame, max_time_diff: int, max_val_diff: float
) -> DataFrame:
    """Sequentially drop near-identical consecutive samples per key
    (kept-sample semantics, src/module.c:986-998)."""
    if max_time_diff <= 0 and max_val_diff <= 0:
        # fast path: exact-consecutive-duplicate only comparison is still
        # sequential; fall through to the kernel for correctness
        pass

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        t = pdf["ts"].to_numpy(np.int64)
        v = pdf["value"].to_numpy(np.float64)
        keep = np.ones(len(t), dtype=bool)
        last_t, last_v = None, None
        for i in range(len(t)):
            if last_t is not None and (
                t[i] - last_t <= max_time_diff and abs(v[i] - last_v) <= max_val_diff
            ):
                keep[i] = False
            else:
                last_t, last_v = t[i], v[i]
        return pdf[keep]

    return samples.groupBy("key").applyInPandas(
        fn, samples.schema
    )


def ignore_filter_seeded(
    batch: DataFrame,
    seed: DataFrame,
    max_time_diff: int,
    max_val_diff: float,
) -> DataFrame:
    """Streaming-ingest IGNORE: like ignore_filter, but the per-key chain is
    seeded with the last *stored* sample (src/module.c:986-998 compares the
    incoming sample against series->lastTimestamp/lastValue), so the filter
    is continuous across micro-batches.  seed: (key, ts, value) one row per
    key; seed rows are not emitted."""
    b = batch.withColumn("__seed", F.lit(False))
    extra = [c for c in batch.columns if c not in ("key", "ts", "value")]
    s = seed.select(
        "key",
        "ts",
        "value",
        *[F.lit(None).cast(batch.schema[c].dataType).alias(c) for c in extra],
    ).withColumn("__seed", F.lit(True))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__seed", "ts"], ascending=[False, True])
        t = pdf["ts"].to_numpy(np.int64)
        v = pdf["value"].to_numpy(np.float64)
        seeded = pdf["__seed"].to_numpy(bool)
        keep = np.ones(len(t), dtype=bool)
        last_t, last_v = None, None
        for i in range(len(t)):
            if seeded[i]:
                last_t, last_v = t[i], v[i]
                keep[i] = False
                continue
            if last_t is not None and t[i] <= last_t:
                # ts <= lastTimestamp takes the upsert path, which the
                # ignore filter does not guard (src/module.c:1000-1023)
                continue
            if last_t is not None and (
                t[i] - last_t <= max_time_diff and abs(v[i] - last_v) <= max_val_diff
            ):
                keep[i] = False
            else:
                last_t, last_v = t[i], v[i]
        return pdf[keep]

    return (
        b.unionByName(s)
        .groupBy("key")
        .applyInPandas(fn, b.schema)
        .drop("__seed")
    )
