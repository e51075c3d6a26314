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


def retention_clamp_per_key(samples: DataFrame, retentions: DataFrame) -> DataFrame:
    """Multi-series clamp: retentions is a (key, retention_ms) dimension —
    one row per series with retention > 0 (broadcast-sized; it is the
    series catalog).  Keys absent from it pass unclamped.  The horizon is
    per-key max(ts) - retention, exactly the reference's per-series
    lastTimestamp - retentionTime (src/tsdb.c:1367-1374) lifted to the
    multi-series pipeline."""
    hz = (
        samples.join(F.broadcast(retentions), "key")
        .groupBy("key")
        .agg(F.max("ts").alias("__mx"), F.first("retention_ms").alias("__r"))
        .select("key", (F.col("__mx") - F.col("__r")).alias("__horizon"))
    )
    return (
        samples.join(F.broadcast(hz), "key", "left")
        .filter(F.col("__horizon").isNull() | (F.col("ts") >= F.col("__horizon")))
        .drop("__horizon")
    )


def evict(
    spark,
    layout_path: str,
    retention_ms: int,
    time_bucket_ms: int = 86_400_000,
) -> dict:
    """Physical retention eviction over a `TSStore.write_layout` store —
    the batch analogue of the reference's SeriesTrim on chunk rollover
    (src/tsdb.c:207-239).  The global horizon is max(ts) - retention;
    whole `day=` partitions strictly older than the horizon's day are
    DROPPED (a directory delete, no data rewrite — the 100 TB shape),
    and only the single boundary partition is rewritten with its
    surviving suffix.  Returns {"dropped": [...], "horizon": ...}.

    Per-key horizons (the reference's per-series lastTimestamp) are a
    query-time concern handled by retention_clamp; the physical job uses
    the global horizon, which is safe (never drops data a per-key clamp
    would keep) when ingest rejects late-beyond-retention samples
    (reject_late)."""
    import os
    import shutil

    if retention_ms <= 0 or not os.path.isdir(layout_path):
        return {"dropped": [], "horizon": None}
    df = spark.read.parquet(layout_path)
    row = df.agg(F.max("ts").alias("m")).collect()[0]
    if row.m is None:
        return {"dropped": [], "horizon": None}
    horizon = row.m - retention_ms
    hday = horizon // time_bucket_ms
    dropped = []
    for entry in sorted(os.listdir(layout_path)):
        if not entry.startswith("day="):
            continue
        day = int(entry.split("=", 1)[1])
        if day < hday:
            shutil.rmtree(os.path.join(layout_path, entry))
            dropped.append(entry)
    # boundary partition: rewrite only its surviving suffix
    bdir = os.path.join(layout_path, f"day={hday}")
    if os.path.isdir(bdir):
        surviving = (
            spark.read.parquet(bdir)
            .filter(F.col("ts") >= horizon)
            .sortWithinPartitions("key", "ts")
        )
        tmp = bdir + ".tmp"
        surviving.coalesce(max(1, surviving.rdd.getNumPartitions() // 4)).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(bdir)
        os.rename(tmp, bdir)
    return {"dropped": dropped, "horizon": horizon}


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
