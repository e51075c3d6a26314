"""Structured Streaming ingestion — TS.ADD/TS.MADD as a stream.

Reference write path (src/module.c:1000-1055, SURVEY §3.2): per sample —
retention reject -> ignore filter -> dup-policy upsert/append -> per-rule
compaction context update -> signal blocked readers.

Spark shape: `readStream -> foreachBatch(StreamingStore.process_batch)`.
The store is an append-only parquet log with a monotonically increasing
`seq` per row (arrival order).  Duplicate policy is folded at read time
(merge-on-read; resolve_duplicates is associative per the pairwise C
semantics), and `compact()` rewrites the log into resolved form — the
LSM-style equivalent of Delta `MERGE INTO`, which is the drop-in
replacement when a transactional table format is available.  Per batch the
store also maintains:

  * a `latest` table (one row per key — the reference's O(1)
    lastTimestamp/lastValue, src/tsdb.h:69-70), rewritten per batch from
    old-latest ∪ batch (tiny: |keys| rows);
  * each compaction rule's dest table, recomputing ONLY the (key, bucket)
    pairs the batch touched (src/tsdb.c:622-660 SeriesCalcRange recompute)
    — out-of-order and in-bucket upserts repair the right buckets.

At 100 TB scale: the log partitions by arrival day; the dest recompute
reads only the touched source buckets (ts-range pruned scan); `latest` and
rule dests are small enough to broadcast.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redistimeseries_spark.functions.buckets import bucket_start
from redistimeseries_spark.streaming.compaction import CompactionRule
from redistimeseries_spark.functions.aggs import agg_expr
from redistimeseries_spark.write.dup_policy import resolve_duplicates

# page size for reads with no explicit max_count — TS.READ is a cursor
# protocol, so a cap is a page boundary, not a truncation
DEFAULT_READ_CAP = 10_000

SAMPLES_SCHEMA = "key string, ts long, value double"

# physical partitioning of the maintained tables: `latest` is hash-bucketed
# by key, rule dests are day-partitioned by bucket ts — so a micro-batch
# rewrites only the partitions its keys/buckets fall in (dynamic partition
# overwrite), never the whole table.  Delta MERGE is the managed drop-in;
# this is the same access pattern on raw parquet.
LATEST_BUCKETS = 64
DAY_MS = 86_400_000


def _pk(col):
    return F.pmod(F.hash(col), F.lit(LATEST_BUCKETS))


@dataclass
class StreamingStore:
    spark: SparkSession
    root: str
    duplicate_policy: str = "last"
    rules: list[CompactionRule] = field(default_factory=list)
    retention_ms: int = 0  # late-beyond-retention reject (src/module.c:1006-1012)
    # IGNORE ingest dedup (src/module.c:986-998); active only under DP_LAST,
    # chained across micro-batches by seeding with the latest table
    ignore_max_time_diff: int = 0
    ignore_max_val_diff: float = 0.0
    _batch_id: int = 0

    @property
    def log_dir(self):
        return os.path.join(self.root, "samples_log")

    @property
    def latest_dir(self):
        return os.path.join(self.root, "latest")

    @property
    def errors_dir(self):
        return os.path.join(self.root, "errors")

    def rule_dir(self, rule: CompactionRule):
        return os.path.join(self.root, f"rule{rule.dest_suffix}")

    def _read(self, path, schema) -> DataFrame:
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(
            self.spark.createDataFrame([], schema).schema
        ).parquet(path)

    def _raw(self, path, partition_col: str) -> DataFrame:
        """Read a partitioned maintained table WITH its partition column
        (discovered from the directory layout), empty-safe."""
        if not os.path.isdir(path):
            return self.spark.createDataFrame(
                [], SAMPLES_SCHEMA + f", {partition_col} int"
            )
        return self.spark.read.parquet(path)

    # ---- the foreachBatch body ------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int):
        spark = self.spark
        batch = batch.select("key", "ts", "value").withColumn(
            "seq",
            F.lit(batch_id * 1_000_000_000) + F.monotonically_increasing_id(),
        )
        batch.persist()
        # 0. reject samples older than the retention horizon (the reference
        # errors the write, src/module.c:1006-1012) -> error sink
        if self.retention_ms > 0:
            from redistimeseries_spark.write.retention import reject_late

            cur_max = self.latest().select("key", F.col("ts").alias("max_ts"))
            batch, late = reject_late(batch, cur_max, self.retention_ms)
            late.write.mode("append").parquet(self.errors_dir)
        # 0.5 IGNORE near-duplicate dedup, seeded with the stored last sample
        # so the kept-chain is continuous across batches; dropped samples are
        # silently ignored (the reference replies lastTimestamp, no error)
        if self.duplicate_policy == "last" and (
            self.ignore_max_time_diff > 0 or self.ignore_max_val_diff > 0
        ):
            from redistimeseries_spark.write.mutate import ignore_filter_seeded

            batch = ignore_filter_seeded(
                batch,
                self.latest(),
                self.ignore_max_time_diff,
                self.ignore_max_val_diff,
            ).persist()
        # 1. append to the log (arrival order preserved via seq)
        batch.write.mode("append").parquet(self.log_dir)
        # 2. latest table: PARTITION-SCOPED upsert.  Only the <=64 hash
        # buckets containing this batch's keys are read (static partition
        # pruning via the isin literal), merged with the batch, and
        # dynamically overwritten — at 100M keys the other buckets are
        # never touched, instead of the previous full-table rewrite+swap.
        pks = [
            r.pk for r in batch.select(_pk(F.col("key")).alias("pk")).distinct().collect()
        ]
        old = self._raw(self.latest_dir, partition_col="pk")
        new_latest = (
            old.filter(F.col("pk").isin(pks))
            .select("key", "ts", "value")
            .unionByName(batch.select("key", "ts", "value"))
            .groupBy("key")
            .agg(F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value"))
        )
        (
            new_latest.withColumn("pk", _pk(F.col("key")))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pk")
            .parquet(self.latest_dir)
        )
        # 3. per-rule dest recompute, touched buckets only
        for rule in self.rules:
            touched = (
                batch.select(
                    "key",
                    bucket_start(F.col("ts"), rule.bucket_ms, rule.align_ts).alias("__bucket"),
                )
                .distinct()
            )
            if rule.agg == "twa":
                # a sample in bucket B also changes the boundary
                # interpolation of B-1 and B+1 (twaAddBucketParams,
                # src/module.c:943-958) — widen the repair set one bucket
                # each way, then recompute from the full per-key series so
                # the kernel sees its neighbor samples.
                touched = (
                    touched.select(
                        "key",
                        F.explode(
                            F.array(
                                F.col("__bucket") - rule.bucket_ms,
                                F.col("__bucket"),
                                F.col("__bucket") + rule.bucket_ms,
                            )
                        ).alias("__bucket"),
                    )
                    .filter(F.col("__bucket") >= 0)
                    .distinct()
                )
            src = self.samples()  # resolved view incl. this batch
            if rule.agg == "twa":
                from redistimeseries_spark import MAX_TS, MIN_TS
                from redistimeseries_spark.operators.twa import twa_buckets

                per_key = src.join(
                    F.broadcast(touched.select("key").distinct()), "key", "left_semi"
                ).withColumn(
                    "__bucket", bucket_start(F.col("ts"), rule.bucket_ms, rule.align_ts)
                )
                recomputed = (
                    twa_buckets(per_key, rule.bucket_ms, rule.align_ts, MIN_TS, MAX_TS)
                    .withColumnRenamed("twa", "value")
                    .join(F.broadcast(touched), ["key", "__bucket"], "left_semi")
                )
            else:
                recomputed = (
                    src.withColumn(
                        "__bucket", bucket_start(F.col("ts"), rule.bucket_ms, rule.align_ts)
                    )
                    .join(F.broadcast(touched), ["key", "__bucket"], "left_semi")
                    .groupBy("key", "__bucket")
                    .agg(agg_expr(rule.agg, F.col("value"), F.col("ts"), alias="value"))
                )
            # PARTITION-SCOPED dest upsert: dests are day-partitioned by
            # bucket ts; a micro-batch's touched buckets cluster in recent
            # days, so only those day partitions are read (isin pruning),
            # repaired, and dynamically overwritten — historical days are
            # never rewritten.
            days = [
                r.d
                for r in touched.select(
                    F.expr(f"__bucket div {DAY_MS}").alias("d")
                ).distinct().collect()
            ]
            old_dest = self._raw(self.rule_dir(rule), partition_col="__day")
            kept = (
                old_dest.filter(F.col("__day").isin(days))
                .select("key", "ts", "value")
                .join(
                    F.broadcast(touched.withColumnRenamed("__bucket", "ts")),
                    ["key", "ts"],
                    "left_anti",
                )
            )
            new_part = kept.unionByName(
                recomputed.select("key", F.col("__bucket").alias("ts"), "value")
            )
            (
                new_part.withColumn("__day", F.expr(f"ts div {DAY_MS}"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__day")
                .parquet(self.rule_dir(rule))
            )
        batch.unpersist()
        self._batch_id = batch_id

    @staticmethod
    def _swap(tmp: str, final: str):
        import shutil

        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    # ---- read views ------------------------------------------------------
    def samples(self) -> DataFrame:
        """Merge-on-read view with duplicate policy folded."""
        log = self._read(self.log_dir, SAMPLES_SCHEMA + ", seq long")
        return resolve_duplicates(log, self.duplicate_policy)

    def latest(self) -> DataFrame:
        return self._raw(self.latest_dir, "pk").select("key", "ts", "value")

    def rule_table(self, rule: CompactionRule, include_open: bool = False) -> DataFrame:
        """Closed-bucket dest view; include_open=True is the LATEST view."""
        df = self._raw(self.rule_dir(rule), "__day").select("key", "ts", "value")
        if include_open:
            return df
        opens = self.latest().select(
            "key", bucket_start(F.col("ts"), rule.bucket_ms, rule.align_ts).alias("__open")
        )
        return (
            df.join(F.broadcast(opens), "key", "left")
            .filter(F.col("ts") < F.col("__open"))
            .drop("__open")
        )

    def compact(self):
        """Rewrite the log in resolved form (the periodic MERGE job)."""
        resolved = self.samples().withColumn("seq", F.lit(0).cast("long"))
        tmp = self.log_dir + ".tmp"
        resolved.write.mode("overwrite").parquet(tmp)
        self._swap(tmp, self.log_dir)


def start_ingest(
    stream: DataFrame, store: StreamingStore, checkpoint: str | None = None, **trigger
):
    """Attach the store to a streaming DataFrame (file/rate/kafka source).
    trigger: e.g. availableNow=True (drain, for tests/backfill) or
    processingTime='5 seconds'."""
    q = (
        stream.writeStream.foreachBatch(store.process_batch)
        .option(
            "checkpointLocation",
            checkpoint or os.path.join(store.root, "_checkpoint"),
        )
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return q


def tail_read(
    store: StreamingStore,
    key: str,
    cursor: int = 0,
    min_count: int = 1,
    max_count: int | None = None,
    timeout_s: float = 5.0,
    poll_s: float = 0.25,
):
    """TS.READ BLOCK analogue (src/module.c:1889-2130): wait until at least
    `min_count` samples with ts >= cursor exist for `key`, polling the
    store's micro-batch output; on timeout flush whatever qualifies
    (possibly empty).  Returns (rows, next_cursor)."""
    deadline = time.monotonic() + timeout_s
    # never an unbounded collect in a poll loop: a lagging cursor would
    # re-materialize the whole suffix every poll_s; the cap bounds each
    # poll and the advancing cursor lets callers drain in pages
    cap = max(min_count, max_count or DEFAULT_READ_CAP)
    while True:
        rows = (
            store.samples()
            .filter((F.col("key") == key) & (F.col("ts") >= cursor))
            .orderBy("ts")
            .take(cap)
        )
        if len(rows) >= min_count or time.monotonic() >= deadline:
            out = [(r.ts, r.value) for r in rows]
            return out, (out[-1][0] + 1 if out else cursor)
        time.sleep(poll_s)
