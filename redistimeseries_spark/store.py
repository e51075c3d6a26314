"""TSStore — the engine's dataset handle: samples + labels + catalog.

The driver's `events` table maps onto the reference's samples model
(FIXTURES.md): one time series per `key = event_type || '_' || user_id % K`,
`ts` = epoch milliseconds, `value` = value.  Labels derived per key:
type / user_bucket / parity.

At scale the samples table would be a Parquet/Delta table written sorted by
(key, ts) — file-level min/max stats then prune time ranges exactly like the
reference's chunk index (src/tsdb.c:242-246 big-endian first-ts keying).
`TSStore.write_layout` materializes that layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USER_BUCKETS = 10


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read driver testdata parquet.  Timestamp physical types have varied
    across driver generations (TIMESTAMP(NANOS) → long nanos via the legacy
    conf; TIMESTAMP(MICROS) without tz → TIMESTAMP_NTZ).  Session timezone
    is pinned to UTC so NTZ wall-clock values convert to the same instants
    DuckDB's epoch_ms computes on naive timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(path)


def epoch_ms(df: DataFrame, col: str = "ts"):
    """Column expression converting `col` to epoch milliseconds, robust to
    the dtype the parquet reader produced: bigint (legacy nanos), timestamp,
    or timestamp_ntz (interpreted as UTC — session tz is pinned by
    read_parquet, matching DuckDB `epoch_ms` on naive timestamps)."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.expr(f"{col} div 1000000")
    return F.expr(f"unix_micros(cast({col} AS timestamp)) div 1000")

# DuckDB-side CTE producing the identical samples/labels views, used by
# __spark_entry__.oracle_sql() so Spark and the oracle read the same model.
SAMPLES_SQL = f"""
samples AS (
  SELECT event_type || '_' || CAST(user_id % {USER_BUCKETS} AS VARCHAR) AS key,
         CAST(epoch_ms(ts) AS BIGINT) AS ts,
         value
  FROM events
)
""".strip()

LABELS_SQL = f"""
keyset AS (
  SELECT DISTINCT
         event_type || '_' || CAST(user_id % {USER_BUCKETS} AS VARCHAR) AS key,
         event_type AS type,
         CAST(user_id % {USER_BUCKETS} AS VARCHAR) AS user_bucket,
         CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
  FROM events
),
labels AS (
  SELECT key, 'type' AS label, type AS value FROM keyset
  UNION ALL SELECT key, 'user_bucket', user_bucket FROM keyset
  UNION ALL SELECT key, 'parity', parity FROM keyset
)
""".strip()

ORACLE_PREFIX = f"WITH {SAMPLES_SQL},\n{LABELS_SQL}"


@dataclass
class TSStore:
    samples: DataFrame  # (key string, ts long epoch-ms, value double)
    labels: DataFrame  # (key string, label string, value string)

    @classmethod
    def from_events(cls, spark: SparkSession, sf_dir: str) -> "TSStore":
        ev = read_parquet(spark, f"{sf_dir}/events.parquet")
        key = F.concat_ws("_", "event_type", (F.col("user_id") % USER_BUCKETS).cast("string"))
        samples = ev.select(
            key.alias("key"),
            epoch_ms(ev).alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
        keys = ev.select(
            key.alias("key"),
            F.col("event_type").alias("type"),
            (F.col("user_id") % USER_BUCKETS).cast("string").alias("user_bucket"),
            F.when(F.col("user_id") % 2 == 0, F.lit("even")).otherwise("odd").alias("parity"),
        ).distinct()
        labels = (
            keys.selectExpr("key", "stack(3, 'type', type, 'user_bucket', user_bucket, 'parity', parity) AS (label, value)")
        )
        # the labels dimension is a catalog table in a real deployment (one
        # row per series per label, << samples); cache it so repeated label
        # predicates don't re-scan the fact table deriving it
        labels = labels.cache()
        return cls(samples=samples, labels=labels)

    @classmethod
    def from_dataframes(cls, samples: DataFrame, labels: DataFrame | None = None) -> "TSStore":
        if labels is None:
            labels = samples.sparkSession.createDataFrame([], "key string, label string, value string")
        return cls(samples=samples, labels=labels)

    def write_layout(self, path: str, time_bucket_ms: int = 86_400_000) -> None:
        """Materialize the scale layout: partitioned by time bucket, sorted by
        (key, ts) within files so parquet stats prune both dimensions."""
        (
            self.samples.withColumn(
                "day", F.expr(f"ts div {time_bucket_ms}")
            )
            .repartition("day")
            .sortWithinPartitions("key", "ts")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )

    def write_bucketed_layout(
        self, name: str, path: str, n_buckets: int = 64
    ) -> None:
        """Materialize the key-bucketed, (key, ts)-sorted layout: every
        series lives wholly in one bucket (the reference's series-per-shard
        invariant, SURVEY §3.3), so `groupBy(key, ...)` aggregations and
        `Window.partitionBy(key)` operators read pre-clustered, pre-sorted
        data — no hash exchange before partial aggregation, no sort before
        windows.  Trade-off (measured, BASELINE.md): scan-bound aggregations
        lose day-pruning and small-file locality, window-bound operators
        (TWA) halve.  On a real cluster the avoided exchange is network, not
        memory, so the balance shifts further toward bucketing."""
        (
            self.samples.write.bucketBy(n_buckets, "key")
            .sortBy("key", "ts")
            .option("path", path)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )


def read_bucketed_layout(
    spark: SparkSession, name: str, path: str, n_buckets: int = 64
) -> DataFrame:
    """Open a write_bucketed_layout store, re-registering the external
    bucketed table when the (session-scoped) catalog doesn't know it —
    bucketing metadata lives in the catalog, not the files, so a fresh
    session must re-declare CLUSTERED BY for Spark to exploit the layout."""
    if not spark.catalog.tableExists(name):
        spark.sql(
            f"CREATE TABLE {name} (key STRING, ts BIGINT, value DOUBLE) "
            f"USING parquet CLUSTERED BY (key) SORTED BY (key, ts) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
    return spark.table(name).select("key", "ts", "value")


def read_layout(
    spark: SparkSession,
    path: str,
    start: int | None = None,
    end: int | None = None,
    time_bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Open a write_layout store with the time-range predicate REWRITTEN to
    also hit the partition column: `ts BETWEEN` alone only prunes row
    groups; the derived `day` conjunct prunes whole directory partitions
    (PartitionFilters) — the reference's chunk-index seek at file-system
    granularity (src/series_iterator.c:40-56)."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(
            (F.col("day") >= start // time_bucket_ms) & (F.col("ts") >= start)
        )
    if end is not None:
        df = df.filter((F.col("day") <= end // time_bucket_ms) & (F.col("ts") <= end))
    return df.select("key", "ts", "value")
