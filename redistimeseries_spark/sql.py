"""SQL surface: expose the store as Spark SQL views plus engine scalar
helpers as SQL UDFs, so the whole query surface is reachable from
`spark.sql(...)` (SURVEY §2.10: the reference's command vocabulary is
closed; ours is that vocabulary *plus* full SQL).

The scalar functions are declarative SQL UDFs (CREATE FUNCTION ... RETURN
<expr>), which Catalyst inlines into the calling plan — they stay inside
whole-stage codegen, unlike Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from redistimeseries_spark.store import TSStore

# bucket(ts) = ts - ((ts - align) mod dur), clamped >= 0
# (CalcBucketStart, src/tsdb.h:88-99)
_TS_BUCKET_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION ts_bucket(ts BIGINT, dur BIGINT, align BIGINT)
RETURNS BIGINT
RETURN greatest(ts - pmod(ts - align, dur), 0)
"""

# reported bucket ts under BUCKETTIMESTAMP -/~/+
# (src/filter_iterator.c:42-55)
_TS_REPORT_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION ts_bucket_report(b BIGINT, dur BIGINT, mode STRING)
RETURNS BIGINT
RETURN CASE mode WHEN '~' THEN b + dur DIV 2 WHEN '+' THEN b + dur ELSE b END
"""


def register_sql(spark: SparkSession, store: TSStore, prefix: str = "ts_") -> None:
    """Create temp views `<prefix>samples` / `<prefix>labels` and the
    ts_bucket / ts_bucket_report SQL functions in the session catalog."""
    store.samples.createOrReplaceTempView(f"{prefix}samples")
    store.labels.createOrReplaceTempView(f"{prefix}labels")
    spark.sql(_TS_BUCKET_SQL)
    spark.sql(_TS_REPORT_SQL)
