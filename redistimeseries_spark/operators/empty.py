"""EMPTY bucket generation (AGGREGATION ... EMPTY).

Reference (src/filter_iterator.c:389-443, 686-799):
  * gap buckets between the first and last sample-containing bucket are
    emitted; edge gaps (before the first / after the last sample in range)
    are NOT (src/filter_iterator.c:723-746);
  * a bucket whose samples are all NaN is treated as empty but still
    emitted in EMPTY mode with per-agg finalizeEmpty values
    (src/filter_iterator.c:394-401);
  * finalizeEmpty: 0 for sum / count / count_nan / count_all, NaN for the
    rest, except `last` = LOCF from the chronologically previous kept
    sample (src/filter_iterator.c:473-506) and `twa` = neighbor
    interpolation (operators/twa.py).

Spark shape: per-key bucket spine via sequence()/explode (bounded by the
observed first/last bucket, so generated rows ≈ range/dur per key, never
unbounded), left join of the aggregated rows, window LOCF for `last`.
The spine join is a shuffle on (key, bucket) that AQE coalesces; at 100 TB
the spine side is tiny relative to samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark.functions.aggs import empty_value, sanitize


def fill_empty_buckets(
    agg_df: DataFrame,
    samples_b: DataFrame,
    aggs: list[str],
    dur: int,
    align_ts: int,
    start: int,
    end: int,
) -> DataFrame:
    """agg_df: groupBy(key, __bucket) result incl. __n_valid (0 for NaN-only
    buckets); samples_b: the filtered samples with __bucket (drives the spine
    bounds, NaN rows included — a leading NaN-only bucket is still emitted)."""
    spine = (
        samples_b.groupBy("key")
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(dur).cast("long"))
            ).alias("__bucket"),
        )
    )
    joined = spine.join(agg_df, ["key", "__bucket"], "left")

    valid = F.col("__n_valid") > 0
    cols = []
    w = Window.partitionBy("key").orderBy("__bucket").rowsBetween(Window.unboundedPreceding, 0)
    for a in aggs:
        name = sanitize(a)
        if a == "twa":
            # twa column joined in range_query covers the whole spine
            cols.append(F.col(name))
        elif a == "last":
            locf = F.last(F.when(valid, F.col(name)), ignorenulls=True).over(w)
            cols.append(F.coalesce(locf, F.lit(float("nan"))).alias(name))
        elif a in ("count_nan", "count_all"):
            # these validate NaN samples (nanValueValid / allValueValid,
            # src/compaction.c:944-978): an only-NaN bucket reports its real
            # count, not finalizeEmpty 0 — only true gap rows fold to 0.
            cols.append(F.coalesce(F.col(name), F.lit(0.0)).alias(name))
        else:
            cols.append(
                F.when(valid, F.col(name)).otherwise(F.lit(empty_value(a))).alias(name)
            )
    return joined.select("key", "__bucket", *cols).withColumn("__n_valid", F.lit(1))
