"""Per-series feature extraction — the fleet-triage operator.

Beyond-reference: the reference's vocabulary (src/compaction.c
aggregators, src/query_language.c range options) describes ONE series
at a time; a 500k-series fleet at 100 TB first needs a cheap per-key
summary to decide which series deserve the expensive operators
(decompose, holt_winters, anomaly monitors) and which are flat noise.
`ts_features` computes the standard time-series feature vector of the
tsfeatures/catch22 tradition — volume, moments, linear trend, lag-1
autocorrelation, mean-crossing rate, flatness, spikiness — one row per
key, directly usable for clustering, routing, or quality triage.

All features are computed on the regular bucket grid (per-bucket
averages over OBSERVED buckets — the ts_acf convention: empty buckets
are absent, not zero; consecutive-bucket features only pair buckets
exactly one `bucket_dur` apart, so gaps shrink the pair count instead
of fabricating adjacency across them).

Spark shape: one (key, bucket) hash aggregation is the only per-sample
stage; then one exchange of the grid on `key` feeds a single window
pass (per-key mean / min-bucket via unbounded frames, next-bucket via
lead — all #buckets-bounded per key) and one final per-key hash
aggregation.  No joins, no Python, nothing scales with a key's sample
count past the first aggregation — a hot series costs by its time
span (the decompose/acf plan class).

Trend runs on the bucket INDEX (b - min(b)) / dur — exact small
integers, the ts_detect_period discipline: an OLS on raw epoch millis
cancels catastrophically at 1e12 (PLANS.md round-11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.buckets import bucket_start, resolve_align
from redistimeseries_spark.functions.filters import filter_valid_range


def ts_features(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """One feature row per key (keys with >= 1 observed bucket):

    - ``n_samples`` — valid (non-NaN, in-range) raw samples
    - ``n_buckets`` — observed grid buckets
    - ``mean`` / ``std`` / ``vmin`` / ``vmax`` — moments of the gridded
      series (``std`` is the sample stddev, NULL at one bucket)
    - ``cv`` — coefficient of variation std / \\|mean\\| (NULL when the
      mean is 0 or std undefined)
    - ``trend_slope`` / ``trend_r2`` — OLS of the gridded value on the
      bucket index (slope in value-units per bucket; NULL under 2
      buckets; r2 additionally NULL for a constant series — the
      Syy = 0 edge is engine-dependent, so it is defined away like
      corr's)
    - ``acf1`` — lag-1 autocorrelation over consecutive observed
      buckets (identical pair set to ``ts_acf`` at lag 1; NULL when
      either leg is constant or under 2 pairs)
    - ``crossing_rate`` — fraction of consecutive-bucket pairs that
      STRICTLY cross the key's grid mean (sign product < 0; touching
      the mean exactly is not a crossing); NULL with no pairs
    - ``flat_rate`` — fraction of consecutive-bucket pairs with exactly
      equal values; NULL with no pairs
    - ``spikiness`` — max \\|v - mean\\| / std, the largest absolute
      z-score on the grid (NULL when std is 0 or undefined)
    """
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    dur = int(bucket_dur)
    align_ts = resolve_align(align, start, end)
    g = (
        filter_valid_range(samples, keys, start, end)
        .groupBy(
            "key",
            bucket_start(F.col("ts"), dur, align_ts).alias("__b"),
        )
        .agg(F.avg("value").alias("__v"), F.count(F.lit(1)).alias("__c"))
    )
    # both window specs share the (key, __b) sort order so the two
    # Window nodes reuse ONE grid sort (an unordered partition-frame
    # spec would plan a second key-only Sort)
    wo = Window.partitionBy("key").orderBy("__b")
    wp = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = (
        g.withColumn("__mu", F.avg("__v").over(wp))
        .withColumn("__minb", F.min("__b").over(wp))
        .withColumn("__vn", F.lead("__v").over(wo))
        .withColumn("__bn", F.lead("__b").over(wo))
    )
    d = d.withColumn(
        "__x", ((F.col("__b") - F.col("__minb")) / F.lit(dur)).cast("double")
    ).withColumn(
        "__adj",
        F.coalesce(F.col("__bn") == F.col("__b") + F.lit(dur), F.lit(False)),
    )
    adj = F.col("__adj")
    va = F.when(adj, F.col("__v"))
    vb = F.when(adj, F.col("__vn"))
    one = F.lit(1)
    zero = F.lit(0)
    a = d.groupBy("key").agg(
        F.sum("__c").alias("n_samples"),
        F.count(one).alias("n_buckets"),
        F.avg("__v").alias("mean"),
        F.stddev_samp("__v").alias("std"),
        F.min("__v").alias("vmin"),
        F.max("__v").alias("vmax"),
        F.regr_slope(F.col("__v"), F.col("__x")).alias("__sl"),
        F.regr_r2(F.col("__v"), F.col("__x")).alias("__r2"),
        F.covar_samp(va, vb).alias("__cov"),
        F.stddev_samp(va).alias("__sa"),
        F.stddev_samp(vb).alias("__sb"),
        F.sum(F.when(adj, one).otherwise(zero)).alias("__adjn"),
        F.sum(
            F.when(
                adj
                & (
                    (F.col("__v") - F.col("__mu"))
                    * (F.col("__vn") - F.col("__mu"))
                    < 0
                ),
                one,
            ).otherwise(zero)
        ).alias("__cross"),
        F.sum(
            F.when(adj & (F.col("__vn") == F.col("__v")), one).otherwise(zero)
        ).alias("__flat"),
        F.max(F.abs(F.col("__v") - F.col("__mu"))).alias("__maxdev"),
    )
    adjn = F.col("__adjn")
    return (
        a.select(
            "key",
            "n_samples",
            "n_buckets",
            "mean",
            "std",
            F.when(
                F.col("std").isNotNull() & (F.col("mean") != 0),
                F.col("std") / F.abs(F.col("mean")),
            ).alias("cv"),
            "vmin",
            "vmax",
            F.col("__sl").alias("trend_slope"),
            # r2 of a CONSTANT series is an engine-dependent edge
            # (Postgres/Spark return 1.0 when Syy = 0, other engines
            # NaN/NULL) — define it NULL there, like corr
            F.when(F.col("std") > 0, F.col("__r2")).alias("trend_r2"),
            F.when(
                (F.col("__sa") > 0) & (F.col("__sb") > 0),
                F.col("__cov") / (F.col("__sa") * F.col("__sb")),
            ).alias("acf1"),
            F.when(adjn > 0, F.col("__cross") / adjn).alias("crossing_rate"),
            F.when(adjn > 0, F.col("__flat") / adjn).alias("flat_rate"),
            F.when(F.col("std") > 0, F.col("__maxdev") / F.col("std")).alias(
                "spikiness"
            ),
        )
        .orderBy("key")
    )
