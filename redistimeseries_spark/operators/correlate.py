"""Cross-series analytics — pairwise correlation and CUSUM change
detection.

Beyond-reference operators (the reference's aggregator vocabulary,
src/compaction.c, is strictly per-series): the two standard questions a
metrics fleet asks ACROSS samples that no per-series aggregator answers —
"do these two series move together?" (`ts_corr`) and "has this series
drifted from its baseline?" (`ts_cusum`, the classical tabular CUSUM of
Page's sequential test, the textbook change-point detector).

Spark shapes:

- `ts_corr` is the bucketed-aggregation class (ts_deriv's): one tiny
  broadcast of the requested pairs, one co-partitioned (key, ts)
  equi-join to align the two legs, one (pair, bucket) hash aggregation
  (partial/final `corr`).  Pairs are EXPLICIT by design — all-pairs
  discovery over a fleet is quadratic and belongs to the LSH/ANN family
  (pipeline/similarity), not a relational aggregate.
- `ts_cusum`'s recurrence s_i = max(0, s_{i-1} + d_i) looks sequential
  but closes over prefix sums: s_i = S_i - min(0, min_{j<=i} S_j) with
  S = cumsum(d), so it is two GROWING-frame window aggregates (Spark
  evaluates growing frames incrementally) — and the cumsum/running-min
  pair composes across (key, time-chunk) exactly like batch incrby
  (write/mutate.py): per-chunk totals and prefix minima fold on the
  one-row-per-chunk frame, so a pathologically hot series parallelizes
  across its time span.  `_ts_cusum_sequential` retains the literal
  max(0, prev + d) pandas replay as the differential twin (fuzz-pinned
  at 1e-9); the DuckDB oracle replays the recurrence with a recursive
  CTE, so the gate checks an INDEPENDENT formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.buckets import bucket_start, resolve_align
from redistimeseries_spark.functions.filters import filter_valid_range

# the rate/smooth/incrby time-chunk constant (~4.7 h of millis)
CUSUM_CHUNK_MS = 1 << 24

CUSUM_SCHEMA = (
    "key string, ts long, value double, s_pos double, s_neg double,"
    " alarm boolean"
)


# shared validity/key/range pre-filter (functions/filters since round 10)
_filtered = filter_valid_range


def ts_corr(
    samples: DataFrame,
    bucket_dur: int,
    pairs: list[tuple[str, str]],
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """(key_a, key_b, ts, corr, n) — per-bucket Pearson correlation
    between each requested (key_a, key_b) pair.  By default samples
    match at IDENTICAL timestamps (the aligned-cadence convention;
    resample irregular series onto a grid first — operators/resample);
    `tolerance_ms` switches to AS-OF matching for irregular cadences:
    each a-sample pairs with b's latest sample at-or-before it and at
    most tolerance_ms older (asof.ts_asof_join's union-window — one
    sort per pair, no range-join explosion; note the direction is
    asymmetric, a leads).  `ts` is the bucket start; `n` counts the
    matched sample pairs.  Buckets where the correlation is undefined —
    fewer than two matched pairs, or zero variance on either leg — are
    not emitted.  NaN samples are invalid everywhere and are dropped
    first; duplicate (key, ts) rows fold to the (ts, value) last-wins
    effective sample BEFORE matching (a raw join would cross-product
    them)."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    if not pairs:
        raise ValueError("pairs must be a non-empty list of (key_a, key_b)")
    if tolerance_ms is not None and tolerance_ms < 0:
        raise ValueError("tolerance_ms must be >= 0")
    spark = samples.sparkSession
    # dedupe the request: a duplicated (key_a, key_b) entry would join
    # every a-sample twice, doubling the reported n per bucket
    # (round-10 ADVICE finding; corr itself is ratio-invariant)
    pdf = spark.createDataFrame(
        sorted({(a, b) for a, b in pairs}), "key_a string, key_b string"
    )
    all_keys = sorted({k for p in pairs for k in p})
    d = (
        _filtered(samples, all_keys, start, end)
        .groupBy("key", "ts")
        .agg(F.max("value").alias("value"))
    )
    align_ts = resolve_align(align, start, end)
    a = d.join(
        F.broadcast(pdf), d["key"] == pdf["key_a"]
    ).select("key_a", "key_b", "ts", F.col("value").alias("__va"))
    if tolerance_ms is None:
        m = a.join(
            d.select(
                F.col("key").alias("key_b"), "ts",
                F.col("value").alias("__vb"),
            ),
            ["key_b", "ts"],
        )
    else:
        # as-of matching: union both legs per pair, carry b's latest
        # (ts, value) forward under one (pair)-partitioned window — b
        # sorts before a at equal ts, so a coinciding sample matches
        b_side = d.join(
            F.broadcast(pdf), d["key"] == pdf["key_b"]
        ).select(
            "key_a", "key_b", "ts",
            F.lit(None).cast("double").alias("__va"),
            F.lit(0).alias("__side"),
            F.col("ts").alias("__bt"),
            F.col("value").alias("__bv"),
        )
        a_side = a.select(
            "key_a", "key_b", "ts", "__va",
            F.lit(1).alias("__side"),
            F.lit(None).cast("long").alias("__bt"),
            F.lit(None).cast("double").alias("__bv"),
        )
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy("ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        m = (
            a_side.unionByName(b_side)
            .select(
                "key_a", "key_b", "ts", "__va", "__side",
                F.last("__bt", ignorenulls=True).over(w).alias("__mt"),
                F.last("__bv", ignorenulls=True).over(w).alias("__vb"),
            )
            .filter(
                (F.col("__side") == 1)
                & F.col("__mt").isNotNull()
                & (F.col("ts") - F.col("__mt") <= tolerance_ms)
            )
        )
    # Pearson from guarded moment components (covar / stddev product)
    # instead of corr(): a zero-variance leg raises DIVIDE_BY_ZERO under
    # ANSI mode inside the aggregate; here the F.when guard skips the
    # division and the undefined bucket is filtered, matching the
    # corr-IS-NULL convention of the SQL oracles
    corr = F.when(
        (F.col("__sa") > 0) & (F.col("__sb") > 0),
        F.col("__cov") / (F.col("__sa") * F.col("__sb")),
    )
    out = (
        m.groupBy(
            "key_a",
            "key_b",
            bucket_start(F.col("ts"), bucket_dur, align_ts).alias("__b"),
        )
        .agg(
            F.covar_samp("__va", "__vb").alias("__cov"),
            F.stddev_samp("__va").alias("__sa"),
            F.stddev_samp("__vb").alias("__sb"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "key_a", "key_b", F.col("__b").alias("ts"),
            corr.alias("corr"), "n",
        )
        .filter(F.col("corr").isNotNull() & ~F.isnan("corr"))
        .orderBy("key_a", "key_b", "ts")
    )
    return out


def ts_xcorr(
    samples: DataFrame,
    pairs: list[tuple[str, str]],
    lags: list[int],
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key_a, key_b, lag, corr, n) — sample cross-correlation of each
    requested (key_a, key_b) pair at each requested lag (ms):

        r(L) = corr( a(t), b(t + L) )     over matched timestamps t

    so a POSITIVE lag measures how well `a` LEADS `b` by L ms (b's
    sample L ms later), a negative lag how well it trails.  Samples
    match at exact shifted timestamps — the aligned-cadence convention
    of `ts_corr` (resample irregular series onto a grid first); `lag`
    values should be multiples of that grid step or nothing matches.
    One row per (pair, lag) whose correlation is defined (>= 2 matched
    sample pairs with variance on both legs); undefined lags are not
    emitted.  Both legs are range-filtered to [start, end] BEFORE
    shifting, so the matched support at lag L is the overlap of a's
    range with b's range shifted by -L.  NaN samples are invalid
    everywhere and dropped first; duplicate (key, ts) rows fold to the
    (ts, value) last-wins effective sample before matching.

    The standard lead/lag discovery sweep on top is `ts_lead_lag`.

    Spark shape (the ts_corr bucketed-aggregation class, with the lag
    axis in place of the bucket axis): one broadcast of pairs, one
    broadcast-explode of the lag vector over the b leg only (|b| x
    |lags| rows, lags capped at 128 — the FILTER_BY_TS bound), one
    co-partitioned (key_a, key_b, ts) equi-join, one hash aggregation
    of guarded Pearson moment components per (pair, lag).  No windows,
    no Python."""
    if not pairs:
        raise ValueError("pairs must be a non-empty list of (key_a, key_b)")
    if not lags:
        raise ValueError("lags must be a non-empty list of millisecond offsets")
    lag_list = sorted({int(x) for x in lags})
    if len(lag_list) > 128:
        raise ValueError("at most 128 distinct lags per call")
    spark = samples.sparkSession
    pdf = spark.createDataFrame(
        sorted({(a, b) for a, b in pairs}), "key_a string, key_b string"
    )
    all_keys = sorted({k for p in pairs for k in p})
    d = (
        _filtered(samples, all_keys, start, end)
        .groupBy("key", "ts")
        .agg(F.max("value").alias("value"))
    )
    a = d.join(
        F.broadcast(pdf), d["key"] == pdf["key_a"]
    ).select("key_a", "key_b", "ts", F.col("value").alias("__va"))
    # b leg replicated per lag, timestamps shifted BACK by the lag so
    # the match is a plain equi-join on (pair, ts): b(t + L) sits at t
    lag_col = F.explode(
        F.array(*[F.lit(x).cast("long") for x in lag_list])
    ).alias("lag")
    b = (
        d.join(F.broadcast(pdf), d["key"] == pdf["key_b"])
        .select(
            "key_a", "key_b", "ts", F.col("value").alias("__vb"), lag_col
        )
        .withColumn("ts", F.col("ts") - F.col("lag"))
    )
    m = a.join(b, ["key_a", "key_b", "ts"])
    corr = F.when(
        (F.col("__sa") > 0) & (F.col("__sb") > 0),
        F.col("__cov") / (F.col("__sa") * F.col("__sb")),
    )
    return (
        m.groupBy("key_a", "key_b", "lag")
        .agg(
            F.covar_samp("__va", "__vb").alias("__cov"),
            F.stddev_samp("__va").alias("__sa"),
            F.stddev_samp("__vb").alias("__sb"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("key_a", "key_b", "lag", corr.alias("corr"), "n")
        .filter(F.col("corr").isNotNull() & ~F.isnan("corr"))
        .orderBy("key_a", "key_b", "lag")
    )


def ts_lead_lag(
    samples: DataFrame,
    pairs: list[tuple[str, str]],
    lags: list[int],
    start: int = MIN_TS,
    end: int = MAX_TS,
    min_n: int = 2,
) -> DataFrame:
    """(key_a, key_b, lag, corr, n) — the STRONGEST lag per pair from a
    `ts_xcorr` sweep: the lag maximizing |corr| (sign-agnostic — a
    strong anticorrelation is as much of a lead/lag relationship as a
    positive one), ties broken toward the smaller |lag| then the
    smaller lag (prefer the most parsimonious shift, deterministic).
    Strengths compare at 9dp: a perfectly collinear pair reads
    |corr| = 1 at EVERY lag up to float noise in the moment
    arithmetic, and without the tolerance the argmax lands on
    whichever lag's last ulp came out largest — an artifact, not a
    lead (the emitted corr stays full precision).
    `min_n` drops thin lags (few matched pairs correlate spuriously)
    before the argmax; pairs with no qualifying lag are not emitted.

    One `max_by` over a struct ordering on top of the xcorr hash
    aggregate — no extra shuffle beyond xcorr's own (the pair axis is
    already the grouping key)."""
    if min_n < 2:
        raise ValueError("min_n must be >= 2 (corr is undefined below)")
    x = ts_xcorr(samples, pairs, lags, start, end).filter(
        F.col("n") >= min_n
    )
    best = F.max_by(
        F.struct("lag", "corr", "n"),
        F.struct(
            F.round(F.abs("corr"), 9).alias("s"),
            (-F.abs("lag")).alias("al"),
            (-F.col("lag")).alias("l"),
        ),
    ).alias("__b")
    return (
        x.groupBy("key_a", "key_b")
        .agg(best)
        .select(
            "key_a",
            "key_b",
            F.col("__b.lag").alias("lag"),
            F.col("__b.corr").alias("corr"),
            F.col("__b.n").alias("n"),
        )
        .orderBy("key_a", "key_b")
    )


def _cusum_input(samples, k, keys, start, end, target):
    """Shared ts_cusum prep: valid in-range rows with the per-key (or
    literal) target joined and both drift increments projected."""
    df = _filtered(samples, keys, start, end)
    if target is None:
        mu = df.groupBy("key").agg(F.avg("value").alias("__mu"))
        df = df.join(mu, "key")
    else:
        df = df.withColumn("__mu", F.lit(float(target)))
    return df.select(
        "key",
        "ts",
        "value",
        (F.col("value") - F.col("__mu") - F.lit(k)).alias("__dp"),
        (F.col("__mu") - F.col("value") - F.lit(k)).alias("__dn"),
    )


def ts_cusum(
    samples: DataFrame,
    k: float,
    h: float,
    target: float | None = None,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    chunk_ms: int = CUSUM_CHUNK_MS,
) -> DataFrame:
    """(key, ts, value, s_pos, s_neg, alarm) — two-sided tabular CUSUM
    per series: with drift increments d+ = (x - target) - k and
    d- = (target - x) - k (k = the slack, in value units),

        s+_i = max(0, s+_{i-1} + d+_i)      (upward drift)
        s-_i = max(0, s-_{i-1} + d-_i)      (downward drift)

    and `alarm` when either statistic exceeds the threshold `h` (no
    post-alarm reset — the pure accumulating form; slice the input at a
    confirmed change to restart).  `target=None` uses each key's mean
    of the valid in-range samples (the self-baselining form); pass the
    process target for the control-chart form.  NaN samples are invalid
    everywhere and are dropped first; duplicate (key, ts) rows order
    deterministically by (ts, value).

    SKEW-SAFE plan (see module docstring): the max-recurrence closes to
    S - min(0, running_min(S)) over prefix sums, computed chunk-locally
    with per-chunk (total, prefix-min) folds stitched on the per-key
    chunk frame — the incrby/sessionize discipline; no Python, no
    sliding frames, all growing windows."""
    if k < 0:
        raise ValueError("k (slack) must be >= 0")
    if h <= 0:
        raise ValueError("h (threshold) must be positive")
    if chunk_ms <= 0:
        raise ValueError("chunk_ms must be positive")
    d = _cusum_input(samples, k, keys, start, end, target).withColumn(
        "__c", F.col("ts") - F.pmod(F.col("ts"), F.lit(chunk_ms))
    )
    wo = Window.partitionBy("key", "__c").orderBy("ts", "value")
    wg = wo.rowsBetween(Window.unboundedPreceding, 0)
    # in-chunk prefix sums and their running minima (growing frames —
    # incremental evaluation)
    e = d.select(
        "key", "ts", "value", "__c", "__dp", "__dn",
        F.sum("__dp").over(wg).alias("__lsp"),
        F.sum("__dn").over(wg).alias("__lsn"),
    ).select(
        "key", "ts", "value", "__c", "__dp", "__dn", "__lsp", "__lsn",
        F.min("__lsp").over(wg).alias("__lmp"),
        F.min("__lsn").over(wg).alias("__lmn"),
    )
    # per-chunk folds: total drift and in-chunk prefix minimum
    pc = e.groupBy("key", "__c").agg(
        F.sum("__dp").alias("__tp"),
        F.sum("__dn").alias("__tn"),
        F.min("__lsp").alias("__mp"),
        F.min("__lsn").alias("__mn"),
    )
    wk = Window.partitionBy("key").orderBy("__c")
    prev = wk.rowsBetween(Window.unboundedPreceding, -1)
    base_p = F.coalesce(F.sum("__tp").over(prev), F.lit(0.0))
    base_n = F.coalesce(F.sum("__tn").over(prev), F.lit(0.0))
    ctx = pc.select(
        "key", "__c", "__mp", "__mn",
        base_p.alias("__bp"),
        base_n.alias("__bn"),
    ).select(
        "key", "__c", "__bp", "__bn",
        # running min of the GLOBAL prefix sums over previous chunks:
        # chunk j's in-chunk minimum shifted by its entry base (NULL for
        # a key's first chunk — least() below skips nulls)
        F.min(F.col("__bp") + F.col("__mp")).over(prev).alias("__gp"),
        F.min(F.col("__bn") + F.col("__mn")).over(prev).alias("__gn"),
    )
    j = e.join(ctx, ["key", "__c"])
    # global prefix sum S_i = base + local prefix; global running min =
    # min(previous chunks' min, base + in-chunk running min); then the
    # closed form s_i = S_i - min(0, runmin_i)
    s_pos = (F.col("__bp") + F.col("__lsp")) - F.least(
        F.lit(0.0), F.col("__gp"), F.col("__bp") + F.col("__lmp")
    )
    s_neg = (F.col("__bn") + F.col("__lsn")) - F.least(
        F.lit(0.0), F.col("__gn"), F.col("__bn") + F.col("__lmn")
    )
    return j.select(
        "key",
        "ts",
        "value",
        s_pos.alias("s_pos"),
        s_neg.alias("s_neg"),
        ((s_pos > h) | (s_neg > h)).alias("alarm"),
    ).orderBy("key", "ts")


def _ts_cusum_sequential(
    samples: DataFrame,
    k: float,
    h: float,
    target: float | None = None,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """The literal max(0, prev + d) replay — one applyInPandas per BARE
    key.  Kept as the DIFFERENTIAL REFERENCE for the chunk-local
    `ts_cusum` (fuzz-pinned within 1e-9) and the comparison arm of the
    hot-series probe."""
    if k < 0:
        raise ValueError("k (slack) must be >= 0")
    if h <= 0:
        raise ValueError("h (threshold) must be positive")
    d = _cusum_input(samples, k, keys, start, end, target)

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "value"]).reset_index(drop=True)
        dp = pdf["__dp"].to_numpy(np.float64)
        dn = pdf["__dn"].to_numpy(np.float64)
        sp = np.empty(len(pdf))
        sn = np.empty(len(pdf))
        p = n = 0.0
        for i in range(len(pdf)):
            p = max(0.0, p + dp[i])
            n = max(0.0, n + dn[i])
            sp[i], sn[i] = p, n
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "ts": pdf["ts"],
                "value": pdf["value"],
                "s_pos": sp,
                "s_neg": sn,
                "alarm": (sp > h) | (sn > h),
            }
        )

    return d.groupBy("key").applyInPandas(replay, CUSUM_SCHEMA)
