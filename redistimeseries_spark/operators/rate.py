"""Counter rate / increase per time bucket — PromQL-style semantics.

Beyond-reference operator: the reference's aggregator set has nothing for
MONOTONE COUNTERS (request totals, bytes sent), where the meaningful
signal is the per-bucket increase with counter RESETS handled — a
restarted process restarts its counter at ~0, and a naive max-min or
last-first bucket aggregate reports a huge negative (or meaningless)
value at every restart.  Prometheus' rate()/increase() made the
reset-aware definition standard; this is the deterministic core of that
definition (no edge extrapolation — Prometheus' boundary heuristics are
estimation, not aggregation, and would break oracle exactness):

    increase(bucket) = sum over samples s in the bucket of
        s.value - prev.value   if s.value >= prev.value   (normal step)
        s.value                otherwise                  (reset: counter
                                                           restarted below
                                                           the previous
                                                           sample; the new
                                                           value is the
                                                           increase since)
    where prev is the key's immediately preceding valid sample
    (possibly in an earlier bucket); the key's first-ever sample has no
    prev and contributes nothing.

    rate(bucket) = increase(bucket) / (bucket_dur / 1000)   per second

Spark shape: identical to TWA's hot path — ONE lag window over
(key, ts) then ONE (key, bucket) aggregation; pure JVM expressions, no
Python.  Over the key-bucketed layout (store.write_bucketed_layout) the
window needs no exchange at all.  NaN samples are invalid everywhere
(isValueValid) and are skipped entirely: the delta chain links the valid
samples around them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.buckets import bucket_start, resolve_align


def ts_increase(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
    per_second: bool = False,
) -> DataFrame:
    """(key, ts, increase | rate) — reset-aware counter increase per
    (key, bucket); ts is the bucket start.  Buckets whose samples are all
    first-in-series (no prev) or all-NaN are not emitted.

    The lag runs over the FULL per-key history before the time-range cut,
    so a bucket boundary never fabricates a reset: the first sample in
    the range still sees its true predecessor."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    df = samples
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    df = df.filter(~F.isnan("value"))
    w = Window.partitionBy("key").orderBy("ts")
    prev = F.lag("value").over(w)
    step = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col("value") >= prev, F.col("value") - prev).otherwise(
            F.col("value")
        )
    )
    align_ts = resolve_align(align, start, end)
    d = df.select(
        "key",
        "ts",
        step.alias("__step"),
        bucket_start(F.col("ts"), bucket_dur, align_ts).alias("__b"),
    )
    if start > MIN_TS:
        d = d.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        d = d.filter(F.col("ts") <= F.lit(end))
    out = (
        d.groupBy("key", "__b")
        .agg(
            F.sum("__step").alias("__inc"),
            F.count("__step").alias("__n"),
        )
        .filter(F.col("__n") > 0)
    )
    val = (
        (F.col("__inc") / F.lit(bucket_dur / 1000.0)).alias("rate")
        if per_second
        else F.col("__inc").alias("increase")
    )
    return out.select("key", F.col("__b").alias("ts"), val).orderBy("key", "ts")


def ts_rate(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, rate) — per-second reset-aware counter rate per bucket."""
    return ts_increase(
        samples, bucket_dur, keys, start, end, align, per_second=True
    )


def ts_deriv(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, slope) — per-(key, bucket) least-squares slope of value
    over time, in value-units per SECOND; ts is the bucket start.  The
    gauge-trend companion to ts_increase (PromQL's deriv() made
    per-window simple linear regression the standard trend signal; the
    reference's aggregator set, src/compaction.c, has nothing for it).

    Buckets that cannot define a slope — fewer than two valid samples,
    or all samples at one timestamp — are not emitted (regr_slope is
    NULL there; the nv-rule analogue).  NaN samples are invalid
    everywhere (isValueValid) and are dropped first.

    Spark shape: ONE projection + ONE (key, bucket) hash aggregation
    (partial/final regr_slope), no window, no Python — cheaper than the
    TWA plan.  The regression abscissa is centered per bucket
    ((ts - bucket_start) / 1000) so the moment sums stay at
    bucket-width magnitude instead of epoch-millisecond magnitude —
    slope is shift-invariant, the floating-point moments are not."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    align_ts = resolve_align(align, start, end)
    b = bucket_start(F.col("ts"), bucket_dur, align_ts)
    d = df.select(
        "key",
        b.alias("__b"),
        ((F.col("ts") - b) / F.lit(1000.0)).alias("__x"),
        "value",
    )
    return (
        d.groupBy("key", "__b")
        .agg(F.regr_slope("value", "__x").alias("slope"))
        .filter(F.col("slope").isNotNull())
        .select("key", F.col("__b").alias("ts"), "slope")
        .orderBy("key", "ts")
    )


def _event_counts(
    samples: DataFrame,
    bucket_dur: int,
    event,
    keys: list[str] | str | None,
    start: int,
    end: int,
    align,
    out_col: str,
) -> DataFrame:
    """Shared core for ts_changes / ts_resets: one full-history lag
    window over (key, ts), an event indicator against the previous valid
    sample, then ONE (key, bucket) count aggregation — the ts_increase
    plan exactly (exchange-free over the bucketed layout).  `event` maps
    (value, prev) -> boolean Column.  Buckets emit when at least one
    sample there HAS a predecessor (the event count may then be 0);
    first-ever samples contribute nothing, mirroring ts_increase."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    df = samples
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    df = df.filter(~F.isnan("value"))
    w = Window.partitionBy("key").orderBy("ts")
    prev = F.lag("value").over(w)
    ind = F.when(prev.isNull(), F.lit(None).cast("int")).otherwise(
        event(F.col("value"), prev).cast("int")
    )
    align_ts = resolve_align(align, start, end)
    d = df.select(
        "key",
        "ts",
        ind.alias("__e"),
        bucket_start(F.col("ts"), bucket_dur, align_ts).alias("__b"),
    )
    if start > MIN_TS:
        d = d.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        d = d.filter(F.col("ts") <= F.lit(end))
    return (
        d.groupBy("key", "__b")
        .agg(F.sum("__e").alias("__s"), F.count("__e").alias("__n"))
        .filter(F.col("__n") > 0)
        .select("key", F.col("__b").alias("ts"), F.col("__s").alias(out_col))
        .orderBy("key", "ts")
    )


def ts_changes(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, changes) — how many times the value CHANGED between
    consecutive valid samples, per (key, bucket); ts is the bucket start
    (the deterministic per-bucket form of PromQL changes(), the
    liveness/flappiness signal for gauges that encode state).  A sample
    counts as a change when its value differs from the key's immediately
    preceding valid sample (possibly in an earlier bucket — the chain is
    full-history, so bucket boundaries never fabricate or swallow a
    change).  NaN samples are invalid everywhere (isValueValid,
    src/tsdb.c) and are skipped; first-ever samples have no predecessor
    and contribute nothing.  Buckets where no sample has a predecessor
    are not emitted; buckets whose samples all repeat the previous value
    emit changes = 0."""
    return _event_counts(
        samples,
        bucket_dur,
        lambda v, p: v != p,
        keys,
        start,
        end,
        align,
        "changes",
    )


def ts_resets(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, resets) — counter-reset count per (key, bucket): samples
    whose value DROPPED below the key's previous valid sample (PromQL
    resets(); the restart/crash counter for monotone counters, and the
    audit companion to ts_increase's reset-aware sum).  Chain, NaN, and
    emission semantics are exactly ts_changes' (full-history lag; emit
    when any sample has a predecessor, count may be 0)."""
    return _event_counts(
        samples,
        bucket_dur,
        lambda v, p: v < p,
        keys,
        start,
        end,
        align,
        "resets",
    )


def ts_predict_linear(
    samples: DataFrame,
    bucket_dur: int,
    horizon_ms: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, predicted) — least-squares extrapolation per
    (key, bucket): the fitted line's value `horizon_ms` AFTER THE BUCKET
    END (PromQL predict_linear(), the disk-full/quota-breach
    forecasting primitive; ts is the bucket start).  Exactly ts_deriv's
    fit — same centered abscissa ((ts - bucket_start)/1000 seconds, so
    the float moment sums stay at bucket-width magnitude) with the
    intercept kept:

        predicted = intercept + slope * (bucket_dur + horizon_ms)/1000

    Buckets that cannot define a line (fewer than two valid samples, or
    all samples at one timestamp) are not emitted, the ts_deriv rule.
    NaN samples are invalid everywhere and are dropped first.

    Spark shape: ONE projection + ONE (key, bucket) hash aggregation
    (partial/final regr_slope + regr_intercept) — no window, no Python,
    no second pass for the intercept."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    if horizon_ms < 0:
        raise ValueError("horizon_ms must be non-negative")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    align_ts = resolve_align(align, start, end)
    b = bucket_start(F.col("ts"), bucket_dur, align_ts)
    d = df.select(
        "key",
        b.alias("__b"),
        ((F.col("ts") - b) / F.lit(1000.0)).alias("__x"),
        "value",
    )
    xp = F.lit((bucket_dur + horizon_ms) / 1000.0)
    return (
        d.groupBy("key", "__b")
        .agg(
            F.regr_slope("value", "__x").alias("__m"),
            F.regr_intercept("value", "__x").alias("__c"),
        )
        .filter(F.col("__m").isNotNull())
        .select(
            "key",
            F.col("__b").alias("ts"),
            (F.col("__c") + F.col("__m") * xp).alias("predicted"),
        )
        .orderBy("key", "ts")
    )


def ts_gaps(
    samples: DataFrame,
    min_gap_ms: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, gap_start, gap_end, gap_ms) — sampling gaps longer than
    `min_gap_ms` per series: every consecutive-sample interval whose
    span exceeds the threshold (gap_start/gap_end are the bracketing
    sample timestamps).  The missing-data report an SLO/ops review runs;
    the reference's INFO exposes only totalSamples, not where the holes
    are.

    One lag window over (key, ts) then a filter — pure JVM, the
    counter-rate plan shape.  NaN samples still COUNT as samples here
    (the device reported, the value was bad — that is not a collection
    gap)."""
    if min_gap_ms <= 0:
        raise ValueError("min_gap_ms must be positive")
    df = samples
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    w = Window.partitionBy("key").orderBy("ts")
    prev = F.lag("ts").over(w)
    return (
        df.select("key", prev.alias("gap_start"), F.col("ts").alias("gap_end"))
        .filter(
            F.col("gap_start").isNotNull()
            & (F.col("gap_end") - F.col("gap_start") > min_gap_ms)
        )
        .select(
            "key",
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start")).alias("gap_ms"),
        )
        .orderBy("key", "gap_start")
    )


def ts_delta(
    samples: DataFrame,
    bucket_dur: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    align="0",
) -> DataFrame:
    """(key, ts, delta) — last valid value minus first valid value per
    (key, bucket); ts is the bucket start (the deterministic per-bucket
    core of PromQL delta(), the gauge-difference companion to
    ts_increase — NOT reset-aware: gauges go down legitimately.  PromQL's
    boundary extrapolation is estimation and would break oracle
    exactness, the ts_increase precedent).  Buckets with fewer than two
    valid samples are not emitted (no difference is defined — PromQL's
    two-point minimum); NaN samples are invalid everywhere and are
    dropped first.

    Spark shape: ONE projection + ONE (key, bucket) hash aggregation
    (max_by/min_by partial/final) — no window at all, the cheapest plan
    class in the family (value_hist's)."""
    if bucket_dur <= 0:
        raise ValueError("bucket_dur must be positive")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    align_ts = resolve_align(align, start, end)
    b = bucket_start(F.col("ts"), bucket_dur, align_ts)
    return (
        df.select("key", b.alias("__b"), "ts", "value")
        .groupBy("key", "__b")
        .agg(
            (F.max_by("value", "ts") - F.min_by("value", "ts")).alias("delta"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 2)
        .select("key", F.col("__b").alias("ts"), "delta")
        .orderBy("key", "ts")
    )


def ts_idelta(
    samples: DataFrame,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, idelta) — difference between the LAST TWO valid samples
    of the range per key, reported at the last sample's ts (PromQL
    idelta: the spot gauge movement; ts_irate's non-reset-aware gauge
    sibling).  Keys with fewer than two valid samples emit nothing.
    Same plan as ts_irate: one lag window + one per-key keep-last
    filter, exchange-free over the bucketed layout."""
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    w = Window.partitionBy("key").orderBy("ts")
    prev_v = F.lag("value").over(w)
    d = df.select(
        "key",
        "ts",
        (F.col("value") - prev_v).alias("idelta"),
        F.max("ts").over(Window.partitionBy("key")).alias("__mx"),
    )
    return (
        d.filter((F.col("ts") == F.col("__mx")) & F.col("idelta").isNotNull())
        .select("key", "ts", "idelta")
        .orderBy("key")
    )


def ts_irate(
    samples: DataFrame,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, irate) — instantaneous per-second rate from the LAST TWO
    valid samples of the range per key (PromQL irate: the spot rate a
    dashboard's "current QPS" tile wants, where ts_rate would average the
    whole bucket).  Reset-aware like ts_increase: a drop means the
    counter restarted and the new value IS the increase.  Keys with
    fewer than two valid samples in range emit nothing.

    One lag window + one per-key keep-last filter (max ts), pure JVM —
    and over the bucketed layout the window needs no exchange, like
    every operator in this family."""
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    w = Window.partitionBy("key").orderBy("ts")
    prev_v, prev_t = F.lag("value").over(w), F.lag("ts").over(w)
    step = F.when(F.col("value") >= prev_v, F.col("value") - prev_v).otherwise(
        F.col("value")
    )
    d = df.select(
        "key",
        "ts",
        (step / ((F.col("ts") - prev_t) / F.lit(1000.0))).alias("irate"),
        F.max("ts").over(Window.partitionBy("key")).alias("__mx"),
    )
    return (
        d.filter((F.col("ts") == F.col("__mx")) & F.col("irate").isNotNull())
        .select("key", "ts", "irate")
        .orderBy("key")
    )
