"""Resample a series onto a regular time grid — LOCF or linear
interpolation.

Beyond-reference operator (TimescaleDB's time_bucket_gapfill + locf /
interpolate made this the standard irregular-to-regular bridge; the
reference's EMPTY flag fills bucket AGGREGATES, not a sample grid): for
every key, emit one value per grid point `t = k * step_ms` within the
key's observed [min_ts, max_ts] span —

    locf:    value at t = value of the latest valid sample with ts <= t
    linear:  straight line between the bracketing valid samples
             (exactly the sample's value when one sits on the grid point)

Spark shape — no Python anywhere, SKEW-SAFE (late round 9; the
chunk-context discipline of smooth.ts_anomalies): the grid is a per-key
bounded `sequence()` (the EMPTY-spine discipline: never generate beyond
observed data), grid points UNION with the samples, and the bracketing
gathers run under (key, time-chunk) windows — a pathologically hot
series sorts in parallel across its time span instead of inside one
task.  Grid rows whose bracket lives outside their chunk take it from
the chunk-context frame: per-chunk first/last sample aggregates (one
sortless map-side aggregation) hang off the key's chunk spine, and one
growing-frame gather per direction hands every chunk its nearest
neighbors; a co-partitioned join patches the local nulls.  Both gather
directions are GROWING frames (`unboundedPreceding .. k`) — Spark
recomputes a shrinking `k .. unboundedFollowing` frame from scratch per
row, O(n^2) per partition (measured 143.9 s for ONE KEY at 100k rows
under the original phrasing) — the right-side gathers flip the sort
instead.  A coinciding sample orders BEFORE its grid point, so the
backward window already carries it and both methods return the sample
value exactly.  Duplicate (key, ts) samples resolve by the (ts, value)
last-wins rule (rate._last_pair): both brackets read the max-value
duplicate.  NaN samples are invalid everywhere (isValueValid) and are
dropped before any of this.

`_ts_resample_key_window` retains the bare-key-window plan as the
differential twin (fuzz-pinned equal under forced tiny chunks); the
`{p}resample` SQL TVF mirrors the twin's simpler shape — the facade is
the scale path (the ewma/holt TVF convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from redistimeseries_spark.materialize import materialize

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.filters import filter_valid_range

METHODS = ("locf", "linear")

# ~4.7 h of millis — the rate/smooth chunking constant: parallelism
# grows along a hot series' time span
RESAMPLE_CHUNK_MS = 1 << 24


def _grid_union(df: DataFrame, step_ms: int):
    """samples ∪ per-key grid rows (__s = 1 sample / 0 grid), with the
    key's observed bounds kept on the side for spine construction."""
    # materialized: the per-key bounds frame is catalog-bounded (one row
    # per key) but consumed twice (the grid explode here and the caller's
    # chunk spine) — each re-execution is a full base scan + hash agg
    # otherwise (re-aliased subtrees defeat exchange reuse).
    bounds = df.groupBy("key").agg(
        F.min("ts").alias("__lo"), F.max("ts").alias("__hi")
    ).transform(materialize, disk=False)
    g0 = (F.col("__lo") + step_ms - 1) - (F.col("__lo") + step_ms - 1) % step_ms
    g1 = F.col("__hi") - F.col("__hi") % step_ms
    grid = bounds.select(
        "key",
        F.explode(
            F.when(g0 <= g1, F.sequence(g0, g1, F.lit(step_ms))).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("ts"),
    )
    u = df.select(
        "key", "ts", "value", F.lit(1).alias("__s")
    ).unionByName(
        grid.select("key", "ts", F.lit(None).cast("double").alias("value"),
                    F.lit(0).alias("__s"))
    )
    return u, bounds


# shared validity/key/range pre-filter (functions/filters since round 10)
_filtered = filter_valid_range


def _resample_value(method: str):
    if method == "locf":
        return F.col("__pv")
    return (
        F.when(F.col("__pt") == F.col("ts"), F.col("__pv"))
        .when(
            F.col("__nt").isNull(), F.col("__pv")  # tail grid point ==
            # max_ts only when max_ts is ON the grid, handled above;
            # kept for safety
        )
        .otherwise(
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (F.col("ts") - F.col("__pt"))
            / (F.col("__nt") - F.col("__pt"))
        )
    )


def ts_resample(
    samples: DataFrame,
    step_ms: int,
    method: str = "linear",
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    chunk_ms: int = RESAMPLE_CHUNK_MS,
) -> DataFrame:
    """(key, ts, value) — one row per grid point; keys whose span contains
    no grid point (short series between two grid lines) emit nothing.
    See the module docstring for the chunk-local plan."""
    if step_ms <= 0:
        raise ValueError("step_ms must be positive")
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}")
    if chunk_ms <= 0:
        raise ValueError("chunk_ms must be positive")
    # materialized: the filtered frame feeds the bounds aggregate, the
    # grid union AND the chunk-context aggregate — three full scans
    # without it (plan-verified 4 base-table scans per query including
    # the bounds re-spine).  One narrow (key, ts, value) pass instead.
    df = materialize(_filtered(samples, keys, start, end))
    u, bounds = _grid_union(df, step_ms)
    c = (F.col("ts") - F.pmod(F.col("ts"), F.lit(chunk_ms))).alias("__c")
    u = u.select("key", "ts", "value", "__s", c)
    # chunk-LOCAL brackets; (ts, value) duplicate rule: the max-value
    # duplicate sorts last in both frames, so last() reads it
    wb = (
        Window.partitionBy("key", "__c")
        .orderBy("ts", F.col("__s").desc(), "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf_rev = (
        Window.partitionBy("key", "__c")
        .orderBy(F.col("ts").desc(), F.col("__s").asc(), F.col("value").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sample_ts = F.when(F.col("__s") == 1, F.col("ts"))
    e = u.select(
        "key",
        "ts",
        "__s",
        "__c",
        F.last("value", ignorenulls=True).over(wb).alias("__pv"),
        F.last(sample_ts, ignorenulls=True).over(wb).alias("__pt"),
        F.last("value", ignorenulls=True).over(wf_rev).alias("__nv"),
        F.last(sample_ts, ignorenulls=True).over(wf_rev).alias("__nt"),
    ).filter(F.col("__s") == 0)
    # chunk-context frame: per-chunk first/last sample (sortless map-side
    # aggregation over the raw samples — max/min of the (ts, value)
    # struct embeds the duplicate rule), hung on the key's full chunk
    # spine so runs of sample-free chunks still see their neighbors
    # duplicate-(key, ts) rule everywhere is (ts, value) LAST-wins: the
    # effective sample at any ts is its MAX-value duplicate.  __l's
    # struct-max embeds that for free (max ts, then max value); __f must
    # order (ts asc, value DESC) — a bare struct-min would hand the
    # next-bracket the min-value duplicate (round-9 ADVICE finding)
    pc = df.groupBy(
        "key", (F.col("ts") - F.pmod(F.col("ts"), F.lit(chunk_ms))).alias("__c")
    ).agg(
        F.min_by(
            F.struct("ts", "value"),
            F.struct(F.col("ts"), (-F.col("value")).alias("v")),
        ).alias("__f"),
        F.max(F.struct("ts", "value")).alias("__l"),
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.sequence(
                F.col("__lo") - F.pmod(F.col("__lo"), F.lit(chunk_ms)),
                F.col("__hi") - F.pmod(F.col("__hi"), F.lit(chunk_ms)),
                F.lit(chunk_ms),
            )
        ).alias("__c"),
    )
    wkb = (
        Window.partitionBy("key")
        .orderBy("__c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wkf_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("__c").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ctx = spine.join(pc, ["key", "__c"], "left").select(
        "key",
        "__c",
        F.last("__l", ignorenulls=True).over(wkb).alias("__prev"),
        F.last("__f", ignorenulls=True).over(wkf_rev).alias("__next"),
    )
    filled = e.join(ctx, ["key", "__c"], "left").select(
        "key",
        "ts",
        F.coalesce(F.col("__pv"), F.col("__prev.value")).alias("__pv"),
        F.coalesce(F.col("__pt"), F.col("__prev.ts")).alias("__pt"),
        F.coalesce(F.col("__nv"), F.col("__next.value")).alias("__nv"),
        F.coalesce(F.col("__nt"), F.col("__next.ts")).alias("__nt"),
    )
    return filled.select(
        "key", "ts", _resample_value(method).alias("value")
    ).orderBy("key", "ts")


def _ts_resample_key_window(
    samples: DataFrame,
    step_ms: int,
    method: str = "linear",
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """The pre-chunking plan — one bare-key window pass per direction
    (a hot series sorts its whole history + grid in one task).  Kept as
    the DIFFERENTIAL REFERENCE for the chunk-local `ts_resample` and the
    comparison arm of the hot-series probe; also the shape the
    `{p}resample` SQL TVF mirrors."""
    if step_ms <= 0:
        raise ValueError("step_ms must be positive")
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}")
    df = _filtered(samples, keys, start, end)
    u, _bounds = _grid_union(df, step_ms)
    # samples order BEFORE a coinciding grid point: the backward frame
    # then already contains them; (ts, value) duplicate rule as above
    wb = (
        Window.partitionBy("key")
        .orderBy("ts", F.col("__s").desc(), "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").desc(), F.col("__s").asc(), F.col("value").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sample_ts = F.when(F.col("__s") == 1, F.col("ts"))
    enriched = u.select(
        "key",
        "ts",
        "__s",
        F.last("value", ignorenulls=True).over(wb).alias("__pv"),
        F.last(sample_ts, ignorenulls=True).over(wb).alias("__pt"),
        F.last("value", ignorenulls=True).over(wf_rev).alias("__nv"),
        F.last(sample_ts, ignorenulls=True).over(wf_rev).alias("__nt"),
    ).filter(F.col("__s") == 0)
    return enriched.select(
        "key", "ts", _resample_value(method).alias("value")
    ).orderBy("key", "ts")
