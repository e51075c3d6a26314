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

Spark shape — no Python anywhere: the grid is a per-key bounded
`sequence()` (the EMPTY-spine discipline: never generate beyond observed
data), grid points UNION with the samples, and ONE window pass per
direction (`last(..., ignorenulls)` looking back, `first(...,
ignorenulls)` looking forward) attaches the bracketing samples to every
grid row.  A coinciding sample orders BEFORE its grid point, so the
backward window already carries it and both methods return the sample
value exactly.  NaN samples are invalid everywhere (isValueValid) and
are dropped before any of this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS

METHODS = ("locf", "linear")


def ts_resample(
    samples: DataFrame,
    step_ms: int,
    method: str = "linear",
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, value) — one row per grid point; keys whose span contains
    no grid point (short series between two grid lines) emit nothing."""
    if step_ms <= 0:
        raise ValueError("step_ms must be positive")
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    bounds = df.groupBy("key").agg(
        F.min("ts").alias("__lo"), F.max("ts").alias("__hi")
    )
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
    # samples order BEFORE a coinciding grid point: the backward frame
    # then already contains them
    wb = (
        Window.partitionBy("key")
        .orderBy("ts", F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward gather runs as a GROWING frame under the REVERSED sort:
    # Spark evaluates a growing frame incrementally but recomputes a
    # shrinking `rowsBetween(0, unboundedFollowing)` frame from scratch
    # per row — O(n^2) per key, a hot-series funnel (measured 52 s for a
    # 27.8k-row frame on the TWA spine before the same fix).  last()
    # over (ts DESC, __s ASC) up to the current row sees exactly the
    # rows the forward frame saw, nearest-first.
    wf_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").desc(), F.col("__s").asc())
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
    if method == "locf":
        val = F.col("__pv")
    else:
        val = (
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
    return enriched.select("key", "ts", val.alias("value")).orderBy("key", "ts")
