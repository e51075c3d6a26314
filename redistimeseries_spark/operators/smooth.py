"""Per-series smoothing — EWMA, Holt double-exponential, LTTB, anomalies.

Beyond-reference operator (the reference has no smoothing aggregator;
EWMA is the standard dashboard/alerting smoother).  The recurrence

    y_0 = x_0;   y_t = alpha * x_t + (1 - alpha) * y_{t-1}

is inherently sequential per key — exactly the class of semantics this
repo routes to a vectorized Arrow kernel (the IGNORE kept-chain / TWA
EMPTY precedent): applyInPandas per key, pandas' C-implemented
`ewm(alpha, adjust=False)` evaluating the same recurrence, no per-row
Python.  NaN samples are invalid everywhere (isValueValid) and are
dropped before smoothing — the chain links valid samples.

Scale shape: one shuffle on key (none over the key-bucketed layout),
each task smooths whole series sequentially — the reference's
chunk-iterator access pattern.  Per-key state is O(1); only the Arrow
batch bounds per-task memory.  The DuckDB oracle replays the recurrence
with a recursive CTE, so the operator is hash-gated despite being
non-relational.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS

EWMA_SCHEMA = "key string, ts long, ewma double"
LTTB_SCHEMA = "key string, ts long, value double"
HOLT_SCHEMA = "key string, ts long, level double, trend double"


def ts_anomalies(
    samples: DataFrame,
    window_n: int = 20,
    z: float = 3.0,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
    flag_only: bool = False,
) -> DataFrame:
    """(key, ts, value, mean, std, zscore, anomaly) — rolling z-score
    outlier detection per series: each sample is compared against the
    mean/stddev of its `window_n` PRECEDING valid samples (the sample
    itself excluded, so an outlier cannot vote itself normal).  The first
    window_n samples of a series and samples whose window has zero
    variance get zscore NULL / anomaly false — there is no baseline to
    deviate from.

    Pure window expressions (avg/stddev_samp over ROWS BETWEEN n
    PRECEDING AND 1 PRECEDING): one key-partitioned sort, no Python —
    over the key-bucketed layout the window needs no exchange.  NaN
    samples are invalid everywhere and dropped first.  `flag_only=True`
    keeps just the anomalous rows (the alerting consumer's shape)."""
    if window_n < 2:
        raise ValueError("window_n must be >= 2")
    if z <= 0:
        raise ValueError("z must be positive")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("key")
        .orderBy("ts")
        .rowsBetween(-window_n, -1)
    )
    n_prev = F.count("value").over(w)
    mean = F.avg("value").over(w)
    std = F.stddev_samp("value").over(w)
    zscore = F.when(
        (n_prev >= window_n) & (std > 0),
        (F.col("value") - mean) / std,
    )
    out = df.select(
        "key",
        "ts",
        "value",
        F.when(n_prev >= window_n, mean).alias("mean"),
        F.when(n_prev >= window_n, std).alias("std"),
        zscore.alias("zscore"),
        F.coalesce(F.abs(zscore) > z, F.lit(False)).alias("anomaly"),
    )
    return out.filter("anomaly") if flag_only else out


def ts_lttb(
    samples: DataFrame,
    threshold: int,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, value) — largest-triangle-three-buckets downsampling to
    at most `threshold` points per series (Steinarsson's LTTB, the
    standard visualization decimator: picks, per bucket, the point that
    maximizes the triangle area with the previously kept point and the
    next bucket's centroid; first/last points always kept).

    Sequential per key (each pick depends on the previous) — the same
    Arrow applyInPandas route as ts_ewma; the per-bucket area computation
    is vectorized numpy, the Python loop is O(threshold) per series.  NaN
    samples are dropped first (a NaN coordinate would poison every area).
    No SQL oracle exists for this pick order — covered by a pure-Python
    reference implementation in tests instead (the persisted-IVF
    precedent for non-relational operators)."""
    import numpy as np

    if threshold < 3:
        raise ValueError("threshold must be >= 3 (first + last + 1 bucket)")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))

    def decimate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        if n <= threshold:
            return pdf[["key", "ts", "value"]]
        t = pdf["ts"].to_numpy(dtype=np.float64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        # bucket boundaries over the middle n-2 points
        edges = np.linspace(1, n - 1, threshold - 1).astype(np.int64)
        keep = [0]
        a = 0  # index of the previously kept point
        for i in range(threshold - 2):
            lo, hi = edges[i], edges[i + 1]
            nlo, nhi = (hi, edges[i + 2]) if i + 2 < len(edges) else (hi, n)
            cx, cy = t[nlo:nhi].mean() if nhi > nlo else t[-1], (
                v[nlo:nhi].mean() if nhi > nlo else v[-1]
            )
            # area of triangle (a, candidate, next-bucket centroid)
            area = np.abs(
                (t[a] - cx) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (cy - v[a])
            )
            a = lo + int(np.argmax(area))
            keep.append(a)
        keep.append(n - 1)
        out = pdf.iloc[keep]
        return out[["key", "ts", "value"]]

    return (
        df.select("key", "ts", "value")
        .groupBy("key")
        .applyInPandas(decimate, LTTB_SCHEMA)
    )


def ts_holt(
    samples: DataFrame,
    alpha: float,
    beta: float,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, level, trend) — Holt double-exponential smoothing per
    series: EWMA that tracks a TREND, so ramping series are smoothed
    without the systematic lag single EWMA has (the form PromQL
    standardized as holt_winters / double_exponential_smoothing):

        level_0 = x_0            trend_0 = x_1 - x_0
        level_t = alpha * x_t + (1 - alpha) * (level_{t-1} + trend_{t-1})
        trend_t = beta * (level_t - level_{t-1}) + (1 - beta) * trend_{t-1}

    One row per valid sample; `level + trend` is the one-step forecast.
    The trend seed needs two points, so series with fewer than two valid
    samples in range emit nothing (PromQL's two-point minimum).  NaN
    samples are invalid everywhere and are dropped first; the time cut
    applies BEFORE smoothing (the caller's window restarts the fit),
    both matching ts_ewma and the oracle.

    Sequential per key like ts_ewma, via the same Arrow applyInPandas
    route; the coupled two-state recurrence has no pandas C kernel, so
    the kernel is a tight O(1)-per-row numpy scalar loop (the next-fit
    packing precedent).  The DuckDB oracle replays (level, trend) with a
    recursive CTE, so the operator is hash-gated despite being
    non-relational."""
    import numpy as np

    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if not 0 < beta <= 1:
        raise ValueError("beta must be in (0, 1]")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"key": [], "ts": [], "level": [], "trend": []}
            ).astype({"key": str, "ts": "int64", "level": float, "trend": float})
        x = pdf["value"].to_numpy(dtype=np.float64)
        level = np.empty(n)
        trend = np.empty(n)
        level[0], trend[0] = x[0], x[1] - x[0]
        for i in range(1, n):
            level[i] = alpha * x[i] + (1 - alpha) * (level[i - 1] + trend[i - 1])
            trend[i] = (
                beta * (level[i] - level[i - 1]) + (1 - beta) * trend[i - 1]
            )
        return pd.DataFrame(
            {"key": pdf["key"], "ts": pdf["ts"], "level": level, "trend": trend}
        )

    return (
        df.select("key", "ts", "value")
        .groupBy("key")
        .applyInPandas(smooth, HOLT_SCHEMA)
    )


def ts_ewma(
    samples: DataFrame,
    alpha: float,
    keys: list[str] | str | None = None,
    start: int = MIN_TS,
    end: int = MAX_TS,
) -> DataFrame:
    """(key, ts, ewma) — one smoothed row per valid sample.  The time cut
    applies BEFORE smoothing (the smoothed series restarts at the range
    start — the window the caller asked to smooth), matching the oracle.
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    df = samples.filter(~F.isnan("value"))
    if keys is not None:
        klist = [keys] if isinstance(keys, str) else list(keys)
        df = df.filter(F.col("key").isin(klist))
    if start > MIN_TS:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end < MAX_TS:
        df = df.filter(F.col("ts") <= F.lit(end))

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "ts": pdf["ts"],
                "ewma": pdf["value"].ewm(alpha=alpha, adjust=False).mean(),
            }
        )

    return (
        df.select("key", "ts", "value")
        .groupBy("key")
        .applyInPandas(smooth, EWMA_SCHEMA)
    )
