"""ts_decompose — classical additive seasonal decomposition.

Planted linear-plus-seasonal series recover their parts EXACTLY (a
centered MA of a linear trend is the trend; an aligned seasonal summing
to zero vanishes from every full window), for both the odd-period MA
and the even-period 2x-MA; gaps null the trend exactly where the window
is incomplete; NaN samples are invalid; the DuckDB twin of the gate
query lives in __spark_entry__.py.
"""

from __future__ import annotations

import math

import pytest

from redistimeseries_spark.operators.decompose import ts_decompose

NAN = float("nan")


def _rows_for(season, slope, n, step=1000, key="a"):
    p = len(season)
    return [
        (key, i * step, slope * i + season[i % p]) for i in range(n)
    ]


def _collect(df):
    return {
        (r.key, r.ts): (r.value, r.trend, r.seasonal, r.resid)
        for r in df.collect()
    }


def test_even_period_exact_recovery(spark):
    season = [2.0, -1.0, 0.0, -1.0]  # sums to 0 -> centered == itself
    rows = _rows_for(season, 0.5, 24)
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
        )
    )
    assert len(out) == 24
    for (k, ts), (v, tr, se, re) in out.items():
        i = ts // 1000
        assert v == pytest.approx(0.5 * i + season[i % 4])
        assert se == pytest.approx(season[i % 4], abs=1e-9)
        if 2 <= i <= 21:  # full +-2 window present
            assert tr == pytest.approx(0.5 * i, abs=1e-9), i
            assert re == pytest.approx(0.0, abs=1e-9), i
        else:  # statsmodels-style NaN edges
            assert tr is None and re is None, i


def test_odd_period_exact_recovery(spark):
    season = [3.0, -1.0, -2.0, 1.0, -1.0]  # sums to 0
    rows = _rows_for(season, -0.25, 25)
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            5,
        )
    )
    for (k, ts), (v, tr, se, re) in out.items():
        i = ts // 1000
        assert se == pytest.approx(season[i % 5], abs=1e-9)
        if 2 <= i <= 22:
            assert tr == pytest.approx(-0.25 * i, abs=1e-9), i
            assert re == pytest.approx(0.0, abs=1e-9), i
        else:
            assert tr is None and re is None, i


def test_uncentered_season_recenters(spark):
    # season mean 1.0 -> it leaks into the trend, seasonal re-centers
    season = [3.0, 1.0, 0.0, 0.0]
    rows = _rows_for(season, 0.0, 20)
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
        )
    )
    for (k, ts), (v, tr, se, re) in out.items():
        i = ts // 1000
        assert se == pytest.approx(season[i % 4] - 1.0, abs=1e-9)
        if 2 <= i <= 17:
            assert tr == pytest.approx(1.0, abs=1e-9)
            assert re == pytest.approx(0.0, abs=1e-9)


def test_gap_nulls_trend_window(spark):
    season = [1.0, -1.0]
    rows = _rows_for(season, 1.0, 12)
    # drop bucket i=6 and NaN bucket i=3 (both become NULL spine rows)
    rows = [r for r in rows if r[1] != 6000]
    rows = [(k, t, NAN if t == 3000 else v) for k, t, v in rows]
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            2,
        )
    )
    # spine keeps both missing buckets as rows with NULL value
    assert out[("a", 6000)][0] is None
    assert out[("a", 3000)][0] is None
    for i in (3, 6):
        for j in range(i - 1, i + 2):  # +-1 window touches the hole
            assert out[("a", j * 1000)][1] is None, (i, j)
    # far from the holes the trend is the line
    assert out[("a", 9000)][1] == pytest.approx(9.0, abs=1e-9)


def test_multi_key_and_short_series(spark):
    rows = _rows_for([1.0, -1.0, 0.0], 0.0, 15, key="long")
    rows += [("short", 0, 5.0), ("short", 1000, 7.0)]  # < one period
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            3,
        )
    )
    # the short key emits spine rows but no trend and no resid
    assert out[("short", 0)][1] is None
    assert out[("short", 1000)][1] is None
    assert out[("long", 7000)][1] is not None


def test_multiplicative_exact_recovery(spark):
    # y = trend * season with season mean 1 -> exact recovery (the
    # centered MA of trend*season over an aligned full window is the
    # trend when trend is CONSTANT; use a constant trend for exactness)
    season = [1.5, 0.5, 1.25, 0.75]  # mean exactly 1
    rows = [("a", i * 1000, 8.0 * season[i % 4]) for i in range(24)]
    out = _collect(
        ts_decompose(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
            mode="multiplicative",
        )
    )
    for (k, ts), (v, tr, se, re) in out.items():
        i = ts // 1000
        assert se == pytest.approx(season[i % 4], abs=1e-9)
        if 2 <= i <= 21:
            assert tr == pytest.approx(8.0, abs=1e-9), i
            assert re == pytest.approx(1.0, abs=1e-9), i
        else:
            assert tr is None and re is None, i


def test_forecast_additive_exact(spark):
    from redistimeseries_spark.operators.decompose import ts_forecast

    season = [2.0, -1.0, 0.0, -1.0]
    rows = _rows_for(season, 0.5, 24)
    got = {
        r.ts: r.forecast
        for r in ts_forecast(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
            horizon_n=6,
        ).collect()
    }
    assert set(got) == {i * 1000 for i in range(24, 30)}
    for i in range(24, 30):
        assert got[i * 1000] == pytest.approx(
            0.5 * i + season[i % 4], abs=1e-6
        ), i


def test_forecast_multiplicative_exact(spark):
    from redistimeseries_spark.operators.decompose import ts_forecast

    season = [1.5, 0.5, 1.25, 0.75]
    rows = [("a", i * 1000, 8.0 * season[i % 4]) for i in range(24)]
    got = {
        r.ts: r.forecast
        for r in ts_forecast(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
            horizon_n=4,
            mode="multiplicative",
        ).collect()
    }
    for i in range(24, 28):
        assert got[i * 1000] == pytest.approx(8.0 * season[i % 4], abs=1e-6)


def test_forecast_short_series_emits_nothing(spark):
    from redistimeseries_spark.operators.decompose import ts_forecast

    rows = [("s", 0, 1.0), ("s", 1000, 2.0)]  # < one MA window for p=4
    assert (
        ts_forecast(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
            horizon_n=3,
        ).count()
        == 0
    )


def test_forecast_constant_trend_flat_line(spark):
    """A key with exactly ONE trend row (regr_slope undefined) must
    forecast the FLAT line through that constant trend instead of being
    dropped (round-10; the constant series is exactly forecastable)."""
    from redistimeseries_spark.operators.decompose import ts_forecast

    # p=4 over 5 buckets -> exactly one full centered-MA window (the
    # middle bucket), so regr_slope sees a single (x, y) point
    rows = [("c", i * 1000, 5.0) for i in range(5)]
    got = sorted(
        ts_forecast(
            spark.createDataFrame(rows, "key string, ts long, value double"),
            1000,
            4,
            horizon_n=3,
        ).collect(),
        key=lambda r: r.ts,
    )
    assert [r.ts for r in got] == [5000, 6000, 7000]
    for r in got:
        # constant series: trend 5.0, every seasonal 0 -> flat 5.0
        assert r.forecast == pytest.approx(5.0, abs=1e-9)


def test_engine_decompose_mode_passthrough(spark):
    """engine.decompose exposes mode (round-9 ADVICE: multiplicative was
    unreachable from the facade)."""
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("dm1")
    season = [1.0, 2.0, 0.5, 1.5]
    for i in range(16):
        eng.add("dm1", i * 1000, 8.0 * season[i % 4])
    got = {r.ts: r for r in eng.decompose("dm1", 1000, 4,
                                          mode="multiplicative").collect()}
    mid = [r for r in got.values() if r.trend is not None]
    assert mid and all(r.resid == pytest.approx(1.0, abs=1e-6) for r in mid)


def test_forecast_validation(spark):
    from redistimeseries_spark.operators.decompose import ts_forecast

    df = spark.createDataFrame(
        [("a", 0, 1.0)], "key string, ts long, value double"
    )
    with pytest.raises(ValueError, match="horizon_n"):
        ts_forecast(df, 1000, 4, horizon_n=0)


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0)], "key string, ts long, value double"
    )
    with pytest.raises(ValueError, match="step_ms"):
        ts_decompose(df, 0, 4)
    with pytest.raises(ValueError, match="period_n"):
        ts_decompose(df, 1000, 1)
    with pytest.raises(ValueError, match="mode"):
        ts_decompose(df, 1000, 4, mode="log")


def test_engine_facade(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("d1")
    for i in range(12):
        eng.add("d1", i * 1000, float(i % 3))
    got = eng.decompose("d1", 1000, 3).collect()
    assert len(got) == 12
    assert {r.ts for r in got} == {i * 1000 for i in range(12)}


# ---- ts_seasonal_strength (round-11 sixth wave) ---------------------------


def test_seasonal_strength_planted_signals(spark):
    """Strong planted seasonality reads strength_seasonal near 1 and a
    strong trend reads strength_trend near 1; pure noise reads both
    near 0 (clamped at 0)."""
    import random

    from redistimeseries_spark.operators.decompose import (
        ts_seasonal_strength,
    )

    rng = random.Random(0x55EA)
    rows = []
    for t in range(96):
        rows.append(
            ("season", t * 1000,
             10.0 * math.sin(2 * math.pi * t / 8) + rng.gauss(0, 0.3))
        )
        rows.append(("trendy", t * 1000, 2.0 * t + rng.gauss(0, 0.5)))
        rows.append(("noise", t * 1000, rng.gauss(0, 1.0)))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    out = {r.key: r for r in ts_seasonal_strength(sdf, 1000, 8).collect()}
    assert out["season"].strength_seasonal > 0.98
    assert out["trendy"].strength_trend > 0.98
    assert out["trendy"].strength_seasonal < 0.3
    assert out["noise"].strength_seasonal < 0.3
    assert out["noise"].strength_trend < 0.3
    # estimable span: 96 buckets minus the two half-period MA edges
    assert out["season"].n_est == 96 - 8


def test_seasonal_strength_matches_decompose_variances(spark):
    """The strengths equal the textbook variance formula computed off
    the operator's own decomposition output (independent pandas
    replay), and the constant series reads NULL (zero mixed
    variance)."""
    import numpy as np

    from redistimeseries_spark.operators.decompose import (
        ts_decompose,
        ts_seasonal_strength,
    )

    rows = [
        ("m", t * 500,
         5.0 + 0.1 * t + 3.0 * math.sin(2 * math.pi * t / 6) + (t % 5) * 0.2)
        for t in range(60)
    ]
    rows += [("flat", t * 500, 4.0) for t in range(30)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {r.key: r for r in ts_seasonal_strength(sdf, 500, 6).collect()}
    pdf = ts_decompose(sdf, 500, 6, keys="m").toPandas().dropna(
        subset=["resid"]
    )
    vr = np.var(pdf.resid, ddof=1)
    vsr = np.var(pdf.seasonal + pdf.resid, ddof=1)
    vtr = np.var(pdf.trend + pdf.resid, ddof=1)
    assert got["m"].strength_seasonal == pytest.approx(
        max(0.0, 1 - vr / vsr), rel=1e-9
    )
    assert got["m"].strength_trend == pytest.approx(
        max(0.0, 1 - vr / vtr), rel=1e-9
    )
    assert got["m"].n_est == len(pdf)
    assert got["flat"].strength_seasonal is None
    assert got["flat"].strength_trend is None


def test_seasonal_strength_multiplicative_and_facade(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine
    from redistimeseries_spark.operators.decompose import (
        ts_seasonal_strength,
    )

    rows = [
        ("g", t * 1000,
         (10.0 + 0.2 * t) * (1.0 + 0.4 * math.sin(2 * math.pi * t / 8)))
        for t in range(80)
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    out = ts_seasonal_strength(sdf, 1000, 8, mode="multiplicative").collect()
    assert len(out) == 1 and out[0].strength_seasonal > 0.9

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("ss1")
    for t in range(48):
        eng.add("ss1", t * 1000, math.sin(2 * math.pi * t / 6) * 4.0 + 10.0)
    r = eng.seasonal_strength("ss1", 1000, 6).collect()
    assert len(r) == 1 and r[0].strength_seasonal > 0.95
    with pytest.raises(ValueError, match="period_n"):
        ts_seasonal_strength(sdf, 1000, 1)
