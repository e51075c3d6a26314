"""ts_holt_winters (round 11, operators/holtwinters) — pure-python
recurrence differential (both modes), initialization, horizon phases,
short-key drop, bucket aggregation, validation."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from redistimeseries_spark.operators.holtwinters import ts_holt_winters

NAN = float("nan")


def _hw_ref(y, p, a, b_, c, horizon, mult=False):
    """Independent replay of the documented recurrences."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    l = float(np.mean(y[:p]))
    b = (float(np.mean(y[p : 2 * p])) - l) / p
    s = (y[:p] / l).copy() if mult else (y[:p] - l).copy()
    rows = []
    for i in range(p, n):
        j = i % p
        yhat = (l + b) * s[j] if mult else (l + b) + s[j]
        if mult:
            ln = a * (y[i] / s[j]) + (1 - a) * (l + b)
        else:
            ln = a * (y[i] - s[j]) + (1 - a) * (l + b)
        bn = b_ * (ln - l) + (1 - b_) * b
        s[j] = (
            c * (y[i] / ln) + (1 - c) * s[j]
            if mult
            else c * (y[i] - ln) + (1 - c) * s[j]
        )
        l, b = ln, bn
        rows.append((i, y[i], l, b, s[j], yhat))
    fc = []
    for h in range(1, horizon + 1):
        j = (n + h - 1) % p
        f = (l + h * b) * s[j] if mult else (l + h * b) + s[j]
        fc.append((n + h - 1, s[j], f))
    return rows, fc


def test_hw_additive_and_multiplicative_vs_reference(spark):
    rng = random.Random(11)
    p, horizon = 6, 9
    rows = []
    series = {}
    for key in ("h1", "h2"):
        y = [
            50.0
            + 0.4 * i
            + 8.0 * math.sin(2 * math.pi * (i % p) / p)
            + rng.uniform(-1, 1)
            for i in range(60)
        ]
        series[key] = y
        rows += [(key, i * 1000, v) for i, v in enumerate(y)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    for mode in ("additive", "multiplicative"):
        got = {
            (r.key, r.ts): r
            for r in ts_holt_winters(
                sdf, 1000, p, 0.4, 0.2, 0.3, horizon_n=horizon, mode=mode
            ).collect()
        }
        for key, y in series.items():
            ref, fc = _hw_ref(
                y, p, 0.4, 0.2, 0.3, horizon, mult=mode == "multiplicative"
            )
            assert (
                len([1 for (k, _) in got if k == key])
                == len(ref) + horizon
            )
            for i, yv, l, b, sj, yhat in ref:
                r = got[(key, i * 1000)]
                assert r.value == pytest.approx(yv, abs=1e-9)
                assert r.level == pytest.approx(l, abs=1e-9)
                assert r.trend == pytest.approx(b, abs=1e-9)
                assert r.seasonal == pytest.approx(sj, abs=1e-9)
                assert r.yhat == pytest.approx(yhat, abs=1e-9)
            for i, sj, f in fc:
                r = got[(key, i * 1000)]
                assert r.value is None and r.level is None and r.trend is None
                assert r.seasonal == pytest.approx(sj, abs=1e-9)
                assert r.yhat == pytest.approx(f, abs=1e-9)


def test_hw_bucket_aggregation_and_nan(spark):
    """Samples mean-aggregate into buckets before the fit; NaN samples
    vanish first; duplicate timestamps contribute to the same mean."""
    p = 2
    rows = []
    vals = [4.0, 8.0, 6.0, 2.0, 10.0, 4.0, 8.0, 6.0]
    for i, v in enumerate(vals):
        rows.append(("bk", i * 1000 + 10, v - 1.0))
        rows.append(("bk", i * 1000 + 900, v + 1.0))  # same bucket
    rows.append(("bk", 10, NAN))  # dropped, does not shift the mean
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = ts_holt_winters(sdf, 1000, p, 0.5, 0.5, 0.5).collect()
    ref, _ = _hw_ref(vals, p, 0.5, 0.5, 0.5, 0)
    assert len(got) == len(ref)
    for r, (i, yv, l, b, sj, yhat) in zip(sorted(got, key=lambda r: r.ts), ref):
        assert r.ts == i * 1000
        assert r.value == pytest.approx(yv, abs=1e-9)
        assert r.level == pytest.approx(l, abs=1e-9)


def test_hw_short_keys_dropped_and_validation(spark):
    rows = [("short", i * 1000, float(i)) for i in range(7)]  # 7 < 2*4
    rows += [("long", i * 1000, float(i % 4) + i * 0.1) for i in range(8)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    out = ts_holt_winters(sdf, 1000, 4, 0.3, 0.1, 0.2).collect()
    assert {r.key for r in out} == {"long"}
    assert len(out) == 4  # rows p..n-1 of the 8-bucket key
    with pytest.raises(ValueError, match="step_ms"):
        ts_holt_winters(sdf, 0, 4, 0.3, 0.1, 0.2)
    with pytest.raises(ValueError, match="period_n"):
        ts_holt_winters(sdf, 1000, 1, 0.3, 0.1, 0.2)
    for bad in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError, match="alpha"):
            ts_holt_winters(sdf, 1000, 4, bad, 0.1, 0.2)
    with pytest.raises(ValueError, match="horizon_n"):
        ts_holt_winters(sdf, 1000, 4, 0.3, 0.1, 0.2, horizon_n=-1)
    with pytest.raises(ValueError, match="mode"):
        ts_holt_winters(sdf, 1000, 4, 0.3, 0.1, 0.2, mode="damped")


def test_hw_observed_sequence_seasonality(spark):
    """Gaps do not leave NULL buckets behind: the phase axis is the
    OBSERVED bucket sequence (documented — resample first for
    wall-clock phase)."""
    # 12 observed buckets with a hole at grid slot 5
    slots = [0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 12]
    vals = [float(k % 3) + 10.0 for k in range(12)]
    rows = [("gap", s * 1000, v) for s, v in zip(slots, vals)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = sorted(
        ts_holt_winters(sdf, 1000, 3, 0.3, 0.1, 0.2).collect(),
        key=lambda r: r.ts,
    )
    ref, _ = _hw_ref(vals, 3, 0.3, 0.1, 0.2, 0)
    assert [r.ts for r in got] == [s * 1000 for s in slots[3:]]
    for r, (_, yv, l, b, sj, yhat) in zip(got, ref):
        assert r.level == pytest.approx(l, abs=1e-9)
        assert r.yhat == pytest.approx(yhat, abs=1e-9)


def test_hw_engine_facade(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("hw")
    for i in range(20):
        eng.add("hw", i * 60_000, 5.0 + (i % 4) + 0.2 * i)
    out = eng.holt_winters("hw", "1m", 4, 0.3, 0.1, 0.2, horizon_n=2).collect()
    assert len(out) == 16 + 2
    assert out[-1].value is None and out[-1].yhat is not None
