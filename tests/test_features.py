"""ts_features — per-series feature extraction (fleet triage).

Hand-computed cases, the acf1 ≡ ts_acf(lag 1) cross-pin, degenerate
shapes (constant, single-bucket, gapped), and a DuckDB differential
that replays the whole chain independently.
"""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from redistimeseries_spark.operators.correlate import ts_acf
from redistimeseries_spark.operators.features import ts_features

NAN = float("nan")


def _one(df, key):
    rows = [r for r in df.collect() if r.key == key]
    assert len(rows) == 1
    return rows[0]


def test_features_hand_case(spark):
    # buckets (dur=1000): 0 -> avg(1, 3) = 2; 1000 -> 4; 2000 -> 2;
    # 4000 -> 6 (gap at 3000 breaks adjacency).  NaN dropped.
    rows = [
        ("a", 0, 1.0), ("a", 500, 3.0), ("a", 1000, 4.0),
        ("a", 2000, 2.0), ("a", 2500, NAN), ("a", 4000, 6.0),
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    r = _one(ts_features(sdf, 1000), "a")
    assert r.n_samples == 5 and r.n_buckets == 4
    # grid values: [2, 4, 2, 6] at indices [0, 1, 2, 4]
    assert r.mean == pytest.approx(3.5)
    assert r.std == pytest.approx(1.9148542155126762)  # stddev_samp
    assert r.vmin == 2.0 and r.vmax == 6.0
    assert r.cv == pytest.approx(r.std / 3.5)
    # OLS on x=[0,1,2,4], y=[2,4,2,6]: slope = Sxy/Sxx = 7.5/8.75
    assert r.trend_slope == pytest.approx(7.5 / 8.75)
    # r2 = corr^2 = Sxy^2/(Sxx*Syy) = 56.25/(8.75*11)
    assert r.trend_r2 == pytest.approx(56.25 / (8.75 * 11.0))
    # adjacent pairs: (2,4), (4,2) — 2 pairs (2000->4000 is a gap)
    # acf1 legs: a=[2,4] b=[4,2] -> corr = -1
    assert r.acf1 == pytest.approx(-1.0)
    # mean 3.5: (2-3.5)(4-3.5) < 0 cross; (4-3.5)(2-3.5) < 0 cross
    assert r.crossing_rate == pytest.approx(1.0)
    assert r.flat_rate == 0.0
    # max |v - mean| = |6 - 3.5| = 2.5
    assert r.spikiness == pytest.approx(2.5 / r.std)


def test_features_acf1_equals_ts_acf_lag1(spark):
    rng = random.Random(0xFEA7)
    rows = [
        (k, t * 700, rng.uniform(-5, 5))
        for k in ("p", "q")
        for t in range(400)
        if rng.random() > 0.1
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    feats = {r.key: r for r in ts_features(sdf, 2000).collect()}
    acf = {
        r.key: r
        for r in ts_acf(sdf, 2000, 1).collect()
    }
    for k in ("p", "q"):
        assert feats[k].acf1 == pytest.approx(acf[k].acf, abs=1e-12)


def test_features_constant_series(spark):
    rows = [("c", i * 1000, 7.0) for i in range(5)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    r = _one(ts_features(sdf, 1000), "c")
    assert r.std == 0.0 and r.cv == 0.0
    assert r.trend_slope == 0.0
    assert r.trend_r2 is None  # Syy = 0 edge defined away
    assert r.acf1 is None  # zero-variance legs
    assert r.crossing_rate == 0.0 and r.flat_rate == 1.0
    assert r.spikiness is None  # std not > 0


def test_features_single_bucket(spark):
    rows = [("s", 10, 1.0), ("s", 20, 3.0)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    r = _one(ts_features(sdf, 1000), "s")
    assert r.n_samples == 2 and r.n_buckets == 1
    assert r.mean == 2.0 and r.std is None and r.cv is None
    assert r.trend_slope is None and r.trend_r2 is None
    assert r.acf1 is None
    assert r.crossing_rate is None and r.flat_rate is None
    assert r.spikiness is None


def test_features_keys_range_validation(spark):
    rows = [
        ("a", 0, 1.0), ("a", 1000, 2.0), ("b", 0, 9.0), ("b", 1000, 8.0),
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    out = ts_features(sdf, 1000, keys="a")
    assert [r.key for r in out.collect()] == ["a"]
    out2 = ts_features(sdf, 1000, start=1000)
    assert {r.n_buckets for r in out2.collect()} == {1}
    with pytest.raises(ValueError, match="bucket_dur"):
        ts_features(sdf, 0)


def test_features_vs_duckdb(spark):
    rng = random.Random(0x5EED)
    rows = []
    for k in ("x", "y", "z", "const"):
        for t in range(0, 60_000, 400):
            if rng.random() < 0.15:
                continue  # gaps
            v = (
                7.0
                if k == "const"
                else (NAN if rng.random() < 0.05 else rng.uniform(-10, 10))
            )
            rows.append((k, t, v))
            if rng.random() < 0.05:
                rows.append((k, t + 1, v * 0.5))  # near-dup ts
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for dur in (3000, 7000):
        got = sorted(
            tuple(
                round(x, 9) if isinstance(x, float) else x for x in r
            )
            for r in ts_features(sdf, dur).collect()
        )
        exp = sorted(
            tuple(
                round(x, 9) if isinstance(x, float) else x for x in r
            )
            for r in con.sql(f"""
        WITH g AS (SELECT key, ts - ts % {dur} AS b, avg(value) AS v,
                          count(*) AS c
                   FROM t WHERE NOT isnan(value) GROUP BY 1, 2),
        d AS (SELECT *, avg(v) OVER (PARTITION BY key) AS mu,
                     min(b) OVER (PARTITION BY key) AS minb,
                     lead(v) OVER (PARTITION BY key ORDER BY b) AS vn,
                     lead(b) OVER (PARTITION BY key ORDER BY b) AS bn
              FROM g),
        e AS (SELECT *, CAST(b - minb AS DOUBLE) / {dur} AS x,
                     coalesce(bn = b + {dur}, false) AS adj
              FROM d),
        a AS (SELECT key, CAST(sum(c) AS BIGINT) AS n_samples,
                     count(*) AS n_buckets, avg(v) AS mean,
                     stddev_samp(v) AS std, min(v) AS vmin,
                     max(v) AS vmax, regr_slope(v, x) AS sl,
                     regr_r2(v, x) AS r2,
                     covar_samp(v, vn) FILTER (WHERE adj) AS cov,
                     stddev_samp(v) FILTER (WHERE adj) AS sa,
                     stddev_samp(vn) FILTER (WHERE adj) AS sb,
                     count(*) FILTER (WHERE adj) AS adjn,
                     count(*) FILTER (WHERE adj
                       AND (v - mu) * (vn - mu) < 0) AS crossings,
                     count(*) FILTER (WHERE adj AND vn = v) AS flats,
                     max(abs(v - mu)) AS maxdev
              FROM e GROUP BY 1)
        SELECT key, n_samples, n_buckets, mean, std,
               CASE WHEN std IS NOT NULL AND mean <> 0
                    THEN std / abs(mean) END AS cv,
               vmin, vmax, sl AS trend_slope,
               CASE WHEN std > 0 THEN r2 END AS trend_r2,
               CASE WHEN sa > 0 AND sb > 0
                    THEN cov / (sa * sb) END AS acf1,
               CASE WHEN adjn > 0
                    THEN crossings / CAST(adjn AS DOUBLE)
                    END AS crossing_rate,
               CASE WHEN adjn > 0
                    THEN flats / CAST(adjn AS DOUBLE) END AS flat_rate,
               CASE WHEN std > 0 THEN maxdev / std END AS spikiness
        FROM a ORDER BY key
        """).fetchall()
        )
        assert got == exp, dur


def test_features_engine_facade(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("f1", labels={"team": "a"})
    eng.create("f2", labels={"team": "b"})
    for t in range(20):
        eng.add("f1", t * 1000, float(t))
        eng.add("f2", t * 1000, 5.0)
    out = {r.key: r for r in eng.features(1000).collect()}
    assert set(out) == {"f1", "f2"}
    assert out["f1"].trend_slope == pytest.approx(1.0)
    assert out["f2"].flat_rate == 1.0
    only = eng.features(1000, filters=["team=a"]).collect()
    assert [r.key for r in only] == ["f1"]
