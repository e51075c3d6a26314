"""ts_corr / ts_cusum (round 10, operators/correlate) — hand-computed
cases, DuckDB oracles, and the chunk-local-vs-sequential CUSUM twin."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from redistimeseries_spark.operators.correlate import (
    _ts_cusum_sequential,
    ts_corr,
    ts_cusum,
)

NAN = float("nan")


def test_corr_hand_cases(spark):
    rows = []
    for i in range(10):
        rows.append(("a", i * 1000, float(i)))
        rows.append(("b", i * 1000, 2.0 * i + 3.0))   # corr +1 with a
        rows.append(("c", i * 1000, -float(i)))       # corr -1 with a
        rows.append(("d", i * 1000, 5.0))             # zero variance
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {
        (r.key_a, r.key_b): (round(r.corr, 9), r.n)
        for r in ts_corr(
            sdf, 1_000_000, [("a", "b"), ("a", "c"), ("a", "d")]
        ).collect()
    }
    assert got == {("a", "b"): (1.0, 10), ("a", "c"): (-1.0, 10)}
    # ("a", "d") dropped: zero variance on the d leg


def test_corr_alignment_nan_and_dups(spark):
    rows = [
        ("a", 0, 1.0), ("a", 1000, 2.0), ("a", 2000, NAN), ("a", 3000, 4.0),
        # b misses ts=3000; has a NaN at 1000 and a dup pair at 0
        ("b", 0, 9.0), ("b", 0, 5.0), ("b", 1000, NAN), ("b", 2000, 1.0),
        ("b", 4000, 7.0),
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    # matched pairs: only ts=0 (b's dup folds to max value 9.0) — a
    # single pair defines no correlation, so nothing is emitted
    assert ts_corr(sdf, 1_000_000, [("a", "b")]).count() == 0
    # add one more matched ts -> one bucket row with n=2
    rows += [("a", 5000, 8.0), ("b", 5000, 3.0)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    out = ts_corr(sdf, 1_000_000, [("a", "b")]).collect()
    assert len(out) == 1 and out[0].n == 2


def test_corr_duplicate_pairs_deduped(spark):
    """A duplicated (key_a, key_b) request entry must not double-join
    the a-leg (round-10 ADVICE: n doubled per bucket; corr itself is
    ratio-invariant so the gate could not see it)."""
    rows = [("a", i * 1000, float(i)) for i in range(6)]
    rows += [("b", i * 1000, 2.0 * i + 1.0) for i in range(6)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    once = ts_corr(sdf, 1_000_000, [("a", "b")]).collect()
    duped = ts_corr(sdf, 1_000_000, [("a", "b"), ("a", "b")]).collect()
    assert len(once) == len(duped) == 1
    assert once[0].n == duped[0].n == 6
    assert once[0].corr == duped[0].corr


def test_corr_vs_duckdb(spark):
    rng = random.Random(0xC0BB)
    rows = []
    for k in ("x", "y", "z"):
        for t in range(0, 40_000, 500):  # shared cadence
            v = NAN if rng.random() < 0.05 else rng.uniform(-10, 10)
            rows.append((k, t, v))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for dur in (7000, 10_000):
        got = sorted(
            (r.key_a, r.key_b, r.ts, round(r.corr, 9), r.n)
            for r in ts_corr(
                sdf, dur, [("x", "y"), ("y", "z"), ("x", "x")]
            ).collect()
        )
        exp = sorted(
            map(
                tuple,
                con.sql(f"""
            WITH v AS (SELECT key, ts, max(value) AS value FROM t
                       WHERE NOT isnan(value) GROUP BY key, ts),
            p(ka, kb) AS (VALUES ('x','y'), ('y','z'), ('x','x')),
            m AS (SELECT p.ka, p.kb, a.ts, a.value AS va, b.value AS vb
                  FROM p JOIN v a ON a.key = p.ka
                         JOIN v b ON b.key = p.kb AND b.ts = a.ts)
            SELECT ka, kb, ts - ts % {dur} AS b,
                   round(corr(va, vb), 9) AS c, count(*) AS n
            FROM m GROUP BY 1, 2, 3
            HAVING corr(va, vb) IS NOT NULL AND NOT isnan(corr(va, vb))
            """).fetchall(),
            )
        )
        assert got == exp, dur


def test_corr_tolerance_asof_matching(spark):
    """tolerance_ms (round 10): irregular cadences match as-of — each
    a-sample takes b's latest at-or-before sample within tolerance;
    exact-coinciding samples still match; stale matches drop."""
    rows = [
        # a at 0/1000/2000/3000; b offset by ~100ms except one gap
        ("a", 0, 1.0), ("a", 1000, 2.0), ("a", 2000, 3.0), ("a", 3000, 4.0),
        ("b", 0, 2.0), ("b", 900, 4.0), ("b", 2900, 8.0),
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    # exact matching: only ts=0 pairs -> no corr row
    assert ts_corr(sdf, 1_000_000, [("a", "b")]).count() == 0
    # tolerance 200: a@0->b@0, a@1000->b@900, a@3000->b@2900; a@2000's
    # latest b (900) is 1100ms stale -> dropped.  matched va/vb are
    # perfectly linear (vb = 2*va) -> corr 1, n 3
    out = ts_corr(sdf, 1_000_000, [("a", "b")], tolerance_ms=200).collect()
    assert len(out) == 1
    assert out[0].n == 3 and out[0].corr == pytest.approx(1.0)
    with pytest.raises(ValueError, match="tolerance_ms"):
        ts_corr(sdf, 1000, [("a", "b")], tolerance_ms=-1)


def test_corr_tolerance_vs_duckdb_asof(spark):
    """tolerance matching vs DuckDB's native ASOF JOIN — an independent
    formulation of the same at-or-before-within-tolerance rule."""
    rng = random.Random(0xA50F)
    rows = []
    for k in ("x", "y"):
        for t in sorted(rng.sample(range(0, 40_000), 60)):
            v = NAN if rng.random() < 0.05 else rng.uniform(-10, 10)
            rows.append((k, t, v))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for tol, dur in ((500, 8000), (3000, 10_000)):
        got = sorted(
            (r.key_a, r.key_b, r.ts, round(r.corr, 9), r.n)
            for r in ts_corr(
                sdf, dur, [("x", "y")], tolerance_ms=tol
            ).collect()
        )
        exp = sorted(
            map(
                tuple,
                con.sql(f"""
            WITH v AS (SELECT key, ts, max(value) AS value FROM t
                       WHERE NOT isnan(value) GROUP BY key, ts),
            a AS (SELECT ts, value AS va FROM v WHERE key = 'x'),
            b AS (SELECT ts AS bts, value AS vb FROM v WHERE key = 'y'),
            m AS (SELECT a.ts, a.va, b.vb
                  FROM a ASOF JOIN b ON b.bts <= a.ts
                  WHERE a.ts - b.bts <= {tol})
            SELECT 'x' AS ka, 'y' AS kb, ts - ts % {dur} AS b,
                   round(corr(va, vb), 9) AS c, count(*) AS n
            FROM m GROUP BY 3
            HAVING corr(va, vb) IS NOT NULL AND NOT isnan(corr(va, vb))
            """).fetchall(),
            )
        )
        assert got == exp, (tol, dur)


def test_corr_validation(spark):
    sdf = spark.createDataFrame([("a", 0, 1.0)], "key string, ts long, value double")
    with pytest.raises(ValueError, match="bucket_dur"):
        ts_corr(sdf, 0, [("a", "b")])
    with pytest.raises(ValueError, match="pairs"):
        ts_corr(sdf, 1000, [])


def test_cusum_hand_step_change(spark):
    # flat at 10 for 10 samples, then a +5 step: with explicit
    # target=10, k=1, h=6 the upward statistic accumulates 4/sample
    # after the step and alarms on the 2nd shifted sample
    rows = [("s", i * 1000, 10.0) for i in range(10)]
    rows += [("s", (10 + i) * 1000, 15.0) for i in range(4)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {r.ts: r for r in ts_cusum(sdf, 1.0, 6.0, target=10.0).collect()}
    assert len(got) == 14
    for i in range(10):  # pre-step: s_pos pinned at 0 by the max clamp
        assert got[i * 1000].s_pos == pytest.approx(0.0)
        assert not got[i * 1000].alarm
    assert got[10_000].s_pos == pytest.approx(4.0) and not got[10_000].alarm
    assert got[11_000].s_pos == pytest.approx(8.0) and got[11_000].alarm
    assert got[13_000].s_pos == pytest.approx(16.0)
    # downward statistic never rises: s_neg stays 0 throughout
    assert all(r.s_neg == pytest.approx(0.0) for r in got.values())


def test_cusum_self_baseline_and_validation(spark):
    rows = [("s", i * 1000, float(i % 2)) for i in range(20)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    # alternating 0/1 around mean 0.5 with k=0.5: every increment is
    # exactly 0 -> both statistics stay 0, no alarms
    out = ts_cusum(sdf, 0.5, 1.0).collect()
    assert len(out) == 20
    assert all(
        r.s_pos == pytest.approx(0.0) and r.s_neg == pytest.approx(0.0)
        and not r.alarm
        for r in out
    )
    with pytest.raises(ValueError, match="slack"):
        ts_cusum(sdf, -0.1, 1.0)
    with pytest.raises(ValueError, match="threshold"):
        ts_cusum(sdf, 0.5, 0.0)


def test_cusum_chunked_vs_sequential_fuzz(spark):
    """Chunk-local closed form == the literal max(0, prev + d) replay
    under FORCED TINY CHUNKS — drifting data, NaNs, duplicate ts,
    sample-free chunk runs; pinned at 1e-9."""
    rng = random.Random(0xC5C5)
    for trial in range(4):
        rows = []
        for kname in ("u", "v"):
            drift = rng.uniform(-0.3, 0.3)
            ts_pool = sorted(rng.sample(range(0, 50_000), rng.randint(20, 60)))
            val = 0.0
            for t in ts_pool:
                val += drift + rng.uniform(-1, 1)
                v = NAN if rng.random() < 0.08 else val
                rows.append((kname, t, v))
                if rng.random() < 0.08:
                    rows.append((kname, t, val + rng.uniform(-1, 1)))
        # a key with long sample-free chunk runs under chunk_ms=2048
        rows += [("w", 0, 1.0), ("w", 30_000, 9.0), ("w", 30_500, -4.0)]
        sdf = spark.createDataFrame(rows, "key string, ts long, value double")
        for target in (None, 0.0):
            got = {
                (r.key, r.ts, r.value): (r.s_pos, r.s_neg, r.alarm)
                for r in ts_cusum(
                    sdf, 0.25, 2.0, target=target, chunk_ms=2048
                ).collect()
            }
            want = {
                (r.key, r.ts, r.value): (r.s_pos, r.s_neg, r.alarm)
                for r in _ts_cusum_sequential(
                    sdf, 0.25, 2.0, target=target
                ).collect()
            }
            assert got.keys() == want.keys(), (trial, target)
            for kk in got:
                assert got[kk][2] == want[kk][2], (trial, target, kk)
                for i in (0, 1):
                    assert math.isclose(
                        got[kk][i], want[kk][i], rel_tol=1e-9, abs_tol=1e-9
                    ), (trial, target, kk, got[kk], want[kk])


def test_engine_facade_corr_cusum(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("m1"), eng.create("m2")
    for i in range(12):
        eng.add("m1", i * 1000, float(i))
        eng.add("m2", i * 1000, 3.0 * i + 1.0)
    c = eng.corr("m1", "m2", 1_000_000).collect()
    assert len(c) == 1 and c[0].corr == pytest.approx(1.0) and c[0].n == 12
    cs = eng.cusum("m1", 0.5, 2.0, target=0.0).collect()
    assert len(cs) == 12 and cs[-1].alarm  # monotone ramp drifts up
    # review fix: corr goes through _series_df — retention clamps apply
    # (an expired sample is invisible to corr like to range), and '$'
    # is rejected as ambiguous across two series
    eng.create("m3", retention=3000)
    for i in range(12):
        eng.add("m3", i * 1000, float(i))
    n_kept = eng.corr("m1", "m3", 1_000_000).collect()[0].n
    assert n_kept == eng.range("m3").count() == 4  # last 3 s + the tip
    with pytest.raises(ValueError, match="ambiguous"):
        eng.corr("m1", "m2", 1_000_000, from_ts="$")


def test_cusum_vs_duckdb_recursive(spark):
    """ts_cusum vs an INDEPENDENT DuckDB recursive-CTE replay of the
    max(0, prev + d) recurrence (explicit target so both sides share
    the exact baseline)."""
    rng = random.Random(0xD0C5)
    rows = []
    for kname in ("a", "b"):
        for i, t in enumerate(sorted(rng.sample(range(0, 30_000), 40))):
            rows.append((kname, t, rng.uniform(-3, 8) + (2.0 if i > 25 else 0.0)))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    k, h, target = 0.5, 5.0, 2.0
    exp = {
        (r[0], r[1]): (round(r[2], 9), round(r[3], 9), r[4])
        for r in con.sql(f"""
        WITH RECURSIVE v AS (
          SELECT key, ts, value,
                 row_number() OVER (PARTITION BY key ORDER BY ts) AS rn
          FROM t),
        r AS (
          SELECT key, ts, rn,
                 greatest(0, value - {target} - {k}) AS sp,
                 greatest(0, {target} - value - {k}) AS sn
          FROM v WHERE rn = 1
          UNION ALL
          SELECT v.key, v.ts, v.rn,
                 greatest(0, r.sp + v.value - {target} - {k}),
                 greatest(0, r.sn + {target} - v.value - {k})
          FROM v JOIN r ON v.key = r.key AND v.rn = r.rn + 1)
        SELECT key, ts, round(sp, 9), round(sn, 9), sp > {h} OR sn > {h}
        FROM r
        """).fetchall()
    }
    got = {
        (r.key, r.ts): (round(r.s_pos, 9), round(r.s_neg, 9), r.alarm)
        for r in ts_cusum(sdf, k, h, target=target).collect()
    }
    assert got == exp


# --------------------------------------------------------------------------
# ts_xcorr / ts_lead_lag (round 11)
# --------------------------------------------------------------------------

def test_xcorr_recovers_known_shift(spark):
    """b is a scaled copy of a delayed by exactly 2 steps: the sweep
    must read r ~ +1 at lag +2000 (a LEADS b) and weaker everywhere
    else; ts_lead_lag must select that lag."""
    from redistimeseries_spark.operators.correlate import (
        ts_lead_lag,
        ts_xcorr,
    )

    rng = random.Random(11)
    base = [rng.uniform(0, 100) for _ in range(200)]
    rows = []
    for i, v in enumerate(base):
        rows.append(("a", i * 1000, v))
        if i >= 2:
            rows.append(("b", i * 1000, 3.0 * base[i - 2] + 7.0))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    lags = [k * 1000 for k in range(-3, 4)]
    got = {
        r.lag: (round(r.corr, 9), r.n)
        for r in ts_xcorr(sdf, [("a", "b")], lags).collect()
    }
    assert got[2000][0] == pytest.approx(1.0, abs=1e-9)
    assert got[2000][1] == 198  # a's ts 0..197000 match b's 2000..199000
    assert all(abs(c) < 0.5 for lag, (c, _) in got.items() if lag != 2000)
    best = ts_lead_lag(sdf, [("a", "b")], lags).collect()
    assert len(best) == 1 and best[0].lag == 2000


def test_xcorr_nan_dups_and_validation(spark):
    from redistimeseries_spark.operators.correlate import ts_xcorr

    rows = [
        ("a", 0, 1.0), ("a", 1000, 2.0), ("a", 2000, 3.0), ("a", 3000, NAN),
        # dup at ts=1000 folds to 9.0 (max = last-wins effective sample)
        ("b", 0, 4.0), ("b", 1000, 2.0), ("b", 1000, 9.0), ("b", 2000, 8.0),
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {
        r.lag: (round(r.corr, 9), r.n)
        for r in ts_xcorr(sdf, [("a", "b")], [0]).collect()
    }
    # matched at lag 0: (1,4), (2,9), (3,8) — a's NaN row never matches
    con = duckdb.connect()
    want = con.execute(
        "SELECT corr(x, y) FROM (VALUES (1.0, 4.0), (2.0, 9.0),"
        " (3.0, 8.0)) t(x, y)"
    ).fetchone()[0]
    assert got[0][0] == pytest.approx(want, abs=1e-9) and got[0][1] == 3
    with pytest.raises(ValueError, match="pairs"):
        ts_xcorr(sdf, [], [0])
    with pytest.raises(ValueError, match="lags"):
        ts_xcorr(sdf, [("a", "b")], [])
    with pytest.raises(ValueError, match="128"):
        ts_xcorr(sdf, [("a", "b")], list(range(200)))
    # duplicated pair entries and duplicated lags dedupe (n unchanged)
    dup = ts_xcorr(
        sdf, [("a", "b"), ("a", "b")], [0, 0]
    ).collect()
    assert len(dup) == 1 and dup[0].n == 3


def test_lead_lag_tiebreaks_and_min_n(spark):
    from redistimeseries_spark.operators.correlate import ts_lead_lag

    # a perfectly linear ramp correlates +-1.0 with itself at EVERY
    # lag: the tie must break toward |lag| = 0
    rows = []
    for i in range(50):
        rows.append(("r", i * 1000, float(i)))
        rows.append(("s", i * 1000, 2.0 * i))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    lags = [k * 1000 for k in range(-2, 3)]
    best = ts_lead_lag(sdf, [("r", "s")], lags).collect()
    assert len(best) == 1 and best[0].lag == 0
    # min_n above every lag's matched count -> pair not emitted
    assert ts_lead_lag(sdf, [("r", "s")], lags, min_n=51).count() == 0
    with pytest.raises(ValueError, match="min_n"):
        ts_lead_lag(sdf, [("r", "s")], lags, min_n=1)


def test_xcorr_vs_duckdb(spark):
    """Random irregular data, full sweep vs an independent DuckDB
    formulation (shifted self-join + corr)."""
    from redistimeseries_spark.operators.correlate import ts_xcorr

    rng = random.Random(23)
    rows = []
    for key in ("u", "v"):
        for i in range(300):
            if rng.random() < 0.85:  # gaps
                rows.append((key, i * 500, rng.uniform(-50, 50)))
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    lags = [-1500, -500, 0, 500, 1000]
    got = sorted(
        (r.lag, round(r.corr, 9), r.n)
        for r in ts_xcorr(sdf, [("u", "v")], lags).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES %s) AS v(key, ts, value)"
        % ", ".join(f"('{k}', {t}, CAST({v!r} AS DOUBLE))" for k, t, v in rows)
    )
    want = sorted(
        (lag, round(c, 9), n)
        for lag, c, n in con.execute(
            f"""WITH l(lag) AS (VALUES {", ".join(f"({x})" for x in lags)})
            SELECT l.lag, corr(a.value, b.value), count(*)
            FROM t a CROSS JOIN l
            JOIN t b ON b.key = 'v' AND b.ts = a.ts + l.lag
            WHERE a.key = 'u'
            GROUP BY 1
            HAVING corr(a.value, b.value) IS NOT NULL"""
        ).fetchall()
    )
    assert got == want


def test_engine_facade_xcorr_lead_lag_rolling_quantile(spark):
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("x1"), eng.create("x2")
    for i in range(30):
        eng.add("x1", i * 1000, float(i % 5) + 0.1 * i)
        if i >= 1:  # x2 echoes x1 one step later
            eng.add("x2", i * 1000, 2.0 * (float((i - 1) % 5) + 0.1 * (i - 1)))
    lags = [-2000, -1000, 0, 1000, 2000]
    xc = {r.lag: r.corr for r in eng.xcorr("x1", "x2", lags).collect()}
    assert xc[1000] == pytest.approx(1.0, abs=1e-9)
    best = eng.lead_lag("x1", "x2", lags).collect()
    assert len(best) == 1 and best[0].lag == 1000
    with pytest.raises(ValueError, match="ambiguous"):
        eng.xcorr("x1", "x2", lags, from_ts="$")
    rq = {r.ts: r.rq for r in eng.rolling_quantile("x1", 0.5, 3).collect()}
    assert rq[0] is None and rq[1000] is None
    # window at ts=2000: values of ts 0..2000
    vals = sorted(float(i % 5) + 0.1 * i for i in range(3))
    assert rq[2000] == pytest.approx(vals[1], abs=1e-9)
