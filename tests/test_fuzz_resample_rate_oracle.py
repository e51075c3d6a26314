"""Randomized differential fuzz for ts_resample and ts_increase vs
independent DuckDB oracles (the round-5 seeded-spec treatment the
percentile/range/mrange/nrange surfaces already get).

ts_resample's oracle is deliberately a DIFFERENT shape than the
implementation: DuckDB ASOF joins attach the bracketing samples to an
explicitly generated grid (the operator uses a union + two window
passes), so a bug in the window framing can't cancel out of both sides.
ts_increase's oracle is the written definition: lag over the FULL
per-key history, reset steps, range cut AFTER the lag, per-bucket sum
emitted only when any step exists.

Spec space: random key subsets x step/bucket durations that divide,
exceed, and are coprime to the sample cadence x ALIGN x time ranges x
method/per_second — plus pinned edge specs (sample exactly on a grid
point; counter reset exactly at a bucket boundary).  ~10% NaN samples;
seeded RNG.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.buckets import bucket_sql, resolve_align
from redistimeseries_spark.operators.rate import ts_increase
from redistimeseries_spark.operators.resample import ts_resample

NAN = float("nan")
KEYS = ["r1", "r2", "r3", "r4"]
N_SPECS = 12


def _resample_dataset(rng: random.Random):
    rows = []
    for k in KEYS:
        # distinct ts per key (duplicate samples are the dup-policy
        # fold's job upstream of this operator)
        for t in rng.sample(range(0, 60_000), rng.randint(15, 45)):
            v = NAN if rng.random() < 0.1 else rng.uniform(-50.0, 50.0)
            rows.append((k, t, v))
    # pinned edge: a key whose samples sit EXACTLY on the 1000-grid
    rows += [("rg", t * 1000, float(t)) for t in range(3, 9)]
    return rows


def _counter_dataset(rng: random.Random):
    rows = []
    for k in KEYS:
        ts = sorted(rng.sample(range(0, 60_000), rng.randint(20, 50)))
        v = 0.0
        for t in ts:
            if rng.random() < 0.08:
                v = rng.uniform(0.0, 5.0)  # reset: restart near zero
            else:
                v += rng.uniform(0.0, 10.0)
            rows.append((k, t, NAN if rng.random() < 0.1 else v))
    # pinned edge: a reset exactly at a 1000-bucket boundary
    rows += [
        ("rb", 500, 10.0), ("rb", 999, 20.0), ("rb", 1000, 2.0),
        ("rb", 1500, 8.0), ("rb", 2000, 9.0),
    ]
    return rows


def _normalize(p: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(p.columns)
    p = p[cols].copy()
    for c in cols:
        if p[c].dtype.kind == "f":
            p[c] = p[c].round(6)
    return p.sort_values(cols).reset_index(drop=True)


def _range_sql(spec, extra=None):
    where = list(extra or [])
    if spec.get("keys"):
        ks = ", ".join(repr(k) for k in spec["keys"])
        where.append(f"key IN ({ks})")
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    return (" WHERE " + " AND ".join(where)) if where else ""


def _resample_oracle(spec) -> str:
    step = spec["step"]
    pred = _range_sql(spec, ["NOT isnan(value)"])
    if spec["method"] == "locf":
        val = "p.value"
    else:
        val = (
            "CASE WHEN p.ts = g.ts THEN p.value "
            "WHEN n.ts IS NULL THEN p.value "
            "ELSE p.value + (n.value - p.value) * (g.ts - p.ts)"
            " / (n.ts - p.ts) END"
        )
    return f"""
      WITH s AS (SELECT key, ts, value FROM t{pred}),
      b AS (SELECT key, min(ts) AS lo, max(ts) AS hi FROM s GROUP BY key),
      g AS (SELECT key, unnest(range(
              (lo + {step} - 1) - (lo + {step} - 1) % {step},
              hi - hi % {step} + 1, {step})) AS ts
            FROM b
            WHERE (lo + {step} - 1) - (lo + {step} - 1) % {step}
                  <= hi - hi % {step}),
      p AS (SELECT g.key, g.ts, s.value, s.ts AS sts
            FROM g ASOF LEFT JOIN s ON g.key = s.key AND s.ts <= g.ts),
      n AS (SELECT g.key, g.ts, s.value, s.ts AS sts
            FROM g ASOF LEFT JOIN s ON g.key = s.key AND s.ts >= g.ts)
      SELECT g.key, g.ts, {val.replace('p.ts', 'p.sts').replace('n.ts', 'n.sts')} AS value
      FROM g
      JOIN p ON g.key = p.key AND g.ts = p.ts
      JOIN n ON g.key = n.key AND g.ts = n.ts
    """


def _increase_oracle(spec) -> str:
    align_ts = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", spec["dur"], align_ts)
    kpred = ""
    if spec.get("keys"):
        ks = ", ".join(repr(k) for k in spec["keys"])
        kpred = f" AND key IN ({ks})"
    cut = []
    if spec["start"] > MIN_TS:
        cut.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        cut.append(f"ts <= {spec['end']}")
    cut_sql = (" WHERE " + " AND ".join(cut)) if cut else ""
    val = "sum(step)"
    col = "increase"
    if spec["per_second"]:
        val = f"sum(step) / {spec['dur'] / 1000.0!r}"
        col = "rate"
    return f"""
      WITH v AS (SELECT key, ts, value FROM t
                 WHERE NOT isnan(value){kpred}),
      d AS (SELECT key, ts, value,
                   lag(value) OVER (PARTITION BY key ORDER BY ts) AS prev
            FROM v),
      s AS (SELECT key, ts,
                   CASE WHEN prev IS NULL THEN NULL
                        WHEN value >= prev THEN value - prev
                        ELSE value END AS step
            FROM d),
      r AS (SELECT key, ts, step FROM s{cut_sql})
      SELECT key, {b} AS ts, {val} AS {col}
      FROM r GROUP BY 1, 2 HAVING count(step) > 0
    """


@pytest.fixture(scope="module")
def envs(spark):
    rng = random.Random(0x5E5A)
    res_rows = _resample_dataset(rng)
    cnt_rows = _counter_dataset(rng)
    res_sdf = spark.createDataFrame(
        res_rows, "key string, ts long, value double"
    ).cache()
    cnt_sdf = spark.createDataFrame(
        cnt_rows, "key string, ts long, value double"
    ).cache()
    res_sdf.count(), cnt_sdf.count()
    rcon, ccon = duckdb.connect(), duckdb.connect()
    for con, rows in ((rcon, res_rows), (ccon, cnt_rows)):
        con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    yield rng, res_sdf, rcon, cnt_sdf, ccon
    res_sdf.unpersist(), cnt_sdf.unpersist()


def test_fuzz_resample_vs_duckdb(envs):
    rng, sdf, con, _, _ = envs
    all_keys = KEYS + ["rg"]
    specs = [
        # pinned: grid step == the on-grid key's cadence (sample-on-grid)
        {"keys": ["rg"], "step": 1000, "method": "linear",
         "start": MIN_TS, "end": MAX_TS},
        {"keys": ["rg"], "step": 1000, "method": "locf",
         "start": MIN_TS, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "step": rng.choice([500, 700, 1000, 2600, 9000]),
            "method": rng.choice(["locf", "linear"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.5:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        got = _normalize(
            ts_resample(
                sdf, s["step"], s["method"], keys=s["keys"],
                start=s["start"], end=s["end"],
            ).toPandas()
        )
        exp = _normalize(con.sql(_resample_oracle(s)).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def test_fuzz_resample_chunk_context(spark):
    """The chunk-local ts_resample (late round 9) ≡ the retained
    bare-key-window twin under FORCED TINY CHUNKS (4096 ms): brackets
    that live in a neighboring chunk, grid points inside multi-chunk
    sample-free gaps, duplicate (key, ts) samples (the (ts, value)
    last-wins rule on both plans), and chunk-boundary grid points."""
    from redistimeseries_spark.operators.resample import (
        METHODS,
        _ts_resample_key_window,
    )

    rng = random.Random(0xC47)
    rows = []
    for k in ("c1", "c2"):
        for t in rng.sample(range(0, 50_000), 30):
            rows.append((k, t, rng.uniform(-5.0, 5.0)))
        # duplicate-ts pair: both plans must read the max-value twin
        rows += [(k, 12_345, 1.0), (k, 12_345, 9.0)]
        # a grid point exactly on a chunk boundary (4096 * 3)
        rows += [(k, 4096 * 3, 7.0)]
    # ~10 consecutive sample-free chunks mid-series + NaN at the edge
    rows += [("c3", 0, 1.0), ("c3", 7, NAN), ("c3", 40_000, 5.0)]
    # PINNED (round-9 ADVICE): a duplicate pair as the FIRST sample of a
    # chunk serving a cross-chunk NEXT bracket — the chunk-context __f
    # must hand grids 1000..4000 the MAX-value duplicate (9.0), not the
    # struct-min's 1.0
    rows += [("c4", 0, 1.0), ("c4", 5000, 1.0), ("c4", 5000, 9.0)]
    # same layout across a run of sample-free chunks
    rows += [("c5", 0, 2.0), ("c5", 4096 * 3 + 10, 1.0),
             ("c5", 4096 * 3 + 10, 9.0)]
    sdf = spark.createDataFrame(
        rows, "key string, ts long, value double"
    ).cache()
    sdf.count()
    try:
        failures = []
        for step in (700, 1000, 2600, 9000):
            for method in METHODS:
                got = _normalize(
                    ts_resample(sdf, step, method, chunk_ms=4096).toPandas()
                )
                ref = _normalize(
                    _ts_resample_key_window(sdf, step, method).toPandas()
                )
                if not got.equals(ref):
                    failures.append((step, method, got.shape, ref.shape))
        assert not failures, failures
    finally:
        sdf.unpersist()


def test_fuzz_increase_vs_duckdb(envs):
    rng, _, _, sdf, con = envs
    all_keys = KEYS + ["rb"]
    specs = [
        # pinned: reset exactly at a bucket boundary (rb @ ts=1000)
        {"keys": ["rb"], "dur": 1000, "align": "0", "per_second": False,
         "start": MIN_TS, "end": MAX_TS},
        # pinned: range cut AFTER the first sample — the lag must still
        # see the true predecessor, not fabricate a reset at the cut
        {"keys": ["rb"], "dur": 1000, "align": "0", "per_second": False,
         "start": 1200, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "dur": rng.choice([700, 1000, 3600, 7919]),
            "align": rng.choice(["0", "start"]),
            "per_second": rng.random() < 0.3,
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.6:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"  # ALIGN start needs a concrete start
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        got = _normalize(
            ts_increase(
                sdf, s["dur"], keys=s["keys"], start=s["start"],
                end=s["end"], align=s["align"], per_second=s["per_second"],
            ).toPandas()
        )
        exp = _normalize(con.sql(_increase_oracle(s)).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def _deriv_oracle(spec) -> str:
    align_ts = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", spec["dur"], align_ts)
    where = ["NOT isnan(value)"]
    if spec.get("keys"):
        ks = ", ".join(repr(k) for k in spec["keys"])
        where.append(f"key IN ({ks})")
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    return f"""
      WITH s AS (SELECT key, value, {b} AS b, ts FROM t
                 WHERE {' AND '.join(where)})
      SELECT key, b AS ts, regr_slope(value, (ts - b) / 1000.0) AS slope
      FROM s GROUP BY key, b
      HAVING regr_slope(value, (ts - b) / 1000.0) IS NOT NULL
    """


def test_fuzz_deriv_vs_duckdb(envs):
    """ts_deriv vs DuckDB regr_slope on the gauge dataset — same spec
    axes as the increase fuzzer (the range cut binds BEFORE the lag-free
    grouping here, so no predecessor subtlety), plus a pinned spec whose
    bucket is wider than the whole dataset (one global regression)."""
    from redistimeseries_spark.operators.rate import ts_deriv

    rng, sdf, con, _, _ = envs
    all_keys = KEYS + ["rg"]
    specs = [
        {"keys": None, "dur": 1_000_000, "align": "0",
         "start": MIN_TS, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "dur": rng.choice([700, 1000, 3600, 7919, 25_000]),
            "align": rng.choice(["0", "start"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.6:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        got = _normalize(
            ts_deriv(
                sdf, s["dur"], keys=s["keys"], start=s["start"],
                end=s["end"], align=s["align"],
            ).toPandas()
        )
        exp = _normalize(con.sql(_deriv_oracle(s)).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def _delta_oracle(spec) -> str:
    align_ts = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", spec["dur"], align_ts)
    where = ["NOT isnan(value)"]
    if spec.get("keys"):
        ks = ", ".join(repr(k) for k in spec["keys"])
        where.append(f"key IN ({ks})")
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    return f"""
      WITH s AS (SELECT key, value, {b} AS b, ts FROM t
                 WHERE {' AND '.join(where)})
      SELECT key, b AS ts,
             last(value ORDER BY ts, value)
               - first(value ORDER BY ts, value DESC) AS delta
      FROM s GROUP BY key, b
      HAVING count(DISTINCT ts) >= 2
    """


def test_fuzz_delta_vs_duckdb(envs):
    """ts_delta (round 7, PromQL delta's bucket-local core) vs a DuckDB
    arg_max/arg_min oracle — deriv's spec axes (bucket-local, cut before
    grouping, no predecessor subtlety), gauge dataset so deltas go
    NEGATIVE legitimately."""
    from redistimeseries_spark.operators.rate import ts_delta

    rng, sdf, con, _, _ = envs
    all_keys = KEYS + ["rg"]
    specs = [
        {"keys": None, "dur": 1_000_000, "align": "0",
         "start": MIN_TS, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "dur": rng.choice([700, 1000, 3600, 7919, 25_000]),
            "align": rng.choice(["0", "start"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.6:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        got = _normalize(
            ts_delta(
                sdf, s["dur"], keys=s["keys"], start=s["start"],
                end=s["end"], align=s["align"],
            ).toPandas()
        )
        exp = _normalize(con.sql(_delta_oracle(s)).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def test_fuzz_delta_dup_ts(spark):
    """ts_delta on duplicate-(key, ts) input (round 10): the (ts, value)
    last-wins rule makes the MAX-value duplicate the effective sample at
    both bucket endpoints, so the result is deterministic across
    retries.  Oracle: DuckDB ordered-aggregate first/last with the same
    (ts, value desc / asc) orderings."""
    from redistimeseries_spark.operators.rate import ts_delta

    rng = random.Random(0xDE17A)
    rows = []
    for k in ("d1", "d2"):
        for t in rng.sample(range(0, 20_000), 40):
            rows.append((k, t, rng.uniform(-50.0, 50.0)))
            if rng.random() < 0.3:  # duplicate the ts with another value
                rows.append((k, t, rng.uniform(-50.0, 50.0)))
    # pinned: duplicates at BOTH bucket endpoints
    rows += [("d3", 0, 1.0), ("d3", 0, 9.0), ("d3", 900, 3.0),
             ("d3", 900, 7.0)]
    # pinned (round-10 review): a bucket holding ONLY duplicates of one
    # ts is ONE effective sample — no delta row may be emitted
    rows += [("d4", 0, 1.0), ("d4", 0, 9.0)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for dur in (700, 1000, 7919):
        got = _normalize(ts_delta(sdf, dur).toPandas())
        exp = _normalize(con.sql(f"""
          WITH s AS (SELECT key, value, ts - ts % {dur} AS b, ts FROM t)
          SELECT key, b AS ts,
                 last(value ORDER BY ts, value)
                   - first(value ORDER BY ts, value DESC) AS delta
          FROM s GROUP BY key, b HAVING count(DISTINCT ts) >= 2
        """).df())
        assert got.equals(exp), (dur, got.shape, exp.shape)


def _event_oracle(spec, cond: str, col: str) -> str:
    """changes/resets oracle: the written definition — full-history lag,
    event indicator vs the previous valid sample, cut AFTER the lag,
    emit buckets where any sample has a predecessor."""
    align_ts = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", spec["dur"], align_ts)
    kpred = ""
    if spec.get("keys"):
        ks = ", ".join(repr(k) for k in spec["keys"])
        kpred = f" AND key IN ({ks})"
    cut = []
    if spec["start"] > MIN_TS:
        cut.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        cut.append(f"ts <= {spec['end']}")
    cut_sql = (" WHERE " + " AND ".join(cut)) if cut else ""
    return f"""
      WITH v AS (SELECT key, ts, value FROM t
                 WHERE NOT isnan(value){kpred}),
      d AS (SELECT key, ts, value,
                   lag(value) OVER (PARTITION BY key ORDER BY ts) AS prev
            FROM v),
      s AS (SELECT key, ts,
                   CASE WHEN prev IS NULL THEN NULL
                        WHEN {cond} THEN 1 ELSE 0 END AS e
            FROM d),
      r AS (SELECT key, ts, e FROM s{cut_sql})
      SELECT key, {b} AS ts, count(*) FILTER (WHERE e = 1) AS {col}
      FROM r GROUP BY 1, 2 HAVING count(e) > 0
    """


def test_fuzz_changes_resets_vs_duckdb(envs):
    """ts_changes/ts_resets vs the written-definition oracle on the
    counter dataset (which plants resets, NaN links, and a boundary
    reset) — the increase fuzzer's spec axes, both event kinds."""
    from redistimeseries_spark.operators.rate import ts_changes, ts_resets

    rng, _, _, sdf, con = envs
    all_keys = KEYS + ["rb"]
    specs = [
        {"keys": ["rb"], "dur": 1000, "align": "0", "kind": "resets",
         "start": MIN_TS, "end": MAX_TS},
        {"keys": ["rb"], "dur": 1000, "align": "0", "kind": "changes",
         "start": 1200, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "dur": rng.choice([700, 1000, 3600, 7919]),
            "align": rng.choice(["0", "start"]),
            "kind": rng.choice(["changes", "resets"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.6:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        fn = ts_changes if s["kind"] == "changes" else ts_resets
        cond = "value <> prev" if s["kind"] == "changes" else "value < prev"
        got = _normalize(
            fn(
                sdf, s["dur"], keys=s["keys"], start=s["start"],
                end=s["end"], align=s["align"],
            ).toPandas()
        )
        exp = _normalize(con.sql(_event_oracle(s, cond, s["kind"])).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def test_fuzz_predict_linear_vs_duckdb(envs):
    """ts_predict_linear vs regr_slope+regr_intercept extrapolation on
    the gauge dataset — the deriv fuzzer's axes plus random horizons
    (including 0 = the bucket end itself)."""
    from redistimeseries_spark.operators.rate import ts_predict_linear

    rng, sdf, con, _, _ = envs
    all_keys = KEYS + ["rg"]
    specs = [
        {"keys": None, "dur": 1_000_000, "horizon": 0, "align": "0",
         "start": MIN_TS, "end": MAX_TS},
    ]
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(1, 3)),
            "dur": rng.choice([700, 1000, 3600, 7919, 25_000]),
            "horizon": rng.choice([0, 500, 1000, 60_000]),
            "align": rng.choice(["0", "start"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.6:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        align_ts = resolve_align(s["align"], s["start"], s["end"])
        b = bucket_sql("ts", s["dur"], align_ts)
        where = ["NOT isnan(value)"]
        if s.get("keys"):
            ks = ", ".join(repr(k) for k in s["keys"])
            where.append(f"key IN ({ks})")
        if s["start"] > MIN_TS:
            where.append(f"ts >= {s['start']}")
        if s["end"] < MAX_TS:
            where.append(f"ts <= {s['end']}")
        xp = (s["dur"] + s["horizon"]) / 1000.0
        sql = f"""
          WITH s AS (SELECT key, value, {b} AS b, ts FROM t
                     WHERE {' AND '.join(where)})
          SELECT key, b AS ts,
                 regr_intercept(value, (ts - b) / 1000.0)
                   + regr_slope(value, (ts - b) / 1000.0) * {xp!r} AS predicted
          FROM s GROUP BY key, b
          HAVING regr_slope(value, (ts - b) / 1000.0) IS NOT NULL
        """
        got = _normalize(
            ts_predict_linear(
                sdf, s["dur"], s["horizon"], keys=s["keys"],
                start=s["start"], end=s["end"], align=s["align"],
            ).toPandas()
        )
        exp = _normalize(con.sql(sql).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]


def test_fuzz_topk_vs_duckdb(envs):
    """ts_topk vs a written-definition SQL window oracle on the gauge
    dataset — agg x n x bottom x ALIGN x range; rounded-value ranking
    with key tiebreak on both sides."""
    from redistimeseries_spark.functions.aggs import agg_sql
    from redistimeseries_spark.operators.multi import ts_topk

    rng, sdf, con, _, _ = envs
    all_keys = KEYS + ["rg"]
    specs = []
    while len(specs) < N_SPECS:
        s = {
            "keys": rng.sample(all_keys, rng.randint(2, 5)),
            "dur": rng.choice([700, 1000, 3600, 7919, 25_000]),
            "n": rng.randint(1, 4),
            "agg": rng.choice(["avg", "max", "sum", "count", "last", "p50"]),
            "bottom": rng.random() < 0.4,
            "align": rng.choice(["0", "start"]),
            "start": MIN_TS,
            "end": MAX_TS,
        }
        if rng.random() < 0.5:
            lo = rng.randrange(0, 40_000)
            s["start"], s["end"] = lo, lo + rng.randrange(5_000, 40_000)
        if s["align"] == "start" and s["start"] == MIN_TS:
            s["align"] = "0"
        specs.append(s)
    failures = []
    for i, s in enumerate(specs):
        align_ts = resolve_align(s["align"], s["start"], s["end"])
        b = bucket_sql("ts", s["dur"], align_ts)
        where = []
        ks = ", ".join(repr(k) for k in s["keys"])
        where.append(f"key IN ({ks})")
        if s["start"] > MIN_TS:
            where.append(f"ts >= {s['start']}")
        if s["end"] < MAX_TS:
            where.append(f"ts <= {s['end']}")
        if s["agg"] == "p50":
            vexpr = "quantile_cont(CASE WHEN NOT isnan(value) THEN value END, 0.5)"
        else:
            vexpr = agg_sql(s["agg"])
        direction = "ASC" if s["bottom"] else "DESC"
        sql = f"""
          WITH a AS (SELECT key, {b} AS bk, round({vexpr}, 6) AS v
                     FROM t WHERE {' AND '.join(where)} GROUP BY 1, 2),
          r AS (SELECT *, CAST(row_number() OVER (
                    PARTITION BY bk ORDER BY v {direction}, key) AS INTEGER) AS rnk
                FROM a WHERE v IS NOT NULL AND NOT isnan(v))
          SELECT bk AS ts, key, v AS value, rnk FROM r WHERE rnk <= {s['n']}
        """
        got = _normalize(
            ts_topk(
                sdf, s["dur"], s["n"], agg=s["agg"], keys=s["keys"],
                start=s["start"], end=s["end"], align=s["align"],
                bottom=s["bottom"],
            ).toPandas()
        )
        exp = _normalize(con.sql(sql).df())
        if not got.equals(exp):
            failures.append((i, s, got.shape, exp.shape))
    assert not failures, failures[:2]
