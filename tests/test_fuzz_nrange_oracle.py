"""Randomized TS.NRANGE differential fuzz vs a composed DuckDB oracle.

The pivoted multi-key surface (reference merge+pivot, src/reply.c:381-473):
random key subsets x per-key multi-aggregation specs sharing one bucket
duration x ALIGN x BUCKETTIMESTAMP x time range x raw mode.  The oracle
stacks one SQL stage per (key, aggregator) — assembled from the same
published fragments the gate uses (agg_sql / bucket_sql / report_ts_sql) —
and pivots with conditional aggregation, NaN-filling exactly where the
operator does (a key absent at a timestamp replies NaN, src/reply.c:414-460).

~10% NaN sample values; seeded RNG for reproducible specs.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.aggs import agg_sql, sanitize
from redistimeseries_spark.functions.buckets import (
    bucket_sql,
    report_ts_sql,
    resolve_align,
)
from redistimeseries_spark.operators.nrange import ts_nrange

NAN = float("nan")
N_SPECS = 14
AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "var.s", "p50", "p95",
]
KEYS = ["n1", "n2", "n3", "n4", "n5"]


def _dataset(rng: random.Random):
    rows = []
    for k in KEYS:
        for t in rng.sample(range(0, 150_000), rng.randint(25, 70)):
            v = NAN if rng.random() < 0.1 else rng.uniform(-100.0, 100.0)
            rows.append((k, t, v))
    return rows


def _spec(rng: random.Random) -> dict:
    spec: dict = {"keys": rng.sample(KEYS, rng.randint(1, 4))}
    if rng.random() < 0.6:
        lo = rng.randrange(0, 100_000)
        spec["start"], spec["end"] = lo, lo + rng.randrange(20_000, 120_000)
    else:
        spec["start"], spec["end"] = MIN_TS, MAX_TS
    if rng.random() < 0.8:
        spec["dur"] = rng.choice([700, 1000, 3600, 7919])
        spec["align"] = rng.choice(["0", "start", str(rng.randrange(0, spec["dur"]))])
        spec["bucket_ts"] = rng.choice(["-", "~", "+"])
        spec["specs"] = {
            k: rng.sample(AGGS, rng.randint(1, 3)) for k in spec["keys"]
        }
    return spec


def _emit(agg: str) -> str:
    return {"count_nan": "nn > 0", "count_all": "TRUE"}.get(agg, "nv > 0")


def _stage_sql(spec: dict, key: str, agg: str, col: str) -> str:
    """One (key, agg) stage -> SELECT ts, '<col>' AS c, v rows.

    Multi-agg emission is the reference's single-pass rule: a bucket is
    emitted when ANY of the key's aggregators finds it valid (OR of the
    per-agg isValueValid family); within an emitted bucket an aggregator
    whose own validity fails finalizes empty — real 0 for the count
    classes, NaN otherwise."""
    where = [f"key = '{key}'"]
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    pred = " AND ".join(where)
    if "specs" not in spec:
        return f"SELECT ts, '{col}' AS c, value AS v FROM t WHERE {pred}"
    dur = spec["dur"]
    align = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", dur, align)
    rep = report_ts_sql("b", dur, spec["bucket_ts"])
    emit_or = " OR ".join(f"({_emit(a)})" for a in spec["specs"][key])
    if agg in ("count_nan", "count_all", "sum", "count"):
        # the aggregate itself is the finalize value, 0 included: sum and
        # count carry finalize_empty_with_ZERO in the reference
        # (src/compaction.c:854,873), and agg_sql already folds their
        # empty-valid case to 0 — overriding with NaN here (as this oracle
        # once did for sum/count) would contradict the reference
        v = "value"
    elif agg == "last":
        # finalizeEmpty for `last` is LOCF — the previous bucket's last
        # valid value carries into an emitted bucket where `last` itself
        # saw nothing valid (src/compaction.c:81-84,115-121); the window
        # runs over ALL buckets before the emission filter
        v = (
            "coalesce(last_value(CASE WHEN nv > 0 THEN value END IGNORE NULLS)"
            " OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),"
            " 'nan'::DOUBLE)"
        )
    else:
        v = "CASE WHEN nv > 0 THEN value ELSE 'nan'::DOUBLE END"
    return f"""SELECT {rep} AS ts, '{col}' AS c, v FROM (
      SELECT b, {v} AS v, nv, nn FROM (
        SELECT b, {agg_sql(agg)} AS value,
               count(CASE WHEN NOT isnan(value) THEN 1 END) AS nv,
               count(CASE WHEN isnan(value) THEN 1 END) AS nn
        FROM (SELECT ts, value, {b} AS b FROM t WHERE {pred}) GROUP BY b))
    WHERE {emit_or}"""


def _oracle(spec: dict) -> str:
    cols = (
        [(k, None, k) for k in spec["keys"]]
        if "specs" not in spec
        else [
            (k, a, f"{k}_{sanitize(a)}")
            for k in spec["keys"]
            for a in spec["specs"][k]
        ]
    )
    stages = " UNION ALL ".join(
        _stage_sql(spec, k, a, c) for (k, a, c) in cols
    )
    pivots = ", ".join(
        f"coalesce(max(CASE WHEN c = '{c}' THEN v END), 'nan'::DOUBLE) AS \"{c}\""
        for (_, _, c) in cols
    )
    return f"SELECT ts, {pivots} FROM ({stages}) GROUP BY ts"


def _normalize(p: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(p.columns)
    p = p[cols].copy()
    for c in cols:
        if p[c].dtype.kind == "f":
            p[c] = p[c].round(6)
    return p.sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def nrange_env(spark):
    rng = random.Random(0x9A4E)
    rows = _dataset(rng)
    sdf = spark.createDataFrame(rows, "key string, ts long, value double").cache()
    sdf.count()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    yield rng, sdf, con
    sdf.unpersist()


def test_fuzz_nrange_vs_duckdb(nrange_env):
    rng, sdf, con = nrange_env
    failures = []
    # pinned: sum/count alongside a count-class — an only-NaN bucket
    # emits (count-class widening) and sum/count must finalize to 0, not
    # NaN (finalize_empty_with_ZERO, src/compaction.c:854,873).  The
    # random specs never drew this combination in 5 rounds; the oracle
    # had it wrong and nothing noticed.
    pinned = [
        {
            "keys": ["n1", "n2"], "start": MIN_TS, "end": MAX_TS,
            "dur": 700, "align": "0", "bucket_ts": "-",
            "specs": {"n1": ["sum", "count_nan"], "n2": ["count", "count_all"]},
        }
    ]
    for i in range(N_SPECS + len(pinned)):
        spec = pinned[i] if i < len(pinned) else _spec(rng)
        kwargs = dict(keys=spec["keys"], start=spec["start"], end=spec["end"])
        if "specs" in spec:
            kwargs.update(
                agg_specs=spec["specs"], bucket_dur=spec["dur"],
                align=spec["align"], bucket_ts=spec["bucket_ts"],
            )
        got = _normalize(ts_nrange(sdf, **kwargs).toPandas())
        exp = _normalize(con.sql(_oracle(spec)).df())
        if not got.equals(exp):
            failures.append((i, spec, got.shape, exp.shape))
    assert not failures, failures[:2]
