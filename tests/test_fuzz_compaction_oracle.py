"""Randomized compaction-rule differential fuzz vs a DuckDB oracle.

Covers the continuous-aggregation surface the range fuzzers don't: the
closed-bucket dest content (reference: a bucket is finalized only when a
newer sample lands — so the bucket holding each key's LAST sample is
open, src/module.c:915-984), the LATEST view (open bucket finalized on
the fly, src/tsdb.c:1468-1501), dest-key naming, ALIGN arithmetic on the
bucket boundary, and `latest_value` (TS.GET ... LATEST = max_by over the
open-inclusive view).

Random specs: 13 aggregators x bucket duration x ALIGN x include_open,
over multi-key datasets with ~10% NaN.  The oracle is assembled from the
same published fragments the gate uses (agg_sql / bucket_sql), with the
open-bucket cut and the valid-sample emission rule composed around them.
TWA rules are excluded here — the cross-bucket boundary interpolation has
its own differential suite (test_empty_twa, ts_compaction_twa_1h gate).

Seeded RNG: reproducible specs.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from redistimeseries_spark.functions.aggs import agg_sql, sanitize
from redistimeseries_spark.functions.buckets import bucket_sql
from redistimeseries_spark.streaming.compaction import (
    CompactionRule,
    latest_value,
    materialize_rule,
)

NAN = float("nan")
N_SPECS = 16
AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "std.s", "var.p", "p50", "p90",
]
KEYS = ["k1", "k2", "k3", "k4"]


def _dataset(rng: random.Random):
    rows = []
    for k in KEYS:
        for t in rng.sample(range(0, 100_000), rng.randint(20, 60)):
            v = NAN if rng.random() < 0.1 else rng.uniform(-50.0, 50.0)
            rows.append((k, t, v))
    return rows


def _oracle(agg: str, dur: int, align: int, include_open: bool) -> str:
    b = bucket_sql("ts", dur, align)
    emit = {"count_nan": "nn > 0", "count_all": "TRUE"}.get(agg, "nv > 0")
    cut = "" if include_open else "AND a.b < o.open"
    return f"""WITH
s AS (SELECT key, ts, value, {b} AS b FROM t),
a AS (SELECT key, b, {agg_sql(agg)} AS value,
             count(CASE WHEN NOT isnan(value) THEN 1 END) AS nv,
             count(CASE WHEN isnan(value) THEN 1 END) AS nn
      FROM s GROUP BY 1, 2),
o AS (SELECT key, {bucket_sql('max(ts)', dur, align)} AS open FROM t GROUP BY key)
SELECT a.key || '_dst' AS key, a.b AS ts, a.value AS value
FROM a JOIN o USING (key)
WHERE ({emit}) {cut}"""


def _normalize(p: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(p.columns)
    p = p[cols].copy()
    for c in cols:
        if p[c].dtype.kind == "f":
            p[c] = p[c].round(6)
    return p.sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def compaction_env(spark):
    rng = random.Random(0xCA5C)
    rows = _dataset(rng)
    sdf = spark.createDataFrame(rows, "key string, ts long, value double").cache()
    sdf.count()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    yield rng, sdf, con
    sdf.unpersist()


def test_fuzz_compaction_vs_duckdb(compaction_env):
    rng, sdf, con = compaction_env
    failures = []
    for i in range(N_SPECS):
        agg = rng.choice(AGGS)
        dur = rng.choice([700, 1000, 3600, 7919, 20_000])
        align = rng.choice([0, dur // 3, dur - 1])
        include_open = rng.random() < 0.5
        rule = CompactionRule(None, "_dst", agg, dur, align)
        got = _normalize(
            materialize_rule(sdf, rule, include_open=include_open).toPandas()
        )
        exp = _normalize(con.sql(_oracle(agg, dur, align, include_open)).df())
        if not got.equals(exp):
            failures.append((i, agg, dur, align, include_open, len(got), len(exp)))
    assert not failures, failures[:3]


def test_fuzz_latest_value_vs_duckdb(compaction_env):
    """TS.GET ... LATEST: max_by(ts) over the open-inclusive view equals
    the oracle's arg_max per dest key."""
    rng, sdf, con = compaction_env
    for agg in ("sum", "last", "count", "max"):
        dur = 7919
        rule = CompactionRule(None, "_dst", agg, dur, 0)
        got = _normalize(latest_value(sdf, rule).toPandas())
        exp = _normalize(
            con.sql(
                f"""WITH fv AS ({_oracle(agg, dur, 0, True)})
                SELECT key, max(ts) AS ts, arg_max(value, ts) AS value
                FROM fv GROUP BY key"""
            ).df()
        )
        assert got.equals(exp), (agg, got.head(), exp.head())
