"""Randomized TS.RANGE differential fuzz vs a DuckDB oracle.

The reference's own oracle strategy (tests/flow/test_ts_nrange_compare.py:
run the query two independent ways, compare) applied to *random* query
specs over the full TS.RANGE option space: time range x FILTER_BY_TS x
FILTER_BY_VALUE x (multi-)AGGREGATION x ALIGN x BUCKETTIMESTAMP x COUNT x
REV.  The oracle SQL is assembled from the same published fragments the
correctness gate uses (functions.aggs.agg_sql, functions.buckets.bucket_sql
/ report_ts_sql) so a bug in the Spark plan cannot hide behind a matching
bug in a hand-written per-case oracle.

The dataset carries ~10% NaN values, injected as genuine NaN doubles on
BOTH engines (pandas hand-off would silently convert NaN -> NULL, which is
outside the reference's data model — it stores NaN, src/consts.h values).
This puts the per-aggregator validity rules under test in every spec:
bucket emission is the OR of each requested aggregator's isValueValid
(src/filter_iterator.c:1286-1292; nanValueValid for count_nan,
allValueValid for count_all, src/compaction.c:944-978), per-agg
finalizeEmpty for emitted buckets where an aggregator saw nothing valid,
and LOCF carry-over for `last` (src/compaction.c:81-84,115-121).

Seeded RNG: every run exercises the same 24 specs (reproducible failures).
This fuzz caught a real divergence on first run: only-NaN buckets were
dropped even when count_all / count_nan was among the aggregators.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.aggs import agg_sql, empty_value, sanitize
from redistimeseries_spark.functions.buckets import (
    bucket_sql,
    report_ts_sql,
    resolve_align,
)
from redistimeseries_spark.operators.range_query import ts_range

NAN = float("nan")
COUNT_CLASSES = {"count_nan", "count_all"}
SQL_AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "std.s", "var.p", "var.s", "p50", "p90",
]
N_SPECS = 24


def _dataset(rng: random.Random) -> list[tuple[str, int, float]]:
    rows = []
    for k in ["a", "b", "c", "d"]:
        n = rng.randint(40, 120)
        tss = rng.sample(range(0, 200_000), n)
        for t in tss:
            v = NAN if rng.random() < 0.1 else rng.uniform(-100.0, 100.0)
            rows.append((k, t, v))
    return rows


def _spec(rng: random.Random) -> dict:
    spec: dict = {}
    if rng.random() < 0.7:
        lo = rng.randrange(0, 150_000)
        spec["start"], spec["end"] = lo, lo + rng.randrange(20_000, 120_000)
    else:
        spec["start"], spec["end"] = MIN_TS, MAX_TS
    if rng.random() < 0.25:
        spec["filter_by_ts"] = rng.sample(range(0, 200_000), rng.randint(3, 60))
    if rng.random() < 0.35:
        lo = rng.uniform(-120, 80)
        spec["filter_by_value"] = (lo, lo + rng.uniform(1, 150))
    if rng.random() < 0.75:
        spec["aggregations"] = rng.sample(SQL_AGGS, rng.randint(1, 3))
        spec["bucket_dur"] = rng.choice([700, 1000, 3600, 7919, 25_000])
        spec["align"] = rng.choice(
            ["0", "start", "end", str(rng.randrange(0, spec["bucket_dur"]))]
        )
        spec["bucket_ts"] = rng.choice(["-", "~", "+"])
        # EMPTY x FILTER_BY is the reference's dedicated stress surface
        # (tests/flow/test_ts_range_empty_filter_stress.py) — the spine
        # derives from the FILTERED samples
        spec["empty"] = rng.random() < 0.3
    spec["rev"] = rng.random() < 0.3
    if rng.random() < 0.3 and not spec.get("empty"):
        spec["count"] = rng.randint(1, 25)
    return spec


def _oracle(spec: dict) -> str:
    where = ["1=1"]
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    if "filter_by_ts" in spec:
        lst = ", ".join(str(t) for t in spec["filter_by_ts"][:128])
        where.append(f"ts IN ({lst})")
    if "filter_by_value" in spec:
        lo, hi = spec["filter_by_value"]
        where.append(f"NOT isnan(value) AND value >= {lo} AND value <= {hi}")
    pred = " AND ".join(where)
    direction = "DESC" if spec["rev"] else "ASC"

    aggs = spec.get("aggregations")
    if not aggs:
        body = f"SELECT key, ts, value FROM t WHERE {pred}"
        if spec.get("count") is not None:
            body += (
                f" QUALIFY row_number() OVER (PARTITION BY key "
                f"ORDER BY ts {direction}) <= {spec['count']}"
            )
        return body

    dur = spec["bucket_dur"]
    align = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", dur, align)
    rep = report_ts_sql("b", dur, spec["bucket_ts"])
    raw_cols = ", ".join(f"{agg_sql(a)} AS {sanitize(a)}" for a in aggs)

    if spec.get("empty"):
        # EMPTY spine over the FILTERED samples' first..last bucket;
        # finalizeEmpty per agg, real counts for count classes on only-NaN
        # buckets, LOCF for last (operators/empty.py rules)
        fills = []
        for a in aggs:
            name = sanitize(a)
            if a == "last":
                fills.append(
                    f"round(coalesce(last_value(CASE WHEN nv > 0 THEN {name} END"
                    f" IGNORE NULLS) OVER (PARTITION BY key ORDER BY b ROWS BETWEEN"
                    f" UNBOUNDED PRECEDING AND CURRENT ROW), 'nan'::DOUBLE), 6) AS {name}"
                )
            elif a in COUNT_CLASSES:
                fills.append(f"round(coalesce({name}, 0.0), 6) AS {name}")
            else:
                ev = "0.0" if empty_value(a) == 0.0 else "'nan'::DOUBLE"
                fills.append(
                    f"round(CASE WHEN coalesce(nv, 0) > 0 THEN {name} ELSE {ev} END, 6)"
                    f" AS {name}"
                )
        return f"""WITH agg AS (
  SELECT key, b, {raw_cols},
         count(CASE WHEN NOT isnan(value) THEN 1 END) AS nv
  FROM (SELECT key, ts, value, {b} AS b FROM t WHERE {pred})
  GROUP BY key, b
),
bounds AS (SELECT key, min(b) AS lo, max(b) AS hi
           FROM (SELECT key, {b} AS b FROM t WHERE {pred}) GROUP BY 1),
spine AS (SELECT key, unnest(generate_series(lo, hi, {dur})) AS b FROM bounds),
j AS (SELECT spine.key, spine.b,
             {', '.join('agg.' + sanitize(a) for a in aggs)}, agg.nv
      FROM spine LEFT JOIN agg ON spine.key = agg.key AND spine.b = agg.b)
SELECT key, {rep} AS ts, {', '.join(fills)} FROM j"""

    # bucket emission = OR over requested aggregators' isValueValid
    emits = []
    if set(aggs) - COUNT_CLASSES:
        emits.append("nv > 0")
    if "count_nan" in aggs:
        emits.append("nn > 0")
    if "count_all" in aggs:
        emits.append("TRUE")
    emit = " OR ".join(emits)

    final_cols = []
    for a in aggs:
        name = sanitize(a)
        if a == "last" and set(aggs) & COUNT_CLASSES:
            # LOCF carry-over into emitted buckets where last saw no valid
            # sample (finalize_empty_last_value)
            final_cols.append(
                f"round(last_value(CASE WHEN nv > 0 THEN {name} END IGNORE NULLS) "
                f"OVER (PARTITION BY key ORDER BY b "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS {name}"
            )
        else:
            final_cols.append(f"round({name}, 6) AS {name}")

    body = f"""WITH agg AS (
  SELECT key, b, {raw_cols},
         count(CASE WHEN NOT isnan(value) THEN 1 END) AS nv,
         count(CASE WHEN isnan(value) THEN 1 END) AS nn
  FROM (SELECT key, ts, value, {b} AS b FROM t WHERE {pred})
  GROUP BY key, b
),
win AS (SELECT key, b, {', '.join(final_cols)}, ({emit}) AS __emit FROM agg)
SELECT key, {rep} AS ts, {', '.join(sanitize(a) for a in aggs)}
FROM win WHERE __emit"""
    if spec.get("count") is not None:
        body += (
            f" QUALIFY row_number() OVER (PARTITION BY key "
            f"ORDER BY {rep} {direction}) <= {spec['count']}"
        )
    return body


@pytest.fixture(scope="module")
def fuzz_env(spark):
    rng = random.Random(0xDEC0DE)
    rows = _dataset(rng)
    sdf = spark.createDataFrame(
        rows, "key string, ts long, value double"
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    yield rng, sdf, con
    sdf.unpersist()


def _normalize(p: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(p.columns)
    p = p[cols].copy()
    for c in cols:
        if p[c].dtype.kind == "f":
            p[c] = p[c].round(6)
    return p.sort_values(cols).reset_index(drop=True)


def test_fuzz_range_vs_duckdb(fuzz_env):
    rng, sdf, con = fuzz_env
    failures = []
    for i in range(N_SPECS):
        spec = _spec(rng)
        got = ts_range(sdf, **spec).toPandas()
        for a in spec.get("aggregations") or []:
            got[sanitize(a)] = got[sanitize(a)].round(6)
        exp = con.sql(_oracle(spec)).df()
        got, exp = _normalize(got), _normalize(exp)
        if not got.equals(exp):
            failures.append((i, spec, len(got), len(exp)))
    assert not failures, failures[:3]
