"""Randomized TS.MRANGE differential fuzz vs a composed DuckDB oracle.

The multi-series analogue of test_fuzz_range_oracle (reference pattern:
tests/flow/test_ts_mrange_groupby.py): random specs over label FILTERs
(=, !=, =(), !=(), exists, absent) x single AGGREGATION (dur, ALIGN,
BUCKETTIMESTAMP) x EMPTY x GROUPBY label REDUCE x EXCLUDEEMPTY x COUNT x
REV.  The oracle is assembled from the same published SQL fragments the
correctness gate uses (agg_sql / bucket_sql / report_ts_sql), with the
label-match, EMPTY spine fill (finalizeEmpty, count_nan real counts, LOCF
last), reducer all-NaN -> NaN rule, and EXCLUDEEMPTY marker rows composed
around them — so the fused one-shuffle GROUPBY plan (multi.py _FUSABLE)
and the generic per-series-then-reduce plan are both checked against an
independently-composed result.

~10% NaN values on both engines; seeded RNG for reproducible specs.
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
from redistimeseries_spark.operators.labels import parse_filter
from redistimeseries_spark.operators.multi import ts_mrange

NAN = float("nan")
N_SPECS = 30
COUNT_CLASSES = {"count_nan", "count_all"}
AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "var.s", "p50", "p95",
]
REDUCERS = ["sum", "min", "max", "avg", "count", "range"]

KEYS = list("abcdefgh")
LABEL_ROWS = [
    # every key carries `tier`; env/team have absences so exists/absent
    # predicates discriminate
    *[(k, "tier", "1" if k in "abcd" else "2") for k in KEYS],
    *[(k, "env", "prod") for k in "abc"],
    *[(k, "env", "dev") for k in "de"],
    ("f", "env", "staging"),
    *[(k, "team", "t1") for k in "adg"],
    *[(k, "team", "t2") for k in "beh"],
    ("c", "team", "t3"),
]
INCLUSIVE = ["env=prod", "env=dev", "team=(t1,t2)", "tier=1", "tier=2",
             "env!=", "team!="]
EXTRA = ["team!=t2", "env=", "tier!=(2)", "team!=(t3)", "env!=staging", "team="]


def _dataset(rng: random.Random):
    rows = []
    for k in KEYS:
        for t in rng.sample(range(0, 200_000), rng.randint(30, 90)):
            v = NAN if rng.random() < 0.1 else rng.uniform(-100.0, 100.0)
            rows.append((k, t, v))
    return rows


def _spec(rng: random.Random) -> dict:
    spec: dict = {"filters": [rng.choice(INCLUSIVE)]}
    for _ in range(rng.randint(0, 2)):
        f = rng.choice(EXTRA)
        if f not in spec["filters"]:
            spec["filters"].append(f)
    if rng.random() < 0.7:
        lo = rng.randrange(0, 120_000)
        spec["start"], spec["end"] = lo, lo + rng.randrange(30_000, 150_000)
    else:
        spec["start"], spec["end"] = MIN_TS, MAX_TS
    if rng.random() < 0.75:
        spec["agg"] = rng.choice(AGGS)
        spec["dur"] = rng.choice([700, 1000, 3600, 7919, 25_000])
        spec["align"] = rng.choice(
            ["0", "start", "end", str(rng.randrange(0, spec["dur"]))]
        )
        spec["bucket_ts"] = rng.choice(["-", "~", "+"])
        spec["empty"] = rng.random() < 0.35
    if rng.random() < 0.45:
        spec["groupby"] = rng.choice(["env", "team", "tier"])
        spec["reduce"] = rng.choice(REDUCERS)
    else:
        if rng.random() < 0.3:
            spec["exclude_empty"] = False
        if not spec.get("empty") and rng.random() < 0.3:
            spec["count"] = rng.randint(1, 15)
            spec["rev"] = rng.random() < 0.5
        if rng.random() < 0.3:
            spec["selected"] = rng.sample(["env", "team", "tier"], rng.randint(1, 2))
    return spec


def _matched_keys_sql(filters: list[str]) -> str:
    conds = []
    for f in filters:
        p = parse_filter(f)
        vals = ", ".join(f"'{v}'" for v in p.values)
        sub = f"SELECT key FROM lab WHERE label = '{p.label}'"
        if p.op in ("eq", "in"):
            conds.append(f"key IN ({sub} AND value IN ({vals}))")
        elif p.op in ("ne", "notin"):
            conds.append(f"key NOT IN ({sub} AND value IN ({vals}))")
        elif p.op == "exists":
            conds.append(f"key IN ({sub})")
        else:  # notexists
            conds.append(f"key NOT IN ({sub})")
    return f"SELECT DISTINCT key FROM lab WHERE {' AND '.join(conds)}"


def _stage_sql(spec: dict) -> tuple[str, str]:
    """(per-series stage SQL producing (key, ts, <vcol>), vcol name).
    Assumes CTE `mt` = matched samples."""
    where = ["1=1"]
    if spec["start"] > MIN_TS:
        where.append(f"ts >= {spec['start']}")
    if spec["end"] < MAX_TS:
        where.append(f"ts <= {spec['end']}")
    pred = " AND ".join(where)

    agg = spec.get("agg")
    if agg is None:
        return f"SELECT key, ts, value FROM mt WHERE {pred}", "value"

    name = sanitize(agg)
    dur = spec["dur"]
    align = resolve_align(spec["align"], spec["start"], spec["end"])
    b = bucket_sql("ts", dur, align)
    rep = report_ts_sql("b", dur, spec["bucket_ts"])
    core = f"""s AS (SELECT key, ts, value, {b} AS b FROM mt WHERE {pred}),
agg AS (
  SELECT key, b, {agg_sql(agg)} AS {name},
         count(CASE WHEN NOT isnan(value) THEN 1 END) AS nv,
         count(CASE WHEN isnan(value) THEN 1 END) AS nn
  FROM s GROUP BY 1, 2
)"""
    if not spec.get("empty"):
        emit = {"count_nan": "nn > 0", "count_all": "TRUE"}.get(agg, "nv > 0")
        return (
            f"WITH {core} SELECT key, {rep} AS ts, {name} FROM agg WHERE {emit}",
            name,
        )
    # EMPTY spine: gap buckets between each key's first and last in-range
    # bucket; finalizeEmpty per agg, real counts for count_nan/count_all on
    # only-NaN buckets, LOCF for last (operators/empty.py rules)
    ev = "0.0" if empty_value(agg) == 0.0 else "'nan'::DOUBLE"
    if agg == "last":
        fill = (
            f"coalesce(last_value(CASE WHEN nv > 0 THEN {name} END IGNORE NULLS)"
            f" OVER (PARTITION BY key ORDER BY b"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'nan'::DOUBLE)"
        )
    elif agg in COUNT_CLASSES:
        fill = f"coalesce({name}, 0.0)"
    else:
        fill = f"CASE WHEN coalesce(nv, 0) > 0 THEN {name} ELSE {ev} END"
    return (
        f"""WITH {core},
bounds AS (SELECT key, min(b) AS lo, max(b) AS hi FROM s GROUP BY 1),
spine AS (SELECT key, unnest(generate_series(lo, hi, {dur})) AS b FROM bounds),
j AS (SELECT spine.key, spine.b, agg.{name}, agg.nv
      FROM spine LEFT JOIN agg ON spine.key = agg.key AND spine.b = agg.b)
SELECT key, {rep} AS ts, {fill} AS {name} FROM j""",
        name,
    )


def _oracle(spec: dict) -> str:
    mk = _matched_keys_sql(spec["filters"])
    stage, vcol = _stage_sql(spec)
    body = f"WITH mk AS ({mk}), mt AS (SELECT t.* FROM t JOIN mk USING (key)), per AS ({stage})"

    gb = spec.get("groupby")
    if gb is not None:
        red = spec["reduce"]
        vv = f"CASE WHEN NOT isnan(per.{vcol}) THEN per.{vcol} END"
        rexpr = {
            "sum": f"sum({vv})",
            "min": f"min({vv})",
            "max": f"max({vv})",
            "avg": f"avg({vv})",
            "range": f"max({vv}) - min({vv})",
            "count": f"CAST(count({vv}) AS DOUBLE)",
        }[red]
        if red != "count":
            rexpr = f"coalesce({rexpr}, 'nan'::DOUBLE)"  # all-NaN ts -> NaN
        return f"""{body}
SELECT '{gb}=' || g.grpval AS key, per.ts AS ts, {rexpr} AS {vcol}
FROM per JOIN (SELECT key, value AS grpval FROM lab WHERE label = '{gb}') g USING (key)
GROUP BY 1, 2"""

    out = "SELECT key, ts, " + vcol + " FROM per"
    if spec.get("count") is not None:
        direction = "DESC" if spec.get("rev") else "ASC"
        out += (
            f" QUALIFY row_number() OVER (PARTITION BY key"
            f" ORDER BY ts {direction}) <= {spec['count']}"
        )
    if not spec.get("exclude_empty", True):
        # EXCLUDEEMPTY off: matched series with no rows surface as a marker
        out = f"""SELECT mk.key, res.ts, res.{vcol}
FROM mk LEFT JOIN ({out}) res USING (key)"""
    for lbl in spec.get("selected") or []:
        # SELECTED_LABELS: one label-value column per selection, NULL when
        # the series lacks the label (the reference replies nil)
        out = f"""SELECT q.*, l_{lbl}.value AS {lbl}
FROM ({out}) q LEFT JOIN (SELECT key, value FROM lab WHERE label = '{lbl}') l_{lbl}
USING (key)"""
    return body + "\n" + out


def _run_spec(spec: dict, sdf, labels_df):
    kwargs = dict(
        filters=spec["filters"], start=spec["start"], end=spec["end"],
        groupby=spec.get("groupby"), reduce=spec.get("reduce"),
        exclude_empty=spec.get("exclude_empty", True),
        selected_labels=spec.get("selected"),
    )
    if spec.get("agg"):
        kwargs.update(
            aggregations=[spec["agg"]], bucket_dur=spec["dur"],
            align=spec["align"], bucket_ts=spec["bucket_ts"],
            empty=spec.get("empty", False),
        )
    if spec.get("count") is not None:
        kwargs.update(count=spec["count"], rev=spec.get("rev", False))
    return ts_mrange(sdf, labels_df, **kwargs)


def _normalize(p: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(p.columns)
    p = p[cols].copy()
    for c in cols:
        if p[c].dtype.kind == "f":
            p[c] = p[c].round(6)
        elif p[c].dtype.kind == "i":
            p[c] = p[c].astype("float64")  # nullable-ts dtype drift
    return p.sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def mrange_env(spark):
    rng = random.Random(0xF00D)
    rows = _dataset(rng)
    sdf = spark.createDataFrame(rows, "key string, ts long, value double").cache()
    sdf.count()
    labels_df = spark.createDataFrame(
        LABEL_ROWS, "key string, label string, value string"
    ).cache()
    labels_df.count()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute("CREATE TABLE lab(key VARCHAR, label VARCHAR, value VARCHAR)")
    con.executemany("INSERT INTO lab VALUES (?, ?, ?)", LABEL_ROWS)
    yield rng, sdf, labels_df, con
    sdf.unpersist()
    labels_df.unpersist()


def test_fuzz_mrange_vs_duckdb(mrange_env):
    rng, sdf, labels_df, con = mrange_env
    failures = []
    for i in range(N_SPECS):
        spec = _spec(rng)
        got = _normalize(_run_spec(spec, sdf, labels_df).toPandas())
        exp = _normalize(con.sql(_oracle(spec)).df())
        if not got.equals(exp):
            failures.append((i, spec, len(got), len(exp)))
    assert not failures, failures[:3]
