"""F3 fixture (FIXTURES.md): NaN-mix series; all 14 groupable aggregators
vs a direct Python oracle implementing src/compaction.c semantics."""

import math

from tests.conftest import NAN, rows_match

from redistimeseries_spark.operators.range_query import ts_range

AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "std.s", "var.p", "var.s",
]


def py_agg(agg, pairs):  # pairs: [(ts, value)] within one bucket
    valid = [(t, v) for t, v in pairs if not math.isnan(v)]
    nans = [v for _, v in pairs if math.isnan(v)]
    vs = [v for _, v in valid]
    if agg == "count":
        return float(len(vs))
    if agg == "count_nan":
        return float(len(nans))
    if agg == "count_all":
        return float(len(pairs))
    if agg == "sum":
        return sum(vs) if vs else 0.0
    if not vs:
        return NAN
    if agg == "min":
        return min(vs)
    if agg == "max":
        return max(vs)
    if agg == "range":
        return max(vs) - min(vs)
    if agg == "avg":
        return sum(vs) / len(vs)
    if agg == "first":
        return min(valid)[1]
    if agg == "last":
        return max(valid)[1]
    n, mean = len(vs), sum(vs) / len(vs)
    var_p = sum((v - mean) ** 2 for v in vs) / n
    if agg == "var.p":
        return var_p
    if agg == "std.p":
        return math.sqrt(var_p)
    var_s = 0.0 if n <= 1 else var_p * n / (n - 1)
    if agg == "var.s":
        return var_s
    if agg == "std.s":
        return math.sqrt(var_s)
    raise ValueError(agg)


def test_all14_with_nans(samples_df):
    rows = []
    for i in range(100):
        v = NAN if i % 7 == 0 else float((-1) ** i * i)
        rows.append(("k", 1000 * i, v))
    # one bucket entirely NaN: ts 200000..200900 every 7th.. make explicit
    for i in range(5):
        rows.append(("k", 200_000 + i * 100, NAN))
    df = samples_df(rows)
    dur = 10_000
    out = ts_range(df, aggregations=AGGS, bucket_dur=dur).collect()

    buckets = {}
    for _, ts, v in rows:
        buckets.setdefault(ts - ts % dur, []).append((ts, v))
    expected = []
    for b, pairs in sorted(buckets.items()):
        if not any(not math.isnan(v) for _, v in pairs):
            continue  # all-NaN bucket suppressed (src/filter_iterator.c:394)
        expected.append(
            ("k", b, *[py_agg(a, pairs) for a in AGGS])
        )
    rows_match([tuple(r) for r in out], expected)


def test_all_nan_bucket_suppressed(samples_df):
    df = samples_df([("k", 0, 1.0), ("k", 10_000, NAN), ("k", 10_500, NAN)])
    out = ts_range(df, aggregations=["min"], bucket_dur=10_000).collect()
    assert [r.ts for r in out] == [0]
