"""F1 dense-regular fixture: range/revrange, FILTER_BY_TS/VALUE, COUNT,
retention clamp, incrby, ignore filter."""

import math

from tests.conftest import NAN

from redistimeseries_spark.operators.range_query import ts_range
from redistimeseries_spark.write.mutate import ignore_filter, incrby
from redistimeseries_spark.write.retention import retention_clamp


def dense(samples_df, n=1000):
    return samples_df([("k", 1000 * i, float(i)) for i in range(n)])


def test_range_inclusive_bounds(samples_df):
    df = dense(samples_df)
    out = ts_range(df, 5000, 10000).collect()
    assert [r.ts for r in out] == [5000, 6000, 7000, 8000, 9000, 10000]


def test_rev_and_count(samples_df):
    df = dense(samples_df)
    out = ts_range(df, rev=True, count=3).collect()
    assert [r.value for r in out] == [999.0, 998.0, 997.0]


def test_filter_by_ts(samples_df):
    df = dense(samples_df)
    out = ts_range(df, filter_by_ts=[1000, 5000, 999_000, 123]).collect()
    assert sorted(r.ts for r in out) == [1000, 5000, 999_000]


def test_filter_by_value_rejects_nan(samples_df):
    df = samples_df([("k", 0, 1.0), ("k", 1, NAN), ("k", 2, 3.0)])
    out = ts_range(df, filter_by_value=(0.0, 10.0)).collect()
    assert [r.ts for r in out] == [0, 2]


def test_count_is_per_series(samples_df):
    df = samples_df([("a", i, float(i)) for i in range(5)] +
                    [("b", i, float(i)) for i in range(5)])
    out = ts_range(df, count=2).collect()
    assert len(out) == 4  # 2 per key, reference COUNT applies per series


def test_retention_clamp(samples_df):
    df = samples_df([("k", 1000 * i, float(i)) for i in range(100)] +
                    [("old", 0, 1.0), ("old", 500_000, 2.0)])
    out = retention_clamp(df, 10_000).collect()
    ks = {r.key: sorted(x.ts for x in out if x.key == r.key) for r in out}
    assert ks["k"] == [1000 * i for i in range(89, 100)]  # max 99000 - 10000
    assert ks["old"] == [490_000 + 10_000]  # only the last sample survives


def test_incrby_running_sum(spark):
    df = spark.createDataFrame(
        [("k", 0, 1.0, 0), ("k", 10, 2.5, 1), ("k", 20, -1.0, 2)],
        "key string, ts long, value double, seq long",
    )
    out = sorted((r.ts, r.value) for r in incrby(df).collect())
    assert out == [(0, 1.0), (10, 3.5), (20, 2.5)]


def test_ignore_filter_kept_set(samples_df):
    # kept-sample reference semantics: 0,1,2 with diffs <=10/<=0.5
    df = samples_df([("k", 0, 1.0), ("k", 5, 1.2), ("k", 9, 1.4), ("k", 25, 1.45)])
    out = sorted(r.ts for r in ignore_filter(df, 10, 0.5).collect())
    # 5 dropped (near 0); 9 KEPT? no: compared to last-kept 0: dt=9<=10, dv=0.4<=0.5 -> dropped
    # 25: dt vs last kept (0) = 25 > 10 -> kept
    assert out == [0, 25]
