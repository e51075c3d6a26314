"""Label predicate forms (src/indexer.h:29-51), GROUPBY/REDUCE outer-join
semantics (F8), and NRANGE NaN fill (F9)."""

import math

import pytest

from tests.conftest import NAN, feq

from pyspark.sql import functions as F

from redistimeseries_spark.operators.labels import matched_keys, parse_filter
from redistimeseries_spark.operators.multi import ts_mrange
from redistimeseries_spark.operators.nrange import ts_nrange


@pytest.fixture(scope="module")
def labels(spark):
    rows = [
        ("a", "region", "eu"), ("a", "env", "prod"),
        ("b", "region", "us"), ("b", "env", "prod"),
        ("c", "region", "eu"),
        ("d", "region", "ap"), ("d", "env", "dev"),
    ]
    return spark.createDataFrame(rows, "key string, label string, value string")


def keys(labels, filters):
    return sorted(r.key for r in matched_keys(labels, filters).collect())


def test_predicate_forms(labels):
    assert keys(labels, ["region=eu"]) == ["a", "c"]
    assert keys(labels, ["region!=eu", "region!="]) == ["b", "d"]
    assert keys(labels, ["region=(eu,us)"]) == ["a", "b", "c"]
    assert keys(labels, ["region!=(eu,us)", "region!="]) == ["d"]
    assert keys(labels, ["env=", "region!="]) == ["c"]  # env absent
    assert keys(labels, ["env!="]) == ["a", "b", "d"]  # env exists
    assert keys(labels, ["region=eu", "env=prod"]) == ["a"]


def test_inclusive_required(labels):
    with pytest.raises(ValueError):
        matched_keys(labels, ["region!=eu"])


def test_parse_forms():
    assert parse_filter("l=v").op == "eq"
    assert parse_filter("l!=v").op == "ne"
    assert parse_filter("l=").op == "notexists"
    assert parse_filter("l!=").op == "exists"
    assert parse_filter("l=(a,b)").values == ["a", "b"]
    assert parse_filter("l!=(a,b)").op == "notin"


def test_groupby_reduce_nan_semantics(spark, labels, samples_df):
    # keys a (eu) and c (eu): c has NaN at ts where a has value and vice versa
    df = samples_df(
        [("a", 0, 1.0), ("a", 1000, NAN), ("c", 0, 2.0), ("c", 1000, NAN),
         ("c", 2000, 5.0)]
    )
    out = {
        (r.key, r.ts): r.value
        for r in ts_mrange(
            df, labels, ["region=eu"], groupby="region", reduce="sum"
        ).collect()
    }
    assert out[("region=eu", 0)] == 3.0
    assert math.isnan(out[("region=eu", 1000)])  # all-NaN ts -> NaN
    assert out[("region=eu", 2000)] == 5.0  # missing series ignored


def test_nrange_nan_fill(spark, samples_df):
    df = samples_df([("a", 0, 1.0), ("a", 1000, 2.0), ("b", 1000, 5.0)])
    out = {r.ts: (r.a, r.b) for r in ts_nrange(df, ["a", "b"]).collect()}
    assert out[0][0] == 1.0 and math.isnan(out[0][1])
    assert out[1000] == (2.0, 5.0)


def test_mrange_non_excluding_empty_series(spark, labels, samples_df):
    # default TS.MRANGE replies every matched series, empty ones as an empty
    # array (src/reply.c:159-173); exclude_empty=False emits a NULL marker row
    df = samples_df([("a", 0, 1.0)])  # 'c' matches region=eu but has no samples
    out = ts_mrange(df, labels, ["region=eu"], 0, 10_000, exclude_empty=False)
    rows = {r.key: (r.ts, r.value) for r in out.collect()}
    assert rows["a"] == (0, 1.0)
    assert rows["c"] == (None, None)
    # EXCLUDEEMPTY (default) drops 'c'
    keys = {r.key for r in ts_mrange(df, labels, ["region=eu"], 0, 10_000).collect()}
    assert keys == {"a"}


def _gb(df, labels, agg, reduce, fuse, **kw):
    return ts_mrange(
        df, labels, ["region!="], aggregations=[agg], bucket_dur=1000,
        groupby="region", reduce=reduce, fuse=fuse, **kw,
    )


def test_groupby_fused_equals_two_stage(spark, labels, samples_df):
    """(sum,sum)/(min,min)/(max,max) commute, so the one-shuffle fused plan
    must equal per-series-agg-then-reduce — including the all-NaN rules:
    a per-series only-NaN bucket never reaches the reducer, and a bucket
    that is only-NaN across the whole group emits nothing."""
    df = samples_df(
        [
            ("a", 0, 1.0), ("a", 100, NAN), ("a", 1100, NAN),  # a: b1 all-NaN
            ("c", 150, 2.0), ("c", 1200, NAN), ("c", 2500, 7.0),  # eu b1 all-NaN
            ("b", 0, 5.0), ("b", 2100, NAN),  # us b2 all-NaN group-wide
            ("d", 50, -3.0), ("d", 999, 4.0),
        ]
    )
    for agg, red in [("sum", "sum"), ("min", "min"), ("max", "max")]:
        fused = {(r.key, r.ts): getattr(r, agg) for r in _gb(df, labels, agg, red, True).collect()}
        twostage = {(r.key, r.ts): getattr(r, agg) for r in _gb(df, labels, agg, red, False).collect()}
        assert fused.keys() == twostage.keys(), (agg, red)
        for k in fused:
            assert feq(fused[k], twostage[k]), (agg, red, k, fused[k], twostage[k])


def test_groupby_fused_plan_single_shuffle(spark, labels, samples_df):
    """The fused plan carries exactly one hash exchange (the (group, bucket)
    aggregation); the two-stage plan needs two."""
    df = samples_df([("a", 0, 1.0), ("b", 100, 2.0), ("c", 1100, 3.0)])

    def hash_exchanges(q):
        plan = q._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    two_stage = hash_exchanges(_gb(df, labels, "sum", "sum", False))
    # fusing drops exactly the per-series aggregation exchange
    assert hash_exchanges(_gb(df, labels, "sum", "sum", True)) == two_stage - 1
    # non-commuting pairs must NOT fuse (avg of sums is not a global avg)
    assert hash_exchanges(_gb(df, labels, "sum", "avg", True)) == two_stage
    # per-series COUNT limit depends on series identity -> no fusion
    assert hash_exchanges(_gb(df, labels, "sum", "sum", True, count=5)) >= two_stage


def test_mget_latest_table_path_matches_scan(spark, labels):
    """ts_mget answered from an ingest-maintained latest table must equal
    the samples-scan path (the O(|keys|) vs O(rows) trade, multi.py)."""
    from pyspark.sql import functions as F

    from redistimeseries_spark.operators.multi import ts_mget

    rows = [("a", 1, 1.0), ("a", 9, 5.0), ("b", 3, 2.0), ("c", 2, 7.0), ("c", 8, NAN)]
    samples = spark.createDataFrame(rows, "key string, ts long, value double")
    latest = samples.groupBy("key").agg(
        F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value")
    )
    scan = {(r.key, r.ts) for r in ts_mget(samples, labels, ["region=eu"]).collect()}
    fast = {(r.key, r.ts) for r in
            ts_mget(samples, labels, ["region=eu"], latest_table=latest).collect()}
    assert scan == fast == {("a", 9), ("c", 8)}


def test_asof_join_planted(spark, samples_df):
    from redistimeseries_spark.operators.asof import ts_asof_join

    left = samples_df([("a", 100, 1.0), ("a", 200, 2.0), ("a", 300, 3.0), ("b", 50, 9.0)])
    right = samples_df([("a", 100, 10.0), ("a", 250, 20.0)])
    got = {
        (r.key, r.ts): (r.right_ts, r.right_value)
        for r in ts_asof_join(left, right).collect()
    }
    assert got[("a", 100)] == (100, 10.0)  # inclusive at equal ts
    assert got[("a", 200)] == (100, 10.0)
    assert got[("a", 300)] == (250, 20.0)
    assert got[("b", 50)] == (None, None)  # no right series at all


def test_asof_join_tolerance(spark, samples_df):
    from redistimeseries_spark.operators.asof import ts_asof_join

    left = samples_df([("a", 1000, 1.0)])
    right = samples_df([("a", 100, 10.0)])
    ok = ts_asof_join(left, right, tolerance_ms=900).collect()[0]
    assert ok.right_ts == 100
    stale = ts_asof_join(left, right, tolerance_ms=899).collect()[0]
    assert stale.right_ts is None and stale.right_value is None


def test_rollup_route_composable_exact(spark, samples_df):
    """Every composable aggregator routed through a fine dest equals the
    direct coarse aggregation on the raw samples."""
    from redistimeseries_spark.operators.range_query import ts_range
    from redistimeseries_spark.operators.rollup import range_from_rollup

    s = samples_df(
        [("k", t, float(v)) for t, v in
         [(0, 5), (90, 2), (250, 7), (980, 1), (1010, 4), (1500, 9), (2100, 3)]]
    )
    for agg in ["min", "max", "sum", "count", "first", "last"]:
        fine = ts_range(s, aggregations=[agg], bucket_dur=100).select(
            "key", "ts", F.col(agg).alias("value")
        )
        got = {(r.key, r.ts): r[agg] for r in range_from_rollup(fine, agg, 100, 1000).collect()}
        want = {(r.key, r.ts): r[agg] for r in ts_range(s, aggregations=[agg], bucket_dur=1000).collect()}
        assert got == want, agg


def test_rollup_route_rejects_non_composable(spark, samples_df):
    from redistimeseries_spark.operators.rollup import range_from_rollup

    s = samples_df([("k", 0, 1.0)])
    import pytest as _pt
    with _pt.raises(ValueError):
        range_from_rollup(s, "avg", 100, 1000)
    with _pt.raises(ValueError):
        range_from_rollup(s, "max", 300, 1000)  # 1000 % 300 != 0


def test_sessionize_planted(spark, samples_df):
    from redistimeseries_spark.operators.session import session_stats, sessionize

    s = samples_df(
        [("k", t, 1.0) for t in [0, 100, 250, 2000, 2100, 9000]]
        + [("j", t, 2.0) for t in [5, 4000]]
    )
    sess = {(r.key, r.ts): r.session_id for r in sessionize(s, 1000).collect()}
    assert [sess[("k", t)] for t in [0, 100, 250, 2000, 2100, 9000]] == [1, 1, 1, 2, 2, 3]
    assert [sess[("j", t)] for t in [5, 4000]] == [1, 2]
    stats = {(r.key, r.session_id): (r.start_ts, r.end_ts, r.n_samples)
             for r in session_stats(s, 1000).collect()}
    assert stats[("k", 1)] == (0, 250, 3)
    assert stats[("k", 3)] == (9000, 9000, 1)


def test_sessionize_gap_is_strict(spark, samples_df):
    from redistimeseries_spark.operators.session import sessionize

    s = samples_df([("k", 0, 1.0), ("k", 1000, 1.0), ("k", 2001, 1.0)])
    sess = [r.session_id for r in sessionize(s, 1000).orderBy("ts").collect()]
    assert sess == [1, 1, 2]  # gap == 1000 stays, 1001 splits


def test_topk_per_bucket(spark, samples_df):
    """ts_topk: hand-ranked per-bucket winners, rounded-value ranking
    with key tiebreak, bottomk ordering, all-NaN series absent, n/dur
    validation."""
    import pytest as _pytest

    from redistimeseries_spark.operators.multi import ts_topk

    nan = float("nan")
    sdf = samples_df(
        [
            # bucket 0 avgs: a=10, b=20, c=20 (tie -> key asc), d=NaN-only
            ("a", 100, 10.0), ("b", 200, 20.0),
            ("c", 300, 15.0), ("c", 400, 25.0),
            ("d", 500, nan),
            # bucket 1000 avgs: a=5, b=1
            ("a", 1100, 5.0), ("b", 1200, 1.0),
        ]
    )
    top = [
        (r.ts, r.key, r.value, r.rnk)
        for r in ts_topk(sdf, 1000, 2).collect()
    ]
    assert top == [
        (0, "b", 20.0, 1), (0, "c", 20.0, 2),
        (1000, "a", 5.0, 1), (1000, "b", 1.0, 2),
    ]
    bot = [(r.ts, r.key) for r in ts_topk(sdf, 1000, 1, bottom=True).collect()]
    assert bot == [(0, "a"), (1000, "b")]
    mx = [(r.ts, r.key, r.value) for r in ts_topk(sdf, 1000, 1, agg="max").collect()]
    assert mx == [(0, "c", 25.0), (1000, "a", 5.0)]
    with _pytest.raises(ValueError):
        ts_topk(sdf, 0, 1)
    with _pytest.raises(ValueError):
        ts_topk(sdf, 1000, 0)
    # the rank is a partial per-partition heap, not a full bucket sort
    plan = (
        ts_topk(sdf, 1000, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
