"""Error-path parity with the reference's tests/flow/test_negative.py:
malformed arguments raise, and the parser quirks (FILTER_BY_TS silent
truncation at 128) are replicated, not "fixed"."""

import pytest

from redistimeseries_spark.engine import TimeSeriesEngine, parse_compaction_policy, parse_duration_ms
from redistimeseries_spark.operators.labels import matched_keys, parse_filter
from redistimeseries_spark.operators.multi import ts_mrange
from redistimeseries_spark.operators.range_query import ts_range

NAN = float("nan")


@pytest.fixture
def df(samples_df):
    return samples_df([("k", t * 1000, float(t)) for t in range(200)])


def test_agg_requires_duration(df):
    with pytest.raises(ValueError, match="bucket_dur"):
        ts_range(df, aggregations=["avg"])
    with pytest.raises(ValueError, match="bucket_dur"):
        ts_range(df, aggregations=["avg"], bucket_dur=0)


def test_unknown_aggregator(df):
    # "TSDB: Unknown aggregation type" (src/query_language.c)
    with pytest.raises(ValueError, match="nosuchagg"):
        ts_range(df, aggregations=["nosuchagg"], bucket_dur=1000)


def test_filter_by_ts_negative_rejected(df):
    # parseTimestamp rejects negatives (src/query_language.c:30-38)
    with pytest.raises(ValueError, match="FILTER_BY_TS"):
        ts_range(df, filter_by_ts=[-5, 1000])


def test_filter_by_ts_truncates_at_128(df):
    # MAX_TS_VALUES_FILTER: the parse loop stops after 128 values
    # (src/query_language.c:620, src/query_language.h:53)
    wanted = [t * 1000 for t in range(150)]
    n = ts_range(df, filter_by_ts=wanted).count()
    assert n == 128


def test_groupby_requires_reduce(df, spark):
    labels = spark.createDataFrame(
        [("k", "type", "x")], "key string, label string, value string"
    )
    with pytest.raises(ValueError, match="REDUCE"):
        ts_mrange(df, labels, ["type=x"], groupby="type")


def test_label_filter_needs_inclusive(spark):
    labels = spark.createDataFrame(
        [("k", "type", "x")], "key string, label string, value string"
    )
    # QueryIndex requires >=1 inclusion predicate (src/indexer.c:507-565)
    with pytest.raises(ValueError, match="inclusive"):
        matched_keys(labels, ["type!=x"])
    with pytest.raises(ValueError, match="bad label filter"):
        parse_filter("no-operator-here")


def test_engine_add_negative_ts(spark):
    eng = TimeSeriesEngine(spark)
    with pytest.raises(ValueError, match=">= 0"):
        eng.add("k", -1, 1.0)


def test_engine_incrby_nan(spark):
    eng = TimeSeriesEngine(spark)
    eng.add("k", 1000, 1.0)
    eng.flush()
    with pytest.raises(ValueError, match="NaN"):
        eng.incrby("k", NAN)


def test_engine_incrby_before_last(spark):
    eng = TimeSeriesEngine(spark)
    eng.add("k", 5000, 1.0)
    eng.flush()
    with pytest.raises(ValueError, match="must be >= last"):
        eng.incrby("k", 1.0, ts=1000)


def test_engine_label_name_no_equals(spark):
    eng = TimeSeriesEngine(spark)
    with pytest.raises(ValueError, match="'='"):
        eng.create("k", labels={"bad=name": "v"})


def test_engine_create_twice(spark):
    eng = TimeSeriesEngine(spark)
    eng.create("k")
    with pytest.raises(ValueError, match="exists"):
        eng.create("k")


def test_engine_rule_cycle_and_dup_dest(spark):
    eng = TimeSeriesEngine(spark)
    eng.create("a")
    eng.create("b")
    eng.create("c")
    eng.create_rule("a", "b", "avg", 1000)
    with pytest.raises(ValueError, match="compaction destination"):
        eng.create_rule("c", "b", "max", 1000)
    with pytest.raises(ValueError, match="src == dest"):
        eng.create_rule("c", "c", "max", 1000)


def test_bad_duration_strings():
    with pytest.raises(ValueError, match="bad duration"):
        parse_duration_ms("5x")
    with pytest.raises(ValueError, match="bad duration"):
        parse_duration_ms("-5m")
    with pytest.raises(ValueError, match="bad policy item"):
        parse_compaction_policy("avg:1h")
