"""Regression: driver testdata timestamp physical types have changed
between generations (TIMESTAMP(NANOS) -> bigint nanos under the legacy
conf in round 1; TIMESTAMP(MICROS) -> TIMESTAMP_NTZ in round 2 — the
silent schema flip that broke every query until store.epoch_ms learned
to branch on the actual dtype).  Pin all three encodings to the same
epoch-ms answer so the next generation flip fails here, not in the
driver's bench."""

import pytest
from pyspark.sql import functions as F

from redistimeseries_spark.store import epoch_ms, read_parquet

MS = 1_704_067_200_123  # 2024-01-01T00:00:00.123Z


def _ms(df):
    return df.select(epoch_ms(df).alias("ms")).collect()[0].ms


@pytest.fixture(autouse=True)
def _utc(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def test_epoch_ms_bigint_nanos(spark):
    df = spark.createDataFrame([(MS * 1_000_000,)], "ts long")
    assert _ms(df) == MS


def test_epoch_ms_timestamp_ltz(spark):
    df = spark.createDataFrame([(1,)], "i int").select(
        F.timestamp_millis(F.lit(MS)).alias("ts")
    )
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert _ms(df) == MS


def test_epoch_ms_timestamp_ntz(spark):
    df = spark.createDataFrame([(1,)], "i int").select(
        F.timestamp_millis(F.lit(MS)).cast("timestamp_ntz").alias("ts")
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert _ms(df) == MS


def test_parquet_roundtrip_ntz(spark, tmp_path):
    """The actual round-2 failure path: parquet written with an NTZ
    timestamp column, read back through store.read_parquet."""
    p = str(tmp_path / "events_ntz.parquet")
    spark.createDataFrame([(1,)], "i int").select(
        F.lit(7).alias("event_id"),
        F.timestamp_millis(F.lit(MS)).cast("timestamp_ntz").alias("ts"),
    ).write.mode("overwrite").parquet(p)
    back = read_parquet(spark, p)
    assert _ms(back) == MS


def test_epoch_ms_matches_duckdb_on_real_testdata(spark):
    """Whatever physical type the current driver generation wrote, Spark's
    epoch_ms and DuckDB's epoch_ms (the oracle side of every gate) must
    agree on the events table."""
    import duckdb

    path = "/root/testdata/sf0.001/events.parquet"
    ev = read_parquet(spark, path)
    got = {
        r.event_id: r.ms
        for r in ev.select("event_id", epoch_ms(ev).alias("ms")).limit(100).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, CAST(epoch_ms(ts) AS BIGINT) FROM '{path}' "
            f"WHERE event_id IN ({','.join(map(str, got))})"
        ).fetchall()
    )
    assert got == want
