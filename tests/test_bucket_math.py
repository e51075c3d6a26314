"""Property tests for bucket math (CalcBucketStart identities,
src/tsdb.h:84-99) — Spark expression vs the reference formula in Python."""

import random

from pyspark.sql import functions as F

from redistimeseries_spark.functions.buckets import bucket_start


def ref_bucket(ts: int, dur: int, align: int) -> int:
    return max(0, ts - ((ts - align) % dur + dur) % dur)


def test_bucket_start_matches_reference_formula(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(500):
        dur = rng.choice([1, 7, 1000, 60_000, 3_600_000])
        align = rng.choice([0, 1, dur - 1, dur, 17 * dur + 3, 10**12])
        ts = rng.randrange(0, 2 * 10**12)
        cases.append((ts, dur, align))
    df = spark.createDataFrame(cases, "ts long, dur long, align long")
    got = {}
    for dur, align in {(d, a) for _, d, a in cases}:
        sub = df.filter((F.col("dur") == dur) & (F.col("align") == align))
        for r in sub.select("ts", bucket_start(F.col("ts"), dur, align).alias("b")).collect():
            got[(r.ts, dur, align)] = r.b
    for ts, dur, align in cases:
        b = ref_bucket(ts, dur, align)
        assert got[(ts, dur, align)] == b, (ts, dur, align)
        # identities: bucket <= ts < bucket + dur (when not clamped at 0)
        if b > 0:
            assert b <= ts < b + dur
