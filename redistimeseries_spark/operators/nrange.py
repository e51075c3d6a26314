"""TS.NRANGE / TS.NREVRANGE — multi-key pivoted range query.

Reference: src/module.c:724-906, merge+pivot src/reply.c:381-473.
Explicit key list; optional per-key (multi-)aggregation specs sharing one
bucket duration; output is one row per distinct timestamp with one value
column per (key, aggregator), NaN-filled where a key lacks that timestamp
(src/reply.c:414-460).

Spark shape: per-key aggregation first (one shuffle on (key, bucket)), then
groupBy(ts).pivot(key) with the *known* key list — no pivot-value inference
job, and the pivot output width is fixed by the query, so the plan is a
plain two-stage shuffle that scales with input rows, not key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.functions.aggs import sanitize
from redistimeseries_spark.operators.range_query import ts_range


def ts_nrange(
    samples: DataFrame,
    keys: list[str],
    start: int = MIN_TS,
    end: int = MAX_TS,
    *,
    agg_specs: dict[str, list[str]] | None = None,
    bucket_dur: int | None = None,
    rev: bool = False,
    **range_kwargs,
) -> DataFrame:
    """agg_specs: per-key aggregator lists, e.g. {"k1": ["min","max"],
    "k2": ["avg"]} (reference: one comma-list per key, shared bucket —
    src/query_language.c:347-373).  None = raw samples.

    Returns (ts, <key>_<agg>... | <key>...) with NaN fill.
    """
    if agg_specs is None:
        out = ts_range(samples, start, end, keys=keys, rev=rev, **range_kwargs)
        wide = (
            out.groupBy("ts")
            .pivot("key", keys)
            .agg(F.first("value"))
        )
        value_cols = keys
    else:
        if bucket_dur is None:
            raise ValueError("agg_specs requires bucket_dur")
        parts = []
        for k in keys:
            aggs = agg_specs[k]
            part = ts_range(
                samples,
                start,
                end,
                keys=[k],
                aggregations=aggs,
                bucket_dur=bucket_dur,
                rev=rev,
                **range_kwargs,
            )
            # long form: (key, ts, agg_name, value)
            stack = ", ".join(f"'{sanitize(a)}', {sanitize(a)}" for a in aggs)
            parts.append(
                part.selectExpr(
                    "key", "ts", f"stack({len(aggs)}, {stack}) AS (__agg, __v)"
                )
            )
        long_df = parts[0]
        for p in parts[1:]:
            long_df = long_df.unionByName(p)
        long_df = long_df.withColumn(
            "__col", F.concat_ws("_", "key", "__agg")
        )
        value_cols = [
            f"{k}_{sanitize(a)}" for k in keys for a in agg_specs[k]
        ]
        wide = long_df.groupBy("ts").pivot("__col", value_cols).agg(F.first("__v"))

    nan = F.lit(float("nan"))
    wide = wide.select(
        "ts", *[F.coalesce(F.col(f"`{c}`"), nan).alias(c) for c in value_cols]
    )
    return wide.orderBy(F.col("ts").desc() if rev else F.col("ts").asc())
