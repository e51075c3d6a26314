"""As-of (point-in-time) join: attach to every left sample the most
recent right sample at-or-before its timestamp.

The reference has no as-of join (its multi-series merge is the GROUPBY
same-timestamp reduce, src/multiseries_sample_iterator.c:47-87); this is
the standard time-series companion operator users reach for next —
"price at the time of each trade", "latest sensor calibration at each
reading".

Spark shape: ZERO joins.  Both sides union into one stream tagged by
side, one window per join key ordered by (ts, side) carries the last
right-side (value, ts) forward with ignoreNulls — each left row reads
the right sample that precedes it (inclusive: right sorts before left at
equal ts).  One shuffle + one sort, both on the join key; the bucketed
(key, ts)-sorted layout satisfies them without an exchange.  Compare a
join formulation: range-join on (key, rts <= ts) explodes to the cross
product per key before aggregation — quadratic per key — or needs a
broadcast-range strategy; the union-window is linear and deterministic.

Right side must be unique per (key, ts) (pre-aggregate duplicates with
the dup policy first — write/dup_policy.resolve_duplicates); a value
tiebreak in the sort keeps the output deterministic even if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ts_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "key",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """(on, ts, value, right_ts, right_value) — for every left row, the
    latest right row with right.ts <= left.ts on the same `on` key;
    right_* are NULL when no right sample precedes (or the match is
    older than `tolerance_ms`)."""
    l = left.select(
        F.col(on).alias("__k"),
        "ts",
        "value",
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rts"),
        F.lit(None).cast("double").alias("__rv"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("__side"),
        F.col("ts").alias("__rts"),
        F.col("value").alias("__rv"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("ts", "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r).select(
        "__k",
        "ts",
        "value",
        "__side",
        F.last("__rts", ignorenulls=True).over(w).alias("right_ts"),
        F.last("__rv", ignorenulls=True).over(w).alias("right_value"),
    )
    out = u.filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        stale = F.col("right_ts") < F.col("ts") - F.lit(tolerance_ms)
        out = out.select(
            "__k",
            "ts",
            "value",
            F.when(stale, F.lit(None)).otherwise(F.col("right_ts")).alias("right_ts"),
            F.when(stale, F.lit(None)).otherwise(F.col("right_value")).alias(
                "right_value"
            ),
        )
    return out.select(
        F.col("__k").alias(on), "ts", "value", "right_ts", "right_value"
    )
