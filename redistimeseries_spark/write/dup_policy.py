"""Duplicate-policy resolution — the write-path "merge" operator.

Reference: handleDuplicateSample (src/generic_chunk.c:62-93):
  on (key, ts) collision — BLOCK -> error; FIRST -> keep old; LAST -> new;
  MIN/MAX -> extremum; SUM -> old+new.
  NaN rules: MIN/MAX/SUM with exactly one NaN -> error; otherwise the
  non-NaN side wins (both NaN -> NaN).

Batch shape: the reference applies the policy pairwise at arrival order;
over a batch that folds to:
  FIRST/LAST  -> value at min/max arrival order (seq column)
  MIN/MAX/SUM -> associative fold over the group
Arrival order must be explicit (a `seq` column, e.g. event_id) — a
distributed batch has no implicit order.

This is a single groupBy (one shuffle) with map-side partial aggregation;
at ingest scale it runs inside foreachBatch before a MERGE INTO the samples
table (SURVEY §2.8), so the expensive part — the upsert join — happens once
per micro-batch, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POLICIES = ("block", "first", "last", "min", "max", "sum")


def resolve_duplicates(
    raw: DataFrame, policy: str = "last", seq_col: str = "seq"
) -> DataFrame:
    """Fold duplicate (key, ts) rows to one row per the policy.
    raw: (key, ts, value, <seq_col>).  Returns (key, ts, value).

    `block` raises on collision in the reference; in batch we surface the
    colliding rows via `blocked_rows` instead so the caller can route them
    to an error sink (the streaming path does exactly that).
    """
    policy = policy.lower()
    if policy not in POLICIES:
        raise ValueError(f"bad duplicate policy {policy!r}")
    g = raw.groupBy("key", "ts")
    v, s = F.col("value"), F.col(seq_col)
    nn = F.when(~F.isnan(v), v)  # non-NaN side wins for min/max/sum
    if policy == "first":
        out = g.agg(F.min_by("value", seq_col).alias("value"))
    elif policy in ("last", "block"):
        # block: collisions are rejected at ingest; the fold keeps the first
        # arrival (callers route the rest through blocked_rows)
        out = (
            g.agg(F.max_by("value", seq_col).alias("value"))
            if policy == "last"
            else g.agg(F.min_by("value", seq_col).alias("value"))
        )
    elif policy == "min":
        out = g.agg(
            F.when(F.count(nn) == 0, F.first(v)).otherwise(F.min(nn)).alias("value")
        )
    elif policy == "max":
        out = g.agg(
            F.when(F.count(nn) == 0, F.first(v)).otherwise(F.max(nn)).alias("value")
        )
    else:  # sum: NaNs drop out unless all values are NaN
        out = g.agg(
            F.when(F.count(nn) == 0, F.first(v)).otherwise(F.sum(nn)).alias("value")
        )
    return out.select("key", "ts", "value")


def blocked_rows(raw: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Rows a BLOCK policy would reject: every row of a colliding (key, ts)
    group except the first arrival (src/module.c rejects the later write)."""
    w_min = F.min(seq_col).over(Window.partitionBy("key", "ts"))
    return (
        raw.withColumn("__first", w_min)
        .filter(F.col(seq_col) != F.col("__first"))
        .drop("__first")
    )
