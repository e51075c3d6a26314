"""Time-weighted average (TWA) bucketed aggregator.

Reference semantics (src/compaction.c:302-459, forward direction):
  For each bucket [ta, tb) with ta = max(bucket_start, range_start),
  tb = min(bucket_start + dur, range_end):
    * consecutive in-bucket samples add trapezoid (v1+v2)(t2-t1)/2;
    * if a previous sample exists in the iterated range (last sample of an
      earlier bucket) the bucket is extended to ta: interpolate
      vab = v1 + (ta-t1)(v2-v1)/(t2-t1) and add (vab+v2)(t2-ta)/2, with
      first_ts = ta; otherwise first_ts = first in-bucket sample ts;
    * symmetrically a following sample extends to tb with
      (vab+v1)(tb-t1)/2 and last_ts = tb;
    * finalize = res / |last_ts - first_ts|, or the single sample's value
      when last_ts == first_ts (src/compaction.c:408-419 TwaFinalize).
  NaN samples are excluded entirely (nonNaNValueValid).

Empty / NaN-only buckets under EMPTY (src/filter_iterator.c:307-386):
  neighbors = nearest non-NaN filtered samples left of ta / right of tb
  (twa_get_samples_from_left/right); with both sides present the value is
  the average of the line through them evaluated at ta and tb; one-sided
  values use a sample-spacing heuristic to decide NaN vs nearest value.

Spark shape: the integration is inherently sequential per series, so it runs
as a vectorized numpy kernel inside applyInPandas grouped by key — one
shuffle by key, series processed in parallel across executors; within a key
the work is O(n) numpy, no Python-per-row cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark import MAX_TS


def _twa_kernel(
    t: np.ndarray,  # int64 sorted ts of valid (non-NaN) samples
    v: np.ndarray,  # float64 values
    b: np.ndarray,  # int64 bucket start per sample
    dur: int,
    range_start: int,
    range_end: int,
):
    """Return (buckets, twa_values) for buckets containing >=1 valid sample."""
    ub, inv = np.unique(b, return_inverse=True)
    fi = np.searchsorted(b, ub, "left")
    li = np.searchsorted(b, ub, "right") - 1
    first_ts = t[fi].astype(np.float64)
    last_ts = t[li].astype(np.float64)
    res = np.zeros(len(ub))
    if len(t) >= 2:
        t1, t2 = t[:-1].astype(np.float64), t[1:].astype(np.float64)
        v1, v2 = v[:-1], v[1:]
        same = b[:-1] == b[1:]
        np.add.at(res, inv[1:], np.where(same, (v1 + v2) * (t2 - t1) / 2.0, 0.0))
        cross = np.nonzero(~same)[0]
        if len(cross) > 0:
            dv = v2 - v1
            dt = t2 - t1
            # close previous bucket at tb
            tb = np.minimum(b[:-1].astype(np.float64) + dur, float(range_end))
            vab_prev = v1 + (tb - t1) * dv / dt
            np.add.at(res, inv[:-1][cross], ((vab_prev + v1) * (tb - t1) / 2.0)[cross])
            last_ts[inv[:-1][cross]] = tb[cross]
            # open next bucket at ta
            ta = np.maximum(b[1:].astype(np.float64), float(range_start))
            vab_cur = v1 + (ta - t1) * dv / dt
            np.add.at(res, inv[1:][cross], ((vab_cur + v2) * (t2 - ta) / 2.0)[cross])
            first_ts[inv[1:][cross]] = ta[cross]
    span = last_ts - first_ts
    twa = np.where(span == 0, v[li], np.divide(res, np.abs(span), where=span != 0))
    return ub, twa


def _empty_bucket_vals(
    b: np.ndarray, dur: int, t: np.ndarray, v: np.ndarray, range_start: int, range_end: int
) -> np.ndarray:
    """twa_calc_empty_bucket_val (src/filter_iterator.c:307-386) over the
    in-range valid samples, VECTORIZED over all empty buckets at once —
    searchsorted + guarded gathers + masks, no per-bucket Python (see
    module docstring for the edge-case note)."""
    n = len(t)
    if n == 0 or len(b) == 0:
        return np.full(len(b), np.nan)
    ta = np.maximum(b.astype(np.float64), float(range_start))
    tb = np.minimum(b.astype(np.float64) + float(dur), float(range_end))
    left = np.searchsorted(t, ta, "left")  # samples with ts < ta: t[:left]
    right = np.searchsorted(t, tb, "left")  # samples with ts >= tb: t[right:]
    nb = np.minimum(left, 2)
    na = np.minimum(n - right, 2)
    clip = lambda i: np.clip(i, 0, n - 1)  # guarded gather; masks gate use
    tl1, tl2 = t[clip(left - 1)], t[clip(left - 2)]
    tr0, tr1 = t[clip(right)], t[clip(right + 1)]
    vl1, vr0 = v[clip(left - 1)], v[clip(right)]

    is_empty = np.ones(len(b), dtype=bool)
    is_empty[(nb > 1) & (tl1 + (tl1 - tl2) > ta)] = False
    is_empty[(na > 1) & (tb + (tr1 - tr0) > tr0)] = False
    both = (nb != 0) & (na != 0)
    is_empty[both] = False

    out = np.full(len(b), np.nan)
    dv, dt = vr0 - vl1, (tr0 - tl1).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        va = vl1 + (ta - tl1) * dv / dt
        vb = vl1 + (tb - tl1) * dv / dt
    out[both] = ((va + vb) / 2.0)[both]
    right_only = ~is_empty & ~both & (na > 1)
    keep = right_only & ~(tb + (tr1 - tr0) // 2 <= tr0)
    out[keep] = vr0[keep]
    left_only = ~is_empty & ~both & ~(na > 1)
    keep = left_only & ~(tl1 + (tl1 - tl2) // 2 <= ta)
    out[keep] = vl1[keep]
    return out


def twa_buckets_expr(
    df: DataFrame, dur: int, start: int, end: int
) -> DataFrame:
    """Pure-JVM TWA (no Python in the hot path), SKEW-SAFE (round 8):
    the lag window that feeds the in-bucket trapezoid terms partitions
    by (key, bucket) — never bare key — so one hot series parallelizes
    across its buckets (the rate-family `_bucket_chain` discipline).
    The cross-bucket boundary terms need exactly two values per edge —
    the previous bucket's LAST sample (the open term's interpolation
    anchor) and the next bucket's FIRST sample (the close term's) — and
    both live on the per-bucket aggregated frame (one row per non-empty
    (key, bucket)), where a lag+lead over key costs #buckets rows, not
    #samples.  Term derivation mirrors TwaAddValue/
    TwaAddNextBucketFirstSample (src/compaction.c:348-419) exactly; see
    _twa_kernel for the same math in numpy (the differential twin,
    cross-checked in tests), and `_twa_key_window_expr` for the
    pre-round-8 bare-key-window plan kept as the other twin."""
    from pyspark.sql import Window

    # (ts, value) ordering everywhere: duplicate (key, ts) rows — legal
    # in the RAW sample table — resolve deterministically (the
    # rate._last_pair rule), so the trapezoid chain, the bucket-first
    # and bucket-last picks all agree across retries and engines
    wloc = Window.partitionBy("key", "__bucket").orderBy("ts", "value")
    d = (
        df.filter(~F.isnan("value"))
        .select("key", "ts", "value", "__bucket")
        .withColumn("pts", F.lag("ts").over(wloc))
        .withColumn("pv", F.lag("value").over(wloc))
    )
    ts, v = F.col("ts").cast("double"), F.col("value")
    pts, pv = F.col("pts").cast("double"), F.col("pv")
    # in-bucket trapezoids fold locally; the bucket's first/last samples
    # ride into the aggregated frame for the boundary terms (min/max of
    # the (ts, value) struct = the window order's first/last row)
    agg = d.groupBy("key", "__bucket").agg(
        F.sum(
            F.when(F.col("pts").isNotNull(), (pv + v) * (ts - pts) / 2.0)
        ).alias("__larea"),
        F.min(F.struct("ts", "value")).alias("__f"),
        F.max(F.struct("ts", "value")).alias("__l"),
    ).select(
        "key",
        "__bucket",
        "__larea",
        F.col("__f.ts").cast("double").alias("fts"),
        F.col("__f.value").alias("fv"),
        F.col("__l.ts").cast("double").alias("lts"),
        F.col("__l.value").alias("lastv"),
    )
    return _twa_stitch(agg, dur, start, end)


def _twa_value_col(dur: int, start: int, end: int, larea, fts, fv, lts,
                   lastv, plts, plv, nfts, nfv):
    """The cross-bucket boundary-term TWA value as ONE column expression
    over per-bucket columns: in-bucket trapezoid area `larea`, the
    bucket's first/last sample (fts/fv, lts/lastv), the previous
    non-empty bucket's last (plts/plv) and the next non-empty bucket's
    first (nfts/nfv).  Shared by the non-EMPTY stitch (_twa_stitch) and
    the round-9 EMPTY path, which computes the same value on its wider
    per-bucket frame so the aggregation pipeline runs ONCE."""
    rng_end = float(min(end, MAX_TS))
    b = F.col("__bucket")
    ta = F.greatest(b.cast("double"), F.lit(float(start)))
    tb = F.least(b.cast("double") + F.lit(float(dur)), F.lit(rng_end))
    opens = plts.isNotNull()
    closes = nfts.isNotNull()
    vab_open = plv + (ta - plts) * (fv - plv) / (fts - plts)
    vab_close = lastv + (tb - lts) * (nfv - lastv) / (nfts - lts)
    res = (
        F.coalesce(larea, F.lit(0.0))
        + F.when(opens, (vab_open + fv) * (fts - ta) / 2.0).otherwise(0.0)
        + F.when(closes, (vab_close + lastv) * (tb - lts) / 2.0).otherwise(0.0)
    )
    first_ts = F.when(opens, ta).otherwise(fts)
    last_ts = F.when(closes, tb).otherwise(lts)
    return F.when(last_ts == first_ts, lastv).otherwise(
        res / F.abs(last_ts - first_ts)
    )


def _twa_stitch(agg: DataFrame, dur: int, start: int, end: int) -> DataFrame:
    """Cross-bucket boundary-term stitch over the per-bucket aggregated
    frame — `agg` has one row per NON-EMPTY (key, __bucket) with columns
    (__larea, fts, fv, lts, lastv); a lag+lead over key costs #buckets
    rows.  Used by the non-EMPTY path (twa_buckets_expr); the EMPTY path
    inlines the same `_twa_value_col` on its own per-bucket frame."""
    from pyspark.sql import Window

    wk = Window.partitionBy("key").orderBy("__bucket")
    st = agg.select(
        "key", "__bucket", "__larea", "fts", "fv", "lts", "lastv",
        F.lag("lts").over(wk).alias("plts"),
        F.lag("lastv").over(wk).alias("plv"),
        F.lead("fts").over(wk).alias("nfts"),
        F.lead("fv").over(wk).alias("nfv"),
    )
    return st.select(
        "key",
        "__bucket",
        _twa_value_col(
            dur, start, end,
            F.col("__larea"), F.col("fts"), F.col("fv"), F.col("lts"),
            F.col("lastv"), F.col("plts"), F.col("plv"), F.col("nfts"),
            F.col("nfv"),
        ).alias("twa"),
    )


def twa_buckets_empty_expr(
    df: DataFrame, dur: int, start: int, end: int
) -> DataFrame:
    """EMPTY-path TWA as pure JVM expressions, SKEW-SAFE (round 9 — the
    last TWA family member still partitioned by bare key): emits every
    bucket of each key's [min, max] bucket span; non-empty buckets carry
    the `_twa_stitch` value, empty / NaN-only buckets the neighbor
    interpolation of twa_calc_empty_bucket_val
    (src/filter_iterator.c:307-386).

    The interpolation needs at most TWO valid samples on each side of an
    empty bucket, and both live on per-bucket aggregates: the nearest
    left sample is the previous non-empty bucket's LAST (`__l`), the
    second-nearest is that bucket's second-to-last (`__l2`) when it
    holds >=2 samples, else the non-empty bucket before it's last — so
    one lag over the per-bucket frame precomputes a `pen` struct per
    non-empty bucket and ONE last(ignorenulls) gather over the bucket
    spine resolves both left neighbors for every empty bucket (lead +
    first(ignorenulls) symmetrically on the right).  No structure ever
    holds more than one bucket of one series; the spine windows are
    #buckets-bounded (the OUTPUT size), never #samples-bounded.  The
    numpy kernel (`_twa_kernel` + `_empty_bucket_vals` via
    `_twa_buckets_kernel`) is retained as the differential twin."""
    from pyspark.sql import Window

    rng_end = float(min(end, MAX_TS))
    valid = df.filter(~F.isnan("value"))
    wloc = Window.partitionBy("key", "__bucket").orderBy("ts", "value")
    wcnt = Window.partitionBy("key", "__bucket")
    d = valid.select(
        "key",
        "ts",
        "value",
        "__bucket",
        F.lag("ts").over(wloc).alias("pts"),
        F.lag("value").over(wloc).alias("pv"),
        F.row_number().over(wloc).alias("__ra"),
        # rank-from-the-end WITHOUT a second (desc) sort: the unordered
        # count shares wloc's partitioning, so one local sort serves
        # every per-sample window in the plan
        (
            F.count(F.lit(1)).over(wcnt) - F.row_number().over(wloc) + 1
        ).alias("__rd"),
    )
    ts, v = F.col("ts").cast("double"), F.col("value")
    pts, pv = F.col("pts").cast("double"), F.col("pv")
    perb = d.groupBy("key", "__bucket").agg(
        F.sum(
            F.when(F.col("pts").isNotNull(), (pv + v) * (ts - pts) / 2.0)
        ).alias("__larea"),
        F.min(F.struct("ts", "value")).alias("__f"),
        F.max(F.struct("ts", "value")).alias("__l"),
        F.min(F.when(F.col("__ra") == 2, F.struct("ts", "value"))).alias("__f2"),
        F.max(F.when(F.col("__rd") == 2, F.struct("ts", "value"))).alias("__l2"),
        F.count(F.lit(1)).alias("__n"),
    )
    # ONE per-bucket frame carries BOTH the non-empty TWA value and the
    # empty-bucket neighbor structs (pen/nxt), so the #samples-sized
    # aggregation pipeline executes ONCE — the first cut of this plan
    # built `nonempty` and the neighbor frame as separate branches from
    # `perb` and Catalyst ran the whole source scan + sort + aggregation
    # TWICE (no ReusedExchange across the differing projections): 3 scans
    # of a 100M-row series measured 50 s where this shape takes ~20
    wke = Window.partitionBy("key").orderBy("__bucket")
    nbf = perb.select(
        "key",
        "__bucket",
        "__f",
        "__l",
        "__n",
        # pen: the sample just BELOW this bucket's last in the key's
        # global order; nxt: just above its first — sourced in-bucket
        # when the bucket holds >=2 samples, else from the adjacent
        # non-empty bucket on the per-bucket frame
        F.when(F.col("__n") >= 2, F.col("__l2"))
        .otherwise(F.lag("__l").over(wke))
        .alias("__pen"),
        F.when(F.col("__n") >= 2, F.col("__f2"))
        .otherwise(F.lead("__f").over(wke))
        .alias("__nxt"),
        _twa_value_col(
            dur, start, end,
            F.col("__larea"),
            F.col("__f.ts").cast("double"),
            F.col("__f.value"),
            F.col("__l.ts").cast("double"),
            F.col("__l.value"),
            F.lag(F.col("__l.ts").cast("double")).over(wke),
            F.lag("__l.value").over(wke),
            F.lead(F.col("__f.ts").cast("double")).over(wke),
            F.lead("__f.value").over(wke),
        ).alias("twa"),
    )
    # spine bounds come from ALL rows (NaN-only buckets extend the span,
    # exactly the kernel's `ball`); sequence's step matches the aligned
    # bucket grid
    bounds = df.groupBy("key").agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(dur)))
        ).alias("__bucket"),
    )
    full = spine.join(nbf, ["key", "__bucket"], "left")
    # BOTH gather directions run as GROWING frames (unboundedPreceding
    # .. -1): Spark evaluates a growing frame incrementally (O(1)/row)
    # but RECOMPUTES a shrinking unboundedFollowing frame from scratch
    # for every row — the natural `first(...).over(rowsBetween(1,
    # unboundedFollowing))` phrasing is O(#buckets^2) per key and
    # measured 52 s on a 27.8k-bucket spine where this shape takes <1 s.
    # "First non-null to the RIGHT in ascending order" == "last non-null
    # seen so far scanning in DESCENDING order", so the right-side
    # gathers just flip the sort.
    before = (
        Window.partitionBy("key")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    after_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("__bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = full.select(
        "key",
        "__bucket",
        "__n",
        "twa",
        F.last("__l", ignorenulls=True).over(before).alias("__L1"),
        F.last("__pen", ignorenulls=True).over(before).alias("__L2"),
        F.last("__f", ignorenulls=True).over(after_rev).alias("__R0"),
        F.last("__nxt", ignorenulls=True).over(after_rev).alias("__R1"),
    )
    b = F.col("__bucket")
    ta = F.greatest(b.cast("double"), F.lit(float(start)))
    tb = F.least(b.cast("double") + F.lit(float(dur)), F.lit(rng_end))
    tl1, vl1 = F.col("__L1.ts"), F.col("__L1.value")
    tl2 = F.col("__L2.ts")
    tr0, vr0 = F.col("__R0.ts"), F.col("__R0.value")
    tr1 = F.col("__R1.ts")
    dv = vr0 - vl1
    dt = (tr0 - tl1).cast("double")
    va = vl1 + (ta - tl1) * dv / dt
    vb = vl1 + (tb - tl1) * dv / dt
    # twa_calc_empty_bucket_val's decision tree (see _empty_bucket_vals,
    # the numpy twin): both sides -> average of the through-line at
    # ta/tb; one-sided needs TWO samples on that side, the extrapolated
    # next-sample instant to cross into the bucket, and the
    # half-spacing keep heuristic; otherwise the bucket reports NULL —
    # the kernel's NaN crossed the Arrow boundary as null, so null IS
    # the established empty-and-uninterpolatable contract downstream
    # (fill_empty_buckets, the mrange reply shaping, the oracle)
    near_r = tb + (tr1 - tr0).cast("double") > tr0.cast("double")
    keep_r = ~(tb + F.floor((tr1 - tr0) / 2) <= tr0.cast("double"))
    near_l = (tl1 + (tl1 - tl2)).cast("double") > ta
    keep_l = ~((tl1 + F.floor((tl1 - tl2) / 2)).cast("double") <= ta)
    fill = (
        F.when(tl1.isNotNull() & tr0.isNotNull(), (va + vb) / 2.0)
        .when(tl1.isNull() & tr1.isNotNull() & near_r & keep_r, vr0)
        .when(tr0.isNull() & tl2.isNotNull() & near_l & keep_l, vl1)
    )
    return g.select(
        "key",
        "__bucket",
        F.when(F.col("__n").isNotNull(), F.col("twa")).otherwise(fill).alias(
            "twa"
        ),
    )


def _twa_key_window_expr(
    df: DataFrame, dur: int, start: int, end: int
) -> DataFrame:
    """The pre-round-8 plan — per-sample lag AND lead over bare
    (key, ts).  Kept as the DIFFERENTIAL REFERENCE for the skew-safe
    `twa_buckets_expr` (fuzz-pinned equal in tests) and the comparison
    arm of the hot-series probe: semantically identical, but one hot
    series serializes its full history into a single window task."""
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("ts")
    rng_end = float(min(end, MAX_TS))
    d = (
        df.filter(~F.isnan("value"))
        .select("key", "ts", "value", "__bucket")
        .withColumn("pts", F.lag("ts").over(w))
        .withColumn("pv", F.lag("value").over(w))
        .withColumn("pb", F.lag("__bucket").over(w))
        .withColumn("nts", F.lead("ts").over(w))
        .withColumn("nv", F.lead("value").over(w))
        .withColumn("nb", F.lead("__bucket").over(w))
    )
    ts, v, b = F.col("ts").cast("double"), F.col("value"), F.col("__bucket")
    pts, pv, pb = F.col("pts").cast("double"), F.col("pv"), F.col("pb")
    nts, nv, nb = F.col("nts").cast("double"), F.col("nv"), F.col("nb")
    # each sample contributes every term touching its own bucket, so one
    # window pass + one (key, bucket) aggregation covers the whole operator:
    #   * in-bucket trapezoid with the previous sample (same bucket);
    #   * bucket-open term when the previous sample lies in an older bucket
    #     (interpolate at ta, extends first_ts to ta);
    #   * bucket-close term when the next sample lies in a newer bucket —
    #     computed here from the *lead* row instead of exploding it from the
    #     crossing row (interpolate at tb, extends last_ts to tb).
    ta = F.greatest(b.cast("double"), F.lit(float(start)))
    tb = F.least(b.cast("double") + F.lit(float(dur)), F.lit(rng_end))
    opens = pb.isNotNull() & (pb != b)
    closes = nb.isNotNull() & (nb != b)
    vab_open = pv + (ta - pts) * (v - pv) / (ts - pts)
    vab_close = v + (tb - ts) * (nv - v) / (nts - ts)
    area = (
        F.when(pb == b, (pv + v) * (ts - pts) / 2.0).otherwise(0.0)
        + F.when(opens, (vab_open + v) * (ts - ta) / 2.0).otherwise(0.0)
        + F.when(closes, (vab_close + v) * (tb - ts) / 2.0).otherwise(0.0)
    )
    terms = (
        d.select(
            "key",
            F.col("__bucket").alias("bucket"),
            "ts",
            "value",
            area.alias("area"),
            F.when(opens, ta).alias("sf"),
            F.when(closes, tb).alias("sl"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.sum("area").alias("res"),
            F.max("sf").alias("sf"),
            F.max("sl").alias("sl"),
            F.min("ts").cast("double").alias("fts"),
            F.max("ts").cast("double").alias("lts"),
            F.max_by("value", "ts").alias("lastv"),
        )
    )
    first_ts = F.coalesce(F.col("sf"), F.col("fts"))
    last_ts = F.coalesce(F.col("sl"), F.col("lts"))
    return terms.select(
        "key",
        F.col("bucket").alias("__bucket"),
        F.when(last_ts == first_ts, F.col("lastv"))
        .otherwise(F.coalesce(F.col("res"), F.lit(0.0)) / F.abs(last_ts - first_ts))
        .alias("twa"),
    )


def twa_buckets(
    df: DataFrame,
    dur: int,
    align_ts: int,
    start: int,
    end: int,
    empty: bool = False,
) -> DataFrame:
    """df: filtered samples with a precomputed __bucket column.
    Returns (key, __bucket, twa).  With empty=True also emits interior
    empty / NaN-only buckets with the interpolated value.

    Both paths are pure-JVM, bucket-local expression plans (round 9
    closed the EMPTY path's bare-key kernel — the last TWA member that
    serialized a hot series into one task); `_twa_buckets_kernel` is the
    retained numpy differential twin for the EMPTY path."""
    if not empty:
        return twa_buckets_expr(df, dur, start, end)
    return twa_buckets_empty_expr(df, dur, start, end)


def _twa_buckets_kernel(
    df: DataFrame,
    dur: int,
    start: int,
    end: int,
) -> DataFrame:
    """The pre-round-9 EMPTY-path plan — the numpy kernel
    (`_twa_kernel` + `_empty_bucket_vals`) via applyInPandas per BARE
    key.  Kept as the DIFFERENTIAL REFERENCE for
    `twa_buckets_empty_expr` (fuzz-pinned equal in tests) and the
    comparison arm of the hot-series probe: one hot series serializes
    its full history into a single task here."""
    empty = True
    range_end = min(end, MAX_TS)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        key = pdf["key"].iloc[0]
        valid = ~pdf["value"].isna() & ~np.isnan(pdf["value"].to_numpy())
        t = pdf.loc[valid, "ts"].to_numpy(np.int64)
        v = pdf.loc[valid, "value"].to_numpy(np.float64)
        b = pdf.loc[valid, "__bucket"].to_numpy(np.int64)
        if len(t) == 0:
            ub = np.empty(0, np.int64)
            twa = np.empty(0, np.float64)
        else:
            ub, twa = _twa_kernel(t, v, b, dur, start, range_end)
        if empty:
            ball = pdf["__bucket"].to_numpy(np.int64)
            lo, hi = ball.min(), ball.max()
            spine = np.arange(lo, hi + 1, dur, dtype=np.int64)
            vals = np.full(len(spine), np.nan)
            filled = np.zeros(len(spine), dtype=bool)
            if len(ub):
                pos = ((ub - lo) // dur).astype(np.int64)
                vals[pos] = twa
                filled[pos] = True
            gaps = ~filled
            if gaps.any():
                vals[gaps] = _empty_bucket_vals(
                    spine[gaps], dur, t, v, start, range_end
                )
            ub, twa = spine, vals
        return pd.DataFrame({"key": key, "__bucket": ub, "twa": twa})

    return df.select("key", "ts", "value", "__bucket").groupBy("key").applyInPandas(
        fn, "key string, __bucket long, twa double"
    )
